package graft.tools

/** Prints the registry inventory: total queries, oracle-backed count,
  * rows-only names, bench-eligible count. Pure reflection over
  * [[graft.SparkEntry.registry]] — no SparkSession needed.
  */
object Inventory {
  def main(args: Array[String]): Unit = {
    val reg = graft.SparkEntry.registry
    val oracle = reg.filter(_.oracle.isDefined)
    val rowsOnly = reg.filter(_.oracle.isEmpty)
    println(s"total=${reg.size} oracle=${oracle.size} rowsOnly=${rowsOnly.size} " +
      s"bench=${reg.count(_.benchEligible)}")
    println("rows-only: " + rowsOnly.map(_.name).sorted.mkString(" "))
    val dup = reg.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    if (dup.nonEmpty) println("DUPLICATE NAMES: " + dup.mkString(" "))
  }
}
