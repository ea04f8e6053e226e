package graft
import org.apache.spark.sql.SparkSession
import graft.ml._
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val cfg = Sim.Config(n = 1200L, p = 10, seed = 606L, chunkRows = 100L)
    val b2 = Sim.bundle(s, cfg).cache()
    val hp = HyperParams(0.1, 0.9, 0.8, 3, 30)
    val res = Boruta.run(b2, cfg.p, nIter = 8, hp = hp, seed = 71L)
    println("hits:      " + res.hits.mkString(","))
    println("decisions: " + res.decisions.mkString(","))
    s.stop()
  }
}
