package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Guard for kernel entry points that tuple-encode a document id as a
  * primitive long: a non-numeric id (e.g. a string UUID) would
  * `cast("long")` to null and NPE deep inside the encoder. Fail fast
  * with an actionable message instead — callers with string ids should
  * hash them to a long (`xxhash64(col)`) before the kernel.
  */
object Ids {

  def requireLongCompatible(df: DataFrame, idCol: String, kernel: String): Unit = {
    val dt = df.schema(idCol).dataType
    val ok = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
    require(ok,
      s"$kernel requires an integral id column; '$idCol' is ${dt.simpleString}. " +
        "Hash non-numeric ids to a long first (e.g. xxhash64(col)) — a silent " +
        "cast would null them out.")
  }
}
