package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** groupedMadOutliers vs hand-computed median/MAD fences — including a
  * NON-STRING group key: the materialized median frames must re-enter
  * the plan with the key's native type (an int key used to
  * ClassCastException in the literal-frame collect).
  */
class MadOutliersSpec extends SparkSpec {

  test("integer group key: hand-computed medians, MADs, and fence counts") {
    import spark.implicits._
    // group 1: 1..9 plus one wild outlier; group 2: constant
    val rows = (1L to 9L).map(v => (1, v.toDouble, v)) :+ ((1, 100.0, 10L))
    val df = (rows ++ Seq((2, 5.0, 11L), (2, 5.0, 12L), (2, 5.0, 13L), (2, 5.0, 14L)))
      .toDF("g", "v", "id")
    val got = RelationalQueries
      .groupedMadOutliers(df, "g", "v", Seq("id"), k = 3.0)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet
    // group 1 (n=10): median = 5th smallest = 5; devs sorted
    // 0,1,1,2,2,3,3,4,4,95 → MAD = 2; fence 3·2=6 → one outlier (95)
    // group 2 (n=4): median 5, MAD 0, no devs > 0
    assert(got == Set((1, 5.0, 2.0, 10L, 1L), (2, 5.0, 0.0, 4L, 0L)))
  }

  test("string group key still works (a14's shape)") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L),
      ("a", 50.0, 4L), ("b", 7.0, 5L))
      .toDF("g", "v", "id")
    val got = RelationalQueries
      .groupedMadOutliers(df, "g", "v", Seq("id"), k = 1.5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet
    // a (n=4): median = 2nd smallest = 2; devs 0,1,1,48 → MAD = 1
    // (2nd smallest); fence 1.5 → outlier = 48 only
    assert(got == Set(("a", 2.0, 1.0, 4L, 1L), ("b", 7.0, 0.0, 1L, 0L)))
  }
}
