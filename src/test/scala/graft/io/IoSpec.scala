package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** mortonKey vs hand-interleaved bit values: z-order correctness is
  * what makes the s15 layout's file-skipping claim true, so the bit
  * placement (x → even positions, y → odd) is pinned exactly.
  */
class IoSpec extends SparkSpec {

  test("mortonKey interleaves bits: x at even, y at odd positions") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L),   // → 0
      (3L, 1L),   // x=11 → pos0,2; y=01 → pos1 → 0b0111 = 7
      (1L, 2L),   // x=01 → pos0;   y=10 → pos3 → 0b1001 = 9
      (3L, 3L),   // all four low bits → 15
      (1023L, 0L),   // x fills even positions: 0b0101...01 (10 bits)
      (0L, 1023L))   // y fills odd positions
      .toDF("x", "y")
    val got = df.select(IoQueries.mortonKey(col("x"), col("y"), 10))
      .collect().map(_.getLong(0)).toSeq
    val evens = (0 until 10).map(b => 1L << (2 * b)).sum  // 0x55555 pattern
    assert(got == Seq(0L, 7L, 9L, 15L, evens, evens << 1))
    // locality sanity: adjacent x cells at equal y stay within a small
    // z-distance while a far x jump lands far away
    val z = (x: Long, y: Long) => Seq((x, y)).toDF("x", "y")
      .select(IoQueries.mortonKey(col("x"), col("y"), 10))
      .head().getLong(0)
    assert(math.abs(z(5, 7) - z(6, 7)) < math.abs(z(5, 7) - z(600, 7)))
  }
}
