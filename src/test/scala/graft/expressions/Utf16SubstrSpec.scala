package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class Utf16SubstrSpec extends SparkSpec {

  private def k(s: String, pos: Long, len: Int): String = {
    val r = Utf16SubstrKernel.utf16Substr(UTF8String.fromString(s), pos, len)
    if (r == null) null else r.toString
  }

  test("kernel: BMP text matches String.substring semantics") {
    assert(k("hello", 1, 5) == "hello")
    assert(k("hello", 2, 3) == "ell")
    assert(k("héllo", 1, 5) == "héllo") // 2-byte UTF-8, 1 UTF-16 unit
    assert(k("héllo", 2, 1) == "é")
    assert(k("", 1, 0) == "")
    assert(k("abc", 3, 0) == "")
    assert(k("abc", 4, 0) == "") // pos == length+1, zero-width: in range
  }

  test("kernel: surrogate pairs count as two units; splits return null") {
    val s = "a😀b" // a😀b — 4 UTF-16 units, 6 UTF-8 bytes
    assert(k(s, 1, 1) == "a")
    assert(k(s, 2, 2) == "😀")
    assert(k(s, 2, 3) == "😀b")
    assert(k(s, 1, 4) == s)
    assert(k(s, 1, 2) == null, "end splits the pair")
    assert(k(s, 3, 1) == null, "start on the low half")
    assert(k(s, 3, 2) == null)
    assert(k(s, 1, 5) == null, "overruns the string")
    assert(k(s, 5, 1) == null)
    assert(k(s, 0, 1) == null, "pos is 1-based")
    assert(k(s, -1, 1) == null)
    assert(k(s, 4, 1) == "b")
  }

  test("kernel: agrees with String.substring on every valid window") {
    val s = "x😀y💩😮z" // mixed BMP + 3 pairs
    for (p <- 1 to s.length; l <- 0 to s.length - p + 1) {
      val splits = Character.isLowSurrogate(s.charAt(p - 1)) ||
        (l > 0 && Character.isHighSurrogate(s.charAt(p - 1 + l - 1)))
      val got = k(s, p, l)
      if (splits) assert(got == null, s"pos=$p len=$l should split")
      else assert(got == s.substring(p - 1, p - 1 + l), s"pos=$p len=$l")
    }
  }

  test("DataFrame path (whole-stage codegen): extraction and null channel") {
    import spark.implicits._
    val df = Seq(
      (1L, "a😀b", 2L, 2), // valid pair window
      (2L, "a😀b", 1L, 2), // splits -> null
      (3L, "plain ascii", 7L, 5),
      (4L, null.asInstanceOf[String], 1L, 1)) // null propagates
      .toDF("id", "t", "p", "l")
    val got = df.select(col("id"),
      Utf16Substr(col("t"), col("p"), col("l")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "😀")
    assert(got(2L) == null)
    assert(got(3L) == "ascii")
    assert(got(4L) == null)
  }

  test("utf16Length counts units, not code points") {
    assert(Utf16SubstrKernel.utf16Length(UTF8String.fromString("abc")) == 3L)
    assert(Utf16SubstrKernel.utf16Length(
      UTF8String.fromString("a😀b")) == 4L)
    assert(Utf16SubstrKernel.utf16Length(UTF8String.fromString("")) == 0L)
  }
}
