package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events`' timestamp normalization against testdata
  * drift: the driver has shipped `ts` as TIMESTAMP(NANOS) (read as
  * LongType under nanosAsLong), as plain timestamp[us] with
  * isAdjustedToUTC=false (Spark 4 reads TIMESTAMP_NTZ — the round-6
  * regression that crashed 11 queries), and as a regular UTC
  * timestamp. All three must come back as session-TZ TimestampType
  * with identical `unix_micros` values.
  */
class TablesSpec extends SparkSpec {

  private val wantUs = Seq(1700000000000000L, 1700000123456789L)

  private def writeFixture(dir: String)(build: => org.apache.spark.sql.DataFrame): String = {
    val base = graft.util.Fixtures.dir + s"/tables_spec/$dir"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    build.coalesce(1).write.parquet(s"$base/events.parquet")
    base
  }

  private def readBack(sfDir: String): Seq[Long] = {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("events ts: UTC timestamp passes through untouched") {
    val s = spark; import s.implicits._
    val dir = writeFixture("tz") {
      wantUs.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    }
    assert(readBack(dir) == wantUs)
  }

  test("events ts: TIMESTAMP_NTZ (pandas/pyarrow default) casts to session-TZ timestamp") {
    val s = spark; import s.implicits._
    // cast through an NTZ column — parquet stores isAdjustedToUTC=false,
    // and Spark 4's default inferTimestampNTZ reads it back as NTZ
    val dir = writeFixture("ntz") {
      wantUs.toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    }
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture must round-trip as NTZ, got ${raw.schema("ts").dataType} — " +
        "inferTimestampNTZ config drifted?")
    // session is pinned UTC, so NTZ→TIMESTAMP preserves the wall-clock
    // values and unix_micros equals the original micros
    assert(readBack(dir) == wantUs)
  }

  test("events ts: legacy long nanos normalizes via integral division") {
    val s = spark; import s.implicits._
    val dir = writeFixture("nanos") {
      wantUs.toDF("us").select((col("us") * 1000L).as("ts"))
    }
    assert(readBack(dir) == wantUs)
  }
}
