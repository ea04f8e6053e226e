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

  test("embeddings drift: int ids widen, double elements cast to float") {
    val s = spark; import s.implicits._
    val base = graft.util.Fixtures.dir + "/tables_spec/emb_drift"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    Seq((1, Seq(0.5d, 0.25d)), (2, Seq(1.0d, -0.125d)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$base/embeddings.parquet")
    val df = Tables.embeddings(spark, base)
    assert(df.schema("vec_id").dataType == LongType)
    assert(df.schema("embedding").dataType == ArrayType(FloatType, true) ||
      df.schema("embedding").dataType == ArrayType(FloatType, false),
      s"got ${df.schema("embedding").dataType}")
    // float-valued doubles cast losslessly
    val got = df.orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).toSeq)
    assert(got.toSeq == Seq(Seq(0.5f, 0.25f), Seq(1.0f, -0.125f)))
    // and the native cosine kernel accepts the normalized column
    val cos = df.select(graft.llm.Similarity.cosine(
      col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("documents drift: int doc_id/n_chars widen to long") {
    val s = spark; import s.implicits._
    val base = graft.util.Fixtures.dir + "/tables_spec/doc_drift"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    Seq((1, "hello world", 11), (2, "more text", 9))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.parquet(s"$base/documents.parquet")
    val df = Tables.documents(spark, base)
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("n_chars").dataType == LongType)
    assert(df.count() == 2)
  }
}
