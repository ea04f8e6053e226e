package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM training-data pipelines: opaque
  * `binary` payload columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators running as
  * per-partition batch kernels.
  *
  * The image/audio codec libraries are not present in this environment,
  * so THE DECODE STEP IS A STUB: `decodeStub` produces a deterministic
  * fake "decoded frame" from the payload bytes (clearly marked below).
  * Everything AROUND the stub — the schema contract, the binary column
  * flow, the mapPartitions batch shape, partition-local processing with
  * zero driver involvement — is real, tested, and is exactly what a
  * real codec would plug into (swap `decodeStub` for the JNI/codec
  * call; in PySpark this partition kernel is the `mapInPandas` batch
  * function).
  *
  * Scale: payloads never leave their partition; feature extraction is
  * a streaming per-row kernel; `maxPartitionBytes` governs batch sizing
  * exactly as for any other parquet binary column.
  */
object Multimodal {

  /** The multimodal schema contract: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Build an asset table from `documents`: payload = UTF-8 bytes of
    * the text (a deterministic stand-in for real image/audio bytes),
    * metadata derived from byte length. Pure column expressions.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (length(col("text")) % 64 + 16).cast("int").as("width"),
        (length(col("text")) % 48 + 16).cast("int").as("height"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** ??? REAL CODEC GOES HERE ??? — deterministic fake decode: "pixels"
    * are the payload bytes. Signature and batch flow match a real
    * decoder (bytes → fixed-size frame). */
  private def decodeStub(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    val out = new Array[Byte](targetLen)
    var i = 0
    while (i < targetLen) {
      out(i) = if (i < payload.length) payload(i) else 0
      i += 1
    }
    out
  }

  /** Resize (truncate/zero-pad the decoded frame to `targetBytes`) +
    * feature-extract (16-bin byte histogram, L1-normalized) as ONE
    * per-partition pass over the binary column. Adds `frame` (binary)
    * and `features` (array<double>, length 16).
    */
  def decodeAndFeaturize(assets: DataFrame, targetBytes: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex("payload")
    val outSchema = assets.schema
      .add("frame", BinaryType)
      .add("features", ArrayType(DoubleType, containsNull = false))
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](pIdx)
        val frame = decodeStub(payload, targetBytes)
        val hist = new Array[Double](16)
        var i = 0
        while (i < frame.length) {
          hist((frame(i) & 0xFF) >> 4) += 1.0
          i += 1
        }
        var s = 0.0
        i = 0
        while (i < 16) { s += hist(i); i += 1 }
        i = 0
        while (i < 16) { hist(i) /= s; i += 1 }
        Row.fromSeq(row.toSeq :+ frame :+ hist.toSeq)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Frame-sampling for video-like payloads: keep every `stride`-th
    * byte (stands in for every k-th frame) — same per-partition kernel
    * shape as decode. Adds `sampled` (binary).
    */
  def frameSample(assets: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex("payload")
    val outSchema = assets.schema.add("sampled", BinaryType)
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](pIdx)
        val n = (payload.length + stride - 1) / stride
        val sampled = new Array[Byte](n)
        var i = 0
        while (i < n) { sampled(i) = payload(i * stride); i += 1 }
        Row.fromSeq(row.toSeq :+ sampled)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  // ---------------------------------------------------------------- queries

  /** Rows-only entry: schema contract + decode/featurize batch shape.
    * Checks: every row produces a frame of exactly targetBytes, a
    * 16-bin unit-sum histogram; determinism (two runs, same checksum);
    * metadata consistent with payload length.
    */
  val mm = QueryDef.fixture("mm1_multimodal_pipeline") { (s, d) =>
    val assets = assetsFromDocuments(Tables.documents(s, d)).cache()
    val feat = decodeAndFeaturize(assets, targetBytes = 256).cache()
    val stats = feat.agg(
      count(lit(1)).as("n"),
      sum(when(length(col("frame")) === 256, 0L).otherwise(1L)).as("bad_frames"),
      sum(when(size(col("features")) === 16, 0L).otherwise(1L)).as("bad_feats"),
      max(abs(aggregate(col("features"), lit(0.0), (a, v) => a + v) - 1.0))
        .as("max_hist_err"),
      sum(when(col("meta.n_bytes") === length(col("payload")), 0L).otherwise(1L))
        .as("bad_meta")).head()
    // determinism probe: recompute, checksums must match exactly
    val cks1 = feat.agg(sum(crc32(col("frame")))).head().getLong(0)
    val cks2 = decodeAndFeaturize(assets, 256).agg(sum(crc32(col("frame"))))
      .head().getLong(0)
    assets.unpersist(); feat.unpersist()
    val spark = s; import spark.implicits._
    Seq((stats.getLong(0), stats.getLong(1), stats.getLong(2),
      stats.getDouble(3), stats.getLong(4), cks1 == cks2))
      .toDF("n", "bad_frames", "bad_feats", "max_hist_err", "bad_meta", "deterministic")
      .filter(col("n") > 0 && col("bad_frames") === 0 && col("bad_feats") === 0 &&
        col("max_hist_err") < 1e-9 && col("bad_meta") === 0 && col("deterministic"))
  }

  def all: Seq[QueryDef] = Seq(mm)
}
