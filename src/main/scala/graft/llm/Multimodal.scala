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
  * Decoding goes through a pluggable [[Codec]] chain. Two REAL
  * pure-JVM codecs ship: uncompressed 24-bit BMP (pixels out as RGB)
  * and PCM-16 WAV (raw sample bytes out). Payloads no codec claims
  * fall back to `decodeStub` — a deterministic fake "decoded frame"
  * from the raw bytes (the compressed-format codecs, JPEG/MP3/H.264,
  * are external libraries this environment doesn't ship; a real
  * deployment registers them as further [[Codec]]s). The schema
  * contract, binary column flow, and mapPartitions batch shape are
  * identical for real and fallback paths (in PySpark this partition
  * kernel is the `mapInPandas` batch function).
  *
  * Scale: payloads never leave their partition; feature extraction is
  * a streaming per-row kernel; `maxPartitionBytes` governs batch sizing
  * exactly as for any other parquet binary column.
  */
object Multimodal {

  /** A decoded frame: RGB pixels (BMP), PCM sample bytes (WAV), or the
    * raw payload (stub fallback). `width`/`height` are pixels for
    * images, (frames-per-channel, 1) for audio. */
  final case class Decoded(kind: String, width: Int, height: Int,
      channels: Int, data: Array[Byte])

  /** Pluggable byte-payload decoder. Implementations must be cheap to
    * `sniff` (magic bytes only) and total — `decode` returns None on
    * malformed input rather than throwing (a 100 TB crawl WILL contain
    * truncated files; one bad payload must not kill the stage). */
  trait Codec extends Serializable {
    def name: String
    def sniff(payload: Array[Byte]): Boolean
    def decode(payload: Array[Byte]): Option[Decoded]
  }

  private def u16le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
  private def i32le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) |
      ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows are
    * 4-byte padded, stored bottom-up unless height < 0. Emits row-major
    * top-down RGB (BMP stores BGR). Public format spec; no library. */
  object BmpCodec extends Codec {
    val name = "bmp"
    def sniff(p: Array[Byte]): Boolean =
      p.length > 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte
    def decode(p: Array[Byte]): Option[Decoded] =
      try {
        val off = i32le(p, 10); val w = i32le(p, 18); val hRaw = i32le(p, 22)
        val bpp = u16le(p, 28); val comp = i32le(p, 30)
        val h = math.abs(hRaw.toLong)
        // All size arithmetic in Long: a forged header with w or h near
        // Int.MaxValue must fail the bound check, not overflow past it.
        val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
        val outLen = w.toLong * h * 3
        if (bpp != 24 || comp != 0 || w <= 0 || hRaw == 0 ||
            hRaw == Int.MinValue || off < 54 || outLen > Int.MaxValue ||
            off.toLong + rowSizeL * h > p.length) None
        else {
          val rowSize = rowSizeL.toInt
          val hh = h.toInt
          val topDown = hRaw < 0
          val out = new Array[Byte](outLen.toInt)
          var y = 0
          while (y < hh) {
            val src = off + (if (topDown) y else hh - 1 - y) * rowSize
            var x = 0
            while (x < w) {
              val si = src + x * 3; val di = (y * w + x) * 3
              out(di) = p(si + 2); out(di + 1) = p(si + 1); out(di + 2) = p(si)
              x += 1
            }
            y += 1
          }
          Some(Decoded(name, w, hh, 3, out))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** PCM-16 WAV (RIFF/WAVE, format tag 1): walks the chunk list for
    * `fmt ` and `data`. Emits the raw little-endian PCM bytes;
    * width = frames per channel. Public format spec; no library. */
  object WavCodec extends Codec {
    val name = "wav"
    def sniff(p: Array[Byte]): Boolean =
      p.length > 44 &&
        p(0) == 'R'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == 'F'.toByte && p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
        p(10) == 'V'.toByte && p(11) == 'E'.toByte
    def decode(p: Array[Byte]): Option[Decoded] =
      try {
        // Walk offsets in Long: a forged chunk size near Int.MaxValue
        // must fail the bound check, not overflow `off + 8 + sz` negative.
        var off = 12L
        var channels = 0; var bits = 0; var fmtOk = false
        var data: Array[Byte] = null
        while (off + 8 <= p.length && (data == null || !fmtOk)) {
          val o = off.toInt
          val id = new String(p, o, 4, "US-ASCII")
          val sz = i32le(p, o + 4)
          if (sz < 0 || off + 8 + sz > p.length) { off = p.length.toLong }
          else {
            if (id == "fmt ") {
              fmtOk = u16le(p, o + 8) == 1 // PCM
              channels = u16le(p, o + 10)
              bits = u16le(p, o + 22)
            } else if (id == "data") {
              data = java.util.Arrays.copyOfRange(p, o + 8, o + 8 + sz)
            }
            off += 8L + sz + (sz & 1) // chunks are word-aligned
          }
        }
        if (!fmtOk || bits != 16 || channels < 1 || data == null) None
        else Some(Decoded(name, data.length / (2 * channels), 1, channels, data))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Codec chain, sniffed in order; first claimer decodes. */
  val codecs: Seq[Codec] = Seq(BmpCodec, WavCodec)

  /** Decode through the codec chain; stub fallback for unclaimed or
    * malformed payloads. Total — never throws on bad bytes. */
  def decodeAny(payload: Array[Byte]): Decoded =
    codecs.find(_.sniff(payload)).flatMap(_.decode(payload))
      .getOrElse(Decoded("stub", payload.length, 1, 1, payload))

  // ------------------------------------------------- fixture encoders

  /** Tiny BMP writer for fixtures/tests: row-major top-down RGB in,
    * bottom-up 24-bit BMP bytes out. */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb must be w*h*3 bytes")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xFFFF); put16(o + 2, v >>> 16)
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, size); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h); put16(26, 1); put16(28, 24); put32(30, 0)
    put32(34, rowSize * h)
    var y = 0
    while (y < h) {
      val dst = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val si = (y * w + x) * 3; val di = dst + x * 3
        out(di) = rgb(si + 2); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Tiny PCM-16 WAV writer for fixtures/tests. */
  def encodeWavPcm16(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xFFFF); put16(o + 2, v >>> 16)
    }
    def putStr(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    putStr(0, "RIFF"); put32(4, 36 + dataLen); putStr(8, "WAVE")
    putStr(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, channels)
    put32(24, sampleRate); put32(28, sampleRate * channels * 2)
    put16(32, channels * 2); put16(34, 16)
    putStr(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) { put16(44 + i * 2, samples(i).toInt); i += 1 }
    out
  }

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

  /** Truncate/zero-pad a decoded frame to a fixed byte budget (the
    * "resize" of this pipeline — real pixel resampling is a further
    * per-partition kernel on the decoded RGB). */
  private def fitFrame(decoded: Array[Byte], targetLen: Int): Array[Byte] = {
    val out = new Array[Byte](targetLen)
    var i = 0
    while (i < targetLen) {
      out(i) = if (i < decoded.length) decoded(i) else 0
      i += 1
    }
    out
  }

  /** Decode (codec chain, stub fallback) + resize (truncate/zero-pad to
    * `targetBytes`) + feature-extract (16-bin byte histogram,
    * L1-normalized) as ONE per-partition pass over the binary column.
    * Adds `decoded_format`/`decoded_width`/`decoded_height` (what the
    * codec saw), `frame` (binary) and `features` (array<double>, 16).
    */
  def decodeAndFeaturize(assets: DataFrame, targetBytes: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex("payload")
    val outSchema = assets.schema
      .add("decoded_format", StringType)
      .add("decoded_width", IntegerType)
      .add("decoded_height", IntegerType)
      .add("frame", BinaryType)
      .add("features", ArrayType(DoubleType, containsNull = false))
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](pIdx)
        val dec = decodeAny(payload)
        val frame = fitFrame(dec.data, targetBytes)
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
        Row.fromSeq(row.toSeq :+ dec.kind :+ dec.width :+ dec.height :+
          frame :+ hist.toSeq)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** REAL nearest-neighbor RGB resize on a decoded top-down row-major
    * frame (the pixel-resampling step [[fitFrame]]'s byte budget stood
    * in for): target pixel (x, y) samples source pixel
    * (⌊x·w/tw⌋, ⌊y·h/th⌋). Pure JVM, O(tw·th).
    */
  def resizeRgbNearest(rgb: Array[Byte], w: Int, h: Int,
      tw: Int, th: Int): Array[Byte] = {
    require(w > 0 && h > 0 && tw > 0 && th > 0,
      s"invalid resize ${w}x$h -> ${tw}x$th")
    require(rgb.length >= w * h * 3, s"rgb buffer ${rgb.length} < ${w * h * 3}")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * w / tw).toInt
        val so = (sy * w + sx) * 3
        val to = (y * tw + x) * 3
        out(to) = rgb(so); out(to + 1) = rgb(so + 1); out(to + 2) = rgb(so + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Image resize over the binary column: decode (codec chain) → real
    * pixel resample to (tw, th) for image payloads; non-image payloads
    * get a null `resized` (they have no pixel grid to resample — the
    * caller filters or routes them). Same per-partition kernel shape
    * as [[decodeAndFeaturize]]; at 100 TB this is one narrow pass,
    * partition-parallel, no shuffle.
    */
  def resizeImages(assets: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, s"target dims must be positive: ${tw}x$th")
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex("payload")
    val outSchema = assets.schema
      .add("resized", BinaryType)
      .add("resized_width", IntegerType)
      .add("resized_height", IntegerType)
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val dec = decodeAny(row.getAs[Array[Byte]](pIdx))
        val resized =
          if (dec.kind == BmpCodec.name)
            resizeRgbNearest(dec.data, dec.width, dec.height, tw, th)
          else null
        Row.fromSeq(row.toSeq :+ resized :+ tw :+ th)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Audio feature-extract for PCM-16 payloads: per-channel mean |amp|
    * and peak |amp| over the decoded samples — the stats an audio
    * curation filter keys on (silence / clipping detection). Non-audio
    * payloads yield null stats. One narrow per-partition pass.
    */
  def audioStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex("payload")
    val outSchema = assets.schema
      .add("audio_channels", IntegerType)
      .add("mean_abs_amp", ArrayType(DoubleType, containsNull = false))
      .add("peak_abs_amp", ArrayType(IntegerType, containsNull = false))
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val dec = decodeAny(row.getAs[Array[Byte]](pIdx))
        if (dec.kind != WavCodec.name || dec.width == 0)
          Row.fromSeq(row.toSeq :+ null :+ null :+ null)
        else {
          val ch = dec.channels
          val sums = new Array[Double](ch)
          val peaks = new Array[Int](ch)
          var f = 0
          while (f < dec.width) {
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              val s = ((dec.data(o) & 0xFF) | (dec.data(o + 1) << 8)).toShort
              val a = math.abs(s.toInt)
              sums(c) += a
              if (a > peaks(c)) peaks(c) = a
              c += 1
            }
            f += 1
          }
          var c = 0
          while (c < ch) { sums(c) /= dec.width; c += 1 }
          Row.fromSeq(row.toSeq :+ ch :+ sums.toSeq :+ peaks.toSeq)
        }
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

  /** Dump dir for mm1's FULL oracle (the mm2-family pattern): per-sf
    * scoped, placeholder substituted by Verify. */
  private def mm1FeatDir: String =
    new java.io.File(graft.util.Fixtures.dir + "/mm1_feats")
      .getAbsolutePath + "/{{SF_TAG}}"

  /** Decode/featurize pipeline entry. In-query gates: every row
    * produces a frame of exactly targetBytes, a 16-bin unit-sum
    * histogram; determinism (two runs, same checksum); metadata
    * consistent with payload length; and the REAL codec path — a
    * generated 24-bit BMP and PCM-16 WAV must decode with correct
    * dimensions while garbage falls back to the stub without error.
    *
    * FULL oracle since r14 (was rows-only; the dump pattern): the
    * emitted frame is the per-asset (asset_id, payload_len, frame_crc)
    * table; DuckDB re-derives asset_id AND payload_len INDEPENDENTLY
    * from the documents table (asset ids are doc ids; the payload is
    * the UTF-8 text encoding, so payload_len = octet_length(encode(
    * text))) and replays only the codec-bound frame_crc from the dump
    * — the id space and payload plumbing are cross-engine-verified,
    * the decode stage stays gate-verified (planted BMP/WAV/garbage).
    */
  val mm = QueryDef(
    "mm1_multimodal_pipeline",
    { (s, d) =>
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
    // the exact-side dump DuckDB joins back to the documents table
    val dump = resolvedDump(mm1FeatDir, d)
    feat.select(col("asset_id"),
        length(col("payload")).cast("long").as("payload_len"),
        crc32(col("frame")).as("frame_crc"))
      .write.mode("overwrite").parquet(dump)
    assets.unpersist(); feat.unpersist()
    val spark = s; import spark.implicits._
    // real-codec gate: planted BMP (5×3 RGB) + WAV (64 stereo samples →
    // 32 frames) + garbage, through the SAME distributed kernel
    val planted = Seq(
      (1L, encodeBmp24(5, 3, Array.tabulate(45)(i => (i * 7).toByte))),
      (2L, encodeWavPcm16(2, 8000, Array.tabulate(64)(i => (i * 33).toShort))),
      (3L, Array.tabulate(20)(i => (255 - i).toByte)))
      .toDF("asset_id", "payload")
      .withColumn("meta", struct(lit("planted").as("format"),
        lit(0).as("width"), lit(0).as("height"),
        length(col("payload")).cast("long").as("n_bytes")))
    val dec = decodeAndFeaturize(planted, 64)
      .select("asset_id", "decoded_format", "decoded_width", "decoded_height")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3)))
      .toMap
    val codecOk = dec(1L) == (("bmp", 5, 3)) && dec(2L) == (("wav", 32, 1)) &&
      dec(3L)._1 == "stub"
    // real resize: the planted 5×3 BMP resamples to 8×4 (96 RGB bytes),
    // non-images carry null; audio stats: the planted stereo WAV yields
    // 2 channels with positive mean amplitudes, non-audio null
    val rez = resizeImages(planted, 8, 4)
      .select(col("asset_id"), length(col("resized")).as("len"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val au = audioStats(planted)
      .select("asset_id", "audio_channels", "mean_abs_amp")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val resizeOk = rez(1L) == 8 * 4 * 3 && rez(2L) == -1 && rez(3L) == -1
    val audioOk = au(2L) == 2 && au(1L) == -1 && au(3L) == -1
    val ok = stats.getLong(0) > 0 && stats.getLong(1) == 0 &&
      stats.getLong(2) == 0 && stats.getDouble(3) < 1e-9 &&
      stats.getLong(4) == 0 && cks1 == cks2 && codecOk &&
      resizeOk && audioOk
    s.read.parquet(dump).filter(lit(ok))
    },
    oracle = Some(
      s"""SELECT doc_id AS asset_id,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
         |       f.frame_crc
         |FROM documents
         |JOIN read_parquet('$mm1FeatDir/*.parquet') f
         |  ON doc_id = f.asset_id""".stripMargin),
    benchEligible = false)

  // ------------------------------------------------ image near-dup (dHash)

  /** 64-bit difference hash (dHash) of an image payload: decode (codec
    * chain) → nearest-resize to 9×8 → integer grayscale → bit(y,x) =
    * gray(y,x+1) > gray(y,x). The standard perceptual near-dup
    * signature: brightness/contrast shifts preserve gradient SIGNS, so
    * re-encodes of the same image land within a few bits. Null for
    * payloads no image codec claims. One narrow per-partition pass —
    * payloads never leave their partition.
    */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    val dec = decodeAny(payload)
    if (dec.kind != BmpCodec.name) None
    else {
      val small = resizeRgbNearest(dec.data, dec.width, dec.height, 9, 8)
      var h = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          def gray(i: Int): Int = {
            val o = (y * 9 + i) * 3
            (299 * (small(o) & 0xFF) + 587 * (small(o + 1) & 0xFF) +
              114 * (small(o + 2) & 0xFF)) / 1000
          }
          if (gray(x + 1) > gray(x)) h |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(h)
    }
  }

  /** Adds `dhash` (nullable long) to an asset table. */
  def imageDHash(assets: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex(payloadCol)
    val outSchema = assets.schema.add("dhash", LongType)
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+
          dHash64(row.getAs[Array[Byte]](pIdx)).map(Long.box).orNull)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Near-dup image pairs by banded Hamming join: each 64-bit dhash
    * splits into 4×16-bit band keys; pairs sharing ANY band key are
    * candidates; exact `bit_count(xor)` filters to `maxDist`. The
    * pigeonhole bound makes recall EXACT for maxDist ≤ 3 (3 differing
    * bits cannot touch all 4 bands) — same banding argument as the
    * SimHash dedup family (llm/Dedup.scala:454). Candidates-only work:
    * never all-pairs, bucket sizes bounded by true duplicate-group
    * sizes plus 16-bit-key collisions.
    */
  def imageNearDupPairs(hashed: DataFrame, idCol: String,
      maxDist: Int, hashCol: String = "dhash"): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4x16 banding guarantees recall only for maxDist <= 3, got $maxDist")
    val withBands = hashed.filter(col(hashCol).isNotNull)
      .select(col(idCol), col(hashCol),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col(hashCol), b * 16).bitwiseAND(lit(0xFFFFL))
              .as("key"))): _*)).as("bk"))
      .select(col(idCol), col(hashCol), col("bk.band"), col("bk.key"))
    val l = withBands.select(col(idCol).as("a"), col(hashCol).as("ha"),
      col("band"), col("key"))
    val r = withBands.select(col(idCol).as("b"), col(hashCol).as("hb"),
      col("band"), col("key"))
    l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb").distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxDist)
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
  }

  /** Deterministic BMP fixture for mm2: 50 base 9×8 gray images (LCG
    * seeded by doc_id % 50), pixel-doubled to 18×16 so the kernel's
    * nearest resize is exercised non-trivially, with a per-variant
    * local value swap ((doc_id div 50) % 4) that nudges a few dHash
    * bits — same class ⇒ near hashes, different class ⇒ far. */
  private[llm] def syntheticBmp(docId: Long): Array[Byte] = {
    val cls = (docId % 50).toInt
    val v = ((docId / 50) % 4).toInt
    val g = new Array[Int](72)
    var st = cls * 2654435761L + 99991L
    var i = 0
    while (i < 72) {
      st = st * 6364136223846793005L + 1442695040888963407L
      g(i) = ((st >>> 33) % 256).toInt
      i += 1
    }
    if (v > 0) {
      val r = v % 8
      val t = g(r * 9 + v); g(r * 9 + v) = g(r * 9 + v + 1); g(r * 9 + v + 1) = t
    }
    val rgb = new Array[Byte](18 * 16 * 3)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val value = g((y / 2) * 9 + (x / 2)).toByte
        val o = (y * 18 + x) * 3
        rgb(o) = value; rgb(o + 1) = value; rgb(o + 2) = value
        x += 1
      }
      y += 1
    }
    encodeBmp24(18, 16, rgb)
  }

  /** Absolute so DuckDB (its own process, any cwd) reads the exact
    * files this JVM's query wrote — the a12 exact-side-dump pattern.
    * The `{{SF_TAG}}` segment scopes the dump PER SF DIRECTORY (r13
    * advice): concurrent Verify runs at different scales write
    * disjoint dumps, and Verify substitutes the placeholder with the
    * run's own [[graft.util.Fixtures.sfTag]] when it emits
    * oracle_sql.json, so DuckDB reads exactly this run's files. The
    * engine side resolves it via [[resolvedDump]]. */
  private def mm2HashDir: String =
    new java.io.File(graft.util.Fixtures.dir + "/mm2_hashes")
      .getAbsolutePath + "/{{SF_TAG}}"

  /** Engine-side resolution of the `{{SF_TAG}}` dump-path placeholder
    * — must match Verify's substitution exactly. */
  private def resolvedDump(template: String, sfDir: String): String =
    template.replace("{{SF_TAG}}", graft.util.Fixtures.sfTag(sfDir))

  /** MM2 — image near-dup over REAL decoded pixels: every document id
    * renders a deterministic BMP (50 visual classes × 4 variants),
    * the dHash kernel runs decode→resize→hash distributed, and the
    * banded Hamming join finds near pairs. Golden gate: the banded
    * candidate set must contain EVERY true ≤3-bit pair found by the
    * bounded per-class brute force (classes are small — group-local
    * quadratic work, never corpus-quadratic), every emitted pair must
    * verify ≤3 exactly, and all payloads must decode as BMP.
    *
    * FULL oracle since r13 (the a12 dump pattern): the decoded dHash
    * table is persisted beside the run and DuckDB brute-forces the
    * ENTIRE ≤3-bit pair graph over it — the 4×16 banding's pigeonhole
    * recall guarantee is global, so the banded join's emitted pairs
    * must equal the exhaustive truth set exactly, corpus-wide (a
    * stronger check than the class-local gate, which stays as an
    * emission condition on the decode side).
    */
  val mm2 = QueryDef.sql(
    "mm2_image_near_dup",
    s"""WITH h AS (SELECT doc_id, dhash
       |           FROM read_parquet('$mm2HashDir/*.parquet')
       |           WHERE dhash IS NOT NULL)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |       bit_count(xor(a.dhash, b.dhash)) AS dist
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin) { (s, d) =>
    val spark = s
    val docs = Tables.documents(s, d).select("doc_id")
    val pIdx = 0
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val assets = spark.createDataFrame(
      docs.rdd.mapPartitions(_.map { row =>
        val id = row.getLong(pIdx)
        Row(id, syntheticBmp(id))
      }), schema)
    val hashed = imageDHash(assets).select("doc_id", "dhash").cache()
    // the exact-side dump DuckDB replays the pair graph over
    hashed.write.mode("overwrite").parquet(resolvedDump(mm2HashDir, d))
    val nImages = hashed.count()
    val nDecoded = hashed.filter(col("dhash").isNotNull).count()
    val found = imageNearDupPairs(hashed, "doc_id", maxDist = 3)
      .select("a", "b", "dist").localCheckpoint(true)
    // ground truth within classes: bounded group-local brute force
    val byClass = hashed.withColumn("cls", col("doc_id") % 50)
    val t = byClass.select(col("cls"), col("doc_id").as("a"), col("dhash").as("ha"))
      .join(byClass.select(col("cls"), col("doc_id").as("b"),
        col("dhash").as("hb")), Seq("cls"))
      .filter(col("a") < col("b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select("a", "b")
    val expected = t.count()
    val missed = t.join(found, Seq("a", "b"), "left_anti").count()
    val badDist = found.filter(col("dist") > 3).count()
    val nFound = found.count()
    hashed.unpersist()
    val ok = nImages > 0 && nDecoded == nImages && expected > 0 &&
      missed == 0L && badDist == 0L && nFound >= expected
    found.filter(lit(ok))
  }

  // ------------------------------------------------ audio near-dup (envelope)

  /** 64-bit energy-envelope hash of a PCM-16 WAV payload: decode →
    * mono mean-|amplitude| over 65 equal sample windows → bit(i) =
    * env(i+1) > env(i). The audio analog of dHash: positive GAIN
    * changes scale every window mean by the same factor, so the
    * comparison bits — hence the hash — are gain-invariant, which is
    * exactly what re-encoded/re-normalized copies of the same clip
    * need. None for non-audio payloads or clips shorter than 65
    * frames. Per-partition kernel; payloads never shuffle.
    */
  def audioEnvelopeHash64(payload: Array[Byte]): Option[Long] = {
    val dec = decodeAny(payload)
    if (dec.kind != WavCodec.name || dec.width < 65) None
    else {
      val frames = dec.width; val ch = dec.channels
      val env = new Array[Double](65)
      var w = 0
      while (w < 65) {
        val lo = (w.toLong * frames / 65).toInt
        val hi = ((w + 1).toLong * frames / 65).toInt
        var s = 0.0
        var f = lo
        while (f < hi) {
          var c = 0
          while (c < ch) {
            val o = (f * ch + c) * 2
            s += math.abs((((dec.data(o) & 0xFF) |
              (dec.data(o + 1) << 8)).toShort).toInt)
            c += 1
          }
          f += 1
        }
        env(w) = if (hi > lo) s / ((hi - lo) * ch) else 0.0
        w += 1
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        if (env(i + 1) > env(i)) h |= 1L << i
        i += 1
      }
      Some(h)
    }
  }

  /** Adds `ahash` (nullable long) to an asset table. */
  def audioEnvelopeHash(assets: DataFrame,
      payloadCol: String = "payload"): DataFrame = {
    val spark = assets.sparkSession
    val pIdx = assets.schema.fieldIndex(payloadCol)
    val outSchema = assets.schema.add("ahash", LongType)
    val out = assets.rdd.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+
          audioEnvelopeHash64(row.getAs[Array[Byte]](pIdx)).map(Long.box).orNull)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Deterministic WAV fixture for mm3: 50 base clips (650 samples =
    * 10 per envelope window, LCG square-wave mixture keyed by
    * doc_id % 50), variant gain ×(1 + v/4) — hash-invariant by
    * design — plus, for v>0, a localized sample spike that nudges
    * 1-2 envelope bits. */
  private[llm] def syntheticWav(docId: Long): Array[Byte] = {
    val cls = (docId % 50).toInt
    val v = ((docId / 50) % 4).toInt
    val n = 650
    val s = new Array[Short](n)
    var st = cls * 2654435761L + 77731L
    // per-window base level, constant within each 10-sample window so
    // the envelope is well separated between windows
    val levels = new Array[Int](65)
    var w = 0
    while (w < 65) {
      st = st * 6364136223846793005L + 1442695040888963407L
      levels(w) = 500 + ((st >>> 33) % 12000).toInt
      w += 1
    }
    var i = 0
    while (i < n) {
      val base = levels(i / 10)
      val sign = if (i % 2 == 0) 1 else -1 // square wave: |amp| = base
      var amp = base * (4 + v) / 4 // gain variant (envelope-relation safe)
      if (v > 0 && i / 10 == v * 7 && i % 10 == 3) amp += 24000 // spike
      s(i) = (sign * math.min(amp, 32767)).toShort
      i += 1
    }
    encodeWavPcm16(1, 8000, s)
  }

  /** MM3 — audio near-dup over REAL decoded PCM: every document id
    * renders a deterministic WAV (50 clip classes × 4 gain/spike
    * variants), the envelope-hash kernel runs decode→window→hash
    * distributed, and the SAME 4×16-band Hamming join as mm2 finds
    * near pairs (the banding is payload-agnostic — one machinery for
    * image and audio signatures). Golden gate mirrors mm2: banded
    * pairs must cover the bounded per-class brute-force truth
    * exactly, every pair verifies ≤ 3 bits, all payloads decode.
    */
  private def mm3HashDir: String =
    new java.io.File(graft.util.Fixtures.dir + "/mm3_hashes")
      .getAbsolutePath + "/{{SF_TAG}}"

  /** FULL oracle since r13, mirroring mm2: the decoded envelope-hash
    * table is dumped and DuckDB brute-forces the global ≤3-bit pair
    * graph over it — banded pairs must equal the exhaustive truth. */
  val mm3 = QueryDef.sql(
    "mm3_audio_near_dup",
    s"""WITH h AS (SELECT doc_id, ahash
       |           FROM read_parquet('$mm3HashDir/*.parquet')
       |           WHERE ahash IS NOT NULL)
       |SELECT a.doc_id AS a, b.doc_id AS b,
       |       bit_count(xor(a.ahash, b.ahash)) AS dist
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3""".stripMargin) { (s, d) =>
    val spark = s
    val docs = Tables.documents(s, d).select("doc_id")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val assets = spark.createDataFrame(
      docs.rdd.mapPartitions(_.map { row =>
        val id = row.getLong(0)
        Row(id, syntheticWav(id))
      }), schema)
    val hashed = audioEnvelopeHash(assets).select("doc_id", "ahash").cache()
    hashed.write.mode("overwrite").parquet(resolvedDump(mm3HashDir, d))
    val nClips = hashed.count()
    val nDecoded = hashed.filter(col("ahash").isNotNull).count()
    val found = imageNearDupPairs(hashed, "doc_id", maxDist = 3,
      hashCol = "ahash").select("a", "b", "dist").localCheckpoint(true)
    val byClass = hashed.withColumn("cls", col("doc_id") % 50)
    val t = byClass.select(col("cls"), col("doc_id").as("a"), col("ahash").as("ha"))
      .join(byClass.select(col("cls"), col("doc_id").as("b"), col("ahash").as("hb")),
        Seq("cls"))
      .filter(col("a") < col("b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select("a", "b")
    val expected = t.count()
    val missed = t.join(found, Seq("a", "b"), "left_anti").count()
    val badDist = found.filter(col("dist") > 3).count()
    val nFound = found.count()
    hashed.unpersist()
    val ok = nClips > 0 && nDecoded == nClips && expected > 0 &&
      missed == 0L && badDist == 0L && nFound >= expected
    found.filter(lit(ok))
  }

  // ------------------------------------------------ video frame pipeline

  /** Minimal multi-frame container ("GVID": magic + u32le frame count
    * + u32le per-frame lengths + concatenated frame payloads, each an
    * independent BMP). Stands in for a real demuxer the way BmpCodec
    * stands in for image decoders: the Spark-side plumbing — binary
    * column in, per-partition decode, frame explode, hash — is the
    * production shape; only the codec is the deterministic fixture.
    */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + 4 * frames.size + frames.map(_.length).sum
    val out = new Array[Byte](total)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    def put32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    put32(4, frames.size)
    var off = 8 + 4 * frames.size
    frames.zipWithIndex.foreach { case (f, i) =>
      put32(8 + 4 * i, f.length)
      System.arraycopy(f, 0, out, off, f.length)
      off += f.length
    }
    out
  }

  def decodeVideoFrames(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (payload.length < 8 || payload(0) != 'G' || payload(1) != 'V' ||
      payload(2) != 'I' || payload(3) != 'D') None
    else {
      val n = i32le(payload, 4)
      if (n < 0 || 8 + 4L * n > payload.length) None
      else {
        var off = 8 + 4 * n
        val frames = Vector.newBuilder[Array[Byte]]
        var i = 0
        var ok = true
        while (i < n && ok) {
          val len = i32le(payload, 8 + 4 * i)
          if (len < 0 || off + len > payload.length) ok = false
          else {
            frames += java.util.Arrays.copyOfRange(payload, off, off + len)
            off += len
          }
          i += 1
        }
        if (ok) Some(frames.result()) else None
      }
    }
  }

  /** Decode + frame-sample + per-frame dHash in ONE partition pass:
    * (id, frame_idx, dhash) for every stride-th frame. Payloads never
    * shuffle — only 16-byte hash rows leave the scan, which is the
    * whole point at 100 TB video scale (the binary column is ~10⁶×
    * the signature column). Undecodable payloads drop (null-safe).
    */
  def videoFrameHashes(assets: DataFrame, stride: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = assets.sparkSession
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val out = assets.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.get(idIdx)
        decodeVideoFrames(row.getAs[Array[Byte]](pIdx)) match {
          case None => Iterator.empty
          case Some(frames) =>
            frames.indices.iterator.filter(_ % stride == 0).map { f =>
              Row(id, f, dHash64(frames(f)).map(Long.box).orNull)
            }
        }
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Video near-dup by frame-set overlap (the content-based
    * video-retrieval shape: per-frame fingerprints → inverted match →
    * sequence-level verify). Candidates come ONLY from the mm2 banded
    * Hamming machinery applied per frame (pigeonhole-exact for
    * maxDist ≤ 3: any video pair with even ONE close frame pair is a
    * candidate); verification counts, per candidate pair, the
    * fraction of a's sampled frames with a ≤maxDist match in b.
    * Never all-pairs across videos; the frame-level verify join is
    * candidate-bounded.
    */
  def videoNearDupPairs(frameHashes: DataFrame, idCol: String,
      maxDist: Int, minMatchFrac: Double): DataFrame = {
    val fh = frameHashes.filter(col("dhash").isNotNull)
    val frameCand = imageNearDupPairs(
      fh.select(col(idCol), col("frame_idx"), col("dhash"))
        .withColumn("fid",
          concat_ws(":", col(idCol).cast("string"),
            col("frame_idx").cast("string"))),
      "fid", maxDist, "dhash")
    // frame-level matches → video-level candidates (a < b by id text
    // split; re-derive the numeric ids from the packed fid)
    val cand = frameCand.select(
        split(col("a"), ":").getItem(0).cast("long").as("a"),
        split(col("b"), ":").getItem(0).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val fa = fh.select(col(idCol).as("a"), col("frame_idx").as("ia"),
      col("dhash").as("ha"))
    val fb = fh.select(col(idCol).as("b"), col("frame_idx").as("ib"),
      col("dhash").as("hb"))
    val nFrames = fh.groupBy(col(idCol).as("a"))
      .agg(count(lit(1)).as("n_a"))
    cand.join(fa, "a").join(fb, "b")
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxDist)
      .groupBy("a", "b")
      .agg(countDistinct(col("ia")).as("matched_a"))
      .join(nFrames, "a")
      .withColumn("match_frac",
        col("matched_a").cast("double") / col("n_a").cast("double"))
      .filter(col("match_frac") >= minMatchFrac)
      .select(col("a"), col("b"), col("matched_a"), col("n_a"),
        round(col("match_frac"), 6).as("match_frac"))
  }

  /** Shot-boundary detection over a frame-hash table (stride=1): a
    * boundary is a consecutive-frame dHash Hamming jump above
    * `maxIntraDist` — the classic cut detector, and the step that
    * feeds keyframe extraction (one representative frame per shot)
    * in video training-data pipelines. Input is [[videoFrameHashes]]
    * output, so payloads never reach this stage: the lag window moves
    * 8-byte hashes only, partitioned per video (groups bounded by
    * frame count, never corpus size).
    *
    * Emits one row per INPUT frame — unhashable frames (null dhash,
    * e.g. a non-BMP frame mid-container) are kept, never cut on, and
    * inherit the current shot; the next hashed frame compares against
    * the last HASHED predecessor (ignore-nulls lag), so a real cut
    * separated by a bad frame is still attributed to the first frame
    * that can prove it. Columns: (id, frame_idx, dhash, dist — null on
    * each video's first hashed frame and on unhashable frames,
    * is_boundary, shot_idx — running boundary count, so frames group
    * into shots directly).
    */
  def videoShotBoundaries(frameHashes: DataFrame, idCol: String = "doc_id",
      maxIntraDist: Int = 10): DataFrame = {
    require(maxIntraDist >= 0, s"maxIntraDist must be >= 0: $maxIntraDist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("frame_idx")
    val prevHashed = last(col("dhash"), ignoreNulls = true).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1))
    frameHashes
      .withColumn("dist", bit_count(prevHashed.bitwiseXOR(col("dhash"))))
      .withColumn("is_boundary",
        coalesce(col("dist") > maxIntraDist, lit(false)))
      .withColumn("shot_idx",
        sum(when(col("is_boundary"), 1L).otherwise(0L)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
  }

  /** Multi-shot video fixture for mm5: 2 + (docId % 3) shots of 4
    * frames each, with DETERMINISTIC margins at any scale factor (no
    * probabilistic cross-shot hash distance anywhere — a random-grid
    * fixture would fail some doc eventually at ~1e-8/boundary). Shots
    * alternate a strictly-increasing / strictly-decreasing per-row
    * brightness gradient, so the base dHash is all-ones / all-zeros:
    * cross-shot distance is 64 minus the nudges' ≤ 3+3 bits ≥ 58.
    * Within a shot, frames differ by a single adjacent-cell swap
    * confined to one row (≤ 3 bits off the base ⇒ any two frames of
    * the shot ≤ 6 apart). 6 < maxIntraDist = 10 < 58, both provable.
    */
  private[llm] def syntheticShotFrame(shotIdx: Int, frame: Int): Array[Byte] = {
    val g = new Array[Int](72)
    var i = 0
    while (i < 72) {
      val c = i % 9
      g(i) = if (shotIdx % 2 == 0) c * 28 else (8 - c) * 28
      i += 1
    }
    val r = frame % 8
    val c = frame % 7
    val t = g(r * 9 + c); g(r * 9 + c) = g(r * 9 + c + 1); g(r * 9 + c + 1) = t
    val rgb = new Array[Byte](18 * 16 * 3)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val value = g((y / 2) * 9 + (x / 2)).toByte
        val o = (y * 18 + x) * 3
        rgb(o) = value; rgb(o + 1) = value; rgb(o + 2) = value
        x += 1
      }
      y += 1
    }
    encodeBmp24(18, 16, rgb)
  }

  private[llm] val shotFramesPerShot = 4
  private[llm] def shotsFor(docId: Long): Int = 2 + (docId % 3).toInt

  private[llm] def syntheticShotVideo(docId: Long): Array[Byte] = {
    val nShots = shotsFor(docId)
    encodeVideo((0 until nShots).flatMap { sIdx =>
      (0 until shotFramesPerShot).map(f => syntheticShotFrame(sIdx, f))
    })
  }

  /** MM5 — shot-boundary detection + keyframe census over the full
    * pipeline: container decode → stride-1 frame hashing → lag-window
    * cut detector. Golden gates: every video decodes; the DETECTED
    * boundary set equals the PLANTED one exactly (both anti-join
    * directions empty — no missed cut, no false cut, at any sf); the
    * per-video shot count equals 1 + boundaries (shot_idx consistency);
    * keyframes (first frame of each shot) number exactly n_shots.
    */
  private def mm5HashDir: String =
    new java.io.File(graft.util.Fixtures.dir + "/mm5_hashes")
      .getAbsolutePath + "/{{SF_TAG}}"

  /** FULL oracle since r13 (the dump pattern): the decoded frame-hash
    * table is persisted and DuckDB replays the cut detector — last
    * non-null hash over the preceding frames, Hamming jump > 10 — so
    * the emitted boundary set is externally hash-verified; the planted
    * missed/spurious gates stay as emission conditions. */
  val mm5 = QueryDef(
    "mm5_video_shot_detect",
    mm5Fn,
    oracle = Some(
      s"""WITH fh AS (SELECT doc_id, frame_idx, dhash
         |            FROM read_parquet('$mm5HashDir/*.parquet')),
         |w AS (SELECT doc_id, frame_idx, dhash,
         |             last_value(dhash IGNORE NULLS) OVER (
         |               PARTITION BY doc_id ORDER BY frame_idx
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |               AS ph
         |      FROM fh)
         |SELECT doc_id, frame_idx FROM w
         |WHERE ph IS NOT NULL AND dhash IS NOT NULL
         |  AND bit_count(xor(dhash, ph)) > 10""".stripMargin))

  private def mm5Fn: (org.apache.spark.sql.SparkSession, String) => DataFrame = { (s, d) =>
    val spark = s
    val docs = Tables.documents(s, d).select("doc_id")
    val assets = spark.createDataFrame(
      docs.rdd.mapPartitions(_.map { row =>
        val id = row.getLong(0)
        Row(id, syntheticShotVideo(id))
      }), StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false))))
    val fh = videoFrameHashes(assets, stride = 1)
    fh.select(col("doc_id"), col("frame_idx"), col("dhash"))
      .write.mode("overwrite").parquet(resolvedDump(mm5HashDir, d))
    val marked = videoShotBoundaries(fh, "doc_id", maxIntraDist = 10)
      .cache()
    val detected = marked.filter(col("is_boundary"))
      .select(col("doc_id"), col("frame_idx"))
    // planted: a cut at every shot start (frames 4, 8, ...)
    val planted = docs.select(col("doc_id"),
        explode(sequence(lit(1),
          (lit(1) + col("doc_id") % 3).cast("int"))).as("s"))
      .select(col("doc_id"), (col("s") * shotFramesPerShot).as("frame_idx"))
    val missed = planted.join(detected, Seq("doc_id", "frame_idx"),
      "left_anti").count()
    val spurious = detected.join(planted, Seq("doc_id", "frame_idx"),
      "left_anti").count()
    // (no max(shot_idx)-vs-boundary-count check: shot_idx is the
    // running sum of is_boundary over the same window, so the two are
    // equal by construction — a tautology, not a gate)
    val perVideo = marked.groupBy("doc_id")
      .agg(sum(when(col("is_boundary"), 1L).otherwise(0L)).as("n_bounds"),
        countDistinct(when(col("frame_idx") % shotFramesPerShot === 0,
          col("frame_idx"))).as("n_keyframes"))
    val badShotIdx = perVideo
      .filter(col("n_keyframes") =!= col("n_bounds") + 1).count()
    val nVideos = docs.count()
    val nDecoded = marked.select("doc_id").distinct().count()
    val detectedP = detected.localCheckpoint(true)
    val nBoundaries = detectedP.count()
    marked.unpersist()
    val ok = nVideos > 0 && nDecoded == nVideos && nBoundaries > 0 &&
      missed == 0L && spurious == 0L && badShotIdx == 0L
    detectedP.filter(lit(ok))
  }

  /** Deterministic video fixture: 50 scenes × 4 variants, 12 frames
    * each. A variant temporally shifts the scene by 2·v frames (even
    * shift keeps the stride-2 sampling lattice aligned — real CBVR
    * systems get the same invariance from keyframe alignment rather
    * than fixed-stride sampling) and applies the mm2 per-frame pixel
    * nudge, so same-scene frames hash within a few bits and different
    * scenes are far.
    */
  private[llm] def syntheticFrameBmp(cls: Int, frame: Int, v: Int): Array[Byte] = {
    val g = new Array[Int](72)
    var st = (cls * 977L + frame) * 2654435761L + 99991L
    var i = 0
    while (i < 72) {
      st = st * 6364136223846793005L + 1442695040888963407L
      g(i) = ((st >>> 33) % 256).toInt
      i += 1
    }
    if (v > 0) {
      val r = v % 8
      val t = g(r * 9 + v); g(r * 9 + v) = g(r * 9 + v + 1); g(r * 9 + v + 1) = t
    }
    val rgb = new Array[Byte](18 * 16 * 3)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val value = g((y / 2) * 9 + (x / 2)).toByte
        val o = (y * 18 + x) * 3
        rgb(o) = value; rgb(o + 1) = value; rgb(o + 2) = value
        x += 1
      }
      y += 1
    }
    encodeBmp24(18, 16, rgb)
  }

  private[llm] def syntheticVideo(docId: Long, nScenes: Int = 50,
      nFrames: Int = 12): Array[Byte] = {
    val cls = (docId % nScenes).toInt
    val v = ((docId / nScenes) % 4).toInt
    encodeVideo((0 until nFrames).map(f =>
      syntheticFrameBmp(cls, (f + 2 * v) % nFrames, v)))
  }

  /** MM4 — video near-dup over the full pipeline: container decode →
    * stride-2 frame sampling → per-frame dHash (one partition pass,
    * payloads never shuffle) → banded frame match → overlap verify.
    * Golden gates: every video decodes; the found pair set contains
    * EVERY within-scene pair that satisfies the overlap criterion
    * under the bounded per-scene brute force (pigeonhole recall per
    * frame makes this exact); every emitted pair re-verifies.
    */
  private def mm4HashDir: String =
    new java.io.File(graft.util.Fixtures.dir + "/mm4_hashes")
      .getAbsolutePath + "/{{SF_TAG}}"

  /** FULL oracle since r13 (the dump pattern): the sampled frame-hash
    * table is persisted and DuckDB brute-forces the GLOBAL overlap
    * criterion over it — every video pair with ≥ 50% of the smaller
    * id's frames matched at ≤ 3 bits. Per-frame pigeonhole recall
    * makes the engine's banded candidate set globally complete, so
    * the emitted pairs must equal the exhaustive truth corpus-wide
    * (stronger than the scene-local gate, which stays as an emission
    * condition). */
  val mm4 = QueryDef(
    "mm4_video_near_dup",
    mm4Fn,
    oracle = Some(
      s"""WITH fh AS (SELECT doc_id, frame_idx, dhash
         |            FROM read_parquet('$mm4HashDir/*.parquet')
         |            WHERE dhash IS NOT NULL),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, a.frame_idx AS ia
         |      FROM fh a JOIN fh b ON a.doc_id < b.doc_id
         |       AND bit_count(xor(a.dhash, b.dhash)) <= 3),
         |m AS (SELECT a, b, count(DISTINCT ia) AS matched_a
         |      FROM p GROUP BY 1, 2),
         |n AS (SELECT doc_id AS a, count(*) AS n_a FROM fh GROUP BY 1)
         |SELECT m.a, m.b, matched_a, n_a,
         |       round(matched_a * 1.0 / n_a, 6) AS match_frac
         |FROM m JOIN n USING (a)
         |WHERE matched_a * 1.0 / n_a >= 0.5""".stripMargin))

  private def mm4Fn: (org.apache.spark.sql.SparkSession, String) => DataFrame = { (s, d) =>
    val spark = s
    val docs = Tables.documents(s, d).select("doc_id")
    // scene count scales WITH the corpus (≥50, ~10 videos/scene), so
    // duplicate-group size — and with it every group-local quadratic
    // (bucket joins, the truth brute force) — stays bounded at any sf
    // instead of growing linearly with corpus size
    val nDocs = docs.count()
    val nScenes = math.max(50L, nDocs / 10L).toInt
    val assets = spark.createDataFrame(
      docs.rdd.mapPartitions(_.map { row =>
        val id = row.getLong(0)
        Row(id, syntheticVideo(id, nScenes))
      }), StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false))))
    val nVideos = nDocs
    val fh = videoFrameHashes(assets, stride = 2).cache()
    fh.select(col("doc_id"), col("frame_idx"), col("dhash"))
      .write.mode("overwrite").parquet(resolvedDump(mm4HashDir, d))
    val nHashed = fh.filter(col("dhash").isNotNull)
      .select("doc_id").distinct().count()
    val found = videoNearDupPairs(fh, "doc_id", maxDist = 3,
      minMatchFrac = 0.5).localCheckpoint(true)
    // truth: same-scene pairs under the SAME criterion, scene-local
    // brute force (scenes are bounded groups, never corpus-quadratic)
    val byCls = fh.filter(col("dhash").isNotNull)
      .withColumn("cls", col("doc_id") % nScenes)
    val fa = byCls.select(col("cls"), col("doc_id").as("a"),
      col("frame_idx").as("ia"), col("dhash").as("ha"))
    val fb = byCls.select(col("cls"), col("doc_id").as("b"),
      col("frame_idx").as("ib"), col("dhash").as("hb"))
    val nA = byCls.groupBy(col("doc_id").as("a"))
      .agg(count(lit(1)).as("n_a"))
    val truth = fa.join(fb, Seq("cls")).filter(col("a") < col("b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .groupBy("a", "b").agg(countDistinct(col("ia")).as("m"))
      .join(nA, "a")
      .filter(col("m").cast("double") / col("n_a").cast("double") >= 0.5)
      .select("a", "b").cache()
    val nTruth = truth.count()
    val missed = truth.join(found.select("a", "b"), Seq("a", "b"),
      "left_anti").count()
    val badFrac = found.filter(col("match_frac") > 1.0 ||
      col("match_frac") < 0.5).count()
    val nFound = found.count()
    fh.unpersist(); truth.unpersist()
    val ok = nVideos > 0 && nHashed == nVideos && nTruth > 0 &&
      missed == 0L && badFrac == 0L && nFound >= nTruth
    found.filter(lit(ok))
  }

  /** First-touch warm-up for the codec/fingerprint kernels (called by
    * Bench before timing): a miniature end-to-end video near-dup —
    * container + BMP decode, dHash, banded frame Hamming, overlap
    * verify — on 48 tiny synthetic videos. r10's committed artifacts
    * showed mm4 at 23.5 s cold vs 4.8 s isolated-warm; the gap is
    * class-load + JIT of exactly these kernels landing inside the
    * first timed query that touches them, same first-touch class as
    * the span/graph warmups already in Bench.
    */
  def warmup(spark: org.apache.spark.sql.SparkSession): Unit = {
    val assets = spark.createDataFrame(
      spark.range(48).rdd.map(i =>
        Row(i, syntheticVideo(i, nScenes = 8))),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false))))
    val hashes = videoFrameHashes(assets, stride = 2)
    videoNearDupPairs(hashes, "doc_id", maxDist = 3, minMatchFrac = 0.5)
      .write.format("noop").mode("overwrite").save()
    // mm5's lag-window path (last(ignoreNulls) over unbounded-preceding +
    // bit_count + running boundary sum) is a different physical shape from
    // the banded join above — r11's driver-run artifact showed mm5 at
    // 11.2 s cold while the committed warm number was ~3 s, i.e. the shot
    // detector's window machinery was still un-warmed. One miniature pass
    // here eats that JIT outside the timed region.
    videoShotBoundaries(hashes, "doc_id", maxIntraDist = 10)
      .write.format("noop").mode("overwrite").save()
  }

  def all: Seq[QueryDef] = Seq(mm, mm2, mm3, mm4, mm5)
}
