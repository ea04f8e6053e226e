package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pure-JVM codec round-trips and the decode kernel's fallback
  * behavior (the multimodal plumbing's real-decoder path).
  */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("BMP 24-bit round-trip is pixel-exact (padded row width)") {
    // w=5 → rowSize 16 with 1 pad byte: exercises the padding path
    val rgb = Array.tabulate(5 * 3 * 3)(i => ((i * 11 + 3) % 256).toByte)
    val bytes = encodeBmp24(5, 3, rgb)
    val dec = BmpCodec.decode(bytes).get
    assert(dec.kind == "bmp" && dec.width == 5 && dec.height == 3 &&
      dec.channels == 3)
    assert(dec.data.sameElements(rgb))
  }

  test("WAV PCM-16 round-trip is sample-exact") {
    val samples = Array.tabulate[Short](128)(i => ((i * 257) - 9000).toShort)
    val bytes = encodeWavPcm16(2, 44100, samples)
    val dec = WavCodec.decode(bytes).get
    assert(dec.kind == "wav" && dec.width == 64 && dec.channels == 2)
    val back = Array.tabulate[Short](128)(i =>
      ((dec.data(2 * i) & 0xFF) | (dec.data(2 * i + 1) << 8)).toShort)
    assert(back.sameElements(samples))
  }

  test("malformed payloads fall back to stub, never throw") {
    // truncated BMP: valid magic + header, payload cut short
    val full = encodeBmp24(4, 4, new Array[Byte](48))
    val truncated = java.util.Arrays.copyOf(full, 56)
    assert(BmpCodec.sniff(truncated) && BmpCodec.decode(truncated).isEmpty)
    assert(decodeAny(truncated).kind == "stub")
    // WAV with a non-PCM format tag
    val wav = encodeWavPcm16(1, 8000, new Array[Short](32))
    wav(20) = 3 // IEEE float tag
    assert(WavCodec.decode(wav).isEmpty && decodeAny(wav).kind == "stub")
    // arbitrary junk
    assert(decodeAny(Array[Byte](1, 2, 3)).kind == "stub")
  }

  test("resizeRgbNearest: hand-computed pixel mapping, up and down") {
    // 2x2 source: R G / B W, row-major top-down RGB
    val rgb = Array[Byte](
      127, 0, 0, /**/ 0, 127, 0,
      0, 0, 127, /**/ 127, 127, 127)
    // 4x4 upsample: each source pixel becomes a 2x2 block
    val up = resizeRgbNearest(rgb, 2, 2, 4, 4)
    def px(a: Array[Byte], w: Int, x: Int, y: Int) =
      (a((y * w + x) * 3), a((y * w + x) * 3 + 1), a((y * w + x) * 3 + 2))
    assert(px(up, 4, 0, 0) == ((127.toByte, 0.toByte, 0.toByte)))
    assert(px(up, 4, 1, 1) == ((127.toByte, 0.toByte, 0.toByte)))
    assert(px(up, 4, 2, 0) == ((0.toByte, 127.toByte, 0.toByte)))
    assert(px(up, 4, 0, 3) == ((0.toByte, 0.toByte, 127.toByte)))
    assert(px(up, 4, 3, 3) == ((127.toByte, 127.toByte, 127.toByte)))
    // 1x1 downsample keeps the top-left source pixel (floor mapping)
    val down = resizeRgbNearest(rgb, 2, 2, 1, 1)
    assert(px(down, 1, 0, 0) == ((127.toByte, 0.toByte, 0.toByte)))
  }

  test("resizeImages: images resample, non-images yield null") {
    import spark.implicits._
    val planted = Seq(
      (1L, encodeBmp24(6, 2, Array.tabulate(36)(i => i.toByte))),
      (2L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val got = Multimodal.resizeImages(planted, tw = 3, th = 4)
      .select("asset_id", "resized", "resized_width", "resized_height")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getAs[Array[Byte]](1).length)).toMap
    assert(got(1L) == 3 * 4 * 3)
    assert(got(2L) == -1)
  }

  test("audioStats: per-channel mean/peak amplitude from PCM-16") {
    import spark.implicits._
    // ch0 = constant +100, ch1 alternates ±200: mean |amp| 100 / 200,
    // peaks 100 / 200
    val samples = Array.tabulate[Short](40) { i =>
      if (i % 2 == 0) 100 else if ((i / 2) % 2 == 0) 200 else -200
    }
    val planted = Seq(
      (1L, encodeWavPcm16(2, 8000, samples)),
      (2L, "junk".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
    val rows = Multimodal.audioStats(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    val a = rows(1L)
    assert(a.getInt(2) == 2)
    assert(a.getSeq[Double](3) == Seq(100.0, 200.0))
    assert(a.getSeq[Int](4) == Seq(100, 200))
    assert(rows(2L).isNullAt(2))
  }

  test("decodeAndFeaturize routes BMP/WAV/junk through one kernel") {
    import spark.implicits._
    val planted = Seq(
      (1L, encodeBmp24(6, 2, Array.tabulate(36)(i => i.toByte))),
      (2L, encodeWavPcm16(1, 8000, Array.tabulate(20)(i => i.toShort))),
      (3L, "plain text payload".getBytes("UTF-8")))
      .toDF("asset_id", "payload")
      .withColumn("meta", struct(lit("t").as("format"), lit(0).as("width"),
        lit(0).as("height"), length(col("payload")).cast("long").as("n_bytes")))
    val got = Multimodal.decodeAndFeaturize(planted, targetBytes = 32)
      .select("asset_id", "decoded_format", "decoded_width", "decoded_height")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got(1L) == (("bmp", 6, 2)))
    assert(got(2L) == (("wav", 20, 1)))
    assert(got(3L)._1 == "stub")
  }

  private def grayBmp(w: Int, h: Int, g: Array[Int]): Array[Byte] =
    Multimodal.encodeBmp24(w, h, Array.tabulate(w * h * 3)(i => g(i / 3).toByte))

  test("shot fixture margins: intra-shot <= 6 bits, cross-shot >= 52, " +
      "for EVERY (shot parity, frame) — the whole fixture space") {
    def h(sIdx: Int, f: Int): Long = dHash64(syntheticShotFrame(sIdx, f)).get
    // shot content depends only on shot parity and frame, and frames
    // range over 0 until shotFramesPerShot — so this enumeration covers
    // every frame any video at any scale factor can contain, making the
    // margins deterministic, not sampled
    for (parity <- 0 to 1) {
      val hs = (0 until shotFramesPerShot).map(h(parity, _))
      for (a <- hs; b <- hs)
        assert(java.lang.Long.bitCount(a ^ b) <= 6,
          s"intra-shot distance blew the nudge bound for parity $parity")
    }
    for (fa <- 0 until shotFramesPerShot; fb <- 0 until shotFramesPerShot)
      assert(java.lang.Long.bitCount(h(0, fa) ^ h(1, fb)) >= 52,
        s"cross-shot distance under margin for frames $fa/$fb")
  }

  test("videoShotBoundaries: planted cuts detected exactly, shots indexed") {
    import spark.implicits._
    val assets = spark.createDataFrame(
      Seq(3L, 4L, 5L).toDF("doc_id").rdd.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          syntheticShotVideo(r.getLong(0)))
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType, nullable = false))))
    val marked = videoShotBoundaries(
      videoFrameHashes(assets, stride = 1), "doc_id", maxIntraDist = 10)
    val got = marked.filter(col("is_boundary"))
      .select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = (for {
      doc <- Seq(3L, 4L, 5L)
      s <- 1 until shotsFor(doc)
    } yield (doc, s * shotFramesPerShot)).toSet
    assert(got == want)
    // shot_idx labels every frame with its shot ordinal
    val lastShot = marked.groupBy("doc_id")
      .agg(max(col("shot_idx")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(3L, 4L, 5L).forall(d => lastShot(d) == shotsFor(d) - 1L))
  }

  test("dHash64: brightness shift preserves the hash; non-image is None") {
    val g = Array.tabulate(72)(i => (i * 37 + 11) % 200)
    val base = Multimodal.dHash64(grayBmp(9, 8, g)).get
    val bright = Multimodal.dHash64(grayBmp(9, 8, g.map(_ + 40))).get
    assert(base == bright, "gradient signs must survive a brightness shift")
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("dHash64: pixel-doubled image resizes back to the same hash") {
    val g = Array.tabulate(72)(i => (i * 53 + 7) % 256)
    val doubled = Array.tabulate(18 * 16)(i => g((i / 18 / 2) * 9 + (i % 18) / 2))
    val h1 = Multimodal.dHash64(grayBmp(9, 8, g)).get
    val h2 = Multimodal.dHash64(grayBmp(18, 16, doubled)).get
    assert(h1 == h2)
  }

  test("dHash64: a local value swap moves only a few bits") {
    val g = Array.tabulate(72)(i => (i * 91 + 3) % 256)
    val g2 = g.clone(); val t = g2(10); g2(10) = g2(11); g2(11) = t
    val h1 = Multimodal.dHash64(grayBmp(9, 8, g)).get
    val h2 = Multimodal.dHash64(grayBmp(9, 8, g2)).get
    val dist = java.lang.Long.bitCount(h1 ^ h2)
    assert(dist >= 1 && dist <= 3, s"swap should flip 1-3 bits, got $dist")
  }

  test("audioEnvelopeHash64: gain-invariant, spike moves few bits, non-audio None") {
    def wav(scale: Double, spikeAt: Int = -1): Array[Byte] = {
      val s = Array.tabulate[Short](650) { i =>
        val base = 500 + (i / 10) * 37 % 9000
        val sign = if (i % 2 == 0) 1 else -1
        var amp = (base * scale).toInt
        if (i == spikeAt) amp += 20000
        (sign * math.min(amp, 32767)).toShort
      }
      Multimodal.encodeWavPcm16(1, 8000, s)
    }
    val h1 = Multimodal.audioEnvelopeHash64(wav(1.0)).get
    val h2 = Multimodal.audioEnvelopeHash64(wav(1.7)).get
    assert(h1 == h2, "positive gain must not change envelope relations")
    val h3 = Multimodal.audioEnvelopeHash64(wav(1.0, spikeAt = 103)).get
    val dist = java.lang.Long.bitCount(h1 ^ h3)
    assert(dist >= 1 && dist <= 3, s"one spike should flip 1-3 bits, got $dist")
    assert(Multimodal.audioEnvelopeHash64("junk".getBytes("UTF-8")).isEmpty)
    // too-short clip (under 65 frames) has no defined envelope
    assert(Multimodal.audioEnvelopeHash64(
      Multimodal.encodeWavPcm16(1, 8000, Array.fill[Short](64)(100))).isEmpty)
  }

  test("imageNearDupPairs: banded recall is exact at dist <= 3") {
    import spark.implicits._
    // base hash + planted 1/2/3/4-bit flips and one far hash
    val h0 = 0x0123456789ABCDEFL
    val rows = Seq(
      (1L, h0), (2L, h0 ^ 1L), (3L, h0 ^ (1L << 17) ^ (1L << 40)),
      (4L, h0 ^ (1L << 5) ^ (1L << 21) ^ (1L << 63)),
      (5L, h0 ^ (1L << 1) ^ (1L << 18) ^ (1L << 34) ^ (1L << 50)), // dist 4
      (6L, ~h0))
    val df = rows.toDF("doc_id", "dhash")
    val got = Multimodal.imageNearDupPairs(df, "doc_id", maxDist = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ha) <- rows; (b, hb) <- rows
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.contains((1L, 4L)) && !want.exists(p => p._1 == 5L && p._2 == 5L))
    // id 5 at dist 4 from id 1 must NOT pair with it
    assert(!got.contains((1L, 5L)))
  }

  test("GVID container round-trips frames byte-for-byte; garbage -> None") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](9),
      Array.fill[Byte](100)(7))
    val enc = Multimodal.encodeVideo(frames)
    val dec = Multimodal.decodeVideoFrames(enc)
    assert(dec.isDefined && dec.get.size == 3)
    dec.get.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(Multimodal.decodeVideoFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeVideoFrames("GVIDjunk".getBytes).isEmpty)
    // truncated payload (declared length beyond end) fails cleanly
    val bad = enc.take(enc.length - 5)
    assert(Multimodal.decodeVideoFrames(bad).isEmpty)
  }

  test("videoFrameHashes samples every stride-th frame with real decode") {
    import spark.implicits._
    val vid = Multimodal.encodeVideo(
      (0 until 6).map(f => Multimodal.syntheticFrameBmp(1, f, 0)))
    val assets = Seq((1L, vid)).toDF("doc_id", "payload")
    val got = Multimodal.videoFrameHashes(assets, stride = 2)
      .collect().map(r => (r.getInt(1), r.isNullAt(2))).sortBy(_._1)
    assert(got.map(_._1).sameElements(Array(0, 2, 4)))
    assert(got.forall(!_._2), "every sampled BMP frame must hash")
  }

  test("videoNearDupPairs: shifted same-scene video matches, other scene doesn't") {
    import spark.implicits._
    // videos 0 and 50 are scene 0 variants (shifted), 1 is scene 1
    val assets = Seq(0L, 50L, 1L)
      .map(id => (id, Multimodal.syntheticVideo(id))).toDF("doc_id", "payload")
    val fh = Multimodal.videoFrameHashes(assets, stride = 2)
    val got = Multimodal.videoNearDupPairs(fh, "doc_id", maxDist = 3,
      minMatchFrac = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 50L)))
  }
}
