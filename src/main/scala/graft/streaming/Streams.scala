package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §2.8: the reference is
  * batch-only; this is the engine's optional streaming surface over the
  * `events` table shape): watermarked tumbling-window aggregation and
  * custom state via `mapGroupsWithState`.
  *
  * Correctness contract: a streaming windowed aggregate fed the whole
  * table must equal the equivalent batch aggregate — asserted by the
  * declared entries below over a chunked FILE source (the
  * production-shaped incremental source; swap the directory for a
  * kafka topic in production — the query graph is identical). Feeds
  * are distributed writes into the source directory, so no query body
  * collects table data to the driver.
  *
  * Scale notes: watermark bounds state (late rows beyond 1h are
  * dropped); the shuffle is on (window, event_type) — the same hash
  * partitioning a batch groupBy would use; state lives in the state
  * store, sized by active windows × key cardinality, not history.
  */
object Streams {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Tumbling 1h windowed count+sum with a 1h watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(when(!isnan(col("value")), col("value"))), 2).as("val_sum"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("val_sum"))

  /** Custom per-key state (M-alike for streams): running per-user event
    * count + max value via mapGroupsWithState.
    */
  def userRunningState(spark: SparkSession, events: org.apache.spark.sql.Dataset[Ev])
      : DataFrame = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[(Long, Double)]) =>
          val (c0, m0) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
          var c = c0; var m = m0
          it.foreach { e =>
            c += 1
            if (!e.value.isNaN && e.value > m) m = e.value
          }
          state.update((c, m))
          (user, c, m)
      }.toDF("user_id", "n_events", "max_value")
  }

  /** Order-independent O(1)-transfer fingerprint: row count + sum of
    * per-row crc32 over the canonical string form of `cols` — the e6
    * checksum pattern (RelationalQueries e6). The stream==batch gates
    * compare two such rows instead of collecting both full outputs, so
    * the gate's driver transfer stays one row per side no matter how
    * large the events table grows. crc32 is 32-bit, so the sum stays
    * far from Long overflow (safe under ANSI) at any realistic count.
    */
  private def fingerprint(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    // explicit 1-char field separator + null sentinel: concat_ws SKIPS
    // nulls (aliasing ("a", null) with ("a")), and without a separator
    // "ab"+"c" would alias "a"+"bc"
    val canon = cols.map(c => coalesce(col(c).cast("string"), lit("\u0000")))
    val r = df.select(count(lit(1)),
      coalesce(sum(crc32(concat_ws("\u0001", canon: _*))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  // ---------------------------------------------------------------- queries

  /** Incremental FILE-source arrival harness (st8's recovery shape
    * generalized): each chunk DataFrame is written as parquet part
    * files — a DISTRIBUTED write, no driver-side data transfer — and
    * moved into the stream's source directory, then the query drains it
    * before the next chunk lands. One drop == one arrival batch, the
    * exact rhythm MemoryStream.addData gave the old harness, but
    * through the real production source path (directory listing, file
    * offsets, schema'd parquet decode) and with feed size bounded by
    * storage, not driver heap. Parquet (not json) so timestamps
    * round-trip to the microsecond and fingerprints stay exact.
    */
  private[graft] final class FileFeed(s: SparkSession, name: String,
      schema: org.apache.spark.sql.types.StructType) {
    private val base = graft.util.Fixtures.dir + "/" + name
    graft.util.Fs.rmRecursive(new java.io.File(base))
    private val srcDir = new java.io.File(s"$base/src")
    srcDir.mkdirs()
    private var n = 0
    def source(): DataFrame = s.readStream.schema(schema).parquet(srcDir.toString)
    def add(chunk: DataFrame): Unit = {
      val tmp = s"$base/tmp$n"
      n += 1
      // ONE file per add, moved with ONE atomic rename: the running
      // FileStreamSource lists the dir concurrently, so a multi-file
      // move can be listed mid-add and split one logical batch across
      // two micro-batches — breaking every gate (and guard) that
      // relies on the feed's batch boundaries (e.g. st17's
      // monotonic-id ingest guard saw the second fragment as a
      // redelivery). A single parquet file is still splittable by row
      // group, so downstream parallelism is unaffected.
      chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(srcDir, s"b$n-$i.parquet").toPath)
        }
    }
  }

  private def eventsFeed(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))

  /** Streaming-vs-batch equivalence: feed the whole events table through
    * a chunked file source in 3 arrival batches; the streaming windowed
    * aggregate (complete mode) must match the batch aggregate exactly.
    * FULL DuckDB oracle since r11 — the first STREAMING result hashed
    * against an independent engine: the emitted rows ARE the streamed
    * windowed aggregate (collected from the memory sink — buckets ×
    * types rows, driver-small), and DuckDB recomputes the same
    * hour-bucket aggregate from the events parquet (the e6 bucket
    * convention). The stream==batch fingerprint equality stays as the
    * emission gate, so the query still fails loud on a streaming-only
    * divergence the oracle's batch replay could not see.
    */
  val st1 = QueryDef(
    "st1_stream_window_agg",
    { (s, d) =>
      import s.implicits._
      val ev = eventsFeed(s, d)
      val feed = new FileFeed(s, "st1", ev.schema)
      val q = windowedAgg(feed.source()).writeStream
        .format("memory").queryName("st1_out").outputMode(OutputMode.Complete())
        .start()
      val fpCols = Seq("bucket", "event_type", "n", "val_sum")
      val (streamedFp, streamedRows) =
        try {
          (0 until 3).foreach { k =>
            feed.add(ev.filter(pmod(col("event_id"), lit(3)) === k))
            q.processAllAvailable()
          }
          (fingerprint(s.table("st1_out"), fpCols),
            s.table("st1_out")
              .select(col("bucket"), col("event_type"),
                col("n").cast("long").as("n"), col("val_sum"))
              .collect()
              .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
        } finally q.stop() // always release the query + sink registration
      val batchFp = fingerprint(windowedAggBatch(Tables.events(s, d)), fpCols)
      streamedRows.toSeq.toDF("bucket", "event_type", "n", "val_sum")
        .filter(lit(streamedFp == batchFp && streamedFp._1 > 0))
    },
    oracle = Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |       event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(CASE WHEN NOT isnan(value) THEN value END), 2)
        |         AS val_sum
        |-- Spark's window(ts) drops null-ts rows on both the stream and
        |-- batch sides; mirror that (latent today: no null ts in fixture)
        |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""".stripMargin),
    benchEligible = false)

  /** The batch twin of windowedAgg (same expressions, no watermark). */
  def windowedAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(when(!isnan(col("value")), col("value"))), 2).as("val_sum"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("val_sum"))

  /** mapGroupsWithState vs batch groupBy equivalence on final state.
    * FULL DuckDB oracle since r11: the emitted rows ARE the
    * per-user FINAL streamed state (last update per user — user-count
    * rows), recomputed independently by DuckDB from the events
    * parquet; the stream==batch fingerprint equality stays as the
    * emission gate. A state-merge bug (lost increment, wrong NaN
    * handling, dropped user) hash-mismatches.
    */
  val st2 = QueryDef(
    "st2_stream_stateful",
    { (s, d) =>
      import s.implicits._
      val ev = eventsFeed(s, d)
      val feed = new FileFeed(s, "st2", ev.schema)
      val q = userRunningState(s, feed.source().as[Ev]).writeStream
        .format("memory").queryName("st2_out").outputMode(OutputMode.Update())
        .start()
      // last update per user = final state
      val fpCols = Seq("user_id", "n_events", "max_value")
      val (finFp, finRows) =
        try {
          (0 until 3).foreach { k =>
            feed.add(ev.filter(pmod(col("event_id"), lit(3)) === k))
            q.processAllAvailable()
          }
          val fin = s.table("st2_out").groupBy("user_id")
            .agg(max(col("n_events")).as("n_events"),
              max(col("max_value")).as("max_value"))
          (fingerprint(fin, fpCols),
            fin.collect().map(r => (r.getLong(0), r.getLong(1),
              r.getDouble(2))))
        } finally q.stop()
      val batchFp = fingerprint(Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          // all-NaN users: align with the stream side's -Inf initial state
          coalesce(max(when(!isnan(col("value")), col("value"))),
            lit(Double.NegativeInfinity)).as("max_value")), fpCols)
      finRows.toSeq.toDF("user_id", "n_events", "max_value")
        .filter(lit(finFp == batchFp && finFp._1 > 0))
    },
    oracle = Some(
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       coalesce(max(CASE WHEN NOT isnan(value) THEN value END),
        |                CAST('-infinity' AS DOUBLE)) AS max_value
        |FROM events GROUP BY 1""".stripMargin),
    benchEligible = false)

  /** Streaming exact dedup (the LLM-pipeline pattern as a stream):
    * dropDuplicates on the content hash across micro-batches — state
    * keyed by hash — must reduce the duplicated feed to exactly the
    * batch-distinct count.
    */
  val st3 = QueryDef(
    "st3_stream_dedup",
    { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val copies = docs.withColumn("doc_id", col("doc_id") + 1000000L)
      val feed = new FileFeed(s, "st3", docs.schema)
      val deduped = feed.source()
        .withColumn("h", md5(col("text")))
        .dropDuplicates("h")
      val q = deduped.writeStream
        .format("memory").queryName("st3_out").outputMode(OutputMode.Append())
        .start()
      val (got, keptHashes) =
        try {
          // originals over two arrival batches, then their exact copies
          // over two more — duplicates land both within and across
          // batches, so the dedup state must span micro-batches
          Seq(docs, copies).foreach { half =>
            (0 until 2).foreach { k =>
              feed.add(half.filter(pmod(col("doc_id"), lit(2)) === k))
              q.processAllAvailable()
            }
          }
          (s.table("st3_out").count(),
            // the kept HASH set is deterministic (which doc_id survives
            // per hash is arrival-order dependent; the key set is not)
            s.table("st3_out").select(col("h")).collect()
              .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))))
        } finally q.stop()
      val want = Tables.documents(s, d).select(md5(col("text"))).distinct()
        .count()
      // FULL oracle since r11: the streamed dedup's kept-key set must
      // equal DuckDB's distinct content-hash set over the same corpus
      keptHashes.toSeq.toDF("h")
        .filter(lit(got == want && got > 0))
    },
    oracle = Some(
      """SELECT DISTINCT md5(text) AS h FROM documents""".stripMargin),
    benchEligible = false)

  /** Watermark late-data semantics in APPEND mode — the contract a
    * production streaming pipeline actually relies on: a window is
    * emitted once the watermark passes its end, and a row arriving
    * after that is DROPPED, not merged. Timeline: hour-00/01 events →
    * an 05:00 event advances the watermark to 04:00, flushing both
    * windows → a late hour-00 row (value 100) must vanish without a
    * trace → a final advance flushes hour-05. FULL oracle since r11:
    * the expected APPEND-mode output under those semantics is exactly
    * three hand-derivable windows — the oracle states them as a VALUES
    * table (golden values, driver-hashed), so the late-drop contract
    * itself is what a divergence fails against; the no-late-value
    * scan stays as an emission gate.
    */
  val st4 = QueryDef(
    "st4_stream_late_drop",
    { (s, d) =>
    import s.implicits._
    def ev(id: Long, t: String, v: Double): Ev =
      Ev(id, java.sql.Timestamp.valueOf(t), 1L, "click", v)
    def batch(evs: Ev*): DataFrame = evs.toSeq.toDS().toDF()
    val feed = new FileFeed(s, "st4", batch(ev(0, "2024-01-01 00:00:00", 0.0)).schema)
    val q = windowedAgg(feed.source()).writeStream
      .format("memory").queryName("st4_out").outputMode(OutputMode.Append())
      .start()
    val rows =
      try {
        feed.add(batch(ev(1, "2024-01-01 00:10:00", 1.0),
          ev(2, "2024-01-01 01:10:00", 2.0)))
        q.processAllAvailable()
        feed.add(batch(ev(3, "2024-01-01 05:00:00", 3.0))) // wm → 04:00, flush 00+01
        q.processAllAvailable()
        feed.add(batch(ev(4, "2024-01-01 00:20:00", 100.0))) // LATE: beyond wm
        q.processAllAvailable()
        feed.add(batch(ev(5, "2024-01-01 07:00:00", 5.0))) // wm → 06:00, flush 05
        q.processAllAvailable()
        s.table("st4_out").select("bucket", "n", "val_sum")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toSet
      } finally q.stop()
    val hour00Clean = rows.contains(("2024-01-01 00:00:00", 1L, 1.0))
    val noLateValue = !rows.exists(_._3 >= 100.0)
    rows.toSeq.toDF("bucket", "n", "val_sum")
      .filter(lit(hour00Clean && noLateValue && rows.size == 3))
  },
    oracle = Some(
      """SELECT * FROM (VALUES
        |  ('2024-01-01 00:00:00', CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE)),
        |  ('2024-01-01 01:00:00', CAST(1 AS BIGINT), CAST(2.0 AS DOUBLE)),
        |  ('2024-01-01 05:00:00', CAST(1 AS BIGINT), CAST(3.0 AS DOUBLE)))
        |  t(bucket, n, val_sum)""".stripMargin),
    benchEligible = false)

  /** Per-user session aggregation on a 30-minute inactivity gap via the
    * native `session_window` (the streaming twin of the batch e2
    * sessionization): state is merged session ranges per user, bounded
    * by the watermark. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n_events"))

  /** ST5 — streaming session windows equal the batch session_window on
    * the same feed. Append mode only emits sessions the watermark has
    * closed, so the feed is ts-ordered (a real stream's arrival order)
    * and ends with a far-future sentinel event that pushes the
    * watermark past every real session; the sentinel's own session is
    * excluded from the compare on both sides.
    */
  val st5 = QueryDef(
    "st5_stream_session_window",
    { (s, d) =>
    import s.implicits._
    val ev = eventsFeed(s, d).filter(col("ts").isNotNull)
    // time-RANGE chunking (an O(1) min/max scalar, not a row collect):
    // arrival batches must respect event time so append mode only
    // closes sessions whose rows have all arrived; within a batch the
    // order is free — the watermark advances at batch end
    val b = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (loUs, hiUs) = (b.getLong(0), b.getLong(1))
    val span = math.max(1L, (hiUs - loUs) / 3 + 1)
    val sentinel = Ev(-1L,
      new java.sql.Timestamp(hiUs / 1000L + 30L * 24 * 3600 * 1000),
      -1L, "sentinel", 0.0)
    val feed = new FileFeed(s, "st5", ev.schema)
    val q = sessionAgg(feed.source()).writeStream
      .format("memory").queryName("st5_out").outputMode(OutputMode.Append())
      .start()
    val fpCols = Seq("start_us", "end_us", "user_id", "n_events")
    val (streamedFp, sessRows) =
      try {
        (0 until 3).foreach { k =>
          feed.add(ev.filter(
            unix_micros(col("ts")) >= loUs + k * span &&
              unix_micros(col("ts")) < loUs + (k + 1) * span))
          q.processAllAvailable()
        }
        feed.add(Seq(sentinel).toDS().toDF())
        q.processAllAvailable()
        val fin = s.table("st5_out").filter(col("user_id") =!= -1L)
        (fingerprint(fin, fpCols),
          fin.select(col("start_us"), col("end_us"), col("user_id"),
            col("n_events").cast("long").as("n_events"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3))))
      } finally q.stop()
    val batchFp = fingerprint(Tables.events(s, d).filter(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n_events")), fpCols)
    // FULL oracle since r11: the emitted rows ARE the streamed closed
    // sessions; DuckDB re-derives them gaps-and-islands style (a new
    // session starts when the gap to the previous event is >= 30 min;
    // a session's end is its last event + the gap — Spark's
    // session_window end semantics)
    sessRows.toSeq.toDF("start_us", "end_us", "user_id", "n_events")
      .filter(lit(streamedFp == batchFp && streamedFp._1 > 0))
  },
    oracle = Some(
      """WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
        |m AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                  IS NULL
        |               OR ts - lag(ts) OVER (PARTITION BY user_id
        |                                     ORDER BY ts)
        |                  >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |g AS (SELECT user_id, ts,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m),
        |sess AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en,
        |                CAST(count(*) AS BIGINT) AS n_events
        |         FROM g GROUP BY 1, 2)
        |SELECT epoch_us(st) AS start_us,
        |       epoch_us(en + INTERVAL 30 MINUTE) AS end_us,
        |       user_id, n_events
        |FROM sess""".stripMargin),
    benchEligible = false)

  /** ST6 — stream-static enrichment join: a stream of events joined to
    * a STATIC dimension (per-user first-seen event id, derived from the
    * same table) — the canonical lookup-enrichment every streaming
    * pipeline runs. The static side is a bounded DataFrame, so Spark
    * broadcasts it per micro-batch with no streaming state at all;
    * output must equal the equivalent batch join.
    */
  val st6 = QueryDef(
    "st6_stream_static_join",
    { (s, d) =>
      import s.implicits._
      val dim = Tables.events(s, d).groupBy("user_id")
        .agg(min(col("event_id")).as("first_event_id"))
      val ev = eventsFeed(s, d)
      val feed = new FileFeed(s, "st6", ev.schema)
      val joined = feed.source().join(dim, Seq("user_id"), "left")
        .select(col("event_id"), col("user_id"), col("first_event_id"))
      val q = joined.writeStream
        .format("memory").queryName("st6_out").outputMode(OutputMode.Append())
        .start()
      val fpCols = Seq("event_id", "user_id", "first_event_id")
      val streamedFp =
        try {
          (0 until 3).foreach { k =>
            feed.add(ev.filter(pmod(col("event_id"), lit(3)) === k))
            q.processAllAvailable()
          }
          fingerprint(s.table("st6_out"), fpCols)
        } finally q.stop()
      val batchFp = fingerprint(
        Tables.events(s, d).join(dim, Seq("user_id"), "left")
          .select(col("event_id"), col("user_id"), col("first_event_id")),
        fpCols)
      // FULL oracle since r11: the memory sink holds every enriched row
      // (driver-resident by the sink's nature); emit them and let
      // DuckDB replay the dim build + left join from the parquet
      s.table("st6_out")
        .select(col("event_id"), col("user_id"), col("first_event_id"))
        .filter(lit(streamedFp == batchFp && streamedFp._1 > 0))
    },
    oracle = Some(
      """WITH dim AS (SELECT user_id,
        |               CAST(min(event_id) AS BIGINT) AS first_event_id
        |             FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, d.first_event_id
        |FROM events e LEFT JOIN dim d USING (user_id)""".stripMargin),
    benchEligible = false)

  /** ST7 — stream-stream inner join: click→purchase attribution (a
    * purchase joins every click by the same user in the preceding 30
    * minutes). BOTH sides are unbounded, so this exercises Spark's
    * symmetric-hash stream-stream join: each side buffers rows in the
    * state store, and the event-time RANGE condition plus the
    * watermarks is what lets the engine evict state — without them the
    * buffers grow forever. Output must equal the identical batch join.
    *
    * At 100 TB/day this is the shape to keep: state is bounded by
    * (watermark delay + range span) × arrival rate, keyed by user —
    * the join condition must carry the time bound or state is
    * unbounded by construction.
    */
  val st7 = QueryDef(
    "st7_stream_stream_join",
    { (s, d) =>
    import s.implicits._
    val ev = eventsFeed(s, d).filter(col("ts").isNotNull)
    // same time-range chunking as st5: both sides' arrival order must
    // respect event time or watermark eviction drops matches the batch
    // join keeps
    val b = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (loUs, hiUs) = (b.getLong(0), b.getLong(1))
    val span = math.max(1L, (hiUs - loUs) / 3 + 1)
    val feedClicks = new FileFeed(s, "st7c", ev.schema)
    val feedBuys = new FileFeed(s, "st7b", ev.schema)
    val clicks = feedClicks.source().filter(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val buys = feedBuys.source().filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("buy_id"), col("user_id").as("buy_user"),
        col("ts").as("buy_ts"))
    val joined = clicks.join(buys,
      col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("buy_id"))
    val q = joined.writeStream
      .format("memory").queryName("st7_out").outputMode(OutputMode.Append())
      .start()
    val fpCols = Seq("click_id", "buy_id")
    val streamedFp =
      try {
        (0 until 3).foreach { k =>
          val chunk = ev.filter(
            unix_micros(col("ts")) >= loUs + k * span &&
              unix_micros(col("ts")) < loUs + (k + 1) * span)
          feedClicks.add(chunk)
          feedBuys.add(chunk)
          q.processAllAvailable()
        }
        fingerprint(s.table("st7_out"), fpCols)
      } finally q.stop()
    val batchFp = fingerprint(ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id").as("buy_user"),
            col("ts").as("buy_ts")),
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("buy_id")), fpCols)
    // FULL oracle since r11: the attribution pair set the symmetric-
    // hash join emitted, replayed by DuckDB as the equivalent batch
    // range join over the parquet
    s.table("st7_out").select(col("click_id"), col("buy_id"))
      .filter(lit(streamedFp == batchFp && streamedFp._1 > 0))
  },
    oracle = Some(
      """SELECT c.event_id AS click_id, b.event_id AS buy_id
        |FROM events c JOIN events b
        |  ON c.user_id = b.user_id
        | AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 30 MINUTE
        |WHERE c.event_type = 'click' AND b.event_type = 'purchase'
        |  AND c.ts IS NOT NULL AND b.ts IS NOT NULL""".stripMargin),
    benchEligible = false)

  /** ST8 — checkpointed exactly-once recovery over a FILE source: run a
    * stream over batch-1 files into a parquet sink with a checkpoint,
    * stop it, drop batch-2 files in, restart from the SAME checkpoint
    * and sink. The restarted query must process ONLY the new files
    * (the checkpoint's source offsets record batch 1 as committed) —
    * the sink must end up with each event exactly once: no duplicates
    * after the restart, and nothing missing. Without the checkpoint a
    * restart would re-ingest batch 1 — duplicated training docs at
    * scale. This is the operational contract of every production
    * ingest stream. (Memory sink can't recover from a checkpoint; the
    * file sink is the recovery-capable production shape.)
    */
  val st8 = QueryDef(
    "st8_stream_checkpoint_recovery",
    { (s, d) =>
    import s.implicits._
    val base = graft.util.Fixtures.dir + "/st8"
    val srcDir = new java.io.File(s"$base/src")
    val ckptDir = s"$base/ckpt"
    val outDir = s"$base/out"
    // fresh fixture dirs per run (stale checkpoints would skip batch 1)
    graft.util.Fs.rmRecursive(new java.io.File(base))
    srcDir.mkdirs()
    val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val half1 = ev.filter(col("event_id") % 2 === 0)
    val half2 = ev.filter(col("event_id") % 2 =!= 0)
    def addFiles(df: org.apache.spark.sql.DataFrame, tmp: String): Unit = {
      df.coalesce(2).write.mode("overwrite").json(tmp)
      new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
        .foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(srcDir, f.getName).toPath)
        }
    }
    val schema = ev.schema
    def runOnce(): Seq[Long] = {
      val q = s.readStream.schema(schema).json(srcDir.toString)
        .writeStream.format("parquet")
        .outputMode(OutputMode.Append())
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .start()
      try { q.processAllAvailable() } finally q.stop()
      s.read.parquet(outDir).select("event_id")
        .collect().map(_.getLong(0)).toSeq
    }
    addFiles(half1, s"$base/tmp1")
    val ids1 = runOnce()
    addFiles(half2, s"$base/tmp2")
    val idsAll = runOnce()
    val allIds = ev.select("event_id").collect().map(_.getLong(0)).toSet
    val half1Ids = half1.select("event_id").collect().map(_.getLong(0)).toSet
    val firstRunExact = ids1.toSet == half1Ids && ids1.size == half1Ids.size
    val noDups = idsAll.size == idsAll.toSet.size
    val complete = idsAll.toSet == allIds
    // FULL oracle (since r12): emit the recovered sink's CONTENT — after
    // an exactly-once recovery it must equal the filtered source table,
    // which DuckDB recomputes independently. The booleans still gate.
    s.read.parquet(outDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .filter(lit(firstRunExact && noDups && complete &&
        ids1.nonEmpty && idsAll.size > ids1.size))
  },
    oracle = Some(
      """SELECT event_id, user_id, event_type
        |FROM events WHERE ts IS NOT NULL""".stripMargin),
    benchEligible = false)

  /** ST9 — idempotent foreachBatch sink: the production pattern for
    * streaming into a partitioned table when the built-in file sink's
    * append-only contract isn't enough (upserts, compaction, dynamic
    * overwrite). foreachBatch hands each micro-batch to arbitrary
    * batch-DataFrame code; exactly-once then rests on that code being
    * IDEMPOTENT per (batch content), because a recovering stream MAY
    * redeliver the last uncommitted batch. Here the sink writes each
    * batch's event_type partitions via dynamic partition overwrite —
    * replaying a batch rewrites the same partitions to the same
    * content instead of duplicating rows (append would double them).
    * The pattern requires batch boundaries aligned with partition
    * boundaries (a batch = one ingest day/source — here: one batch,
    * whole table); a partition split across batches would be
    * truncated to the last batch's slice.
    * Gate: after the stream finishes, REPLAY the last batch through
    * the very same sink function; the table's count and checksum must
    * be unchanged, and must equal the batch-computed expectation.
    */
  val st9 = QueryDef(
    "st9_foreachbatch_upsert",
    { (s, d) =>
    import s.implicits._
    val base = graft.util.Fixtures.dir + "/st9"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val outDir = s"$base/table"
    val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
    // the idempotent sink: per-batch dynamic partition overwrite.
    // Redelivery is replayed from a parquet CAPTURE of the delivered
    // batch, not the micro-batch DataFrame (whose lineage points at a
    // dead incremental source once the stream stops) and not
    // driver-collected rows — the capture stays on storage like a real
    // recovering source would.
    val replayDir = s"$base/replay"
    def sink(batch: DataFrame, batchId: Long): Unit = {
      if (batchId >= 0) // live delivery: capture it for the replay pass
        batch.write.mode("overwrite").parquet(replayDir)
      batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type").parquet(outDir)
    }
    val feed = new FileFeed(s, "st9feed", ev.schema)
    feed.add(ev) // whole table, one arrival batch (see scaladoc contract)
    val q = feed.source()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch(sink _)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    def state(): (Long, Long) = {
      val r = s.read.parquet(outDir)
        .agg(count(lit(1)), sum(col("event_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val after1 = state()
    // simulate redelivery of the final batch after a recovery
    sink(s.read.parquet(replayDir), -1L)
    val after2 = state()
    val expRow = ev.agg(count(lit(1)), sum(col("event_id"))).head()
    val expected = (expRow.getLong(0), expRow.getLong(1))
    val ok = after1 == expected && after2 == expected && after1._1 > 0
    // FULL oracle since r11: the POST-REPLAY table content, row for
    // row, must equal the source selection DuckDB computes from the
    // events parquet — duplicated rows from a non-idempotent sink (or
    // a truncated partition) hash-mismatch, on top of the
    // count/checksum gate above
    s.read.parquet(outDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(lit(ok))
  },
    oracle = Some(
      """SELECT event_id, event_type, value
        |FROM events WHERE ts IS NOT NULL""".stripMargin),
    benchEligible = false)

  /** ST10 — streaming NEAR-dup dedup-on-ingest: the production shape
    * for a continuously-crawled corpus. Each micro-batch is
    * deduplicated against everything already ACCEPTED — exact n-gram
    * Jaccard through [[graft.llm.Dedup.incrementalDedup]] (PPJoin
    * prefix-filtered candidates, size-guarded broadcast, never
    * all-pairs) — inside foreachBatch, and the survivors are appended
    * to the corpus state (a parquet table here; Delta/Iceberg in
    * production, same plan). Per-batch work is batch×corpus-candidates,
    * never corpus×corpus; the accepted corpus lives on storage, not in
    * executor memory or the state store, so state size is unbounded
    * corpus scale at zero streaming-state cost.
    *
    * Fixture: the feed is pre-cleaned with the SAME operator (keep-first
    * survivors are pairwise non-dup under its own metric — if X and Y
    * both survive, their verified Jaccard was < threshold), split over
    * 4 arrival batches; batch k re-delivers EXACT copies of batch k−1's
    * docs under fresh ingest ids (re-crawls, Jaccard 1.0 with their
    * originals). Pairwise-non-dup originals + exact-copy re-crawls make
    * the streaming outcome provably order-independent (no greedy-chain
    * ambiguity), so the gate is sharp: every original accepted, every
    * re-crawl dropped, final corpus id set == originals exactly
    * (count + sum + xor checksums).
    */
  /** FULL oracle since r13: the emitted frame is the final ACCEPTED
    * corpus state read back from storage — (doc_id, n_chars) per
    * survivor — and DuckDB independently derives the expected state
    * from the documents table: the pre-clean survivor set under the
    * engine's exact drop policy (doc b dropped iff ANY smaller-id doc
    * has trigram-Jaccard ≥ 0.9 with it — non-recursive, so directly
    * expressible as d9's brute-forced pair graph), rekeyed through
    * the same k·10M slice packing the feed uses. A micro-batch that
    * dropped an original, kept a re-crawl, or double-appended under
    * redelivery hash-mismatches externally. The order-independence
    * gates stay as emission conditions. */
  val st10 = QueryDef(
    "st10_stream_near_dup_ingest",
    st10Fn,
    oracle = Some(
      """WITH raw AS (SELECT doc_id, text FROM documents
        |             WHERE text IS NOT NULL AND length(text) >= 20),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM raw),
        |tri AS (SELECT doc_id,
        |               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |                    ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |               END AS sh
        |        FROM toks),
        |shd AS (SELECT doc_id, unnest(sh) AS s FROM tri),
        |cnt AS (SELECT doc_id, count(*) AS c FROM shd GROUP BY 1),
        |inter AS (SELECT a.doc_id AS pa, b.doc_id AS pb, count(*) AS ix
        |          FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |drops AS (SELECT DISTINCT pb AS id FROM inter
        |          JOIN cnt ca ON pa = ca.doc_id JOIN cnt cb ON pb = cb.doc_id
        |          WHERE ix * 1.0 / (ca.c + cb.c - ix) >= 0.9),
        |clean AS (SELECT doc_id, length(text) AS n_chars FROM raw
        |          WHERE doc_id NOT IN (SELECT id FROM drops))
        |SELECT doc_id + (doc_id % 4) * 10000000 AS doc_id, n_chars
        |FROM clean""".stripMargin),
    benchEligible = false)

  private def st10Fn: (SparkSession, String) => DataFrame = { (s, d) =>
    import s.implicits._
    val threshold = 0.9
    val base = graft.util.Fixtures.dir + "/st10"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val stateDir = s"$base/corpus"
    val raw = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) >= 20)
      .select(col("doc_id"), col("text"))
    // id-packing precondition, loud at the fixture boundary: originals
    // live at k·10M + id, re-crawls at k·10M + 5M + id, and the
    // recrawl detector is doc_id % 10M >= 5M — an id space reaching
    // 5M would silently collide the two ranges and surface as a
    // confusing n_recrawls_kept, not as the real cause
    val maxId = raw.agg(max(col("doc_id"))).head().getLong(0)
    require(maxId < 5000000L,
      s"st10 id packing assumes doc_id < 5,000,000; testdata now has $maxId " +
        "— widen the k*10M/+5M packing ranges")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cleanIds = graft.llm.Dedup.incrementalDedup(
      empty, raw, "doc_id", "text", threshold)
    val clean = raw.join(cleanIds, Seq("doc_id"), "left_semi")
    val nSlices = 4
    // slices + rekeying stay DataFrame transforms (no driver collect);
    // ingest ids are monotone across batches (any ingest sequence gives
    // this for free — incrementalDedup requires it): batch k originals
    // at k·10M + id, its re-crawls at k·10M + 5M + id
    def slice(k: Int): DataFrame =
      clean.filter(pmod(col("doc_id"), lit(nSlices)) === k)
    def rekey(df: DataFrame, k: Int, off: Long): DataFrame =
      df.select((col("doc_id") + lit(k * 10000000L + off)).as("doc_id"),
        col("text"))
    val batches = (0 until nSlices).map { k =>
      val originals = rekey(slice(k), k, 0L)
      if (k > 0) originals.unionAll(rekey(slice(k - 1), k, 5000000L))
      else originals
    }
    def corpusState(): DataFrame =
      if (new java.io.File(stateDir).exists()) s.read.parquet(stateDir)
      else empty
    def sink(batch: DataFrame, batchId: Long): Unit = {
      val kept = graft.llm.Dedup.incrementalDedup(
        corpusState(), batch, "doc_id", "text", threshold)
      batch.join(kept, Seq("doc_id"), "left_semi")
        .write.mode("append").parquet(stateDir)
    }
    val feed = new FileFeed(s, "st10feed", raw.schema)
    val q = feed.source()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch(sink _)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      batches.foreach { b => feed.add(b); q.processAllAvailable() }
    } finally q.stop()
    def sig(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("doc_id")), lit(0L)),
        coalesce(expr("bit_xor(doc_id)"), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val expected = (0 until nSlices).map(k => rekey(slice(k), k, 0L))
      .reduce(_ unionAll _)
    val expSig = sig(expected)
    val surv = s.read.parquet(stateDir)
    val gotSig = sig(surv)
    val nRecrawlsKept =
      surv.filter(col("doc_id") % 10000000L >= 5000000L).count()
    val ok = gotSig == expSig && nRecrawlsKept == 0L && gotSig._1 > 0L
    // the externally-oracled surface: the stored accepted corpus itself
    surv.select(col("doc_id"), length(col("text")).as("n_chars"))
      .filter(lit(ok))
  }

  /** ST11 — quality filtering on ingest: the Gopher hard-rule filter
    * (TextAnalysis.gopherRuleCols — codegen'd scan-local expressions)
    * applied directly to a document STREAM. The filter is stateless,
    * so it runs in append mode with no watermark and no state store —
    * the shape a 100 TB crawl ingest actually deploys (rules at the
    * edge, before anything shuffles or lands). Gate: survivors of the
    * streamed 3-chunk feed fingerprint-match the batch twin exactly,
    * some documents are dropped, and the kept verdicts agree per doc.
    */
  val st11 = QueryDef(
    "st11_stream_quality_filter",
    { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
    val feed = new FileFeed(s, "st11", docs.schema)
    def ruleFilter(df: DataFrame): DataFrame =
      graft.llm.TextAnalysis.gopherRuleCols(df, minWords = 20L)
        .filter(col("keep"))
        .select(col("doc_id"), col("source"))
    val q = ruleFilter(feed.source()).writeStream
      .format("memory").queryName("st11_out")
      .outputMode(OutputMode.Append())
      .start()
    val fpCols = Seq("doc_id", "source")
    val streamedFp =
      try {
        (0 until 3).foreach { k =>
          feed.add(docs.filter(pmod(col("doc_id"), lit(3)) === k))
          q.processAllAvailable()
        }
        fingerprint(s.table("st11_out"), fpCols)
      } finally q.stop()
    val batchFp = fingerprint(ruleFilter(docs), fpCols)
    val nTotal = docs.count()
    val ok = streamedFp == batchFp && streamedFp._1 > 0 &&
      streamedFp._1 < nTotal
    // FULL oracle since r11: the streamed KEPT set itself, replayed by
    // DuckDB with t17's gopher-rule SQL at this query's minWords=20
    s.table("st11_out").select(col("doc_id"), col("source"))
      .filter(lit(ok))
  },
    oracle = Some(
      """WITH q AS (
        |  SELECT doc_id, source, text,
        |         string_split(text, ' ') AS toks,
        |         string_split(text, chr(10)) AS lns
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |f AS (
        |  SELECT doc_id, source, len(toks) AS n_words,
        |         list_sum(list_transform(toks, x -> length(x))) * 1.0
        |           / len(toks) AS mwl,
        |         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0
        |           / len(toks) AS awr,
        |         len(regexp_extract_all(text, '#|\.\.\.')) * 1.0
        |           / len(toks) AS swr,
        |         len(list_filter(lns, l -> trim(l) LIKE '-%' OR trim(l) LIKE '*%')) * 1.0
        |           / len(lns) AS blr,
        |         len(list_filter(lns, l -> l LIKE '%...')) * 1.0
        |           / len(lns) AS elr,
        |         (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END +
        |          CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END) AS sd
        |  FROM q)
        |SELECT doc_id, source FROM f
        |WHERE n_words BETWEEN 20 AND 100000
        |  AND mwl BETWEEN 3.0 AND 10.0
        |  AND swr < 0.1 AND blr < 0.9 AND elr < 0.3
        |  AND awr > 0.8 AND sd >= 2""".stripMargin),
    benchEligible = false)

  /** ST12 — streaming daily-anomaly detection: the e11 monitor as a
    * live pipeline. The STREAM maintains the per-(type, day) counts —
    * a watermarked 1-day tumbling window agg, state sized by active
    * windows × |types|, the same (window, type) hash shuffle as the
    * batch groupBy; the z-scan then runs on the |types|×|days|-sized
    * AGGREGATE (RelationalQueries.dailyAnomaly, shared code with
    * e11), never on raw-event cardinality. Complete-mode memory sink
    * here (the aggregate is tiny by construction); a production
    * deployment upserts the counts into a store via foreachBatch
    * (st9's shape) and scans that. Gate: z-flags from the streamed
    * counts fingerprint-match the batch e11 output exactly after a
    * 3-chunk feed.
    */
  val st12 = QueryDef(
    "st12_stream_daily_anomaly",
    { (s, d) =>
    import s.implicits._
    val ev = eventsFeed(s, d)
    val feed = new FileFeed(s, "st12", ev.schema)
    val counts = feed.source()
      .filter(col("ts").isNotNull && unix_micros(col("ts")) >= 0)
      .withWatermark("ts", "48 hours")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_micros(window.start) div 86400000000").as("day"),
        col("n"))
    val q = counts.writeStream
      .format("memory").queryName("st12_out")
      .outputMode(OutputMode.Complete())
      .start()
    val fpCols = Seq("event_type", "day", "n", "z", "is_anomaly")
    val streamedFp =
      try {
        (0 until 3).foreach { k =>
          feed.add(ev.filter(pmod(col("event_id"), lit(3)) === k))
          q.processAllAvailable()
        }
        fingerprint(
          graft.ops.RelationalQueries.dailyAnomaly(s.table("st12_out")),
          fpCols)
      } finally q.stop()
    val batchFp = fingerprint(
      graft.ops.RelationalQueries.e11.fn(s, d), fpCols)
    // FULL oracle since r11 — e11's oracle SQL verbatim: the z-scan
    // over the STREAMED daily counts must hash-match DuckDB's replay
    // of the whole monitor from the raw events
    graft.ops.RelationalQueries.dailyAnomaly(s.table("st12_out"))
      .filter(lit(streamedFp == batchFp && streamedFp._1 > 0))
  },
    oracle = graft.ops.RelationalQueries.e11.oracle,
    benchEligible = false)

  /** ST13 — streaming DISTINCT-user state via mergeable HLL sketches:
    * each micro-batch collapses to per-type sketch PARTIALS
    * (k2's hllPartials shape), which foreachBatch merges into a tiny
    * persistent sketch table (|types| rows × ~KB) with `hll_union` —
    * the streaming cardinality pattern that never stores user ids in
    * state. The gate is the operational contract: the streamed state's
    * estimate lands within 5% of the exact distinct count (the batch
    * twin's estimate rides along for inspection — estimate EQUALITY
    * across merge orders is deliberately NOT gated: near the
    * sparse→dense transition DataSketches union estimates are
    * merge-order sensitive, see Sketches.k2's scaladoc). State size is
    * independent of stream length — the whole point at 100 TB/day
    * event volume.
    */
  /** FULL oracle on the EXACT side since r11 (the k2 recipe): the
    * hashed columns are (event_type, exact_distinct) — DuckDB replays
    * count(DISTINCT) over the same events — while the streamed and
    * batch-twin HLL estimates move into the emission gate: an accuracy
    * violation on any type drops its row and the driver flags the
    * count mismatch.
    */
  val st13 = QueryDef(
    "st13_stream_hll_state",
    { (s, d) =>
    import s.implicits._
    val base = graft.util.Fixtures.dir + "/st13"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val stateDir = s"$base/sketches"
    val ev = eventsFeed(s, d).filter(col("ts").isNotNull)
      .select(col("event_type"), col("user_id"))
    def sink(batch: DataFrame, batchId: Long): Unit = {
      val partial = batch.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sketch"))
      val merged =
        if (new java.io.File(stateDir).exists()) {
          batch.sparkSession.read.parquet(stateDir)
            .unionByName(partial)
            .groupBy("event_type")
            .agg(hll_union_agg(col("sketch")).as("sketch"))
        } else partial
      // tiny table: rewrite atomically via temp + move (|types| rows)
      val tmp = s"$base/sketches_tmp"
      merged.write.mode("overwrite").parquet(tmp)
      graft.util.Fs.rmRecursive(new java.io.File(stateDir))
      new java.io.File(tmp).renameTo(new java.io.File(stateDir))
    }
    val feed = new FileFeed(s, "st13", ev.schema)
    val q = feed.source()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch(sink _)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      (0 until 3).foreach { k =>
        feed.add(ev.filter(pmod(col("user_id"), lit(3)) === k))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = s.read.parquet(stateDir)
      .select(col("event_type"),
        hll_sketch_estimate(col("sketch")).as("stream_est"))
    // batch twin goes through the SAME partial→union path (a DIFFERENT
    // partitioning — user_id mod 7 — so equality proves partition
    // invariance, not just replay): nested agg(hll_union(hll_sketch))
    // in one pass is not legal SQL anyway
    val batchTwin = ev
      .groupBy(col("event_type"), pmod(col("user_id"), lit(7)).as("b"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("batch_est"))
      .join(ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct")),
        "event_type")
    streamed.join(batchTwin, "event_type")
      .filter(abs(col("stream_est") - col("exact_distinct")) /
        col("exact_distinct") < 0.05 &&
        abs(col("batch_est") - col("exact_distinct")) /
          col("exact_distinct") < 0.05)
      .select(col("event_type"),
        col("exact_distinct").cast("long").as("exact_distinct"))
  },
    oracle = Some(
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |FROM events WHERE ts IS NOT NULL GROUP BY 1""".stripMargin),
    benchEligible = false)

  /** ST14 — streaming ANN INDEX ingest: the production shape of an
    * embedding-index pipeline. The coarse quantizer is trained ONCE on
    * the first arrival slice and FROZEN (retraining would re-shuffle
    * the whole accumulated index — production systems version the
    * quantizer and rebuild offline); every later micro-batch is
    * cell-assigned at the edge in foreachBatch and APPENDED to a
    * cell-partitioned parquet store, so a query's nProbe cells map to
    * partition-directory pruning on the index scan — the IVF search
    * shape (v4) carried over to continuously-arriving data with no
    * streaming state at all (the index lives on storage, exactly like
    * st10's corpus state). Gates: (1) the streamed index covers every
    * vector exactly once; (2) probe-panel top-1 answers from the
    * streamed index fingerprint-match the SAME frozen-quantizer IVF
    * search over the batch corpus — streaming arrival order changed
    * nothing; (3) the store is physically laid out by cell.
    */
  /** FULL oracle since r13 (the st15 exact-side pattern): the emitted
    * frame is the STREAMED STORE's coverage table — one (vec_id, dim)
    * row per stored vector, read back from the cell-partitioned
    * parquet — and DuckDB computes the same from the embeddings
    * table. A micro-batch that dropped, duplicated, or truncated a
    * vector hash-mismatches externally; the quantizer-dependent
    * content checks (stream-vs-batch search fingerprints, physical
    * cell layout) stay as emission gates, since cell assignment is
    * learned and not SQL-expressible. */
  val st14 = QueryDef(
    "st14_stream_ann_index_ingest",
    st14Fn,
    oracle = Some(
      """SELECT vec_id, len(embedding) AS dim
        |FROM embeddings""".stripMargin),
    benchEligible = false)

  private def st14Fn: (SparkSession, String) => DataFrame = { (s, d) =>
    import s.implicits._
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val base = graft.util.Fixtures.dir + "/st14"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val indexDir = s"$base/index"
    val nCells = 16
    val nP = 6
    val centroids = graft.llm.Similarity.pqTrain(
      emb.filter(pmod(col("vec_id"), lit(3)) === 0), 1, nCells).head
    val bc = s.sparkContext.broadcast(centroids)
    val cellOf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var s2 = 0.0; var j = 0
        val cj = cs(c)
        while (j < cj.length) { val f = v(j) - cj(j); s2 += f * f; j += 1 }
        if (s2 < bestD) { bestD = s2; best = c }
        c += 1
      }
      best
    }
    def assign(df: DataFrame): DataFrame =
      df.withColumn("cell", cellOf(col("embedding")))
    val feed = new FileFeed(s, "st14feed", emb.schema)
    val q = feed.source()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: DataFrame, _: Long) =>
        assign(b).write.mode("append").partitionBy("cell").parquet(indexDir)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      (0 until 3).foreach { k =>
        feed.add(emb.filter(pmod(col("vec_id"), lit(3)) === k))
        q.processAllAvailable()
      }
    } finally q.stop()
    val probeCells = udf { (v: Seq[Float]) =>
      val cs = bc.value
      cs.indices.map { c =>
        var s2 = 0.0; var j = 0
        val cj = cs(c)
        while (j < cj.length) { val f = v(j) - cj(j); s2 += f * f; j += 1 }
        (s2, c)
      }.sortBy(_._1).take(nP).map(_._2).toArray
    }
    val queries = graft.llm.Similarity.probePanel(emb)
    def search(ix: DataFrame): DataFrame = {
      val probed = queries
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          explode(probeCells(col("embedding"))).as("cell"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
      probed.join(
          ix.select(col("vec_id").as("nid"), col("embedding").as("nv"),
            col("cell")), "cell")
        .filter(col("qid") =!= col("nid"))
        .withColumn("sim",
          round(graft.llm.Similarity.cosine(col("qv"), col("nv")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1)
        .select(col("qid"), col("nid"), col("sim"))
    }
    val ix = s.read.parquet(indexDir)
    val nIndexed = ix.count()
    val nDistinct = ix.select("vec_id").distinct().count()
    val nCorpus = emb.count()
    val streamFp = fingerprint(search(ix), Seq("qid", "nid", "sim"))
    val batchFp = fingerprint(search(assign(emb)), Seq("qid", "nid", "sim"))
    val cellDirs = Option(new java.io.File(indexDir).listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("cell=")))
      .getOrElse(0)
    val ok = nIndexed == nCorpus && nDistinct == nCorpus &&
      streamFp == batchFp && streamFp._1 > 0 && cellDirs >= 2
    // coverage table FROM THE STORE: the externally-oracled surface
    ix.select(col("vec_id"), size(col("embedding")).as("dim"))
      .filter(lit(ok))
  }

  /** ST15 — streaming TEXT-index ingest: the sparse-retrieval twin of
    * st14. Every arriving micro-batch is tokenized at the edge in
    * foreachBatch ([[graft.llm.HybridRetrieval.postings]] — the same
    * definition v21's batch search uses, so there is no stream-vs-batch
    * tokenizer drift by construction) and APPENDED to a term-hash-
    * bucketed parquet posting store; corpus stats (N, avgdl, df) derive
    * from the postings at query time, so the incremental store needs no
    * separate stats maintenance and no streaming state at all. Gates:
    * (1) the streamed posting store fingerprint-matches the batch-built
    * postings exactly (count + crc32 — arrival order changed nothing);
    * (2) a BM25 top-3 search over the STREAMED store fingerprint-
    * matches the same search over the batch postings; (3) the store is
    * physically bucketed (bucket= directories exist).
    */
  /** FULL oracle since r11: the emitted frame is the per-term posting
    * profile (df, Σtf, doc-id checksum) read FROM THE STREAMED STORE,
    * and DuckDB rebuilds the same inverted index from the documents
    * parquet with its own tokenizer (the v21 split-lower replay) — a
    * micro-batch that dropped, duplicated, or re-tokenized a document
    * hash-mismatches. The stream==batch fingerprint equalities (posting
    * set AND a BM25 search panel over both stores) and the physical
    * bucket layout stay as emission gates.
    */
  val st15 = QueryDef(
    "st15_stream_text_index_ingest",
    { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
    val base = graft.util.Fixtures.dir + "/st15"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    // since r16 the sink is the FIRST-CLASS [[graft.llm.TextIndex]]
    // store (lease, fingerprint/ensure, maintenance — the r15
    // verdict's Missing #3), bootstrapped EMPTY and grown one
    // TextIndex.append per micro-batch (each append rides the
    // single-writer lease and its own marker window)
    val storeDir = s"$base/txstore"
    graft.llm.TextIndex.build(docs.limit(0), storeDir, nBuckets = 8)
    def tokenize(b: DataFrame): DataFrame =
      graft.llm.HybridRetrieval.postings(b, "doc_id", "text")
    val feed = new FileFeed(s, "st15feed", docs.schema)
    val q = feed.source()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (b: DataFrame, _: Long) =>
        graft.llm.TextIndex.append(b, storeDir)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      (0 until 3).foreach { k =>
        feed.add(docs.filter(pmod(col("doc_id"), lit(3)) === k))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = graft.llm.TextIndex.livePostings(s, storeDir)
      .select(col("doc"), col("term"), col("tf"))
    val batch = tokenize(docs).select(col("doc"), col("term"), col("tf"))
    val postFpS = fingerprint(streamed, Seq("doc", "term", "tf"))
    val postFpB = fingerprint(batch, Seq("doc", "term", "tf"))
    val panel = docs.filter(col("doc_id") < 40).select(col("doc_id").as("qid"))
    def searchFp(post: DataFrame) = fingerprint(
      graft.llm.HybridRetrieval.bm25FromPostings(post, panel, topN = 3),
      Seq("qid", "rank", "doc", "score4"))
    val sFpS = searchFp(streamed)
    val sFpB = searchFp(batch)
    // the STORE's own search (maintained df/dl/stats, bucket-pruned
    // scan) must equal the storeless scorer over the batch postings
    val sFpStore = fingerprint(
      graft.llm.TextIndex.searchBm25(
        docs.filter(col("doc_id") < 40)
          .select(col("doc_id").as("qid"), col("text")),
        storeDir, topN = 3),
      Seq("qid", "rank", "doc", "score4"))
    // a streamed-in store is ensure-valid over the full corpus: the
    // per-batch XOR/Σdl maintenance composed exactly
    val b0 = graft.llm.TextIndex.buildsThisProcess
    graft.llm.TextIndex.ensure(docs, storeDir, nBuckets = 8)
    val pureLoad = graft.llm.TextIndex.buildsThisProcess == b0
    val bucketDirs = Option(
      new java.io.File(s"$storeDir/postings").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("bucket=")))
      .getOrElse(0)
    val ok = postFpS == postFpB && sFpS == sFpB && sFpStore == sFpB &&
      postFpS._1 > 0 && sFpS._1 > 0 && bucketDirs >= 2 && pureLoad
    streamed.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).cast("long").as("tf_sum"),
        sum(col("doc")).cast("long").as("doc_sum"))
      .filter(lit(ok))
  },
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id AS doc, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |post AS (
        |  SELECT doc, term, count(*) AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2)
        |SELECT term, count(*) AS df,
        |       CAST(sum(tf) AS BIGINT) AS tf_sum,
        |       CAST(sum(doc) AS BIGINT) AS doc_sum
        |FROM post GROUP BY 1""".stripMargin),
    benchEligible = false)

  /** ST16 — streaming MATERIALIZED-VIEW maintenance: a per-status
    * (count, cents-sum) aggregate stored on disk is maintained by CDC
    * changelog deltas arriving as a stream — [[graft.ops.Cdc
    * .maintainSumAgg]] applied per micro-batch inside foreachBatch.
    * The base table is NEVER rescanned: each batch costs
    * O(|batch| + |groups|), which is the entire point of maintaining
    * an aggregate at 100 TB instead of recomputing it.
    *
    * Exactly-once across redelivery AND RESTART: the sink
    * ([[graft.ops.Cdc.MaintainedSumView]]) persists the last applied
    * batchId next to the aggregate and SKIPS any batchId it has
    * already applied — the standard foreachBatch idempotence recipe (a
    * delta double-applied would silently corrupt the view, unlike
    * st9's naturally-idempotent partition overwrite). Since round 12
    * the query is STOPPED after two arrival batches and a brand-new
    * query instance resumes from the same checkpoint (st8's recovery
    * recipe): the restarted query must apply EXACTLY the one new batch
    * (never re-applying the committed ones), and the gate then
    * re-delivers the captured final batch under its original batchId
    * and requires the view byte-unchanged — the guard reconstructed
    * from disk, not from query-instance memory. In production the
    * aggregate+marker write is one transactional commit (Delta/
    * Iceberg); here they are two parquet writes, same plan shape.
    *
    * Changelog: the u9/u10 orders mutation (deletes, in-place updates,
    * new-group inserts), split over 3 arrival batches by key residue.
    * Group deltas commute, so arrival batching cannot change the
    * result. FULL oracle = u10's: DuckDB recomputes the v2 aggregate
    * from scratch — streamed-incremental == rescan, across engines.
    */
  val st16 = QueryDef(
    "st16_stream_incremental_agg",
    { (s, d) =>
    import s.implicits._
    val base = graft.util.Fixtures.dir + "/st16"
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val aggDir = s"$base/agg"
    val metaDir = s"$base/meta"
    val replayDir = s"$base/replay"
    val v1 = Tables.load(s, d, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus").as("st"))
    val v2 = v1.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("cents", when(col("o_orderkey") % 5 === 0,
        col("cents") * 2).otherwise(col("cents")))
      .unionByName(v1.filter(col("o_orderkey") <= 300)
        .select((col("o_orderkey") + 20000000).as("o_orderkey"),
          lit(9999L).as("cents"), lit("X").as("st")))
    // checkpoint the changelog ONCE: each feed.add below writes a
    // filtered view of it, and the lazy full-outer join would re-run
    // per batch otherwise (m21's single-build discipline)
    val log = graft.ops.Cdc.snapshotDiff(v1, v2, "o_orderkey",
      keepOld = true).localCheckpoint(true)
    // the stored view at v1, seeded through the extracted sink
    val view = new graft.ops.Cdc.MaintainedSumView(aggDir, metaDir,
      "st", "cents")
    view.init(v1.groupBy("st")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("v")))
    def viewRows(): Set[(String, Long, Long)] =
      view.rows(s).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def sink(batch: DataFrame, batchId: Long): Unit = {
      if (batchId > view.lastApplied(s)) // capture only fresh batches
        batch.write.mode("overwrite").parquet(replayDir)
      view.applyBatch(batch, batchId)
    }
    val feed = new FileFeed(s, "st16feed", log.schema)
    def runQuery(ks: Seq[Int]): Unit = {
      val q = feed.source()
        .writeStream.outputMode(OutputMode.Append())
        .foreachBatch(sink _)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        ks.foreach { k =>
          feed.add(log.filter(pmod(col("o_orderkey"), lit(3)) === k))
          q.processAllAvailable()
        }
      } finally q.stop()
    }
    runQuery(Seq(0, 1))
    val appliedBeforeRestart = view.lastApplied(s)
    // RESTART (st8's recipe): a brand-new query instance resumes from
    // the same checkpoint and sink state — it must apply EXACTLY the
    // one new batch, never the committed ones.
    runQuery(Seq(2))
    val resumedExactlyOne =
      view.lastApplied(s) == appliedBeforeRestart + 1
    val afterStream = viewRows()
    // redelivery of the captured final batch under an already-applied
    // id must be a no-op — the guard read back from DISK, post-restart
    sink(s.read.parquet(replayDir), view.lastApplied(s))
    val afterRedeliver = viewRows()
    val direct = v2.groupBy("st")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val ok = afterStream == direct && afterRedeliver == afterStream &&
      afterStream.nonEmpty && resumedExactlyOne &&
      appliedBeforeRestart >= 1
    s.read.parquet(aggDir)
      .select(col("st"), col("n"), col("v").as("price_cents"))
      .filter(lit(ok))
  },
    oracle = Some(
      """WITH v1 AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderstatus AS st
        |  FROM orders),
        |v2 AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN cents * 2 ELSE cents END AS cents,
        |         st
        |  FROM v1 WHERE k % 13 <> 0
        |  UNION ALL
        |  SELECT k + 20000000, 9999, 'X' FROM v1 WHERE k <= 300)
        |SELECT st, count(*) AS n,
        |       CAST(sum(cents) AS BIGINT) AS price_cents
        |FROM v2 GROUP BY 1""".stripMargin),
    benchEligible = false)

  /** ST17 — streaming dedup-on-ingest through the PERSISTED signature
    * store ([[graft.llm.DedupIndex]]): st10's production shape, scaled.
    * st10 re-runs `incrementalDedup` per micro-batch, which re-shingles
    * the whole ACCEPTED corpus every batch — O(corpus) per ingest, the
    * exact cost a 100 TB crawl loop cannot pay. Here the first batch
    * bootstrap-builds the store (after an internal self-dedup) and
    * every later batch is one `DedupIndex.append`: shingle the BATCH,
    * scan only the prefix partitions its own grams hash into, verify
    * only candidates — O(batch + candidates) per ingest, with the
    * corpus's signatures amortized on storage. Redelivered batches
    * fail LOUD (the store's monotonic-id guard rejects ids at or below
    * its high-water mark) rather than silently double-ingesting; a
    * production sink gates on batchId (st16's recipe) before calling
    * append.
    *
    * Fixture: st10's exactly — pre-cleaned originals (pairwise non-dup
    * under the operator's own metric) split over 4 arrival batches,
    * batch k re-delivering exact copies of batch k−1's docs as
    * re-crawls, so the outcome is provably order-independent. Gates:
    * every original accepted, every re-crawl dropped, the final store
    * fingerprint ensure()-validates over the accepted corpus WITHOUT
    * rebuild (XOR maintenance exact through bootstrap + 3 appends),
    * and sets row count == maintained meta count. FULL oracle: the
    * emitted frame is the final store CONTENT — (doc_id, n_grams) per
    * accepted doc read back from the sets table — and DuckDB
    * independently derives both the kept set (d9's brute-force pair
    * graph under the keep-smaller-id policy) and each survivor's
    * distinct-trigram count from the documents table. */
  val st17 = QueryDef(
    "st17_stream_dedup_index_ingest",
    { (s, d) =>
      import s.implicits._
      val threshold = 0.9
      val base = graft.util.Fixtures.dir + "/st17"
      graft.util.Fs.rmRecursive(new java.io.File(base))
      val dir = s"$base/store"
      val raw = Tables.documents(s, d)
        .filter(col("text").isNotNull && length(col("text")) >= 20)
        .select(col("doc_id"), col("text"))
      val maxId = raw.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 5000000L,
        s"st17 id packing assumes doc_id < 5,000,000; testdata now has " +
          s"$maxId — widen the k*10M/+5M packing ranges")
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val cleanIds = graft.llm.Dedup.incrementalDedup(
        empty, raw, "doc_id", "text", threshold)
      val clean = raw.join(cleanIds, Seq("doc_id"), "left_semi")
      val nSlices = 4
      def slice(k: Int): DataFrame =
        clean.filter(pmod(col("doc_id"), lit(nSlices)) === k)
      def rekey(df: DataFrame, k: Int, off: Long): DataFrame =
        df.select((col("doc_id") + lit(k * 10000000L + off)).as("doc_id"),
          col("text"))
      val batches = (0 until nSlices).map { k =>
        val originals = rekey(slice(k), k, 0L)
        if (k > 0) originals.unionAll(rekey(slice(k - 1), k, 5000000L))
        else originals
      }
      def sink(batch: DataFrame, batchId: Long): Unit = {
        if (!graft.util.Fs.exists(s, s"$dir/meta")) {
          // bootstrap: self-dedup the first batch, build the store
          val kept = graft.llm.Dedup.incrementalDedup(
            empty, batch, "doc_id", "text", threshold)
          graft.llm.DedupIndex.build(
            batch.join(kept, Seq("doc_id"), "left_semi"), dir, threshold)
        } else {
          graft.llm.DedupIndex.append(batch, dir, threshold).count(): Unit
        }
      }
      val feed = new FileFeed(s, "st17feed", raw.schema)
      val q = feed.source()
        .writeStream.outputMode(OutputMode.Append())
        .foreachBatch(sink _)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        batches.foreach { b => feed.add(b); q.processAllAvailable() }
      } finally q.stop()
      val sets = s.read.parquet(s"$dir/sets")
      def sig(df: DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)),
          coalesce(sum(col("doc_id")), lit(0L)),
          coalesce(expr("bit_xor(doc_id)"), lit(0L))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val expected = (0 until nSlices).map(k => rekey(slice(k), k, 0L))
        .reduce(_ unionAll _)
      val expSig = sig(expected)
      val gotSig = sig(sets.select(col("doc_id")))
      val nRecrawlsKept =
        sets.filter(col("doc_id") % 10000000L >= 5000000L).count()
      // accepted live corpus = the batches' rows the store kept; the
      // maintained XOR fingerprint must validate it without rebuild
      val live = batches.reduce(_ unionAll _)
        .join(sets.select("doc_id"), Seq("doc_id"), "left_semi")
      val b0 = graft.llm.DedupIndex.buildsThisProcess
      graft.llm.DedupIndex.ensure(live, dir, threshold)
      val noRebuild = graft.llm.DedupIndex.buildsThisProcess == b0
      val metaDocs = s.read.parquet(s"$dir/meta").head()
        .getAs[Long]("n_docs")
      val ok = gotSig == expSig && gotSig._1 > 0L &&
        nRecrawlsKept == 0L && noRebuild && metaDocs == gotSig._1
      sets.select(col("doc_id"), size(col("sh")).as("n_grams"))
        .filter(lit(ok))
    },
    oracle = Some(
      """WITH raw AS (SELECT doc_id, text FROM documents
        |             WHERE text IS NOT NULL AND length(text) >= 20),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM raw),
        |tri AS (SELECT doc_id,
        |               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |                    ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |               END AS sh
        |        FROM toks),
        |cnt AS (SELECT doc_id, len(sh) AS n_grams FROM tri),
        |shd AS (SELECT doc_id, unnest(sh) AS s FROM tri),
        |inter AS (SELECT a.doc_id AS pa, b.doc_id AS pb, count(*) AS ix
        |          FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |drops AS (SELECT DISTINCT pb AS id FROM inter
        |          JOIN cnt ca ON pa = ca.doc_id JOIN cnt cb ON pb = cb.doc_id
        |          WHERE ix * 1.0 / (ca.n_grams + cb.n_grams - ix) >= 0.9),
        |clean AS (SELECT doc_id FROM raw
        |          WHERE doc_id NOT IN (SELECT id FROM drops))
        |SELECT c.doc_id + (c.doc_id % 4) * 10000000 AS doc_id, g.n_grams
        |FROM clean c JOIN cnt g ON c.doc_id = g.doc_id""".stripMargin),
    benchEligible = false)

  def all: Seq[QueryDef] =
    Seq(st1, st2, st3, st4, st5, st6, st7, st8, st9, st10, st11, st12, st13,
      st14, st15, st16, st17)
}
