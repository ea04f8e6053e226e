package graft.io

import graft.QueryDef
import graft.ml.Sim
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Rows-only correctness entries for the ingestion surface (S1-S8, S12,
  * U2): generate the reference-shaped fixtures (FIXTURES.md §1/§4),
  * write them as real text files, scan them back through the production
  * readers, and emit a row ONLY if every round-trip invariant holds —
  * an ingest failure yields 0 rows and trips the driver's check.
  * (Mirrors `tests/test_read.py:110-117` round-trip style.)
  */
object IoQueries {

  private val fixtureDir = graft.util.Fixtures.dir

  private def plinkRawPath: String =
    new java.io.File(s"$fixtureDir/dummy_plink.raw").getAbsolutePath

  /** S1+S2+S4+S5+S6+S7+P4 — PLINK .raw → bundle → parquet → re-read.
    *
    * FULL oracle since r11: the emitted frame is (row count, total
    * dosage mass, recoded label mass) as read back through the FULL
    * production chain (.raw text scan → recode → bundle write →
    * bundle re-read), and DuckDB recomputes the same three numbers by
    * parsing the .raw TEXT FILE itself (`read_csv`, space-delimited) —
    * an independent parser must agree with the whole ingest pipeline,
    * including the 1/2 → 0/1 phenotype recode (label_sum =
    * Σ(PHENOTYPE−1)). All summed values are small integers, so the
    * DOUBLE columns are exact. The .fam/width/cols-table invariants
    * stay as emission gates.
    */
  // shared between the s1 query body and its oracle: tuning the
  // fixture in one place cannot silently desynchronize the SNP-name
  // list the oracle sums
  private val s1Cfg = Sim.Config(n = 100L, p = 10, seed = 42L,
    chunkRows = 25L)

  val s1 = QueryDef(
    "s1_plink_bundle_roundtrip",
    { (s, d) =>
    val cfg = s1Cfg
    val bundle = Sim.bundle(s, cfg)
    val names = Sim.snpNames(cfg.p, cfg.seed)
    // render the .raw text (100×10 fixture — driver-side by design)
    val header = (Plink.metaCols ++ names).mkString(" ")
    val lines = bundle
      .select(col("fid"), col("iid"), col("pat"), col("mat"),
        col("sex").cast("int"), col("phenotype").cast("int"), col("features"))
      .collect()
      .map { r =>
        val feats = r.getSeq[Float](6).map(_.toInt).mkString(" ")
        s"${r.getString(0)} ${r.getString(1)} ${r.getString(2)} ${r.getString(3)} ${r.getInt(4)} ${r.getInt(5)} $feats"
      }
    Files.createDirectories(Paths.get(fixtureDir))
    val rawPath = plinkRawPath
    Files.write(Paths.get(rawPath),
      (header +: lines.toSeq).mkString("\n").getBytes)

    // S3: .fam companion file (first 6 columns, no header)
    val famPath = s"$fixtureDir/dummy_plink.fam"
    Files.write(Paths.get(famPath),
      lines.map(_.split(" ").take(6).mkString(" ")).mkString("\n").getBytes)
    val fam = Plink.readFam(s, famPath)
    val famOk = fam.count() == cfg.n &&
      fam.columns.toSeq == Seq("fid", "iid", "pat", "mat", "sex", "phenotype")

    // S1/S4: scan back; P4 recode must fire (phenotype coded 1/2)
    val scanned = Plink.readRaw(s, rawPath)
      .withColumn("block_id", (col("iid").cast("long") - 10000) / cfg.chunkRows)
      .withColumn("block_id", col("block_id").cast("long"))
    val cols = Plink.colsTable(s, rawPath)
    // S7/S5/S6: bundle store round-trip
    val storeDir = s"$fixtureDir/bundle_store"
    Bundle.write(scanned, cols, storeDir)
    val reread = Bundle.read(s, storeDir)

    val orig = bundle.agg(
      count(lit(1)).cast("long").as("n"),
      sum(aggregate(col("features"), lit(0.0d),
        (acc, x) => acc + x.cast("double"))).as("dosage_sum"),
      sum(col("label")).cast("double").as("label_sum")).head()
    val back = reread.agg(
      count(lit(1)).cast("long").as("n"),
      sum(aggregate(col("features"), lit(0.0d),
        (acc, x) => acc + x.cast("double"))).as("dosage_sum"),
      sum(col("label")).cast("double").as("label_sum")).head()
    val widthOk = reread.select(size(col("features"))).head().getInt(0) == cfg.p
    val labelsRecoded = reread.agg(max(col("label"))).head()
      .getFloat(0) == 1f // 1/2 PLINK coding → 0/1
    val ok = orig == back && widthOk && labelsRecoded &&
      cols.count() == cfg.p && famOk
    val spark = s; import spark.implicits._
    Seq((back.getLong(0), back.getDouble(1), back.getDouble(2)))
      .toDF("n", "dosage_sum", "label_sum").filter(lit(ok))
  },
    oracle = Some {
      val names = Sim.snpNames(s1Cfg.p, s1Cfg.seed)
      val dosage = names.map(n => "\"" + n + "\"").mkString(" + ")
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum($dosage) AS DOUBLE) AS dosage_sum,
         |       CAST(sum(PHENOTYPE - 1) AS DOUBLE) AS label_sum
         |FROM read_csv('$plinkRawPath', delim = ' ', header = true)""".stripMargin
    },
    benchEligible = false)

  private def covariatesTsvPath: String =
    new java.io.File(s"$fixtureDir/covariates.tsv").getAbsolutePath
  private def hpDirGlob: String =
    new java.io.File(s"$fixtureDir/hp_dir").getAbsolutePath + "/*/*.csv"

  /** S8+S9+S12+U2 — covariate TSV validation scan + CSV sink →
    * multi-file HP-results glob scan.
    *
    * FULL oracle since r11: the emitted frame carries (a) a per-row
    * content hash sum over the covariate TSV as parsed by the
    * PRODUCTION reader, with each double re-rendered through the same
    * printf shape the writer used (%.6f/%.1f recover the file text
    * exactly — the text has ≤6 decimals, so parse→format is the
    * identity), and (b) integral aggregates over the glob-scanned HP
    * CSVs. DuckDB replays (a) from the RAW TEXT (`all_varchar` read —
    * no float parsing at all) and (b) by parsing the same CSV glob —
    * so both engine text readers are cross-checked against an
    * independent parser. Schema/uniqueness gates stay on emission.
    */
  val s8 = QueryDef(
    "s8_satellite_io",
    { (s, d) =>
    val cfg = Sim.Config(n = 100L, p = 4, seed = 42L)
    val cov = Sim.covariates(s, cfg)
    // write the reference-format TSV (FID IID COV1..)
    val rows = cov.collect().map { r =>
      f"${r.getString(0)}\t${r.getString(1)}\t${r.getFloat(2)}%.6f\t${r.getFloat(3)}%.6f\t${r.getFloat(4)}%.1f"
    }
    Files.createDirectories(Paths.get(fixtureDir))
    val tsvPath = covariatesTsvPath
    Files.write(Paths.get(tsvPath),
      ("FID\tIID\tCOV1\tCOV2\tCOV3" +: rows.toSeq).mkString("\n").getBytes)
    val covBack = Sinks.readCovariates(s, tsvPath)

    // S9 sink → S12 glob scan (two files to prove the U2 concat)
    val spark = s; import spark.implicits._
    val hp1 = Seq((0.05, 0.8, 0.9, 4, "auc", 0.71, 0.74, 0, 50),
      (0.02, 0.7, 0.8, 3, "auc", 0.69, 0.70, 0, 50))
      .toDF("eta", "subsample", "colsample_bytree", "max_depth", "metric",
        "score", "train_score", "fold", "n_boost_round")
    val hp2 = hp1.withColumn("fold", col("fold") + 1)
    Sinks.writeCsv(hp1, s"$fixtureDir/hp_dir/part1", coalesce1 = true)
    Sinks.writeCsv(hp2, s"$fixtureDir/hp_dir/part2", coalesce1 = true)
    val hpBack = Sinks.readHpResults(s, s"$fixtureDir/hp_dir/*/*.csv")

    val ok = covBack.count() == cfg.n &&
      covBack.columns.toSeq == Seq("fid", "iid", "COV1", "COV2", "COV3") &&
      hpBack.count() == 4 &&
      math.abs(hpBack.agg(sum("score")).head().getDouble(0) - 2.80) < 1e-9
    val covSummary = covBack.agg(
      count(lit(1)).cast("long").as("n_cov"),
      sum(conv(substring(md5(concat_ws("\u0001", col("fid"), col("iid"),
        format_string("%.6f", col("COV1")),
        format_string("%.6f", col("COV2")),
        format_string("%.1f", col("COV3")))), 1, 8), 16, 10).cast("long"))
        .as("cov_content_sum")).head()
    val hpSummary = hpBack.agg(
      count(lit(1)).cast("long").as("hp_rows"),
      sum(round(col("score") * 100).cast("long")).as("hp_score_cents"),
      sum(col("fold")).cast("long").as("hp_fold_sum")).head()
    Seq((covSummary.getLong(0), covSummary.getLong(1), hpSummary.getLong(0),
      hpSummary.getLong(1), hpSummary.getLong(2)))
      .toDF("n_cov", "cov_content_sum", "hp_rows", "hp_score_cents",
        "hp_fold_sum")
      .filter(lit(ok))
  },
    oracle = Some(
      s"""WITH cov AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cov,
         |         CAST(sum(('0x' || substr(md5(
         |             FID || chr(1) || IID || chr(1) || COV1 || chr(1)
         |             || COV2 || chr(1) || COV3), 1, 8))::BIGINT) AS BIGINT)
         |           AS cov_content_sum
         |  FROM read_csv('$covariatesTsvPath', delim = '\t', header = true,
         |                all_varchar = true)),
         |hp AS (
         |  SELECT CAST(count(*) AS BIGINT) AS hp_rows,
         |         CAST(sum(CAST(round(score * 100) AS BIGINT)) AS BIGINT)
         |           AS hp_score_cents,
         |         CAST(sum(fold) AS BIGINT) AS hp_fold_sum
         |  FROM read_csv('$hpDirGlob', header = true))
         |SELECT * FROM cov, hp""".stripMargin),
    benchEligible = false)

  /** Corpus round-trip through an interchange format: write the
    * documents table, re-read it with the EXPLICIT schema — at 100 TB,
    * schema inference would burn a full extra scan before the first
    * real job; never infer on big corpora. FULL oracle since r11: the
    * emitted frame is the per-lang count/id/char/content-hash summary
    * of the RE-READ frame, and DuckDB computes the same aggregates
    * from the ORIGINAL parquet table — any row the format write/read
    * dropped, duplicated, or corrupted hash-mismatches (DuckDB cannot
    * parse ORC itself, so the cross-engine check runs through the
    * source the round-trip must preserve). The engine-side
    * source==re-read equality stays as the emission gate.
    */
  private def roundtrip(name: String, format: String): QueryDef =
    QueryDef(
      name,
      { (s, d) =>
        val docs = graft.Tables.documents(s, d)
        val out = s"$fixtureDir/${format}_docs"
        docs.write.mode("overwrite").format(format).save(out)
        val back = s.read.schema(docs.schema).format(format).load(out)
        def summary(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("lang").agg(
            count(lit(1)).cast("long").as("n"),
            sum(col("doc_id")).cast("long").as("id_sum"),
            sum(col("n_chars")).cast("long").as("char_sum"),
            sum(conv(substring(md5(concat_ws("", col("text"), col("lang"),
              col("source"))), 1, 8), 16, 10).cast("long")).as("content_sum"))
        val src = summary(docs).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
        val rt = summary(back).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
        val spark = s; import spark.implicits._
        rt.toSeq.toDF("lang", "n", "id_sum", "char_sum", "content_sum")
          .filter(lit(src.toSet == rt.toSet && src.nonEmpty))
      },
      oracle = Some(
        """SELECT lang, count(*) AS n,
          |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
          |       CAST(sum(n_chars) AS BIGINT) AS char_sum,
          |       CAST(sum(('0x' || substr(md5(coalesce(text, '')
          |           || coalesce(lang, '') || coalesce(source, '')), 1, 8)
          |         )::BIGINT) AS BIGINT) AS content_sum
          |FROM documents
          |GROUP BY lang""".stripMargin))

  /** Absolute path so the driver's DuckDB (own process, own cwd) reads
    * the exact files this JVM wrote. */
  private def jsonDocsDir: String =
    new java.io.File(s"$fixtureDir/json_docs").getAbsolutePath

  /** S9b — JSONL, the de-facto LLM-corpus interchange format. Full
    * DuckDB oracle (was rows-only through round 9): the query writes
    * the documents table as newline-delimited JSON, re-reads it with
    * the explicit schema, and emits per-lang count/id/char/content-hash
    * aggregates FROM THE RE-READ FRAME; DuckDB computes the same
    * aggregates by parsing the written files itself (`read_json`) — a
    * hash match proves the on-disk bytes are losslessly readable by an
    * INDEPENDENT JSON reader, not just by the writer. The engine-side
    * round-trip gate (re-read aggregates == source aggregates) stays:
    * a lossy write empties the output and fails the row-count compare.
    */
  val s9 = QueryDef(
    "s9_jsonl_roundtrip",
    { (s, d) =>
      val docs = graft.Tables.documents(s, d)
      docs.write.mode("overwrite").format("json").save(jsonDocsDir)
      val back = s.read.schema(docs.schema).format("json").load(jsonDocsDir)
      // Per-row content hash is 8 hex chars (32 bits): the per-lang sum
      // then provably fits int64 on BOTH engines up to 2^31 rows/group —
      // DuckDB's sum(BIGINT) promotes to HUGEINT, so a 48-bit per-row
      // hash would make the compared representations diverge once a
      // group's sum left int64 range, silently, only at large sf.
      def summary(df: org.apache.spark.sql.DataFrame) = df.groupBy("lang").agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(col("n_chars")).cast("long").as("char_sum"),
        sum(conv(substring(md5(concat_ws("", col("text"), col("lang"),
          col("source"))), 1, 8), 16, 10).cast("long")).as("content_sum"))
      val src = summary(docs).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      // Collect once and rebuild the emitted frame from the rows — no
      // cache to leak for the session's lifetime, no recompute either.
      val rtRows = summary(back).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val rtSet = rtRows.toSet
      val spark = s; import spark.implicits._
      rtRows.toSeq
        .toDF("lang", "n", "id_sum", "char_sum", "content_sum")
        .filter(lit(src == rtSet && src.nonEmpty))
    },
    // Every sum is CAST to BIGINT (repo convention, cf. Dedup/Curation
    // oracles): DuckDB's sum(BIGINT) returns HUGEINT, which the driver's
    // pandas bridge renders differently than Spark's BIGINT — the r10
    // hash mismatch was exactly this, on these three sums.
    oracle = Some(
      s"""SELECT lang, count(*) AS n,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(n_chars) AS BIGINT) AS char_sum,
         |       CAST(sum(('0x' || substr(md5(coalesce(text, '')
         |           || coalesce(lang, '') || coalesce(source, '')), 1, 8)
         |         )::BIGINT) AS BIGINT) AS content_sum
         |FROM read_json('$jsonDocsDir/*.json',
         |       format = 'newline_delimited',
         |       columns = {doc_id: 'BIGINT', text: 'VARCHAR',
         |                  lang: 'VARCHAR', source: 'VARCHAR',
         |                  n_chars: 'BIGINT'})
         |GROUP BY lang""".stripMargin),
    benchEligible = true)

  /** S10 — ORC, the other columnar format big corpora arrive in. */
  val s10 = roundtrip("s10_orc_roundtrip", "orc")

  /** Absolute path so the driver's DuckDB (own process, own cwd) reads
    * the exact hive layout this JVM wrote. */
  private def partDocsDir: String =
    new java.io.File(s"$fixtureDir/part_docs").getAbsolutePath

  private def upsertDocsDir: String =
    new java.io.File(s"$fixtureDir/upsert_docs").getAbsolutePath

  private def compactDocsDir: String =
    new java.io.File(s"$fixtureDir/compact_docs").getAbsolutePath

  /** S11 — hive-partitioned corpus write + partition-pruned re-read:
    * the layout decision that makes 100 TB queryable. A read filtered
    * to one `lang` must prune at the PARTITION level (the filter shows
    * up in the scan's PartitionFilters, so non-matching directories
    * are never listed into tasks — zero bytes read from them), not as
    * a post-scan row filter. FULL oracle since r11: the emitted frame
    * is the per-lang counts from the PARTITIONED re-read, and DuckDB
    * recomputes them by reading the same hive layout itself
    * (`read_parquet(..., hive_partitioning = 1)`) — a wrong partition
    * value encoding or a dropped directory hash-mismatches. The plan
    * pruning check and the round-trip count reconciliation stay as
    * emission gates.
    */
  val s11 = QueryDef(
    "s11_partitioned_write",
    { (s, d) =>
      val docs = graft.Tables.documents(s, d)
      docs.write.mode("overwrite").partitionBy("lang").parquet(partDocsDir)
      val back = s.read.parquet(partDocsDir)
      val en = back.filter(col("lang") === "en")
      val planStr = en.queryExecution.executedPlan.toString
      val pruned = planStr.contains("PartitionFilters") &&
        planStr.replaceAll("#\\d+", "").contains("(lang = en)")
      val nEn = en.count()
      val nEnOrig = docs.filter(col("lang") === "en").count()
      val nAll = back.count()
      val nAllOrig = docs.count()
      back.filter(col("lang").isNotNull)
        .groupBy("lang").agg(count(lit(1)).cast("long").as("n"))
        .filter(lit(pruned && nEn == nEnOrig && nAll == nAllOrig && nEn > 0))
    },
    oracle = Some(
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n
         |FROM read_parquet('$partDocsDir/*/*.parquet',
         |                  hive_partitioning = 1)
         |WHERE lang IS NOT NULL
         |GROUP BY 1""".stripMargin))

  /** S12 — dynamic-partition-overwrite upsert: re-land ONE partition of
    * a partitioned table without touching the others. `partitionOverwriteMode
    * =dynamic` + `mode(Overwrite)` replaces ONLY partitions present in
    * the incoming frame — the production shape for re-crawling one
    * day/lang of a 100 TB corpus (static overwrite would truncate the
    * whole table; append would duplicate). Gate: every file in the
    * untouched partitions is byte-identical (same name, size, mtime),
    * the target partition's content is the NEW version, and total
    * counts reconcile. FULL oracle since r11: the emitted frame is the
    * per-lang (count, v2-marked count) of the UPSERTED table, and
    * DuckDB recomputes it from the same hive layout — the `en`
    * partition must show 100% v2 rows, every other partition 0%, or
    * the hash mismatches; the untouched-files byte check stays as an
    * emission gate (file metadata is not SQL-visible).
    */
  val s12 = QueryDef(
    "s12_partition_upsert",
    { (s, d) =>
    val docs = graft.Tables.documents(s, d)
    val out = upsertDocsDir
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    def fileState(): Map[String, (Long, Long)] =
      graft.util.Fs.walkFiles(new java.io.File(out))
        .filter(f => f.getName.startsWith("part-"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
        .toMap
    val before = fileState()
    // recrawl of the `en` slice: text re-extracted (suffix marks v2).
    // concat_ws, not concat: concat returns NULL on null text, which
    // would exclude a null-text doc from the endsWith(" v2") count and
    // false-fail the n_en_v2 === nEnOrig gate.
    val recrawl = docs.filter(col("lang") === "en")
      .withColumn("text", concat_ws("", col("text"), lit(" v2")))
    recrawl.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang").parquet(out)
    val after = fileState()
    val enPrefix = s"${new java.io.File(out).getAbsolutePath}/lang=en/"
    val beforeOther = before.view.filterKeys(!_.startsWith(enPrefix)).toMap
    val afterOther = after.view.filterKeys(!_.startsWith(enPrefix)).toMap
    val othersUntouched = beforeOther == afterOther && beforeOther.nonEmpty
    val back = s.read.parquet(out)
    val nEnV2 = back.filter(col("lang") === "en" &&
      col("text").endsWith(" v2")).count()
    val nEn = back.filter(col("lang") === "en").count()
    val nEnOrig = docs.filter(col("lang") === "en").count()
    val nTotal = back.count()
    val ok = othersUntouched && nEnV2 == nEnOrig && nEnV2 == nEn &&
      nTotal == docs.count() && nEnV2 > 0
    back.filter(col("lang").isNotNull)
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(when(col("text").endsWith(" v2"), 1L)), lit(0L))
          .as("n_v2"))
      .filter(lit(ok))
  },
    oracle = Some(
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |       CAST(count(*) FILTER (WHERE text LIKE '% v2') AS BIGINT)
         |         AS n_v2
         |FROM read_parquet('$upsertDocsDir/*/*.parquet',
         |                  hive_partitioning = 1)
         |WHERE lang IS NOT NULL
         |GROUP BY 1""".stripMargin))

  /** S13 — small-file compaction: the table-maintenance pass every
    * long-lived 100 TB corpus needs. Streaming/incremental ingest
    * leaves thousands of tiny files per partition; every later query
    * then pays per-file open/footer costs and the scheduler drowns in
    * splits. Compaction = read partition-parallel, `repartition` on
    * the partition key to target-size outputs, rewrite. Gate: the
    * compacted table has materially fewer files AND byte-identical
    * content (count + id/char checksums match the fragmented
    * original). `maxRecordsPerFile` bounds file size from above;
    * repartition(1 per lang here — sf-sized) bounds the count from
    * below. In production the repartition factor is
    * ceil(partition_bytes / target_file_bytes) per partition.
    * FULL oracle since r11: the emitted frame is the compacted table's
    * per-lang count/id/char aggregates, recomputed by DuckDB from the
    * compacted files themselves — a compaction that drops, duplicates,
    * or corrupts rows hash-mismatches; the file-count reduction and
    * the source==compacted signature stay as emission gates.
    */
  val s13 = QueryDef(
    "s13_compaction",
    { (s, d) =>
    val docs = graft.Tables.documents(s, d)
    val frag = s"$fixtureDir/frag_docs"
    val compact = compactDocsDir
    // simulate a drip-fed table: many tiny files inside each partition
    docs.repartition(32).write.mode("overwrite")
      .partitionBy("lang").parquet(frag)
    def nFiles(dir: String): Long =
      graft.util.Fs.walkFiles(new java.io.File(dir))
        .count(_.getName.startsWith("part-")).toLong
    val before = nFiles(frag)
    val fragDf = s.read.parquet(frag)
    fragDf.repartition(col("lang"))
      .write.mode("overwrite").option("maxRecordsPerFile", 2000000)
      .partitionBy("lang").parquet(compact)
    val after = nFiles(compact)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("doc_id")), sum(col("n_chars"))).head()
    // signature the SOURCE table (one file) against the compacted
    // read-back — the gate's claim is source == compacted; signaturing
    // the fragmented intermediate instead would prove the same thing
    // while paying a second 100s-of-tiny-files scan for nothing
    val (a, b) = (sig(docs), sig(s.read.parquet(compact)))
    val ok = a == b && after * 4 <= before && after > 0
    s.read.parquet(compact)
      .filter(col("lang").isNotNull)
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(col("n_chars")).cast("long").as("char_sum"))
      .filter(lit(ok))
  },
    oracle = Some(
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(n_chars) AS BIGINT) AS char_sum
         |FROM read_parquet('$compactDocsDir/*/*.parquet',
         |                  hive_partitioning = 1)
         |WHERE lang IS NOT NULL
         |GROUP BY 1""".stripMargin))

  /** S14 — range-clustered layout: write the corpus range-partitioned +
    * sorted on a scan predicate column so parquet min/max stats make
    * selective reads touch FEW FILES. At 100 TB clustering is what
    * turns "filter n_chars BETWEEN a AND b" from a full scan into a
    * handful of file reads — partition pruning handles the partition
    * key (s11), clustering handles everything else. Gate: a selective
    * range filter over the clustered table reads ≤ 1/4 of the files
    * (measured via input_file_name, i.e. files that actually produced
    * rows post row-group skipping), while the same filter over an
    * unclustered (hash-shuffled) copy touches ALL of them; counts
    * match between both reads.
    */
  private def clusteredDocsDir: String =
    new java.io.File(s"$fixtureDir/clustered_docs").getAbsolutePath

  val s14 = QueryDef(
    "s14_clustered_layout",
    { (s, d) =>
      val docs = graft.Tables.documents(s, d)
      val clustered = clusteredDocsDir
      val unclustered = s"$fixtureDir/unclustered_docs"
      val nf = 16
      docs.repartitionByRange(nf, col("n_chars"))
        .sortWithinPartitions("n_chars")
        .write.mode("overwrite").parquet(clustered)
      docs.repartition(nf, col("doc_id"))
        .write.mode("overwrite").parquet(unclustered)
      val lo = 100L; val hi = 150L
      def touched(dir: String): (Long, Long) = {
        val hit = s.read.parquet(dir)
          .filter(col("n_chars").between(lo, hi))
          .select(input_file_name().as("f"), col("doc_id"))
        (hit.select("f").distinct().count(), hit.count())
      }
      val (filesC, nC) = touched(clustered)
      val (filesU, nU) = touched(unclustered)
      val ok = nC == nU && nC > 0 && filesC * 4 <= filesU
      // FULL oracle since r11: per-band counts + id checksums of the
      // CLUSTERED table as the engine reads it back; DuckDB re-reads
      // the same files independently — a clustering write that lost or
      // corrupted rows hash-mismatches. The file-touch pruning gates
      // (the layout claim itself — not SQL-visible) gate emission.
      s.read.parquet(clustered)
        .groupBy((col("n_chars") / 100L).cast("long").as("band"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("doc_id")).cast("long").as("id_sum"),
          sum(col("n_chars")).cast("long").as("char_sum"))
        .filter(lit(ok))
    },
    oracle = Some(
      s"""SELECT CAST(n_chars // 100 AS BIGINT) AS band,
         |       count(*) AS n,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(n_chars) AS BIGINT) AS char_sum
         |FROM read_parquet('$clusteredDocsDir/*.parquet')
         |GROUP BY 1""".stripMargin))

  /** Morton (Z-order) interleave of two pre-scaled bucket ids, each in
    * [0, 2^bits): bit b of x lands at position 2b, bit b of y at 2b+1.
    * Pure fold expression — codegen'd, scan-local.
    */
  def mortonKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** S15 — Z-order clustered layout: ONE physical sort order that
    * serves selective scans on TWO columns. Linear clustering (s14)
    * is perfect for its sort column and USELESS for any other — a
    * doc_id filter over an n_chars-sorted table touches every file.
    * Z-order interleaves the bits of both dimensions so any file's
    * z-range covers a bounded rectangle of (n_chars, doc_id) space: a
    * 2D-fraction-f single-dim band touches ~√f of the files instead
    * of all of them — the table-format trick (Delta/Iceberg OPTIMIZE
    * ZORDER) every multi-tenant 100 TB corpus relies on, here as a
    * plain repartitionByRange on the morton key. Gate: BOTH
    * single-dimension bands must touch at most half of the files —
    * one sort order serving two dimensions. (The linear control arm —
    * an n_chars-sorted layout whose doc_id band touches every file,
    * measured 64/64 vs z-order's 12/64 in round 4 — was a second
    * full-table write run on every bench purely to reprove that
    * constant; the gate now checks the z layout against n_files
    * directly and sheds the control write's ~10 s.)
    */
  private def zorderDocsDir: String =
    new java.io.File(s"$fixtureDir/zorder_docs").getAbsolutePath

  val s15 = QueryDef(
    "s15_zorder_layout",
    { (s, d) =>
      val docs = graft.Tables.documents(s, d)
      val nf = 64
      val bits = 10
      val stats = docs.agg(max(col("n_chars")), max(col("doc_id"))).head()
      val (maxC, maxId) = (stats.getLong(0), stats.getLong(1))
      def scaled(c: org.apache.spark.sql.Column, mx: Long) =
        least(floor(c * (1 << bits) / (mx + 1)).cast("long"), lit((1 << bits) - 1L))
      val z = docs.withColumn("__z",
        mortonKey(scaled(col("n_chars"), maxC), scaled(col("doc_id"), maxId), bits))
      val zDir = zorderDocsDir
      z.repartitionByRange(nf, col("__z")).sortWithinPartitions("__z")
        .drop("__z").write.mode("overwrite").parquet(zDir)
      // two selective single-dimension bands (~10% each)
      val cPred = col("n_chars").between(100L, 150L)
      val idPred = col("doc_id").between(maxId / 2, maxId / 2 + maxId / 10)
      def touched(p: org.apache.spark.sql.Column): Long =
        s.read.parquet(zDir).filter(p)
          .select(input_file_name()).distinct().count()
      val zC = touched(cPred); val zId = touched(idPred)
      val nTotal = graft.util.Fs.walkFiles(new java.io.File(zDir))
        .count(_.getName.startsWith("part-")).toLong
      val ok = zC * 2 <= nTotal && zId * 2 <= nTotal && zC > 0 && zId > 0
      // FULL oracle since r11: per-band content of BOTH selective bands
      // as the engine reads them back from the z-ordered layout; DuckDB
      // re-reads the written files independently — a z-order rewrite
      // that dropped/duplicated rows hash-mismatches. The file-touch
      // gates (one sort order must serve both dimensions) gate emission.
      s.read.parquet(zDir)
        .filter(cPred || idPred)
        .groupBy(when(cPred, lit("n_chars_band")).otherwise(lit("doc_id_band"))
          .as("band"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("doc_id")).cast("long").as("id_sum"),
          sum(col("n_chars")).cast("long").as("char_sum"))
        .filter(lit(ok))
    },
    oracle = Some(
      s"""SELECT CASE WHEN n_chars BETWEEN 100 AND 150 THEN 'n_chars_band'
         |            ELSE 'doc_id_band' END AS band,
         |       count(*) AS n,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(n_chars) AS BIGINT) AS char_sum
         |FROM read_parquet('$zorderDocsDir/*.parquet')
         |WHERE n_chars BETWEEN 100 AND 150
         |   OR doc_id BETWEEN (SELECT max(doc_id) // 2 FROM documents)
         |              AND (SELECT max(doc_id) // 2 + max(doc_id) // 10
         |                   FROM documents)
         |GROUP BY 1""".stripMargin))

  /** S16 — bucketed co-located join: write BOTH join sides bucketed on
    * the join key (`bucketBy` + `saveAsTable`), then join and aggregate
    * with ZERO shuffle exchanges anywhere in the plan. This is the 100 TB
    * join story: a fact⋈dim or fact⋈fact join on a pre-bucketed layout
    * moves no bytes at query time — the exchange is paid ONCE at write
    * time and amortized over every later join/aggregate on that key
    * (the Hive-bucketing / Iceberg-bucket-transform shape). The
    * pre-write `repartition(nb, key)` aligns write tasks with bucket
    * ownership (same murmur3 pmod), so each bucket lands in exactly one
    * file. The per-customer aggregate after the join also re-uses the
    * bucket distribution (HashPartitioning(c_custkey) satisfies the
    * group-by's ClusteredDistribution), so the WHOLE plan is
    * exchange-free — asserted via require, so a layout regression fails
    * the query rather than silently reintroducing a shuffle.
    */
  val s16 = QueryDef.sql(
    "s16_bucketed_join",
    """SELECT c_custkey, c_mktsegment,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total_price
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val nb = 8
    val orders = graft.Tables.orders(s, d)
      .select("o_custkey", "o_totalprice")
    val customer = graft.Tables.customer(s, d)
      .select("c_custkey", "c_mktsegment")
    orders.repartition(nb, col("o_custkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nb, "o_custkey").sortBy("o_custkey")
      .option("path", s"$fixtureDir/bucketed_orders")
      .saveAsTable("graft_orders_bucketed")
    customer.repartition(nb, col("c_custkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nb, "c_custkey").sortBy("c_custkey")
      .option("path", s"$fixtureDir/bucketed_customer")
      .saveAsTable("graft_customer_bucketed")
    // merge hint: at test SFs the dim side is broadcast-sized and
    // Catalyst would pick BroadcastHashJoin, which both hides the
    // bucket win being demonstrated and ships the dim every query; at
    // 100 TB fact⋈fact neither side broadcasts and SMJ-over-buckets is
    // the only exchange-free plan — pin that shape here.
    val joined = s.table("graft_customer_bucketed").hint("merge")
      .join(s.table("graft_orders_bucketed"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
    val plan = joined.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"),
      s"bucketed join plan regressed to a shuffle:\n$plan")
    require(plan.contains("SortMergeJoin"),
      s"bucketed join lost its sort-merge shape:\n$plan")
    joined
  }

  /** S17 — DYNAMIC partition pruning: the runtime complement of s11's
    * static pruning. A fact table partitioned on the join key, joined
    * to a dim side whose filter is only known at plan time as a
    * predicate on the DIM — Spark injects a `dynamicpruning` subquery
    * into the fact scan's PartitionFilters, so the fact side reads ONLY
    * the partitions the filtered dim can match (at 100 TB: the
    * difference between scanning 3 days and scanning 3 years when the
    * dashboard picks a window). The `require` pins the mechanism: a
    * plan that silently degrades to scan-all-then-join fails the query
    * rather than passing slowly. Result content is DuckDB-oracled (the
    * oracle replays the join relationally — pruning is an execution
    * detail the result must be invariant to).
    */
  val s17 = QueryDef.sql(
    "s17_dynamic_partition_pruning",
    """WITH e AS (SELECT event_id, epoch_us(ts) // 86400000000 AS day
      |           FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0),
      |b AS (SELECT min(day) AS d0 FROM e),
      |dim AS (SELECT DISTINCT day FROM e, b WHERE day BETWEEN d0 AND d0 + 2)
      |SELECT day, count(*) AS n,
      |       CAST(sum(event_id) AS BIGINT) AS id_checksum
      |FROM e JOIN dim USING (day) GROUP BY day""".stripMargin) { (s, d) =>
    val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .filter(col("us") >= 0)
      .select(col("event_id"), expr("us div 86400000000").as("day"))
    val dir = s"$fixtureDir/events_by_day"
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = s.read.parquet(dir)
    val minDay = ev.agg(min(col("day"))).head().getLong(0)
    // the dim side: a filtered frame NOT derived from the fact scan —
    // its BETWEEN predicate is what DPP pushes into the fact scan
    val dim = ev.select("day").distinct()
      .filter(col("day").between(minDay, minDay + 2))
    val joined = fact.join(dim, Seq("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).cast("long").as("id_checksum"))
    val plan = joined.queryExecution.executedPlan.toString
    require(plan.contains("dynamicpruning"),
      s"fact scan lost its dynamic partition pruning:\n$plan")
    joined
  }

  /** S18 — schema evolution on read: long-lived tables accrete columns,
    * so a 100 TB scan almost always spans files with DIFFERENT physical
    * schemas. The two production read policies, both exercised here on
    * real mixed-schema files (early files = v1 (key, price); later
    * files add priority):
    *  - `mergeSchema=true`: schema union, v1 files surface the added
    *    column as null — the exploratory path (O(files) footer merge,
    *    never the default at scale);
    *  - an EXPLICIT declared schema: the production path — no footer
    *    scan, uniform projection, missing columns null by position.
    * Gate: both reads agree row-for-row (count, null layout, checksum),
    * nulls land exactly on the v1 file rows, and a predicate on the
    * common column still pushes into the mixed scan (evolution must
    * not cost pushdown).
    */
  private def evolvedDir: String =
    new java.io.File(s"$fixtureDir/s18_evolved").getAbsolutePath

  val s18 = QueryDef(
    "s18_schema_evolution",
    { (s, d) =>
    val dir = evolvedDir
    graft.util.Fs.rmRecursive(new java.io.File(dir))
    val orders = graft.Tables.orders(s, d)
    val v1 = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v2 = orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    v1.write.mode("overwrite").parquet(dir)
    v2.write.mode("append").parquet(dir)
    val nAll = orders.count()
    val nV1 = v1.count()
    // path 1: merged-footer read
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    val mergedOk = merged.columns.sorted.toSeq ==
      Seq("o_orderkey", "o_orderpriority", "o_totalprice")
    val mNull = merged.filter(col("o_orderpriority").isNull).count()
    val mCount = merged.count()
    // evolution must not cost pushdown on the common column
    val plan = merged.filter(col("o_totalprice") > 100000.0d)
      .queryExecution.executedPlan.toString
    val pushOk = plan.contains("PushedFilters") &&
      plan.contains("o_totalprice")
    // path 2: explicit declared schema (no footer merge)
    val declared = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        orders.schema("o_orderkey").dataType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        orders.schema("o_totalprice").dataType),
      org.apache.spark.sql.types.StructField("o_orderpriority",
        org.apache.spark.sql.types.StringType)))
    val explicit = s.read.schema(declared).parquet(dir)
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(when(col("o_orderpriority").isNull, 1L)), lit(0L)),
        coalesce(sum(crc32(concat_ws("\u0001",
          col("o_orderkey").cast("string"),
          col("o_totalprice").cast("string"),
          coalesce(col("o_orderpriority"), lit("\u0000"))))), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val ms = sig(merged); val es = sig(explicit)
    val ok = nAll > 0 && mCount == nAll && mNull == nV1 &&
      mergedOk && pushOk && ms == es
    // FULL oracle since r11: per-priority aggregates of the MERGED
    // read (null priority = the v1 files), hash-compared against
    // DuckDB's own mixed-schema reader (`union_by_name`) over the same
    // files — an INDEPENDENT engine must agree on which rows carry the
    // evolved column and on every row's content. Schema/pushdown/
    // reads-agree checks stay as emission gates (not SQL-visible).
    merged
      .groupBy(coalesce(col("o_orderpriority"), lit(" ")).as("priority"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("o_orderkey")).cast("long").as("key_sum"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("price_cents"))
      .filter(lit(ok))
  },
    oracle = Some(
      s"""SELECT coalesce(o_orderpriority, ' ') AS priority,
         |       count(*) AS n,
         |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
         |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |         AS price_cents
         |FROM read_parquet('$evolvedDir/*.parquet', union_by_name = 1)
         |GROUP BY 1""".stripMargin))

  /** S19 — snapshot TIME TRAVEL on plain parquet + JSON manifests (the
    * Iceberg/Delta snapshot-isolation core, without the table format):
    * a commit writes ONLY new data files plus a manifest naming the
    * complete file set of that snapshot; a reader pins a snapshot by
    * loading exactly its manifest's files (`basePath` keeps the
    * partition column). Shipped files are never mutated, so every old
    * snapshot stays readable after later commits — copy-on-write at
    * file granularity, with GC of unreferenced files left to a
    * separate maintenance pass (as in the real formats). The commit
    * here replaces the `lang=en` files (a re-crawl) — v2's manifest is
    * (v1's files minus the replaced partition) + the new files.
    *
    * Gate: as-of-v1 == the original frame and as-of-v2 == the updated
    * frame (order-independent fingerprints), BOTH READ AFTER the v2
    * commit — proving v1 survived; and the v2 manifest reuses v1's
    * untouched files byte-for-byte (no rewrite amplification).
    *
    * FULL oracle since r11: the emitted frame is the per-(snapshot,
    * lang) count/id/content-hash profile of BOTH manifest-pinned
    * reads, and DuckDB re-derives it from the written files by
    * replaying the commit rule itself — snapshot 1 = the v=00001
    * files; snapshot 2 = v=00001 minus the replaced `en` partition
    * plus the v=00002 files. A manifest that referenced a wrong file
    * set, or a commit that mutated a shipped file, hash-mismatches.
    * The byte-reuse and fingerprint-equality gates stay on emission.
    */
  private def ttRootDir: String =
    new java.io.File(s"$fixtureDir/tt_docs").getAbsolutePath

  val s19 = QueryDef(
    "s19_snapshot_time_travel",
    { (s, d) =>
    val docs = graft.Tables.documents(s, d)
      .select("doc_id", "text", "n_chars", "lang")
    val root = ttRootDir
    val dataDir = s"$root/data"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def dataFiles(sub: String): Seq[String] =
      graft.util.Fs.walkFiles(new java.io.File(s"$dataDir/$sub"))
        .filter(_.getName.startsWith("part-"))
        .map(_.getAbsolutePath).sorted
    def writeManifest(v: Int, files: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(s"$root/manifests")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve(s"v$v.json"),
        files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") +
          "\"").mkString("[", ",", "]"))
    }
    def readManifest(v: Int): Seq[String] = {
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/manifests/v$v.json"))
      txt.stripPrefix("[").stripSuffix("]").split("\",\"").toSeq
        .map(_.stripPrefix("\"").stripSuffix("\"").replace("\\\"", "\"")
          .replace("\\\\", "\\")).filter(_.nonEmpty)
    }
    // version dirs are partition-style (v=00001) so basePath-rooted
    // partition discovery stays consistent across mixed-version file
    // sets; the synthetic `v` column is dropped on read
    def readSnapshot(v: Int) =
      s.read.option("basePath", dataDir).parquet(readManifest(v): _*)
        .drop("v")
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val canon = Seq("doc_id", "text", "n_chars", "lang")
        .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
      val r = df.select(count(lit(1)),
        coalesce(sum(crc32(concat_ws("\u0001", canon: _*))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // commit v1: full corpus, partitioned by lang
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$dataDir/v=00001")
    writeManifest(1, dataFiles("v=00001"))
    // commit v2: re-crawl of lang=en — new files ONLY for that slice
    val recrawl = docs.filter(col("lang") === "en")
      .withColumn("text", concat_ws("", col("text"), lit(" v2")))
    recrawl.write.mode("overwrite").partitionBy("lang")
      .parquet(s"$dataDir/v=00002")
    val enPrefix = s"$dataDir/v=00001/lang=en/"
    val v1Files = readManifest(1)
    val carried = v1Files.filterNot(_.startsWith(
      new java.io.File(enPrefix).getAbsolutePath))
    writeManifest(2, carried ++ dataFiles("v=00002"))
    // reads AFTER both commits
    val expectedV2 = docs.filter(col("lang") =!= "en").unionByName(recrawl)
    val fpV1 = fp(readSnapshot(1)); val fpOrig = fp(docs)
    val fpV2 = fp(readSnapshot(2)); val fpExp = fp(expectedV2)
    val reuse = readManifest(2).toSet.intersect(v1Files.toSet).size
    val ok = fpV1 == fpOrig && fpV2 == fpExp && fpV1._1 > 0 && reuse > 0
    def contentSum = sum(conv(substring(md5(concat_ws("\u0001",
      col("doc_id").cast("string"), coalesce(col("text"), lit("\u0000")),
      col("n_chars").cast("string"))), 1, 8), 16, 10).cast("long"))
    readSnapshot(1).withColumn("snapshot", lit(1L))
      .unionByName(readSnapshot(2).withColumn("snapshot", lit(2L)))
      .groupBy("snapshot", "lang")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        contentSum.as("content_sum"))
      .filter(lit(ok))
  },
    oracle = Some(
      s"""WITH v1 AS (
         |  SELECT doc_id, text, n_chars, lang
         |  FROM read_parquet('$ttRootDir/data/v=00001/*/*.parquet',
         |                    hive_partitioning = 1)),
         |v2new AS (
         |  SELECT doc_id, text, n_chars, lang
         |  FROM read_parquet('$ttRootDir/data/v=00002/*/*.parquet',
         |                    hive_partitioning = 1)),
         |snaps AS (
         |  SELECT CAST(1 AS BIGINT) AS snapshot, * FROM v1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), * FROM v1 WHERE lang <> 'en'
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), * FROM v2new)
         |SELECT snapshot, lang, count(*) AS n,
         |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(('0x' || substr(md5(doc_id::VARCHAR || chr(1)
         |           || coalesce(text, chr(0)) || chr(1)
         |           || n_chars::VARCHAR), 1, 8))::BIGINT) AS BIGINT)
         |         AS content_sum
         |FROM snaps
         |GROUP BY 1, 2""".stripMargin))

  /** Distributed parquet-footer audit: per column chunk, the encodings
    * actually used plus compressed/uncompressed byte totals — the
    * storage-tuning signal (is dictionary firing on the low-cardinality
    * columns? is the codec earning its CPU on each column?) that
    * decides layout work like s13/s14/s15. Footers are read inside
    * mapPartitions over the FILE LIST, so a 100 TB table's audit
    * parallelizes across its millions of footers instead of looping on
    * the driver; each task touches only footer bytes, never data pages.
    */
  def parquetColumnAudit(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val files: Seq[String] = {
      val f = new java.io.File(dir)
      if (f.isFile) Seq(f.getAbsolutePath)
      else graft.util.Fs.walkFiles(f)
        .filter(x => x.getName.endsWith(".parquet") && !x.getName.startsWith("."))
        .map(_.getAbsolutePath)
    }
    val spark = s; import spark.implicits._
    spark.sparkContext.parallelize(files, math.max(1, files.size / 16))
      .flatMap { path =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(path), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.flatMap { block =>
            block.getColumns.asScala.map { c =>
              (c.getPath.toDotString,
                c.getEncodings.asScala.map(_.name).toSeq.sorted.mkString(","),
                c.getCodec.name, c.getValueCount,
                c.getTotalSize, c.getTotalUncompressedSize)
            }
          }.toSeq
        } finally reader.close()
      }
      .toDF("column", "encodings", "codec", "n_values",
        "compressed_bytes", "uncompressed_bytes")
      .groupBy("column", "encodings", "codec")
      .agg(sum(col("n_values")).as("n_values"),
        sum(col("compressed_bytes")).as("compressed_bytes"),
        sum(col("uncompressed_bytes")).as("uncompressed_bytes"))
  }

  private def auditCopyPath: String =
    new java.io.File(s"$fixtureDir/s20_documents.parquet").getAbsolutePath

  /** S20 — encoding audit of the shipped documents table. Gates: every
    * column dictionary-encodes (RLE_DICTIONARY present — the driver's
    * writer emits it; a PLAIN-only column would mean dictionary fell
    * back, the thing this audit exists to catch), the text column's
    * codec actually compresses (ratio < 0.8), and value counts
    * reconcile with the row count.
    *
    * FULL oracle since r11: the emitted frame is the per-column-chunk
    * audit itself — (column, sorted encoding set, codec, value count,
    * compressed/uncompressed bytes) — and DuckDB re-reads the SAME
    * footers independently with `parquet_metadata()`. Two parquet
    * implementations must agree on every footer field, or the engine's
    * footer walk is misreading metadata. The oracle SQL can only name
    * a fixed path, so the query byte-copies the input file into the
    * fixture dir first (a copy, not a rewrite — footers identical).
    * The dictionary/ratio/count gates stay on emission.
    */
  val s20 = QueryDef(
    "s20_parquet_encoding_audit",
    { (s, d) =>
    val src = java.nio.file.Paths.get(s"$d/documents.parquet")
    Files.createDirectories(Paths.get(fixtureDir))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(auditCopyPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val audit = parquetColumnAudit(s, auditCopyPath).cache()
    val nRows = graft.Tables.documents(s, d).count()
    val perCol = audit.groupBy("column")
      .agg(sum(col("n_values")).as("nv"),
        max(col("encodings").contains("RLE_DICTIONARY")).as("has_dict"),
        (sum(col("compressed_bytes")).cast("double") /
          sum(col("uncompressed_bytes"))).as("ratio"))
    val summary = perCol.agg(
      count(lit(1)).as("n_columns"),
      sum(when(col("has_dict"), 1L).otherwise(0L)).as("n_dict_columns"),
      sum(when(col("nv") === nRows, 1L).otherwise(0L)).as("n_count_ok"),
      min(when(col("column") === "text", col("ratio"))).as("text_ratio"))
      .head()
    val ok = summary.getLong(0) == 5 &&
      summary.getLong(1) == summary.getLong(0) &&
      summary.getLong(2) == summary.getLong(0) &&
      summary.getDouble(3) < 0.8
    // collect the (columns × row-groups)-sized audit rows BEFORE
    // unpersisting, then emit from the collected rows — unpersisting
    // under a still-lazy `out` would re-run the footer walk when the
    // caller materializes it
    import s.implicits._
    val outRows = audit
      .select(col("column"), col("encodings"), col("codec"),
        col("n_values").cast("long").as("n_values"),
        col("compressed_bytes").cast("long").as("compressed_bytes"),
        col("uncompressed_bytes").cast("long").as("uncompressed_bytes"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    audit.unpersist()
    outRows.toSeq
      .toDF("column", "encodings", "codec", "n_values",
        "compressed_bytes", "uncompressed_bytes")
      .filter(lit(ok))
  },
    oracle = Some(
      s"""SELECT path_in_schema AS "column",
         |       array_to_string(list_sort(list_distinct(
         |         string_split(encodings, ', '))), ',') AS encodings,
         |       compression AS codec,
         |       CAST(sum(num_values) AS BIGINT) AS n_values,
         |       CAST(sum(total_compressed_size) AS BIGINT)
         |         AS compressed_bytes,
         |       CAST(sum(total_uncompressed_size) AS BIGINT)
         |         AS uncompressed_bytes
         |FROM parquet_metadata('$auditCopyPath')
         |GROUP BY 1, 2, 3""".stripMargin))

  /** Zone-map audit: per INT64 column, the row-group min/max footer
    * stats aggregated to (n_groups, Σ(span), global min/max) — the
    * metric that says whether row-group skipping will actually fire on
    * a given predicate column. On a column the layout is sorted by,
    * row-group ranges tile the domain (Σspan ≈ range); on an unsorted
    * column every row group spans ~the whole domain
    * (Σspan ≈ n_groups × range) and min/max pruning is useless. Same
    * distributed footer-walk shape as [[parquetColumnAudit]]: tasks
    * read footer bytes only, never data pages.
    */
  def parquetZoneMapAudit(s: org.apache.spark.sql.SparkSession,
      dir: String, cols: Set[String]): org.apache.spark.sql.DataFrame = {
    val files: Seq[String] = graft.util.Fs.walkFiles(new java.io.File(dir))
      .filter(x => x.getName.endsWith(".parquet") && !x.getName.startsWith("."))
      .map(_.getAbsolutePath)
    val spark = s; import spark.implicits._
    spark.sparkContext.parallelize(files, math.max(1, files.size / 16))
      .flatMap { path =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(path), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.flatMap { block =>
            block.getColumns.asScala.collect {
              case c if cols.contains(c.getPath.toDotString) &&
                  c.getPrimitiveType.getPrimitiveTypeName ==
                    org.apache.parquet.schema.PrimitiveType
                      .PrimitiveTypeName.INT64 &&
                  c.getStatistics != null &&
                  c.getStatistics.hasNonNullValue =>
                val st = c.getStatistics
                  .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
                (c.getPath.toDotString, st.getMin, st.getMax)
            }
          }.toSeq
        } finally reader.close()
      }
      .toDF("column", "rg_min", "rg_max")
      .groupBy("column")
      .agg(count(lit(1)).as("n_groups"),
        sum(col("rg_max") - col("rg_min") + 1L).as("span_sum"),
        min(col("rg_min")).as("min_v"),
        max(col("rg_max")).as("max_v"))
  }

  private def zonemapDir: String =
    new java.io.File(s"$fixtureDir/s21_sorted_docs").getAbsolutePath

  /** S21 — zone-map tightness of a sort-clustered layout, under a FULL
    * parquet_metadata() oracle: the engine writes the corpus
    * range-sorted by n_chars, walks the footers itself, and emits the
    * per-column zone-map profile; DuckDB reads the SAME footers
    * independently. Emission gates pin the layout claim the numbers
    * exist to prove: the sort column's row-group spans TILE the domain
    * (Σspan ≤ 2× the global range) while the unsorted column's spans
    * cover it redundantly (Σspan ≥ 4× its range) — i.e. min/max
    * skipping fires on n_chars scans and cannot on doc_id scans.
    */
  val s21 = QueryDef(
    "s21_zonemap_audit",
    { (s, d) =>
      val docs = graft.Tables.documents(s, d)
      docs.repartitionByRange(16, col("n_chars"))
        .sortWithinPartitions("n_chars")
        .write.mode("overwrite").parquet(zonemapDir)
      val audit = parquetZoneMapAudit(s, zonemapDir, Set("n_chars", "doc_id"))
      val rows = audit.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toMap
      val ok = rows.contains("n_chars") && rows.contains("doc_id") && {
        val (_, spanC, minC, maxC) = rows("n_chars")
        val (nG, spanI, minI, maxI) = rows("doc_id")
        spanC <= 2L * (maxC - minC + 1) &&
          spanI >= 4L * (maxI - minI + 1) && nG >= 8
      }
      audit.filter(lit(ok))
    },
    oracle = Some(
      s"""SELECT path_in_schema AS "column",
         |       CAST(count(*) AS BIGINT) AS n_groups,
         |       CAST(sum(stats_max_value::BIGINT - stats_min_value::BIGINT
         |                + 1) AS BIGINT) AS span_sum,
         |       CAST(min(stats_min_value::BIGINT) AS BIGINT) AS min_v,
         |       CAST(max(stats_max_value::BIGINT) AS BIGINT) AS max_v
         |FROM parquet_metadata('$zonemapDir/*.parquet')
         |WHERE path_in_schema IN ('n_chars', 'doc_id')
         |GROUP BY 1""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(s1, s8, s9, s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, s20,
      s21)
}
