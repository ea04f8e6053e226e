package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the LATEST right row of the same key
  * with right ts ≤ left ts. Spark has no native as-of join (it is the
  * canonical "operator the engine lacks"); a range-condition join would
  * explode to |left|×|right-per-key| before filtering. This is the
  * scale-safe distributed formulation:
  *
  *   tag and union both inputs → ONE shuffle on the key → per-key
  *   ordered running `last(struct(right cols), ignoreNulls)` → keep
  *   left rows.
  *
  * The right row travels as a single struct so the fill is atomic —
  * per-column fills could mix rows when a right column is legitimately
  * null. At equal timestamps right sorts before left, so a right row
  * AT the left timestamp matches (ties inclusive, matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`). Deterministic when the right side
  * is unique per (key, ts) — the standard as-of precondition; dedupe
  * upstream if violated.
  *
  * At 100 TB: cost is one hash exchange of left+right on the key and a
  * per-key sort — the same shape as any windowed op here (o5, e2);
  * per-key groups bound the sort, nothing global, no driver state.
  */
object AsofJoin {

  /** Output = every left column plus each non-key right column as
    * `asof_<name>` (null where the key has no right row at or before
    * the left timestamp). `toleranceUs` bounds the match age (pandas
    * merge_asof semantics): a fill older than `leftTs − toleranceUs`
    * is blanked back to null. Tolerance requires NUMERIC (long micros)
    * ts columns — the subtraction happens in the plan; the unbounded
    * default works with any orderable ts type as before. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, prefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(toleranceUs.forall(_ >= 0),
      s"toleranceUs must be >= 0: $toleranceUs")
    if (toleranceUs.isDefined) {
      // the gate subtracts ts values in the plan — meaningful only for
      // numeric (long micros) timestamps; fail loudly up front instead
      // of surfacing a Catalyst type error from deep inside the plan
      val numeric = Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType)
      val lt = left.schema(leftTs).dataType
      val rt = right.schema(rightTs).dataType
      require(numeric(lt) && numeric(rt),
        s"toleranceUs requires integer-micros ts columns: $leftTs is " +
          s"${lt.simpleString}, $rightTs is ${rt.simpleString}")
    }
    val lCols = left.columns.toSeq
    val rCarry = right.columns.toSeq.filterNot(keys.contains)
    require(right.columns.contains(rightTs),
      s"right ts column $rightTs not found in right (${right.columns.mkString(", ")})")
    require(!keys.contains(rightTs), s"right ts column $rightTs must not be a key")
    val collisions = rCarry.filter(lCols.contains) ++
      rCarry.map(prefix + _).filter(lCols.contains) // chained-asof outputs
    require(collisions.isEmpty,
      s"right columns collide with left columns (raw or $prefix-prefixed): " +
        s"${collisions.distinct.mkString(", ")} — rename before joining")
    val reserved = Seq("__r", "__ts", "__left", "__rts")
    val reservedHits = (lCols ++ right.columns).filter(reserved.contains)
    require(reservedHits.isEmpty,
      s"reserved as-of working columns present in an input: " +
        s"${reservedHits.distinct.mkString(", ")} — rename before joining")
    // the fill struct carries the matched right ts as __rts so the
    // tolerance gate can compare it after the window fill (atomic with
    // the carried columns — a separate fill could mix rows)
    val rStructType = StructType(rCarry.map(c => right.schema(c)))
      .add("__rts", right.schema(rightTs).dataType)
    val lSchema = left.schema
    // A null right ts must never match (ASOF semantics): nulls-first
    // ascending would otherwise make it the running fill for early rows.
    // A null-KEY right row must never match either (SQL/pandas
    // merge_asof equi-key semantics — r12 self-review: the union's
    // window partitioning groups null keys together, so a null-key
    // LEFT row would otherwise be filled from a null-key RIGHT row;
    // left null-key rows stay, unfilled, per left-join semantics).
    val rightClean = right.filter(
      keys.map(col(_).isNotNull).foldLeft(col(rightTs).isNotNull)(_ && _))
    val leftSide = left.select(
      lCols.map(col) ++ Seq(
        lit(null).cast(rStructType).as("__r"),
        col(leftTs).as("__ts"), lit(1).as("__left")): _*)
    val rightSide = rightClean.select(
      lCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(lSchema(c).dataType).as(c)) ++ Seq(
        struct(rCarry.map(col) :+ col(rightTs).as("__rts"): _*).as("__r"),
        col(rightTs).as("__ts"), lit(0).as("__left")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftSide.unionByName(rightSide)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__left") === 1)
    val gated = toleranceUs match {
      // cast both operands to long: the require above admits
      // IntegerType ts columns, and int - int would wrap for wide
      // ranges before the comparison against the Long tol widened it
      case Some(tol) => filled.withColumn("__r",
        when(col("__ts").cast("long") - col("__r.__rts").cast("long") <= tol,
          col("__r")))
      case None => filled
    }
    gated.select(lCols.map(col) ++
      rCarry.map(c => col(s"__r.$c").as(prefix + c)): _*)
  }

  /** J6 — every event as-of joined to the user's most recent purchase
    * (at or before the event). DuckDB's native ASOF LEFT JOIN is the
    * oracle, so match rate, row identity (checksum), and lag sums are
    * cross-engine checked. All-integer micros arithmetic — exact hash.
    * The purchase side is deduped to one row per (user, ts) keeping
    * max event_id — the as-of uniqueness precondition, enforced here
    * rather than assumed (today's corpus has no such duplicates, but a
    * tie would otherwise make both engines pick arbitrary winners).
    */
  val j6 = QueryDef.sql(
    "j6_asof_join",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, max(event_id) AS rid, epoch_us(ts) AS rus
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |      GROUP BY user_id, epoch_us(ts))
      |SELECT count(*) AS n_events,
      |       CAST(sum(CASE WHEN rid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_matched,
      |       CAST(coalesce(sum(rid), 0) AS BIGINT) AS matched_checksum,
      |       CAST(coalesce(sum(us - rus), 0) AS BIGINT) AS total_lag_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.us >= r.rus""".stripMargin) {
    (s, d) =>
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
        .agg(max(col("event_id")).as("rid"))
        .select(col("user_id"), col("rid"), col("rus"))
      asofJoin(l, r, Seq("user_id"), "us", "rus")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("asof_rid").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_matched"),
          coalesce(sum(col("asof_rid")), lit(0L))
            .cast("long").as("matched_checksum"),
          coalesce(sum(col("us") - col("asof_rus")), lit(0L))
            .cast("long").as("total_lag_us"))
  }

  def all: Seq[QueryDef] = Seq(j6)
}
