package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-K with a BOUNDED aggregation buffer.
  *
  * The scale problem: "keep the K best rows per group" via
  * `row_number() OVER (PARTITION BY g ORDER BY ...)` serializes each
  * group through one window task — groups in a corpus (domains,
  * languages) are few and HUGE, so one hot domain becomes one hot task
  * (the same failure mode `Curation.withGroupedPrefixSum` exists to
  * avoid). This Aggregator instead rides Spark's two-phase hash
  * aggregation: every map task folds its rows into a ≤K-entry buffer
  * (partial aggregate), so the shuffle moves at most K rows per
  * (group, map task) and the final merge is a K-way list merge — no
  * task ever holds more than K entries per group, at ANY group size.
  *
  * Entries are (rank, id, payload) and "best" = smallest by
  * (rank, id) — with a content-independent hash rank this is the
  * deterministic unbiased sample the curation operators use (same
  * convention as [[graft.llm.Curation.sampleToTokenBudget]]).
  * Registered through `functions.udaf`, which wraps it in a
  * `ScalaAggregator` (a `TypedImperativeAggregate`): the buffer lives
  * as a JVM object inside hash aggregation and serializes only at the
  * shuffle boundary.
  */
final class TopKSmallest(k: Int)
    extends Aggregator[(String, Long, Long), List[(String, Long, Long)],
      Seq[(String, Long, Long)]] {
  require(k >= 1, s"top-K needs k >= 1: $k")

  private type T = (String, Long, Long)
  // (rank, id) total order; ids are unique so the payload never decides
  private val ord: Ordering[T] =
    Ordering.by[T, (String, Long)](t => (t._1, t._2))

  override def zero: List[T] = Nil

  /** Bounded insert: O(1) reject when the buffer is full and the new
    * row sorts after the current worst (the common case on sorted-ish
    * partitions); otherwise an O(K) in-place ordered insert.
    */
  override def reduce(b: List[T], a: T): List[T] =
    if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b
    else {
      val (lt, ge) = b.span(ord.lt(_, a))
      (lt ::: a :: ge).take(k)
    }

  override def merge(b1: List[T], b2: List[T]): List[T] = {
    // K-way merge of two already-sorted bounded lists
    val out = List.newBuilder[T]
    var (x, y, n) = (b1, b2, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(reduction: List[T]): Seq[T] = reduction

  override def bufferEncoder: Encoder[List[T]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder()
}

/** [[TopKSmallest]] with a DOUBLE rank — for score-ordered selections
  * (weighted-sampling keys, model scores) where the rank is numeric
  * rather than a hash string. Same bounded-buffer / two-phase-hash-agg
  * contract; NaN ranks are rejected at insert (a NaN would poison the
  * total order the merge relies on).
  */
final class TopKSmallestD(k: Int)
    extends Aggregator[(Double, Long, Long), List[(Double, Long, Long)],
      Seq[(Double, Long, Long)]] {
  require(k >= 1, s"top-K needs k >= 1: $k")

  private type T = (Double, Long, Long)
  // (rank, id) total order; ids are unique so the payload never decides
  private val ord: Ordering[T] =
    Ordering.by[T, (Double, Long)](t => (t._1, t._2))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

  override def zero: List[T] = Nil

  /** Bounded insert: O(1) reject when the buffer is full and the new
    * row sorts after the current worst (the common case on sorted-ish
    * partitions); otherwise an O(K) in-place ordered insert.
    */
  override def reduce(b: List[T], a: T): List[T] = {
    require(!a._1.isNaN, s"NaN rank for id ${a._2} — ranks must be total")
    if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b
    else {
      val (lt, ge) = b.span(ord.lt(_, a))
      (lt ::: a :: ge).take(k)
    }
  }

  override def merge(b1: List[T], b2: List[T]): List[T] = {
    // K-way merge of two already-sorted bounded lists
    val out = List.newBuilder[T]
    var (x, y, n) = (b1, b2, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(reduction: List[T]): Seq[T] = reduction

  override def bufferEncoder: Encoder[List[T]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder()
}
