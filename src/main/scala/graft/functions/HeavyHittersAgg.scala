package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One surviving counter of the Misra-Gries summary. Top-level so the
  * Catalyst encoder codegen can instantiate it (nested case classes fall
  * back to interpreted encoders).
  */
final case class WordCount(word: String, count: Long)

/** Mergeable Misra-Gries heavy-hitters sketch as a typed `Aggregator`
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS 2012). Spark ships HLL for distinct counts and GK for
  * quantiles but nothing for frequent items — the third classic mergeable
  * summary a 100 TB profile pass needs (top tokens, top URLs, top tools)
  * without a full groupBy of every distinct key.
  *
  * Guarantees with capacity c over n items: every surviving counter
  * satisfies true - n/(c+1) <= est <= true, and ANY item with true count
  * > n/(c+1) is guaranteed to survive. When every partial buffer stays
  * under c distinct keys, no decrement ever fires and counts are EXACT —
  * the regime the DuckDB oracle checks; the error regime is spec-tested
  * with planted skew.
  *
  * Scale shape: plans as partial+final ObjectHashAggregate — each task
  * reduces its stream to <= c counters before the exchange, the merge
  * adds counters then strips to the c largest with the (c+1)-th count
  * subtracted (the mergeable-summaries rule). State is O(c) regardless of
  * stream length or distinct-key cardinality.
  */
final case class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[WordCount]] {
  require(capacity > 0, s"capacity must be positive: $capacity")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < capacity => b.updated(w, 1L)
      case None =>
        // classic MG step: a full summary + an unseen key decrements
        // every counter (the new key's single observation cancels too)
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  /** Mergeable-summaries rule: add counters pointwise; if over capacity,
    * subtract the (capacity+1)-th largest count from all and drop the
    * non-positive remainder. Deterministic under a (count, word) total
    * order so partial-merge order cannot change the survivor set.
    */
  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.valuesIterator.toArray.sortInPlace()(
        Ordering[Long].reverse).apply(capacity)
      sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  def finish(b: Map[String, Long]): Seq[WordCount] =
    b.toSeq.map { case (w, c) => WordCount(w, c) }
      .sortBy(wc => (-wc.count, wc.word))

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[WordCount]] = ExpressionEncoder()
}
