package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. Top-level (not nested) so the Catalyst encoder
  * codegen can instantiate it — nested case classes force an interpreted
  * fallback.
  */
final case class ScoredId(cos: Double, vec_id: Long)

/** Bounded per-group top-k as a typed `Aggregator`: the buffer never holds
  * more than `k` entries, kept sorted best-first (cos DESC, vec_id ASC on
  * ties — the same total order as `row_number` over (cos DESC, vec_id
  * ASC), so results are identical to the window formulation).
  *
  * Why this exists (the 100 TB shape): ranking top-k with a window
  * function shuffles EVERY scored candidate row to its query's partition
  * and fully sorts it, when only k survivors per query are needed. As a
  * typed aggregate Spark plans ObjectHashAggregate with a PARTIAL stage
  * before the exchange — each task reduces its candidates to <= k rows
  * per query locally, so the exchange carries at most tasks x Q x k rows
  * and the final stage merges k-bounded buffers. No sort of the candidate
  * set ever happens (plan-pinned in PlanAuditSpec).
  */
final case class TopKByScore(k: Int)
    extends Aggregator[ScoredId, ArrayBuffer[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive: $k")

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)

  def zero: ArrayBuffer[ScoredId] = ArrayBuffer.empty[ScoredId]

  /** Insert keeping the buffer sorted best-first, dropping past k. Linear
    * from the tail: a random candidate usually loses to the current k-th
    * best, so the common case is one comparison and no movement.
    */
  def reduce(b: ArrayBuffer[ScoredId], x: ScoredId): ArrayBuffer[ScoredId] = {
    if (b.length >= k) {
      if (!better(x, b.last)) return b
      b.remove(b.length - 1)
    }
    var i = b.length
    while (i > 0 && better(x, b(i - 1))) i -= 1
    b.insert(i, x)
    b
  }

  def merge(x: ArrayBuffer[ScoredId], y: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] = {
    var i = 0
    var acc = x
    while (i < y.length) { acc = reduce(acc, y(i)); i += 1 }
    acc
  }

  def finish(b: ArrayBuffer[ScoredId]): Seq[ScoredId] = b.toSeq

  def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

/** One per-domain quota candidate: deterministic hash order key + id. */
final case class KeyedId(sort_key: String, doc_id: Long)

/** Bounded per-group min-k by (sort_key ASC, doc_id ASC) — the same
  * bounded-heap discipline as [[TopKByScore]] but ordered ascending over a
  * string key: the "at most N documents per domain, chosen by hash order"
  * quota of RefinedWeb-style curation. Identical total order to
  * `row_number() OVER (PARTITION BY domain ORDER BY sort_key, doc_id)`,
  * so results match the window formulation row-for-row while the exchange
  * carries <= tasks x domains x k rows — a hot domain never concentrates
  * its candidate set on one task the way a window sort does.
  */
final case class MinKByKey(k: Int)
    extends Aggregator[KeyedId, ArrayBuffer[KeyedId], Seq[KeyedId]] {
  require(k > 0, s"k must be positive: $k")

  private def better(a: KeyedId, b: KeyedId): Boolean = {
    val c = a.sort_key.compareTo(b.sort_key)
    c < 0 || (c == 0 && a.doc_id < b.doc_id)
  }

  def zero: ArrayBuffer[KeyedId] = ArrayBuffer.empty[KeyedId]

  def reduce(b: ArrayBuffer[KeyedId], x: KeyedId): ArrayBuffer[KeyedId] = {
    if (b.length >= k) {
      if (!better(x, b.last)) return b
      b.remove(b.length - 1)
    }
    var i = b.length
    while (i > 0 && better(x, b(i - 1))) i -= 1
    b.insert(i, x)
    b
  }

  def merge(x: ArrayBuffer[KeyedId], y: ArrayBuffer[KeyedId]): ArrayBuffer[KeyedId] = {
    var i = 0
    var acc = x
    while (i < y.length) { acc = reduce(acc, y(i)); i += 1 }
    acc
  }

  def finish(b: ArrayBuffer[KeyedId]): Seq[KeyedId] = b.toSeq

  def bufferEncoder: Encoder[ArrayBuffer[KeyedId]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[KeyedId]] = ExpressionEncoder()
}
