package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact linear-interpolation quantile as a typed `Aggregator` — the
  * user-defined AGGREGATE surface (UDAF) of SURVEY.md §2.4: registrable for
  * SQL via `spark.udf.register("exact_quantile", functions.udaf(...))` and
  * usable as a `Column` in `groupBy(...).agg(...)`.
  *
  * Semantics match SQL-standard `quantile_cont` / `percentile_cont`
  * exactly (the DuckDB oracle formulation): at position `pos = q*(n-1)`
  * over the sorted values, the result is
  * `(ceil(pos)-pos)*v[floor(pos)] + (pos-floor(pos))*v[ceil(pos)]` — the
  * identical double expression, so oracle doubles are bit-comparable.
  *
  * Execution shape: a typed imperative aggregate, so Spark plans it as
  * ObjectHashAggregate with a PARTIAL stage before the exchange and a
  * FINAL stage after — map-side combining like any built-in (pinned by
  * UdafSpec). The buffer holds the group's raw values: exact quantiles are
  * not mergeable from constant-size state, so this is for bounded groups
  * (per-conversation metrics — tens of values each at any corpus scale);
  * unbounded groups want approx_percentile's sketch instead.
  */
final case class ExactQuantile(q: Double)
    extends Aggregator[Long, ArrayBuffer[Long], Double] {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")

  def zero: ArrayBuffer[Long] = ArrayBuffer.empty[Long]

  def reduce(b: ArrayBuffer[Long], a: Long): ArrayBuffer[Long] = { b += a; b }

  def merge(x: ArrayBuffer[Long], y: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    x ++= y; x
  }

  def finish(b: ArrayBuffer[Long]): Double =
    if (b.isEmpty) Double.NaN
    else {
      val s = b.toArray
      java.util.Arrays.sort(s)
      val pos = q * (s.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) s(lo).toDouble
      else (hi - pos) * s(lo) + (pos - lo) * s(hi)
    }

  def bufferEncoder: Encoder[ArrayBuffer[Long]] = ExpressionEncoder()

  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
