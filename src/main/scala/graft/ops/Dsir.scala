package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by
  * how much more likely its hashed-word features are under a target
  * distribution than under the raw-corpus distribution — the principled
  * "pick web documents that look like the high-quality target" selector.
  * The target here is the corpus's own `lang = 'en'` slice (an in-corpus
  * proxy; any target DataFrame plugs in).
  *
  * Model: bag-of-hashed-unigrams over `m` buckets, Laplace-smoothed;
  * per-doc log importance weight = sum over words of
  * ln(p_target(bucket(w))) - ln(p_source(bucket(w))).
  *
  * Scale shape: ONE distributed pass builds both count vectors (explode +
  * hash agg with a conditional target counter — m <= 128 result rows), the
  * m-bucket log-ratio table collapses to a literal array, and scoring is a
  * narrow codegen fold per document (zero Exchange, plan-pinned). The
  * bucket hash is the engine's polynomial char hash, so the DuckDB oracle
  * re-derives the ENTIRE train+score chain; the float log-weight column
  * uses the 1e-8 pass-through verify (ln ULPs differ across engines).
  */
object Dsir {

  val NumBuckets = 128

  private def words(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Hashed feature bucket of one word: charFp mod m. */
  def bucket(w: Column): Column =
    pmod(TextMetrics.charFp(w), lit(NumBuckets.toLong))

  /** The m-entry log-ratio table ln(p_T(b)) - ln(p_S(b)), Laplace(+1)
    * smoothed. One distributed pass; the result is m doubles on the
    * driver (a bounded collect, like the NB model).
    */
  def trainLogRatios(docs: DataFrame, textCol: String = "text",
      targetCol: String = "lang", targetValue: String = "en"): Array[Double] = {
    val counts = docs
      .select(col(targetCol), explode(transform(words(col(textCol)), w => bucket(w)))
        .as("b"))
      .groupBy("b").agg(
        count(lit(1)).as("cs"),
        count(when(col(targetCol) === targetValue, 1)).as("ct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sTot = counts.values.map(_._1).sum.toDouble
    val tTot = counts.values.map(_._2).sum.toDouble
    Array.tabulate(NumBuckets) { b =>
      val (cs, ct) = counts.getOrElse(b.toLong, (0L, 0L))
      math.log((ct + 1.0) / (tTot + NumBuckets)) -
        math.log((cs + 1.0) / (sTot + NumBuckets))
    }
  }

  /** Narrow scoring over the literal log-ratio table. */
  def score(docs: DataFrame, logRatios: Array[Double],
      textCol: String = "text"): DataFrame = {
    val lr = typedLit(logRatios.toSeq)
    val ws = words(col(textCol))
    docs.select(col("doc_id"),
      size(ws).cast("long").as("n_words"),
      aggregate(
        transform(ws, w => element_at(lr, (bucket(w) + 1).cast("int"))),
        lit(0.0),
        (acc, x) => acc + x).as("log_weight"))
  }

  /** Train + score in one call (the `dsir_weights` query). */
  def weights(docs: DataFrame): DataFrame =
    score(docs, trainLogRatios(docs))
}
