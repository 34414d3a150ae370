package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * split the corpus into head / middle / tail terciles of the language-
  * model score — the canonical "keep the fluent third, down-weight the
  * rest" curation move. Scores come from the corpus-trained trigram model
  * ([[LangModel.lmScore]], already oracled); this operator adds the
  * corpus-quantile thresholding.
  *
  * Scale shape: scoring is narrow (broadcast model); the thresholds are a
  * single 2-value aggregate broadcast back (a 1-row cross join — Catalyst
  * plans BroadcastNestedLoopJoin over one row, constant cost); assignment
  * is a codegen projection. `exact = true` uses Spark's exact
  * `percentile` — a single-group sort whose state is the score column,
  * right for oracle-grade determinism up to memory-bounded corpus sizes;
  * at 100 TB set `exact = false` for `percentile_approx` (a fixed-size
  * KLL-ish sketch, map-side combined), which moves only the handful of
  * boundary documents whose scores sit within the sketch's rank error.
  */
object PerplexityBuckets {

  def buckets(spark: SparkSession, docs: DataFrame,
      exact: Boolean = true): DataFrame =
    assign(LangModel.lmScore(spark, docs).select("doc_id", "mean_logp"), exact)

  /** Threshold + assign over any (doc_id, mean_logp) frame — split from
    * [[buckets]] so tests can drive hand-built scores.
    */
  def assign(scored: DataFrame, exact: Boolean = true): DataFrame = {
    val s = col("mean_logp")
    val th =
      if (exact) scored.agg(
        percentile(s, lit(1.0 / 3)).as("t13"),
        percentile(s, lit(2.0 / 3)).as("t23"))
      else scored.agg(
        percentile_approx(s, lit(1.0 / 3), lit(10000)).as("t13"),
        percentile_approx(s, lit(2.0 / 3), lit(10000)).as("t23"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"),
        when(s >= col("t23"), "head")
          .when(s >= col("t13"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
