package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a holdout/evaluation set (the GPT-3 appendix-C /
  * fineweb-style 13-gram check; n is a parameter and the tests run the
  * common 8). The reference has no such surface — this is north-rule
  * breadth for LLM training pipelines: a train split contaminated with
  * eval text inflates benchmark scores, so the pipeline must measure and
  * drop overlap before training.
  *
  * Scale shape: both sides reduce to distinct word-n-gram sets (narrow
  * shingle projection, then hash aggregates); the only joins are keyed on
  * the gram string — an exchange-bound shuffle hash join, never all-pairs.
  * No df-prune here ON PURPOSE: unlike near-dup candidate generation,
  * common grams are exactly what contamination is made of, so dropping
  * high-df grams would undercount. The holdout side is typically orders
  * of magnitude smaller than train (an eval suite vs a corpus), so
  * Spark's runtime Bloom-filter injection prunes the train-side explode
  * before the exchange (the repo pins that machinery in PlanAuditSpec).
  */
object Decontam {

  /** Per-train-doc contamination counts against `holdout`.
    *
    * Output: (doc_id, n_grams — distinct n-grams in the doc,
    * n_contaminated — of those, how many appear anywhere in the holdout,
    * contaminated — n_contaminated > 0). Docs with fewer than n words
    * have zero grams and are reported uncontaminated (nothing to leak).
    */
  def overlap(train: DataFrame, holdout: DataFrame, n: Int = 8,
      textCol: String = "text"): DataFrame = {
    val tg = train.select(col("doc_id"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
    val hg = holdout.select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .distinct()
    val sizes = tg.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val shared = tg.join(hg, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    train.select("doc_id")
      .join(sizes, Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Composition with [[Sampling.hashSplit]]: treat the corpus's own
    * deterministic 'val' bucket as the holdout and scan the 'train'
    * bucket for leakage — the self-contained form the oracle checks
    * (real pipelines pass an external eval suite as `holdout`).
    */
  def splitAndOverlap(docs: DataFrame, n: Int = 8,
      valBucketMax: String = "0d", textCol: String = "text"): DataFrame = {
    // the split is a PURE per-row function of doc_id (md5 bucket) — derive
    // it as a narrow column instead of joining hashSplit back on doc_id:
    // the join doubled every corpus scan downstream (each branch of
    // overlap re-read docs twice through the join) for a value the row
    // already determines. Same split rule as Sampling.hashSplit.
    val withSplit = docs.withColumn("split",
      Sampling.splitCol(col("doc_id"), valBucketMax))
    overlap(
      withSplit.filter(col("split") === "train"),
      withSplit.filter(col("split") === "val"),
      n, textCol)
  }
}
