package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators.
  *
  * A training pipeline needs holdout splits that are (a) stable across
  * runs, engines, and cluster sizes, (b) a pure per-row function (no
  * global sort, no RNG state, no shuffle), and (c) re-derivable by any
  * other system that can hash. Hash-bucket splitting gives all three:
  * bucket = first byte of md5(id-as-string), split by bucket range. The
  * reference has no sampling surface; this is north-rule breadth
  * (training-data ops).
  */
object Sampling {

  /** Assign every row a 256-way md5 bucket ("00".."ff") and a
    * train/val split: buckets below `valBucketMax` (hex-string compare)
    * are validation. `valBucketMax = "0d"` ≈ 13/256 ≈ 5.1% holdout.
    *
    * Scale shape: a single codegen'd projection — zero shuffle, zero
    * state; adding executors divides wall time until the scan is
    * I/O-bound. The md5-of-decimal-string form is chosen over
    * xxhash64 so any SQL engine (the DuckDB oracle included)
    * reproduces the assignment bit-for-bit.
    */
  def hashSplit(docs: DataFrame, valBucketMax: String = "0d",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
        col(idCol),
        substring(md5(col(idCol).cast("string")), 1, 2).as("bucket"))
      .withColumn("split",
        when(col("bucket") < lit(valBucketMax), "val").otherwise("train"))

  /** Per-split counts — the summary a pipeline logs to prove the split
    * fraction landed where expected.
    */
  def splitStats(docs: DataFrame, valBucketMax: String = "0d",
      idCol: String = "doc_id"): DataFrame =
    hashSplit(docs, valBucketMax, idCol)
      .groupBy("split").agg(count(lit(1)).as("n"))

  /** EXACT stratified sample: ceil(frac * |stratum|) rows per stratum,
    * chosen deterministically by md5(id) order (id tiebreak) — the
    * "balanced subset across languages/sources" operator a curation
    * pipeline uses when [[hashSplit]]'s per-row threshold (exact-fraction
    * only in expectation) isn't enough.
    *
    * Scale shape: one hash agg for stratum sizes (broadcast back — strata
    * are few) + a rank per stratum. The rank is a window, i.e. a shuffle
    * on the stratum key and a per-stratum sort: that sort is the price of
    * EXACT counts under a deterministic order, and it parallelizes across
    * strata. A heavily skewed stratum sorts on one... no — Spark range-
    * partitions within window partitions only by key, so the largest
    * stratum bounds a single task: for corpora with few huge strata
    * prefer [[hashSplit]], which is exact-in-expectation and narrow.
    */
  /** Per-domain quota (RefinedWeb-style): keep at most `cap` documents
    * per domain, chosen deterministically by md5(id) order (id tiebreak)
    * — the anti-concentration cap that stops one boilerplate-heavy site
    * from dominating a web corpus.
    *
    * Scale shape: the bounded-heap `MinKByKey` aggregate, NOT a window —
    * each task reduces its rows to <= cap per domain before the exchange
    * (partial ObjectHashAggregate), so the shuffle carries at most
    * tasks x domains x cap rows and a hot domain parallelizes across
    * tasks instead of sorting on one. Emitted `rk` (1-based hash-order
    * rank) is row-identical to the `row_number` window formulation.
    */
  def domainQuota(docs: DataFrame, cap: Int = 10,
      domainCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val mk = org.apache.spark.sql.functions.udaf(graft.functions.MinKByKey(cap))
    docs.select(col(domainCol).as("domain"),
        md5(col(idCol).cast("string")).as("sort_key"),
        col(idCol).cast("long").as("doc_id"))
      .groupBy("domain")
      .agg(mk(col("sort_key"), col("doc_id")).as("kept"))
      .select(col("domain"), posexplode(col("kept")).as(Seq("pos", "t")))
      .select(col("domain"), col("t.doc_id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  def stratifiedSample(docs: DataFrame, strataCol: String = "lang",
      frac: Double = 0.2, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("n_stratum"))
    docs.select(col(idCol), col(strataCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(strataCol))
      .withColumn("n_take", ceil(col("n_stratum") * lit(frac)))
      .filter(col("rk") <= col("n_take"))
      .select(col(idCol), col(strataCol), col("rk"), col("n_take"))
  }
}
