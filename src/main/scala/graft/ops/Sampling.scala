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
}
