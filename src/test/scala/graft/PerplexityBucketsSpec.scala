package graft

import org.apache.spark.sql.functions._
import graft.ops.PerplexityBuckets

class PerplexityBucketsSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hand computation: terciles of 1..6 split 2/2/2") {
    import spark.implicits._
    val scored = (1 to 6).map(i => (i.toLong, i.toDouble))
      .toDF("doc_id", "mean_logp")
    val out = PerplexityBuckets.assign(scored)
      .as[(Long, String)].collect().toMap
    // t13 = 2.667, t23 = 4.333 (pos = p*(n-1) interpolation)
    assert(out(6L) == "head" && out(5L) == "head")
    assert(out(4L) == "middle" && out(3L) == "middle")
    assert(out(2L) == "tail" && out(1L) == "tail")
  }

  test("corpus buckets are near-equal thirds and exhaustive") {
    val out = PerplexityBuckets.buckets(spark, docs).cache()
    val n = docs.count()
    assert(out.count() == n)
    val counts = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("head", "middle", "tail"))
    counts.values.foreach(c =>
      assert(math.abs(c - n / 3.0) <= n * 0.05 + 2, counts.toString))
    out.unpersist()
  }

  test("approx thresholds agree with exact away from the boundaries") {
    import spark.implicits._
    val exact = PerplexityBuckets.buckets(spark, docs, exact = true)
      .as[(Long, String)].collect().toMap
    val approx = PerplexityBuckets.buckets(spark, docs, exact = false)
      .as[(Long, String)].collect().toMap
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree >= exact.size * 0.9, s"$agree / ${exact.size}")
  }

  test("deterministic across partitionings") {
    import spark.implicits._
    def run(d: org.apache.spark.sql.DataFrame) =
      PerplexityBuckets.buckets(spark, d)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(17)))
  }
}
