package graft

import org.apache.spark.sql.functions._
import graft.ops.Centrality

/** PageRank over the near-dup graph: hand-checked toy graphs (driven
  * through a stubbed edge derivation via synthetic duplicate texts),
  * conservation/positivity invariants on the corpus, determinism.
  */
class CentralitySpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("rank mass is conserved and every rank positive") {
    import spark.implicits._
    val pr = Centrality.pageRank(docs).as[(Long, Double)].collect()
    assert(pr.length == docs.count())
    assert(pr.forall(_._2 > 0))
    // sum of ranks stays 1 under proper dangling redistribution
    assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-9, pr.map(_._2).sum.toString)
  }

  test("connected docs outrank isolated ones") {
    import spark.implicits._
    // three exact near-dup docs (identical text => jaccard 1.0 pairs,
    // a triangle) + many isolated docs
    val dup = "the quick brown fox jumps over the lazy sleeping dog today"
    val rows = Seq(1L, 2L, 3L).map(i => (i, dup)) ++
      (10L to 29L).map(i => (i, s"unique document number $i with its own words ${i * 7} ${i * 13} ${i * 17} extra"))
    val df = rows.toDF("doc_id", "text")
    val pr = Centrality.pageRank(df).as[(Long, Double)].collect().toMap
    val tri = Seq(1L, 2L, 3L).map(pr)
    val iso = (10L to 29L).map(pr)
    assert(tri.min > iso.max,
      s"triangle ${tri.min} should outrank isolated ${iso.max}")
    // triangle members are symmetric: identical ranks
    assert(tri.distinct.size == 1 || tri.max - tri.min < 1e-12)
  }

  test("hand computation: two-node graph with one dangling node") {
    import spark.implicits._
    // docs 1,2 identical (edge 1<->2), doc 3 isolated/dangling
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, dup), (2L, dup),
      (3L, "totally different words nothing shared here at all everything distinct")).toDF("doc_id", "text")
    val pr = Centrality.pageRank(df, iters = 1, d = 0.85)
      .as[(Long, Double)].collect().toMap
    // p0 = 1/3 each; dangling = 1/3 (doc 3); contrib(1)=contrib(2)=1/3
    // p1(1) = 0.15/3 + 0.85*(1/3 + (1/3)/3); p1(3) = 0.15/3 + 0.85*(1/3)/3
    val n = 3.0
    val expected1 = (1.0 - 0.85) / n + 0.85 * (1.0 / 3 + (1.0 / 3) / n)
    val expected3 = (1.0 - 0.85) / n + 0.85 * ((1.0 / 3) / n)
    assert(math.abs(pr(1L) - expected1) < 1e-12)
    assert(math.abs(pr(2L) - expected1) < 1e-12)
    assert(math.abs(pr(3L) - expected3) < 1e-12)
  }

  test("deterministic across partitionings (1e-12)") {
    import spark.implicits._
    def run(d: org.apache.spark.sql.DataFrame) =
      Centrality.pageRank(d).as[(Long, Double)].collect().sortBy(_._1).toSeq
    val a = run(docs)
    val b = run(docs.repartition(17))
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) < 1e-12) }
  }
}
