package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over the document near-duplicate graph — the quality
  * signal family web-corpus pipelines compute on the link graph (Common
  * Crawl ships PageRank/harmonic centrality per host; quality filters
  * consume them as features). The corpus here has no hyperlinks, so the
  * edge set is the engine's own exact-Jaccard near-dup pairs — centrality
  * then measures how embedded a document is in a boilerplate/duplication
  * neighborhood, a usable down-weighting signal in its own right.
  *
  * Algorithm: power iteration with damping d and proper dangling-mass
  * redistribution — PR_{t+1}(v) = (1-d)/N + d*(sum_{u->v} PR_t(u)/deg(u)
  * + dangling_t/N). A fixed iteration count keeps the whole chain
  * SQL-re-derivable (the `page_rank` oracle unrolls the same three
  * iterations, like the quality classifier's GD unroll).
  *
  * Scale shape — the canonical distributed PageRank: per iteration ONE
  * edges⋈ranks hash join + a destination-keyed map-side-combined sum,
  * plus a single 1-row aggregate for the dangling mass (the only driver
  * materialization, one double per iteration). Edge/degree frames are
  * computed once and cached; lineage does not grow because each
  * iteration's rank frame is rebuilt from `nodes` + the fresh
  * contribution join.
  */
object Centrality {

  def pageRank(docs: DataFrame, iters: Int = 3, d: Double = 0.85,
      jaccard: Double = 0.3): DataFrame = {
    // Materialization boundaries are eager localCheckpoints, not cache():
    // the dangling aggregate is an action and the contribution join reads
    // pr again, so without a boundary every iteration would re-execute all
    // previous ones (the curate2 lesson) — but a .cache() on the RETURNED
    // frame is a CacheManager entry the caller can never release (the
    // round-5 advisor flagged it as a per-invocation leak); checkpoint
    // blocks are freed by GC once the frame is dropped.
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = jaccard)
      .select("doc_a", "doc_b")
      .localCheckpoint()
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val nodes = docs.select("doc_id").localCheckpoint()
    val n = nodes.count()
    val deg = edges.groupBy(col("doc_a").as("src"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    var pr = nodes.select(col("doc_id"), lit(1.0 / n).as("pr")).localCheckpoint()
    for (_ <- 1 to iters) {
      val withDeg = pr.join(deg, pr("doc_id") === deg("src"), "left")
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum("pr"), lit(0.0))).head().getDouble(0)
      val contrib = edges
        .join(withDeg.filter(col("deg").isNotNull)
          .select(col("src"), (col("pr") / col("deg")).as("share")),
          edges("doc_a") === col("src"))
        .groupBy(col("doc_b").as("dst")).agg(sum("share").as("c"))
      pr = nodes.join(contrib, nodes("doc_id") === contrib("dst"), "left")
        .select(col("doc_id"),
          (lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("c"), lit(0.0)) + lit(dangling / n)))
            .as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
