package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair graph — the
  * cluster-collapse step a production dedup pipeline runs AFTER pair
  * generation (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better", collapses MinHash pairs exactly this way):
  * pairs only say "A ~ B"; keeping one document per TRANSITIVE group
  * needs the component, not the pair. Pair-based drop ("remove the larger
  * id of each pair") keeps one doc per LOCAL minimum, so a chain
  * A~B, B~C with A !~ C retains both A and C's local minima — components
  * retain exactly one.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014) —
  * converges in O(log^2 n) rounds on any graph, each round two
  * map-side-combinable hash aggregations and two id-keyed joins. No
  * adjacency lists are ever materialized (`collect_list` would put a
  * whole component's neighborhood in one row — the 100 TB failure mode);
  * per-center minima come from `groupBy.min` and join back by center id,
  * so the widest row is one edge regardless of skew.
  *
  * Scale shape per round: shuffle keyed on node id (hash agg for the
  * per-center min, shuffle join to stamp it on edges) — never on the
  * pair, never all-pairs. Lineage is truncated every round with
  * `localCheckpoint` (a reliable `checkpoint` on a real cluster) so the
  * plan tree stays O(1) across the O(log^2 n) iterations.
  */
object ConnectedComponents {

  /** Assign `cluster_id` = the minimum node id of each connected
    * component. Returns (node, cluster_id) for every node incident to at
    * least one edge; callers left-join and coalesce for singletons.
    *
    * Edges are undirected; self-loops and duplicates are tolerated.
    */
  def assign(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 50): DataFrame = {
    // canonical undirected edge list: u < v, deduped, self-loops dropped
    var e = edges
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .dropDuplicates("u", "v")
      .localCheckpoint(true)

    // Fixpoint detection: an order-insensitive signature of the edge set
    // (count + XOR of per-edge hashes — XOR, not sum, so ANSI mode cannot
    // overflow). One tiny aggregate per round.
    def signature(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(e)
    var it = 0
    var converged = e.isEmpty
    while (!converged && it < maxIter) {
      val ss = smallStar(largeStar(e)).localCheckpoint(true)
      val next = signature(ss)
      converged = next == sig
      sig = next
      e = ss
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // At the fixpoint every edge is (component_min, member): the child side
    // appears exactly once, roots only on the u side.
    val members = e.select(col("v").as("node"), col("u").as("cluster_id"))
    val roots = e.select(col("u").as("node")).distinct()
      .withColumn("cluster_id", col("node"))
    members.unionByName(roots)
  }

  /** One large-star round over a canonical (u < v) edge list: for each
    * center c, m = min(neighborhood ∪ {c}); connect every LARGER neighbor
    * n > c to m (m <= c < n, so (m, n) is already canonical). Per-center
    * minima via hash agg + join back by center id — no adjacency lists.
    * Package-private so PlanAuditSpec pins the round's physical plan.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("c"), col("v").as("n"))
      .unionByName(e.select(col("v").as("c"), col("u").as("n")))
    val lsMin = sym.groupBy("c").agg(min("n").as("mn"))
      .select(col("c"), least(col("c"), col("mn")).as("m"))
    sym.filter(col("n") > col("c"))
      .join(lsMin, "c")
      .select(col("m").as("u"), col("n").as("v"))
      .dropDuplicates("u", "v")
  }

  /** One small-star round: for each center c, over its SMALLER neighbors N
    * (in canonical form: exactly the rows where c is the `v` side),
    * m = min(N); connect every n ∈ N ∪ {c}, n != m, to m.
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val smaller = e.select(col("v").as("c"), col("u").as("n"))
    val ssMin = smaller.groupBy("c").agg(min("n").as("m"))
    smaller.join(ssMin, "c")
      .select(col("m").as("u"), col("n").as("v"))
      .filter(col("u") =!= col("v"))
      .unionByName(ssMin.select(col("m").as("u"), col("c").as("v")))
      .dropDuplicates("u", "v")
  }

  /** Document-level near-dup clustering: n-gram Jaccard pairs → connected
    * components → `cluster_id` (component-minimum doc_id) and
    * `keep` = "this doc is its cluster's canonical representative". Every
    * input doc appears (singletons are their own cluster).
    */
  def dedupClusters(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 1000, textCol: String = "text"): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, n, threshold, maxDf, textCol)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val asg = assign(pairs).withColumnRenamed("node", "doc_id")
    docs.select("doc_id")
      .join(asg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("doc_id"))
  }
}
