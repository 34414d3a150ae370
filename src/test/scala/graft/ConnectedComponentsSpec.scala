package graft

import org.apache.spark.sql.functions._
import graft.ops.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference (path compression, union by id). */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-id canonical labels
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOf = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.map(n => n -> minOf(find(n))).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.assign(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, star, cycle, singleton-free mixed graph") {
    // chain 1-2-3-4, star 10-{11,12,13}, cycle 20-21-22-20, isolated edge 30-31
    val edges = Seq[(Long, Long)](
      (2, 1), (2, 3), (4, 3),
      (10, 11), (10, 12), (13, 10),
      (20, 21), (21, 22), (22, 20),
      (31, 30))
    assert(run(edges) === ufComponents(edges))
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val edges = Seq[(Long, Long)]((5, 5), (1, 2), (2, 1), (1, 2), (7, 7))
    val got = run(edges)
    assert(got(1L) === 1L && got(2L) === 1L)
    // self-loop-only nodes are not incident to any real edge → absent
    // (dedupClusters restores them as singletons via its left join)
    assert(!got.contains(5L) && !got.contains(7L))
  }

  test("property: agrees with union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 30 + rnd.nextInt(120)
      val m = n / 2 + rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) === ufComponents(edges), s"trial $trial n=$n m=$m")
    }
  }

  test("transitive chain: CC keeps one doc where pair-drop keeps two") {
    // A=1 ~ B=3 and B=3 ~ C=2, A !~ C. Pair-drop (drop larger of each
    // pair) would drop only 3, keeping BOTH 1 and 2; the component is
    // {1,2,3} and CC keeps exactly min=1.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon omega psi chi phi kappa"),
      (2L, "omega psi chi phi kappa lambda mu nu xi"),
      (50L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = ConnectedComponents.dedupClusters(docs, n = 3, threshold = 0.2)
      .as[(Long, Long, Boolean)].collect().map(keyed).toMap
    assert(out === Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      50L -> ((50L, true))))
  }

  private def keyed(t: (Long, Long, Boolean)): (Long, (Long, Boolean)) =
    t._1 -> ((t._2, t._3))

  test("empty pair set: every doc is its own singleton cluster") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh")).toDF("doc_id", "text")
    val out = ConnectedComponents.dedupClusters(docs, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().map(keyed).toMap
    assert(out === Map(1L -> ((1L, true)), 2L -> ((2L, true))))
  }
}
