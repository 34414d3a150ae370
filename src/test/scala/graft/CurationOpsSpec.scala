package graft

import org.apache.spark.sql.functions._
import graft.ops.{Decontam, Pii, Similarity}

/** Round-5 additions: benchmark decontamination, PII scan/redaction,
  * SemDeDup cluster-then-cosine semantic dedup.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------------- decontam

  test("decontam: full copy of a holdout doc leaks every gram") {
    val hold = Seq((1L, "a b c d e f g h i j k l m")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "a b c d e f g h i j k l m"), // full copy: all grams leak
      (11L, "z y x w v u t s r q p o"), // disjoint: zero leak
      (12L, "short text")) // < 8 words: no grams at all
      .toDF("doc_id", "text")
    val out = Decontam.overlap(train, hold, n = 8)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((6L, 6L, true))) // 13 words -> 6 distinct 8-grams
    assert(out(11L) == ((5L, 0L, false)))
    assert(out(12L) == ((0L, 0L, false)))
  }

  test("decontam: partial overlap counts exactly the shared grams") {
    // train doc = 12-word prefix of the holdout doc -> 5 8-grams, all leaked
    val hold = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"))
      .toDF("doc_id", "text")
    val train = Seq((20L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
      .toDF("doc_id", "text")
    val Array((id, n, c, f)) = Decontam.overlap(train, hold, n = 8)
      .as[(Long, Long, Long, Boolean)].collect()
    assert((id, n, c, f) == ((20L, 5L, 5L, true)))
  }

  test("decontam splitAndOverlap: doc 27 is a val doc at every scale, so its planted copy is contaminated") {
    // md5("27") starts '0c' < '0d' -> val; the split is a pure function
    // of doc_id, which is what makes this assertion scale-independent
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val planted = docs.unionByName(
      docs.filter($"doc_id" === 27)
        .select(($"doc_id" + 400000).as("doc_id"), $"text"))
    val out = Decontam.splitAndOverlap(planted, n = 8)
    val copy = out.filter($"doc_id" === 400027)
      .as[(Long, Long, Long, Boolean)].head()
    assert(copy._2 > 0 && copy._2 == copy._3 && copy._4,
      s"full copy of a val doc must leak all grams: $copy")
    // and doc 27 itself is holdout, so it must NOT appear in the output
    assert(out.filter($"doc_id" === 27).isEmpty)
  }

  test("decontam overlap is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(60)
    val hold = docs.filter($"doc_id" % 5 === 0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val a = Decontam.overlap(train.repartition(1), hold.repartition(1), n = 3)
      .collect().toSet
    val b = Decontam.overlap(train.repartition(13, $"text"),
      hold.repartition(7), n = 3).collect().toSet
    assert(a == b)
  }

  // -------------------------------------------------------------- line dedup

  test("lineDedup: a repeated line survives only at its smallest (doc_id, pos)") {
    val docs = Seq(
      (1L, "alpha\nboiler\nbeta"),
      (2L, "boiler\ngamma"),
      (3L, "boiler\nboiler\ndelta"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.lineDedup(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 3L, "alpha\nboiler\nbeta")))
    assert(out(2L) == ((2L, 1L, "gamma")))
    assert(out(3L) == ((3L, 1L, "delta")))
  }

  test("lineDedup: within-doc repeats collapse; all-boilerplate docs go empty") {
    val docs = Seq(
      (1L, "x\nx\ny"), // within-doc repeat: keep pos 0 only
      (2L, "x\ny")) // everything already seen in doc 1
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.lineDedup(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 2L, "x\ny")))
    assert(out(2L) == ((2L, 0L, "")))
  }

  test("lineDedup is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id",
        concat($"text", lit("\nshared boilerplate line")).as("text"))
    val a = graft.ops.Dedup.lineDedup(docs.repartition(1)).collect().toSet
    val b = graft.ops.Dedup.lineDedup(docs.repartition(11, $"text")).collect().toSet
    assert(a == b)
    // exactly one doc (the smallest) keeps the boilerplate
    assert(a.count(_.getLong(2) == 2L) == 1)
  }

  // ---------------------------------------------------------------- PII scan

  test("pii: lanes count and redact hand-built text") {
    val docs = Seq(
      (1L, "mail a.b@x.co and c@d.org call 0412345678 ip 10.0.0.1 card 4242424242424242"),
      (2L, "no pii here at all"),
      (3L, "bad card 4242424242424243 still redacted")) // Luhn-invalid
      .toDF("doc_id", "text")
    val out = Pii.scan(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5)))).toMap
    assert(out(1L) == ((2L, 1L, 1L, 1L,
      "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP> card <CARD>")))
    assert(out(2L) == ((0L, 0L, 0L, 0L, "no pii here at all")))
    // invalid Luhn: n_cards stays 0, the digit run is still redacted
    assert(out(3L) == ((0L, 0L, 0L, 0L, "bad card <CARD> still redacted")))
  }

  test("pii: card lane respects 13-19 digit bounds and word boundaries") {
    val docs = Seq(
      (1L, "run 123456789012 is too short"), // 12 digits: not a candidate
      (2L, "run 12345678901234567890 is too long"), // 20 digits: not a candidate
      (3L, "glued4242424242424242 has no boundary"))
      .toDF("doc_id", "text")
    val out = Pii.scan(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getString(5)))).toMap
    assert(out(1L)._1 == 0L && out(1L)._2.contains("123456789012"))
    assert(out(2L)._1 == 0L && out(2L)._2.contains("12345678901234567890"))
    assert(out(3L)._1 == 0L && out(3L)._2.contains("glued4242424242424242"))
  }

  test("pii scan is a narrow zero-exchange projection") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s = Pii.scan(docs).queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s.take(1200))
  }

  // -------------------------------------------------------------- tf-idf

  test("tfidfTop: hand-computed scores, rank order, ties broken by word") {
    // N=3; df: a→3 (idf 0), b→2, c→1, d→1
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b"),
      (3L, "a d d"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextMetrics.tfidfTop(docs, k = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._6)).toList).toMap
    val ln32 = math.log(3.0 / 2)
    val ln3 = math.log(3.0)
    // score compare at 1e-12: Spark's log codegen goes through
    // StrictMath.log, one ULP off java.lang.Math.log for some inputs
    def close(got: List[(String, Double)], want: List[(String, Double)]): Unit = {
      assert(got.map(_._1) == want.map(_._1), s"$got vs $want")
      got.zip(want).foreach { case ((_, g), (_, w)) =>
        assert(math.abs(g - w) < 1e-12, s"$got vs $want") }
    }
    // doc1: c=1*ln3 (0.477) > b=1*ln(3/2) (0.405) > a=0
    close(out(1L), List(("c", ln3), ("b", ln32)))
    // doc2: b=ln(3/2) > a=0
    close(out(2L), List(("b", ln32), ("a", 0.0)))
    // doc3: d=2*ln3 > a=0
    close(out(3L), List(("d", 2 * ln3), ("a", 0.0)))
  }

  test("tfidfTop is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = graft.ops.TextMetrics.tfidfTop(docs.repartition(1), k = 3).collect().toSet
    val b = graft.ops.TextMetrics.tfidfTop(docs.repartition(9, $"text"), k = 3)
      .collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  // ---------------------------------------------------------- semantic dedup

  test("semanticDedup: planted twins pair at cos 1.0 and the later twin drops") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = emb.select("vec_id", "embedding").unionByName(
      emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 500000).as("vec_id"), $"embedding"))
    val pairs = Similarity.semanticDedupPairs(planted, nlist = 4,
      kmeansIters = 1, threshold = 0.95)
      .as[(Long, Long, Double)].collect()
    val got = pairs.map(p => (p._1, p._2)).toSet
    (0L until 5L).foreach(id =>
      assert(got.contains((id, id + 500000)), s"twin pair $id missing"))
    assert(pairs.forall(_._3 >= 0.95))
    val keep = Similarity.semanticDedup(planted, nlist = 4,
      kmeansIters = 1, threshold = 0.95)
      .as[(Long, Boolean)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(keep(id), s"original $id must keep")
      assert(!keep(id + 500000), s"twin of $id must drop")
    }
    // untouched vectors all keep (fixture corpus has no natural 0.95 pairs)
    assert(keep.count(!_._2) == 5)
  }

  test("semanticDedup: maxCluster guard suppresses degenerate clusters") {
    // 40 identical vectors: one cluster of 40 > cap 10 -> no pairs at all
    val same = (0 until 40).map(i => (i.toLong, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedupPairs(same, nlist = 2,
      kmeansIters = 1, threshold = 0.9, maxCluster = 10)
    assert(pairs.isEmpty)
    // everything keeps when the guard suppresses the cluster
    val keep = Similarity.semanticDedup(same, nlist = 2, kmeansIters = 1,
      threshold = 0.9, maxCluster = 10).as[(Long, Boolean)].collect()
    assert(keep.forall(_._2))
  }

  // --------------------------------------------------------------- curate2

  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("curate2: stage coupling — survivors replay the five gates in order") {
    import graft.ops._
    val out = Curation.curate2(spark, corpus).cache()
    val got = out.select("doc_id").as[Long].collect().toSet
    assert(got.nonEmpty)
    // replay the chain with the component operators directly
    val s1 = Dedup.exact(corpus).filter(col("keep")).select("doc_id")
      .join(corpus, Seq("doc_id"))
    val s2 = s1.join(SpanDedup.profile(s1).filter(col("dup_frac") <= 0.5)
      .select("doc_id"), Seq("doc_id"))
    val en = TextMetrics.stopwords.toMap.apply("en")
    val s3 = s2.join(GopherRules.flags(s2, stopwords = en)
      .filter(col("keep")).select("doc_id"), Seq("doc_id"))
    val pb = PerplexityBuckets.buckets(spark, s3)
    val s4 = s3.join(pb.filter(col("bucket") =!= "tail"), Seq("doc_id"))
    val want = Sampling.domainQuota(s4, cap = 5).select("doc_id")
      .as[Long].collect().toSet
    assert(got == want)
    // per-domain quota honored; buckets never 'tail'; ranks 1-based dense
    val byDom = out.groupBy("domain").agg(count(lit(1)).as("n"),
      max("rk").as("mx")).collect()
    byDom.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getLong(2) == r.getLong(1), r.toString) }
    assert(out.filter(col("bucket") === "tail").count() == 0)
    out.unpersist()
  }

  test("curate2 is deterministic across partitionings") {
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Curation.curate2(spark, d)
        .collect().map(_.toSeq).toSet
    assert(run(corpus) == run(corpus.repartition(17)))
  }
}
