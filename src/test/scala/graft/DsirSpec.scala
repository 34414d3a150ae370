package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dsir, TextMetrics}

/** DSIR importance weighting: hand-checked hash/ratio arithmetic vs a
  * plain-Scala re-computation, learned target signal on the corpus,
  * determinism, and the narrow-scoring plan.
  */
class DsirSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // plain-Scala mirrors of the column arithmetic
  private def fp(s: String): Long =
    s.foldLeft(0L)((acc, c) => math.floorMod(acc * 31 + c.toInt, TextMetrics.FpMod))
  private def bkt(s: String): Int = (fp(s) % Dsir.NumBuckets).toInt

  test("train + score match the hand computation on a toy corpus") {
    import spark.implicits._
    val toy = Seq((1L, "en", "aa bb"), (2L, "de", "aa cc"))
      .toDF("doc_id", "lang", "text")
    val lr = Dsir.trainLogRatios(toy)
    val m = Dsir.NumBuckets
    // counts: aa appears in both docs, bb only in target, cc only in source
    val cs = Map(bkt("aa") -> 2L, bkt("bb") -> 1L, bkt("cc") -> 1L)
    val ct = Map(bkt("aa") -> 1L, bkt("bb") -> 1L, bkt("cc") -> 0L)
    for (b <- Seq(bkt("aa"), bkt("bb"), bkt("cc"))) {
      val want = math.log((ct(b) + 1.0) / (2 + m)) - math.log((cs(b) + 1.0) / (4 + m))
      assert(math.abs(lr(b) - want) < 1e-12, s"bucket $b")
    }
    val got = Dsir.score(toy, lr).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 == 2 && got(2L)._1 == 2)
    assert(math.abs(got(1L)._2 - (lr(bkt("aa")) + lr(bkt("bb")))) < 1e-12)
    assert(math.abs(got(2L)._2 - (lr(bkt("aa")) + lr(bkt("cc")))) < 1e-12)
  }

  test("target-language documents score higher on average") {
    val out = Dsir.weights(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg(col("log_weight") / col("n_words")))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(out(true) > out(false),
      s"en ${out(true)} !> other ${out(false)}")
  }

  test("deterministic across partitionings (exact)") {
    import spark.implicits._
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.weights(d).as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(17)))
  }

  test("scoring over the literal ratio table plans zero Exchange") {
    val lr = Array.fill(Dsir.NumBuckets)(0.1)
    val s = Dsir.score(docs, lr).queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s.take(1200))
  }

  test("column splitmix64 equals the driver-side TranscriptGen.mix bit-for-bit") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 17L, 500L, Long.MaxValue, -1L, Long.MinValue)
    val got = ids.toDF("x").select(Dsir.splitmix(col("x")))
      .as[Long].collect().toSeq
    assert(got == ids.map(graft.fixtures.TranscriptGen.mix))
  }

  test("gumbel-top-k resample: deterministic, k rows, subset of corpus") {
    import spark.implicits._
    val a = Dsir.resample(docs, k = 50).as[Long].collect().sorted.toSeq
    val b = Dsir.resample(docs.repartition(17), k = 50).as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 50 && a.distinct.size == 50)
    val ids = docs.select("doc_id").as[Long].collect().toSet
    assert(a.forall(ids))
  }

  test("gumbel-top-k is weight-biased when weights have real spread") {
    import spark.implicits._
    // 20 heavy (log w = +8) vs 180 light (log w = -8): odds ratio e^16 —
    // every heavy doc must beat every light doc through Gumbel noise
    // (|g| < ~7 at n=200 with overwhelming margin, and deterministic here)
    val scored = (0L until 200L).map(i =>
      (i, if (i % 10 == 0) 8.0 else -8.0)).toDF("doc_id", "log_weight")
    val got = Dsir.gumbelTopK(scored, k = 20).as[Long].collect().toSet
    assert(got == (0L until 200L).filter(_ % 10 == 0).toSet)
  }

  test("resample plans TakeOrderedAndProject, not a global sort") {
    val s = Dsir.resample(docs, k = 10).queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s.take(1200))
  }
}
