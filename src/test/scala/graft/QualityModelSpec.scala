package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityModel

/** Trained logistic-regression quality classifier: hand-checked gradient
  * step, convex-loss descent on the real corpus, determinism, and the
  * narrow-inference plan discipline shared with BPE/NB.
  */
class QualityModelSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("one GD step matches the hand computation (sigma(0) = 1/2)") {
    import spark.implicits._
    // two rows, features chosen so the gradient is trivial to hand-derive:
    //   g_j = avg((0.5 - y) * x_j); w_j = -lr * g_j after one step from 0
    val toy = Seq(
      (1L, "en", 1.0, 2.0, 3.0, 4.0),  // y = 1
      (2L, "de", 1.0, 6.0, 7.0, 8.0))  // y = 0
      .toDF("doc_id", "lang", "x0", "x1", "x2", "x3")
      .withColumn("y", (col("lang") === "en").cast("double"))
    val w = QualityModel.train(toy, iters = 1, lr = 0.5)
    // g = ((0.5-1)*a + (0.5-0)*b) / 2 per feature
    val g = Seq((1.0, 1.0), (2.0, 6.0), (3.0, 7.0), (4.0, 8.0))
      .map { case (a, b) => (-0.5 * a + 0.5 * b) / 2 }
    val expect = g.map(-0.5 * _)
    w.zip(expect).foreach { case (got, e) => assert(math.abs(got - e) < 1e-12) }
  }

  test("training descends the convex log-loss below the w=0 baseline") {
    import spark.implicits._
    val f = QualityModel.features(docs).cache()
    def loss(w: Seq[Double]): Double = {
      val z = (0 until 4).map(j => col(s"x$j") * w(j)).reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      f.agg(avg(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))))
        .as[Double].head()
    }
    val l0 = loss(Seq.fill(4)(0.0)) // = ln 2 exactly
    assert(math.abs(l0 - math.log(2.0)) < 1e-12)
    val w3 = QualityModel.train(f, iters = 3, lr = 0.5)
    val w6 = QualityModel.train(f, iters = 6, lr = 0.5)
    assert(loss(w3) < l0, s"3-iter loss ${loss(w3)} !< ln2")
    assert(loss(w6) <= loss(w3) + 1e-12, "more iterations should not hurt")
    f.unpersist()
  }

  test("predictions: p in (0,1), pred == (p >= 0.5), one row per doc") {
    import spark.implicits._
    val out = QualityModel.trainAndClassify(docs)
    assert(out.count() == docs.count())
    assert(out.filter(col("p") <= 0.0 || col("p") >= 1.0).count() == 0)
    assert(out.filter(col("pred") =!= (col("p") >= 0.5)).count() == 0)
  }

  test("train + classify deterministic across partitionings") {
    import spark.implicits._
    def run(d: org.apache.spark.sql.DataFrame) =
      QualityModel.trainAndClassify(d)
        .select("doc_id", "p").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val a = run(docs)
    val b = run(docs.repartition(17))
    // gradient avgs are map-side-combined doubles: sum order differs by
    // partitioning, so allow float-noise, not exact equality
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, pa), (_, pb)) =>
      assert(math.abs(pa - pb) < 1e-9) }
  }

  test("classification over trained literal weights plans zero Exchange") {
    val f = QualityModel.features(docs)
    val s = QualityModel.classify(f, Seq(0.1, -0.2, 0.3, -0.4))
      .queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s.take(1200))
  }
}
