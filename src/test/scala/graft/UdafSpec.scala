package graft

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.functions.ExactQuantile

/** Typed-Aggregator UDAF surface (SURVEY §2.4): exact quantile values,
  * SQL registration, and the partial-aggregation plan shape.
  */
class UdafSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(("a", 1L), ("a", 3L), ("a", 2L), ("a", 10L),
      ("b", 5L), ("b", 7L), ("b", 6L)).toDF("k", "v")
  }

  test("exact median and p90 match quantile_cont interpolation") {
    val med = udaf(ExactQuantile(0.5))
    val p90 = udaf(ExactQuantile(0.9))
    val got = df.groupBy("k").agg(med(col("v")).as("m"), p90(col("v")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // a: sorted [1,2,3,10]: median pos 1.5 -> 2.5; p90 pos 2.7 -> 0.3*3+0.7*10
    assert(got("a")._1 == 2.5)
    assert(math.abs(got("a")._2 - (0.3 * 3 + 0.7 * 10)) < 1e-12)
    // b: sorted [5,6,7]: median = 6; p90 pos 1.8 -> 0.2*6+0.8*7
    assert(got("b")._1 == 6.0)
    assert(math.abs(got("b")._2 - (0.2 * 6 + 0.8 * 7)) < 1e-12)
  }

  test("boundary quantiles are min and max; singleton group is itself") {
    import spark.implicits._
    val q0 = udaf(ExactQuantile(0.0)); val q1 = udaf(ExactQuantile(1.0))
    val got = Seq(("s", 42L), ("m", 4L), ("m", 9L), ("m", 1L)).toDF("k", "v")
      .groupBy("k").agg(q0(col("v")).as("lo"), q1(col("v")).as("hi"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("s") == ((42.0, 42.0)))
    assert(got("m") == ((1.0, 9.0)))
  }

  test("registers for SQL and runs through spark.sql") {
    spark.udf.register("exact_median", udaf(ExactQuantile(0.5)))
    df.createOrReplaceTempView("udaf_in")
    val rows = spark.sql(
      "SELECT k, exact_median(v) AS m FROM udaf_in GROUP BY k ORDER BY k")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("a", 2.5), ("b", 6.0)))
  }

  test("plans as ObjectHashAggregate with a partial stage before the exchange") {
    val med = udaf(ExactQuantile(0.5))
    val agg = df.repartition(4).groupBy("k").agg(med(col("v")).as("m"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan
    val aggs = flattenPlan(plan).collect { case o: ObjectHashAggregateExec => o }
    assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode.toString)).distinct
    assert(modes.toSet == Set("Partial", "Final"), s"modes=$modes")
    // map-side combining really happened: the partial stage sits below the
    // exchange, so the aggregate name appears under partial_ in the plan
    val s = flattenPlan(plan).map(_.verboseString(5)).mkString("\n")
    assert(s.contains("partial_exactquantile"), s.take(1500))
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("domain quota is row-identical to the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    val cap = 7
    val got = graft.ops.Sampling.domainQuota(docs, cap = cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val want = docs.select(col("source").as("domain"), col("doc_id"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.groupBy(_._1).forall(_._2.size == cap)) // 25 docs per source
  }

  test("domain quota is deterministic across partitionings and caps at group size") {
    def run(d: org.apache.spark.sql.DataFrame, cap: Int) =
      graft.ops.Sampling.domainQuota(d, cap = cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs, 10) == run(docs.repartition(17), 10))
    // cap above every group size: everything kept
    assert(run(docs, 1000).size == docs.count())
  }

  test("domain quota plans bounded-heap partial+final ObjectHashAggregate, no Window") {
    val q = graft.ops.Sampling.domainQuota(docs.repartition(4), cap = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan
    val s = flattenPlan(plan).map(_.verboseString(5)).mkString("\n")
    assert(!s.contains("Window"), s.take(1500))
    val aggs = flattenPlan(plan).collect { case o: ObjectHashAggregateExec => o }
    assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(s.contains("partial_minkbykey"), s.take(1500))
  }
}
