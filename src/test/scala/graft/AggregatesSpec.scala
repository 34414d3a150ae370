package graft

import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.ops.Aggregates
import graft.validate.ValidationPipeline

/** Aggregation operators + observed-metrics lineage. */
class AggregatesSpec extends SparkSpec {

  private lazy val turns = TranscriptGen.turnsDs(spark, 40, 10, 60).toDF().cache()

  test("salted two-phase agg == naive groupBy, with the extra exchange") {
    import spark.implicits._
    val salted = Aggregates.convStatsSalted(turns, saltBuckets = 16)
    val naive = Aggregates.convStatsNaive(turns)
    val s = salted.orderBy("conv_id").collect().toSeq
    val n = naive.orderBy("conv_id").collect().toSeq
    assert(s == n)
    // the salted plan really has two aggregation rounds
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("salt"), plan.take(500))
  }

  test("top-k report surfaces the planted hot conversation at rank 1") {
    import spark.implicits._
    val top = Aggregates.topConversations(turns, k = 5)
      .select("conv_id", "rank").as[(String, Int)].collect()
    assert(top.find(_._2 == 1).get._1 == "CONV_00000000") // the hot conv
  }

  test("rollup: grand total row equals input count") {
    import spark.implicits._
    val r = Aggregates.rollupStats(turns)
    val grand = r.filter($"role".isNull && $"has_text".isNull)
      .select("n").as[Long].head()
    assert(grand == turns.count())
  }

  test("cardinality: approx within 5% of exact") {
    import spark.implicits._
    val c = Aggregates.cardinality(turns)
      .select("n_convs", "n_convs_approx").as[(Long, Long)].collect()
    c.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
    }
  }

  test("observed metrics: lineage counters match decisions (T1/T7 analogue)") {
    val d = ValidationPipeline.decide(spark, turns, TranscriptGen.catalog).toDF()
    // observedMetrics populate on THIS QueryExecution only when it itself
    // runs — derived actions like d.filter(...).count() execute a different
    // QueryExecution and leave it empty
    val rows = d.collect()
    val validCount = rows.count(_.getAs[String]("decision") == "valid")
    val all = rows.length.toLong
    val metrics = d.queryExecution.observedMetrics
    val out = metrics("graft_out")
    assert(out.getAs[Long]("rows_out") == all)
    assert(out.getAs[Long]("valid") == validCount)
    assert(out.getAs[Long]("rejected") == all - validCount)
    val in = metrics("graft_in")
    assert(in.getAs[Long]("rows_in") == all)
    assert(in.getAs[Long]("malformed_envelope") > 0)
  }

  test("lag window: first turn null, latency equals the ts delta") {
    val rows = Aggregates.turnLatency(turns)
      .filter(col("conv_id") === "CONV_00000000").orderBy("turn_idx").collect()
    assert(rows.head.isNullAt(2)) // lag over the partition's first row
    val ts = turns.filter(col("conv_id") === "CONV_00000000")
      .orderBy("turn_idx").select(col("ts").cast("long")).collect().map(_.getLong(0))
    rows.drop(1).zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(2) == ts(i + 1) - ts(i)) }
  }

  test("frame window: rolling mean covers at most the last 3 turns") {
    val rows = Aggregates.rollingStats(turns)
      .filter(col("conv_id") === "CONV_00000000").orderBy("turn_idx").collect()
    val lens = rows.map(r => if (r.isNullAt(2)) None else Some(r.getInt(2).toLong))
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = lens.slice(math.max(0, i - 2), i + 1).flatten
      val expected = if (frame.isEmpty) None
        else Some(frame.sum.toDouble / frame.size)
      val got = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(got == expected, s"row $i: $got vs $expected")
    }
  }
}
