package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.validate.{RelationalValidation, ValidationPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Transcript fixtures for `sfDir` (generated deterministically in-repo,
    * since /root/testdata is read-only and the input_hint table shape is a
    * transcripts stream).
    */
  private def tx(spark: SparkSession, sfDir: String): DataFrame = {
    val p = TranscriptGen.ensure(spark, sfDir)
    TranscriptGen.readTranscripts(spark, p)
  }

  /** Flagship: the full validation pipeline on sf0.001 transcripts. */
  def entry(spark: SparkSession): DataFrame =
    ValidationPipeline
      .decide(spark, tx(spark, "/root/testdata/sf0.001"), TranscriptGen.catalog)
      .toDF()
      .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "validate_fused" -> ((s, dir) =>
      ValidationPipeline.decide(s, tx(s, dir), TranscriptGen.catalog).toDF()
        .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid")
        .orderBy("conv_id", "turn_idx")),
    "validate_relational" -> ((s, dir) => {
      val p = TranscriptGen.ensure(s, dir)
      val (ent, defA, attr) = TranscriptGen.readCatalogFrames(s, p)
      RelationalValidation.decide(s, TranscriptGen.readTranscripts(s, p), ent, defA, attr)
        .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid")
        .orderBy("conv_id", "turn_idx")
    }),
    "dedup_turns" -> ((s, dir) => {
      import s.implicits._
      val t = tx(s, dir).as[graft.model.Turn]
      val withDups = t.union(t.filter(_.turn_idx == 0))
      graft.streaming.DedupState.dedupBatch(s, withDups).toDF()
        .orderBy("conv_id", "turn_idx")
    }),
    "sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.sessions(tx(s, dir), gap = "2 minutes")
        .orderBy("conv_id", "session_start")),
    "turn_join" -> ((s, dir) =>
      graft.streaming.TurnJoin.userToolPairs(tx(s, dir), horizon = "3 minutes")
        .orderBy("conv_id", "u_turn_idx", "t_turn_idx")),
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    // Both validation variants must reproduce the full decision oracle.
    // The driver runs Verify at sf0.01; Verify generates the transcript
    // fixtures at this in-repo path before the oracle executes.
    "validate_fused" -> OracleSql.decisions(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "validate_relational" -> OracleSql.decisions(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "dedup_turns" -> OracleSql.dedup(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "sessionize" -> OracleSql.sessionize(TranscriptGen.fixtureDir("/root/testdata/sf0.01"), 2),
    "turn_join" -> OracleSql.turnJoin(TranscriptGen.fixtureDir("/root/testdata/sf0.01"), 3),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
