package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation sessionization (north rule: "session windows with
  * watermarks on ts to close out conversations").
  *
  * A session = consecutive turns of one conv_id with inter-turn gap below
  * `gap`. Built on Spark's native `session_window` (merging session state
  * operator) under a watermark, so closed sessions emit exactly once and
  * their state is purged — bounded by open conversations.
  *
  * Works identically on batch frames (used for the DuckDB-oracle compare:
  * the SQL oracle reproduces the gaps-and-islands semantics with
  * lag + cumulative sum).
  */
object Sessionize {

  def sessions(turns: DataFrame, gap: String = "5 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(turns)(w => turns.withWatermark("ts", w))
    src
      .groupBy(session_window(col("ts"), gap).as("w"), col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool"),
        min("ts").as("ts_first"),
        max("ts").as("ts_last"))
      .select(col("conv_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_turns"), col("n_user"),
        col("n_tool"), col("ts_first"), col("ts_last"))
  }
}
