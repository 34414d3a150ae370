package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join of user turns against the tool/agent turns that
  * answer them (north rule: "stream-stream stateful join of user turns
  * against tool/agent turns").
  *
  * An interval join: tool turn t pairs with user turn u of the same
  * conversation when `u.ts <= t.ts <= u.ts + horizon`. Under watermarks on
  * BOTH sides plus the time-interval condition, Spark bounds the join state
  * and purges rows that can no longer match — the requirement for an
  * unbounded 10^12-turn stream. Inner join ⇒ append-mode output as each
  * pair becomes final.
  */
object TurnJoin {

  def userToolPairs(turns: DataFrame, horizon: String = "5 minutes",
      watermark: Option[String] = None): DataFrame =
    joinImpl(turns, horizon, watermark, "inner")

  /** LEFT OUTER stream-stream join: every user turn emits — paired rows
    * as they match, and an unanswered user turn as a null-tool row ONCE
    * THE WATERMARK PASSES `u_ts + horizon` (only then can "no match" be
    * final on an unbounded stream; Spark requires the watermark + time
    * bound for exactly this reason). The batch form is a plain left
    * outer interval join — same rows, minus the lateness protocol.
    */
  def userToolPairsOuter(turns: DataFrame, horizon: String = "5 minutes",
      watermark: Option[String] = None): DataFrame =
    joinImpl(turns, horizon, watermark, "left_outer")

  private def joinImpl(turns: DataFrame, horizon: String,
      watermark: Option[String], joinType: String): DataFrame = {
    def side(role: String, prefix: String) = {
      val base = turns.filter(col("role") === role)
        .select(col("conv_id").as(s"${prefix}_conv_id"),
          col("turn_idx").as(s"${prefix}_turn_idx"),
          col("ts").as(s"${prefix}_ts"),
          col("tool").as(s"${prefix}_tool"))
      watermark.fold(base)(w => base.withWatermark(s"${prefix}_ts", w))
    }
    val users = side("user", "u").drop("u_tool")
    val tools = side("tool", "t")
    users.join(tools,
      expr(s"""u_conv_id = t_conv_id AND
               t_ts >= u_ts AND
               t_ts <= u_ts + interval $horizon AND
               t_turn_idx > u_turn_idx"""), joinType)
      .select(col("u_conv_id").as("conv_id"), col("u_turn_idx"),
        col("t_turn_idx"), col("u_ts"), col("t_ts"), col("t_tool").as("tool"))
  }
}
