package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.{Cep, CepMatch}

/** Buffered turns of one open conversation (unordered arrival). */
final case class CepConvState(rows: Vector[(Int, Long, String)])

/** Streaming CEP: the event-time twin of [[graft.ops.Cep]]. Turns are
  * symbolized with the SAME codegen'd rule column, buffered per
  * conversation in flatMapGroupsWithState, and when the watermark closes
  * the conversation (event-time timeout `gap` after its newest event —
  * the session-window contract), the buffer is sorted by turn_idx and run
  * through the SAME [[Cep.matchConv]] kernel. Emission strictly at close
  * keeps the operator exactly-once in append mode: a pattern can never
  * emit early and then be invalidated by a late out-of-order turn,
  * because matches are only decided once the watermark proves the
  * conversation complete. That is Flink CEP's event-time contract.
  *
  * State law: one buffered symbol row (int, long, 1-char string) per turn
  * of each OPEN conversation — bounded by open conversations × turns per
  * conversation, independent of stream length. The only exchange is the
  * keyed-state shuffle on conv_id, identical to the batch plan's single
  * exchange amortized over arrival.
  */
object StreamCep {

  def matches(turns: DataFrame, rules: Seq[(Char, Column)], pattern: String,
      watermark: String = "10 minutes", gap: String = "30 minutes"): Dataset[CepMatch] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0,
      s"CEP gap must be day/time-based, got month-bearing interval '$gap'")
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000L
    val compiled = pattern
    turns
      .withWatermark("ts", watermark)
      .select(col("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        col("ts"),
        coalesce(col("ts").cast("long"), lit(0L)).as("ts_sec"),
        Cep.symbolize(rules).as("s"))
      .as[(String, Int, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CepConvState, CepMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (conv: String, rows: Iterator[(String, Int, java.sql.Timestamp, Long, String)],
            state: GroupState[CepConvState]) =>
          if (state.hasTimedOut) {
            // conversation closed by the watermark: match once, free state
            val buf = state.get.rows.sortBy(_._1)
            state.remove()
            val pat = java.util.regex.Pattern.compile(compiled)
            Cep.matchConv(conv, buf, pat).iterator
          } else {
            var s = state.getOption.getOrElse(CepConvState(Vector.empty))
            var maxTs = Long.MinValue
            rows.foreach { r =>
              if (r._3 != null) maxTs = math.max(maxTs, r._3.getTime)
              s = CepConvState(s.rows :+ ((r._2, r._4, r._5)))
            }
            state.update(s)
            // close `gap` after the newest event; clamp to watermark+1 so
            // a backfill batch spanning more event time than `gap` still
            // expires the conversation next batch (same as DedupState)
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(
                math.max(maxTs + gapMs, state.getCurrentWatermarkMs() + 1))
            else
              // a batch whose rows ALL carry null event-time must still
              // set a closure deadline, or the group's state is retained
              // forever (round-5 advisor finding)
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + math.max(gapMs, 1L))
            Iterator.empty
          }
      }
  }

  /** The transcript instantiation, streaming twin of [[Cep.searchRuns]]. */
  def searchRuns(turns: DataFrame, watermark: String = "10 minutes",
      gap: String = "30 minutes"): Dataset[CepMatch] =
    matches(turns, Cep.transcriptRules, Cep.searchRunPattern, watermark, gap)
}
