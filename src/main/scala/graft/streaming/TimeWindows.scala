package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tumbling and sliding event-time windows (north rule: "tumbling/sliding/
  * session windows, watermarks"). Built on Spark's native `window()` —
  * streaming-safe under a watermark (closed windows emit once, state
  * purged), and the same code runs in batch for backfill + the DuckDB
  * oracle compare.
  */
object TimeWindows {

  /** Per-window per-role turn counts, tumbling windows of `size`. */
  def tumbling(turns: DataFrame, size: String = "5 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(turns)(w => turns.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), size).as("w"), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        approx_count_distinct(col("conv_id")).as("n_convs_approx"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("role"), col("n_turns"), col("n_convs_approx"))
  }

  /** Sliding windows (`size` long, advancing by `slide`); each event lands
    * in size/slide overlapping windows.
    */
  def sliding(turns: DataFrame, size: String = "10 minutes",
      slide: String = "5 minutes", watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(turns)(w => turns.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), size, slide).as("w"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n_turns"), col("n_user"))
  }
}
