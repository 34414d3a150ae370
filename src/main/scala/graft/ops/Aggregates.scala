package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregation operators the reference lacks entirely (SURVEY.md §2.4):
  * salted two-phase aggregation for skewed keys, rollup lineage stats,
  * and a window-function top-k skew report. Each is oracle-checkable —
  * salting in particular must produce IDENTICAL results to the naive
  * groupBy, only with a different exchange shape.
  */
object Aggregates {

  /** Per-conversation stats via SALTED two-phase aggregation: a hot
    * conv_id would bottleneck a single reducer, so phase 1 pre-aggregates
    * on (conv_id, salt = pmod(hash(turn_idx), saltBuckets)) — spreading
    * the hot key over `saltBuckets` reducers with map-side combine — and
    * phase 2 merges the partials per conv_id, now at most `saltBuckets`
    * rows per key. Only commutative/associative aggregates may be salted
    * this way; keyed STATE must never be (SURVEY.md §7.5).
    */
  def convStatsSalted(turns: DataFrame, saltBuckets: Int = 16): DataFrame =
    turns
      .withColumn("salt", pmod(hash(col("turn_idx")), lit(saltBuckets)))
      .groupBy(col("conv_id"), col("salt"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        min("ts").as("ts_min"), max("ts").as("ts_max"))
      .groupBy(col("conv_id"))
      .agg(
        sum("n").as("n_turns"),
        sum("n_user").as("n_user"),
        min("ts_min").as("ts_first"),
        max("ts_max").as("ts_last"))

  /** Same result, naive single-phase groupBy (the skew-prone shape). */
  def convStatsNaive(turns: DataFrame): DataFrame =
    turns.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
      min("ts").as("ts_first"), max("ts").as("ts_last"))

  /** ROLLUP lineage stats over (role, malformed-or-not). */
  def rollupStats(turns: DataFrame): DataFrame =
    turns
      .withColumn("has_text", col("text").isNotNull)
      .rollup(col("role"), col("has_text"))
      .agg(count(lit(1)).as("n"))

  /** CUBE lineage stats over (role, has_text) — all four grouping-set
    * combinations (completes the rollup/cube class of SURVEY.md §2.4).
    */
  def cubeStats(turns: DataFrame): DataFrame =
    turns
      .withColumn("has_text", col("text").isNotNull)
      .cube(col("role"), col("has_text"))
      .agg(count(lit(1)).as("n"))

  /** Top-k largest conversations by turn count — the skew report used to
    * spot hot keys before they hit the stateful layer.
    *
    * Scale shape: orderBy+limit compiles to TakeOrderedAndProject (per-
    * partition k-heap, driver merges k rows per partition) — never a
    * global single-task sort window. The rank window then runs over the k
    * SURVIVORS only. (n_turns desc, conv_id asc) is a total order, so
    * rank == row_number and the limit loses no tied rows.
    */
  def topConversations(turns: DataFrame, k: Int = 10): DataFrame = {
    val counts = turns.groupBy("conv_id").agg(count(lit(1)).as("n_turns"))
    val topK = counts.orderBy(col("n_turns").desc, col("conv_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_turns").desc, col("conv_id").asc)
    topK.withColumn("rank", rank().over(w))
  }

  /** Set operations over conversation key sets: conversations that used
    * BOTH tools (intersect) and search-only conversations (except). Both
    * compile to distinct-aggregates + a shuffle keyed on conv_id — no
    * driver-side set materialization.
    */
  def toolSetOps(turns: DataFrame): DataFrame = {
    val s = turns.filter(col("tool") === "search").select("conv_id").distinct()
    val c = turns.filter(col("tool") === "calculator").select("conv_id").distinct()
    s.intersect(c).withColumn("op", lit("both_tools"))
      .unionByName(s.except(c).withColumn("op", lit("search_only")))
  }

  /** Cardinality metrics: exact + approximate distinct conversations per
    * role (HLL-based approx_count_distinct; the approx column is excluded
    * from the DuckDB oracle, which checks the exact ones).
    */
  def cardinality(turns: DataFrame): DataFrame =
    turns.groupBy("role").agg(
      count(lit(1)).as("n"),
      countDistinct(col("conv_id")).as("n_convs"),
      approx_count_distinct(col("conv_id")).as("n_convs_approx"))

  /** Ordered collection aggregate (SQL string_agg class): the tool-call
    * sequence of each conversation in turn order. collect_list has no
    * intra-group order guarantee, so the struct is sorted AFTER
    * collection (array_sort on (turn_idx, tool) structs — deterministic
    * because turn_idx is unique per conversation) and only then folded
    * to a string. One map-side-combined hash aggregate; per-group state
    * is the conversation's tool calls, bounded by conversation length.
    */
  def toolSequence(turns: DataFrame): DataFrame =
    turns.filter(col("tool").isNotNull)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_calls"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("tool")))),
            s => s.getField("tool"))).as("tool_seq"))

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * per-role totals, per-tool totals, and the grand total in ONE pass
    * (Spark expands to a single aggregate over the replicated grouping
    * id, not three scans).
    */
  def groupingSetsStats(turns: DataFrame): DataFrame =
    turns.groupingSets(
        Seq(Seq(col("role")), Seq(col("tool")), Seq()),
        col("role"), col("tool"))
      .agg(count(lit(1)).as("n"))

  /** Offset window function (lag): inter-turn latency per conversation.
    * One exchange keyed on conv_id (many distinct keys at scale), then a
    * per-partition sort by turn_idx — the canonical offset-window shape;
    * null for each conversation's first turn, like SQL lag.
    */
  def turnLatency(turns: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
    turns.select(col("conv_id"), col("turn_idx"),
      (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        .as("latency_sec"))
  }

  /** Frame window (ROWS BETWEEN): rolling mean text length over each
    * conversation's last 3 turns. Same keyed-exchange shape as
    * turnLatency; the frame is evaluated streaming within the sorted
    * partition (no per-row re-scan of the frame).
    */
  def rollingStats(turns: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
    turns.select(col("conv_id"), col("turn_idx"), length(col("text")).as("len"))
      .withColumn("roll_avg_len", avg("len").over(w))
  }

  /** Exact + approximate quantiles of text length per role — the
    * quantile-sketch sibling of `cardinality`'s HLL: `percentile` is the
    * exact sort-based aggregate (quantile_cont interpolation, the DuckDB
    * oracle's definition), `approx_percentile` is Spark's bounded-memory
    * Greenwald-Khanna sketch, mergeable across partitions (the 100 TB
    * path — exact percentile buffers every value per group; the sketch
    * holds O(1/eps) per group at any scale). As with the HLL column, the
    * sketch value itself is engine-specific, so the emitted claim is the
    * |approx − exact| <= eps·range BOUND, which the oracle asserts true.
    */
  def quantileStats(turns: DataFrame, eps: Double = 0.02): DataFrame = {
    val len = length(col("text"))
    turns
      // null text would yield NULL exact quantiles and NULL bound claims
      // for an all-null group, diverging from the oracle's hardcoded TRUE
      .filter(col("text").isNotNull)
      .select(col("role"), len.as("len"))
      .groupBy("role")
      .agg(
        expr("percentile(len, 0.5)").as("p50_exact"),
        expr("percentile(len, 0.9)").as("p90_exact"),
        expr("approx_percentile(len, 0.5, 1000)").as("p50_approx"),
        expr("approx_percentile(len, 0.9, 1000)").as("p90_approx"),
        (max("len") - min("len")).cast("long").as("range"))
      .withColumn("p50_ok",
        abs(col("p50_approx") - col("p50_exact")) <= col("range") * eps)
      .withColumn("p90_ok",
        abs(col("p90_approx") - col("p90_exact")) <= col("range") * eps)
      .drop("p50_approx", "p90_approx")
  }

  /** Pivot (long→wide reshape): per-language document counts by length
    * bucket, pivot values DECLARED. Formulated as ONE aggregate of
    * conditional counts — the `.pivot(col, values)` API compiles to TWO
    * aggregation phases even with declared values (groupBy(keys, pivot)
    * count, then a pivotfirst re-aggregation; plan-pinned finding), while
    * the conditional-count form is a single partial+final pair over one
    * exchange keyed on `lang`. Empty cells are 0 per SQL count semantics,
    * exactly the conditional-FILTER aggregation the DuckDB oracle states.
    */
  def langLengthPivot(docs: DataFrame): DataFrame = {
    val bucket = when(length(col("text")) < 200, "short")
      .when(length(col("text")) < 1000, "medium")
      .otherwise("long")
    def cell(v: String) = count(when(col("len_bucket") === v, 1)).as(s"n_$v")
    docs.select(col("lang"), bucket.as("len_bucket"))
      .groupBy("lang")
      .agg(cell("short"), cell("medium"), cell("long"))
  }
}
