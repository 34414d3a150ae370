package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One detected pattern occurrence within a conversation. */
final case class CepMatch(
    conv_id: String,
    match_seq: Long, // 1-based ordinal of the match within its conversation
    start_turn_idx: Int, // turn_idx of the first matched turn
    end_turn_idx: Int, // turn_idx of the last matched turn
    n_turns: Long, // number of turns the match spans
    symbols: String, // the matched symbol substring
    span_seconds: Long) // event-time span first→last matched turn (may be
    //                     negative: ordering is by turn_idx, and late turns
    //                     carry pulled-back timestamps)

/** Complex-event-processing sequence matching over conversation
  * transcripts (north star: "CEP engine"). The reference has no pattern
  * operator at all — this is a BASELINE.json north-rule class, expressed
  * the way Flink CEP / MATCH_RECOGNIZE define it: a per-key ordered
  * automaton.
  *
  * Model: each turn is mapped to a one-character symbol by an ordered
  * rule list (first predicate that matches wins, '_' otherwise) — a pure
  * codegen'd CASE column, no UDF. Each conversation's turns, ordered by
  * the stable (conv_id, turn_idx) key, then form a symbol string, and the
  * pattern is an ordinary regular expression matched greedily
  * left-to-right without overlap (`java.util.regex` find() semantics —
  * the same leftmost-greedy, non-overlapping contract as
  * MATCH_RECOGNIZE's default `AFTER MATCH SKIP PAST LAST ROW`).
  *
  * Scale shape: ONE hash exchange on conv_id + an in-partition sort —
  * the same cost as any keyed aggregation — then a narrow pass that
  * holds exactly one conversation in memory at a time (secondary-sort
  * iterator grouping, NOT collect_list, so a partition's memory bound is
  * its largest single conversation, never the partition). Conversations
  * are bounded in this domain; the matcher is linear in conversation
  * length for the patterns used here. At 10^12 turns the plan is
  * shuffle-bound, which is the floor for any per-key ordered operator.
  */
object Cep {

  /** Ordered symbolization rules → one-char symbol column ('_' default). */
  def symbolize(rules: Seq[(Char, Column)]): Column =
    rules.foldRight(lit("_")) { case ((c, p), acc) =>
      when(p, lit(c.toString)).otherwise(acc)
    }

  /** Pure per-conversation matcher kernel: `turns` is ONE conversation's
    * (turn_idx, ts_sec, symbol) rows sorted by turn_idx. Shared verbatim
    * by the batch operator and the streaming close-time emitter, which is
    * what makes their agreement structural rather than incidental.
    */
  def matchConv(convId: String, turns: IndexedSeq[(Int, Long, String)],
      pattern: java.util.regex.Pattern): Vector[CepMatch] = {
    if (turns.isEmpty) return Vector.empty
    val sb = new java.lang.StringBuilder(turns.length)
    turns.foreach(t => sb.append(t._3))
    val m = pattern.matcher(sb)
    val out = Vector.newBuilder[CepMatch]
    var seq = 0L
    while (m.find()) {
      // zero-width matches (e.g. `a*`) are skipped; find() itself advances
      // past them, so this cannot loop
      if (m.end() > m.start()) {
        seq += 1
        val first = turns(m.start())
        val last = turns(m.end() - 1)
        out += CepMatch(convId, seq, first._1, last._1,
          (m.end() - m.start()).toLong, m.group(), last._2 - first._2)
      }
    }
    out.result()
  }

  /** Batch CEP: symbolize → one exchange on conv_id → in-partition sort →
    * narrow grouped matcher. `turns` needs (conv_id, turn_idx, ts).
    */
  def matches(turns: DataFrame, rules: Seq[(Char, Column)],
      pattern: String): Dataset[CepMatch] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val compiled = pattern // compile on executors (Pattern isn't serializable-stable)
    turns
      .select(col("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        coalesce(col("ts").cast("long"), lit(0L)).as("ts_sec"),
        symbolize(rules).as("s"))
      .repartition(col("conv_id"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .as[(String, Int, Long, String)]
      .mapPartitions { it =>
        val pat = java.util.regex.Pattern.compile(compiled)
        val buf = it.buffered
        new Iterator[CepMatch] {
          private var pending: Iterator[CepMatch] = Iterator.empty
          @annotation.tailrec
          private def refill(): Unit =
            if (!pending.hasNext && buf.hasNext) {
              val conv = buf.head._1
              val rows = IndexedSeq.newBuilder[(Int, Long, String)]
              while (buf.hasNext && buf.head._1 == conv) {
                val r = buf.next()
                rows += ((r._2, r._3, r._4))
              }
              pending = matchConv(conv, rows.result(), pat).iterator
              refill()
            }
          override def hasNext: Boolean = { refill(); pending.hasNext }
          override def next(): CepMatch = { refill(); pending.next() }
        }
      }
  }

  /** The oracled instantiation over the transcript fixtures: maximal runs
    * of >= 2 consecutive clean (user → agent → search-tool) triples — a
    * "user keeps driving the search tool" episode. Symbol alphabet
    * carries the corpus's real variance lanes: garbage user payloads,
    * null-text turns, and the search/calculator tool split.
    */
  val transcriptRules: Seq[(Char, Column)] = Seq(
    'g' -> (col("role") === "user" && col("text").startsWith("garbage")),
    'u' -> (col("role") === "user" && col("text").isNotNull),
    'n' -> col("text").isNull,
    'a' -> (col("role") === "agent"),
    's' -> (col("role") === "tool" && col("tool") === "search"),
    'c' -> (col("role") === "tool"))

  val searchRunPattern: String = "(?:uas){2,}"

  def searchRuns(turns: DataFrame): Dataset[CepMatch] =
    matches(turns, transcriptRules, searchRunPattern)
}
