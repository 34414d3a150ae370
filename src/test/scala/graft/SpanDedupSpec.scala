package graft

import org.apache.spark.sql.functions._
import graft.ops.{SpanDedup, TextMetrics}

/** Exact-substring span profiling: toy-corpus hand checks, a full
  * brute-force re-derivation on the fixture corpus, and the
  * no-Window / left-semi plan shape.
  */
class SpanDedupSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shared 10-word span across two docs is flagged in both") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = SpanDedup.profile(df(
      (1L, s"$span unique one two three"),
      (2L, s"$span other four five six"),
      (3L, "completely different words through the whole document here today")),
      w = 10).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1/2: 14 words -> 5 windows; only the first (the shared span)
    // duplicates — later windows mix in unique tails
    assert(out(1L) == ((5L, 1L, 0.2)))
    assert(out(2L) == ((5L, 1L, 0.2)))
    assert(out(3L)._2 == 0L)
  }

  test("within-doc repetition counts (Lee et al. count both)") {
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val out = SpanDedup.profile(df((1L, s"$run $run")), w = 10)
      .head()
    // 20 words -> 11 windows; windows at pos 1 and pos 11 are both the
    // run itself -> 2 duplicated windows
    assert(out.getLong(1) == 11L)
    assert(out.getLong(2) == 2L)
  }

  test("short documents have zero windows, not a [1,0] sequence artifact") {
    val out = SpanDedup.profile(df((1L, "only nine words in this doc right here now")),
      w = 10).head()
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L && out.getDouble(3) == 0.0)
  }

  test("corpus profile matches a plain-Scala brute-force re-derivation") {
    val w = 10
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => math.floorMod(acc * 31 + c.toInt, TextMetrics.FpMod))
    // Pattern.split with -1 = Spark's split (keeps trailing empties)
    val byDoc = rows.map { case (id, text) =>
      val ws = java.util.regex.Pattern.compile("\\s+")
        .split(text.trim.toLowerCase, -1).toSeq
      val wfps = ws.map(fp)
      val whs =
        if (wfps.length < w) Seq.empty[Long]
        else wfps.sliding(w).map(_.foldLeft(0L)((acc, x) =>
          math.floorMod(acc * 31 + x, TextMetrics.FpMod))).toSeq
      id -> whs
    }.toMap
    val counts = byDoc.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val want = byDoc.map { case (id, whs) =>
      id -> (whs.size.toLong, whs.count(counts(_) >= 2).toLong)
    }
    val got = SpanDedup.profile(docs, w = w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // the fixture corpus plants exact duplicates: some doc must be fully
    // duplicated span-wise
    assert(got.values.exists { case (n, d) => n > 0 && n == d })
  }

  test("plans hash-agg + left_semi, no Window, no cartesian") {
    val q = SpanDedup.profile(docs)
    q.collect()
    val s = flattenPlan(q.queryExecution.executedPlan)
      .map(_.verboseString(5)).mkString("\n")
    assert(!s.contains("Window"), s.take(1500))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"),
      s.take(1500))
    assert(s.contains("LeftSemi"), s.take(1500))
  }
}
