package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", Table A1) — the rule-based pre-filter
  * every web-scale curation pipeline runs before any learned filter.
  * Distinct from [[TextMetrics.quality]] (a composite score): this is the
  * published RULESET — each rule a named boolean flag plus the conjunctive
  * keep decision, so a pipeline can audit WHICH rule rejected a document.
  *
  * Scale shape: one codegen'd projection — zero shuffle, zero state; the
  * scan is the only cost at 100 TB. Counting uses replace-subtraction and
  * array HOFs (never engine-specific regex counting), so every flag is
  * integer-exact and the DuckDB oracle matches bit-for-bit.
  */
object GopherRules {

  /** Stopwords Gopher requires at least two of (Table A1's "must contain
    * at least 2 of ..." rule; same published list).
    */
  val requiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Substring occurrence count via replace-subtraction — identical
    * non-overlapping left-to-right semantics in Spark and DuckDB, unlike
    * regex counting.
    */
  private def occurrences(t: Column, sub: String): Column =
    ((length(t) - length(replace(t, lit(sub), lit("")))) / lit(sub.length))
      .cast("long")

  /** Per-document rule flags + keep. Bounds are Gopher's published
    * values; `minWords` is lowered from 50 via the parameter for corpora
    * of short documents, and `stopwords` swaps the required list for a
    * corpus-appropriate one (Gopher's own list assumes full English prose;
    * `Curation.curate2` passes the corpus's langId profile instead).
    */
  def flags(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = requiredStopwords): DataFrame = {
    val fs = flagCols(col(textCol), minWords, maxWords, stopwords)
    docs.select(col("doc_id") +:
        fs.map { case (name, c) => c.as(name) }: _*)
      .withColumn("keep", fs.tail.map(f => col(f._1)).reduce(_ && _))
  }

  /** The whole ruleset as a single composable boolean Column — the form
    * the streaming quality gate applies inline.
    */
  def keepCol(t: Column, minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = requiredStopwords): Column =
    flagCols(t, minWords, maxWords, stopwords).tail.map(_._2).reduce(_ && _)

  /** (name, expr) per emitted column; head is `n_words`, the rest are the
    * boolean rules whose conjunction is `keep`.
    */
  private def flagCols(t: Column, minWords: Int, maxWords: Int,
      stopwords: Seq[String]): Seq[(String, Column)] = {
    val lower_t = lower(trim(t))
    val ws = split(lower_t, "\\s+")
    val nWords = size(ws).cast("long")
    val nWordsSafe = greatest(nWords, lit(1L)).cast("double")
    val meanWordLen =
      length(regexp_replace(lower_t, "\\s+", "")).cast("double") / nWordsSafe
    val symbols = occurrences(t, "#") + occurrences(t, "...")
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletStarts = size(filter(lines, l => {
      val lt = ltrim(l)
      lt.startsWith("- ") || lt.startsWith("* ") || lt.startsWith("•")
    }))
    val ellipsisEnds = size(filter(lines, l => rtrim(l).endsWith("...")))
    val alphaWords = size(filter(ws, w => w.rlike("[a-z]")))
    // distinct-intersect, not filter-with-ws-in-the-lambda-body: keeps the
    // split CSE-shareable (the repo's HOF discipline) and counts each
    // required stopword once
    val stopHits = size(array_intersect(
      array_distinct(ws), typedLit(stopwords)))
    Seq(
      "n_words" -> nWords,
      "ok_word_count" -> nWords.between(minWords, maxWords),
      "ok_mean_word_len" -> meanWordLen.between(3.0, 10.0),
      "ok_symbol_ratio" -> (symbols.cast("double") / nWordsSafe <= 0.1),
      "ok_bullet_lines" -> (bulletStarts.cast("double") / nLines <= 0.9),
      "ok_ellipsis_lines" -> (ellipsisEnds.cast("double") / nLines <= 0.3),
      "ok_alpha_words" -> (alphaWords.cast("double") / nWordsSafe >= 0.8),
      "ok_stopwords" -> (stopHits >= 2))
  }
}
