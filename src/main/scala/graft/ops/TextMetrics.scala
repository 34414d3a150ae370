package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, token counting, stopword-profile language ID and a
  * polynomial rolling-hash document fingerprint.
  *
  * All four are pure Catalyst column expressions (no UDFs): whole-stage
  * codegen end-to-end, narrow (zero shuffle), and therefore embarrassingly
  * parallel at 100 TB — the scan is the only cost. Each has an exact
  * DuckDB oracle (same arithmetic, same evaluation order, so doubles are
  * bit-identical).
  */
object TextMetrics {

  /** Stopword profiles for language ID. Deliberately tiny and fixed: the
    * operator contract is "deterministic stopword-hit argmax", not a
    * state-of-the-art classifier (those need model files; the profile list
    * is swappable).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "en", "que", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "vous", "ce", "une"))

  private def words(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Per-document quality metrics + a composite score in [0,1]. */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nWords = size(ws).cast("double")
    val nChars = length(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[!-/:-@\\[-`{-~]", "")))
      .cast("double")
    val stopHits = size(filter(ws, w => w.isin(stopwords.flatMap(_._2): _*)))
      .cast("double")
    val meanWordLen = (length(regexp_replace(t, "\\s+", "")).cast("double") / nWords)
    docs.select(col("doc_id"),
      nChars.as("n_chars_text"),
      nWords.as("n_words"),
      (punct / nChars).as("punct_ratio"),
      (stopHits / nWords).as("stopword_ratio"),
      meanWordLen.as("mean_word_len"),
      // composite: long enough, not punctuation-heavy, some stopwords,
      // plausible word lengths — each term in [0,1], same order both engines
      (least(nWords / lit(50.0), lit(1.0)) * lit(0.4)
        + (lit(1.0) - least(punct / nChars * lit(5.0), lit(1.0))) * lit(0.2)
        + least(stopHits / nWords * lit(5.0), lit(1.0)) * lit(0.2)
        + when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.0)) * lit(0.2)
      ).as("quality_score"))
  }

  /** Whitespace tokens + a BPE-ish regex token count (letter runs, single
    * digits, single punctuation — the shape of byte-pair pre-tokenizers).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      size(words(col(textCol))).as("ws_tokens"),
      regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
        .as("bpe_ish_tokens"))

  /** [[langId]]'s prediction as a single composable Column — the form the
    * streaming curation gate uses inline (same arithmetic, same tiebreak;
    * the repeated `words` split collapses to one evaluation under CSE).
    */
  def langPred(text: Column): Column = {
    val ws = words(text)
    stopwords.foldLeft((lit(""), lit(-1))) { case ((bl, bh), (lang, sw)) =>
      val h = size(filter(ws, w => w.isin(sw: _*)))
      (when(h > bh, lit(lang)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }._1
  }

  /** Whitespace token count as a composable Column (= `ws_tokens`). */
  def wsTokens(text: Column): Column = size(words(text))

  /** Stopword-hit language ID: argmax of per-language hit counts, ties
    * broken by language code order (deterministic).
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val hitCols = stopwords.map { case (lang, sw) =>
      size(filter(ws, w => w.isin(sw: _*))).as(s"hits_$lang")
    }
    val withHits = docs.select(col("doc_id") +: hitCols: _*)
    val best = stopwords.map(_._1).foldLeft((lit(""), lit(-1))) {
      case ((bl, bh), lang) =>
        val h = col(s"hits_$lang")
        (when(h > bh, lit(lang)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    withHits.withColumn("lang_pred", best._1)
  }

  val FpMod = 72057594037927931L // < 2^56: acc*31 + 255 never overflows Long

  /** Polynomial rolling-hash fingerprint over the character stream of the
    * whitespace-normalized text: acc = (acc*31 + ascii(c)) mod FpMod.
    * Order-sensitive (a true rolling hash), pure Catalyst `aggregate` HOF.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    docs.select(col("doc_id"),
      aggregate(
        transform(split(norm, ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, c) => pmod(acc * 31 + c, lit(FpMod))).as("fingerprint"))
  }
}
