package graft

import org.apache.spark.sql.functions._
import graft.ops.GopherRules

/** Gopher ruleset: each rule tripped by a purpose-built toy doc, corpus
  * sanity, and the narrow-plan discipline.
  */
class GopherRulesSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def flagsOf(text: String): Map[String, Any] = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = GopherRules.flags(df, minWords = 5, maxWords = 100).head()
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  private val good =
    "the quick brown fox jumps over the lazy dog and that dog waits with calm to be sure of it"

  test("a clean document passes every rule") {
    val f = flagsOf(good)
    assert(f("keep") == true, f.toString)
  }

  test("each rule is individually trippable") {
    // too few words
    assert(flagsOf("the cat")("ok_word_count") == false)
    // mean word length out of [3,10]
    assert(flagsOf("a b c d e f g h")("ok_mean_word_len") == false)
    // symbol-heavy: many # per word
    assert(flagsOf("the # be # to # of # and # that # have # with #")(
      "ok_symbol_ratio") == false)
    // bullet lines > 90%
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(flagsOf(bullets)("ok_bullet_lines") == false)
    // ellipsis line endings > 30%
    val ell = (1 to 10).map(i => s"line $i goes on...").mkString("\n")
    assert(flagsOf(ell)("ok_ellipsis_lines") == false)
    // mostly non-alphabetic words
    assert(flagsOf("1 2 3 4 5 6 7 8 9 10 the of")("ok_alpha_words") == false)
    // fewer than 2 required stopwords
    assert(flagsOf("lorem ipsum dolor sit amet consectetur adipiscing elit")(
      "ok_stopwords") == false)
  }

  test("ellipsis counting is replace-based: '....' counts one triple") {
    val f = flagsOf("word one....\nword two\nword three\nword four")
    // one of four lines ends with '...' (after the replace-count the rtrim
    // check still sees the dot tail) — 25% <= 30%
    assert(f("ok_ellipsis_lines") == true)
  }

  test("corpus run: one row per doc, keep == conjunction of flags") {
    val out = GopherRules.flags(docs)
    assert(out.count() == docs.count())
    val bad = out.filter(col("keep") =!=
      (col("ok_word_count") && col("ok_mean_word_len") && col("ok_symbol_ratio")
        && col("ok_bullet_lines") && col("ok_ellipsis_lines")
        && col("ok_alpha_words") && col("ok_stopwords")))
    assert(bad.count() == 0)
  }

  test("ruleset plans zero Exchange (narrow projection)") {
    val s = GopherRules.flags(docs).queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s.take(1200))
  }
}
