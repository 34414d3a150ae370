package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchExpr
import graft.ops.{Dedup, Similarity}

/** Native sketch kernels must be BIT-identical to the HOF formulations
  * they replace — candidate sets (and therefore the dump-referencing
  * oracles' inputs) depend on the exact hash values.
  */
class SketchExprSpec extends SparkSpec {

  test("minhash_sig bit-identical to the HOF fold on fixture docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val both = sh.select(
      SketchExpr.minhash_sig(col("sh"), 32).as("k"),
      Dedup.minhashSigHof(col("sh"), 32).as("h"))
    assert(both.filter(col("k") =!= col("h")).isEmpty)
    assert(both.count() > 0)
  }

  test("simhash64 bit-identical to the HOF fold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ws = docs.select(array_distinct(split(lower(trim(col("text"))), "\\s+")).as("ws"))
    val both = ws.select(
      SketchExpr.simhash64(col("ws")).as("k"),
      Dedup.simhashHof(col("ws")).as("h"))
    assert(both.filter(col("k") =!= col("h")).isEmpty)
  }

  test("hyperplane_code bit-identical to the HOF fold") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v = emb.select(col("embedding").cast("array<double>").as("v"))
    val both = v.select(
      SketchExpr.hyperplane_code(col("v"), 12).as("k"),
      Similarity.lshCodeHof(col("v"), 12).as("h"))
    assert(both.filter(col("k") =!= col("h")).isEmpty)
  }

  test("word_ngrams (shingles) bit-identical to the HOF chain incl. edge cases") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text")
    // edge cases: empty, whitespace-only, tab-leading (Spark trim strips
    // spaces only, so the split yields a leading "" word), fewer words
    // than n, exact n, repeated grams (distinct must keep first occurrence)
    import spark.implicits._
    val edges = Seq("", "   ", "\tx y z w", "one", "one two", "one two three",
      "a b a b a b a b", "a  b\nc").toDF("text")
    for (df <- Seq(docs, edges); n <- Seq(2, 3, 8)) {
      val both = df.select(
        graft.ops.Dedup.shingles(col("text"), n).as("k"),
        graft.ops.Dedup.shinglesHof(col("text"), n).as("h"))
      assert(both.filter(col("k") =!= col("h")).isEmpty, s"n=$n")
    }
    // non-distinct variant (repetition signals)
    val bothDup = edges.select(
      graft.functions.SketchExpr.word_ngrams(
        split(lower(trim(col("text"))), "\\s+"), 2, distinct = false).as("k"),
      graft.ops.TextMetrics.ngramsHof(col("text"), 2).as("h"))
    assert(bothDup.filter(col("k") =!= col("h")).isEmpty)
  }

  test("char_fp bit-identical to the ascii-fold HOF") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    import spark.implicits._
    val edges = Seq("", " ", "a", "Zz 09!", "\t\n").toDF("text")
    for (df <- Seq(docs, edges)) {
      val both = df.select(
        graft.ops.TextMetrics.charFp(col("text")).as("k"),
        graft.ops.TextMetrics.charFpHof(col("text")).as("h"))
      assert(both.filter(col("k") =!= col("h")).isEmpty)
    }
  }

  test("span_window_hashes bit-identical to the HOF chain") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    import spark.implicits._
    val edges = Seq("", "one two", "one two three four five six seven eight nine ten eleven")
      .toDF("text")
    for (df <- Seq(docs, edges); w <- Seq(2, 10)) {
      val both = df.select(
        graft.ops.SpanDedup.windowHashes(col("text"), w).as("k"),
        graft.ops.SpanDedup.windowHashesHof(col("text"), w).as("h"))
      assert(both.filter(col("k") =!= col("h")).isEmpty, s"w=$w")
    }
  }

  test("sketch expressions stay inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(SketchExpr.simhash64(split(col("text"), "\\s+")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(600))
  }
}
