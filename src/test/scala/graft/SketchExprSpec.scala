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

  test("sketch expressions stay inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(SketchExpr.simhash64(split(col("text"), "\\s+")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(600))
  }
}
