package graft

import org.apache.spark.sql.functions._
import graft.ops.LangModel

/** Corpus-trained trigram naive-Bayes language ID: hand-checked model
  * values, learned-signal accuracy, determinism across partitionings.
  */
class LangModelSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("model log-probabilities match the hand computation on a toy corpus") {
    import spark.implicits._
    val toy = Seq(
      (1L, "aa", "aaaa"), // trigrams: aaa, aaa
      (2L, "bb", "abab")  // trigrams: aba, bab
    ).toDF("doc_id", "lang", "text")
    val m = LangModel.train(spark, toy)
    assert(m.langs == Seq("aa", "bb"))
    // vocab = {aaa, aba, bab} → V=3; totals: aa=2, bb=2
    assert(m.logp(("aa", "aaa")) === math.log((2 + 1.0) / (2 + 3)))
    assert(m.logp(("bb", "aba")) === math.log((1 + 1.0) / (2 + 3)))
    assert(m.unseen("aa") === math.log(1.0 / (2 + 3)))
    // classification: "aaa" scores ln(3/5) for aa vs ln(1/5) unseen for bb
    val out = LangModel.classify(spark, toy, m)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) == "aa" && out(2L) == "bb")
  }

  test("self-classification learns real signal on the documents corpus") {
    import spark.implicits._
    val out = LangModel.langIdTrained(spark, docs)
    val n = out.count()
    assert(n == docs.count())
    val acc = out.filter(col("lang") === col("lang_pred")).count().toDouble / n
    val nLangs = docs.select("lang").distinct().count()
    // the synthetic corpus shares every word across languages (labels are
    // frequency mixes only), so the ceiling is low — but a trained model
    // must beat random by a wide margin
    assert(acc > 2.0 / nLangs, s"accuracy $acc vs random ${1.0 / nLangs}")
  }

  test("model save/load roundtrip: identical model, identical predictions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nb_model").toString
    val model = graft.ops.LangModel.train(spark, docs)
    graft.ops.LangModel.save(spark, model, dir)
    val loaded = graft.ops.LangModel.load(spark, dir)
    assert(loaded == model)
    val a = graft.ops.LangModel.classify(spark, docs, model).collect().map(_.toSeq).toSet
    val b = graft.ops.LangModel.classify(spark, docs, loaded).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("training and classification are deterministic across partitionings") {
    import spark.implicits._
    def run(d: org.apache.spark.sql.DataFrame) =
      LangModel.langIdTrained(spark, d)
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(17)))
  }
}
