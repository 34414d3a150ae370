package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Corpus-trained BPE tokenizer: training on hand-checked histograms,
  * encode/train replay consistency, the tokens-cover-text invariant, and
  * distributed/driver agreement.
  */
class BpeSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("training follows the classic merge order on a hand-checked histogram") {
    // {"ab": 3, "abc": 1}: pair counts (a,b)=4, (b,</w>)=3, (b,c)=1,
    // (c,</w>)=1 → merge 1 = (a,b); then (ab,</w>)=3 beats (ab,c)=1 →
    // merge 2 = (ab,</w>); then ("ab","c") and ("c","</w>") tie at 1 and
    // the deterministic greatest-pair rule picks ("c","</w>").
    val merges = Bpe.trainFromCounts(Seq("ab" -> 3L, "abc" -> 1L), numMerges = 3)
    assert(merges == Seq(("a", "b"), ("ab", "</w>"), ("c", "</w>")))
  }

  test("training stops when no pairs remain (fully merged vocabulary)") {
    val merges = Bpe.trainFromCounts(Seq("aa" -> 1L), numMerges = 100)
    // a a </w> → (a,a) or (a,</w>) tie at 1 → greatest pair (a,</w>)
    // first; then (a,a</w>); then the word is one symbol — training stops.
    assert(merges.length < 100)
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("aa", ranks) == Seq("aa</w>"))
  }

  test("encode replays training: training words segment to their merged forms") {
    val counts = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainFromCounts(counts, numMerges = 10)
    val ranks = merges.zipWithIndex.toMap
    counts.foreach { case (w, _) =>
      val toks = Bpe.encodeWord(w, ranks)
      // roundtrip: concatenated tokens reconstruct word + end marker
      assert(toks.mkString == w + Bpe.EndOfWord, s"$w → $toks")
    }
    // a frequent training word ends fully merged into few tokens
    assert(Bpe.encodeWord("newest", ranks).length <= 2)
  }

  test("more merges never increase a word's token count") {
    val counts = Seq("alpha" -> 4L, "alphabet" -> 2L, "bet" -> 7L)
    val m20 = Bpe.trainFromCounts(counts, 20)
    (0 to m20.length).sliding(2).foreach { case Seq(a, b) =>
      val ra = m20.take(a).zipWithIndex.toMap
      val rb = m20.take(b).zipWithIndex.toMap
      Seq("alpha", "alphabet", "bet", "alpine").foreach { w =>
        assert(Bpe.encodeWord(w, rb).length <= Bpe.encodeWord(w, ra).length)
      }
    }
  }

  test("distributed tokenCounts == driver encodeWord over the documents corpus") {
    import spark.implicits._
    val merges = Bpe.train(docs, numMerges = 100, maxWords = 10000)
    assert(merges.length == 100)
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.tokenCounts(spark, docs, merges)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      val ws = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val toks = ws.map(w => Bpe.encodeWord(w, ranks))
      val want = (ws.length.toLong, toks.map(_.length.toLong).sum,
        toks.map(_.map(_.length).sum.toLong).sum)
      assert(got(id) == want, s"doc $id")
      // cover-text invariant, independently: token chars == word chars + 4/word
      assert(want._3 == ws.map(_.length).sum + 4L * ws.length)
    }
    // real BPE compresses: far fewer tokens than characters, more than words
    val (w, t, c) = got.values.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    assert(t >= w && t < c)
  }

  test("merge table save/load roundtrip preserves order and tokenization") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_model").toString
    val merges = graft.ops.Bpe.train(docs, numMerges = 50, maxWords = 5000)
    graft.ops.Bpe.saveMerges(spark, merges, dir)
    val loaded = graft.ops.Bpe.loadMerges(spark, dir)
    assert(loaded == merges) // ORDER is the model
    val a = graft.ops.Bpe.tokenCounts(spark, docs, merges).collect().map(_.toSeq).toSet
    val b = graft.ops.Bpe.tokenCounts(spark, docs, loaded).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("training is deterministic and word-histogram order-independent") {
    val m1 = Bpe.train(docs, numMerges = 50, maxWords = 5000)
    val m2 = Bpe.train(docs.repartition(13), numMerges = 50, maxWords = 5000)
    assert(m1 == m2)
  }
}
