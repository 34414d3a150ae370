package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHitters, WordCount}

/** Misra-Gries frequent-items sketch: exact regime vs groupBy, MG
  * guarantees under eviction, merge laws, plan shape.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketchTop(words: Seq[String], capacity: Int, parts: Int): Seq[WordCount] = {
    val hh = udaf(HeavyHitters(capacity))
    words.toDF("word").repartition(parts)
      .agg(hh($"word").as("hh"))
      .select(explode($"hh").as("wc"))
      .select($"wc.word", $"wc.count")
      .as[WordCount].collect().toSeq
      .sortBy(wc => (-wc.count, wc.word))
  }

  test("exact regime: capacity above vocabulary reproduces groupBy counts at any parallelism") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .filter(length($"word") > 0).as[String].collect().toSeq
    val exact = words.groupBy(identity).map { case (w, g) => WordCount(w, g.size.toLong) }
      .toSeq.sortBy(wc => (-wc.count, wc.word))
    assert(sketchTop(words, capacity = 1000, parts = 1) == exact)
    assert(sketchTop(words, capacity = 1000, parts = 13) == exact)
  }

  test("eviction regime: items above n/(c+1) survive with bounded undercount") {
    // 1000 hits of 'hot', 200 each of w0..w4, 1 each of 600 rare words
    val words = Seq.fill(1000)("hot") ++
      (0 until 5).flatMap(i => Seq.fill(200)(s"w$i")) ++
      (0 until 600).map(i => s"rare$i")
    val n = words.length // 2600
    val c = 8
    val out = sketchTop(new scala.util.Random(42).shuffle(words), capacity = c, parts = 7)
      .map(wc => wc.word -> wc.count).toMap
    assert(out.size <= c)
    // MG guarantee: true - n/(c+1) <= est <= true; hot (1000 > 2600/9) must survive
    assert(out.contains("hot"), s"hot item evicted: $out")
    assert(out("hot") <= 1000 && out("hot") >= 1000 - n / (c + 1), s"$out")
    out.foreach { case (w, est) =>
      val truth = if (w == "hot") 1000L else if (w.startsWith("w")) 200L else 1L
      assert(est <= truth && est >= truth - n / (c + 1), s"$w: est=$est true=$truth")
    }
  }

  test("kernel: reduce decrements all counters on overflow; merge subtracts the cut") {
    val mg = HeavyHitters(2)
    // fill to capacity, then an unseen key cancels one count everywhere
    val b = Seq("a", "a", "b").foldLeft(mg.zero)(mg.reduce)
    assert(b == Map("a" -> 2L, "b" -> 1L))
    assert(mg.reduce(b, "c") == Map("a" -> 1L)) // b:1-1 and c's own hit vanish
    // merge over capacity: cut = 3rd largest (2) subtracted from all
    val m = mg.merge(Map("a" -> 5L, "b" -> 3L), Map("c" -> 2L))
    assert(m == Map("a" -> 3L, "b" -> 1L))
  }

  test("plans as partial+final ObjectHashAggregate (sketch reduced before the exchange)") {
    val hh = udaf(HeavyHitters(100))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = docs.select(explode(split(lower(trim($"text")), "\\s+")).as("word"))
      .agg(hh($"word").as("hh"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
    assert(!p.contains("SortAggregate"), p.take(1500))
  }
}
