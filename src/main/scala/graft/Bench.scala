package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.validate.ValidationPipeline

/** Benchmark entrypoint (driver contract): prints ONE JSON line.
  *
  * Two parts:
  *  1. SCALING (the north-rule criterion, sandbox form): the fused
  *     validation job over an identical pre-generated transcript corpus at
  *     local[8] and local[32]; reports turns/sec at both and efficiency
  *     (tps32/tps8)/4. The pipeline is shuffle-free, so this measures real
  *     per-core scaling, not shuffle luck.
  *  2. HEADLINE: per-query wall seconds for every SparkEntry query at
  *     SPARK_GRAFT_CPUS over SPARK_GRAFT_SF_DIR.
  *
  * The primary metric (`value`) is validated turns/sec at the larger
  * parallelism — BASELINE.json's metric.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // finer input splits: ~4+ task waves per core count so stragglers
      // and wave quantization don't masquerade as poor scaling
      .config("spark.sql.files.maxPartitionBytes", (24 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Force full evaluation of the decision stream (hash-sum every output
    * column group so nothing is prunable).
    */
  private def forceDecisions(df: DataFrame): Long =
    df.select((xxhash64(col("decision"), col("reason"), col("uuid"), col("conv_id"))
        % 1000000007L).as("h")) // bounded summands: no ANSI overflow
      .agg(sum(col("h"))).head().getLong(0)

  private def timeIt[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Sized so the timed job runs ~10s+ at local[32]: short jobs measure
    // scheduler overhead, not scaling (first attempt at 1.5M rows ran 1.7s
    // and reported efficiency 0.30 on pure overhead).
    val benchTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "16000000").toLong
    val benchDir = "/root/repo/data/tx_bench"

    // ---- phase 1: scaling evidence on an identical corpus ----------------
    val convs = benchTurns / 10
    val scaling = Seq(8, cpus).distinct.map { c =>
      System.err.println(s"[bench] scaling phase: local[$c]")
      val spark = session(c)
      spark.sparkContext.setLogLevel("ERROR")
      try {
        if (!new java.io.File(s"$benchDir/_GRAFT_READY").exists()) {
          TranscriptGen.turnsDs(spark, convs, 10, convs / 2)
            .repartition(64).write.mode("overwrite").parquet(s"$benchDir/transcripts.parquet")
          new java.io.File(benchDir, "_GRAFT_READY").createNewFile()
        }
        val turns = spark.read.parquet(s"$benchDir/transcripts.parquet")
        def run() = forceDecisions(
          ValidationPipeline.decide(spark, turns, TranscriptGen.catalog).toDF())
        val rows = turns.count()
        System.err.println(s"[bench] local[$c]: $rows rows, warmup...")
        run() // warmup (JIT + code cache)
        // median of 3: the host is shared and shows transient multi-second
        // CPU-steal spikes; a single sample can be 2x off either way
        val samples = Seq.fill(3)(timeIt(run())).sorted
        val sec = samples(1)
        System.err.println(s"[bench] local[$c]: timed runs ${samples.mkString(", ")} -> median $sec s (${rows / sec} turns/s)")
        (c, rows, rows / sec, sec)
      } finally spark.stop()
    }
    val tpsByC = scaling.map(s => s._1 -> s._3).toMap
    val tpsLow = tpsByC(8)
    val tpsHigh = tpsByC(cpus)
    val eff = if (cpus == 8) 1.0 else (tpsHigh / tpsLow) / (cpus / 8.0)

    // ---- phase 2: headline per-query timings at `cpus` -------------------
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.err.println(s"[bench] query: $name")
      val sec = try timeIt(fn(spark, sfDir).count())
      catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); -1.0 }
      System.err.println(f"[bench] query: $name done")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val scalingJson = scaling.map { case (c, rows, tps, sec) =>
      s""""local_$c":{"rows":$rows,"sec":$sec,"turns_per_sec":$tps}"""
    }.mkString("{", ",", s""","efficiency":$eff}""")
    println(
      s"""{"metric":"validated_turns_per_sec","value":$tpsHigh,"unit":"turns/sec","queries":$qs,"sf":"$sfDir","total_query_sec":$total,"scaling":$scalingJson,"headline_cpus":$cpus}""")
    spark.stop()
  }
}
