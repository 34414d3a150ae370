package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.validate.ValidationPipeline

/** Child-JVM scaling worker, EXECUTOR realization: one `local-cluster`
  * standalone master + `workers` worker JVMs of `coresPer` cores each —
  * real separate executor processes with private heaps and GC, the
  * closest sandbox form of the north rule's "spark-submit at N and 4N
  * executors". Each executor JVM is pinned to its nominal core budget
  * (`-XX:ActiveProcessorCount=coresPer`), exactly like a 4-core container
  * on a real cluster — unpinned, a lone executor borrows the whole box's
  * GC/JIT threading and inflates the 1-executor baseline ~15%, while four
  * unpinned executors oversubscribe it (4×32 GC threads on 32 cores) and
  * lose ~20% at the top. (Thread-based local[N] scaling is worse still:
  * both phases couple through one JVM allocator and the chip's shared
  * LLC/bandwidth.)
  *
  * Runs BOTH formulations — `decide` (the Catalyst-idiomatic primary
  * path: from_json + typed evaluation, CPU-bound) and `decideFast` (the
  * one-pass streaming-Jackson hot path, memory-bandwidth-heavy) — and
  * prints one line:
  * `GRAFT_SCALING <workers> <rows> dec=<s1,…> fast=<s1,…>`
  *
  * args: workers coresPer corpusPath samples
  * env (set by the parent): SPARK_HOME, SPARK_SCALA_VERSION — the
  * standalone worker's executor launcher needs both.
  */
object ClusterScalingChild {
  def main(args: Array[String]): Unit = {
    val workers = args(0).toInt
    val coresPer = args(1).toInt
    val corpus = args(2)
    val samples = args(3).toInt
    val spark = SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPer,6144]")
      .appName(s"graft-exec-scaling-$workers")
      .config("spark.executor.memory", "5g")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions",
        s"-XX:+UseParallelGC -XX:ActiveProcessorCount=$coresPer")
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "90s")
      .config("spark.sql.shuffle.partitions", (workers * coresPer).toString)
      // one task per corpus file (files are single-row-group ~5.5 MB):
      // fine waves at every executor count, no quantization tax
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = spark.read.parquet(corpus)
    val rows = turns.count()
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.select((xxhash64(col("decision"), col("reason"), col("uuid"), col("conv_id"))
        % 1000000007L).as("h")).agg(sum(col("h"))).head().getLong(0)
    def runDec() = force(ValidationPipeline.decide(spark, turns, TranscriptGen.catalog).toDF())
    def runFast() = force(ValidationPipeline.decideFast(spark, turns, TranscriptGen.catalog).toDF())
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    runDec() // warmup (executor JIT + page cache)
    val dec = Seq.fill(samples)(timeIt(runDec()))
    runFast()
    val fast = Seq.fill(samples)(timeIt(runFast()))
    println(s"GRAFT_SCALING $workers $rows dec=${dec.mkString(",")} fast=${fast.mkString(",")}")
    spark.stop()
  }
}
