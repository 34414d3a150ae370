package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.validate.ValidationPipeline

/** Child-JVM scaling worker, EXECUTOR realization: one `local-cluster`
  * standalone master + `workers` worker JVMs of `coresPer` cores each —
  * real separate executor processes with private heaps and GC, the
  * closest sandbox form of the north rule's "spark-submit at N and 4N
  * executors". (Thread-based local[N] scaling couples the phases through
  * one JVM's allocator and the chip's shared LLC/memory bandwidth — a
  * real cluster adds private bandwidth with every executor, which
  * separate JVMs at ≤half the box model far more faithfully.)
  *
  * Runs the production hot path (`decideFast` — the formulation the
  * streaming engine executes) and prints one line:
  * `GRAFT_SCALING <workers> <rows> fast=<s1,s2,…>`
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
      .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "90s")
      .config("spark.sql.shuffle.partitions", (workers * coresPer).toString)
      .config("spark.sql.files.maxPartitionBytes", (24 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = spark.read.parquet(corpus)
    val rows = turns.count()
    def run() = ValidationPipeline.decideFast(spark, turns, TranscriptGen.catalog).toDF()
      .select((xxhash64(col("decision"), col("reason"), col("uuid"), col("conv_id"))
        % 1000000007L).as("h")).agg(sum(col("h"))).head().getLong(0)
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    run() // warmup (executor JIT + page cache)
    val fast = Seq.fill(samples)(timeIt(run()))
    println(s"GRAFT_SCALING $workers $rows fast=${fast.mkString(",")}")
    spark.stop()
  }
}
