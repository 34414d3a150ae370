package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.validate.ValidationPipeline

/** Child-JVM scaling worker: runs ONE parallelism level in a fresh JVM so
  * GC threading, JIT state and heap shape are sized for that level
  * (in-process back-to-back sessions let the 8-core phase borrow 32-core
  * GC threads, skewing the ratio). Spawned by [[Bench]]; prints one line:
  * `GRAFT_SCALING <cpus> <rows> dec=<s1,s2,…> fast=<f1,…>`
  * (every sample, seconds — the parent computes min/median and pairs
  * time-adjacent children so a host CPU-steal spike is visible in the
  * record instead of silently poisoning the ratio).
  *
  * args: cpus corpusPath decSamples fastSamples
  */
object ScalingChild {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpus = args(1)
    val decSamples = args(2).toInt
    val fastSamples = args(3).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (24 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = spark.read.parquet(corpus)
    val rows = turns.count()
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.select((xxhash64(col("decision"), col("reason"), col("uuid"), col("conv_id"))
          % 1000000007L).as("h")).agg(sum(col("h"))).head().getLong(0)
    def run() = force(ValidationPipeline.decide(spark, turns, TranscriptGen.catalog).toDF())
    def runFast() = force(ValidationPipeline.decideFast(spark, turns, TranscriptGen.catalog).toDF())
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    run() // warmup (JIT + page cache)
    val dec = Seq.fill(decSamples)(timeIt(run()))
    runFast()
    val fast = Seq.fill(fastSamples)(timeIt(runFast()))
    println(s"GRAFT_SCALING $cpus $rows dec=${dec.mkString(",")} fast=${fast.mkString(",")}")
    spark.stop()
  }
}
