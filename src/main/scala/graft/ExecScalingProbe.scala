package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.validate.ValidationPipeline

/** Scratch probe: executor-count scaling via `local-cluster[n, cores, mem]`
  * — real separate executor JVMs (own heap + GC), the honest sandbox form
  * of the north rule's "N and 4N executors".
  */
object ExecScalingProbe {
  def session(workers: Int, coresPer: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPer,8192]")
      .appName(s"graft-exec-$workers")
      .config("spark.executor.memory", "7g")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "90s")
      .config("spark.sql.shuffle.partitions", (workers * coresPer).toString)
      .config("spark.sql.files.maxPartitionBytes", (24 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val corpus = "/root/repo/data/tx_bench_33600000/transcripts.parquet"
    Seq(1, 4).foreach { w =>
      val spark = session(w, 8)
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val turns = spark.read.parquet(corpus)
        val n = turns.count()
        def run() = ValidationPipeline
          .decideFast(spark, turns, graft.fixtures.TranscriptGen.catalog).toDF()
          .select((xxhash64(col("decision"), col("reason")) % 1000000007L).as("h"))
          .agg(sum(col("h"))).head().getLong(0)
        run() // warmup
        val samples = Seq.fill(3)({
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }).sorted
        println(f"[exec-probe] workers=$w cores=8 rows=$n samples=${samples.mkString(",")} min=${samples.head}%.2f s tps=${n / samples.head}%.0f")
      } finally spark.stop()
    }
  }
}
