package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.validate.ValidationPipeline

/** Scratch probe: executor-count scaling via `local-cluster[n, cores, mem]`
  * — real separate executor JVMs (own heap + GC), the honest sandbox form
  * of the north rule's "N and 4N executors".
  * args: coresPerExec [samples] [workerList csv]
  */
object ExecScalingProbe {
  def session(workers: Int, coresPer: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPer,6144]")
      .appName(s"graft-exec-$workers")
      .config("spark.executor.memory", "5g")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC -XX:ActiveProcessorCount=" + coresPer)
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "90s")
      .config("spark.sql.shuffle.partitions", (workers * coresPer).toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val coresPer = if (args.length > 0) args(0).toInt else 4
    val samples = if (args.length > 1) args(1).toInt else 3
    val workersList = if (args.length > 2) args(2).split(",").toSeq.map(_.toInt) else Seq(1, 4)
    val corpus = "/root/repo/data/tx_bench_33600000_f256/transcripts.parquet"
    workersList.foreach { w =>
      val spark = session(w, coresPer)
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val turns = spark.read.parquet(corpus)
        val n = turns.count()
        def runFast() = ValidationPipeline
          .decideFast(spark, turns, graft.fixtures.TranscriptGen.catalog).toDF()
          .select((xxhash64(col("decision"), col("reason")) % 1000000007L).as("h"))
          .agg(sum(col("h"))).head().getLong(0)
        def runDec() = ValidationPipeline
          .decide(spark, turns, graft.fixtures.TranscriptGen.catalog).toDF()
          .select((xxhash64(col("decision"), col("reason")) % 1000000007L).as("h"))
          .agg(sum(col("h"))).head().getLong(0)
        runDec()
        val dec = Seq.fill(samples)({
          val t0 = System.nanoTime(); runDec(); (System.nanoTime() - t0) / 1e9
        }).sorted
        runFast()
        val fast = Seq.fill(samples)({
          val t0 = System.nanoTime(); runFast(); (System.nanoTime() - t0) / 1e9
        }).sorted
        println(f"[exec-probe] workers=$w cores=$coresPer rows=$n " +
          f"dec=${dec.mkString(",")} decTps=${n / dec.head}%.0f " +
          f"fast=${fast.mkString(",")} fastTps=${n / fast.head}%.0f")
      } finally spark.stop()
    }
  }
}
