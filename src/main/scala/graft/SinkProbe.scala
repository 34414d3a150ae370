package graft

import org.apache.spark.sql.SparkSession
import graft.fixtures.TranscriptGen

/** Scratch probe: streaming end-to-end throughput through the sink. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val maxFiles = sys.env.getOrElse("SP_MAXFILES", "64").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = "/root/repo/data/tx_bench/transcripts.parquet"
    val rows = spark.read.parquet(corpus).count()
    val outDir = java.nio.file.Files.createTempDirectory("sp_sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("sp_ck").toString
    val cfg = graft.streaming.StreamValidate.Config(
      corpus, outDir, ckDir, withDedup = false, maxFilesPerTrigger = maxFiles,
      availableNow = true)
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamValidate.start(spark, cfg, TranscriptGen.catalog)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[sinkprobe] streaming e2e: $sec%.1f s  ${rows / sec}%.0f turns/s over $rows rows (maxFiles=$maxFiles)")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(outDir)).deleteRecursively()
    new Directory(new java.io.File(ckDir)).deleteRecursively()
    spark.stop()
  }
}
