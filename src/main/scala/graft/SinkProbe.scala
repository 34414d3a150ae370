package graft

import org.apache.spark.sql.SparkSession
import graft.fixtures.TranscriptGen

/** Scratch probe: streaming e2e with the conv_id-keyed dedup state ON. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = "/root/repo/data/tx_bench_16800000_f256/transcripts.parquet"
    val rows = spark.read.parquet(corpus).count()
    val outDir = java.nio.file.Files.createTempDirectory("sp_sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("sp_ck").toString
    val cfg = graft.streaming.StreamValidate.Config(
      corpus, outDir, ckDir, withDedup = true, maxFilesPerTrigger = 64,
      availableNow = true)
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamValidate.start(spark, cfg, TranscriptGen.catalog)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[sinkprobe] stateful streaming e2e: $sec%.1f s  ${rows / sec}%.0f turns/s over $rows rows")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(outDir)).deleteRecursively()
    new Directory(new java.io.File(ckDir)).deleteRecursively()
    spark.stop()
  }
}
