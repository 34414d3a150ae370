package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Scratch scaling probe: isolates pipeline stages to find the scaling
  * wall. Not part of the driver contract.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (24 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val turns = spark.read.parquet("/root/repo/data/tx_bench/transcripts.parquet")
    val n = turns.count()

    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-22s $s%8.2f s  ${n / s / 1e6}%6.2f M rows/s")
    }

    time("scan_only") {
      turns.select(count(col("text"))).head()
    }
    time("tidy_hash") {
      turns.select(sum(xxhash64(regexp_replace(col("text"), "Adamm", "Adam")) % 1000L)).head()
    }
    time("from_json") {
      turns.select(sum(xxhash64(from_json(col("text"), Schemas.envelope)) % 1000L)).head()
    }
    time("deserialize_map") {
      turns.withColumn("msg", from_json(col("text"), Schemas.envelope))
        .as[graft.model.ParsedTurn]
        .map(t => if (t.msg == null) 0 else 1).select(sum(col("value"))).head()
    }
    time("full_decide") {
      val d = graft.validate.ValidationPipeline
        .decide(spark, turns, graft.fixtures.TranscriptGen.catalog).toDF()
      d.select(sum(xxhash64(col("decision"), col("reason")) % 1000L)).head()
    }
    time("full_decide_fast") {
      val d = graft.validate.ValidationPipeline
        .decideFast(spark, turns, graft.fixtures.TranscriptGen.catalog).toDF()
      d.select(sum(xxhash64(col("decision"), col("reason")) % 1000L)).head()
    }
    spark.stop()
  }
}
