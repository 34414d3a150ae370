package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch ANN probe: generates the clustered bench embedding corpus and
  * times brute vs IVF + recall@10 in isolation (Bench phase 4 without the
  * 15-minute scaling phase). Not part of the driver contract.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val annN = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "100000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val embDir = s"/root/repo/data/emb_bench_$annN"
    if (!new java.io.File(s"$embDir/_GRAFT_READY").exists()) {
      def u(seed: Column, d: Column): Column =
        (pmod(xxhash64(seed, d), lit(2001)) - 1000).cast("double") / 1000.0
      spark.range(annN).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => u(concat(lit("c"), pmod(col("id"), lit(256))), d) +
              u(col("id"), d) * 0.25).cast("array<float>").as("embedding"))
        .repartition(32).write.mode("overwrite").parquet(s"$embDir/embeddings.parquet")
      new java.io.File(embDir, "_GRAFT_READY").createNewFile()
    }
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
    val bruteOut = graft.ops.Similarity.bruteTopK(emb, k = 10, stride = 200)
    val nlist = sys.env.getOrElse("SPARK_GRAFT_ANN_NLIST", "64").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_ANN_NPROBE", "8").toInt
    val ivfOut = graft.ops.Similarity.ivfTopK(emb, k = 10, stride = 200,
      nlist = nlist, nprobe = nprobe)
    val bSec = timeIt(bruteOut.count())
    val iSec = timeIt(ivfOut.count())
    val hits = ivfOut.select("q_id", "vec_id")
      .join(bruteOut.select("q_id", "vec_id"), Seq("q_id", "vec_id")).count()
    val recall = hits.toDouble / (annN.toLong / 200 * 10)
    println(f"[ann-probe] n=$annN brute $bSec%.2f s, ivf $iSec%.2f s, recall@10 $recall%.3f")
    spark.stop()
  }
}
