package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.validate.ValidationPipeline

/** Exactly-once three-way sink for `foreachBatch`.
  *
  * The reference emits to `valid_data` / `blacklists` / `webdata` via three
  * independent producers with NO transactional coupling — a blacklist send
  * failure is even swallowed (TopologyProducer.java:286-290); the north rule
  * upgrades this to exactly-once. Protocol (the Iceberg-append contract
  * rebuilt on plain parquet, SURVEY.md §7.6 — in prod these four writes
  * become Iceberg appends with the same batchId manifest):
  *
  *  1. each output kind writes to `kind/batch_id=<id>/` (Hive-style
  *     partition dir, so readers get `batch_id` for free) with
  *     mode=overwrite → a torn write is repaired by the replay;
  *  2. after ALL kinds land, a `_commits/<id>` marker is moved into place
  *     atomically; a replayed batch (post-restart) sees the marker and
  *     SKIPS — idempotent under Spark's at-least-once foreachBatch;
  *  3. readers consult the manifest and ignore uncommitted partitions.
  *
  * At cluster scale the marker dir lives on the same object store as the
  * table; one tiny file per micro-batch.
  */
final class ExactlyOnceSink(outDir: String) extends Serializable {

  private def commitMarker(batchId: Long) = Paths.get(s"$outDir/_commits/$batchId")

  def isCommitted(batchId: Long): Boolean = Files.exists(commitMarker(batchId))

  def committedBatches(): Set[Long] = {
    val d = Paths.get(s"$outDir/_commits")
    if (!Files.exists(d)) Set.empty
    else {
      val s = Files.list(d)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.getFileName.toString.toLong).toSet
      finally s.close()
    }
  }
  private implicit class RichIt[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  /** Write one decision micro-batch. Safe to call twice with the same id. */
  def writeBatch(decisions: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return // replay after restart → no-op
    val cached = decisions.persist()
    try {
      val (valid, rejected, webdata) = ValidationPipeline.routes(cached)
      valid.write.mode("overwrite").parquet(s"$outDir/valid/batch_id=$batchId")
      rejected.write.mode("overwrite").parquet(s"$outDir/rejected/batch_id=$batchId")
      webdata.write.mode("overwrite").parquet(s"$outDir/webdata/batch_id=$batchId")
      // per-partition lineage + counts (north rule: per-partition metrics)
      cached
        .groupBy(spark_partition_id().as("partition_id"))
        .agg(
          sum(when(col("decision") === "valid", 1L).otherwise(0L)).as("rows_validated"),
          sum(when(col("decision") === "rejected", 1L).otherwise(0L)).as("rows_rejected"),
          min("ts").as("ts_min"), max("ts").as("ts_max"))
        .write.mode("overwrite").parquet(s"$outDir/metrics/batch_id=$batchId")
      commit(batchId)
    } finally cached.unpersist()
  }

  /** Atomic publish: write a temp file, then ATOMIC_MOVE into _commits. */
  private def commit(batchId: Long): Unit = {
    Files.createDirectories(Paths.get(s"$outDir/_commits"))
    val tmp = Paths.get(s"$outDir/_commits/.tmp_$batchId")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, commitMarker(batchId), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Committed-only view of one output kind (valid/rejected/webdata/metrics). */
  def read(spark: SparkSession, kind: String): DataFrame = {
    val committed = committedBatches()
    if (committed.isEmpty)
      return spark.emptyDataFrame
    spark.read.parquet(s"$outDir/$kind")
      .filter(col("batch_id").isin(committed.toSeq: _*))
  }
}
