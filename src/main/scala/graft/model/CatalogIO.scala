package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the dimension catalog from a directory of parquet tables
  * (`entities.parquet`, `def_allowed.parquet`, `attribute_defs.parquet` —
  * the same layout the fixtures write).
  *
  * This is the refresh point for long-running streams: the reference does
  * per-RECORD catalog lookups (TopologyProducer.java:196-208), so a
  * catalog update takes effect on the very next record. The Spark
  * equivalent loads once per MICRO-BATCH (`StreamValidate` with
  * `catalogDir` set re-invokes these inside `foreachBatch`), which is the
  * same always-fresh semantics at micro-batch granularity — the engine's
  * batching unit — instead of per-record network lookups that would cap
  * throughput at lookup latency.
  *
  * Dims are small relative to the stream (catalog, not data), so the
  * driver-side materialization in [[load]] is bounded; a catalog too big
  * to broadcast belongs on the relational path with
  * `broadcastDims = false` (shuffle-join fallback, RelationalSpec).
  */
object CatalogIO {

  def entitiesPath(dir: String) = s"$dir/entities.parquet"
  def defAllowedPath(dir: String) = s"$dir/def_allowed.parquet"
  def attributeDefsPath(dir: String) = s"$dir/attribute_defs.parquet"

  /** The three dimension tables as DataFrames (relational validation). */
  def frames(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(entitiesPath(dir)),
      spark.read.parquet(defAllowedPath(dir)),
      spark.read.parquet(attributeDefsPath(dir)))

  /** Plain-Scala catalog maps (fused broadcast-variable validation). */
  def load(spark: SparkSession, dir: String): Catalog = {
    import spark.implicits._
    val (e, d, a) = frames(spark, dir)
    Catalog(
      e.as[EntityRow].collect().map(r => r.code -> r).toMap,
      d.as[DefAllowedRow].collect().map(r => r.target_code -> r).toMap,
      a.as[AttributeDefRow].collect().map(r => r.attribute_code -> r).toMap)
  }

  /** Write a catalog's tables to `dir` (test/bootstrap convenience). */
  def write(spark: SparkSession, dir: String, entities: Seq[EntityRow],
      defAllowed: Seq[DefAllowedRow], attributeDefs: Seq[AttributeDefRow]): Unit = {
    import spark.implicits._
    entities.toDF().coalesce(1).write.mode("overwrite").parquet(entitiesPath(dir))
    defAllowed.toDF().coalesce(1).write.mode("overwrite").parquet(defAllowedPath(dir))
    attributeDefs.toDF().coalesce(1).write.mode("overwrite").parquet(attributeDefsPath(dir))
  }
}
