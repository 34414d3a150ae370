package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One banded signature row flowing into a bucket's state. */
final case class BandedDoc(
    band: Int,
    bucket: Long,
    doc_id: Long,
    sig: Seq[Long],
    ts: Timestamp)

/** A bucket member retained in state. */
final case class BucketMember(doc_id: Long, sig: Seq[Long])

/** Per-(band, bucket) LSH state. `saturated` buckets (hit `maxBucket`)
  * stop emitting AND drop their members — a degenerate bucket is O(n²)
  * pairs of near-zero signal, and at stream scale it must cost neither
  * memory nor output.
  */
final case class BucketState(members: List[BucketMember], saturated: Boolean)

/** Candidate near-duplicate pair discovered online. */
final case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double,
    ts: Timestamp)

/** ONLINE near-duplicate detection at ingest — the streaming counterpart
  * of Dedup.minhashLshPairs: documents stream in, and each (band, bucket)
  * of the MinHash-LSH banding keeps its members in keyed state, so a new
  * document is compared against every earlier co-bucketed document the
  * moment it arrives — including documents from past micro-batches, which
  * the batch operator can only pair by reprocessing the whole corpus.
  *
  * Shape: signature + banding are NARROW codegen stages (the same native
  * `minhash_sig` expression as batch); the only exchange is the one Spark
  * inserts for the (band, bucket)-keyed state — exactly the batch plan's
  * band-bucket shuffle, amortized over arrival. State per bucket is
  * <= maxBucket signatures and buckets close by EVENT-TIME timeout `gap`
  * after their newest arrival, so state is bounded by ACTIVE buckets, not
  * stream length (same law as DedupState). Cross-band duplicate pair
  * emissions are at-least-once by default; see `collapsePairs`.
  *
  * Cap semantics vs batch: the batch operator drops an over-`maxBucket`
  * bucket RETROACTIVELY (it sees the full corpus); a stream cannot, so a
  * bucket saturates PROSPECTIVELY — pairs emitted before saturation
  * stand. Parity with the batch candidate set is exact below the cap
  * (agreement-tested).
  */
object StreamDedup {

  /** @param collapsePairs when false (default) the output is AT-LEAST-ONCE
    *   per pair — the same pair can surface from up to `bands` buckets;
    *   consumers collapse with a set/groupBy (the exactly-once sink's
    *   per-batch idempotence makes re-emissions harmless). When true, a
    *   `dropDuplicatesWithinWatermark` stage collapses them in-stream;
    *   Spark's STATIC multi-stateful-operator checker cannot prove that
    *   chain safe and must be told so via
    *   `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
    *   — which IS safe here: every emitted pair carries the event time of
    *   the input row that triggered it, and that row already passed the
    *   shared watermark gate, so no emission is late for the downstream
    *   dedup state.
    */
  def nearDupPairs(spark: SparkSession, docs: DataFrame, numHashes: Int = 64,
      bands: Int = 16, n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 500, watermark: String = "10 minutes",
      gap: String = "30 minutes", textCol: String = "text",
      collapsePairs: Boolean = false): Dataset[NearDupPair] = {
    import spark.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0,
      s"bucket gap must be day/time-based, got month-bearing interval '$gap'")
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000L

    val sigs = docs
      .withColumn("sig", graft.functions.SketchExpr.minhash_sig(
        graft.ops.Dedup.shingles(col(textCol), n), numHashes))
      .select(col("doc_id"), col("sig"), col("ts"))
    val banded = sigs.select(
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bucket")),
        col("doc_id"), col("sig"), col("ts"))
      .withWatermark("ts", watermark)
      .as[BandedDoc]

    val pairs = banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(BucketState(Nil, saturated = false))
            var maxTs = Long.MinValue
            val out = Vector.newBuilder[NearDupPair]
            rows.foreach { d =>
              if (d.ts != null) maxTs = math.max(maxTs, d.ts.getTime)
              if (!s.saturated && !s.members.exists(_.doc_id == d.doc_id)) {
                s.members.foreach { m =>
                  var eq = 0
                  var i = 0
                  while (i < numHashes) {
                    if (m.sig(i) == d.sig(i)) eq += 1
                    i += 1
                  }
                  val est = eq.toDouble / numHashes
                  if (est >= threshold)
                    out += NearDupPair(math.min(m.doc_id, d.doc_id),
                      math.max(m.doc_id, d.doc_id), est, d.ts)
                }
                s =
                  if (s.members.length + 1 >= maxBucket)
                    BucketState(Nil, saturated = true) // free memory, stop emitting
                  else BucketState(BucketMember(d.doc_id, d.sig) :: s.members, false)
              }
            }
            state.update(s)
            if (maxTs != Long.MinValue) {
              val closeAt = math.max(maxTs + gapMs,
                state.getCurrentWatermarkMs() + 1)
              state.setTimeoutTimestamp(closeAt)
            }
            out.result().iterator
          }
      }
    if (!collapsePairs) pairs
    else pairs.withWatermark("ts", watermark) // new event-time lineage
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
  }
}
