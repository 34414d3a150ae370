package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a lauchy-successor
  * user actually runs over a raw document corpus —
  *
  *   exact dedup → near-dup removal (n-gram Jaccard) → language filter
  *   → deterministic train/val split + token accounting.
  *
  * Every stage is one of this engine's individually-oracled operators,
  * so the WHOLE pipeline is re-derivable in SQL and the driver's DuckDB
  * oracle checks the composition end-to-end (`curation_pipeline`), not
  * just the parts.
  *
  * Scale shape: the near-dup stage is the only super-linear component
  * (inverted-index candidate join, maxDf-pruned); every other stage is
  * a hash aggregate or a doc_id-keyed semi/anti join — no stage ever
  * shuffles document text except the pair-generation explode, which
  * carries (doc_id, shingle) only.
  */
object Curation {

  /** Returns the curated corpus as (doc_id, split, ws_tokens,
    * bpe_ish_tokens), sorted upstream by the caller.
    *
    * Near-dup policy: for each pair with jaccard >= `jaccard`, the
    * LARGER doc_id is dropped (matches Dedup.exact's keep-smallest).
    */
  def curate(docs: DataFrame, jaccard: Double = 0.5,
      lang: String = "en"): DataFrame = {
    // 1. exact dedup — keep the smallest doc_id of each duplicate group
    val s1 = Dedup.exact(docs)
      .filter(col("keep")).select("doc_id")
      .join(docs, Seq("doc_id"))
    // 2. near-dup removal over the exact-dedup survivors
    val nearDupIds = Dedup.ngramJaccardPairs(s1, n = 3, threshold = jaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    val s2 = s1.join(nearDupIds, Seq("doc_id"), "left_anti")
    // 3. language filter on the predicted language
    val langIds = TextMetrics.langId(s2)
      .filter(col("lang_pred") === lang).select("doc_id")
    val s3 = s2.join(langIds, Seq("doc_id"))
    // 4. split assignment + token accounting
    TextMetrics.tokenCounts(s3)
      .join(Sampling.hashSplit(s3).select("doc_id", "split"), Seq("doc_id"))
      .select("doc_id", "split", "ws_tokens", "bpe_ish_tokens")
  }

  /** The MinHash-LSH variant of [[curate]] — the batch counterpart of
    * `streaming.StreamCuration` (agreement-tested against it): exact dedup
    * → MinHash-LSH near-dup removal (drop the larger doc_id of each pair —
    * id order is the batch precedence, arrival order the streaming one) →
    * language + minimum-length gate. Pairing runs over the FULL corpus
    * (exact dups share identical signatures, so the drop set is unchanged
    * vs pairing survivors only — and it matches the stream, whose bucket
    * state retains every arrival).
    */
  def curateMinhash(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxBucket: Int = 100000, lang: String = "en",
      minTokens: Int = 3): DataFrame = {
    val s1 = Dedup.exact(docs)
      .filter(col("keep")).select("doc_id")
      .join(docs, Seq("doc_id"))
    val nearDupIds = Dedup.minhashLshPairs(docs, numHashes = numHashes,
        bands = bands, threshold = threshold, maxBucket = maxBucket)
      .select(col("doc_b").as("doc_id")).distinct()
    val s2 = s1.join(nearDupIds, Seq("doc_id"), "left_anti")
    s2.select(col("doc_id"),
        TextMetrics.langPred(col("text")).as("lang_pred"),
        TextMetrics.wsTokens(col("text")).as("ws_tokens"))
      .filter(col("lang_pred") === lang && col("ws_tokens") >= minTokens)
  }
}
