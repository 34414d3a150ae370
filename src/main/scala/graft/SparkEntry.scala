package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.validate.{RelationalValidation, ValidationPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Transcript fixtures for `sfDir` (generated deterministically in-repo,
    * since /root/testdata is read-only and the input_hint table shape is a
    * transcripts stream).
    */
  private def tx(spark: SparkSession, sfDir: String): DataFrame = {
    val p = TranscriptGen.ensure(spark, sfDir)
    TranscriptGen.readTranscripts(spark, p)
  }

  /** Flagship: the full validation pipeline on sf0.001 transcripts. */
  def entry(spark: SparkSession): DataFrame =
    ValidationPipeline
      .decide(spark, tx(spark, "/root/testdata/sf0.001"), TranscriptGen.catalog)
      .toDF()
      .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid")

  /** Build-once IVF index over `dir`'s embeddings table; returns
    * (indexPath, buildSeconds — 0.0 when already built). Shared by the
    * `ivf_topk_indexed` query and the bench, which calls it AHEAD of the
    * timed region so the query's number is the serving time and the build
    * cost is reported separately (`ivf_index_build_sec`) — the build/serve
    * split is the point of a persisted index.
    */
  def ivfIndexPath(dir: String): String =
    s"/root/repo/data/ivf_idx_${new java.io.File(dir).getName}"

  def ivfAppendedIndexPath(dir: String): String =
    s"/root/repo/data/ivf_idxa_${new java.io.File(dir).getName}"

  def ensureIvfIndex(s: SparkSession, dir: String): (String, Double) = {
    val idx = ivfIndexPath(dir)
    if (new java.io.File(s"$idx/_GRAFT_READY").exists()) (idx, 0.0)
    else {
      val t0 = System.nanoTime()
      graft.ops.Similarity.buildIvfIndex(
        s.read.parquet(s"$dir/embeddings.parquet"), idx, nlist = 16)
      new java.io.File(idx, "_GRAFT_READY").createNewFile()
      (idx, (System.nanoTime() - t0) / 1e9)
    }
  }

  /** The incremental-maintenance twin of [[ensureIvfIndex]]: build on the
    * even-vec_id half, append the odd half under the frozen centroids.
    * Returns (indexPath, buildAndAppendSeconds — 0.0 when cached).
    */
  def ensureIvfAppendedIndex(s: SparkSession, dir: String): (String, Double) = {
    val idx = ivfAppendedIndexPath(dir)
    if (new java.io.File(s"$idx/_GRAFT_READY").exists()) (idx, 0.0)
    else {
      val t0 = System.nanoTime()
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.ops.Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 2 === 0), idx, nlist = 16)
      graft.ops.Similarity.appendIvfIndex(
        emb.filter(col("vec_id") % 2 =!= 0), idx)
      new java.io.File(idx, "_GRAFT_READY").createNewFile()
      (idx, (System.nanoTime() - t0) / 1e9)
    }
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "validate_fused" -> ((s, dir) =>
      ValidationPipeline.decide(s, tx(s, dir), TranscriptGen.catalog).toDF()
        .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid")
        .orderBy("conv_id", "turn_idx")),
    "validate_relational" -> ((s, dir) => {
      val p = TranscriptGen.ensure(s, dir)
      val (ent, defA, attr) = TranscriptGen.readCatalogFrames(s, p)
      RelationalValidation.decide(s, TranscriptGen.readTranscripts(s, p), ent, defA, attr)
        .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid")
        .orderBy("conv_id", "turn_idx")
    }),
    "dedup_turns" -> ((s, dir) => {
      import s.implicits._
      val t = tx(s, dir).as[graft.model.Turn]
      val withDups = t.union(t.filter(_.turn_idx == 0))
      graft.streaming.DedupState.dedupBatch(s, withDups).toDF()
        .orderBy("conv_id", "turn_idx")
    }),
    "sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.sessions(tx(s, dir), gap = "2 minutes")
        .orderBy("conv_id", "session_start")),
    "turn_join" -> ((s, dir) =>
      graft.streaming.TurnJoin.userToolPairs(tx(s, dir), horizon = "3 minutes")
        .orderBy("conv_id", "u_turn_idx", "t_turn_idx")),
    "turn_join_outer" -> ((s, dir) => // left-outer stream-stream join, batch form
      graft.streaming.TurnJoin.userToolPairsOuter(tx(s, dir), horizon = "3 minutes")
        .orderBy("conv_id", "u_turn_idx", "t_turn_idx")),
    "webdata_rows" -> ((s, dir) => {
      val dec = ValidationPipeline.decide(s, tx(s, dir), TranscriptGen.catalog).toDF()
      ValidationPipeline.routes(dec)._3.orderBy("conv_id", "turn_idx", "payload")
    }),
    "conv_stats_salted" -> ((s, dir) =>
      graft.ops.Aggregates.convStatsSalted(tx(s, dir)).orderBy("conv_id")),
    "rollup_stats" -> ((s, dir) =>
      graft.ops.Aggregates.rollupStats(tx(s, dir))
        .orderBy(asc_nulls_first("role"), asc_nulls_first("has_text"), col("n"))),
    "topk_convs" -> ((s, dir) =>
      graft.ops.Aggregates.topConversations(tx(s, dir), k = 10)
        .orderBy("rank", "conv_id")),
    "window_tumbling" -> ((s, dir) =>
      graft.streaming.TimeWindows.tumbling(tx(s, dir), size = "5 minutes")
        .drop("n_convs_approx") // HLL estimate excluded from the oracle
        .orderBy("window_start", "role")),
    "window_sliding" -> ((s, dir) =>
      graft.streaming.TimeWindows.sliding(tx(s, dir), size = "10 minutes",
        slide = "5 minutes").orderBy("window_start")),
    "cardinality" -> ((s, dir) =>
      graft.ops.Aggregates.cardinality(tx(s, dir))
        .drop("n_convs_approx").orderBy("role")),
    "cardinality_approx" -> ((s, dir) =>
      // HLL estimate itself is not DuckDB-reproducible; emit the exactness
      // CLAIM (|approx-exact| <= 10%) as a column the oracle asserts true
      graft.ops.Aggregates.cardinality(tx(s, dir))
        .withColumn("approx_ok",
          abs(col("n_convs_approx") - col("n_convs")) <= col("n_convs") * 0.10)
        .drop("n_convs_approx")
        .orderBy("role")),
    "cube_stats" -> ((s, dir) =>
      graft.ops.Aggregates.cubeStats(tx(s, dir))
        .orderBy(asc_nulls_first("role"), asc_nulls_first("has_text"), col("n"))),
    "set_ops" -> ((s, dir) =>
      graft.ops.Aggregates.toolSetOps(tx(s, dir)).orderBy("op", "conv_id")),
    // ----- join classes over the TPC-H-shaped tables ----------------------
    "q3_join" -> ((s, dir) =>
      graft.ops.Joins.topRevenueOrders(
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/lineitem.parquet"),
        segment = "BUILDING", cutoff = "1998-01-01", k = 20)
        .orderBy(desc("revenue"), asc("o_orderkey"))),
    "q5_join" -> ((s, dir) =>
      graft.ops.Joins.regionRevenue(
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/lineitem.parquet"),
        s.read.parquet(s"$dir/supplier.parquet"),
        s.read.parquet(s"$dir/nation.parquet"),
        s.read.parquet(s"$dir/region.parquet"),
        regionName = "ASIA", yearStart = "1996-01-01", yearEnd = "1997-01-01")
        .orderBy("n_name")),
    "q14_join" -> ((s, dir) => // part⋈lineitem: per-brand promo share
      graft.ops.Joins.promoRevenue(
        s.read.parquet(s"$dir/part.parquet"),
        s.read.parquet(s"$dir/lineitem.parquet"),
        from = "1997-01-01", to = "1997-04-01")
        .orderBy("p_brand")),
    "udaf_stats" -> ((s, dir) => { // typed Aggregator UDAF (SURVEY §2.4):
      // exact per-conversation text-length quantiles, quantile_cont
      // semantics so the DuckDB oracle doubles are bit-comparable
      val med = udaf(graft.functions.ExactQuantile(0.5))
      val p90 = udaf(graft.functions.ExactQuantile(0.9))
      tx(s, dir).filter(col("text").isNotNull)
        .select(col("conv_id"), length(col("text")).cast("long").as("len"))
        .groupBy("conv_id")
        .agg(count(lit(1)).as("n_texts"),
          med(col("len")).as("median_len"),
          p90(col("len")).as("p90_len"))
        .orderBy("conv_id")
    }),
    "validate_promoted" -> ((s, dir) => // V13/Q5: blacklist off promotes
      ValidationPipeline.decide(s, tx(s, dir), TranscriptGen.catalog,
        enableBlacklist = false).toDF()
        .select("conv_id", "turn_idx", "role", "decision", "reason", "uuid", "promoted")
        .orderBy("conv_id", "turn_idx")),
    "semi_join" -> ((s, dir) =>
      graft.ops.Joins.ordersWithLineitems(
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/lineitem.parquet")).orderBy("o_orderkey")),
    "anti_join" -> ((s, dir) =>
      graft.ops.Joins.customersWithoutUrgent(
        s.read.parquet(s"$dir/customer.parquet"),
        s.read.parquet(s"$dir/orders.parquet")).orderBy("c_custkey")),
    "asof_join" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.ops.Joins.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(col("event_type") === "click"),
        key = "user_id", ts = "ts", rightCols = Seq("event_id", "ts", "value"),
        tieBreak = Some("event_id"))
        .orderBy("event_id")
    }),
    "asof_join_salted" -> ((s, dir) => { // hot-key variant: partition by
      // (key, time bucket) + bucket-grain carry; same semantics, same oracle
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.ops.Joins.asofJoinSalted(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(col("event_type") === "click"),
        key = "user_id", ts = "ts", rightCols = Seq("event_id", "ts", "value"),
        tieBreak = Some("event_id"), bucketSeconds = 3600L)
        .orderBy("event_id")
    }),
    "asof_join_auto" -> ((s, dir) => { // skew-aware auto-selection: probes
      // max per-key rows (one counting agg) and picks salted only past the
      // hot-key threshold — benign corpora keep the 2x-faster plain plan.
      // Same semantics either way, same oracle.
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.ops.Joins.asofJoinAuto(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(col("event_type") === "click"),
        key = "user_id", ts = "ts", rightCols = Seq("event_id", "ts", "value"),
        tieBreak = Some("event_id"))
        .orderBy("event_id")
    }),
    // ----- training-data pipeline ops (documents / embeddings tables) -----
    "curation_pipeline" -> ((s, dir) => // end-to-end curation composition
      graft.ops.Curation.curate(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")),
    "curation_pipeline2" -> ((s, dir) => // round-5 data-selection
      // composition: exact dedup -> span gate -> Gopher rules ->
      // survivor-trained perplexity terciles -> per-domain quota; the
      // oracle re-derives the WHOLE chain incl. survivor-set coupling
      graft.ops.Curation.curate2(s,
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "page_rank" -> ((s, dir) => // damped power iteration with dangling
      // redistribution over the near-dup graph; the oracle unrolls the
      // same three iterations in SQL (GD-unroll pattern)
      graft.ops.Centrality.pageRank(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "dedup_exact" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val planted = docs.select("doc_id", "text").unionByName(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      graft.ops.Dedup.exact(planted).orderBy("doc_id")
    }),
    "dedup_clusters" -> ((s, dir) => { // pair graph → connected components
      // (alternating large-star/small-star): TRANSITIVE near-dup groups,
      // one canonical doc per component. Bridge docs (text of doc 2k ++
      // text of doc 2k+1, k<10) are planted so the transitive merge is
      // visible: a bridge links two docs that share nothing, and CC puts
      // all three in one cluster where pair-based drop would keep both
      // originals.
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val a = docs.filter(col("doc_id") < 20 && col("doc_id") % 2 === 0)
        .select(col("doc_id").as("k"), col("text").as("ta"))
      val b = docs.filter(col("doc_id") < 20 && col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("k"), col("text").as("tb"))
      val bridges = a.join(b, "k")
        .select((col("k") / 2 + 300000).cast("long").as("doc_id"),
          concat(col("ta"), lit(" "), col("tb")).as("text"))
      graft.ops.ConnectedComponents.dedupClusters(
        docs.unionByName(bridges), n = 3, threshold = 0.05)
        .orderBy("doc_id")
    }),
    "line_dedup" -> ((s, dir) => { // C4-style cross-corpus line dedup:
      // planted page structure — every doc gains a shared boilerplate
      // line, every 5th an extra one — and each repeated line survives
      // only at its (doc_id, pos)-smallest occurrence. Engine keeps the
      // keeper via a hash-agg min(struct); the oracle windows — two
      // independent formulations.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val planted = docs.select(col("doc_id"),
        concat(col("text"), lit("\nsubscribe to our newsletter today"),
          when(col("doc_id") % 5 === 0, lit("\nfollow us on social media"))
            .otherwise(lit(""))).as("text"))
      graft.ops.Dedup.lineDedup(planted).orderBy("doc_id")
    }),
    "ngram_jaccard" -> ((s, dir) =>
      graft.ops.Dedup.ngramJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), n = 3, threshold = 0.05)
        .orderBy("doc_a", "doc_b")),
    "minhash_pairs" -> ((s, dir) => { // candidate set xxhash-dependent;
      // the true_jaccard column is independently re-derived by the oracle
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.ops.Dedup.withTrueJaccard(
        graft.ops.Dedup.minhashLshPairs(docs, numHashes = 64, bands = 16,
          threshold = 0.2), docs).orderBy("doc_a", "doc_b")
    }),
    "simhash_pairs" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.ops.Dedup.withTrueJaccard(
        graft.ops.Dedup.simhashPairs(docs, maxHamming = 3), docs)
        .orderBy("doc_a", "doc_b")
    }),
    "decontam" -> ((s, dir) => { // benchmark decontamination: word-8-gram
      // overlap of the md5-'train' bucket against the md5-'val' holdout.
      // Planted leaks make the signal visible at sf0.01: full copies of
      // docs 20..40 (doc 27 is val ⇒ its copy leaks everything) and
      // 12-word prefixes of val docs 59/63 (⇒ exactly 5 leaked grams).
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val fullCopies = docs.filter(col("doc_id").between(20, 40))
        .select((col("doc_id") + 400000).as("doc_id"), col("text"))
      val prefixes = docs.filter(col("doc_id").isin(59, 63))
        .select((col("doc_id") + 410000).as("doc_id"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
            1, 12)).as("text"))
      graft.ops.Decontam.splitAndOverlap(
        docs.unionByName(fullCopies).unionByName(prefixes), n = 8)
        .orderBy("doc_id")
    }),
    "pii_scan" -> ((s, dir) => { // PII lanes + redaction: planted leaks
      // (every 7th doc gets email/phone/IP/valid-card, every 7th+1 an
      // INVALID card that must count 0 — the Luhn filter is the test)
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val planted = docs.withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.org or call 0412345678 from host 10.0."),
          (col("doc_id") % 250).cast("string"),
          lit(".7 card 4242424242424242 ok")))
        .when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" invalid card 4242424242424243 here")))
        .otherwise(col("text")))
      graft.ops.Pii.scan(planted).orderBy("doc_id")
    }),
    "rep_signals" -> ((s, dir) => // Gopher-style repetition fractions:
      // narrow run-length fold over sorted gram arrays, zero shuffle
      graft.ops.TextMetrics.repetitionSignals(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      graft.ops.TextMetrics.quality(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")),
    "gopher_rules" -> ((s, dir) => // Gopher Table-A1 ruleset: named
      // per-rule boolean flags + conjunctive keep, one codegen projection
      graft.ops.GopherRules.flags(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")),
    "token_counts" -> ((s, dir) =>
      graft.ops.TextMetrics.tokenCounts(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")),
    "bpe_token_counts" -> ((s, dir) => { // REAL corpus-trained BPE: one
      // distributed histogram pass + driver merge fit + broadcast tokenize
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val merges = graft.ops.Bpe.train(docs, numMerges = 200, maxWords = 20000)
      graft.ops.Bpe.tokenCounts(s, docs, merges).orderBy("doc_id")
    }),
    "lang_id" -> ((s, dir) =>
      graft.ops.TextMetrics.langId(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")),
    "lang_id_trained" -> ((s, dir) => // corpus-TRAINED trigram naive Bayes;
      // training + smoothing + argmax all re-derived by the DuckDB oracle
      graft.ops.LangModel.langIdTrained(s,
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "quality_classifier" -> ((s, dir) => // trained logistic-regression
      // quality filter (DCLM/fastText shape): 3 full-batch GD iterations
      // — one scan each, d+1 gradient avgs, driver update — then a
      // narrow scoring projection; the oracle unrolls the SAME three
      // iterations as chained aggregate CTEs
      graft.ops.QualityModel.trainAndClassify(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "lm_score" -> ((s, dir) => // CCNet-style LM quality signal: mean
      // trigram log-likelihood under the corpus-trained 'en' model; the
      // oracle re-derives the full train+score chain (1e-8 verify — ln
      // ULPs differ across engines)
      graft.ops.LangModel.lmScore(s,
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "dsir_weights" -> ((s, dir) => // DSIR importance weights: one pass
      // builds both hashed-unigram distributions (m<=128 rows), scoring
      // is a narrow fold over a literal log-ratio table
      graft.ops.Dsir.weights(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "dsir_resample" -> ((s, dir) => // DSIR's selection step: weighted
      // sampling without replacement via deterministic Gumbel-top-k
      // (splitmix64 uniforms); TakeOrderedAndProject, never a global sort
      graft.ops.Dsir.resample(
        s.read.parquet(s"$dir/documents.parquet"), k = 50).orderBy("doc_id")),
    "span_dedup" -> ((s, dir) => // Lee-et-al-style exact-substring spans:
      // narrow window hashing + hash-agg dup set + left_semi count-back
      graft.ops.SpanDedup.profile(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "perplexity_buckets" -> ((s, dir) => // CCNet head/middle/tail
      // terciles of the trained-LM score: narrow scoring + a 2-value
      // exact-percentile agg broadcast back; both engines threshold their
      // OWN scores, so ln noise cancels
      graft.ops.PerplexityBuckets.buckets(s,
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "tfidf_top" -> ((s, dir) => // per-doc top-3 TF-IDF terms: two hash
      // aggs + a word join + per-doc array_sort top-k (no Window); the
      // oracle re-derives tf, df, ln-score AND rank independently via a
      // row_number window — two formulations must agree
      graft.ops.TextMetrics.tfidfTop(
        s.read.parquet(s"$dir/documents.parquet"), k = 3)
        .orderBy("doc_id", "rank")),
    "doc_fingerprint" -> ((s, dir) =>
      graft.ops.TextMetrics.fingerprint(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")),
    "cosine_topk" -> ((s, dir) =>
      graft.ops.Similarity.bruteTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), k = 10, stride = 50)
        .orderBy("q_id", "rank")),
    "sq_topk" -> ((s, dir) => // int8 scalar-quantized brute top-k (4x scan
      // compression); quantization is deterministic, so the oracle
      // re-derives bounds, codes, reconstruction, scoring AND ranks
      graft.ops.Similarity.sqTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), k = 10, stride = 50)
        .orderBy("q_id", "rank")),
    "jl_distortion" -> ((s, dir) => // Johnson-Lindenstrauss sign
      // projection 64->16 dims: sampled-pair cosine in original vs
      // projected space; matrix + folds identical in both engines, so
      // the oracle compare is bit-exact
      graft.ops.Similarity.jlDistortion(
        s.read.parquet(s"$dir/embeddings.parquet"))
        .orderBy("q_id", "vec_id")),
    "pq_topk" -> ((s, dir) => // product-quantized shortlist (32x
      // compression, ADC bounded heap) + exact-cosine rerank of the
      // <= Q x shortlist survivors; final ranks are exact, so the oracle
      // re-derives cos + rank from raw embeddings like the IVF oracles
      graft.ops.Similarity.pqTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), k = 10, stride = 50)
        .orderBy("q_id", "rank")),
    "ivf_topk" -> ((s, dir) => // candidate set approximate by construction;
      // the oracle re-derives cos + rank for the emitted rows from {OUT}
      graft.ops.Similarity.ivfTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), k = 10, stride = 50,
        nlist = 16, nprobe = 8).orderBy("q_id", "rank")),
    "ivf_topk_indexed" -> ((s, dir) => { // persisted-index SERVING path:
      // build once (directory-partitioned by list_id — [[ensureIvfIndex]],
      // timed separately by the bench), query with static partition
      // pruning; oracle re-derives cos + rank from {OUT}
      val idx = ensureIvfIndex(s, dir)._1
      graft.ops.Similarity.ivfTopKIndexed(idx,
        s.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding")),
        k = 10, nprobe = 8)
        .orderBy("q_id", "rank")
    }),
    "ivf_topk_appended" -> ((s, dir) => { // incremental-maintenance path:
      // build on half the corpus, append the other half under the FROZEN
      // centroids ([[ensureIvfAppendedIndex]] — the bench times build+append
      // in its warmup, so this query measures serving), serve over the
      // grown index — agreement-tested vs the inline plan under the same
      // centroids; oracle re-derives cos + rank from {OUT}
      val idx = ensureIvfAppendedIndex(s, dir)._1
      graft.ops.Similarity.ivfTopKIndexed(idx,
        s.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding")),
        k = 10, nprobe = 8)
        .orderBy("q_id", "rank")
    }),
    "semantic_dedup" -> ((s, dir) => { // SemDeDup cluster-then-cosine:
      // k-means assignment (same Lloyd kernel as IVF) scopes the pair
      // search to within-cluster; planted twins (vec_id+500000 copies of
      // vec_id<10) are identical vectors, so they MUST share a cluster
      // and surface at cos 1.0 whatever the centroids; the oracle
      // re-derives the exact cosine of every emitted pair from {OUT}
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val planted = emb.select("vec_id", "embedding").unionByName(
        emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 500000).as("vec_id"), col("embedding")))
      graft.ops.Similarity.semanticDedupPairs(planted, nlist = 16,
        kmeansIters = 2, threshold = 0.95).orderBy("vec_a", "vec_b")
    }),
    "lsh_cosine_pairs" -> ((s, dir) => // oracle re-derives cos from {OUT}
      graft.ops.Similarity.lshCosinePairs(
        s.read.parquet(s"$dir/embeddings.parquet"), planes = 8, threshold = 0.35)
        .orderBy("vec_a", "vec_b")),
    "multimodal_features" -> ((s, dir) => { // REAL BMP/WAV/PNG decode (BMP
      // header parse + row-padding strip, RIFF chunk walk, PNG through the
      // JDK's ImageIO codec — inflate + filter reconstruction); the data
      // sections are
      // splitmix64 streams, so the oracle re-derives every feature lane +
      // checksum from (doc_id, n_chars) in DuckDB — a decoder that misreads
      // stride/padding/chunks fails the hash. Features emit as 16 scalar
      // double columns (a raw array<float> crashes the driver's pandas
      // sort); lanes are integer sums < 2^24, so f32 accumulation is exact.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val feats = graft.ops.Multimodal.extractFeatures(s,
        graft.ops.Multimodal.synthesize(s, docs)).toDF()
      feats.select(
        col("doc_id") +: col("media_type") +: col("n_bytes") +: col("checksum") +:
          (0 until graft.ops.Multimodal.FeatureDim).map(j =>
            element_at(col("features"), j + 1).cast("double").as(s"f$j")): _*)
        .orderBy("doc_id")
    }),
    "multimodal_meta" -> ((s, dir) => { // metadata plumbing is oracle-
      // derivable from documents (media_type/n_bytes are pure functions of
      // doc_id/n_chars); checksum+digest stay in multimodal_features
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.ops.Multimodal.extractFeatures(s,
        graft.ops.Multimodal.synthesize(s, docs)).toDF()
        .select("doc_id", "media_type", "n_bytes")
        .orderBy("doc_id")
    }),
    "heavy_hitters" -> ((s, dir) => { // Misra-Gries frequent-items sketch
      // (the third classic mergeable summary beside HLL + GK): capacity
      // 1000 >> corpus vocabulary, so no decrement ever fires and the
      // sketch is provably EXACT — the oracle re-derives top-20 word
      // counts directly; the error regime is spec-tested with planted
      // skew (exactness outside that regime is not SQL-expressible)
      val hh = udaf(graft.functions.HeavyHitters(1000))
      s.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .agg(hh(col("word")).as("hh"))
        .select(explode(col("hh")).as("wc"))
        .select(col("wc.word").as("word"), col("wc.count").as("cnt"))
        .orderBy(desc("cnt"), asc("word"))
        .limit(20)
    }),
    "quantile_approx" -> ((s, dir) => // GK sketch beside exact percentile;
      // sketch value is engine-specific, so the oracle asserts the BOUND
      graft.ops.Aggregates.quantileStats(tx(s, dir)).orderBy("role")),
    "cep_match" -> ((s, dir) => // CEP sequence-pattern operator: symbolize
      // (codegen CASE) → one conv_id exchange + in-partition sort → narrow
      // per-conversation regex automaton (one conversation in memory at a
      // time). The oracle re-derives the same matches RELATIONALLY via
      // gaps-and-islands — two independent formulations must agree.
      graft.ops.Cep.searchRuns(tx(s, dir)).toDF()
        .orderBy("conv_id", "match_seq")),
    "tool_seq" -> ((s, dir) => // ordered collection agg (string_agg class)
      graft.ops.Aggregates.toolSequence(tx(s, dir)).orderBy("conv_id")),
    "grouping_sets_stats" -> ((s, dir) => // explicit GROUPING SETS
      graft.ops.Aggregates.groupingSetsStats(tx(s, dir))
        .orderBy(asc_nulls_first("role"), asc_nulls_first("tool"), col("n"))),
    "turn_latency" -> ((s, dir) => // offset window fn (lag)
      graft.ops.Aggregates.turnLatency(tx(s, dir))
        .orderBy("conv_id", "turn_idx")),
    "rolling_stats" -> ((s, dir) => // frame window (ROWS BETWEEN)
      graft.ops.Aggregates.rollingStats(tx(s, dir))
        .orderBy("conv_id", "turn_idx")),
    "pivot_stats" -> ((s, dir) => // long→wide pivot with declared values
      graft.ops.Aggregates.langLengthPivot(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("lang")),
    "stratified_sample" -> ((s, dir) => // EXACT per-stratum sample: ceil
      // (frac*|stratum|) rows per lang, deterministic md5-order rank
      graft.ops.Sampling.stratifiedSample(
        s.read.parquet(s"$dir/documents.parquet"), strataCol = "lang",
        frac = 0.2).orderBy("doc_id")),
    "hash_sample" -> ((s, dir) => // deterministic md5-bucket train/val split
      graft.ops.Sampling.hashSplit(
        s.read.parquet(s"$dir/documents.parquet")).orderBy("doc_id")),
    "domain_quota" -> ((s, dir) => // RefinedWeb-style per-domain cap:
      // bounded-heap MinKByKey aggregate (<= cap rows per domain reach
      // the exchange), row-identical to the row_number window form
      graft.ops.Sampling.domainQuota(
        s.read.parquet(s"$dir/documents.parquet"), cap = 10)
        .orderBy("doc_id")),
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    // Both validation variants must reproduce the full decision oracle.
    // The driver runs Verify at sf0.01; Verify generates the transcript
    // fixtures at this in-repo path before the oracle executes.
    "validate_fused" -> OracleSql.decisions(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "validate_relational" -> OracleSql.decisions(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "dedup_turns" -> OracleSql.dedup(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "sessionize" -> OracleSql.sessionize(TranscriptGen.fixtureDir("/root/testdata/sf0.01"), 2),
    "turn_join" -> OracleSql.turnJoin(TranscriptGen.fixtureDir("/root/testdata/sf0.01"), 3),
    "turn_join_outer" -> OracleSql.turnJoinOuter(TranscriptGen.fixtureDir("/root/testdata/sf0.01"), 3),
    "webdata_rows" -> OracleSql.webdata(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "conv_stats_salted" -> OracleSql.convStats(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "rollup_stats" -> OracleSql.rollupStats(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "topk_convs" -> OracleSql.topkConvs(TranscriptGen.fixtureDir("/root/testdata/sf0.01"), 10),
    "cardinality" -> OracleSql.cardinality(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "cardinality_approx" -> OracleSql.cardinalityApprox(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "cube_stats" -> OracleSql.cubeStats(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "set_ops" -> OracleSql.setOps(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "q3_join" -> OracleSql.q3Join,
    "q5_join" -> OracleSql.q5Join,
    "q14_join" -> OracleSql.q14Join,
    "udaf_stats" -> OracleSql.udafStats(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "validate_promoted" -> OracleSql.decisionsPromoted(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "semi_join" -> OracleSql.semiJoin,
    "anti_join" -> OracleSql.antiJoin,
    "asof_join" -> OracleSql.asofJoin,
    "asof_join_salted" -> OracleSql.asofJoin,
    "asof_join_auto" -> OracleSql.asofJoin,
    "minhash_pairs" -> OracleSql.minhashVerify,
    "simhash_pairs" -> OracleSql.simhashVerify,
    "lsh_cosine_pairs" -> OracleSql.lshCosineVerify,
    "semantic_dedup" -> OracleSql.semanticDedupVerify,
    "ivf_topk" -> OracleSql.ivfVerify,
    "pq_topk" -> OracleSql.pqVerify,
    "jl_distortion" -> OracleSql.jlDistortion,
    "ivf_topk_indexed" -> OracleSql.ivfIndexedVerify,
    "ivf_topk_appended" -> OracleSql.ivfAppendedVerify,
    "heavy_hitters" ->
      """SELECT w AS word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents)
        |WHERE len(w) > 0
        |GROUP BY w
        |ORDER BY cnt DESC, word
        |LIMIT 20""".stripMargin,
    "quantile_approx" -> OracleSql.quantileApprox(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "cep_match" -> OracleSql.cepMatches(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "tool_seq" -> OracleSql.toolSeq(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "grouping_sets_stats" -> OracleSql.groupingSetsStats(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "turn_latency" -> OracleSql.turnLatency(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "rolling_stats" -> OracleSql.rollingStats(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "window_tumbling" -> OracleSql.tumbling(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "window_sliding" -> OracleSql.sliding(TranscriptGen.fixtureDir("/root/testdata/sf0.01")),
    "curation_pipeline" -> OracleSql.curationPipeline,
    "dedup_exact" -> OracleSql.dedupExact,
    "ngram_jaccard" -> OracleSql.ngramJaccard,
    "line_dedup" -> OracleSql.lineDedup,
    "dedup_clusters" -> OracleSql.dedupClusters,
    "decontam" -> OracleSql.decontam,
    "pii_scan" -> OracleSql.piiScan,
    "text_quality" -> OracleSql.textQuality,
    "gopher_rules" -> OracleSql.gopherRules,
    "curation_pipeline2" -> OracleSql.curationPipeline2,
    "rep_signals" -> OracleSql.repSignals,
    "token_counts" -> OracleSql.tokenCounts,
    "bpe_token_counts" -> OracleSql.bpeTokenCounts,
    "lang_id" -> OracleSql.langId,
    "lang_id_trained" -> OracleSql.langIdTrained,
    "lm_score" -> OracleSql.lmScore,
    "perplexity_buckets" -> OracleSql.perplexityBuckets,
    "dsir_weights" -> OracleSql.dsirWeights,
    "dsir_resample" -> OracleSql.dsirResample,
    "page_rank" -> OracleSql.pageRank,
    "span_dedup" -> OracleSql.spanDedup,
    "quality_classifier" -> OracleSql.qualityClassifier,
    "doc_fingerprint" -> OracleSql.docFingerprint,
    "tfidf_top" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w
        |       WHERE len(word) > 0 GROUP BY 1, 2),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |        tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
        |      FROM tf JOIN df USING (word) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, word) AS rank FROM s)
        |SELECT doc_id, CAST(rank AS INT) AS rank, word, tf, df, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "cosine_topk" -> OracleSql.cosineTopK,
    "sq_topk" -> OracleSql.sqTopK,
    "multimodal_meta" -> OracleSql.multimodalMeta,
    "multimodal_features" -> OracleSql.multimodalFeatures,
    "pivot_stats" ->
      """SELECT lang,
        |  count(*) FILTER (WHERE len_bucket = 'short')  AS n_short,
        |  count(*) FILTER (WHERE len_bucket = 'medium') AS n_medium,
        |  count(*) FILTER (WHERE len_bucket = 'long')   AS n_long
        |FROM (SELECT lang,
        |        CASE WHEN length(text) < 200 THEN 'short'
        |             WHEN length(text) < 1000 THEN 'medium'
        |             ELSE 'long' END AS len_bucket
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "stratified_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n_stratum FROM documents GROUP BY 1),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk,
        |  CAST(ceil(c.n_stratum * 0.2) AS BIGINT) AS n_take
        |FROM r JOIN c USING (lang)
        |WHERE r.rk <= ceil(c.n_stratum * 0.2)
        |ORDER BY doc_id""".stripMargin,
    "domain_quota" ->
      """WITH r AS (SELECT source AS domain, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |SELECT domain, doc_id, CAST(rk AS BIGINT) AS rk FROM r
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,
    "hash_sample" ->
      """SELECT doc_id,
        |  substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
        |       THEN 'val' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
