package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}
import graft.profile.ProfileSession.ProfilingOps

/** Benchmark main: headline operator timings at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. The headline metric is the full-width profile —
  * the reference's core workload (every column of lineitem, one pass) — plus
  * the training-data ops at corpus scale.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")

    // High-cardinality vocabulary variant of the corpus: the synthetic
    // fixtures draw text from a ~31-word vocabulary, which makes the
    // bm25 / ngram-contamination term prefilters prune NOTHING locally —
    // their low-vocab bench rows time the worst case, not the typical
    // one. Suffixing every token with doc_id%64 multiplies the
    // vocabulary ~64x, so a query's terms match ~1/64 of the corpus and
    // the prefilters do the pruning they do on real corpora. Both
    // variants are benched; the *_keep_frac metrics record the realized
    // pruning.
    // Persisted ONCE and materialized during warmup: the per-token
    // transform+concat over the full corpus is fixture SYNTHESIS, not the
    // operator under test — timing it inside the _hc rows recorded 2-9x
    // phantoms in earlier rounds.
    val hcDocs: DataFrame = t("documents").select(col("doc_id"), col("source"),
      array_join(transform(split(col("text"), " "),
        tk => concat(tk, lit("_"), pmod(col("doc_id"), lit(64)))), " ")
        .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // multi-line corpus rewrite for the C4 row (8-word sentence lines),
    // persisted for the same reason as hcDocs
    val mlDocs: DataFrame = t("documents").select(col("doc_id"),
      regexp_replace(col("text"), "((\\w+ ){7}\\w+) ", "$1.\n").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Dataset.forceCount() lets Catalyst PRUNE the final operator's
    // unreferenced expressions: on a profile frame it deletes every
    // sketch update (measured at sf0.1: profile_wide150 0.46 s
    // "counted" vs 24.8 s forced — the committed r1-r15 profile rows
    // timed a distinct-on-keys, not profiling), and on any row ending
    // in an unreferenced aggregate it skips the final evaluation.
    // forceCount() counts the plan's OWN output (queryExecution.toRdd),
    // so every column of every operator evaluates — the cost a consumer
    // of the result actually pays. Row counts are identical to count().
    // SPARK_GRAFT_BENCH_COUNT_MODE=pruned restores the r1-r15 prunable
    // count() protocol — an ATTRIBUTION instrument, never a publishing
    // mode: running a riser row under both modes on the same code
    // separates "the r15 number was hollow" (pruned ~= r15 committed,
    // honest ~= r16 committed) from "the code regressed".
    val prunedCountMode =
      sys.env.get("SPARK_GRAFT_BENCH_COUNT_MODE").contains("pruned")
    implicit class ForceOps(private val ds: org.apache.spark.sql.Dataset[_]) {
      def forceCount(): Long =
        if (prunedCountMode) ds.count()
        else ds.queryExecution.toRdd.count()
    }

    val benches: Seq[(String, () => Long)] = Seq(
      // full-width single-pass profile of every lineitem column, grouped
      "profile_full_grouped" -> (() =>
        t("lineitem").newProfilingSession()
          .groupBy("l_returnflag", "l_linestatus").aggProfiles().forceCount()),
      // global single-row profile, all columns
      "profile_full_global" -> (() =>
        t("lineitem").newProfilingSession().aggProfiles().forceCount()),
      // time-windowed profile (weekly buckets)
      "profile_timewindow" -> (() =>
        t("lineitem").newProfilingSession()
          .withTimeColumn("l_shipdate", "7 days").aggProfiles().forceCount()),
      // standalone sketch aggs over 3 numeric + 1 string column
      "sketch_aggs" -> (() =>
        t("lineitem").groupBy(col("l_returnflag"))
          .agg(functions.kll_agg(col("l_extendedprice")).as("kll"),
            functions.theta_agg(col("l_partkey")).as("theta"),
            functions.hll_agg(col("l_orderkey")).as("hll"),
            functions.freq_items_agg(col("l_linestatus")).as("freq")).forceCount()),
      // relational: 3-way join + aggregation
      "join_agg" -> (() => {
        val li = t("lineitem"); val o = t("orders"); val c = t("customer")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
            count(lit(1))).forceCount()
      }),
      // dedup: minhash LSH candidate pairs over the document corpus
      // Releasable + per-pass release: the persisted signature cache is
      // keyed by logical plan, so a plain call would serve passes 2..N
      // the cached signatures and the min would stop measuring the
      // shingle/hash pipeline (the same honesty fix as the media trio)
      "dedup_minhash_lsh" -> (() => {
        val (pairs, rel) = Dedup.minHashLshPairsReleasable(t("documents"),
          "doc_id", "text", numHashes = 64, bands = 16, shingleK = 2)
        try pairs.forceCount() finally rel()
      }),
      // simhash every document
      "dedup_simhash" -> (() =>
        t("documents").select(Dedup.simHash(col("text"))).forceCount()),
      // ANN: brute-force top-10 for 100 queries over the corpus
      "ann_bruteforce" -> (() => {
        val emb = t("embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", k = 10).forceCount()
      }),
      // profile re-aggregation (merge path)
      "profile_merge" -> (() => {
        val fine = t("lineitem").newProfilingSession()
          .groupBy("l_returnflag", "l_linestatus").aggProfiles()
        graft.profile.ProfileSession.mergeProfiles(fine, Seq("l_returnflag"))
          .forceCount()
      }),
      // IVF ANN: 100 queries through centroid-pruned inverted lists
      "ann_ivf" -> (() => {
        val emb = t("embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4).forceCount()
      }),
      // IVF-PQ ANN: same pruning, candidates scored from 8-byte PQ codes
      // (ADC), bounded exact re-rank — the memory-scale path
      "ann_ivfpq" -> (() => {
        val emb = t("embeddings")
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4,
          m = 8, ksub = 16, rerank = 40).forceCount()
      }),
      // multi-band hyperplane LSH near-dup pairs. The synthetic corpus has
      // no natural near-dups (max pairwise cosine ~0.51, so a 0.8-threshold
      // run returns 0 rows and measures nothing real past candidate
      // generation) — plant perturbed copies of 10% of the corpus so the
      // bucket join, pair dedupe and exact-cosine verify all do real work.
      "dedup_embedding" -> (() => {
        val emb = t("embeddings").select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        val dups = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + lit(0.1)).otherwise(x)).as("embedding"))
        val (pairs, rel) = Dedup.embeddingNearDupsReleasable(
          emb.unionAll(dups), "vec_id", "embedding",
          threshold = 0.8, signBits = 8, bands = 8)
        try pairs.forceCount() finally rel()
      }),
      // gap-based sessionization + per-session stats over the event stream
      // (ts is TIMESTAMP; Sessionize's schema dispatch does the exact
      // epoch-micro arithmetic — same plan shape as q50)
      "sessionize" -> (() =>
        graft.ops.Sessionize.stats(t("events"),
          "user_id", "ts", gap = 14400L * 1000000L).forceCount()),
      // per-document tf-idf top terms (tokenize + tf shuffle + broadcast
      // df + bounded top-k)
      "tfidf_topterms" -> (() =>
        graft.ops.TextOps.tfIdfTopTerms(t("documents"), "doc_id", "text", 5)
          .forceCount()),
      // whylogs wire-format export of a grouped profile (write+reparse)
      "proto_export" -> (() => {
        val prof = t("lineitem").newProfilingSession()
          .groupBy("l_returnflag").aggProfiles()
        graft.io.ProfileIO.withProtoColumn(prof)
          .select(graft.io.ProfileIO
            .protoColumnStats(col("why_profile"), "l_quantity"))
          .forceCount()
      }),
      // IQR outlier screen over the full fact table (KLL quartiles +
      // broadcast fence count — the scale-safe two-pass plan)
      "iqr_outliers" -> (() =>
        graft.ops.Outliers.iqrStats(t("lineitem"), "l_extendedprice",
          Seq("l_returnflag", "l_linestatus")).forceCount()),
      // cross-corpus decontamination: first 10% of docs (perturbed) probed
      // against the full corpus through one bucket shuffle
      "contamination" -> (() => {
        val corpus = t("documents").select(col("doc_id"), col("text"))
        val probe = corpus.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            concat(col("text"), lit(" tail")).as("text"))
        // Releasable + per-pass release: r16 persists the signature
        // frame inside (the bucket-size probe is a second consumer), so
        // a plain call would warm-cache later passes and the min would
        // stop measuring the shingle/hash pipeline
        val (pairs, rel) = Dedup.crossCorpusNearDupsReleasable(
          corpus, probe, "doc_id", "text", threshold = 0.7, shingleK = 2)
        try pairs.forceCount() finally rel()
      }),
      // exact n-gram decontamination: 10% of docs (prefixed) probed
      // against the full corpus — probe grams broadcast, corpus side
      // joins map-side (no corpus shuffle)
      "contamination_ngram" -> (() => {
        val corpus = t("documents").select(col("doc_id"), col("text"))
        val probe = corpus.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            concat(lit("eval header : "), col("text")).as("text"))
        Dedup.ngramContamination(corpus, probe, "doc_id", "text",
          n = 8, minShared = 3).forceCount()
      }),
      // CCNet line-level dedup: frequent-line aggregate + adaptive
      // anti-join + reassembly over a token-per-line corpus rewrite
      "boilerplate_lines" -> (() => {
        val docs = t("documents").select(col("doc_id"),
          regexp_replace(col("text"), " ", "\n").as("text"))
        Dedup.removeFrequentLines(docs, "doc_id", "text",
          minDocFreq = 400L).forceCount()
      }),
      // LM sequence packing: full-corpus layout via the distributed
      // prefix sum (range exchange of 3 longs/row + per-pid window)
      "sequence_packing" -> (() => {
        val docs = t("documents").select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok"))
        val (packed, release) = graft.ops.Packing.packSequencesReleasable(
          docs, "doc_id", "n_tok", "doc_id", budget = 2048L)
        val n = packed.forceCount()
        release(); n
      }),
      // unigram-LM perplexity of every document (token-count shuffle +
      // AQE-decided vocabulary join + per-doc mean)
      "perplexity" -> (() =>
        graft.ops.TextOps.unigramPerplexity(t("documents"), "doc_id", "text")
          .forceCount()),
      // continuous drift monitor (q69 path): weekly windowed profiles
      // scored against a merged global reference, sketch-only
      "drift_monitor" -> (() => {
        val windows = t("lineitem").newProfilingSession()
          .withTimeColumn("l_shipdate", "7 days").aggProfiles()
        val reference = t("lineitem").newProfilingSession().aggProfiles()
        val edges = Seq(10000.0, 30000.0, 60000.0, 90000.0)
        graft.ops.Drift.againstReference(windows, reference,
          Map("l_extendedprice" -> edges), keep = Seq("window")).forceCount()
      }),
      // profile-driven validation: expectation checks evaluated from the
      // windowed profile frame alone (no raw re-scan after profiling)
      "validate" -> (() => {
        val prof = t("lineitem").newProfilingSession()
          .withTimeColumn("l_shipdate", "7 days").aggProfiles()
        graft.ops.Validation.report(prof, Seq(
          graft.ops.Validation.MinAtLeast("l_quantity", 1.0),
          graft.ops.Validation.MaxAtMost("l_quantity", 50.0),
          graft.ops.Validation.MeanBetween("l_quantity", 20.0, 30.0),
          graft.ops.Validation.NullFractionAtMost("l_quantity", 0.0),
          graft.ops.Validation.DistinctBetween("l_quantity", 40.0, 60.0),
          graft.ops.Validation.QuantileAtMost("l_extendedprice", 0.5, 1e6),
          graft.ops.Validation.TypeIs("l_quantity", "FRACTIONAL")),
          keep = Seq("window")).forceCount()
      }),
      // stored-binary viewer loop: export grouped profiles as delimited
      // wire binaries, read them back with the binaryFile-source viewer
      "viewer" -> (() => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_bench_viewer").toString
        val prof = t("lineitem").newProfilingSession()
          .groupBy("l_returnflag", "l_linestatus").aggProfiles()
        graft.io.ProfileIO.writeDelimitedBinaries(prof, tmp)
        graft.io.ProfileViewer.view(spark, s"$tmp/*.bin").forceCount()
      }),
      // Lending-Club-shaped wide profile: 150 numeric columns in ONE pass
      // (the reference's headline dataset is 100+ columns wide)
      "profile_wide150" -> (() => {
        val numeric = Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        val wide = t("lineitem").select(
          (0 until 150).map(i =>
            (col(numeric(i % numeric.length)) + lit(i)).as(s"c$i")): _*)
        wide.newProfilingSession().aggProfiles().forceCount()
      }),
      // reference parity: its widest in-repo dataset profiles 608 columns
      // in one pass (WhyLogsTest.scala:107-128 — brazillian_608_features
      // parquet, asserts 608 profiled columns). Same single
      // ObjectHashAggregate, 4x the state width of wide150 — proves
      // column-count scaling of the one-shuffle plan.
      "profile_wide608" -> (() => {
        val numeric = Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        val wide = t("lineitem").select(
          (0 until 608).map(i =>
            (col(numeric(i % numeric.length)) + lit(i)).as(s"c$i")): _*)
        wide.newProfilingSession().aggProfiles().forceCount()
      }),
      // interpolated bigram-LM perplexity of every document (two n-gram
      // count shuffles + three AQE-decided scoring joins)
      "bigram_perplexity" -> (() =>
        graft.ops.TextOps.bigramPerplexity(t("documents"), "doc_id", "text")
          .forceCount()),
      // SemDeDup survivors over the corpus with 10% planted exact copies
      // (k-means cells + in-cell pair generation + anti-join)
      "semdedup" -> (() => {
        val emb = t("embeddings")
        val dups = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"),
            col("label"))
        val (surv, rel) = Dedup.semDedupSurvivorsReleasable(
          emb.unionAll(dups), "vec_id", "embedding",
          threshold = 0.99, nCentroids = 16)
        try surv.forceCount() finally rel()
      }),
      // temperature-weighted source rebalancing (map-only corpus filter)
      "temperature_mix" -> (() =>
        graft.ops.Sampling.temperatureMix(t("documents"), "doc_id",
          "source", targetFraction = 0.5, temperature = 0.5).forceCount()),
      // token-budget prefix selection (distributed prefix sum + semi-join)
      "token_budget" -> (() => {
        val docs = t("documents").select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).as("n_tok"))
        graft.ops.Sampling.tokenBudgetSelect(docs, "doc_id", "n_tok",
          budget = 100000L).forceCount()
      }),
      // exact-substring dedup: repeated 8-token windows across the corpus
      // (hash-only counting shuffle + exemplar fetch join)
      "substring_dedup" -> (() =>
        Dedup.duplicatedSpans(t("documents"), "doc_id", "text",
          windowTokens = 8, minDocs = 2).forceCount()),
      // Bloom-accelerated exact decontamination: 10% of texts are the
      // probe; map-side membership prefilter + bounded confirm join
      "bloom_decontaminate" -> (() => {
        val corpus = t("documents")
        val probe = corpus.filter(col("doc_id") % 10 === 0)
        val (semi, release) = Dedup.bloomSemiJoinReleasable(corpus, probe,
          "text", numBits = 1L << 23, numHashFns = 5)
        val n = semi.forceCount(); release(); n
      }),
      // BM25 retrieval: 20 queries against the corpus, top-10 each
      // (broadcast term semi-join + bounded top-k)
      "bm25" -> (() => {
        val docs = t("documents")
        val queries = docs.filter(col("doc_id") < 20)
          .select(col("doc_id").as("query_id"),
            substring(col("text"), 1, 60).as("qtext"))
        val (top, release) = graft.ops.TextOps.bm25TopKReleasable(docs,
          "doc_id", "text", queries, "query_id", "qtext", k = 10)
        val n = top.forceCount(); release(); n
      }),
      // BM25 at the HIGH-CARDINALITY vocabulary: same shape, but the
      // term prefilter now prunes ~63/64 of the token stream map-side —
      // the realistic regime the low-vocab row can't show
      "bm25_hc" -> (() => {
        val docs = hcDocs
        val queries = docs.filter(col("doc_id") < 20)
          .select(col("doc_id").as("query_id"),
            substring(col("text"), 1, 60).as("qtext"))
        val (top, release) = graft.ops.TextOps.bm25TopKReleasable(docs,
          "doc_id", "text", queries, "query_id", "qtext", k = 10)
        val n = top.forceCount(); release(); n
      }),
      // exact n-gram decontamination at the high-cardinality vocabulary:
      // probe grams only match same-residue docs, so the broadcast join
      // discards ~63/64 of corpus grams map-side
      "contamination_ngram_hc" -> (() => {
        val corpus = hcDocs.select(col("doc_id"), col("text"))
        val probe = corpus.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            concat(lit("eval header : "), col("text")).as("text"))
        Dedup.ngramContamination(corpus, probe, "doc_id", "text",
          n = 8, minShared = 3).forceCount()
      }),
      // ingest text cleanup over the full corpus (row-local, zero
      // shuffle). first() + read the SUM, not count(): count(1) would
      // let ColumnPruning drop the normalizeText projection entirely
      // and the bench would time a column-less scan
      "text_normalize" -> (() =>
        t("documents").select(
          graft.ops.TextOps.normalizeText(col("text")).as("n"))
          .agg(sum(length(col("n"))).as("total_chars"))
          .first().getLong(0)),
      // Gopher quality battery over the full corpus (row-local rules;
      // sum a value column so pruning can't drop the computation)
      "gopher_quality" -> (() =>
        graft.ops.TextOps.gopherReport(t("documents"), "doc_id", "text")
          .agg(sum(col("passed")), sum(col("stop_hits")))
          .first().getLong(1)),
      // C4 line/page cleaning over the multi-line corpus rewrite
      // (persisted during warmup — fixture synthesis is not the
      // operator under test)
      "c4_clean" -> (() =>
        graft.ops.TextOps.c4Clean(mlDocs, "doc_id", "text")
          .agg(sum(col("n_lines_kept"))).first().getLong(0)),
      // sliding context-window chunking of every document
      "context_chunks" -> (() =>
        graft.ops.TextOps.contextChunks(t("documents"), "doc_id", "text",
          windowTokens = 32, strideTokens = 24).forceCount()),
      // DSIR importance weights: two bounded histograms + broadcast +
      // row-local scoring pass (target = 'en' docs)
      "dsir_weights" -> (() => {
        val raw = t("documents").select(col("doc_id"), col("text"),
          col("lang"))
        graft.ops.TextOps.dsirWeights(raw,
          raw.filter(col("lang") === "en"), "doc_id", "text")
          .agg(sum(col("logratio"))).first(); 1L
      }),
      // n-gram novelty of the corpus vs a 10% reference slice (hashed
      // gram keys cross the exchange, never gram text)
      "ngram_novelty" -> (() => {
        val corpus = t("documents").select(col("doc_id"), col("text"))
        graft.ops.TextOps.ngramNovelty(
          corpus.filter(col("doc_id") % 10 =!= 0),
          corpus.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 8).forceCount()
      }),
      // JL projection of every embedding to 16 dims (row-local)
      "random_project" -> (() => {
        t("embeddings").select(graft.ops.Similarity.randomProject(
          col("embedding").cast("array<double>"), 16).as("p"))
          .agg(sum(element_at(col("p"), 1))).first(); 1L
      }),
      // 3-epoch in-engine classifier training + full-corpus scoring
      "train_classifier" -> (() => {
        val d = t("documents").select(col("doc_id"), col("text"),
          (col("lang") === "en").cast("double").as("y"))
        val w = graft.ops.TextOps.trainHashedLogReg(d, "text", "y",
          nBuckets = 4096, epochs = 3)
        val bc = spark.sparkContext.broadcast(w)
        graft.ops.TextOps.linearQualityScore(d, "doc_id", "text", 4096,
          Some(bc)).agg(sum(col("score"))).first(); 1L
      }),

      "lang_id_trained" -> (() => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val d = t("documents").select(col("doc_id"), col("text"),
          col("lang"))
        val models = graft.ops.TextOps.trainLangIdOneVsRest(
          d, "text", "lang", langs, nBuckets = 4096, epochs = 1)
        graft.ops.TextOps.langIdTrained(d, "doc_id", "text", models)
          .agg(count(col("pred_lang"))).first(); 1L
      }),

      // ordered funnel + transition matrix over the event stream: one
      // shuffle each, chained window passes / lead window over one sort
      "funnel_paths" -> (() => {
        val ev = t("events")
        graft.ops.Funnel.depth(ev, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), Seq("event_id"))
          .agg(sum(col("depth"))).first()
        graft.ops.Funnel.transitions(ev, "user_id", "ts", "event_type",
          Seq("event_id")).forceCount()
      }),

      // DoReMi-lite solve (K-row aggregate + driver iteration) feeding
      // the mixture resampler (broadcast cutoffs, map-only corpus filter)
      "mixture_apply" -> (() => {
        val docs = t("documents")
        val d = docs.select(col("source"),
          log(lit(1.0) + length(col("text")).cast("double")).as("lp"),
          log(lit(1.0) + size(split(col("text"), " ")).cast("double"))
            .as("lr"))
        val w = graft.ops.Sampling.doremiWeights(d, "source", "lp", "lr")
        graft.ops.Sampling.applyMixtureWeights(docs, "source", "doc_id",
          w, targetFraction = 0.3).forceCount()
      }),

      // exact distributed ECDF over ~600k lineitem rows (counts
      // aggregate + prefix sum over distinct values + rank join-back)
      "percentile_rank" -> (() => {
        val li = t("lineitem").select(col("l_returnflag"),
          col("l_extendedprice"))
        val (ranked, release) = graft.ops.FeatureScale
          .percentileRanksReleasable(li, "l_extendedprice",
            Seq("l_returnflag"))
        try ranked.forceCount() finally release()
      }),

      // one aggregate per side + scalar array math; vectors never
      // shuffle
      "embedding_drift" -> (() => {
        val emb = t("embeddings")
        graft.ops.Drift.embeddingDrift(
          emb.filter(col("label") >= 5), emb.filter(col("label") < 5),
          "embedding").first()
        graft.ops.Drift.embeddingDriftByDim(
          emb.filter(col("label") >= 5), emb.filter(col("label") < 5),
          "embedding").forceCount()
      }),

      // Morton key + range layout + parquet write over lineitem (the
      // real clustering pass: stats agg, map-only interleave, one
      // range exchange, file write — an agg-only probe would let the
      // optimizer drop the sort)
      "zorder_layout" -> (() => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_bench_zorder").toString
        graft.io.ZOrderLayout.writeZOrdered(
          t("lineitem").select(col("l_orderkey"), col("l_extendedprice"),
            col("l_quantity")),
          Seq("l_extendedprice", "l_quantity"), tmp, bits = 16,
          numFiles = 8)
        8L
      }),

      // pairwise moments in ONE aggregation job over the full lineitem
      // width: input rows never shuffle, only moment buffers do
      "corr_matrix" -> (() =>
        graft.ops.Stats.corrMatrix(t("lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .forceCount()),

      // 3 power iterations over the customer->supplier purchase graph:
      // edges normalized + persisted once, per-iteration exchanges are
      // rank-sized
      "pagerank" -> (() => {
        val o = t("orders")
        val li = t("lineitem")
        val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("s:"), col("l_suppkey")).as("dst"))
        val (ranks, rel) = graft.ops.Graph.pageRankReleasable(
          edges, "src", "dst", None, iterations = 3)
        try ranks.forceCount() finally rel()
      }),

      // exact cosine 10-NN per labeled vector + neighborhood majority:
      // corpus broadcast-scored map-side, then two skinny id-pair joins
      "knn_label_noise" -> (() =>
        graft.ops.Similarity.knnLabelNoise(t("embeddings"),
          "vec_id", "embedding", "label", k = 10).forceCount()),

      // pairwise 8-gram Jaccard between sources: grams dedupe to
      // (group, hash) in one exchange reused by sizes + both join sides
      "source_overlap" -> (() =>
        graft.ops.TextOps.sourceOverlap(t("documents"),
          "source", "text", n = 8).forceCount()),

      // exact trailing-1h per-event stats: one hash exchange + sort,
      // single RANGE window over the full event table
      "rolling_window" -> (() =>
        graft.ops.EventStats.rollingWindowStats(t("events"),
          "user_id", "ts", "value", windowSeconds = 3600L).forceCount()),

      // blocked edit-distance self-linkage over customer names: block
      // equi-join + codegen levenshtein, no cartesian product
      // TPC-H names are a blocking worst case (shared prefix + equal
      // length puts everything in one block), so this measures the
      // quadratic in-block stage honestly on a bounded slice
      "fuzzy_join" -> (() => {
        val c = t("customer").filter(col("c_custkey") <= 1200)
          .select(col("c_custkey").as("id"), col("c_name").as("name"))
        graft.ops.Joins.fuzzyJoin(c, c, "id", "name", maxDist = 1)
          .forceCount()
      }),

      // 3 self-vote LPA rounds over the symmetrized purchase graph:
      // per-iteration exchanges carry (node, label) cells only
      "label_prop" -> (() => {
        val o = t("orders")
        val li = t("lineitem")
        val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("s:"), col("l_suppkey")).as("dst"))
        val (lbl, rel) = graft.ops.Graph.labelPropagationReleasable(
          edges, "src", "dst", iterations = 3)
        try lbl.forceCount() finally rel()
      }),

      // first/last-touch attribution for every purchase: one exchange
      // + sort serves both window passes
      "attribution" -> (() =>
        graft.ops.EventStats.touchAttribution(t("events"), "user_id",
          "ts", "event_type", "event_id", Seq("view", "click"),
          "purchase", lookbackSeconds = 3600L).forceCount()),

      // cosine k-means: 2 Lloyd passes + assignment, all map-only
      // with k-row aggregates — zero corpus shuffles
      "kmeans" -> (() =>
        graft.ops.Similarity.kmeansClusters(t("embeddings"),
          "vec_id", "embedding", k = 8, iterations = 2).forceCount()),

      // token counts map-side-combined, OLS over the bounded top-200
      "zipf" -> (() =>
        graft.ops.TextOps.zipfFit(t("documents"), "text", topN = 200)
          .forceCount()),

      // personalized PageRank from the nation-0 customer seeds:
      // 3 iterations, teleport + dangling mass to seeds
      "personalized_pr" -> (() => {
        val o = t("orders")
        val li = t("lineitem")
        val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("s:"), col("l_suppkey")).as("dst"))
        val seeds = t("customer").filter(col("c_nationkey") === 0)
          .select(concat(lit("c:"), col("c_custkey")).as("seed"))
        val (ranks, rel) = graft.ops.Graph.personalizedPageRankReleasable(
          edges, "src", "dst", seeds, "seed", None, iterations = 3)
        try ranks.forceCount() finally rel()
      }),

      // HITS on the purchase graph, 2 L1-normalized rounds; both edge
      // copies persist partitioned on their own update key
      "hits" -> (() => {
        val o = t("orders")
        val li = t("lineitem")
        val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("s:"), col("l_suppkey")).as("dst"))
        val (ha, rel) = graft.ops.Graph.hitsReleasable(
          edges, "src", "dst", iterations = 2)
        try ha.forceCount() finally rel()
      }),

      // triangle census of the order co-purchase graph (parts sharing
      // an order): degree-oriented wedge join, O(m^1.5) bound
      "triangles" -> (() => {
        val li = t("lineitem").filter(col("l_orderkey") <= 40000)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val edges = li.join(li.withColumnRenamed("p", "p2"), Seq("o"))
          .filter(col("p") < col("p2"))
          .select(col("p").as("src"), col("p2").as("dst"))
        graft.ops.Graph.triangleStats(edges, "src", "dst").forceCount()
      }),

      // full readability battery: row-local regexp counting + HOF fold,
      // one scan, no exchange — measures text-scan throughput
      "readability" -> (() => {
        t("documents").select(
          graft.ops.TextOps.readability(col("text")).as("r"))
          .agg(sum(col("r.n_syllables")), sum(col("r.flesch")))
          .first(); 1L
      }),

      // corpus PMI collocations: two vocab-sized count aggregates +
      // joins on the filtered bigram table
      "pmi_collocations" -> (() =>
        graft.ops.TextOps.pmiCollocations(t("documents"), "text",
          minCount = 5, topK = 50).forceCount()),

      // 8 BPE merges: one corpus collapse, then per-merge vocab-sized
      // aggregates + 1-row argmax collects
      "bpe_train" -> (() =>
        graft.ops.Tokenizer.bpeTrain(t("documents"), "text",
          merges = 8).forceCount()),

      // PCA: one bounded moment aggregate, driver Jacobi (d=64), then a
      // row-local broadcast projection pass
      "pca_project" -> (() => {
        val emb = t("embeddings")
        val m = graft.ops.Pca.fit(emb, "embedding")
        graft.ops.Pca.project(emb, "embedding", m, 16)
          .select(element_at(col("pca"), 1).as("p0"))
          .agg(sum(col("p0"))).first(); 1L
      }),

      // the survival family: KM curve + log-rank between even/odd
      // cohorts + RFM segmentation, all off the events table
      "survival" -> (() => {
        // the user-sized time-to-event frame persists across its two
        // consumers (KM + log-rank) — correct usage, like
        // series_analysis (r17): lazy reuse re-ran the 600k-event
        // aggregation once per op
        val tte = graft.ops.EventStats.timeToEvent(t("events"),
          "user_id", "ts", "event_type", "purchase")
          .select(col("key"), expr("duration div 3600000000").as("dh"),
            col("observed"))
          .persist()
        try {
          val n = graft.ops.EventStats.kaplanMeier(tte, "dh", "observed")
            .forceCount()
          val (lr, lrRel) = graft.ops.EventStats.logRankReleasable(
            tte.select(pmod(col("key"), lit(2)).cast("string").as("g"),
              col("dh"), col("observed")), "dh", "observed", "g")
          try lr.forceCount() finally lrRel()
          val (seg, segRel) = graft.ops.EventStats.rfmReleasable(
            t("events"), "user_id", "ts", "value")
          try seg.forceCount() finally segRel()
          n
        } finally tte.unpersist(blocking = false)
      }),

      // 190-pair source drift matrix off ONE corpus scan (per-group
      // KLL sketches + broadcast pair join)
      "psi_matrix" -> (() => {
        val (m, release) = graft.ops.Drift.psiMatrixReleasable(
          t("documents"), "source", "n_chars",
          Seq(150.0, 250.0, 350.0, 450.0))
        try m.forceCount() finally release()
      }),

      // ANN serving from the index at rest: write (clustering +
      // assignment, the one-time cost) + a 100-query batch probing the
      // stored lists with no corpus-side recompute
      "ivf_stored" -> (() => {
        val emb = t("embeddings")
        graft.ops.Similarity.writeIvfIndex(emb, "vec_id", "embedding",
          "graft_bench_ivf", nCentroids = 16, iterations = 2,
          numBuckets = 8)
        try graft.ops.Similarity.ivfTopKStored(
          emb.filter(col("vec_id") < 100), "graft_bench_ivf",
          "vec_id", "embedding", k = 10, nProbe = 4).forceCount()
        finally {
          spark.sql("DROP TABLE IF EXISTS graft_bench_ivf_centroids")
          spark.sql("DROP TABLE IF EXISTS graft_bench_ivf_lists")
        }
      }),

      // incremental dedup vs a stored LSH index: index write (the
      // one-time corpus cost) + a 500-doc batch probe where only
      // batch-derived rows shuffle
      "minhash_stored" -> (() => {
        val docs = t("documents").select(col("doc_id"), col("text"))
        graft.ops.Dedup.writeMinHashReference(docs, "doc_id", "text",
          "graft_bench_mh", numHashes = 64, bands = 16, shingleK = 3,
          numBuckets = 8)
        val batch = docs.filter(col("doc_id") < 500)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        try graft.ops.Dedup.minHashNearDupsStored(batch,
          "graft_bench_mh", "doc_id", "text", numHashes = 64,
          bands = 16, shingleK = 3, threshold = 0.8).forceCount()
        finally {
          spark.sql("DROP TABLE IF EXISTS graft_bench_mh_buckets")
          spark.sql("DROP TABLE IF EXISTS graft_bench_mh_sigs")
        }
      }),

      // score-quality screens: tie-corrected AUC off the distinct-score
      // prefix sum (no single-partition rank window) + the nBins
      // calibration aggregate, over a synthetic score on the events table
      "model_eval" -> (() => {
        val scored = t("events")
          .select((pmod(xxhash64(col("event_id")), lit(1000)) / 1000.0)
            .as("s"),
            (col("event_type") === "purchase").as("y"))
        val (a, rel) = graft.ops.ModelEval.aucReleasable(scored, "s", "y")
        try a.forceCount() finally rel()
        graft.ops.ModelEval.ece(scored, "s", "y", nBins = 20).forceCount()
      }),

      // PR-curve AP (multi-weight prefix sum over ~1k distinct scores)
      // + per-query ranking metrics over the full event stream (windows
      // partitioned by user — parallel at any corpus size)
      "ranking_eval" -> (() => {
        val scored = t("events")
          .select((pmod(xxhash64(col("event_id")), lit(1000)) / 1000.0)
            .as("s"),
            (col("event_type") === "purchase").as("y"))
        val (ap, rel) = graft.ops.ModelEval
          .averagePrecisionReleasable(scored, "s", "y")
        try ap.forceCount() finally rel()
        graft.ops.ModelEval.rankingReport(
          t("events").withColumn("rel",
            (col("event_type") === "purchase").cast("int")),
          "user_id", "event_id", "value", "rel", k = 10).forceCount()
      }),

      // two-sample tests at corpus scale: mann-whitney ranks ~600k
      // continuous values through the distributed prefix sum; welch and
      // the proportion z are single aggregates
      "ab_tests" -> (() => {
        val ev = t("events")
          .withColumn("grp",
            when(col("user_id") % 2 === 0, "a").otherwise("b"))
        graft.ops.Stats.welchTTest(ev, "grp", "value", "a", "b").forceCount()
        graft.ops.Stats.mannWhitney(ev, "grp", "value", "a", "b").forceCount()
        graft.ops.Stats.proportionTest(
          ev.withColumn("conv", col("event_type") === "purchase"),
          "grp", "conv", "a", "b").forceCount()
      }),

      // exact discrete quantiles of 600k prices: distinct-value counts
      // -> range-partitioned prefix sum -> 7 order statistics
      "exact_quantiles" -> (() =>
        graft.ops.FeatureScale.exactQuantiles(t("lineitem"),
          "l_extendedprice",
          Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)).forceCount()),

      // prefix-blocked Jaro-Winkler on a PATHOLOGICAL key space (64
      // base names -> huge shared-prefix blocks): a 5k-row slice times
      // raw scorer throughput on the worst case the other row avoids
      "name_match" -> (() => {
        val base = t("part").filter(col("p_partkey") < 5000)
          .select(col("p_partkey").as("id"),
            concat(col("p_name"), lit(" #"), col("p_partkey") % 100)
              .as("key"))
        val typod = base.select((col("id") + 1000000).as("id"),
          concat(substring(col("key"), 1, 2),
            substring(col("key"), 4, 1000000)).as("key"))
        graft.ops.Joins.nameMatchPairs(base, typod, "id", "key",
          minSim = 0.95).forceCount()
      }),

      // the Fellegi-Sunter shape at full width: 20k vs 20k, blocked on
      // an external high-entropy key (id mod 1000 standing in for a
      // zip code), names fuzzy-matched only inside executor-sized
      // blocks — how linkage is actually run when names are low-entropy
      "name_match_blocked" -> (() => {
        val base = t("part").select(col("p_partkey").as("id"),
          concat(col("p_name"), lit(" #"), col("p_partkey") % 100)
            .as("key"), pmod(col("p_partkey"), lit(1000)).as("blk"))
        val typod = base.select((col("id") + 1000000).as("id"),
          concat(substring(col("key"), 1, 2),
            substring(col("key"), 4, 1000000)).as("key"), col("blk"))
        graft.ops.Joins.nameMatchPairsBlocked(base, typod, "id", "key",
          "blk", minSim = 0.95).forceCount()
      }),

      // migration parity digest: md5 + hex-parse + mod-sum over 600k
      // rows x (1 row digest + 3 columns) in one map-side aggregate
      "table_checksum" -> (() =>
        graft.ops.Diagnostics.tableChecksum(t("lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_returnflag")).forceCount()),

      // hourly series ops: dense 720-bucket series from 600k events —
      // additive decomposition + 48-lag autocorrelation via shifted
      // equi-joins (no global-sort windows), the exact change-point
      // from one prefix-sum pass, and the Theil-Sen median of 259k
      // pairwise slopes through the rank machinery
      "series_analysis" -> (() => {
        // the 720-row series persists across the four consumers — the
        // recommended usage (r17: the lazy frame re-ran the 600k-event
        // bucketing aggregate once per op)
        val series = graft.ops.EventStats.eventSeries(
          t("events"), "ts", bucketSeconds = 3600L).persist()
        try {
          graft.ops.EventStats.decompose(series, "t", "n", period = 24,
            trendWindow = 12).forceCount()
          graft.ops.EventStats.acf(series, "t", "n", maxLag = 48).forceCount()
          graft.ops.EventStats.changePoint(series, "t", "n").forceCount()
          graft.ops.EventStats.trendSlope(series, "t", "n").forceCount()
        } finally series.unpersist(blocking = false)
      }),

      // audio dedup e2e: synthesize white-noise WAVs executor-side
      // (audio bytes never shuffle), Goertzel-fingerprint every clip,
      // pair via the bucketed (block, fp) self-match — decode +
      // spectral throughput of the audio screen
      "audio_dedup" -> (() => {
        import spark.implicits._
        val ids = t("documents").filter(col("doc_id") < 2000)
          .select(col("doc_id")).as[Long]
        val clips = ids.map(id =>
            (id, graft.ops.Media.synthesizeWavNoise(id)))
          .toDF("doc_id", "blob")
          .unionAll(ids.filter(col("doc_id") < 200).map(id =>
            (id + 100000L, graft.ops.Media.synthesizeWavNoise(id)))
            .toDF("doc_id", "blob"))
        val (pairs, rel) = graft.ops.Media.audioNearDupsReleasable(
          clips, "doc_id", "blob", windowFrames = 64,
          minSharedBlocks = 1)
        try pairs.forceCount() finally rel()
      }),

      // stupid-backoff trigram LM at the pruned-LM floor: three n-gram
      // count shuffles + five AQE-decided scoring joins — the heaviest
      // member of the perplexity family
      "trigram_perplexity" -> (() =>
        graft.ops.TextOps.trigramPerplexity(t("documents"), "doc_id",
          "text", minCount = 2L).forceCount()),

      // DCT perceptual-hash dedup e2e: synthesize PPMs executor-side,
      // 32x32 gray + 2D DCT per image, banded Hamming pair join over
      // planted exact copies — the frequency-domain image screen
      "phash_dups" -> (() => {
        import spark.implicits._
        val ids = t("documents").filter(col("doc_id") < 3000)
          .select(col("doc_id")).as[Long]
        val blobs = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
          .toDF("doc_id", "blob")
          .unionAll(ids.filter(col("doc_id") < 300).map(id =>
            (id + 100000L, graft.ops.Media.synthesizePpm(id)))
            .toDF("doc_id", "blob"))
        val (pairs, rel) = graft.ops.Media.pHashNearDupsReleasable(
          blobs, "doc_id", "blob", maxHamming = 0)
        try pairs.forceCount() finally rel()
      }),

      // video dedup e2e: synthesize GVID containers with planted
      // copies, decode + aHash every sampled frame in one
      // partition-local pass, pair via capped per-hash buckets — the
      // fourth dedup modality tracked like audio_dedup
      "video_dedup" -> (() => {
        import spark.implicits._
        val ids = t("documents").filter(col("doc_id") < 2000)
          .select(col("doc_id")).as[Long]
        val vids = ids.map(id => (id, graft.ops.Media.synthesizeGvid(id,
            3 + (id % 3).toInt)))
          .toDF("doc_id", "blob")
          .unionAll(ids.filter(_ < 200).map(id =>
            (id + 100000L, graft.ops.Media.synthesizeGvid(id,
              3 + (id % 3).toInt)))
            .toDF("doc_id", "blob"))
        val (pairs, rel) = graft.ops.Media.videoNearDupsReleasable(
          vids, "doc_id", "blob", everyN = 1, minSharedFrames = 2)
        try pairs.forceCount() finally rel()
      }),

      // semantic decontamination e2e: 500-vector eval side broadcast
      // against the embedding corpus with 10% planted leaks — the
      // map-only pair scan of the embedding-space screen
      "semantic_decontam" -> (() => {
        val emb = t("embeddings")
        val eval = emb.filter(col("vec_id") % 10 === 0)
          .limit(500)
        graft.ops.Similarity.semanticContamination(emb, eval,
          "vec_id", "embedding", threshold = 0.99).forceCount()
      }),

      // video ingest e2e: synthesize GVID containers executor-side
      // (partition-local, blobs never shuffle), sample every 2nd frame
      // through the byte-walk decode, and dedup-hash each sampled frame
      // (aHash) — the multimodal family's decode+feature throughput row
      // ImageIO round trip at corpus width: PNG encode (the synth) +
      // sniffing decode + quality screen + perceptual hashes, all
      // partition-local — measures the real JDK codec throughput
      "image_decode" -> (() => {
        import spark.implicits._
        val blobs = t("documents").filter(col("doc_id") < 4000)
          .select(col("doc_id")).as[Long]
          .map(id => (id, graft.ops.Media.synthesizePng(id)))
          .toDF("doc_id", "blob")
        val q = graft.ops.Media.imageQualityStats(blobs, "doc_id", "blob")
        val h = graft.ops.Media.imageHashes(blobs, "doc_id", "blob")
        q.join(h, q("id") === h("id"))
          .agg(countDistinct(col("ahash")), sum(col("entropy")))
          .first(); 1L
      }),

      "video_frames" -> (() => {
        import spark.implicits._
        val vids = t("documents").filter(col("doc_id") < 4000)
          .select(col("doc_id")).as[Long]
          .map(id => (id, graft.ops.Media.synthesizeGvid(id,
            3 + (id % 3).toInt)))
          .toDF("doc_id", "blob")
        val frames = graft.ops.Media.videoFrameSample(vids, "doc_id",
            "blob", everyN = 2)
          .select((col("id") * 100 + col("frame_idx")).as("fid"),
            col("frame"))
        graft.ops.Media.imageHashes(frames, "fid", "frame")
          .agg(countDistinct(col("ahash"))).first(); 1L
      }),

      // the deflate-ratio quality screen over the full document table:
      // one partition-local zlib pass, the cheapest model-free
      // repetitiveness filter
      "compression_ratio" -> (() => {
        graft.ops.TextOps.compressionRatio(t("documents"), "doc_id", "text")
          .agg(sum(col("compressed_bytes")), count(lit(1)))
          .first(); 1L
      }),

      // header-only metadata over the SAME blobs image_decode fully
      // decodes — the row pair quantifies what walking headers instead
      // of pixels buys at corpus scale
      "image_meta" -> (() => {
        import spark.implicits._
        val blobs = t("documents").filter(col("doc_id") < 4000)
          .select(col("doc_id")).as[Long]
          .map(id => (id, graft.ops.Media.synthesizePng(id)))
          .toDF("doc_id", "blob")
        graft.ops.Media.imageMeta(blobs, "doc_id", "blob")
          .agg(sum(col("width") * col("height")), count(lit(1)))
          .first(); 1L
      }),

      // wide-radius Hamming join at corpus width through multi-index
      // hashing (the regime that REFUSED past 100k hashes in r14):
      // SimHash the full document table plus planted one-word edits,
      // join at radius 12 (probe expansion 697 buckets/band) — counts
      // the planted recoveries so the row measures the whole
      // fingerprint -> probe-join -> verify pipeline
      // Releasable + per-pass release, like the dedup trio: the
      // persisted fingerprint frame is plan-keyed, so later passes of a
      // plain call sometimes read the cache (the committed f1/f2 runs
      // measured 12.6 vs 4.5 s for the SAME row depending on whether
      // pass 1's cache entry got reused) — the honest row recomputes
      // the fingerprint -> probe-join -> verify pipeline every pass
      "mih_hamming" -> (() => {
        val docs = t("documents").select(col("doc_id"), col("text"))
        val edits = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("edited "), expr("substring(text, 8)")).as("text"))
        val (dups, rel) = graft.ops.Dedup.simHashNearDupsReleasable(
          docs.unionAll(edits), "doc_id", "text", maxHamming = 12)
        try {
          val res = dups
            .filter(col("id_b") === col("id_a") + 10000000L)
            .agg(count(lit(1)))
          val out = res.first().getLong(0)
          // triage aid (SPARK_GRAFT_BENCH_EXPLAIN=mih_hamming): the
          // executed join strategies per pass on stderr — attributes
          // the slow-plateau mode (AQE broadcast vs sort-merge flips
          // near the threshold vs JIT tiering)
          if (sys.env.get("SPARK_GRAFT_BENCH_EXPLAIN")
              .exists(_.split(",").contains("mih_hamming"))) {
            val joins = res.queryExecution.executedPlan.toString
              .linesIterator.map(_.trim)
              .filter(l => l.contains("Join") || l.contains("Exchange"))
              .map(_.take(150)).toSeq
            System.err.println(
              s"[explain] mih joins:\n  ${joins.mkString("\n  ")}")
          }
          out
        } finally rel()
      }))

    // JVM/codegen warmup on tiny slices so timings measure the operators,
    // not the first-call whole-stage-codegen compile of each plan shape.
    // Every warm statement is individually shielded: a warmup failure
    // must never abort the run (the r11 artifact was a crash log because
    // ONE unguarded warmup expression failed analysis) — the timed loop
    // below records the real failure per-row.
    def warm(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        System.err.println(s"[bench] warmup failed (non-fatal): $e")
      }
    warm(t("lineitem").limit(1000).newProfilingSession().aggProfiles().forceCount())
    warm(Dedup.minHashLshPairs(t("documents").limit(200), "doc_id", "text",
      numHashes = 64, bands = 16, shingleK = 2).forceCount())
    warm(t("documents").limit(200).select(Dedup.simHash(col("text"))).forceCount())
    val warmEmb = t("embeddings").limit(100)
    warm(Similarity.bruteForceTopK(warmEmb, warmEmb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 2).forceCount())
    warm(Similarity.ivfPqTopK(warmEmb, warmEmb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 2, nCentroids = 4, nProbe = 2,
      m = 8, ksub = 4, rerank = 5).forceCount())
    warm(graft.ops.TextOps.tfIdfTopTerms(t("documents").limit(200),
      "doc_id", "text", 2).forceCount())
    warm(graft.ops.Sessionize.stats(t("events").limit(500),
      "user_id", "ts", gap = 14400L * 1000000L).forceCount())
    warm(graft.ops.Outliers.iqrStats(t("lineitem").limit(1000),
      "l_extendedprice", Seq("l_returnflag")).forceCount())
    warm(graft.ops.TextOps.unigramPerplexity(t("documents").limit(200),
      "doc_id", "text").forceCount())
    val warmDocs = t("documents").limit(200).select(col("doc_id"), col("text"))
    warm(Dedup.ngramContamination(warmDocs, warmDocs.limit(20), "doc_id",
      "text", n = 8, minShared = 3).forceCount())
    warm {
      val (p, rel) = graft.ops.Packing.packSequencesReleasable(
        warmDocs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok")),
        "doc_id", "n_tok", "doc_id", budget = 2048L)
      p.forceCount(); rel()
    }
    warm(graft.ops.TextOps.bigramPerplexity(warmDocs, "doc_id", "text").forceCount())
    warm(Dedup.semDedupSurvivors(warmEmb, "vec_id", "embedding",
      threshold = 0.99, nCentroids = 4).forceCount())
    warm(graft.ops.Sampling.temperatureMix(t("documents").limit(200), "doc_id",
      "source", targetFraction = 0.5, temperature = 0.5).forceCount())
    warm(Dedup.duplicatedSpans(warmDocs, "doc_id", "text",
      windowTokens = 8, minDocs = 2).forceCount())
    warm {
      val (semi, rel) = Dedup.bloomSemiJoinReleasable(warmDocs,
        warmDocs.limit(20), "text", numBits = 1L << 16, numHashFns = 5)
      semi.forceCount(); rel()
    }
    warm(warmDocs.select(graft.ops.TextOps.readability(col("text"))
      .as("r")).agg(sum(col("r.n_words"))).first())
    warm(graft.ops.TextOps.pmiCollocations(warmDocs, "text", 2, 5).forceCount())
    warm(graft.ops.Tokenizer.bpeTrain(warmDocs, "text", merges = 2).forceCount())
    warm {
      val m = graft.ops.Pca.fit(warmEmb, "embedding")
      graft.ops.Pca.project(warmEmb, "embedding", m, 4).forceCount()
    }
    warm(graft.ops.TextOps.bm25TopK(warmDocs, "doc_id", "text",
      warmDocs.limit(3).select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 40).as("qtext")),
      "query_id", "qtext", k = 3).forceCount())
    warm {
      import spark.implicits._
      val vv = t("documents").limit(8).select(col("doc_id")).as[Long]
        .map(id => (id, graft.ops.Media.synthesizeGvid(id, 2)))
        .toDF("doc_id", "blob")
      val fr = graft.ops.Media.videoFrameSample(vv, "doc_id", "blob", 2)
        .select(col("id").as("fid"), col("frame"))
      graft.ops.Media.imageHashes(fr, "fid", "frame").forceCount()
    }
    // the media-dedup trio's plan shapes (synthesize -> decode/hash ->
    // capped bucket pairs -> verify): their sub-second windows carried
    // 2-8 s of concurrent JIT when first-called inside the timed loop
    // (r15 committed regression cluster), so compile them here like
    // every other hot shape
    warm {
      import spark.implicits._
      val wids = t("documents").limit(8).select(col("doc_id")).as[Long]
      val clips = wids.map(id =>
        (id, graft.ops.Media.synthesizeWavNoise(id))).toDF("doc_id", "blob")
      val (p, rel) = graft.ops.Media.audioNearDupsReleasable(
        clips, "doc_id", "blob", windowFrames = 64, minSharedBlocks = 1)
      try p.forceCount() finally rel()
    }
    warm {
      import spark.implicits._
      val wids = t("documents").limit(8).select(col("doc_id")).as[Long]
      val blobs = wids.map(id =>
        (id, graft.ops.Media.synthesizePpm(id))).toDF("doc_id", "blob")
      val (p, rel) = graft.ops.Media.pHashNearDupsReleasable(
        blobs, "doc_id", "blob", maxHamming = 0)
      try p.forceCount() finally rel()
    }
    warm {
      import spark.implicits._
      val wids = t("documents").limit(8).select(col("doc_id")).as[Long]
      val vids = wids.map(id =>
        (id, graft.ops.Media.synthesizeGvid(id, 2))).toDF("doc_id", "blob")
      val (p, rel) = graft.ops.Media.videoNearDupsReleasable(
        vids, "doc_id", "blob", everyN = 1, minSharedFrames = 1)
      try p.forceCount() finally rel()
    }
    warm(hcDocs.count()) // materialize the persisted fixtures OUTSIDE timing
    warm(mlDocs.count())

    def loadavg1m(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // Each row is the MIN of several timed passes: a single pass under
    // unknown machine load recorded 2-9x phantoms (r6), and min-of-3
    // still polluted sub-second rows when the driver machine was
    // contended (r8/r9 artifacts). Hardened loop: cheap rows keep
    // sampling (up to maxIters) until the min rests on enough
    // evidence (the time-budget rule below), per-row 1-minute loadavg
    // is recorded so noise is attributable after the fact, and a row
    // whose loadavg exceeds `loadMax` is explicitly marked contended
    // in the artifact rather than trusted silently.
    val baseIters =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val maxIters =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_ITERS", "10").toInt
        .max(baseIters)
    // fastRowFloor caps the depth the time-budget rule may ask for
    // (only the spread re-sampler may push past it, to maxIters).
    val fastRowFloor =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FAST_FLOOR", "8").toInt
        .max(baseIters).min(maxIters)
    // r16: the fixed-threshold rule (< fastRowSec -> 8 passes, >= -> 3)
    // was itself a cliff — random_project sat at 1.03-1.07 s, drifted
    // just past the 1.0 s line inside the degraded-JVM closing run,
    // got only 3 un-warmed passes, and published 1.072 s while an
    // isolated idle run of the SAME code measures 0.715 s (== the r14
    // committed value; jit_ms 1746 across its 8-pass window names the
    // warmup). Sampling depth is now a smooth TIME BUDGET: each row
    // keeps sampling until ~rowBudgetSec of passes have accumulated,
    // clamped to [baseIters, fastRowFloor] — sub-second rows still get
    // the full 8-pass floor, 1-2 s rows get 4-7 passes instead of
    // falling off a cliff to 3, and multi-second rows keep min-of-3
    // (the graph rows additionally get the untimed warmup pass).
    val rowBudgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ROW_BUDGET_SEC", "7.0").toDouble
    // r13 lesson: several graph rows ran under neighbor load (spread
    // up to 4.01) yet published as if they measured code — the loadavg
    // gate alone cannot tell the bench's own 32 threads from a noisy
    // neighbor. Spread is self-relative evidence: a row whose 2nd-best
    // pass is >spreadMax x its best was noisy WITHIN this run, so keep
    // re-sampling it (up to maxIters) until the min rests on two
    // agreeing passes or the budget is spent.
    val spreadMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD_MAX", "1.3").toDouble
    // Contention is judged on loadavg NORMALIZED by core count: the raw
    // loadavg of an otherwise-idle local[32] bench run is ~1.5-3 (the
    // bench's own executors), so an absolute threshold either cries wolf
    // on every run or never fires. The bench's own steady-state is
    // ~0.1x cores; the default flags only loads well above that —
    // i.e. a genuinely busy machine, not the bench itself.
    val cores = Runtime.getRuntime.availableProcessors().max(1)
    // 0.35 x cores (= 11.2 on 32): r13's graph rows ran at loadavg up
    // to 9.0 without tripping the old 0.5 gate; the bench's own steady
    // state is ~0.1 x cores, so 0.35 still never cries wolf on itself
    // while catching a genuinely busy machine. The spread re-sampler
    // above is the finer instrument for transient neighbors.
    val loadMaxFrac =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_MAX_FRAC", "0.35").toDouble
    val loadMax = loadMaxFrac * cores
    val loadBefore = loadavg1m()
    case class RowResult(name: String, sec: Double, iters: Int,
        spread: Double, load: Double, contended: Boolean, failures: Int,
        firstIterSec: Double, gcMs: Long, jitMs: Long,
        warmupIters: Int, warmupSec: Double)
    // The iterative graph rows (one third of the full-run wall clock)
    // carried 10-14 s of JIT-compiler time INSIDE their 3-pass windows
    // (r15 bimodality postmortem: full-run totals swung 97 -> 112-121 s
    // on identical code while in-run spreads sat at ~1.01 — accumulated
    // driver-JVM compiler state, not machine load). A tiny warm() slice
    // cannot pre-compile them: their hot loops only tier up at full
    // iteration depth. So these rows get one UNTIMED full warmup pass
    // before the timed window — excluded from the min, recorded in the
    // artifact (`warmup_iters`/`warmup_sec`) so cross-round readers see
    // the protocol, not just the number.
    // mih_hamming joined the set in r16: with the plan-keyed cache
    // released per pass (honest protocol), its first pass carries ~10 s
    // of JIT (first_iter 13-14.6 s vs 4.4 s steady) and in one committed
    // run the compiler never tiered up inside the 3-pass window (all
    // three passes ~12.6 s, spread 1.03 — the graph-row failure mode)
    // profile_wide608 joined in r16-close: consecutive honest runs
    // landed 16.9 vs 24.8 s with tight in-run spreads (1.01/1.03) and
    // the slow run carrying 1.7x the GC — the heaviest row rides
    // accumulated JVM state exactly like the graph cluster
    val warmupPassRows: Set[String] =
      Set("pagerank", "label_prop", "hits", "personalized_pr",
        "mih_hamming", "profile_wide608")
    // Between-pass/between-row DRAIN (bench-only protocol, r17): a
    // pass leaves async debris behind — unpersist(blocking=false)
    // block removals in flight, and ContextCleaner work that only
    // starts once the pass's RDD/broadcast/shuffle references are
    // GC'd (shuffle registrations otherwise pile up in the
    // MapOutputTracker for the whole run). The r16 committed pagerank
    // row measured its untimed warmup at 10.7 s and then >= 25 s on
    // EVERY timed pass of identical code — cross-pass JVM decay, not
    // the operator (isolated runs of the same row: min 5.8 s <=
    // warmup 11.0 s). A full GC promotes the dropped references to
    // the cleaner queue and the sleep lets it drain; it runs OUTSIDE
    // every timed window — before each row, and between passes of the
    // heavy warmup-protocol rows.
    def drainJvm(): Unit = {
      System.gc()
      Thread.sleep(150)
    }
    val drainBetweenPassRows: Set[String] = warmupPassRows + "triangles"
    // JVM-state confound meters (r15 bimodality triage: full-run
    // totals swung 97 -> 112 s on identical code with tight in-run
    // spreads, while isolated fresh-JVM runs of the same rows landed
    // mid-range — accumulated driver-JVM state, not a machine
    // lottery). Per-row GC and JIT-compilation time deltas make that
    // confound READABLE in the artifact instead of inferred.
    def gcTotalMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def jitTotalMs(): Long = {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported)
        c.getTotalCompilationTime
      else 0L
    }
    // dev aid: SPARK_GRAFT_BENCH_ONLY=fuzzy_join,pagerank times just
    // the named rows (prefix match); unset = all rows (driver mode)
    val onlyRows = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selectedBenches = onlyRows match {
      case Some(ps) =>
        benches.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => benches
    }
    // triage aid (SPARK_GRAFT_BENCH_MEMLOG=1): per-row storage posture on
    // stderr — persisted-RDD count and BlockManager remaining storage
    // memory — for attributing session-aged slowdowns (the mih full-run
    // mode: per-task CPU 6x on identical plans with GC/JIT/load all
    // clean by the row meters)
    val memLog = sys.env.get("SPARK_GRAFT_BENCH_MEMLOG").contains("1")
    val results = selectedBenches.map { case (name, fn) =>
      drainJvm() // every row starts from a drained JVM
      if (memLog) {
        val sc = spark.sparkContext
        val mem = sc.getExecutorMemoryStatus.map { case (_, (max, rem)) =>
          s"${rem / (1024 * 1024)}/${max / (1024 * 1024)}MB"
        }.mkString(",")
        System.err.println(s"[memlog] $name: persistedRdds=" +
          s"${sc.getPersistentRDDs.size} storageFree=$mem heapUsed=" +
          s"${(Runtime.getRuntime.totalMemory() -
            Runtime.getRuntime.freeMemory()) / (1024 * 1024)}MB")
      }
      val loadPre = loadavg1m()
      val gcPre = gcTotalMs()
      val jitPre = jitTotalMs()
      // only SUCCESSFUL passes may set the row minimum: a throwing fn()
      // returns in ~ms, and recording that time both fakes a fast row
      // and (being cheap) re-runs the broken bench to the budget depth
      val okTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      var attempts = 0
      var failures = 0
      var rows = -1L
      def pass(): Unit = {
        attempts += 1
        val t0 = System.nanoTime()
        try {
          rows = fn()
          okTimes += (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          failures += 1
          System.err.println(s"[bench] $name failed: $e")
        }
        if (drainBetweenPassRows(name)) drainJvm()
      }
      // spread = 2nd-best/best: ~1.0 means the min is reproducible, a
      // large spread means the row was noisy even within this run
      def spreadNow(): Double =
        if (okTimes.size < 2) Double.MaxValue
        else okTimes.sorted.apply(1) / math.max(okTimes.min, 1e-9)
      // ADAPTIVE warmup depth (r17): one warmup pass is not always
      // enough — in full-board runs the driver JVM's compile queue is
      // deep by the time the late heavy rows arrive, and the hottest
      // generated loop can take SEVERAL full passes to tier up
      // (measured on mih_hamming: warmup 10.96 s, first timed pass
      // 10.49 s, then 1.32 s once the compiler caught up — while the
      // same row from a fresh/short session warms in one pass; the
      // r17 "session-sticky bimodal" rows were 3-pass windows that
      // ended before tiering did). Warmup passes stay UNTIMED and
      // repeat (up to SPARK_GRAFT_BENCH_WARMUP_MAX, default 3) while
      // the pass time is still improving by > 30% — so the timed
      // window starts at the steady state the row documents, never
      // inside the compile transient. warmup_sec records the LAST
      // warmup pass (the honesty bar min <= 1.2 x warmup compares
      // steady state to steady state).
      val warmupMax = math.max(1,
        sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP_MAX", "3").toInt)
      var warmupIters = 0
      var warmupSec = -1.0
      if (warmupPassRows(name)) {
        var prev = -1.0
        var go = true
        while (go && warmupIters < warmupMax) {
          val w0 = System.nanoTime()
          try { fn(); warmupSec = (System.nanoTime() - w0) / 1e9 }
          catch { case e: Throwable =>
            go = false
            System.err.println(s"[bench] $name warmup pass failed " +
              s"(non-fatal, timed loop records the real failure): $e")
          }
          warmupIters += 1
          drainJvm()
          if (go) {
            // pass 2 always runs (it is what reveals a cold pass 1);
            // pass 3+ only while still improving > 30%
            go = prev < 0.0 || warmupSec < 0.7 * prev
            prev = warmupSec
          }
        }
      }
      (1 to baseIters).foreach(_ => pass())
      // time-budget depth: target ceil(budget / min) passes so cheap rows
      // accumulate JIT burn-in while expensive rows stay at min-of-3; the
      // target re-evaluates as the min improves (a row whose min drops
      // under warmup earns more passes, exactly when they matter)
      def targetIters(): Int =
        if (okTimes.isEmpty) baseIters
        else math.min(fastRowFloor, math.max(baseIters,
          math.ceil(rowBudgetSec / math.max(okTimes.min, 1e-9)).toInt))
      while (okTimes.nonEmpty &&
        (attempts < targetIters() || spreadNow() > spreadMax) &&
        attempts < maxIters) pass()
      val sec = if (okTimes.nonEmpty) okTimes.min else -1.0
      val spread = if (okTimes.size < 2) 1.0 else spreadNow()
      // re-sample after the passes: a row contended mid-run (passes can
      // span many seconds x up to maxIters) would be missed by the
      // pre-sample alone
      val loadPost = loadavg1m()
      val rowLoad = math.max(loadPre, loadPost)
      // contended = the minimum did NOT reproduce within spreadMax even
      // after the re-sampling budget AND the gap is material (>100 ms —
      // scheduler jitter on a 0.1 s row is not contention). The
      // condition that actually invalidates a cross-round delta. Load
      // alone cannot decide it at local[32]: the 1-minute loadavg lags
      // the bench's OWN 32-thread rows (measured 11-12 right after the
      // graph rows while spreads sat at 1.01), so load is recorded per
      // row as evidence and only the PRE-RUN machine load gates the
      // artifact as a whole.
      val secondBest =
        if (okTimes.size < 2) sec else okTimes.sorted.apply(1)
      // corroborating per-row load evidence (ADVICE r14): a sustained
      // external load that starts after loadBefore was read and slows
      // every pass uniformly leaves spread ~1.0 — but it keeps BOTH the
      // row's pre and post 1-minute loadavg high. The bar sits at
      // 1.5x the gate (~17 on 32 cores): the bench's OWN 32-thread
      // bursts measured 11-12 at peak (r13), so plain > loadMax would
      // false-flag rows adjacent to the heavy graph cluster; only load
      // the bench cannot self-generate trips this.
      val sustainedLoad =
        math.min(loadPre, loadPost) > loadMax * 1.5
      val contended =
        (spread > spreadMax && secondBest - sec > 0.1) || sustainedLoad
      // first successful pass vs the min separates JIT/warmup cost from
      // steady state in cross-round regression triage
      val firstIterSec = if (okTimes.nonEmpty) okTimes.head else -1.0
      val gcMs = gcTotalMs() - gcPre
      val jitMs = jitTotalMs() - jitPre
      System.err.println(
        f"[bench] $name%-24s $sec%8.3f s  ($rows rows, min of ${okTimes.size}, " +
          f"spread $spread%.2f, first $firstIterSec%.3f, load $rowLoad%.2f, " +
          f"gc ${gcMs}ms, jit ${jitMs}ms" +
          (if (warmupIters > 0) f", warmup $warmupSec%.3f" else "") +
          f"${if (contended) ", CONTENDED" else ""}" +
          (if (failures > 0) s", $failures FAILED" else "") + ")")
      RowResult(name, sec, okTimes.size, spread, rowLoad, contended,
        failures, firstIterSec, gcMs, jitMs, warmupIters, warmupSec)
    }
    val loadAfter = loadavg1m()
    // sustained EXTERNAL load that starts after loadBefore was read
    // slows every pass uniformly (spread ~1.0, per-row flag blind) —
    // but it also keeps the 1-minute loadavg high at the run's
    // CALMEST moment, which the bench's own bursts do not (they decay
    // between heavy rows: observed floor 1.5-2.6 vs peaks 11-12). The
    // minimum per-row loadavg is therefore the machine's floor and a
    // clean whole-run contention gate.
    val loadFloor =
      if (results.isEmpty) 0.0 else results.map(_.load).min
    val anyContended = results.exists(_.contended) ||
      loadBefore > loadMax || loadFloor > loadMax
    val anyFailed = results.exists(_.failures > 0)
    // state-size invariant (the reference's headline: ~KB of profile per
    // column regardless of row count): serialized wire bytes per
    // (profile x column) of the grouped lineitem profile
    val bytesPerColumn = {
      val prof = t("lineitem").newProfilingSession()
        .groupBy("l_returnflag").aggProfiles()
      val nStructCols = prof.schema.fields
        .count(_.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
      val r = graft.io.ProfileIO.withProtoColumn(prof)
        .agg(sum(length(col("why_profile"))), count(lit(1))).first()
      r.getLong(0).toDouble / (r.getLong(1) * nStructCols)
    }
    System.err.println(f"[bench] profile_bytes_per_column $bytesPerColumn%.0f")
    // the reference's headline invariant, now enforced: sketch-bounded
    // profile state. A regression past 20 KB/column (currently ~17 KB)
    // fails the bench outright instead of landing silently.
    require(bytesPerColumn <= 20000.0,
      f"profile_bytes_per_column regression: $bytesPerColumn%.0f B > 20000 B")

    // prefilter pruning metrics (untimed): fraction of the corpus-side
    // token/gram stream that SURVIVES the bm25 term prefilter and the
    // ngram-contamination gram join at each vocabulary. keep~1.0 on the
    // low-vocab fixture records that those rows time the no-pruning worst
    // case; the _hc rows are the realistic heavy-pruning regime.
    def termKeepFrac(corpus: DataFrame): Double = {
      val toks = corpus.select(explode(split(col("text"), " ")).as("term"))
      val qterms = corpus.filter(col("doc_id") < 20)
        .select(explode(split(substring(col("text"), 1, 60), " ")).as("term"))
        .distinct()
      toks.join(broadcast(qterms), Seq("term"), "left_semi").count().toDouble /
        math.max(toks.count(), 1L)
    }
    def gramKeepFrac(corpus: DataFrame): Double = {
      val grams = corpus.select(
        explode(graft.ops.TextOps.ngrams(col("text"), 8)).as("g"))
      val probeGrams = corpus.filter(col("doc_id") % 10 === 0)
        .select(concat(lit("eval header : "), col("text")).as("text"))
        .select(explode(graft.ops.TextOps.ngrams(col("text"), 8)).as("g"))
        .distinct()
      grams.join(probeGrams, Seq("g"), "left_semi").count().toDouble /
        math.max(grams.count(), 1L)
    }
    val bm25Keep = termKeepFrac(t("documents"))
    val bm25KeepHc = termKeepFrac(hcDocs)
    val ngramKeep = gramKeepFrac(t("documents").select(col("doc_id"), col("text")))
    val ngramKeepHc = gramKeepFrac(hcDocs.select(col("doc_id"), col("text")))
    System.err.println(f"[bench] bm25 keep_frac low=$bm25Keep%.4f hc=$bm25KeepHc%.4f; " +
      f"ngram keep_frac low=$ngramKeep%.4f hc=$ngramKeepHc%.4f")

    val qs = results.map(r => "\"" + r.name + f"\":${r.sec}%.3f")
      .mkString("{", ",", "}")
    // Per-row diagnostics go to a SIDE FILE (+ stderr), never the stdout
    // metric line: round 10 inlined them there and the tripled line
    // overflowed the driver's tail capture, truncating the artifact it
    // was meant to harden. The stdout line stays compact.
    val rowDetail = results.map(r =>
      "\"" + r.name + f"""\":{"sec":${r.sec}%.3f,"iters":${r.iters},""" +
        f""""spread":${r.spread}%.2f,"loadavg":${r.load}%.2f,""" +
        f""""first_iter_sec":${r.firstIterSec}%.3f,""" +
        s""""gc_ms":${r.gcMs},"jit_ms":${r.jitMs},""" +
        s""""warmup_iters":${r.warmupIters},""" +
        f""""warmup_sec":${r.warmupSec}%.3f,""" +
        s""""contended":${r.contended},"failures":${r.failures}}""")
      .mkString("{", ",", "}")
    val detailJson =
      f"""{"loadavg_before":$loadBefore%.2f,"loadavg_after":$loadAfter%.2f,"loadavg_max_allowed":$loadMax%.2f,"load_max_frac":$loadMaxFrac%.2f,"spread_max":$spreadMax%.2f,"cores":$cores,"bench_iterations":$baseIters,"max_iterations":$maxIters,"row_budget_sec":$rowBudgetSec%.2f,"fast_row_floor":$fastRowFloor,"rows":$rowDetail}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "bench_rows.json")
    // a BENCH_ONLY-filtered dev run must never clobber the full-board
    // artifact with a partial row set — redirect it to a side path
    val effectivePath =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY") &&
          !sys.env.contains("SPARK_GRAFT_BENCH_DETAIL"))
        detailPath + ".partial"
      else detailPath
    try java.nio.file.Files.write(java.nio.file.Paths.get(effectivePath),
      detailJson.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $effectivePath: $e") }
    System.err.println(s"[bench] row detail: $detailJson")
    val total = results.map(_.sec).sum
    // name the contended rows in the headline so a true flag is
    // interpretable (one noisy sub-second row vs a busy machine)
    val contendedRows = results.filter(_.contended).map(_.name)
      .mkString("[\"", "\",\"", "\"]") match {
      case "[\"\"]" => "[]"
      case s => s
    }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","contended":$anyContended,"contended_rows":$contendedRows,"failed":$anyFailed,"profile_bytes_per_column":$bytesPerColumn%.0f,"bm25_keep_frac_hc":$bm25KeepHc%.4f,"ngram_keep_frac_hc":$ngramKeepHc%.4f}""")
    // Driver-tail robustness (r18): the grading harness keeps only the LAST
    // 2000 bytes of the run's output, and the full-precision metric line
    // above (~3.4 KB at 88 rows) gets its head truncated there — BENCH_r17
    // recorded "parsed": null for exactly this reason. Emit a SECOND,
    // compact metric line (2-decimal row→sec, heaviest rows first) as the
    // final stdout line so the tail window always contains one complete
    // JSON object. If the compact line itself would outgrow the window
    // (rows added in later rounds), the SMALLEST rows are dropped and
    // counted in "omitted" — the full-precision line above and the
    // bench_rows.json side file remain the complete artifacts.
    val compactBudget = 1850
    val bySecDesc = results.sortBy(-_.sec)
    def compactLine(keep: Int): String = {
      val qsC = bySecDesc.take(keep)
        .map(r => "\"" + r.name + f"\":${r.sec}%.2f").mkString("{", ",", "}")
      val omitted =
        if (keep < results.size) s""","omitted":${results.size - keep}"""
        else ""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsC,"sf":"$sfDir","contended":$anyContended,"failed":$anyFailed$omitted}"""
    }
    var keepRows = results.size
    var compact = compactLine(keepRows)
    while (compact.length > compactBudget && keepRows > 1) {
      keepRows -= 1
      compact = compactLine(keepRows)
    }
    println(compact)
    spark.stop()
  }
}
