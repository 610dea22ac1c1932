"""End-to-end tests for graftspark.ops and graftspark.multimodal.

Run directly: python3 python/tests/test_ops.py  (see test_facade.py for
classpath requirements).
"""

import math
import os
import struct
import sys

sys.path.insert(0, os.path.join(
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")),
    "python"))

from test_facade import SF_DIR, _get_spark  # noqa: E402


def _docs():
    return _get_spark().read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _embs():
    return _get_spark().read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_exact_dedup():
    from pyspark.sql import functions as F
    from graftspark import ops

    orders = _get_spark().read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    stats = ops.exact_dup_stats(orders, "o_orderkey", ["o_orderstatus"])
    got = {r["o_orderstatus"]: (r["survivor_id"], r["n_dupes"])
           for r in stats.collect()}
    want = {r["o_orderstatus"]: (r["mn"], r["cnt"])
            for r in orders.groupBy("o_orderstatus").agg(
                F.min("o_orderkey").alias("mn"),
                F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want and len(got) > 0

    deduped = ops.exact_dedup(orders, "o_orderkey", ["o_orderstatus"])
    assert deduped.count() == len(want)
    survivors = {r["o_orderkey"] for r in deduped.select("o_orderkey").collect()}
    assert survivors == {v[0] for v in want.values()}
    print(f"exact dedup: {len(want)} groups, survivors match min-id oracle")


def test_near_dup_clusters():
    from pyspark.sql import functions as F
    from graftspark import ops

    docs = _docs().filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("id"), "text")
    mutated = docs.select((F.col("id") + 100000).alias("id"),
                          F.concat("text", F.lit(" tail")).alias("text"))
    both = docs.unionAll(mutated)
    clusters = ops.near_dup_clusters(both, "id", "text", threshold=0.5)
    comp = {r["id"]: r["comp"] for r in clusters.collect()}
    # every mutated doc must land in its original's component
    paired = sum(1 for r in docs.collect()
                 if comp.get(r["id"]) is not None
                 and comp.get(r["id"]) == comp.get(r["id"] + 100000))
    assert paired >= 25, f"only {paired}/30 mutation pairs clustered"
    print(f"near-dup clusters: {paired}/30 planted pairs share a component")


def test_ann_brute_force():
    from pyspark.sql import functions as F
    from graftspark import ops

    embs = _embs().limit(200)
    id_col, emb_col = embs.columns[0], embs.columns[1]
    queries = embs.limit(5)
    top = ops.ann_brute_force(embs, queries, id_col, emb_col, k=3,
                              exclude_self=False)
    assert top.count() == 15  # 5 queries x k=3
    # with self included, every query's best hit is itself at cosine ~1
    best = (top.withColumn(
                "rn", F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("query_id").orderBy(F.desc("cosine"))))
            .filter("rn = 1").collect())
    for r in best:
        assert r["item_id"] == r["query_id"], (r["item_id"], r["query_id"])
        assert abs(r["cosine"] - 1.0) < 1e-6
    print("ann brute force: 5x3 rows, self is top-1 at cosine 1")


def test_sessionize_and_sampling():
    from pyspark.sql import functions as F
    from graftspark import ops

    events = _get_spark().read.parquet(os.path.join(SF_DIR, "events.parquet"))
    user_col, ts_col = "user_id", "ts"
    # ts is parquet TIMESTAMP_MICROS (read as TIMESTAMP_NTZ); the
    # engine's schema dispatch compares exact epoch-micros -> gap in us
    sessions = ops.sessionize(events, user_col, ts_col,
                              gap=30 * 60 * 1_000_000)
    assert sessions.count() == events.count()
    assert sessions.agg(F.min("session_seq")).collect()[0][0] == 1

    s1 = {r[0] for r in ops.hash_sample(events, "event_id", 0.1)
          .select("event_id").collect()}
    s2 = {r[0] for r in ops.hash_sample(events, "event_id", 0.1)
          .select("event_id").collect()}
    assert s1 == s2 and 0 < len(s1) < events.count()
    print(f"sessionize rows preserved; hash_sample deterministic ({len(s1)} keys)")


def test_tfidf_and_outliers():
    from graftspark import ops
    from pyspark.sql import functions as F

    docs = _docs().limit(100)
    tf = ops.tfidf_top_terms(docs, "doc_id", "text", top_n=3)
    per_doc = tf.groupBy("id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 3

    orders = _get_spark().read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    iqr = ops.iqr_outliers(orders, "o_totalprice", ["o_orderstatus"])
    assert iqr.count() == orders.select("o_orderstatus").distinct().count()
    print("tfidf top_n bound holds; iqr one row per group")


def _make_ppm(w, h, r, g, b):
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + bytes([r, g, b]) * (w * h)


def _make_wav(freq_frames, channels=1, rate=8000, amp=1000):
    data = struct.pack(f"<{freq_frames * channels}h",
                       *([amp, -amp] * (freq_frames * channels // 2)))
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_multimodal_map_in_pandas():
    from graftspark import multimodal

    spark = _get_spark()
    rows = [(1, bytearray(_make_ppm(4, 3, 10, 20, 30))),
            (2, bytearray(_make_ppm(2, 2, 0, 128, 255))),
            (3, bytearray(b"\x89PNG not a ppm"))]  # dropped (codec format)
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r["id"]: r for r in
           multimodal.extract_image_features(df, "id", "blob").collect()}
    assert set(out) == {1, 2}
    assert (out[1]["width"], out[1]["height"]) == (4, 3)
    assert out[1]["mean_r"] == 10.0 and out[2]["mean_b"] == 255.0

    wrows = [(7, bytearray(_make_wav(800)))]
    wdf = spark.createDataFrame(wrows, "id long, blob binary")
    w = multimodal.extract_audio_features(wdf, "id", "blob").collect()[0]
    assert w["sample_rate"] == 8000 and w["n_frames"] == 800
    assert w["duration_us"] == 100000
    assert abs(w["rms"] - 1000.0) < 1e-9
    print("multimodal mapInPandas: PPM + WAV decode exact, corrupt row dropped")


def test_contamination_packing_stratified():
    from pyspark.sql import functions as F
    from graftspark import ops

    docs = _docs().select("doc_id", "text")
    probe = docs.filter(F.col("doc_id") < 20).select(
        "doc_id", F.concat(F.lit("eval : "), F.col("text")).alias("text"))
    pairs = ops.ngram_contamination(docs, probe, "doc_id", "text",
                                    n=8, min_shared=3)
    hits = {(r["train_id"], r["probe_id"]) for r in pairs.collect()}
    assert all((i, i) in hits for i in range(20))

    packed = ops.pack_sequences(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok")),
        "doc_id", "n_tok", "doc_id", budget=512)
    rows = sorted((r["doc_id"], r["start_offset"], r["n_tokens"])
                  for r in packed.collect())
    off = 0
    for _, start, ntok in rows:
        assert start == off
        off += ntok

    full = _docs()
    strat = ops.stratified_sample(full, "doc_id", "lang",
                                  {"en": 0.8, "de": 0.3})
    langs = {r["lang"] for r in strat.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}
    en_frac = strat.filter(F.col("lang") == "en").count() \
        / full.filter(F.col("lang") == "en").count()
    assert 0.6 < en_frac < 0.95
    print("ngram contamination + sequence packing + stratified sample OK")


def test_round5_curation_ops():
    from pyspark.sql import functions as F
    from graftspark import ops

    docs = _docs().select("doc_id", "text", "source")

    # temperature mix: t=1 keeps ~target_fraction of every source
    mixed = ops.temperature_mix(docs, "doc_id", "source", 0.5,
                                temperature=1.0)
    frac = mixed.count() / docs.count()
    assert 0.4 < frac < 0.6, frac

    # token budget: selection is a subset and fits the budget
    toks = docs.select("doc_id",
                       F.size(F.split("text", " ")).alias("n_tok"))
    picked = ops.token_budget_select(toks, "doc_id", "n_tok", 5000)
    total = picked.agg(F.sum("n_tok")).collect()[0][0]
    assert total is not None and total <= 5000

    # perplexity: every doc scored, positive
    ppl = ops.bigram_perplexity(docs, "doc_id", "text")
    assert ppl.filter(F.col("perplexity") <= 0).count() == 0
    tri = ops.trigram_perplexity(docs, "doc_id", "text", min_count=2)
    assert tri.filter(F.col("perplexity") <= 0).count() == 0
    assert {"id", "n_trigrams", "perplexity"} <= set(tri.columns)

    # markup strip + url dedup: crawl-side hygiene
    tagged = docs.select("doc_id", F.concat(
        F.lit("<p>"), F.col("text"), F.lit("</p> x &amp; y")).alias("text"))
    sm = ops.strip_markup(tagged, "doc_id", "text")
    assert sm.filter(F.col("n_tags") != 2).count() == 0
    assert sm.filter(F.col("text").contains("<p>")).count() == 0
    assert sm.filter(F.col("text").contains("&amp;")).count() == 0
    urls = docs.select("doc_id", F.concat(
        F.lit("https://Host"), F.col("doc_id") % 5,
        F.lit(".example/p?q=1")).alias("url"))
    ud = ops.url_dedup(urls, "doc_id", "url")
    assert ud.count() == 5
    assert ud.filter(F.col("canonical_url").contains("?")).count() == 0

    # duplicated spans: a planted shared tail is found
    tailed = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" zz shared tail marker words here")).alias("text"))
    spans = ops.duplicated_spans(tailed, "doc_id", "text", 5, min_docs=100)
    assert spans.filter(F.col("span").contains("shared tail")).count() > 0

    # bloom joins partition the corpus around an exact key-match set
    probe = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    semi = ops.bloom_semi_join(docs, probe, "text")
    anti = ops.bloom_anti_join(docs, probe, "text")
    assert semi.count() + anti.count() == docs.count()

    # bm25: each query returns <= k ranked docs
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 40).alias("qtext"))
    top = ops.bm25_topk(docs, "doc_id", "text",
                        queries, "query_id", "qtext", k=5)
    assert top.groupBy("query_id").count() \
        .filter(F.col("count") > 5).count() == 0

    # normalize_text: whitespace collapsed in place, schema preserved
    noisy = docs.select("doc_id",
                        F.concat(F.lit("  a  b "), F.col("text")).alias("text"))
    norm = ops.normalize_text(noisy, "text")
    assert norm.columns == ["doc_id", "text"]
    assert norm.filter(F.col("text").startswith("a b ")).count() \
        == noisy.count()

    # key skew: top keys ordered by exact count, share sums sensibly
    skew = ops.key_skew(docs, ["source"], 3).collect()
    assert len(skew) <= 3
    assert all(skew[i]["n"] >= skew[i + 1]["n"]
               for i in range(len(skew) - 1))

    # weighted sample: clamp at 1 keeps everything
    full = ops.weighted_sample(
        docs.select("doc_id", F.lit(2.0).alias("w")), "doc_id", "w")
    assert full.count() == docs.count()

    # exact_best keeps one (highest-score) row per key
    best = ops.exact_best(
        docs.select("doc_id", "source",
                    F.length("text").cast("double").alias("s")),
        ["source"], "s", "doc_id")
    assert best.count() == docs.select("source").distinct().count()

    # collapse_repeated_lines is identity on single-line docs
    collapsed = ops.collapse_repeated_lines(docs, "text")
    assert collapsed.columns == docs.columns
    assert collapsed.count() == docs.count()

    # semdedup: planted exact copies are dropped, originals survive
    embs = _embs()
    dups = embs.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
    surv = ops.semdedup_survivors(embs.unionAll(dups), "vec_id",
                                  "embedding", threshold=0.99)
    assert surv.count() == embs.count()
    print("round-5 curation ops OK")


def test_round6_scaling_validation_pq():
    from pyspark.sql import functions as F
    from graftspark import ops, new_profiling_session

    # ivf-pq: well-formed rows, scores are exact cosines in [-1, 1]
    embs = _embs().limit(200)
    queries = embs.limit(5)
    top = ops.ann_ivfpq(embs, queries, "vec_id", "embedding", k=3,
                        n_centroids=8, n_probe=8, rerank=20)
    rows = top.collect()
    assert len(rows) == 15, len(rows)
    assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)

    # zscore / min_max / winsorize on a known column
    docs = _get_spark().read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    base = docs.select("doc_id", "lang",
                       docs["n_chars"].cast("double").alias("x"))
    z = ops.zscore(base, ["x"], keys=["lang"])
    assert z.count() == base.count() and z.columns == base.columns
    mm = ops.min_max_scale(base, ["x"])
    lohi = mm.agg(F.min("x"), F.max("x")).collect()[0]
    assert lohi[0] >= 0.0 and lohi[1] <= 1.0
    w = ops.winsorize(base, "x", 0.1, 0.9, keys=["lang"])
    assert w.count() == base.count()

    # validation report from a grouped profile
    prof = new_profiling_session(docs, "pydocs").groupBy("lang") \
        .aggProfiles()
    rep = ops.validation_report(
        prof,
        [["min_at_least", "n_chars", 0.0],
         ["null_fraction_at_most", "n_chars", 0.0],
         ["type_is", "n_chars", "INTEGRAL"]],
        keep=["lang"])
    got = rep.collect()
    n_groups = prof.count()
    assert len(got) == 3 * n_groups
    assert all(r["passed"] in (0, 1) for r in got)
    min_rows = [r for r in got if r["check_name"] == "min_at_least"]
    assert all(r["passed"] == 1 for r in min_rows)

    # robust_scale + drift_auto_edges
    rs = ops.robust_scale(base, "x", keys=["lang"])
    assert rs.count() == base.count()
    gprof = new_profiling_session(docs, "pyglobal").aggProfiles()
    edges = ops.drift_auto_edges(gprof, "n_chars.numbers.kll")
    assert edges == sorted(edges) and 1 <= len(edges) <= 3

    # exact-substring removal: planted boilerplate vanishes
    spark = _get_spark()
    boiler = docs.limit(60).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" shared boiler plate tail "
                                      "tokens here")).alias("text"))
    cleaned = ops.remove_duplicated_spans(boiler, "doc_id", "text", 6,
                                          min_docs=3)
    assert cleaned.filter("n_removed > 0").count() == 60
    print("round-6 scaling/validation/pq ops OK")


def main():
    test_exact_dedup()
    test_near_dup_clusters()
    test_ann_brute_force()
    test_sessionize_and_sampling()
    test_tfidf_and_outliers()
    test_multimodal_map_in_pandas()
    test_contamination_packing_stratified()
    test_round5_curation_ops()
    test_round6_scaling_validation_pq()
    test_round7_corpus_filters()
    test_round12_mixture_media_novelty()
    test_round12b_rank_drift_layout()
    test_round12c_stats_graph_noise()
    test_round12d_tokenizer_readability_pca()
    test_round13_encoding_profile()
    test_round13_audio_dups()
    test_round13_seasonality()
    test_round13_privacy()
    test_round13_quality_screens()
    test_round14_imageio_audio()
    test_round15_nested_mih()
    test_round17_profile_store_lifecycle()
    print("ALL OPS TESTS PASSED")


def test_round7_corpus_filters():
    from pyspark.sql import functions as F
    from graftspark import ops

    spark = _get_spark()

    # gopher battery: a compliant doc passes, a stopword-free doc fails
    good = " ".join([f"word{i}" for i in range(48)] + ["the", "of"])
    bad = " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame([(1, good), (2, bad)], ["id", "text"])
    rep = {r["id"]: r for r in ops.gopher_report(df, "id", "text").collect()}
    assert rep[1]["passed"] == 1 and rep[1]["stop_hits"] == 2
    assert rep[2]["passed"] == 0 and rep[2]["stop_hits"] == 0

    # c4 cleaning: bad lines drop, page verdict combines
    page = ("A good sentence line with enough words.\n"
            "short line.\n"
            "Another good sentence line that survives fine!\n"
            "A third good sentence line also survives fine?")
    cdf = spark.createDataFrame([(1, page)], ["id", "text"])
    crow = ops.c4_clean(cdf, "id", "text").collect()[0]
    assert crow["n_lines_in"] == 4 and crow["n_lines_kept"] == 3
    assert crow["kept"] == 1

    # context chunks: sliding windows with partial tail
    tdf = spark.createDataFrame([(1, "a b c d e f g")], ["id", "text"])
    chunks = sorted((r["chunk_idx"], r["chunk"], r["n_tokens"])
                    for r in ops.context_chunks(
                        tdf, "id", "text", 4, 2).collect())
    assert chunks == [(0, "a b c d", 4), (1, "c d e f", 4),
                      (2, "e f g", 3), (3, "g", 1)]

    # categorical PSI from sketches: identical cohorts -> 0 drift
    from graftspark.session import _jvm_bridge
    _jvm_bridge(_docs()).registerSqlFunctions(spark._jsparkSession)
    ev = spark.createDataFrame(
        [("x",)] * 60 + [("y",)] * 40, ["cat"])
    sk = ev.selectExpr("freq_items_agg(cat) AS sa",
                       "freq_items_agg(cat) AS sb")
    psirow = ops.categorical_psi(sk, "sa", "sb").collect()[0]
    assert psirow["n_a"] == 100 and psirow["n_b"] == 100
    assert abs(psirow["psi"]) < 1e-12

    # DSIR weights: target-like doc outscores the off-target doc
    raw = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "zz yy zz yy")], ["id", "text"])
    tgt = spark.createDataFrame([(3, "aa bb")], ["id", "text"])
    w = {r["id"]: r["logratio"]
         for r in ops.dsir_weights(raw, tgt, "id", "text").collect()}
    assert w[1] > w[2]

    # PII redaction
    pdf = spark.createDataFrame(
        [(1, "mail a@b.co or call 555-123-4567")], ["id", "text"])
    red = ops.redact_pii(pdf, "text").collect()[0]["text"]
    assert red == "mail [EMAIL] or call [PHONE]"

    # categorical JSD: identical cohorts -> 0; schema drift report
    jrow = ops.categorical_jsd(sk, "sa", "sb").collect()[0]
    assert abs(jrow["jsd"]) < 1e-12
    from graftspark import new_profiling_session
    pa = new_profiling_session(
        spark.createDataFrame([(1.0, "s")], ["x", "y"]), "t").aggProfiles()
    pb = new_profiling_session(
        spark.createDataFrame([("1", "s")], ["x", "y"]), "t").aggProfiles()
    srep = {r["column"]: r for r in ops.schema_drift(pa, pb).collect()}
    assert srep["x"]["type_changed"] == 1
    assert srep["y"]["type_changed"] == 0
    print("round-7 corpus filters: gopher/c4/chunks/psi/jsd/dsir/redact/"
          "schema OK")


def _ppm_blob(seed):
    px = bytes(((x * 7 + y * 11 + c * 20 + seed * 13) % 200)
               for y in range(8) for x in range(8) for c in range(3))
    return b"P6\n8 8\n255\n" + px


def _wav_blob(samples, rate=8000):
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_round12_mixture_media_novelty():
    from pyspark.sql import functions as F
    from graftspark import ops

    spark = _get_spark()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # DoReMi-lite weights sum to 1; the mixture resampler keeps a strict
    # subset distributed over every weighted domain
    d = docs.select("source",
                    F.log(1.0 + F.length("text")).alias("lp"),
                    F.log(1.0 + F.size(F.split("text", " "))).alias("lr"))
    w = ops.doremi_weights(d, "source", "lp", "lr")
    ws = {r["domain"]: r["weight"] for r in w.collect()}
    assert abs(sum(ws.values()) - 1.0) < 1e-9
    mixed = ops.apply_mixture_weights(docs, "source", "doc_id", w, 0.3)
    assert 0 < mixed.count() < docs.count()

    # trained one-vs-rest language id
    labeled = docs.select("doc_id", "text", "lang").filter(
        F.col("lang").isin("en", "de")).filter("doc_id < 400")
    scored = ops.lang_id_trained(labeled, labeled, "doc_id", "text",
                                 "lang", ["de", "en"], epochs=2)
    assert {"doc_id", "pred_lang"} <= set(scored.columns)
    assert scored.count() == labeled.count()

    # perceptual image hashes; the planted exact copy pairs at hamming 0
    blobs = [(i, _ppm_blob(i)) for i in range(10)] + [(100, _ppm_blob(3))]
    bdf = spark.createDataFrame(blobs, ["id", "blob"])
    assert ops.image_hashes(bdf, "id", "blob").count() == 11
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in ops.image_hash_near_dups(bdf, "id", "blob").collect()}
    assert pairs.get((3, 100)) == 0, pairs
    ph = ops.image_phashes(bdf, "id", "blob")
    assert ph.columns == ["id", "phash"] and ph.count() == 11
    ppairs = {(r["id_a"], r["id_b"]): r["hamming"]
              for r in ops.phash_near_dups(bdf, "id", "blob",
                                           max_hamming=0).collect()}
    assert ppairs.get((3, 100)) == 0, ppairs

    # windowed audio stats of a square wave
    sq = [900 if i % 4 < 2 else -900 for i in range(100)]
    wdf = spark.createDataFrame([(1, _wav_blob(sq))], ["id", "blob"])
    rows = ops.wav_window_stats(wdf, "id", "blob", 25).collect()
    assert len(rows) == 4 and all(r["peak"] == 900 for r in rows)

    # novelty: stored-table and broadcast forms equal the two-frame form
    ref = docs.filter("doc_id % 3 = 0 AND doc_id < 300").select(
        "doc_id", "text")
    probe = docs.filter("doc_id % 3 <> 0 AND doc_id < 300").select(
        "doc_id", "text")
    direct = {(r["doc_id"], r["n_novel"]) for r in
              ops.ngram_novelty(probe, ref, "doc_id", "text").collect()}
    ops.write_novelty_reference(ref, "text", "graft_pytest_ref",
                                num_buckets=4)
    stored = {(r["doc_id"], r["n_novel"]) for r in ops.ngram_novelty_stored(
        probe, "graft_pytest_ref", "doc_id", "text").collect()}
    bcast = {(r["doc_id"], r["n_novel"]) for r in
             ops.novelty_score_broadcast(probe, ref, "doc_id",
                                         "text").collect()}
    bloom = {(r["doc_id"], r["n_novel"]) for r in
             ops.novelty_score_bloom(probe, ref, "doc_id", "text",
                                     num_bits=1 << 22).collect()}
    assert stored == direct == bcast == bloom

    # ordered funnel: depth bounded by steps, every full-depth user has
    # monotone step times
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    fun = ops.funnel_depth(events, "user_id", "ts", "event_type",
                           ["view", "click", "purchase"], ["event_id"])
    rows = fun.collect()
    assert len(rows) == events.select("user_id").distinct().count()
    assert all(0 <= r["depth"] <= 3 for r in rows)
    full = [r for r in rows if r["depth"] == 3]
    assert all(r["t_step1"] < r["t_step2"] < r["t_step3"] for r in full)

    # retention triangle: every cohort has an offset-0 row whose count
    # equals the cohort's size
    ret = ops.retention_cohorts(events, "user_id", "ts").collect()
    assert all(r["day_offset"] >= 0 for r in ret)
    base = {r["cohort_day"]: r["n_users"] for r in ret
            if r["day_offset"] == 0}
    assert sum(base.values()) == events.select("user_id").distinct().count()
    # shard layout: lossless round trip, in-range shard dirs
    import tempfile
    shard_dir = tempfile.mkdtemp(prefix="graft_py_shards")
    ops.write_shards(docs.select("doc_id", "n_chars"), "doc_id", 4,
                     shard_dir)
    back = spark.read.parquet(shard_dir)
    assert back.count() == docs.count()
    assert {r["shard"] for r in back.select("shard").distinct().collect()}         == {0, 1, 2, 3}

    print("round-12 mixture/media/novelty/lang-id/funnel/retention "
          "facade OK")



def test_round12b_rank_drift_layout():
    from pyspark.sql import functions as F
    from graftspark import ops

    spark = _get_spark()

    # exact percentile rank == the window cume_dist on a small frame
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")) \
        .select("l_returnflag", "l_quantity").filter("l_orderkey < 500")
    from pyspark.sql import Window
    want = {(r[0], r[1], r[2]) for r in li.select(
        "l_returnflag", "l_quantity",
        F.cume_dist().over(Window.partitionBy("l_returnflag")
                           .orderBy("l_quantity")).alias("pr"))
        .distinct().collect()}
    got = {(r[0], r[1], r[2]) for r in ops.percentile_ranks(
        li, "l_quantity", ["l_returnflag"]).collect()}
    assert got == want
    attached = ops.percentile_rank(li, "l_quantity", ["l_returnflag"])
    assert attached.count() == li.count()
    assert "pct_rank" in attached.columns

    # embedding drift: identical cohorts -> cosine 1, zero shift
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    same = ops.embedding_drift(emb, emb, "embedding").collect()[0]
    assert abs(same["mean_cosine"] - 1.0) < 1e-9
    assert same["mean_l2_shift"] < 1e-9
    by_dim = ops.embedding_drift_by_dim(
        emb.filter("label >= 5"), emb.filter("label < 5"),
        "embedding").collect()
    assert len(by_dim) == 64
    assert all(r["shift"] >= 0 for r in by_dim)

    # z-order: key attaches; layout round-trips losslessly
    keyed = ops.with_zorder_key(
        li.select("l_quantity").withColumn("x", F.rand(7) * 100),
        ["l_quantity", "x"], bits=8)
    assert "zkey" in keyed.columns
    assert keyed.filter("zkey < 0").count() == 0
    import tempfile
    zdir = tempfile.mkdtemp(prefix="graft_py_zorder")
    ops.write_zordered(li, ["l_quantity"], zdir, bits=8, num_files=4)
    assert spark.read.parquet(zdir).count() == li.count()

    # manifest-pruned read equals the full filter
    mdir = tempfile.mkdtemp(prefix="graft_py_manifest")
    ops.write_manifest(spark, zdir, ["l_quantity"], mdir)
    pr = ops.pruned_read(spark, zdir, mdir, "l_quantity", 5.0, 10.0)
    assert pr.count() == spark.read.parquet(zdir).filter(
        "l_quantity BETWEEN 5.0 AND 10.0").count()

    # decayed scores: identical single-event keys score their value
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ds = ops.decayed_score(events, "user_id", "ts", "value", 3600.0)
    assert ds.count() == events.select("user_id").distinct().count()
    assert {"ewma_score", "n_events", "last_t"} <= set(ds.columns)
    dc = ops.decayed_count(events, "user_id", "ts", 3600.0)
    assert dc.filter("decayed_count > n_events").count() == 0

    print("round-12b rank/drift/layout facade OK")


def test_round12c_stats_graph_noise():
    from graftspark import ops

    spark = _get_spark()

    # correlation matrix: 3 pairs over 3 columns, |pearson| <= 1
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    cm = ops.corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]).collect()
    assert len(cm) == 3
    assert all(abs(r["pearson"]) <= 1.0 for r in cm)
    assert all(r["n"] == li.count() for r in cm)

    # categorical association: one row, chi2 >= 0, 0 <= V <= 1
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    ca = ops.categorical_association(
        orders, "o_orderstatus", "o_orderpriority").collect()[0]
    assert ca["chi2"] >= 0 and 0 <= ca["cramers_v"] <= 1
    assert ca["card_a"] >= 1 and ca["card_b"] >= 1

    # pagerank: mass sums to 1; symmetric cycle is uniform
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["s", "d"])
    pr = ops.pagerank(e, "s", "d", iterations=4).collect()
    assert abs(sum(r["rank"] for r in pr) - 1.0) < 1e-9
    assert all(abs(r["scaled_rank"] - 1.0) < 1e-9 for r in pr)

    # knn label noise: every point scored, fractions in [0, 1]
    emb = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")).filter("vec_id < 80")
    ln = ops.knn_label_noise(emb, "vec_id", "embedding", "label", k=5)
    rows = ln.collect()
    assert len(rows) == emb.count()
    assert all(0.0 <= r["disagree_frac"] <= 1.0 for r in rows)
    assert all(r["n_neighbors"] == 5 for r in rows)

    # source overlap: complete matrix over the source pairs
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_src = docs.select("source").distinct().count()
    so = ops.source_overlap(docs, "source", "text", n=8).collect()
    assert len(so) == n_src * (n_src - 1) // 2
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in so)

    # rolling windows: one output row per event, counts >= 1
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    rw = ops.rolling_window_stats(events, "user_id", "ts", "value", 3600)
    assert rw.count() == events.count()
    assert rw.filter("n_window < 1").count() == 0

    # fuzzy join: identity pairs always present at dist 0
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")) \
        .selectExpr("c_custkey AS id", "c_name AS name") \
        .filter("id <= 100")
    fj = ops.fuzzy_join(cust, cust, "id", "name", max_dist=0)
    assert fj.filter("left_id = right_id").count() == cust.count()

    # trending: at most k rows per bucket, ranks 1..k
    tr = ops.trending_items(events, "ts", "event_type", 14400, 3)
    assert tr.filter("rank > 3").count() == 0
    assert tr.groupBy("bucket_start").count() \
        .filter("count > 3").count() == 0

    # attribution: one row per conversion
    at = ops.touch_attribution(events, "user_id", "ts", "event_type",
                               "event_id", ["view", "click"],
                               "purchase", 3600)
    assert at.count() == events.filter(
        "event_type = 'purchase'").count()

    # label propagation: labels are a subset of node ids
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["s", "d"])
    lp = ops.label_propagation(e, "s", "d", iterations=3).collect()
    assert {r["node"] for r in lp} == {1, 2, 3, 7, 8}
    assert all(r["label"] in {1, 7} for r in lp)

    # kmeans: every vector assigned to one of k clusters
    km = ops.kmeans_clusters(emb, "vec_id", "embedding", k=4,
                             iterations=1)
    assert km.count() == emb.count()
    assert km.select("cluster").distinct().count() <= 4

    # burstiness: single-event users report zero gaps
    ia = ops.inter_arrival_stats(events, "user_id", "ts")
    assert ia.filter("n_gaps < 0").count() == 0

    # concentration: gini in [0, 1)
    conc = ops.concentration(events, "user_id").collect()[0]
    assert 0.0 <= conc["gini"] < 1.0
    assert 0.0 < conc["top_decile_share"] <= 1.0

    # zipf: natural-ish corpus fits a negative slope
    zf = ops.zipf_fit(docs, "text", top_n=100).collect()[0]
    assert zf["slope"] < 0
    # synthetic fixture vocabulary may be below top_n
    assert 2 <= zf["n_ranks"] <= 100

    # graph census over a triangle + pendant
    eg = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["s", "d"])
    ds = {r["node"]: r["deg"] for r in
          ops.degree_stats(eg, "s", "d").collect()}
    assert ds == {1: 2, 2: 2, 3: 3, 4: 1}
    tc = ops.triangle_stats(eg, "s", "d").collect()[0]
    assert tc["n_triangles"] == 1 and tc["n_edges"] == 4

    # cusum: constant series never alarms
    const = spark.createDataFrame(
        [("m", i, 5.0) for i in range(10)], ["g", "t", "v"])
    cs = ops.cusum(const, ["g"], "t", "v").collect()
    assert all(not r["alarm"] for r in cs)

    # corpus diff: dropping odd ids -> removed = odd count
    half = docs.filter("doc_id % 2 = 0")
    cd = ops.corpus_diff(docs, half, "doc_id", ["text"]).collect()[0]
    assert cd["n_added"] == 0
    assert cd["n_removed"] == docs.count() - half.count()
    assert cd["n_changed"] == 0

    # bloom manifest point lookup == plain equality filter
    import tempfile
    bdir = tempfile.mkdtemp(prefix="graft_py_bloom_layout")
    ops.write_shards(li.select("l_orderkey", "l_quantity"),
                     "l_orderkey", 4, bdir)
    bman = tempfile.mkdtemp(prefix="graft_py_bloom_man")
    ops.write_bloom_manifest(spark, bdir, "l_orderkey", bman)
    some_key = li.select("l_orderkey").first()[0]
    lr = ops.lookup_read(spark, bdir, bman, "l_orderkey", some_key)
    assert lr.count() == spark.read.parquet(bdir).filter(
        f"l_orderkey = {some_key}").count()

    # basket pairs: supplier co-occurrence, lift positive
    bp = ops.basket_co_occurrence(li, "l_orderkey", "l_suppkey",
                                  min_count=2)
    assert bp.filter("lift <= 0").count() == 0
    assert bp.filter("item_a >= item_b").count() == 0

    # model eval: deterministic score vs label
    scored = emb.selectExpr("(vec_id % 97) / 96.0 AS s",
                            "label >= 5 AS y")
    a = ops.auc(scored, "s", "y").collect()[0]
    assert 0.0 <= a["auc"] <= 1.0
    rep = ops.calibration_report(scored, "s", "y", 10)
    assert rep.count() <= 10
    e = ops.ece(scored, "s", "y").collect()[0]
    assert 0.0 <= e["ece"] <= 1.0
    br = ops.brier_score(scored, "s", "y").collect()[0]
    assert 0.0 <= br["brier"] <= 1.0 and br["n"] == scored.count()
    lt = ops.lift_table(scored, "s", "y", 10).collect()
    assert len(lt) <= 10
    caps = [r["cum_capture"] for r in sorted(lt, key=lambda r: r["bin"])]
    assert caps == sorted(caps) and abs(caps[-1] - 1.0) < 1e-9
    ap = ops.average_precision(scored, "s", "y").collect()[0]
    assert 0.0 <= ap["ap"] <= 1.0
    assert ap["n_pos"] + ap["n_neg"] == scored.count()
    tr = ops.threshold_report(scored, "s", "y", [0.25, 0.5, 0.75])
    trows = tr.collect()
    assert len(trows) == 3
    assert all(r["tp"] + r["fp"] + r["fn"] + r["tn"] == scored.count()
               for r in trows)

    # ranking quality: a perfect run scores ndcg 1 and rr 1
    runs = emb.selectExpr("vec_id % 20 AS q", "vec_id AS item",
                          "greatest(0, label - 6) AS rel") \
        .selectExpr("q", "item", "rel", "rel + 0.0 AS s")
    rk = ops.ranking_report(runs, "q", "item", "s", "rel", 10)
    perfect = rk.filter("n_rel > 0").collect()
    assert perfect and all(abs(r["ndcg"] - 1.0) < 1e-9 for r in perfect)

    # acf of the hourly event stream: lag-1 within [-1, 1]
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ac = ops.event_acf(events, "ts", 3600, 3).collect()
    assert len(ac) == 3
    assert all(abs(r["acf"]) <= 1.0 + 1e-9 for r in ac)

    # exact quantiles agree with a literal sort
    eq = {r["q"]: r["value"]
          for r in ops.exact_quantiles(li, "l_quantity",
                                       [0.5, 0.9]).collect()}
    vals = sorted(r[0] for r in li.select("l_quantity").collect())
    import math as _math
    for q, v in eq.items():
        assert v == vals[max(1, _math.ceil(q * len(vals))) - 1]

    # A/B stats: welch t and mann-whitney agree on direction
    supp = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
    supp2 = supp.selectExpr(
        "CASE WHEN s_nationkey < 12 THEN 'old' ELSE 'new' END AS g",
        "s_acctbal AS v")
    wt = ops.welch_t_test(supp2, "g", "v", "old", "new").collect()[0]
    assert wt["n_a"] + wt["n_b"] == supp2.count()
    mw = ops.mann_whitney(supp2, "g", "v", "old", "new").collect()[0]
    assert 0.0 <= mw["u"] <= mw["n_a"] * mw["n_b"]

    # proportion z + srm over the event stream
    ev2 = events.selectExpr(
        "CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "event_type = 'purchase' AS y")
    pt = ops.proportion_test(ev2, "g", "y", "a", "b").collect()[0]
    assert 0.0 <= pt["p_a"] <= 1.0 and 0.0 <= pt["p_b"] <= 1.0
    srm = ops.srm_check(events, "event_type",
                        [("signup", 1.0), ("click", 1.0),
                         ("view", 1.0), ("purchase", 1.0)]).collect()
    assert len(srm) == 4 and srm[0]["n_unlisted"] > 0  # 'error' rows

    # CUPED: adjusted metric keeps the mean (global theta recentering)
    cu = ops.cuped(supp, "s_acctbal", "s_nationkey")
    raw_mean = supp.selectExpr("avg(s_acctbal)").collect()[0][0]
    adj_mean = cu.selectExpr("avg(adjusted)").collect()[0][0]
    assert abs(raw_mean - adj_mean) < 1e-6

    # table checksum: partition-invariant, detects a change
    ck = ops.table_checksum(li, ["l_orderkey", "l_returnflag"])
    ck2 = ops.table_checksum(li.repartition(13),
                             ["l_orderkey", "l_returnflag"])
    assert sorted(map(tuple, ck.collect())) == sorted(
        map(tuple, ck2.collect()))

    # simpson screen + ratio metric + trimmed mean on the event stream
    sc = ops.simpson_check(
        events.selectExpr("user_id % 2 = 0 AS tr", "value",
                          "event_type"),
        "tr", "value", "event_type").collect()[0]
    assert sc["n_strata"] == 5
    from pyspark.sql import functions as F
    units = events.groupBy("user_id").agg(
        F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1.0 "
                     "ELSE 0.0 END")).alias("x"),
        F.count("*").cast("double").alias("y")) \
        .selectExpr("*",
                    "CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g")
    rt = ops.ratio_test(units, "g", "x", "y", "a", "b").collect()[0]
    assert 0.0 <= rt["ratio_a"] <= 1.0 and rt["se"] > 0
    tm = ops.trimmed_mean(li, "l_extendedprice", 0.01, 0.99).collect()[0]
    assert tm["lo_cut"] <= tm["trimmed_mean"] <= tm["hi_cut"]
    assert tm["n_kept"] <= tm["n"]

    # trend: robust and OLS slopes on the hourly series
    hourly = ops.event_series(events, "ts", 3600)
    ts = ops.trend_slope(hourly, "t", "n").collect()[0]
    assert ts["n_pairs"] == ts["n"] * (ts["n"] - 1) // 2

    # categorical shape: five event types, near-uniform
    cprof = ops.categorical_profile(events, "event_type").collect()[0]
    assert cprof["cardinality"] == 5
    assert 0.99 < cprof["normalized_entropy"] <= 1.0

    # change point: planted step recovered exactly
    cp_series = spark.createDataFrame(
        [(t, 1.0 if t < 8 else 9.0) for t in range(16)], ["t", "v"])
    cp = ops.change_point(cp_series, "t", "v").collect()[0]
    assert cp["split_t"] == 7 and abs(cp["sse_split"]) < 1e-9

    # inter-rater agreement: planted 1-in-7 disagreement -> kappa < 1
    raters = docs.selectExpr(
        "lang AS a",
        "CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS b")
    ag = ops.agreement_report(raters, "a", "b").collect()[0]
    assert 0.0 < ag["kappa"] < 1.0 and abs(ag["po"] - 6 / 7) < 0.01

    # series decomposition: hourly series, 24h period
    series = ops.event_series(events, "ts", 3600)
    dec = ops.decompose(series, "t", "n", 24, 12)
    assert dec.count() == series.count()
    assert dec.filter("trend IS NULL").count() == 24  # 12 each edge

    # blocked jaro-winkler linkage recovers a planted typo
    base = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "maria garcia")], ["id", "key"])
    dirty = spark.createDataFrame(
        [(11, "jonathon smith"), (12, "maria garcai")], ["id", "key"])
    nm = ops.name_match_pairs(base, dirty, "id", "key", 0.9)
    assert {(r["left_id"], r["right_id"]) for r in nm.collect()} >= {
        (1, 11), (2, 12)}

    # data-quality trio
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    je = ops.join_size_estimate(orders, li, ["o_orderkey"],
                                ["l_orderkey"]).collect()[0]
    assert je["join_rows"] == orders.join(
        li, orders.o_orderkey == li.l_orderkey).count()
    supp = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
    ri = ops.referential_integrity(li, ["l_suppkey"], supp,
                                   ["s_suppkey"]).collect()[0]
    assert ri["n_orphans"] == 0
    ur = ops.uniqueness_report(li, ["l_orderkey", "l_linenumber"])
    u = ur.collect()[0]
    # the synthetic fixture is not PK-clean; check internal consistency
    assert u["n_rows"] == u["n_keys"] + u["n_dupe_rows"]

    # batching + ordering utilities
    lb = ops.length_buckets(docs, "n_chars", [128, 256, 512])
    assert lb.count() <= 3
    assert lb.filter("waste_frac < 0 OR waste_frac > 1").count() == 0
    il = ops.interleave_sources(docs, "source", "doc_id")
    assert il.filter("interleave_rank < 1").count() == 0

    # blocklist + domain profiling
    bl = ops.blocklist_report(docs, "doc_id", "text",
                              ["spark"], max_ratio=0.05)
    assert bl.count() == docs.count()
    assert bl.filter("flagged_ratio < 0 OR flagged_ratio > 1").count() == 0
    from pyspark.sql import functions as F
    with_urls = docs.withColumn(
        "text", F.concat("text", F.lit(" http://d.example/x")))
    dh = ops.url_domain_stats(with_urls, "doc_id", "text").collect()
    assert len(dh) == 1 and dh[0]["domain"] == "d.example"
    assert dh[0]["n_docs"] == docs.count()

    # personalized pagerank + HITS
    eg2 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["s", "d"])
    seeds = spark.createDataFrame([("a",)], ["seed"])
    ppr = ops.personalized_pagerank(eg2, "s", "d", seeds, "seed",
                                    iterations=4).collect()
    assert abs(sum(r["rank"] for r in ppr) - 1.0) < 1e-9
    ht = ops.hits(eg2, "s", "d", iterations=2).collect()
    assert abs(sum(r["hub"] for r in ht) - 1.0) < 1e-9
    assert abs(sum(r["authority"] for r in ht) - 1.0) < 1e-9

    print("round-12c stats/graph/noise facade OK")


def test_round12d_tokenizer_readability_pca():
    from graftspark import ops
    docs = _docs().limit(150)
    embs = _embs().limit(100)

    # readability: counts positive, flesch finite, one row per doc
    rd = ops.readability(docs, "doc_id", "text")
    assert rd.count() == docs.count()
    r0 = rd.filter("n_words > 0").first()
    assert r0["n_syllables"] >= r0["n_words"]  # >=1 syllable per word
    assert r0["flesch"] is not None

    # PMI collocations: rows ordered by pmi desc, counts >= min_count
    pmi = ops.pmi_collocations(docs, "text", min_count=3, top_k=20).collect()
    assert 0 < len(pmi) <= 20
    assert all(r["cnt"] >= 3 for r in pmi)
    assert all(pmi[i]["pmi"] >= pmi[i + 1]["pmi"]
               for i in range(len(pmi) - 1))

    # BPE: merges are distinct ordered steps; encode shrinks pieces
    merges = ops.bpe_train(docs, "text", 5)
    ms = merges.collect()
    assert [r["step"] for r in ms] == list(range(len(ms)))
    enc0 = ops.bpe_encode(docs, "doc_id", "text",
                          merges.filter("step < 0"))  # empty merge table
    enc5 = ops.bpe_encode(docs, "doc_id", "text", merges)
    # stored merge table: encode-from-store equals direct encode
    ops.write_bpe_merges(merges, "py_bpe_merges")
    try:
        stored = ops.bpe_encode_stored(docs, "doc_id", "text",
                                       "py_bpe_merges")
        assert sorted(map(tuple, stored.collect())) == \
            sorted(map(tuple, enc5.collect()))
    finally:
        _get_spark().sql("DROP TABLE IF EXISTS py_bpe_merges")
    tot0 = enc0.agg({"n_pieces": "sum"}).collect()[0][0]
    tot5 = enc5.agg({"n_pieces": "sum"}).collect()[0][0]
    assert tot5 < tot0  # merging strictly reduces piece count here

    # covariance: diagonal is per-dim variance (non-negative)
    cov = ops.embed_cov_matrix(embs, "embedding")
    assert cov.filter("i = j AND cov < 0").count() == 0

    # stored MinHash index: planted copies recover their originals
    ops.write_minhash_reference(docs, "doc_id", "text", "py_mh_ref",
                                num_hashes=32, bands=8, shingle_k=2,
                                num_buckets=4)
    try:
        from pyspark.sql import functions as F
        batch = docs.limit(20).select(
            (F.col("doc_id") + 50000).alias("doc_id"), "text")
        hits = ops.minhash_near_dups_stored(
            batch, "py_mh_ref", "doc_id", "text", num_hashes=32,
            bands=8, shingle_k=2, threshold=0.999).collect()
        planted = {(r["new_id"], r["ref_id"]) for r in hits}
        assert all((i + 50000, i) in planted
                   for r in docs.limit(20).collect()
                   for i in [r["doc_id"]])
    finally:
        _get_spark().sql("DROP TABLE IF EXISTS py_mh_ref_buckets")
        _get_spark().sql("DROP TABLE IF EXISTS py_mh_ref_sigs")

    # PCA: k-dim projection + explained variance sums to 1
    pj = ops.pca_project(embs, "embedding", 8)
    from pyspark.sql import functions as F
    assert pj.select(F.size("pca")).distinct().collect()[0][0] == 8
    ev = ops.pca_explained_variance(embs, "embedding").collect()
    assert abs(sum(r["variance_ratio"] for r in ev) - 1.0) < 1e-9
    assert all(ev[i]["eigenvalue"] >= ev[i + 1]["eigenvalue"] - 1e-12
               for i in range(len(ev) - 1))

    # PSI matrix: symmetric-free pairs, identical corpus halves near 0
    pm = ops.psi_matrix(docs.withColumn(
        "grp", (F.col("doc_id") % 3).cast("string")),
        "grp", "n_chars", [150.0, 300.0, 450.0]).collect()
    assert len(pm) == 3  # 3 groups -> 3 pairs
    assert all(r["group_a"] < r["group_b"] for r in pm)
    assert all(r["psi"] >= 0.0 and 0.0 <= r["jsd"] <= math.log(2) + 1e-9
               for r in pm)

    # stored exact-dedup screen: seen texts drop, fresh pass; after
    # appending the screened batch, the whole batch drops
    ops.write_fingerprint_reference(docs.limit(50), "text", "py_fp_ref",
                                    num_buckets=2)
    try:
        batch = docs.limit(100)
        kept = ops.filter_unseen_against_store(batch, "py_fp_ref", "text")
        assert kept.count() == 50
        ops.append_fingerprints(batch, "py_fp_ref", "text")
        assert ops.filter_unseen_against_store(
            batch, "py_fp_ref", "text").count() == 0
        spark = _get_spark()
        before = ops.store_stats(spark, "py_fp_ref").collect()[0]
        assert before["n_rows"] == 100
        ops.compact_store(spark, "py_fp_ref")
        after = ops.store_stats(spark, "py_fp_ref").collect()[0]
        assert after["n_rows"] == 100
        assert after["n_files"] <= before["n_files"]
    finally:
        _get_spark().sql("DROP TABLE IF EXISTS py_fp_ref")

    # negative sampling: k per anchor, never self, deterministic
    neg1 = ops.negative_samples(embs.limit(10), "vec_id", 3, embs).collect()
    neg2 = ops.negative_samples(embs.limit(10), "vec_id", 3, embs).collect()
    assert len(neg1) == 30
    assert all(r["neg_id"] != r["anchor_id"] for r in neg1)
    assert sorted(map(tuple, neg1)) == sorted(map(tuple, neg2))

    # stored IVF index: exhaustive probe finds each query's own vector
    ops.write_ivf_index(embs, "vec_id", "embedding", "py_ivf",
                        n_centroids=4, iterations=1, num_buckets=2)
    try:
        import pyspark.sql.functions as SF
        q = embs.filter(SF.col("vec_id") < 5)
        top = ops.ivf_top_k_stored(q, "py_ivf", "vec_id", "embedding",
                                   k=3, n_probe=4)
        assert top.count() == 15  # 5 queries x k=3
        assert top.filter("rank < 1 OR rank > 3").count() == 0
    finally:
        _get_spark().sql("DROP TABLE IF EXISTS py_ivf_centroids")
        _get_spark().sql("DROP TABLE IF EXISTS py_ivf_lists")

    # whitening: per-component variance ~1
    wh = ops.pca_whiten(embs, "embedding", 4).select("pca").collect()
    import statistics
    for k in range(4):
        var = statistics.variance([r["pca"][k] for r in wh])
        assert abs(var - 1.0) < 1e-6, var

    # survival: time-to-purchase curve is monotone non-increasing in (0,1]
    events = _get_spark().read.parquet(
        os.path.join(SF_DIR, "events.parquet"))
    tte = ops.time_to_event(events, "user_id", "ts", "event_type",
                            "purchase")
    km = ops.kaplan_meier(
        tte.selectExpr("key", "duration div 3600000000 as dh", "observed"),
        "dh", "observed").orderBy("t").collect()
    assert len(km) > 0
    surv = [r["survival"] for r in km]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(surv[i] >= surv[i + 1] - 1e-12 for i in range(len(surv) - 1))

    # log-rank between even/odd user cohorts; RFM quintiles
    from pyspark.sql import functions as F
    lr = ops.log_rank(
        tte.selectExpr("pmod(key, 2)::string as g",
                       "duration div 3600000000 as dh", "observed"),
        "dh", "observed", "g").collect()[0]
    assert lr["chi2"] >= 0.0
    assert lr["n_a"] + lr["n_b"] == tte.count()
    seg = ops.rfm(events, "user_id", "ts", "value")
    assert seg.count() == events.select("user_id").distinct().count()
    assert seg.filter("r_score < 1 OR r_score > 5").count() == 0

    # video: GVID container walk + frame sampling via mapInPandas
    from graftspark import multimodal
    import struct as _st
    spark2 = _get_spark()

    def mk_gvid(fps_milli, frames):
        out = b"GVID" + _st.pack(">ii", fps_milli, len(frames))
        for fr in frames:
            out += _st.pack(">i", len(fr)) + fr
        return out

    def mk_ppm(w, h, r, g, b):
        return (f"P6\n{w} {h}\n255\n".encode() +
                bytes([r, g, b]) * (w * h))

    vids = spark2.createDataFrame(
        [(1, bytearray(mk_gvid(2000, [mk_ppm(4, 3, 10, 20, 30),
                                      mk_ppm(2, 2, 5, 6, 7),
                                      mk_ppm(3, 3, 9, 9, 9)]))),
         (2, bytearray(b"not a video"))],
        "id long, blob binary")
    vm = {r["id"]: r for r in
          multimodal.extract_video_features(vids, "id", "blob").collect()}
    assert set(vm) == {1}
    assert vm[1]["n_frames"] == 3 and vm[1]["fps_milli"] == 2000
    assert vm[1]["duration_us"] == 1_500_000
    fr = multimodal.sample_video_frames(vids, "id", "blob",
                                        every_n=2).collect()
    assert sorted(r["frame_idx"] for r in fr) == [0, 2]
    f0 = next(r for r in fr if r["frame_idx"] == 0)
    assert (f0["width"], f0["height"]) == (4, 3)
    assert f0["mean_r"] == 10.0
    assert bytes(f0["frame"]).startswith(b"P6")

    # video dedup: a re-encoded (different-fps) copy shares every
    # frame hash; constant frames would all aHash alike, so the
    # fixture frames carry distinct structure (x-, y-gradients, checks)
    def mk_ppm_pat(f):
        px = bytes(v for y in range(8) for x in range(8)
                   for v in [f(x, y) % 256] * 3)
        return b"P6\n8 8\n255\n" + px

    fx = mk_ppm_pat(lambda x, y: 30 * x)
    fy = mk_ppm_pat(lambda x, y: 30 * y)
    fc = mk_ppm_pat(lambda x, y: 255 * ((x + y) % 2))
    dup_vids = spark2.createDataFrame(
        [(1, bytearray(mk_gvid(2000, [fx, fy]))),
         (2, bytearray(mk_gvid(9000, [fx, fy]))),
         (3, bytearray(mk_gvid(2000, [fc])))],
        "id long, blob binary")
    vd = {(r["id_a"], r["id_b"]): r["n_shared"]
          for r in ops.video_near_dups(dup_vids, "id", "blob",
                                       min_shared_frames=2).collect()}
    assert vd == {(1, 2): 2}, vd

    # stored pHash index: exact copies recover at hamming 0
    ops.write_phash_reference(
        spark2.createDataFrame(
            [(10, bytearray(fx)), (11, bytearray(fy)),
             (12, bytearray(fc))], "id long, blob binary"),
        "id", "blob", "py_ph_ref", num_buckets=2)
    try:
        probe = spark2.createDataFrame(
            [(110, bytearray(fx)), (112, bytearray(fc))],
            "id long, blob binary")
        ph_hits = {(r["new_id"], r["ref_id"]): r["hamming"]
                   for r in ops.phash_near_dups_stored(
                       probe, "py_ph_ref", "id", "blob",
                       max_hamming=0).collect()}
        assert ph_hits.get((110, 10)) == 0 and ph_hits.get((112, 12)) == 0
    finally:
        spark2.sql("DROP TABLE IF EXISTS py_ph_ref_buckets")

    # curation funnel: per-source attrition in one scan
    fr = ops.funnel_report(docs, "source", [
        ("nonempty", "n_chars > 0"),
        ("short", "n_chars <= 400")]).collect()
    assert all(r["n_out"] <= r["n_in"] for r in fr)
    s1 = {r["group"]: r for r in fr if r["stage"] == 1}
    s2 = {r["group"]: r for r in fr if r["stage"] == 2}
    assert all(s2[g]["n_in"] == s1[g]["n_out"] for g in s1)

    print("round-12d tokenizer/readability/pca facade OK")


def test_round13_encoding_profile():
    from pyspark.sql import functions as F
    from graftspark import ops

    spark = _get_spark()
    rows = [(1, "Ab1 c\td\n"),            # clean: formatting only
            (2, "ok\ufffdtext"),           # replacement char
            (3, "ab" + "\x01" * 5),        # heavy control bytes
            (4, "caf\u00e9 \u4e2d\u6587")]  # accents + CJK
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ops.encoding_profile(df, "doc_id", "text").collect()}
    assert out[1]["n_chars"] == 8 and out[1]["n_control"] == 0
    assert not out[1]["mojibake"]
    assert out[2]["n_replacement"] == 1 and out[2]["mojibake"]
    assert out[3]["n_control"] == 5 and out[3]["mojibake"]
    assert out[4]["n_ascii"] == 4 and not out[4]["mojibake"]
    assert abs(out[4]["non_ascii_ratio"] - 3.0 / 7.0) < 1e-12
    print("round-13 encoding profile facade OK")


def test_round13_audio_dups():
    from graftspark import ops

    spark = _get_spark()
    jm = spark._jvm.graft.ops.Media
    rows = ([(i, bytearray(jm.synthesizeWavNoise(i))) for i in range(8)] +
            [(i + 100, bytearray(jm.synthesizeWavNoise(i)))
             for i in range(3)])
    df = spark.createDataFrame(rows, "id long, blob binary")
    fp = ops.audio_fingerprints(df, "id", "blob", window_frames=16)
    assert fp.count() > 0
    pairs = {(r["id_a"], r["id_b"]) for r in
             ops.audio_near_dups(df, "id", "blob", window_frames=16,
                                 min_shared_blocks=2).collect()}
    assert pairs == {(i, i + 100) for i in range(3)}
    # stored audio index: write originals, probe amplified copies
    try:
        ops.write_audio_fp_reference(df.filter("id < 100"), "id", "blob",
                                     "graft_pytest_audio",
                                     window_frames=16, num_buckets=2)
        stored = {(r["new_id"], r["ref_id"]) for r in
                  ops.audio_near_dups_stored(
                      df.filter("id >= 100"), "graft_pytest_audio",
                      "id", "blob", window_frames=16,
                      min_shared_blocks=2).collect()}
        assert {(a - 100, b) for a, b in stored if a - 100 == b} == \
            {(i, i) for i in range(3)}
    finally:
        spark.sql("DROP TABLE IF EXISTS graft_pytest_audio_buckets")
    print("round-13 audio dedup facade OK")


def test_round13_seasonality():
    import os
    from graftspark import ops

    spark = _get_spark()
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    rows = ops.seasonality(events, "ts").collect()
    assert 0 < len(rows) <= 168
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
        assert abs(r["lift"] - r["share"] * 168.0) < 1e-9
    print("round-13 seasonality facade OK")


def test_round13_privacy():
    import os
    from graftspark import ops

    spark = _get_spark()
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    rep = ops.k_anonymity_report(
        orders, ["o_orderstatus", "o_custkey"], k=3).collect()[0]
    assert rep["n_rows"] == orders.count()
    assert rep["k_anonymous"] == (rep["n_violating_groups"] == 0)
    vio = ops.k_anonymity_violations(
        orders, ["o_orderstatus", "o_custkey"], k=3, max_groups=5).collect()
    assert len(vio) <= 5
    assert all(r["group_size"] < 3 for r in vio)
    div = ops.l_diversity_report(
        orders, ["o_orderpriority", "o_custkey"], "o_orderstatus",
        l=2).collect()[0]
    assert div["n_groups"] > 0
    assert div["l_diverse"] == (div["n_violating_groups"] == 0)
    tcl = ops.t_closeness_report(
        orders, ["o_orderpriority", "o_custkey"], "o_orderstatus",
        t=0.2).collect()[0]
    assert tcl["n_rows"] == rep["n_rows"]
    assert 0.0 <= tcl["max_tvd"] <= 1.0
    assert tcl["t_close"] == (tcl["n_violating_groups"] == 0)
    print("round-13 privacy facade OK")


def test_round13_quality_screens():
    import os
    from graftspark import ops

    spark = _get_spark()
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    ben = {r["digit"]: r for r in
           ops.benford(orders, "o_totalprice").collect()}
    assert set(ben) == set(range(1, 10))
    assert abs(sum(r["share"] for r in ben.values()) - 1.0) < 1e-4
    assert ben[1]["expected"] == 0.30103
    embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    ev = embs.filter("vec_id >= 480")
    flags = ops.semantic_contamination(embs, ev, "vec_id", "embedding",
                                       0.99).collect()
    self_hits = {(r["train_id"], r["eval_id"]) for r in flags}
    assert all((i, i) in self_hits for i in range(480, 500))
    kept = ops.semantic_decontaminate(embs, ev, "vec_id", "embedding",
                                      0.99)
    assert kept.filter("vec_id >= 480").count() == 0
    hn = ops.hard_negatives(embs.limit(100), "vec_id", "embedding",
                            "label", 3)
    anchors = {r["anchor_id"] for r in hn.collect()}
    assert len(anchors) > 0
    assert hn.filter("rank < 1 OR rank > 3").count() == 0
    out = ops.embedding_outliers(embs, "vec_id", "embedding", 10).collect()
    assert len(out) == 10
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True) and scores[-1] >= 0.0
    rel = {r["feature"]: r for r in ops.feature_relevance(
        orders, ["o_orderpriority", "o_custkey"],
        "o_orderstatus").collect()}
    assert set(rel) == {"o_orderpriority", "o_custkey"}
    assert all(r["n"] > 0 for r in rel.values())
    fd = {(r["determinant"], r["dependent"]): r
          for r in ops.functional_dependencies(
              orders, [("o_orderkey", "o_custkey"),
                       ("o_custkey", "o_orderpriority")]).collect()}
    assert fd[("o_orderkey", "o_custkey")]["holds"]
    assert not fd[("o_custkey", "o_orderpriority")]["holds"]
    print("round-13 quality screens facade OK")

def test_round14_imageio_audio():
    from graftspark import ops

    spark = _get_spark()
    jvm = spark._jvm

    # PNG blobs synthesized by the JVM (lossless container of the
    # analytic PPM pixels) decode through the sniffing path with the
    # same dims the formula predicts, and hash identically to the PPM
    # twins through the SAME facade entry point
    png_blobs = [(i, bytes(jvm.graft.ops.Media.synthesizePng(i)))
                 for i in range(8)]
    ppm_blobs = [(i, bytes(jvm.graft.ops.Media.synthesizePpm(i)))
                 for i in range(8)]
    pdf = spark.createDataFrame(png_blobs, ["id", "blob"])
    mdf = spark.createDataFrame(ppm_blobs, ["id", "blob"])
    dims = {r["id"]: (r["width"], r["height"], r["channels"])
            for r in ops.decode_images(pdf, "id", "blob").collect()}
    for i in range(8):
        assert dims[i] == (4 + i % 8, 3 + i % 5, 3), dims[i]
    png_h = {r["id"]: (r["ahash"], r["dhash"])
             for r in ops.image_hashes(pdf, "id", "blob").collect()}
    ppm_h = {r["id"]: (r["ahash"], r["dhash"])
             for r in ops.image_hashes(mdf, "id", "blob").collect()}
    assert png_h == ppm_h

    # AIFF blobs (JVM AudioSystem container of the analytic WAV
    # samples) parse to the same stats as the WAV twins
    aiff = [(i, bytes(jvm.graft.ops.Media.synthesizeAiff(i)))
            for i in range(6)]
    adf = spark.createDataFrame(aiff, ["id", "blob"])
    stats = {r["id"]: (r["channels"], r["sample_rate"], r["n_frames"])
             for r in ops.audio_stats(adf, "id", "blob").collect()}
    for i in range(6):
        assert stats[i] == (1, 8000, 800 + i % 100), stats[i]
    print("round-14 imageio/audio facade OK")

    # leakage-safe split: the planted pair's two docs share one label
    docs = _docs().select("doc_id", "text").filter("doc_id < 300")
    pairs = spark.createDataFrame([(7, 107), (107, 207)],
                                  ["id_a", "id_b"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    lab = {r["doc_id"]: r["split"]
           for r in ops.leakage_safe_split(docs, "doc_id", pairs, w)
           .collect()}
    assert lab[7] == lab[107] == lab[207]
    base = {r["doc_id"]: r["split"]
            for r in ops.hash_split(docs, "doc_id", w).collect()}
    assert lab[7] == base[7]
    assert all(lab[k] == base[k] for k in lab if k not in (107, 207))

    # per-source embedding separation over the labeled vectors
    sep = ops.source_separation(_embs(), "label", "embedding")
    rows = sep.collect()
    assert len(rows) == 10
    assert all(r["separation"] is not None for r in rows)
    print("round-14 split/separation facade OK")

    # quality screens through the facade: flat PNG is low-contrast,
    # planted-clipping WAV is clipped, static video is static
    flatpng = bytes(jvm.graft.ops.Media.encodePng(
        jvm.graft.ops.Media.decodePpm(
            b"P6\n2 2\n255\n" + bytes([100] * 12))))
    idf = spark.createDataFrame([(1, flatpng)], ["id", "blob"])
    iq = ops.image_quality_stats(idf, "id", "blob").collect()[0]
    assert iq["low_contrast"] and iq["gray_min"] == 300

    wq = spark.createDataFrame(
        [(7, bytes(jvm.graft.ops.Media.synthesizeWavQuality(7))),
         (5, bytes(jvm.graft.ops.Media.synthesizeWavQuality(5)))],
        ["id", "blob"])
    aq = {r["id"]: r for r in
          ops.audio_quality_stats(wq, "id", "blob").collect()}
    assert aq[7]["clipped"] and not aq[7]["near_silent"]
    assert aq[5]["near_silent"] and not aq[5]["clipped"]

    rz = ops.resize_images(idf, "id", "blob", 4, 4).collect()[0]
    assert rz["format"] == "png" and rz["width"] == 4

    varied_v = bytes(jvm.graft.ops.Media.synthesizeGvid(9, 3, 4000))
    vdf = spark.createDataFrame([(1, varied_v)], ["id", "blob"])
    vd = ops.video_frame_diversity(vdf, "id", "blob").collect()[0]
    assert not vd["static"] and vd["n_distinct"] == 3
    # simhash near-dup join: planted exact copy pairs at hamming 0
    base = _docs().select("doc_id", "text").filter("doc_id < 100")
    copies = base.filter("doc_id < 10").selectExpr(
        "doc_id + 100000 AS doc_id", "text")
    nd = ops.simhash_near_dups(base.unionAll(copies), "doc_id", "text",
                               max_hamming=0)
    planted = {(r["id_a"], r["id_b"]) for r in nd.collect()
               if r["id_b"] == r["id_a"] + 100000}
    assert len(planted) == 10
    # lenient decode: the corrupt blob drops, the good one survives
    mix = spark.createDataFrame(
        [(1, bytes(jvm.graft.ops.Media.synthesizePng(1))),
         (2, b"\x89PNGgarbage")], ["id", "blob"])
    ok = ops.decode_images_lenient(mix, "id", "blob").collect()
    assert [r["id"] for r in ok] == [1]
    assert len(ops.image_hashes_lenient(mix, "id", "blob").collect()) == 1
    print("round-14 quality screens facade OK")


def test_round15_nested_mih():
    from pyspark.sql import functions as F
    from graftspark import ops
    spark = _get_spark()
    # nested profiling: struct -> dotted leaves, array -> element+size
    df = _docs().select(
        F.struct(F.col("n_chars").alias("len"),
                 F.col("lang").alias("lg")).alias("meta"),
        F.split(F.col("text"), " ").alias("words"))
    from graftspark.session import GraftProfileSession
    p = (GraftProfileSession(df, "nested").flattenNested().aggProfiles()
         .select(F.col("`meta.len`.numbers.count").alias("n"),
                 F.col("`words.size`.numbers.max").alias("max_words"),
                 F.col("`words`.strings.count").alias("n_words"))
         .collect()[0])
    n_docs = df.count()
    assert p["n"] == n_docs
    exact = df.select(F.sum(F.size("words")).alias("s"),
                      F.max(F.size("words")).alias("m")).collect()[0]
    assert p["n_words"] == exact["s"] and p["max_words"] == exact["m"]
    # wide-radius Hamming join through the facade: planted one-word
    # edits recover at max_hamming=12 (multi-index hashing route)
    base = _docs().select("doc_id", "text").filter("doc_id < 60")
    edits = base.filter("doc_id < 10").selectExpr(
        "doc_id + 100000 AS doc_id",
        "concat('edited ', substr(text, 8)) AS text")
    nd = ops.simhash_near_dups(base.unionAll(edits), "doc_id", "text",
                               max_hamming=12)
    planted = {(r["id_a"], r["id_b"]) for r in nd.collect()
               if r["id_b"] == r["id_a"] + 100000}
    assert len(planted) == 10, planted
    # stored SimHash screen: exact copies hit the (unchanged) store at
    # hamming 0; edits resolve through the wide-radius probe expansion
    ops.write_simhash_reference(base, "doc_id", "text", "py_r15_shref",
                                num_buckets=4)
    try:
        probe = base.filter("doc_id < 8").selectExpr(
            "doc_id + 500000 AS doc_id",
            "concat('edited ', substr(text, 8)) AS text")
        hits = {(r["new_id"], r["ref_id"]) for r in
                ops.simhash_near_dups_stored(
                    probe, "py_r15_shref", "doc_id", "text",
                    max_hamming=12).collect()}
        assert all((500000 + i, i) in hits for i in range(8)), hits
    finally:
        spark.sql("DROP TABLE IF EXISTS py_r15_shref_buckets")
    # time-shift-tolerant audio dedup: a 2-window-shifted copy pairs at
    # the planted offset through the facade
    import struct as _struct
    jvm = spark._jvm
    W = 32

    def _pcm(vals):
        gw = spark._sc._gateway
        arr = gw.new_array(gw.jvm.short, len(vals))
        for i, v in enumerate(vals):
            arr[i] = v
        return bytes(jvm.graft.ops.Media.encodeWavPcm16(8000, 1, arr))

    base_s = [((7 * 31 + i * 17 + (i * i) % 97) % 2003) - 1001
              for i in range(40 * W)]
    a_df = spark.createDataFrame(
        [(0, _pcm(base_s)), (1, _pcm([0] * (2 * W) + base_s))],
        ["id", "blob"])
    sh = ops.audio_near_dups_shifted(a_df, "id", "blob",
                                     window_frames=W,
                                     min_shared_blocks=10).collect()
    planted = [r for r in sh if r["id_a"] == 0 and r["id_b"] == 1]
    assert planted and planted[0]["shift"] == -2, sh
    # header-only image metadata: dims without decode; corrupt drops
    m_df = spark.createDataFrame(
        [(0, bytes(jvm.graft.ops.Media.synthesizePng(4))),
         (1, bytes(jvm.graft.ops.Media.synthesizeJpeg(4, 0.95))),
         (2, b"not an image")], ["id", "blob"])
    metas = {r["id"]: (r["format"], r["width"], r["height"])
             for r in ops.image_meta_lenient(m_df, "id", "blob").collect()}
    assert metas == {0: ("png", 8, 7), 1: ("jpeg", 8, 7)}, metas
    am_df = spark.createDataFrame(
        [(0, _pcm(base_s)), (1, b"xxxx")], ["id", "blob"])
    ams = {r["id"]: (r["format"], r["n_frames"])
           for r in ops.audio_meta_lenient(am_df, "id", "blob").collect()}
    assert ams == {0: ("wav", 40 * W)}, ams
    # compression screen + gzip round trip
    c_df = spark.createDataFrame(
        [(0, "spam ham " * 300),
         (1, " ".join(f"w{(i * 37 + i * i) % 9973}" for i in range(150)))],
        ["id", "text"])
    ratios = {r["id"]: r["ratio"] for r in
              ops.compression_ratio(c_df, "id", "text").collect()}
    assert ratios[0] < 0.05 < 0.3 < ratios[1], ratios
    gz = ops.gzip_texts(c_df, "id", "text")
    back = {r["id"]: r["text"] for r in
            ops.gunzip_texts(gz, "id", "blob").collect()}
    assert back[0] == "spam ham " * 300
    # dedup yield report: planted 3-chains + 2-chains
    y_corpus = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [100, 101, 200]], ["doc_id"])
    y_pairs = spark.createDataFrame(
        [(0, 100), (1, 101), (100, 200)], ["id_a", "id_b"])
    y = ops.dedup_yield(y_corpus, "doc_id", y_pairs).collect()[0]
    assert (y["n_clusters"], y["max_cluster_size"], y["n_dropped"],
            y["n_survivors"]) == (2, 3, 3, 10), y
    print("round-15 nested profile + MIH facade OK")



def test_round17_profile_store_lifecycle():
    import tempfile
    from pyspark.sql import functions as F
    from graftspark import ops

    spark = _get_spark()
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    store = tempfile.mkdtemp(prefix="graft_pystore_")

    # six simulated triggers append batch=<id> partials; replaying a
    # batch id must be idempotent (overwrite semantics)
    for b in range(6):
        batch = ev.filter(F.pmod(F.col("event_id"), F.lit(6)) == b)
        ops.store_batch_profiles(batch, b, store, keys=["event_type"])
    ops.store_batch_profiles(
        ev.filter(F.pmod(F.col("event_id"), F.lit(6)) == 2), 2, store,
        keys=["event_type"])

    def snapshot():
        return {r["event_type"]: (r["cnt"], round(r["s"], 4))
                for r in ops.merge_stored_profiles(
                    spark, store, keys=["event_type"])
                .select(F.col("event_type"),
                        F.col("value.count").alias("cnt"),
                        F.col("value.numbers.sum").alias("s"))
                .collect()}

    want = {r["event_type"]: (r["cnt"], round(r["s"], 4))
            for r in ev.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("value").alias("s")).collect()}
    assert snapshot() == want and len(want) > 0

    # compact + vacuum twice; the merged profile never changes
    ops.compact_profile_store(spark, store, 3)
    ops.vacuum_profile_store(spark, store)
    assert snapshot() == want
    ops.compact_profile_store(spark, store, 5)
    ops.vacuum_profile_store(spark, store)
    assert snapshot() == want
    # after the second vacuum the store is a single checkpoint dir
    dirs = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert dirs == ["batch=compact_5"], dirs

    # windowed store: time_column buckets each batch's profiles by
    # event time; the merged store groups by the window struct
    wstore = tempfile.mkdtemp(prefix="graft_pystore_w_")
    for b in range(2):
        batch = ev.filter(F.pmod(F.col("event_id"), F.lit(2)) == b)
        ops.store_batch_profiles(batch, b, wstore,
                                 time_column="ts", cadence="1 day")
    wm = ops.merge_stored_profiles(spark, wstore, keys=["window"])
    got_days = {(r["window"]["start"], r["cnt"])
                for r in wm.select(F.col("window"),
                                   F.col("value.count").alias("cnt"))
                .collect()}
    want_days = {(r["d"], r["cnt"]) for r in ev.groupBy(
        F.window("ts", "1 day").getField("start").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert got_days == want_days and len(want_days) > 1
    print("round-17 profile store lifecycle OK")


if __name__ == "__main__":
    main()
