"""Python entry points for the engine's LLM-data-pipeline operators.

Each function forwards to the Scala implementation through the Py4J
gateway (graft.python.PyBridge) and returns an ordinary PySpark
DataFrame — no rows cross the Python boundary. Scalar/aggregate
functions (lang_id, quality_score, minhash_sig, kll_agg, …) are not
wrapped here: register the engine's SQL surface with
``spark.sql.extensions=graft.GraftExtensions`` and call them from
``F.expr`` / ``spark.sql`` directly.
"""

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame

from .session import _jvm_bridge, _to_py_df


def exact_dedup(df: DataFrame, id_col: str, key_cols: List[str]) -> DataFrame:
    """Keep the smallest-id row per key (deterministic winner), planned as
    a min_by hash aggregate with map-side partial aggregation."""
    return _to_py_df(
        _jvm_bridge(df).exactDedup(df._jdf, id_col, list(key_cols)), df)


def exact_dup_stats(df: DataFrame, id_col: str,
                    key_cols: List[str]) -> DataFrame:
    """Per-key duplicate statistics: survivor_id + n_dupes."""
    return _to_py_df(
        _jvm_bridge(df).exactDupStats(df._jdf, id_col, list(key_cols)), df)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_k: int = 3,
                      max_bucket_size: int = 10000) -> DataFrame:
    """Banded-MinHash near-duplicate candidate pairs:
    (id_a, id_b, est_jaccard)."""
    return _to_py_df(_jvm_bridge(df).minHashLshPairs(
        df._jdf, id_col, text_col, int(num_hashes), int(bands),
        int(shingle_k), int(max_bucket_size)), df)


def near_dup_clusters(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.5, num_hashes: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      max_bucket_size: int = 10000,
                      max_iter: int = 20) -> DataFrame:
    """Near-duplicate cluster labels (id, component): LSH pairs above
    `threshold` closed transitively by connected components."""
    return _to_py_df(_jvm_bridge(df).nearDupClusters(
        df._jdf, id_col, text_col, float(threshold), int(num_hashes),
        int(bands), int(shingle_k), int(max_bucket_size), int(max_iter)), df)


def cross_corpus_near_dups(corpus: DataFrame, probe: DataFrame,
                           id_col: str, text_col: str,
                           threshold: float = 0.8, num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           max_bucket_size: int = 10000) -> DataFrame:
    """Train/eval contamination pairs at >= `threshold` EXACT
    shingle-Jaccard (LSH proposes candidates; exact Jaccard decides).
    Both id columns must be integral."""
    return _to_py_df(_jvm_bridge(corpus).crossCorpusNearDups(
        corpus._jdf, probe._jdf, id_col, text_col, float(threshold),
        int(num_hashes), int(bands), int(shingle_k),
        int(max_bucket_size)), corpus)


def embedding_near_dups(df: DataFrame, id_col: str, emb_col: str,
                        threshold: float = 0.95, sign_bits: int = 8,
                        bands: int = 8,
                        max_bucket_size: int = 10000) -> DataFrame:
    """Hyperplane-LSH embedding near-duplicate pairs at >= `threshold`
    cosine similarity."""
    return _to_py_df(_jvm_bridge(df).embeddingNearDups(
        df._jdf, id_col, emb_col, float(threshold), int(sign_bits),
        int(bands), int(max_bucket_size)), df)


def ann_brute_force(corpus: DataFrame, queries: DataFrame, id_col: str,
                    emb_col: str, k: int = 10,
                    exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k per query (queries broadcast; shuffle bounded
    at partitions x |queries| x k rows)."""
    return _to_py_df(_jvm_bridge(corpus).annBruteForce(
        corpus._jdf, queries._jdf, id_col, emb_col, int(k),
        bool(exclude_self)), corpus)


def ann_ivf(corpus: DataFrame, queries: DataFrame, id_col: str,
            emb_col: str, k: int = 10, n_centroids: int = 16,
            n_probe: int = 4, iterations: int = 2) -> DataFrame:
    """IVF-pruned approximate top-k over a Lloyd-refined codebook."""
    return _to_py_df(_jvm_bridge(corpus).annIvf(
        corpus._jdf, queries._jdf, id_col, emb_col, int(k),
        int(n_centroids), int(n_probe), int(iterations)), corpus)


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    top_n: int = 5, min_df: int = 1) -> DataFrame:
    """Per-document top-N tf-idf terms (memory-safe adaptive vocab join)."""
    return _to_py_df(_jvm_bridge(df).tfIdfTopTerms(
        df._jdf, id_col, text_col, int(top_n), int(min_df)), df)


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap: int) -> DataFrame:
    """Adds session_seq (1-based per user): a new session starts when the
    gap since the previous event exceeds `gap`, in the timestamp column's
    native units (microseconds for TIMESTAMP columns)."""
    return _to_py_df(_jvm_bridge(df).sessionize(
        df._jdf, user_col, ts_col, int(gap)), df)


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli sample by id hash — reproducible across
    runs and cluster sizes."""
    return _to_py_df(_jvm_bridge(df).hashSample(
        df._jdf, id_col, float(fraction)), df)


def bottom_k_sample(df: DataFrame, key_cols: List[str], id_col: str,
                    k: int) -> DataFrame:
    """Deterministic per-group k-row sample (bottom-k by id hash)."""
    return _to_py_df(_jvm_bridge(df).bottomKSample(
        df._jdf, list(key_cols), id_col, int(k)), df)


def iqr_outliers(df: DataFrame, value_col: str,
                 key_cols: Optional[List[str]] = None,
                 factor: float = 1.5) -> DataFrame:
    """Per-group IQR outlier bounds and counts, quartiles from the
    engine's KLL sketch (constant state per group)."""
    return _to_py_df(_jvm_bridge(df).iqrOutliers(
        df._jdf, value_col, list(key_cols or []), float(factor)), df)


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      fractions: dict, default: float = 0.0) -> DataFrame:
    """Deterministic stratified Bernoulli sample: a per-stratum keep
    fraction (e.g. ``{"en": 0.8, "de": 0.3}``); strata absent from the
    dict fall back to ``default``. Same id hash as ``hash_sample``."""
    jf = {str(k): float(v) for k, v in fractions.items()}
    return _to_py_df(_jvm_bridge(df).stratifiedSample(
        df._jdf, id_col, stratum_col, jf, float(default)), df)


def ngram_contamination(train: DataFrame, probe: DataFrame, id_col: str,
                        text_col: str, n: int = 13, min_shared: int = 1,
                        broadcast_probe: bool = True,
                        hash_grams: bool = False) -> DataFrame:
    """EXACT shared-n-gram contamination (GPT-3-style eval-set
    decontamination): (train_id, probe_id, shared_ngrams) for pairs
    sharing >= ``min_shared`` distinct token n-grams. With
    ``broadcast_probe`` the training corpus never shuffles;
    ``hash_grams`` joins on 64-bit gram hashes (~10x smaller broadcast
    for big eval sets)."""
    return _to_py_df(_jvm_bridge(train).ngramContamination(
        train._jdf, probe._jdf, id_col, text_col, int(n), int(min_shared),
        bool(broadcast_probe), bool(hash_grams)), train)


def pack_sequences(df: DataFrame, id_col: str, tok_col: str,
                   order_col: str, budget: int) -> DataFrame:
    """LM sequence packing (concat-and-chunk): every doc's global start
    offset, pack id and in-pack offset under a ``budget``-token pack
    size, computed as a distributed prefix sum.

    Pins an internal id+token-count layout cache for the session; for
    repeated packs in a long-lived session prefer
    ``pack_sequences_releasable`` and release after materializing."""
    return _to_py_df(_jvm_bridge(df).packSequences(
        df._jdf, id_col, tok_col, order_col, int(budget)), df)


def pack_sequences_releasable(df: DataFrame, id_col: str, tok_col: str,
                              order_col: str, budget: int):
    """``pack_sequences`` plus a ``release()`` callable that unpins the
    internal layout cache. Materialize the returned DataFrame FULLY
    (collect / write) before releasing."""
    handle = _jvm_bridge(df).packSequencesReleasable(
        df._jdf, id_col, tok_col, order_col, int(budget))
    return _to_py_df(handle.toDF(), df), handle.release


def hash_split(df: DataFrame, id_col: str, weights: dict) -> DataFrame:
    """Deterministic multi-way split (e.g. ``{"train": 0.8, "val": 0.1,
    "test": 0.1}``): adds a ``split`` label by id-hash range — disjoint,
    covering, and stable across runs and scales."""
    jw = {str(k): float(v) for k, v in weights.items()}
    return _to_py_df(_jvm_bridge(df).hashSplit(df._jdf, id_col, jw), df)


def top_ngram_stats(df: DataFrame, id_col: str, text_col: str,
                    n: int = 2) -> DataFrame:
    """Per-document most frequent n-gram and its share of all windows
    (the Gopher top-n-gram repetition filter)."""
    return _to_py_df(_jvm_bridge(df).topNgramStats(
        df._jdf, id_col, text_col, int(n)), df)


def frequent_lines(df: DataFrame, text_col: str,
                   min_doc_freq: int) -> DataFrame:
    """Lines recurring in >= ``min_doc_freq`` distinct documents
    (CCNet-style boilerplate detection)."""
    return _to_py_df(_jvm_bridge(df).frequentLines(
        df._jdf, text_col, int(min_doc_freq)), df)


def remove_frequent_lines(df: DataFrame, id_col: str, text_col: str,
                          min_doc_freq: int) -> DataFrame:
    """Rewrite every document without its corpus-frequent lines (order
    preserved; ``n_removed`` counts dropped lines)."""
    return _to_py_df(_jvm_bridge(df).removeFrequentLines(
        df._jdf, id_col, text_col, int(min_doc_freq)), df)


def cap_per_key(df: DataFrame, key_cols: List[str], id_col: str,
                k: int) -> DataFrame:
    """Keep at most ``k`` original rows per key (e.g. per-domain doc
    caps) — survivors are the deterministic bottom-k id-hash sample."""
    return _to_py_df(_jvm_bridge(df).capPerKey(
        df._jdf, list(key_cols), id_col, int(k)), df)


def unigram_perplexity(df: DataFrame, id_col: str, text_col: str,
                       min_count: int = 1) -> DataFrame:
    """Per-document unigram-LM perplexity under the corpus's own token
    distribution (LM quality filter)."""
    return _to_py_df(_jvm_bridge(df).unigramPerplexity(
        df._jdf, id_col, text_col, int(min_count)), df)


def bigram_perplexity(df: DataFrame, id_col: str, text_col: str,
                      lam: float = 0.75, min_count: int = 1) -> DataFrame:
    """Jelinek–Mercer interpolated bigram-LM perplexity (CCNet-style
    quality scoring one order up from the unigram filter)."""
    return _to_py_df(_jvm_bridge(df).bigramPerplexity(
        df._jdf, id_col, text_col, float(lam), int(min_count)), df)


def strip_markup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Tag-level markup strip for web-scraped text: ``<...>`` tags
    become spaces, the six ubiquitous HTML entities decode (``&amp;``
    last — no double decode), space/tab runs collapse, newlines
    survive. Row-local. Output: id, n_tags, text."""
    return _to_py_df(_jvm_bridge(df).stripMarkup(
        df._jdf, id_col, text_col), df)


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Crawl-frontier URL dedup over canonical forms (lowercased
    scheme/host, query + fragment stripped, trailing slash trimmed;
    unparseable URLs excluded). Output per canonical URL:
    canonical_url, survivor_id (smallest id), n_dupes."""
    return _to_py_df(_jvm_bridge(df).urlDedup(
        df._jdf, id_col, url_col), df)


def trigram_perplexity(df: DataFrame, id_col: str, text_col: str,
                       alpha: float = 0.4, min_count: int = 1) -> DataFrame:
    """Stupid-backoff trigram-LM perplexity (Brants et al.): trigram
    conditional if the count survives ``min_count``, else
    alpha x bigram, else alpha^2 x unigram. ``min_count`` >= 2 is both
    the regime where backoff fires and the scale bound on the trigram
    table. Output: id, n_trigrams, perplexity."""
    return _to_py_df(_jvm_bridge(df).trigramPerplexity(
        df._jdf, id_col, text_col, float(alpha), int(min_count)), df)


def weighted_sample(df: DataFrame, id_col: str,
                    weight_col: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample: each row survives with
    probability ``weight_col`` (clamped to [0,1]) — soft quality
    filtering without a hard threshold cliff."""
    return _to_py_df(_jvm_bridge(df).weightedSample(
        df._jdf, id_col, weight_col), df)


def temperature_mix(df: DataFrame, id_col: str, source_col: str,
                    target_fraction: float,
                    temperature: float = 0.5) -> DataFrame:
    """Temperature-weighted source rebalancing: per-source Bernoulli
    rates from size^T weights; map-only corpus filter."""
    return _to_py_df(_jvm_bridge(df).temperatureMix(
        df._jdf, id_col, source_col, float(target_fraction),
        float(temperature)), df)


def token_budget_select(df: DataFrame, id_col: str, tok_col: str,
                        budget: int) -> DataFrame:
    """Deterministic token-budget selection: keep the id-hash-ordered
    prefix of whole documents fitting inside ``budget`` tokens."""
    return _to_py_df(_jvm_bridge(df).tokenBudgetSelect(
        df._jdf, id_col, tok_col, int(budget)), df)


def semdedup_survivors(df: DataFrame, id_col: str, emb_col: str,
                       threshold: float = 0.95,
                       n_centroids: int = 16) -> DataFrame:
    """SemDeDup: drop semantic near-duplicates (cosine >= threshold
    within a k-means cell), keeping the lowest id per duplicate group."""
    return _to_py_df(_jvm_bridge(df).semDedupSurvivors(
        df._jdf, id_col, emb_col, float(threshold), int(n_centroids)), df)


def duplicated_spans(df: DataFrame, id_col: str, text_col: str,
                     window_tokens: int, min_docs: int = 2) -> DataFrame:
    """Repeated ``window_tokens``-token windows across the corpus
    (exact-substring duplication detection): span, n_docs."""
    return _to_py_df(_jvm_bridge(df).duplicatedSpans(
        df._jdf, id_col, text_col, int(window_tokens), int(min_docs)), df)


def bloom_semi_join(corpus: DataFrame, probe: DataFrame, key_col: str,
                    num_bits: int = 1 << 23,
                    num_hash_fns: int = 5) -> DataFrame:
    """Corpus rows whose key appears in the probe set — exact answer,
    Bloom-prefiltered map-side so only candidates reach the join."""
    return _to_py_df(_jvm_bridge(corpus).bloomSemiJoin(
        corpus._jdf, probe._jdf, key_col, int(num_bits),
        int(num_hash_fns)), corpus)


def bloom_anti_join(corpus: DataFrame, probe: DataFrame, key_col: str,
                    num_bits: int = 1 << 23,
                    num_hash_fns: int = 5) -> DataFrame:
    """Clean complement of :func:`bloom_semi_join` — the decontaminated
    corpus."""
    return _to_py_df(_jvm_bridge(corpus).bloomAntiJoin(
        corpus._jdf, probe._jdf, key_col, int(num_bits),
        int(num_hash_fns)), corpus)


def bm25_topk(docs: DataFrame, id_col: str, text_col: str,
              queries: DataFrame, qid_col: str, qtext_col: str,
              k: int, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 top-k retrieval: (query_id, doc_id, score, rank)."""
    return _to_py_df(_jvm_bridge(docs).bm25TopK(
        docs._jdf, id_col, text_col, queries._jdf, qid_col, qtext_col,
        int(k), float(k1), float(b)), docs)


def normalize_text(df: DataFrame, text_col: str) -> DataFrame:
    """Canonical ingest cleanup of ``text_col`` in place: Unicode NFC,
    control chars stripped, whitespace collapsed, ends trimmed."""
    return _to_py_df(_jvm_bridge(df).normalizeTextColumn(
        df._jdf, text_col), df)


def collapse_repeated_lines(df: DataFrame, text_col: str) -> DataFrame:
    """Collapse CONSECUTIVE repeated lines of ``text_col`` in place
    (degenerate-generation / copy-paste stutter cleanup)."""
    return _to_py_df(_jvm_bridge(df).collapseRepeatedLinesColumn(
        df._jdf, text_col), df)


def key_skew(df: DataFrame, key_cols: List[str], top_k: int) -> DataFrame:
    """Heaviest ``top_k`` values of a prospective shuffle key with exact
    counts and corpus share — run BEFORE committing a big job to the
    key; double-digit top shares want a salted join."""
    return _to_py_df(_jvm_bridge(df).keySkew(
        df._jdf, list(key_cols), int(top_k)), df)


def exact_best(df: DataFrame, key_cols: List[str], score_col: str,
               id_col: str) -> DataFrame:
    """Quality-aware exact dedup: keep the highest-scoring copy per key
    (ties to the greatest id; deterministic)."""
    return _to_py_df(_jvm_bridge(df).exactBest(
        df._jdf, list(key_cols), score_col, id_col), df)


def ann_ivfpq(corpus: DataFrame, queries: DataFrame, id_col: str,
              emb_col: str, k: int = 10, n_centroids: int = 16,
              n_probe: int = 4, m: int = 8, ksub: int = 16,
              rerank: int = 0, residual: bool = False) -> DataFrame:
    """IVF-PQ approximate top-k: coarse-cell pruning, product-quantized
    candidate scoring (asymmetric distance against broadcast codebooks),
    bounded exact re-rank — returned scores are true cosines.
    ``residual=True`` quantizes x - centroid(cell) for finer resolution
    from the same code budget."""
    return _to_py_df(_jvm_bridge(corpus).annIvfPq(
        corpus._jdf, queries._jdf, id_col, emb_col, int(k),
        int(n_centroids), int(n_probe), int(m), int(ksub),
        int(rerank), bool(residual)), corpus)


def zscore(df: DataFrame, cols: List[str],
           keys: Optional[List[str]] = None) -> DataFrame:
    """Z-score standardize ``cols`` (optionally per ``keys`` group):
    stats broadcast back, map-only apply; constant columns scale to 0."""
    return _to_py_df(_jvm_bridge(df).zscore(
        df._jdf, list(cols), list(keys or [])), df)


def min_max_scale(df: DataFrame, cols: List[str],
                  keys: Optional[List[str]] = None) -> DataFrame:
    """Min-max scale ``cols`` to [0, 1]; constant columns scale to 0."""
    return _to_py_df(_jvm_bridge(df).minMaxScale(
        df._jdf, list(cols), list(keys or [])), df)


def winsorize(df: DataFrame, value_col: str, lo_q: float, hi_q: float,
              keys: Optional[List[str]] = None) -> DataFrame:
    """Clip ``value_col`` at its per-group KLL [lo_q, hi_q] quantile
    fences (sketch-driven — no sort, no exact-percentile shuffle)."""
    return _to_py_df(_jvm_bridge(df).winsorize(
        df._jdf, value_col, float(lo_q), float(hi_q),
        list(keys or [])), df)


def validation_report(profiles: DataFrame, checks: List[List],
                      keep: Optional[List[str]] = None) -> DataFrame:
    """Profile-driven expectation report: each check is a list like
    ``["min_at_least", col, bound]``, ``["mean_between", col, lo, hi]``,
    ``["null_fraction_at_most", col, f]``, ``["distinct_between", col,
    lo, hi]``, ``["quantile_at_most", col, q, bound]`` or
    ``["type_is", col, expected]`` — evaluated purely from profile rows
    (no raw-data re-scan). Output: keep cols + (check_name, col_name,
    observed, passed 0/1)."""
    jchecks = [list(c) for c in checks]
    return _to_py_df(_jvm_bridge(profiles).validationReport(
        profiles._jdf, jchecks, list(keep or [])), profiles)


def robust_scale(df: DataFrame, value_col: str,
                 keys: Optional[List[str]] = None) -> DataFrame:
    """Median/IQR scaling from one KLL aggregate per group — the
    outlier-insensitive zscore; degenerate IQR scales to 0."""
    return _to_py_df(_jvm_bridge(df).robustScale(
        df._jdf, value_col, list(keys or [])), df)


def drift_auto_edges(reference: DataFrame, sketch_col: str,
                     probs: Optional[List[float]] = None) -> List[float]:
    """PSI/KL bin edges derived from a one-row reference profile's KLL
    sketch quantiles (default quartiles) — equal-mass drift bins."""
    out = _jvm_bridge(reference).driftAutoEdges(
        reference._jdf, sketch_col,
        [float(p) for p in (probs or [0.25, 0.5, 0.75])])
    return [float(x) for x in out]


def remove_duplicated_spans(df: DataFrame, id_col: str, text_col: str,
                            window_tokens: int,
                            min_docs: int = 2) -> DataFrame:
    """Exact-substring REMOVAL (Lee et al.): every ``window_tokens``
    window repeating across >= ``min_docs`` docs is excised from every
    document (overlapping windows merge; unique text survives). Output:
    id, cleaned text, n_removed."""
    return _to_py_df(_jvm_bridge(df).removeDuplicatedSpans(
        df._jdf, id_col, text_col, int(window_tokens), int(min_docs)), df)


def weighted_bottom_k(df: DataFrame, key_cols: List[str], id_col: str,
                      weight_col: str, k: int) -> DataFrame:
    """Weighted sampling WITHOUT replacement, ``k`` rows per group
    (Efraimidis-Spirakis A-ES with deterministic id-hash draws —
    selection probability proportional to weight, reproducible runs)."""
    return _to_py_df(_jvm_bridge(df).weightedBottomK(
        df._jdf, list(key_cols), id_col, weight_col, int(k)), df)


def metric_anomalies(profiles: DataFrame, cols: List[str],
                     keep: Optional[List[str]] = None,
                     threshold: float = 3.0) -> DataFrame:
    """Anomaly screen over a profile TIME SERIES: each window's mean of
    every listed column z-scored against the metric's distribution
    across all windows — "which week looks wrong" from stored profiles,
    no raw re-scan. Output: keep cols + (column, metric_mean, z,
    is_anomaly)."""
    return _to_py_df(_jvm_bridge(profiles).metricAnomalies(
        profiles._jdf, list(cols), list(keep or []),
        float(threshold)), profiles)


def gopher_report(df: DataFrame, id_col: str, text_col: str,
                  min_words: int = 50,
                  max_words: int = 100000) -> DataFrame:
    """The published Gopher document-quality battery (word count, mean
    word length, symbol/bullet/ellipsis ratios, alphabetic fraction,
    stopword hits) — one row per document with every measured value and
    the combined ``passed`` verdict. Row-local, zero shuffle."""
    return _to_py_df(_jvm_bridge(df).gopherReport(
        df._jdf, id_col, text_col, int(min_words), int(max_words)), df)


def c4_clean(df: DataFrame, id_col: str, text_col: str,
             min_line_words: int = 5, min_lines: int = 3) -> DataFrame:
    """C4-style cleaning: keep lines ending in terminal punctuation with
    at least ``min_line_words`` words and no javascript mention; pages
    fail when fewer than ``min_lines`` lines survive or the survivors
    contain lorem ipsum / a curly brace. Returns a TOTAL report (text,
    line counts, ``kept``) — filter ``kept = 1`` for the corpus."""
    return _to_py_df(_jvm_bridge(df).c4Clean(
        df._jdf, id_col, text_col, int(min_line_words), int(min_lines)), df)


def context_chunks(df: DataFrame, id_col: str, text_col: str,
                   window_tokens: int, stride_tokens: int) -> DataFrame:
    """Split documents into ``window_tokens``-token windows starting
    every ``stride_tokens`` (overlap when stride < window; partial tail
    kept) — the long-document half of sequence packing. Output: id,
    chunk_idx, chunk, n_tokens."""
    return _to_py_df(_jvm_bridge(df).contextChunks(
        df._jdf, id_col, text_col, int(window_tokens),
        int(stride_tokens)), df)


def categorical_psi(df: DataFrame, sk_a_col: str, sk_b_col: str,
                    eps: float = 1e-6) -> DataFrame:
    """Categorical drift: PSI over category shares read from two
    frequent-items sketch columns (``freq_items_agg`` output) — exact
    below sketch capacity, heavy-hitter approximate above it. Appends
    ``n_a``/``n_b`` (per-side totals) and ``psi``."""
    return _to_py_df(_jvm_bridge(df).categoricalPsi(
        df._jdf, sk_a_col, sk_b_col, float(eps)), df)


def dsir_weights(raw: DataFrame, target: DataFrame, id_col: str,
                 text_col: str, n_buckets: int = 4096) -> DataFrame:
    """DSIR-style importance weights: score every raw document by how
    target-like its hashed-unigram distribution is (add-one smoothed
    log probability ratios over ``n_buckets`` hashing-trick slots).
    Resample proportional to exp(logratio) to tilt the corpus toward
    the target domain. Output: id, logratio."""
    return _to_py_df(_jvm_bridge(raw).dsirWeights(
        raw._jdf, target._jdf, id_col, text_col, int(n_buckets)), raw)


def redact_pii(df: DataFrame, text_col: str,
               email_token: str = "[EMAIL]", url_token: str = "[URL]",
               phone_token: str = "[PHONE]") -> DataFrame:
    """Replace every email / URL / phone match in ``text_col`` (in
    place) with fixed placeholder tokens — the action to the PII
    counting triage. Row-local regexp chain, zero shuffle."""
    return _to_py_df(_jvm_bridge(df).redactPii(
        df._jdf, text_col, email_token, url_token, phone_token), df)


def categorical_jsd(df: DataFrame, sk_a_col: str, sk_b_col: str,
                    eps: float = 1e-6) -> DataFrame:
    """Categorical Jensen-Shannon divergence (bounded by ln 2) over
    category shares from two frequent-items sketch columns; appends
    ``jsd``."""
    return _to_py_df(_jvm_bridge(df).categoricalJsd(
        df._jdf, sk_a_col, sk_b_col, float(eps)), df)


def categorical_tvd(df: DataFrame, sk_a_col: str, sk_b_col: str,
                    eps: float = 1e-6) -> DataFrame:
    """Categorical total-variation distance between two frequent-items
    sketch columns (half the L1 share gap over the union of tracked
    items, eps-floored) — the plain fraction of shifted mass next to
    ``categorical_psi``'s log-ratio weighting. Appends ``tvd``."""
    return _to_py_df(_jvm_bridge(df).categoricalTvd(
        df._jdf, sk_a_col, sk_b_col, float(eps)), df)


def ks_statistic(df: DataFrame, sk_a_col: str, sk_b_col: str,
                 edges: List[float]) -> DataFrame:
    """Kolmogorov-Smirnov statistic between two KLL sketch columns over
    a fixed edge grid (max |CDF_a(e) - CDF_b(e)|; exact below sketch
    capacity, rank-error-bounded above). Appends ``ks``."""
    return _to_py_df(_jvm_bridge(df).ksStatistic(
        df._jdf, sk_a_col, sk_b_col, [float(e) for e in edges]), df)


def emd_distance(df: DataFrame, sk_a_col: str, sk_b_col: str,
                 edges: List[float]) -> DataFrame:
    """Earth-mover's (Wasserstein-1) distance between two KLL sketch
    columns over a fixed edge grid — how far the mass moved, in the
    value column's own units (sum of |CDF gap| x cell width; exact
    below sketch capacity). Appends ``emd``."""
    return _to_py_df(_jvm_bridge(df).emdDistance(
        df._jdf, sk_a_col, sk_b_col, [float(e) for e in edges]), df)


def schema_drift(a: DataFrame, b: DataFrame) -> DataFrame:
    """Schema-drift report between two stored dataset profiles (single
    global profile rows): per column — presence on each side, inferred
    type + changed flag, null fractions + delta, distinct estimates."""
    return _to_py_df(_jvm_bridge(a).schemaDrift(a._jdf, b._jdf), a)


def ngram_novelty(docs: DataFrame, reference: DataFrame, id_col: str,
                  text_col: str, n: int = 8) -> DataFrame:
    """Per-document fraction of distinct token n-grams NOT present in a
    reference corpus — the inverse of contamination: how much genuinely
    new text each candidate adds. Output: id, n_grams, n_novel,
    novelty."""
    return _to_py_df(_jvm_bridge(docs).ngramNovelty(
        docs._jdf, reference._jdf, id_col, text_col, int(n)), docs)


def matryoshka(df: DataFrame, emb_col: str, d: int) -> DataFrame:
    """Matryoshka-style truncation of an embedding column in place:
    keep the first ``d`` components and L2-renormalize (downstream
    cosine math works unchanged at the reduced width)."""
    return _to_py_df(_jvm_bridge(df).matryoshka(
        df._jdf, emb_col, int(d)), df)


def random_project(df: DataFrame, emb_col: str, d_out: int,
                   seed: int = 0) -> DataFrame:
    """Johnson-Lindenstrauss random projection of an embedding column
    in place, via a deterministic hash-derived +-1 sign matrix (no
    stored matrix; identical on every executor and reproducible in
    SQL). The standard pre-LSH / pre-clustering dimensionality
    reducer."""
    return _to_py_df(_jvm_bridge(df).randomProject(
        df._jdf, emb_col, int(d_out), int(seed)), df)


def quality_classifier(train: DataFrame, score: DataFrame, id_col: str,
                       text_col: str, label_col: str,
                       n_buckets: int = 4096, epochs: int = 3,
                       lr: float = 1.0) -> DataFrame:
    """Train a fastText-style linear quality classifier IN-ENGINE
    (full-batch logistic regression over hashing-trick features; one
    bounded aggregate per epoch) on ``train``, then score ``score``
    row-locally with the learned weights. Output: id, logit, score."""
    return _to_py_df(_jvm_bridge(train).trainAndScoreQuality(
        train._jdf, score._jdf, id_col, text_col, label_col,
        int(n_buckets), int(epochs), float(lr)), train)


def lang_id_trained(train: DataFrame, score: DataFrame, id_col: str,
                    text_col: str, lang_col: str, langs: List[str],
                    n_buckets: int = 4096, epochs: int = 1,
                    lr: float = 1.0) -> DataFrame:
    """Train one-vs-rest hashed language-ID models IN-ENGINE on the
    labeled ``train`` frame (all K classes train in ONE bounded
    aggregate per epoch), then score ``score`` row-locally against the
    broadcast weights — zero shuffle at scoring time. Output: id,
    pred_lang ('und' for empty text), one logit column per language."""
    return _to_py_df(_jvm_bridge(train).trainAndScoreLangId(
        train._jdf, score._jdf, id_col, text_col, lang_col,
        list(langs), int(n_buckets), int(epochs), float(lr)), train)


def image_hashes(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """aHash64 + dHash64 perceptual hashes of an image blob column —
    PPM/PNG/JPEG sniffed per row (PNG/JPEG decode through the JVM's
    ImageIO; exact integer hash forms, partition-local decode).
    Output: id, ahash, dhash."""
    return _to_py_df(_jvm_bridge(df).imageHashes(
        df._jdf, id_col, blob_col), df)


def decode_images(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL image decode of a blob column — PPM through the byte-level
    parser, PNG/JPEG through the JVM's ImageIO (zero extra
    dependencies), sniffed per row. Output: id, width, height,
    channels, mean_r, mean_g, mean_b."""
    return _to_py_df(_jvm_bridge(df).decodeImages(
        df._jdf, id_col, blob_col), df)


def audio_stats(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL audio parse of a blob column — WAV through the validated
    byte walker, AIFF/AU through the JVM's AudioSystem (zero extra
    dependencies), sniffed per row. Output: id, channels, sample_rate,
    n_frames, duration_us, rms."""
    return _to_py_df(_jvm_bridge(df).audioStats(
        df._jdf, id_col, blob_col), df)


def leakage_safe_split(df: DataFrame, id_col: str, pairs: DataFrame,
                       weights: dict, id_col_a: str = "id_a",
                       id_col_b: str = "id_b") -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate PAIRS (minhash
    / pHash / simhash output) collapse into connected components and
    every member splits by the component min id's hash, so near-dups
    never straddle a split boundary; unpaired docs split by their own
    id (== hash_split). Adds a ``split`` column."""
    return _to_py_df(_jvm_bridge(df).leakageSafeSplit(
        df._jdf, id_col, pairs._jdf,
        {k: float(v) for k, v in weights.items()}, id_col_a, id_col_b), df)


def source_separation(df: DataFrame, key_col: str,
                      emb_col: str) -> DataFrame:
    """Per-source embedding cohesion/confusion report: centroid norm,
    intra_cos (member-to-own-centroid cosine), the nearest OTHER
    centroid + cosine, and separation = intra_cos - nearest_cos. One
    row per key; singleton inputs carry NULL nearest/separation."""
    return _to_py_df(_jvm_bridge(df).sourceSeparation(
        df._jdf, key_col, emb_col), df)


def image_quality_stats(df: DataFrame, id_col: str,
                        blob_col: str) -> DataFrame:
    """Image quality screen over a PPM/PNG/JPEG blob column (sniffed
    per row): gray min/max/mean/std, near-black / near-white pixel
    fractions, 16-bin gray-histogram entropy, low_contrast verdict —
    the degenerate-capture curation filter."""
    return _to_py_df(_jvm_bridge(df).imageQualityStats(
        df._jdf, id_col, blob_col), df)


def audio_quality_stats(df: DataFrame, id_col: str,
                        blob_col: str) -> DataFrame:
    """Audio quality screen over a WAV/AIFF/AU blob column (sniffed per
    row): rms, peak, clip/silence fractions, zero crossings, and the
    clipped / near_silent verdicts — the blown-recording and
    dead-microphone curation filter."""
    return _to_py_df(_jvm_bridge(df).audioQualityStats(
        df._jdf, id_col, blob_col), df)


def resize_images(df: DataFrame, id_col: str, blob_col: str,
                  new_w: int, new_h: int) -> DataFrame:
    """Nearest-neighbor resize of a PPM/PNG/JPEG blob column with
    re-encode into the SOURCE container (JPEG at quality 0.95); means
    are measured on the resized raster before re-encode. Output: id,
    format, width, height, mean_r/g/b, out_bytes, blob."""
    return _to_py_df(_jvm_bridge(df).resizeImages(
        df._jdf, id_col, blob_col, int(new_w), int(new_h)), df)


def decode_images_lenient(df: DataFrame, id_col: str,
                          blob_col: str) -> DataFrame:
    """``decode_images`` with crawl-ingest DROP semantics: undecodable
    blobs (truncated containers, unknown magic) cost their row, never
    the job. Use the strict form for curated inputs."""
    return _to_py_df(_jvm_bridge(df).decodeImagesLenient(
        df._jdf, id_col, blob_col), df)


def image_hashes_lenient(df: DataFrame, id_col: str,
                         blob_col: str) -> DataFrame:
    """``image_hashes`` with crawl-ingest DROP semantics for corrupt
    blobs (see ``decode_images_lenient``)."""
    return _to_py_df(_jvm_bridge(df).imageHashesLenient(
        df._jdf, id_col, blob_col), df)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3,
                      max_bucket_size: int = 10000,
                      brute_threshold: int = 100000) -> DataFrame:
    """Text near-duplicate pairs by SimHash Hamming distance, exact at
    every radius: ``max_hamming`` <= 15 is served lazily at any corpus
    size by multi-index hashing (pigeonhole probe expansion over
    4 x 16-bit substrings); >= 16 routes to a bounded broadcast scan
    that counts the corpus EAGERLY at call time and refuses past
    ``brute_threshold``. One 8-byte fingerprint per doc crosses the
    shuffle — the cheapest near-dup modality; ``minhash_lsh_pairs`` is
    the higher-recall shingle path. Output: id_a, id_b, hamming."""
    return _to_py_df(_jvm_bridge(df).simHashNearDups(
        df._jdf, id_col, text_col, int(max_hamming),
        int(max_bucket_size), int(brute_threshold)), df)


def dedup_yield(corpus: DataFrame, id_col: str, pairs: DataFrame,
                id_col_a: str = "id_a",
                id_col_b: str = "id_b") -> DataFrame:
    """One-row dedup YIELD report — the operational summary every
    dedup run publishes before anyone deletes anything: n_docs,
    n_in_pairs, n_clusters, max_cluster_size, n_dropped (keep one per
    cluster), drop_frac, n_survivors. Clusters via star-contraction
    connected components over the PAIR set only; pair ids outside the
    corpus are ignored."""
    return _to_py_df(_jvm_bridge(corpus).dedupYield(
        corpus._jdf, id_col, pairs._jdf, id_col_a, id_col_b), corpus)


def compression_ratio(df: DataFrame, id_col: str, text_col: str,
                      level: int = 6) -> DataFrame:
    """Deflate compressibility screen — the Gopher/FineWeb-class
    repetitiveness signal: boilerplate and looped text compress far
    below normal prose, so ``ratio = deflate(utf8)/raw`` is a cheap
    quality filter needing no model and no reference corpus. One
    Deflater per partition; null text scores as empty (ratio 1.0).
    Output: id, raw_bytes, compressed_bytes, ratio."""
    return _to_py_df(_jvm_bridge(df).compressionRatio(
        df._jdf, id_col, text_col, int(level)), df)


def gzip_texts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gzip-compress a text column to (id, blob)."""
    return _to_py_df(_jvm_bridge(df).gzipTexts(
        df._jdf, id_col, text_col), df)


def gunzip_texts(df: DataFrame, id_col: str, blob_col: str,
                 lenient: bool = False) -> DataFrame:
    """Decompress gzip members (WARC-style crawl payloads) to text.
    Strict by default (a corrupt member fails the job);
    ``lenient=True`` drops corrupt rows instead. Output: id, text."""
    b = _jvm_bridge(df)
    j = (b.gunzipTextsLenient(df._jdf, id_col, blob_col) if lenient
         else b.gunzipTexts(df._jdf, id_col, blob_col))
    return _to_py_df(j, df)


def audio_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """HEADER-ONLY audio metadata — container, channels, sample rate,
    bit depth, frame count and exact integer-math duration WITHOUT
    touching sample data (WAV header walker; AIFF/AU via the JDK's
    header-reading AudioFileFormat). Strict — corrupt headers fail the
    job; crawl feeds use ``audio_meta_lenient``. Output: id, format,
    channels, sample_rate, bits_per_sample, n_frames, duration_us."""
    return _to_py_df(_jvm_bridge(df).audioMeta(
        df._jdf, id_col, blob_col), df)


def audio_meta_lenient(df: DataFrame, id_col: str,
                       blob_col: str) -> DataFrame:
    """``audio_meta`` with crawl-ingest DROP semantics: a corrupt
    header costs its row, never the job."""
    return _to_py_df(_jvm_bridge(df).audioMetaLenient(
        df._jdf, id_col, blob_col), df)


def image_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """HEADER-ONLY image metadata — format, dimensions, bit depth and
    component count WITHOUT pixel decode (PNG signature+IHDR, JPEG
    marker walk to SOF, PPM ASCII header): profiling the shape of an
    image corpus costs header bytes per row, not a decode. Strict —
    corrupt headers fail the job; crawl feeds use
    ``image_meta_lenient``. Output: id, format, width, height,
    bit_depth, n_components."""
    return _to_py_df(_jvm_bridge(df).imageMeta(
        df._jdf, id_col, blob_col), df)


def image_meta_lenient(df: DataFrame, id_col: str,
                       blob_col: str) -> DataFrame:
    """``image_meta`` with crawl-ingest DROP semantics: a corrupt
    header costs its row, never the job."""
    return _to_py_df(_jvm_bridge(df).imageMetaLenient(
        df._jdf, id_col, blob_col), df)


def video_near_dups_fuzzy(df: DataFrame, id_col: str, blob_col: str,
                          every_n: int = 1, max_hamming: int = 6,
                          min_shared_frames: int = 2,
                          max_bucket_size: int = 10000) -> DataFrame:
    """Radius-tolerant video near-duplicate pairs — the fuzzy twin of
    ``video_near_dups`` for re-encoded copies whose frame hashes drift
    a few bits: clips pair when at least ``min_shared_frames``
    cross-clip frame pairs sit within ``max_hamming`` (exact recall for
    radii <= 15 via the multi-index-hashing frame join; never
    all-pairs). Output: id_a, id_b, n_shared."""
    return _to_py_df(_jvm_bridge(df).videoNearDupsFuzzy(
        df._jdf, id_col, blob_col, int(every_n), int(max_hamming),
        int(min_shared_frames), int(max_bucket_size)), df)


def audio_near_dups_shifted(df: DataFrame, id_col: str, blob_col: str,
                            window_frames: int = 256,
                            min_shared_blocks: int = 4,
                            max_bucket_size: int = 10000) -> DataFrame:
    """TIME-SHIFT-TOLERANT audio near-duplicate pairs: clips pair when
    at least ``min_shared_blocks`` sliding fingerprints match at one
    consistent relative window offset (offset voting — random
    collisions scatter across offsets, a true shifted copy concentrates
    on its shift). Closes the alignment sensitivity of
    ``audio_near_dups``; tolerance granularity is ``window_frames``
    frames, at ~8x its fingerprint rows. Output: id_a, id_b, shift,
    n_shared."""
    return _to_py_df(_jvm_bridge(df).audioNearDupsShifted(
        df._jdf, id_col, blob_col, int(window_frames),
        int(min_shared_blocks), int(max_bucket_size)), df)


def image_quality_monitor(df: DataFrame, ts_col: str, cadence: str,
                          watermark: str, id_col: str,
                          blob_col: str) -> DataFrame:
    """Windowed image-quality monitor: per event-time window — rows,
    corrupt rows (decode failures cost their ROW, never the query),
    low-contrast count, luminance summary. Works on batch and
    streaming frames (append mode after the watermark closes a
    window). Output: window, n, n_corrupt, n_low_contrast, mean_gray,
    mean_frac_dark, mean_frac_bright, gray_min, gray_max."""
    return _to_py_df(_jvm_bridge(df).imageQualityMonitor(
        df._jdf, ts_col, cadence, watermark, id_col, blob_col), df)


def audio_quality_monitor(df: DataFrame, ts_col: str, cadence: str,
                          watermark: str, id_col: str,
                          blob_col: str) -> DataFrame:
    """Windowed audio-quality monitor: per event-time window — rows,
    corrupt rows, clipped / near-silent counts, RMS average, peak
    maximum. Works on batch and streaming frames. Output: window, n,
    n_corrupt, n_clipped, n_near_silent, mean_rms, peak_max."""
    return _to_py_df(_jvm_bridge(df).audioQualityMonitor(
        df._jdf, ts_col, cadence, watermark, id_col, blob_col), df)


def video_frame_diversity(df: DataFrame, id_col: str, blob_col: str,
                          every_n: int = 1) -> DataFrame:
    """Static/low-diversity video screen: distinct perceptual frame
    appearances (aHash+dHash) over the sampled frames per video, the
    diversity ratio, and the static verdict (every frame identical).
    Corrupt containers drop whole."""
    return _to_py_df(_jvm_bridge(df).videoFrameDiversity(
        df._jdf, id_col, blob_col, int(every_n)), df)


def image_hash_near_dups(df: DataFrame, id_col: str, blob_col: str,
                         max_hamming: int = 3, use_dhash: bool = True,
                         max_bucket_size: int = 10000,
                         brute_threshold: int = 100000) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.
    Recall is exact at any radius: ``max_hamming`` <= 15 is served
    lazily at any corpus size by multi-index hashing over 4 x 16-bit
    substrings (blobs never shuffle, only hash/bucket rows do);
    ``max_hamming`` >= 16 routes to a measured-count bounded broadcast
    scan that materializes the decode EAGERLY at call time and refuses
    past ``brute_threshold``.
    Output: id_a, id_b, hamming with id_a < id_b."""
    return _to_py_df(_jvm_bridge(df).imageHashNearDups(
        df._jdf, id_col, blob_col, int(max_hamming), bool(use_dhash),
        int(max_bucket_size), int(brute_threshold)), df)


def image_phashes(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """pHash64 DCT perceptual hashes of a PPM image blob column
    (32x32 gray, orthonormal 2D DCT-II, low 8x8 block thresholded at
    the non-DC median; partition-local decode). Output: id, phash."""
    return _to_py_df(_jvm_bridge(df).imagePHashes(
        df._jdf, id_col, blob_col), df)


def phash_near_dups(df: DataFrame, id_col: str, blob_col: str,
                    max_hamming: int = 3,
                    max_bucket_size: int = 10000,
                    brute_threshold: int = 100000) -> DataFrame:
    """Near-duplicate image pairs by DCT perceptual-hash (pHash)
    Hamming distance — the recompression-robust twin of
    ``image_hash_near_dups`` with the same routed engine. JPEG
    recompression drifts pHash by ~8-10 of 64 bits at quality 0.95,
    so use ``max_hamming`` ~ 12 — served at any corpus size by the
    exact multi-index-hashing equi-join; only >= 16 falls back to the
    eager bounded scan with its ``brute_threshold`` refusal.
    Output: id_a, id_b, hamming with id_a < id_b."""
    return _to_py_df(_jvm_bridge(df).pHashNearDups(
        df._jdf, id_col, blob_col, int(max_hamming),
        int(max_bucket_size), int(brute_threshold)), df)


def video_near_dups(df: DataFrame, id_col: str, blob_col: str,
                    every_n: int = 1, min_shared_frames: int = 2,
                    max_bucket_size: int = 10000) -> DataFrame:
    """Video near-duplicate pairs by shared sampled-frame perceptual
    hashes (aHash per sampled frame, distinct per video; candidate
    pairs generate only inside capped per-hash buckets — video bytes
    never shuffle). Corrupt containers drop whole. Output: id_a, id_b,
    n_shared with id_a < id_b."""
    return _to_py_df(_jvm_bridge(df).videoNearDups(
        df._jdf, id_col, blob_col, int(every_n),
        int(min_shared_frames), int(max_bucket_size)), df)


def wav_window_stats(df: DataFrame, id_col: str, blob_col: str,
                     window_frames: int) -> DataFrame:
    """Windowed audio stats of a PCM16 WAV blob column: per-window RMS,
    per-channel zero-crossing count, and peak amplitude (JVM codec,
    partition-local, one row per (file, window))."""
    return _to_py_df(_jvm_bridge(df).wavWindowStats(
        df._jdf, id_col, blob_col, int(window_frames)), df)


def write_novelty_reference(reference: DataFrame, text_col: str,
                            table: str, n: int = 8,
                            num_buckets: int = 64) -> None:
    """Persist a reference corpus's distinct n-gram hashes as a bucketed
    store table: pay the reference's gram extraction + distinct +
    shuffle ONCE, then score any number of incoming batches against it
    with ``ngram_novelty_stored`` (the reference never re-exchanges)."""
    _jvm_bridge(reference).writeNoveltyReference(
        reference._jdf, text_col, int(n), table, int(num_buckets))


def ngram_novelty_stored(docs: DataFrame, table: str, id_col: str,
                         text_col: str, n: int = 8) -> DataFrame:
    """Per-document n-gram novelty against a stored
    ``write_novelty_reference`` table — same semantics as
    ``ngram_novelty``, but the corpus-sized reference side scans
    bucketed and only the incoming documents' grams shuffle. Output:
    id, n_grams, n_novel, novelty."""
    return _to_py_df(_jvm_bridge(docs).ngramNoveltyStored(
        docs._jdf, table, id_col, text_col, int(n)), docs)


def novelty_score_broadcast(docs: DataFrame, reference: DataFrame,
                            id_col: str, text_col: str,
                            n: int = 8) -> DataFrame:
    """Row-local novelty scoring against a broadcast reference gram set
    — the streaming-safe form (stateless append-mode projection; works
    on batch AND streaming frames). The reference is collected once at
    call time, so use it for eval-set-sized references;
    ``ngram_novelty_stored`` is the corpus-scale path. Output: id,
    n_grams, n_novel, novelty."""
    return _to_py_df(_jvm_bridge(reference).noveltyScoreBroadcast(
        docs._jdf, reference._jdf, id_col, text_col, int(n)), docs)


def novelty_score_bloom(docs: DataFrame, reference: DataFrame,
                        id_col: str, text_col: str, n: int = 8,
                        num_bits: int = 1 << 27,
                        num_hash_fns: int = 5) -> DataFrame:
    """``novelty_score_broadcast`` with the reference collapsed into
    fixed-size Bloom filter bytes (``num_bits`` / 8 bytes regardless of
    reference size) instead of an exact gram array — the bounded-state
    form for references too large to collect distinct gram hashes to
    the driver. Novelty is a LOWER bound: a false positive marks a
    truly novel gram as seen (rate set by num_bits/num_hash_fns; size
    num_bits ~ 10x expected distinct grams for ~1%). No false
    negatives. Output: id, n_grams, n_novel, novelty."""
    return _to_py_df(_jvm_bridge(reference).noveltyScoreBloom(
        docs._jdf, reference._jdf, id_col, text_col, int(n),
        int(num_bits), int(num_hash_fns)), docs)


def audio_fingerprints(df: DataFrame, id_col: str, blob_col: str,
                       window_frames: int = 256) -> DataFrame:
    """64-bit audio sub-fingerprints of a binary PCM16-WAV column
    (Haitsma-Kalker-style band-energy-delta signs over Goertzel
    energies, 8 bands x 8 delta-windows per block). Amplitude-scale
    invariant; partition-local decode, audio bytes never shuffle;
    corrupt blobs drop row-wise. Output: id, block, fp."""
    return _to_py_df(_jvm_bridge(df).audioFingerprints(
        df._jdf, id_col, blob_col, int(window_frames)), df)


def audio_near_dups(df: DataFrame, id_col: str, blob_col: str,
                    window_frames: int = 256,
                    min_shared_blocks: int = 2,
                    max_bucket_size: int = 10000) -> DataFrame:
    """Audio near-duplicate pairs: clips sharing >=
    ``min_shared_blocks`` exact (block, fingerprint) cells — the
    re-encoded / volume-normalized duplicate screen
    (alignment-sensitive by design). LSH shape: buckets on
    (block, fp), never all-pairs; oversized buckets (silence, test
    tones) drop at ``max_bucket_size``. Output: id_a, id_b,
    n_shared."""
    return _to_py_df(_jvm_bridge(df).audioNearDups(
        df._jdf, id_col, blob_col, int(window_frames),
        int(min_shared_blocks), int(max_bucket_size)), df)


def encoding_profile(df: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """Encoding-hygiene profile — the mojibake / corruption screen:
    per row, counts of ASCII / letters / digits / whitespace / control
    characters (tab, CR, LF excluded) / U+FFFD replacement characters,
    the non-ASCII ratio, and a ``mojibake`` verdict (any replacement
    char, or control characters above 1% of the text). Row-local regex
    counting over explicit char ranges — zero shuffle at any scale;
    NULL text yields NULL fields. Output: id, n_chars, n_ascii,
    n_letter, n_digit, n_ws, n_control, n_replacement,
    non_ascii_ratio, mojibake."""
    return _to_py_df(_jvm_bridge(df).encodingProfile(
        df._jdf, id_col, text_col), df)


def doremi_weights(df: DataFrame, domain_col: str, proxy_loss_col: str,
                   ref_loss_col: str, eta: float = 1.0, steps: int = 10,
                   smoothing: float = 0.1) -> DataFrame:
    """DoReMi-lite domain mixture weights (Xie et al. 2023): a
    deterministic fixed-iteration multiplicative-weights update over
    per-domain mean excess loss (clipped at 0), smoothed toward uniform
    each step. One K-row aggregate over the corpus; the iteration runs
    on K doubles. Output: domain, excess, weight (weights sum to 1)."""
    return _to_py_df(_jvm_bridge(df).doremiWeights(
        df._jdf, domain_col, proxy_loss_col, ref_loss_col, float(eta),
        int(steps), float(smoothing)), df)


def apply_mixture_weights(df: DataFrame, domain_col: str, id_col: str,
                          weights: DataFrame, target_fraction: float,
                          weight_domain_col: str = "domain",
                          weight_col: str = "weight") -> DataFrame:
    """Resample a corpus toward a target domain mixture: each domain
    keeps the deterministic id-hash fraction min(1, f*N*w_k/n_k), so
    survivors approximate ``target_fraction * N`` rows distributed as
    the weights (``doremi_weights`` output plugs in directly). Domains
    absent from ``weights`` are dropped; the corpus-side filter is
    map-only."""
    return _to_py_df(_jvm_bridge(df).applyMixtureWeights(
        df._jdf, domain_col, id_col, weights._jdf,
        float(target_fraction), weight_domain_col, weight_col), df)


def funnel_depth(df: DataFrame, user_col: str, ts_col: str,
                 type_col: str, steps: List[str],
                 tie_cols: Optional[List[str]] = None) -> DataFrame:
    """Ordered funnel analysis per user: ``depth`` (0..K steps reached
    in strict event order) plus ``t_step1..t_stepK`` first-completion
    times (NULL where unreached). One events shuffle regardless of K;
    the step flags chain through window passes over a single sort.
    Pass the event id in ``tie_cols`` for deterministic same-time
    ordering."""
    return _to_py_df(_jvm_bridge(df).funnelDepth(
        df._jdf, user_col, ts_col, type_col, list(steps),
        list(tie_cols or [])), df)


def retention_cohorts(df: DataFrame, user_col: str,
                      ts_col: str) -> DataFrame:
    """Cohort retention triangle: users cohort by the UTC day of their
    first event; each (cohort_day, day_offset) row counts the distinct
    users active that many days after their cohort day. The (user, day)
    distinct is the only event-scale exchange and it carries 16-byte
    pairs. Output: cohort_day, day_offset, n_users."""
    return _to_py_df(_jvm_bridge(df).retentionCohorts(
        df._jdf, user_col, ts_col), df)


def write_shards(df: DataFrame, id_col: str, n_shards: int,
                 path: str) -> None:
    """Write the corpus as a deterministic training-shard layout:
    ``shard=N/part-*.parquet`` dirs with shard = 52-bit-md5(id) mod
    ``n_shards`` (derivable without reading the output) and in-shard
    rows in id-hash order — a stable unbiased shuffle for dataloaders.
    One exchange total; read back with ``spark.read.parquet(path)``
    (shard-filtered reads stay partition-pruned)."""
    _jvm_bridge(df).writeShards(df._jdf, id_col, int(n_shards), path)


def event_transitions(df: DataFrame, user_col: str, ts_col: str,
                      type_col: str,
                      tie_cols: Optional[List[str]] = None) -> DataFrame:
    """Event-flow transition matrix: per (from_type, to_type) count of
    immediately-consecutive event pairs within each user's (time, tie)
    order, with a terminal NULL ``to_type`` row per user's last event.
    One events shuffle + a bounded types-squared aggregate. Output:
    from_type, to_type, n."""
    return _to_py_df(_jvm_bridge(df).eventTransitions(
        df._jdf, user_col, ts_col, type_col, list(tie_cols or [])), df)


def percentile_ranks(df: DataFrame, value_col: str,
                     keys: Optional[List[str]] = None,
                     out_col: str = "pct_rank") -> DataFrame:
    """EXACT empirical-CDF table for ``value_col`` (optionally per
    ``keys`` group): one row per distinct (group, value) with SQL
    ``cume_dist()`` semantics, computed with a distributed prefix sum
    over distinct values — never a single-task global window. NULL
    values are excluded."""
    return _to_py_df(_jvm_bridge(df).percentileRanks(
        df._jdf, value_col, list(keys or []), out_col), df)


def percentile_rank(df: DataFrame, value_col: str,
                    keys: Optional[List[str]] = None,
                    out_col: str = "pct_rank") -> DataFrame:
    """Attach the exact percentile rank of ``value_col`` to every row
    (NULL values get a NULL rank). The rank table rides back through a
    shuffle join on (keys, value)."""
    return _to_py_df(_jvm_bridge(df).percentileRank(
        df._jdf, value_col, list(keys or []), out_col), df)


def embedding_drift(current: DataFrame, reference: DataFrame,
                    emb_col: str) -> DataFrame:
    """One-row embedding-distribution drift summary: n_cur, n_ref,
    mean_cosine (cosine between mean vectors), mean_l2_shift, and the
    average row L2 norms of each side. One map-side-combined aggregate
    per side; vectors never shuffle."""
    return _to_py_df(_jvm_bridge(current).embeddingDrift(
        current._jdf, reference._jdf, emb_col), current)


def embedding_drift_by_dim(current: DataFrame, reference: DataFrame,
                           emb_col: str) -> DataFrame:
    """Per-dimension drill-down of :func:`embedding_drift`: one row per
    dimension with mean_cur, mean_ref and the absolute shift."""
    return _to_py_df(_jvm_bridge(current).embeddingDriftByDim(
        current._jdf, reference._jdf, emb_col), current)


def with_zorder_key(df: DataFrame, cols: List[str],
                    bits: int = 16) -> DataFrame:
    """Attach the Morton z-order key (``zkey``) over ``cols``:
    per-column min/max linear bucketing to ``bits`` bits, bit
    positions interleaved LSB-first. One stats aggregate + a map-only
    projection; engine-reproducible."""
    return _to_py_df(_jvm_bridge(df).withZKey(
        df._jdf, list(cols), int(bits)), df)


def write_zordered(df: DataFrame, cols: List[str], path: str,
                   bits: int = 16, num_files: int = 0) -> None:
    """Write ``df`` z-ordered on ``cols``: each parquet file covers one
    compact Z-curve segment, so min/max pruning works for predicates on
    ANY clustered column. Read back with ``spark.read.parquet``."""
    _jvm_bridge(df).writeZOrdered(df._jdf, list(cols), path, int(bits),
                                  int(num_files))


def write_manifest(spark, layout_path: str, cols: List[str],
                   manifest_path: str) -> None:
    """Write the file-stats manifest (one row per data file: row count
    + per-column min/max) for the parquet layout at ``layout_path`` —
    the data-skipping index for :func:`pruned_read`. One column-pruned
    scan of the layout."""
    from .session import _BRIDGE
    getattr(spark._jvm, _BRIDGE).writeManifest(
        spark._jsparkSession, layout_path, list(cols), manifest_path)


def pruned_read(spark, layout_path: str, manifest_path: str,
                value_col: str, lo: float, hi: float) -> DataFrame:
    """Manifest-pruned range read: only files whose recorded [min, max]
    envelope intersects [lo, hi] are scanned; the predicate is
    re-applied row-exactly and still pushes down for row-group pruning
    within the kept files."""
    from pyspark.sql import DataFrame as PyDataFrame
    from .session import _BRIDGE
    jdf = getattr(spark._jvm, _BRIDGE).prunedRead(
        spark._jsparkSession, layout_path, manifest_path, value_col,
        float(lo), float(hi))
    return PyDataFrame(jdf, spark)


def decayed_score(df: DataFrame, key_col: str, ts_col: str,
                  value_col: str, half_life_seconds: float) -> DataFrame:
    """Time-decayed per-key event score: each event contributes
    ``value * 2^(-(age / half_life))`` with age measured back from the
    key's own most recent event (replay-stable — no wall clock).
    Output: key, ewma_score, n_events, last_t (epoch micros). One
    events shuffle."""
    return _to_py_df(_jvm_bridge(df).decayedScore(
        df._jdf, key_col, ts_col, value_col,
        float(half_life_seconds)), df)


def decayed_count(df: DataFrame, key_col: str, ts_col: str,
                  half_life_seconds: float) -> DataFrame:
    """Time-decayed per-key event count (every event weighs 1):
    recency-weighted activity level with the same decay anchor as
    :func:`decayed_score`."""
    return _to_py_df(_jvm_bridge(df).decayedCount(
        df._jdf, key_col, ts_col, float(half_life_seconds)), df)


def corr_matrix(df: DataFrame, cols: List[str]) -> DataFrame:
    """Long-form pairwise Pearson correlation + sample covariance over
    numeric columns (NULLs excluded pairwise). One aggregation job:
    input rows never shuffle, only moment buffers do. Output:
    (col_a, col_b, pearson, covariance, n)."""
    return _to_py_df(
        _jvm_bridge(df).corrMatrix(df._jdf, list(cols)), df)


def categorical_association(df: DataFrame, col_a: str,
                            col_b: str) -> DataFrame:
    """Association between two categorical columns: one row with
    mutual information (nats), Pearson's chi-squared over the full
    grid, Cramer's V, n, and both cardinalities. The input reduces to
    its contingency cells in one hash aggregate."""
    return _to_py_df(
        _jvm_bridge(df).categoricalAssociation(df._jdf, col_a, col_b), df)


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             weight_col: Optional[str] = None, iterations: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank by fixed power iteration with dangling-mass
    redistribution (parallel edges merge by summed weight; unweighted
    edges count). Output: (node, rank, scaled_rank = rank * N)."""
    return _to_py_df(_jvm_bridge(edges).pageRank(
        edges._jdf, src_col, dst_col, weight_col or "",
        int(iterations), float(damping)), edges)


def knn_label_noise(df: DataFrame, id_col: str, emb_col: str,
                    label_col: str, k: int = 10,
                    brute_force_threshold: int = 20000,
                    n_centroids: int = 16,
                    n_probe: int = 16) -> DataFrame:
    """Label-noise screen by cosine k-NN disagreement: per point, the
    neighborhood majority label, disagreement fraction, and a suspect
    flag (majority differs from own label). Auto-routed on a measured
    count: at or below ``brute_force_threshold`` rows the neighbors
    are exact broadcast brute force; above it they come from IVF
    (exact while ``n_probe == n_centroids``, approximate below). For
    full control compute neighbors yourself and use
    :func:`label_noise_from_neighbors`."""
    return _to_py_df(_jvm_bridge(df).knnLabelNoiseRouted(
        df._jdf, id_col, emb_col, label_col, int(k),
        int(brute_force_threshold), int(n_centroids), int(n_probe)), df)


def label_noise_from_neighbors(neighbors: DataFrame, labels: DataFrame,
                               id_col: str, label_col: str) -> DataFrame:
    """Label-noise scoring over any precomputed (query_id, item_id)
    neighbor frame — brute-force or IVF/IVF-PQ."""
    return _to_py_df(_jvm_bridge(neighbors).labelNoiseFromNeighbors(
        neighbors._jdf, labels._jdf, id_col, label_col), neighbors)


def source_overlap(df: DataFrame, group_col: str, text_col: str,
                   n: int = 8) -> DataFrame:
    """Pairwise n-gram Jaccard overlap BETWEEN corpus groups (sources,
    snapshots, shards) — the overlap matrix run before document-level
    dedup. Grams reduce to per-(group, 64-bit hash) distinct keys in
    one reused exchange; gram text never shuffles. Output one row per
    unordered pair: (source_a, source_b, n_a, n_b, n_common, jaccard),
    zero-overlap pairs included."""
    return _to_py_df(_jvm_bridge(df).sourceOverlap(
        df._jdf, group_col, text_col, int(n)), df)


def rolling_window_stats(df: DataFrame, key_col: str, ts_col: str,
                         value_col: str,
                         window_seconds: int) -> DataFrame:
    """Exact trailing-window per-event statistics: every input row plus
    t_micros, n_window, sum_window, mean_window over the key's events
    in the preceding window (inclusive). One hash exchange + sort — a
    single RANGE window, no self-join."""
    return _to_py_df(_jvm_bridge(df).rollingWindowStats(
        df._jdf, key_col, ts_col, value_col, int(window_seconds)), df)


def fuzzy_join(left: DataFrame, right: DataFrame, id_col: str,
               key_col: str, max_dist: int, prefix_len: int = 1,
               symmetric_prefixes: bool = True) -> DataFrame:
    """Fuzzy (edit-distance) record-linkage join: pairs whose string
    keys are within max_dist Levenshtein edits, generated through
    (prefix, length-band) blocking — an equi-join on block keys, never
    a cartesian product. Output: left_id, left_key, right_id,
    right_key, dist."""
    return _to_py_df(_jvm_bridge(left).fuzzyJoin(
        left._jdf, right._jdf, id_col, key_col, int(max_dist),
        int(prefix_len), bool(symmetric_prefixes)), left)


def trending_items(df: DataFrame, ts_col: str, item_col: str,
                   bucket_seconds: int, k: int) -> DataFrame:
    """Top-k item types per fixed time bucket by event count (ties to
    the smaller item). Events collapse to (bucket, item) cells
    map-side; the top-k window runs over cells, not events. Output:
    bucket_start (epoch micros), item, n, rank."""
    return _to_py_df(_jvm_bridge(df).trendingItems(
        df._jdf, ts_col, item_col, int(bucket_seconds), int(k)), df)


def touch_attribution(df: DataFrame, key_col: str, ts_col: str,
                      type_col: str, tie_col: str,
                      touch_types: List[str], conversion_type: str,
                      lookback_seconds: int) -> DataFrame:
    """First/last-touch conversion attribution: for every conversion
    event, the key's first and last touch event inside the preceding
    lookback (strictly before the conversion). One exchange + sort
    carries both window passes; unattributed conversions report NULL
    touch columns."""
    return _to_py_df(_jvm_bridge(df).touchAttribution(
        df._jdf, key_col, ts_col, type_col, tie_col,
        list(touch_types), conversion_type, int(lookback_seconds)), df)


def label_propagation(edges: DataFrame, src_col: str, dst_col: str,
                      iterations: int = 5) -> DataFrame:
    """Community detection by self-vote synchronous label propagation
    over the symmetrized edge set: deterministic (ties to the smallest
    label), replay- and partitioning-stable. Output: (node, label)."""
    return _to_py_df(_jvm_bridge(edges).labelPropagation(
        edges._jdf, src_col, dst_col, int(iterations)), edges)


def kmeans_clusters(df: DataFrame, id_col: str, emb_col: str, k: int,
                    iterations: int = 2) -> DataFrame:
    """Deterministic cosine k-means over an embedding column (init =
    first k rows by id, Lloyd refinement): training is map-only passes
    plus a k-row aggregate each; the assignment is one more map pass —
    the corpus never shuffles. Output: (id, cluster)."""
    return _to_py_df(_jvm_bridge(df).kmeansClusters(
        df._jdf, id_col, emb_col, int(k), int(iterations)), df)


def inter_arrival_stats(df: DataFrame, key_col: str,
                        ts_col: str) -> DataFrame:
    """Per-key inter-arrival statistics (burstiness profile): n_gaps,
    mean/min/max gap seconds, sample std-dev, coefficient of
    variation. One exchange: the lag window and the aggregate share
    the key partitioning."""
    return _to_py_df(_jvm_bridge(df).interArrivalStats(
        df._jdf, key_col, ts_col), df)


def concentration(df: DataFrame, key_col: str,
                  value_col: Optional[str] = None) -> DataFrame:
    """Activity concentration across keys: Gini coefficient +
    top-decile share of per-key weight (row counts, or value_col's
    sum). Events collapse to per-key totals first; the global sort
    ranks keys, not events."""
    return _to_py_df(_jvm_bridge(df).concentration(
        df._jdf, key_col, value_col or ""), df)


def zipf_fit(df: DataFrame, text_col: str, top_n: int = 200) -> DataFrame:
    """Zipf-law OLS fit of ln(count) on ln(rank) over the corpus's
    top-N tokens: slope ~ -1 for natural text. Output one row: slope,
    intercept, r2, n_ranks."""
    return _to_py_df(_jvm_bridge(df).zipfFit(
        df._jdf, text_col, int(top_n)), df)


def degree_stats(edges: DataFrame, src_col: str,
                 dst_col: str) -> DataFrame:
    """Per-node degree statistics over a directed edge table: out_deg,
    in_deg (parallel edges collapse, self-loops drop) and deg, the
    undirected distinct-neighbor count."""
    return _to_py_df(_jvm_bridge(edges).degreeStats(
        edges._jdf, src_col, dst_col), edges)


def triangle_stats(edges: DataFrame, src_col: str,
                   dst_col: str) -> DataFrame:
    """Global triangle census of the undirected graph via the
    degree-orientation wedge join (every triangle counted once at its
    smallest-degree corner; wedge work bounded O(m^1.5)). One row:
    n_nodes, n_edges, n_wedges, n_triangles, global_clustering."""
    return _to_py_df(_jvm_bridge(edges).triangleStats(
        edges._jdf, src_col, dst_col), edges)


def cusum(df: DataFrame, group_cols: List[str], order_col: str,
          value_col: str, k: float = 0.5, h: float = 4.0) -> DataFrame:
    """CUSUM level-shift screen over per-group metric time series
    (Page's test): values standardize against their own series, the
    one-sided cumulative sums run in closed form (running sum minus
    running min — one exchange, no recursion), alarm above h."""
    return _to_py_df(_jvm_bridge(df).cusum(
        df._jdf, list(group_cols), order_col, value_col,
        float(k), float(h)), df)


def corpus_diff(older: DataFrame, newer: DataFrame, id_col: str,
                compare_cols: List[str]) -> DataFrame:
    """Snapshot diff between two versions of a keyed corpus: one row
    with n_added / n_removed / n_changed / n_unchanged / n_old /
    n_new. Sides reduce to (id, content hash) map-side — payload
    columns never shuffle."""
    return _to_py_df(_jvm_bridge(older).corpusDiff(
        older._jdf, newer._jdf, id_col, list(compare_cols)), older)


def write_bloom_manifest(spark, layout_path: str, col_name: str,
                         manifest_path: str, num_bits: int = 1 << 20,
                         num_hash_fns: int = 5) -> None:
    """Per-file bloom manifest on a high-cardinality column — the
    point-lookup complement to the min/max stats manifest. False
    positives only cost an extra file scan; misses are impossible."""
    from .session import _BRIDGE
    getattr(spark._jvm, _BRIDGE).writeBloomManifest(
        spark._jsparkSession, layout_path, col_name, manifest_path,
        int(num_bits), int(num_hash_fns))


def lookup_read(spark, layout_path: str, manifest_path: str,
                col_name: str, value) -> DataFrame:
    """Bloom-pruned equality read: only files whose bloom might contain
    value are scanned; the predicate re-applies row-exactly."""
    from pyspark.sql import DataFrame as PyDataFrame
    from .session import _BRIDGE
    b = getattr(spark._jvm, _BRIDGE)
    if isinstance(value, str):
        jdf = b.lookupReadString(spark._jsparkSession, layout_path,
                                 manifest_path, col_name, value)
    else:
        jdf = b.lookupRead(spark._jsparkSession, layout_path,
                           manifest_path, col_name, int(value))
    return PyDataFrame(jdf, spark)


def basket_co_occurrence(df: DataFrame, basket_col: str, item_col: str,
                         min_count: int = 1) -> DataFrame:
    """Market-basket item-pair association: one row per unordered
    co-occurring pair with n_ab/n_a/n_b, support, confidence, lift
    (per-basket presence is distinct). Pair generation stays inside
    each basket's partition; only counts survive."""
    return _to_py_df(_jvm_bridge(df).basketCoOccurrence(
        df._jdf, basket_col, item_col, int(min_count)), df)


def auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Tie-corrected Mann-Whitney ROC AUC: one sort via window + a
    1-row aggregate — no pairwise join. Output: n_pos, n_neg, auc."""
    return _to_py_df(_jvm_bridge(df).auc(
        df._jdf, score_col, label_col), df)


def calibration_report(df: DataFrame, score_col: str, label_col: str,
                       n_bins: int = 10) -> DataFrame:
    """Reliability table over equal-width score bins: per bin — n,
    mean_score (confidence), frac_pos (accuracy), gap."""
    return _to_py_df(_jvm_bridge(df).calibrationReport(
        df._jdf, score_col, label_col, int(n_bins)), df)


def ece(df: DataFrame, score_col: str, label_col: str,
        n_bins: int = 10) -> DataFrame:
    """Expected calibration error: bin-mass-weighted mean |gap|."""
    return _to_py_df(_jvm_bridge(df).ece(
        df._jdf, score_col, label_col, int(n_bins)), df)


def brier_score(df: DataFrame, score_col: str,
                label_col: str) -> DataFrame:
    """One-row Brier score (mean squared probability gap — the strictly
    proper rule penalizing miscalibration AND lack of resolution) plus
    the base rate skill reference. Output: n, brier, base_rate."""
    return _to_py_df(_jvm_bridge(df).brierScore(
        df._jdf, score_col, label_col), df)


def lift_table(df: DataFrame, score_col: str, label_col: str,
               n_bins: int = 10) -> DataFrame:
    """Decile lift / cumulative-gains table: rows rank from the top
    score down via a distributed prefix sum (never a single-partition
    window) into ``n_bins`` equal-population bins; tie groups land
    whole in the bin of their last row. Output per bin: bin, n, n_pos,
    pos_rate, cum_capture, lift."""
    return _to_py_df(_jvm_bridge(df).liftTable(
        df._jdf, score_col, label_col, int(n_bins)), df)


def average_precision(df: DataFrame, score_col: str,
                      label_col: str) -> DataFrame:
    """One-row average precision (step-interpolated PR-curve area at
    distinct-score granularity) — the imbalance-honest companion to
    ``auc``: both cumulatives come from one multi-weight distributed
    prefix sum. Output: n_pos, n_neg, ap."""
    return _to_py_df(_jvm_bridge(df).averagePrecision(
        df._jdf, score_col, label_col), df)


def threshold_report(df: DataFrame, score_col: str, label_col: str,
                     thresholds: List[float]) -> DataFrame:
    """Operating-point table: per candidate threshold, the confusion
    counts of ``score >= t`` plus accuracy / precision / recall / F1 /
    MCC / Cohen's kappa (NULL on empty denominators). One aggregate
    with |thresholds| groups."""
    return _to_py_df(_jvm_bridge(df).thresholdReport(
        df._jdf, score_col, label_col,
        [float(t) for t in thresholds]), df)


def ranking_report(df: DataFrame, query_col: str, item_col: str,
                   score_col: str, rel_col: str, k: int) -> DataFrame:
    """Per-query ranking quality over (query, item, score, graded rel):
    NDCG@k (rel / log2(rank+1) gain), reciprocal rank (0 when no
    relevant item — averaging these is MRR), precision@k, recall@k.
    Windows partition BY QUERY; ties break by item ascending."""
    return _to_py_df(_jvm_bridge(df).rankingReport(
        df._jdf, query_col, item_col, score_col, rel_col, int(k)), df)


def acf(df: DataFrame, index_col: str, value_col: str,
        max_lag: int) -> DataFrame:
    """Sample autocorrelation of an evenly-indexed series at lags
    1..max_lag (full-series mean/denominator): the periodicity screen.
    Lag pairs come from an equi-join on the shifted index, never a
    global-sort window. Output per lag: lag, n_pairs, acf."""
    return _to_py_df(_jvm_bridge(df).acf(
        df._jdf, index_col, value_col, int(max_lag)), df)


def event_acf(df: DataFrame, ts_col: str, bucket_seconds: int,
              max_lag: int) -> DataFrame:
    """``acf`` over per-bucket event counts with empty buckets between
    the first and last event counted as genuine zeros."""
    return _to_py_df(_jvm_bridge(df).eventAcf(
        df._jdf, ts_col, int(bucket_seconds), int(max_lag)), df)


def exact_quantiles(df: DataFrame, value_col: str, qs: List[float],
                    keys: Optional[List[str]] = None) -> DataFrame:
    """EXACT discrete quantiles (SQL quantile_disc: the element at
    ascending rank max(1, ceil(q*n))) at corpus scale — the bit-exact
    contract form where approx quantiles have a rank epsilon. Output
    per (keys, q): keys..., q, n, value."""
    return _to_py_df(_jvm_bridge(df).exactQuantiles(
        df._jdf, value_col, [float(q) for q in qs],
        list(keys or [])), df)


def welch_t_test(df: DataFrame, group_col: str, value_col: str,
                 group_a: str, group_b: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (the A/B workhorse):
    one aggregate -> n_a, n_b, mean_a, mean_b, diff, se, t_stat,
    df (Welch-Satterthwaite). No p-value column: at pipeline scale df
    is huge and |t| > 1.96 is the 5% normal read."""
    return _to_py_df(_jvm_bridge(df).welchTTest(
        df._jdf, group_col, value_col, group_a, group_b), df)


def welch_t_test_by(df: DataFrame, keys: List[str], group_col: str,
                    value_col: str, group_a: str,
                    group_b: str) -> DataFrame:
    """Per-segment Welch t-tests (the experiment-readout table): one
    row per key combination, all segments from ONE aggregate.
    Underpowered segments appear with NULL t/df rather than silently
    vanishing. Multiple-testing correction is the caller's policy."""
    return _to_py_df(_jvm_bridge(df).welchTTestBy(
        df._jdf, list(keys), group_col, value_col, group_a,
        group_b), df)


def trend_slope(df: DataFrame, index_col: str,
                value_col: str) -> DataFrame:
    """Theil-Sen (exact median of pairwise slopes — outlier-proof) and
    OLS trend of a BUCKETED series side by side; disagreement means an
    outlier owns OLS. Pairs are O(series^2): bucket first. Output:
    n, n_pairs, theil_sen, ols."""
    return _to_py_df(_jvm_bridge(df).trendSlope(
        df._jdf, index_col, value_col), df)


def categorical_profile(df: DataFrame, col: str) -> DataFrame:
    """Exact distribution shape of one categorical column: n,
    cardinality, entropy (nats), normalized_entropy, gini_impurity,
    top_share. The exact twin of the frequent-items sketch summary."""
    return _to_py_df(_jvm_bridge(df).categoricalProfile(
        df._jdf, col), df)


def change_point(df: DataFrame, index_col: str,
                 value_col: str) -> DataFrame:
    """EXACT single change-point of an indexed series: the split
    minimizing two-segment squared error, every candidate scored from
    one distributed prefix-sum pass (O(n), never the O(n^2) textbook
    rescan). One row: n, split_t, n_left, mean_left, mean_right,
    sse_global, sse_split, reduction."""
    return _to_py_df(_jvm_bridge(df).changePoint(
        df._jdf, index_col, value_col), df)


def seasonal_anomalies(df: DataFrame, index_col: str, value_col: str,
                       period: int, trend_window: int,
                       z_threshold: float = 3.0) -> DataFrame:
    """Flag indices whose decomposition residual sits more than
    z_threshold sample stddevs from the mean residual — alerts on
    departures FROM the seasonal shape, not on the shape. Returns the
    flagged rows: t, v, trend, seasonal, residual, z."""
    return _to_py_df(_jvm_bridge(df).seasonalAnomalies(
        df._jdf, index_col, value_col, int(period), int(trend_window),
        float(z_threshold)), df)


def mann_whitney(df: DataFrame, group_col: str, value_col: str,
                 group_a: str, group_b: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U / z (rank-based two-sample test
    for skewed metrics), computed on distinct-value counts via the
    distributed prefix sum — never a single-partition sort. Output:
    n_a, n_b, u, z."""
    return _to_py_df(_jvm_bridge(df).mannWhitney(
        df._jdf, group_col, value_col, group_a, group_b), df)


def proportion_test(df: DataFrame, group_col: str, success_col: str,
                    group_a: str, group_b: str) -> DataFrame:
    """Pooled two-sample proportion z-test (the conversion-rate A/B
    read). Output: n_a, n_b, p_a, p_b, diff, z."""
    return _to_py_df(_jvm_bridge(df).proportionTest(
        df._jdf, group_col, success_col, group_a, group_b), df)


def cuped(df: DataFrame, metric_col: str, covariate_col: str,
          out_col: str = "adjusted") -> DataFrame:
    """CUPED variance reduction: adjusted = y - theta*(x - mean_x),
    theta = cov(x,y)/var(x) from one moment aggregate broadcast back —
    shrinks metric variance without biasing group-mean differences."""
    return _to_py_df(_jvm_bridge(df).cuped(
        df._jdf, metric_col, covariate_col, out_col), df)


def srm_check(df: DataFrame, group_col: str,
              expected: List[Tuple[str, float]]) -> DataFrame:
    """Sample-ratio-mismatch check: per designed group — n_obs,
    n_expected, chi-squared contrib — plus totals (n, n_unlisted,
    chi2) on every row. Nonzero n_unlisted means the assignment or
    logging is broken."""
    return _to_py_df(_jvm_bridge(df).srmCheck(
        df._jdf, group_col, [g for g, _ in expected],
        [float(w) for _, w in expected]), df)


def simpson_check(df: DataFrame, treat_col: str, metric_col: str,
                  strata_col: str) -> DataFrame:
    """Simpson's-paradox screen: pooled vs stratum-weighted treatment
    diff, how many strata disagree in sign, and ``flipped`` — the
    confounded-experiment smell. One (stratum, arm) aggregate."""
    return _to_py_df(_jvm_bridge(df).simpsonCheck(
        df._jdf, treat_col, metric_col, strata_col), df)


def trimmed_mean(df: DataFrame, value_col: str, lo_q: float,
                 hi_q: float) -> DataFrame:
    """Mean inside the EXACT [lo_q, hi_q] discrete-quantile cuts — the
    whale-proof location metric. Output: n, n_kept, lo_cut, hi_cut,
    trimmed_mean."""
    return _to_py_df(_jvm_bridge(df).trimmedMean(
        df._jdf, value_col, float(lo_q), float(hi_q)), df)


def ratio_test(df: DataFrame, group_col: str, num_col: str,
               den_col: str, group_a: str, group_b: str) -> DataFrame:
    """Ratio-metric A/B test (sum/sum per group, delta-method
    variance): n_a, n_b, ratio_a, ratio_b, diff, se, z. Use for
    clicks-per-view / revenue-per-session style metrics where
    mean-of-ratios over-weights tiny denominators."""
    return _to_py_df(_jvm_bridge(df).ratioTest(
        df._jdf, group_col, num_col, den_col, group_a, group_b), df)


def quantile_treatment_effects(df: DataFrame, group_col: str,
                               value_col: str, qs: List[float],
                               group_a: str,
                               group_b: str) -> DataFrame:
    """Per-quantile gap between two groups' EXACT value distributions
    (the distributional A/B read mean tests net away). Output per q:
    q, n_a, n_b, value_a, value_b, qte."""
    return _to_py_df(_jvm_bridge(df).quantileTreatmentEffects(
        df._jdf, group_col, value_col, [float(q) for q in qs],
        group_a, group_b), df)


def agreement_report(df: DataFrame, col_a: str,
                     col_b: str) -> DataFrame:
    """Inter-rater agreement between two label columns: observed
    agreement po, chance agreement pe, Cohen's kappa. One contingency
    aggregate; NULL on either side drops the row."""
    return _to_py_df(_jvm_bridge(df).agreementReport(
        df._jdf, col_a, col_b), df)


def event_series(df: DataFrame, ts_col: str,
                 bucket_seconds: int) -> DataFrame:
    """Dense per-bucket event-count series (t, n) from first to last
    event; quiet buckets count 0. Feeds ``acf`` / ``decompose``."""
    return _to_py_df(_jvm_bridge(df).eventSeries(
        df._jdf, ts_col, int(bucket_seconds)), df)


def decompose(df: DataFrame, index_col: str, value_col: str,
              period: int, trend_window: int) -> DataFrame:
    """Additive decomposition v = trend + seasonal + residual: centered
    moving-average trend (NULL at incomplete edges), per-phase seasonal
    means of the DETRENDED series, residual. The moving average comes
    from an offsets explode + hash aggregate, never a global-sort
    window. Output per index: t, v, trend, seasonal, residual."""
    return _to_py_df(_jvm_bridge(df).decompose(
        df._jdf, index_col, value_col, int(period),
        int(trend_window)), df)


def weighted_quantiles(df: DataFrame, value_col: str, weight_col: str,
                       qs: List[float],
                       keys: Optional[List[str]] = None) -> DataFrame:
    """``exact_quantiles`` with a weight per row: the smallest value
    whose cumulative weight reaches ceil(q * total) — e.g. the doc
    length cut that keeps 99% of TOKENS. Non-positive weights carry
    no rank."""
    return _to_py_df(_jvm_bridge(df).weightedQuantiles(
        df._jdf, value_col, weight_col, [float(q) for q in qs],
        list(keys or [])), df)


def name_match_pairs(left: DataFrame, right: DataFrame, id_col: str,
                     key_col: str, min_sim: float,
                     prefix_len: int = 2,
                     band_width: int = 4) -> DataFrame:
    """Blocked Jaro-Winkler record linkage: candidate pairs share a
    prefix block and adjacent length bands (the classic recall/cost
    blocking dial — NOT exact recall), scored by the codegen'd native
    jaro_winkler expression (byte-level, 0.7 boost threshold, prefix
    cap 4). Output: left_id, left_key, right_id, right_key, sim."""
    return _to_py_df(_jvm_bridge(left).nameMatchPairs(
        left._jdf, right._jdf, id_col, key_col, float(min_sim),
        int(prefix_len), int(band_width)), left)


def name_match_pairs_blocked(left: DataFrame, right: DataFrame,
                             id_col: str, key_col: str, block_col: str,
                             min_sim: float) -> DataFrame:
    """Jaro-Winkler linkage blocked on an EXTERNAL exact column (zip,
    birth year — the Fellegi-Sunter shape): names fuzzy-match only
    inside executor-sized blocks, immune to low-entropy name prefixes.
    NULL blocks drop."""
    return _to_py_df(_jvm_bridge(left).nameMatchPairsBlocked(
        left._jdf, right._jdf, id_col, key_col, block_col,
        float(min_sim)), left)


def table_checksum(df: DataFrame, cols: List[str]) -> DataFrame:
    """Order-insensitive cross-engine table checksum (md5 -> hex ->
    mod-prime -> sum): one row per component (__rows + each column)
    with the shared n. Two copies match iff every row matches — the
    migration/replication parity check that diffs k+1 numbers instead
    of the table."""
    return _to_py_df(_jvm_bridge(df).tableChecksum(
        df._jdf, list(cols)), df)


def join_size_estimate(left: DataFrame, right: DataFrame,
                       left_key_cols: List[str],
                       right_key_cols: List[str]) -> DataFrame:
    """Exact pre-flight forecast of an equi-join's output size: sides
    reduce to (key, count) map-side, the count tables join
    key-cardinality-sized. One row: n_left, n_right, n_left_keys,
    n_right_keys, n_matched_keys, join_rows."""
    return _to_py_df(_jvm_bridge(left).joinSizeEstimate(
        left._jdf, right._jdf, list(left_key_cols),
        list(right_key_cols)), left)


def referential_integrity(child: DataFrame, child_key_cols: List[str],
                          parent: DataFrame,
                          parent_key_cols: List[str]) -> DataFrame:
    """FK-violation counter: child rows referencing keys absent from
    the parent (NULL FKs tracked separately, never as orphans). One
    row: n_child, n_orphans, n_null_keys, orphan_frac."""
    return _to_py_df(_jvm_bridge(child).referentialIntegrity(
        child._jdf, list(child_key_cols), parent._jdf,
        list(parent_key_cols)), child)


def uniqueness_report(df: DataFrame, key_cols: List[str]) -> DataFrame:
    """Key-uniqueness census ("is this really a primary key"): one row
    with n_rows, n_keys, n_dupe_keys, n_dupe_rows, n_null_rows,
    dupe_frac."""
    return _to_py_df(_jvm_bridge(df).uniquenessReport(
        df._jdf, list(key_cols)), df)


def length_buckets(df: DataFrame, len_col: str,
                   boundaries: List[int]) -> DataFrame:
    """Padding-waste report for length-bucketed batching: per bucket —
    n_seqs, sum_len, padded_tokens, waste_frac (lengths above the last
    boundary truncate to it). Map-only assignment + a bounded
    aggregate."""
    return _to_py_df(_jvm_bridge(df).lengthBuckets(
        df._jdf, len_col, [int(b) for b in boundaries]), df)


def interleave_sources(df: DataFrame, source_col: str,
                       id_col: str) -> DataFrame:
    """Deterministic source-interleaved ordering: adds
    interleave_rank (the row's md5-hash position within its source);
    sorting by (interleave_rank, source) round-robins proportionally
    across sources — the balanced-shuffle write order."""
    return _to_py_df(_jvm_bridge(df).interleaveSources(
        df._jdf, source_col, id_col), df)


def blocklist_report(df: DataFrame, id_col: str, text_col: str,
                     words: List[str], max_ratio: float = 0.0) -> DataFrame:
    """C4-style blocklist screen: per document — n_tokens, n_flagged
    (case-folded exact token match), flagged_ratio, passed. Row-local,
    zero shuffle."""
    return _to_py_df(_jvm_bridge(df).blocklistReport(
        df._jdf, id_col, text_col, list(words), float(max_ratio)), df)


def url_domain_stats(df: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """URL-domain histogram over a text corpus: n_urls and distinct
    n_docs per lowercased host — the source-mix profile behind domain
    caps and quality-by-domain weighting."""
    return _to_py_df(_jvm_bridge(df).urlDomainStats(
        df._jdf, id_col, text_col), df)


def personalized_pagerank(edges: DataFrame, src_col: str, dst_col: str,
                          seeds: DataFrame, seed_col: str,
                          weight_col: Optional[str] = None,
                          iterations: int = 5,
                          damping: float = 0.85) -> DataFrame:
    """Personalized PageRank: teleport and dangling mass return to the
    seed set, so rank is relevance-to-the-seeds (seed-expansion for
    data selection). Nodes unreachable from the seeds score exactly 0.
    Output: (node, rank), summing to 1."""
    return _to_py_df(_jvm_bridge(edges).personalizedPageRank(
        edges._jdf, src_col, dst_col, seeds._jdf, seed_col,
        weight_col or "", int(iterations), float(damping)), edges)


def hits(edges: DataFrame, src_col: str, dst_col: str,
         iterations: int = 5) -> DataFrame:
    """HITS hubs-and-authorities (L1-normalized per round): hub =
    breadth of pointing, authority = breadth of being pointed at.
    Output: (node, hub, authority), each column summing to 1."""
    return _to_py_df(_jvm_bridge(edges).hits(
        edges._jdf, src_col, dst_col, int(iterations)), edges)


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Classic readability battery per row: word / sentence / syllable /
    alnum counts plus Flesch reading ease, Flesch-Kincaid grade, and ARI
    (row-local built-ins, zero shuffle; empty text scores NULL)."""
    return _to_py_df(_jvm_bridge(df).readability(
        df._jdf, id_col, text_col), df)


def pmi_collocations(df: DataFrame, text_col: str, min_count: int = 5,
                     top_k: int = 50) -> DataFrame:
    """Top bigram collocations by pointwise mutual information over the
    corpus (two vocabulary-sized count tables; deterministic rounded-PMI
    ranking). Output: w1, w2, cnt, pmi."""
    return _to_py_df(_jvm_bridge(df).pmiCollocations(
        df._jdf, text_col, int(min_count), int(top_k)), df)


def bpe_train(df: DataFrame, text_col: str, merges: int) -> DataFrame:
    """Train BPE merges over the corpus: the corpus collapses to a
    word-frequency table once, then each merge costs one tiny aggregate
    plus a 1-row argmax. Output: step, left, right, cnt (merge order)."""
    return _to_py_df(_jvm_bridge(df).bpeTrain(
        df._jdf, text_col, int(merges)), df)


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: DataFrame) -> DataFrame:
    """Piece counts per row after replaying a ``bpe_train`` merge table
    (row-local replace chain; non-alphabetic tokens count one piece).
    Output: id, n_pieces."""
    return _to_py_df(_jvm_bridge(df).bpeEncode(
        df._jdf, id_col, text_col, merges._jdf), df)


def embed_cov_matrix(df: DataFrame, emb_col: str) -> DataFrame:
    """Upper-triangular sample covariance of the embedding dimensions in
    long form (i, j, cov) — ONE bounded-state aggregate; vectors never
    shuffle."""
    return _to_py_df(_jvm_bridge(df).embedCovMatrix(
        df._jdf, emb_col), df)


def pca_project(df: DataFrame, emb_col: str, k: int) -> DataFrame:
    """Fit PCA on the embedding column (bounded moment aggregate +
    driver-side Jacobi eigensolve on the d x d covariance) and append a
    ``pca`` array column with the top-``k`` component scores."""
    return _to_py_df(_jvm_bridge(df).pcaProject(
        df._jdf, emb_col, int(k)), df)


def pca_explained_variance(df: DataFrame, emb_col: str) -> DataFrame:
    """PCA eigen-spectrum report: component, eigenvalue, variance_ratio,
    cum_ratio — the intrinsic-dimensionality diagnostic."""
    return _to_py_df(_jvm_bridge(df).pcaExplainedVariance(
        df._jdf, emb_col), df)


def write_simhash_reference(reference: DataFrame, id_col: str,
                            text_col: str, table: str,
                            num_buckets: int = 16,
                            max_bucket_size: int = 10000) -> None:
    """Persist a corpus's 8-byte SimHash fingerprint index as a
    bucketed store table (``<table>_buckets``) — the cheapest stored
    text screen by state; probe new batches with
    ``simhash_near_dups_stored``. Oversized (boilerplate) buckets drop
    at write time."""
    _jvm_bridge(reference).writeSimHashReference(
        reference._jdf, id_col, text_col, table, int(num_buckets),
        int(max_bucket_size))


def append_simhash_reference(docs: DataFrame, id_col: str,
                             text_col: str, table: str) -> None:
    """GROW a stored SimHash index with a new batch (screen first —
    ids are assumed fresh); history never rewrites."""
    _jvm_bridge(docs).appendSimHashReference(
        docs._jdf, id_col, text_col, table)


def simhash_near_dups_stored(docs: DataFrame, table: str, id_col: str,
                             text_col: str,
                             max_hamming: int = 3) -> DataFrame:
    """Near-duplicate (new doc, stored doc) pairs by SimHash Hamming
    distance against a ``write_simhash_reference`` store. Recall is
    exact for ``max_hamming`` <= 15 via multi-index-hashing probe
    expansion — wider radii expand probe keys; the store itself never
    rewrites. Output: new_id, ref_id, hamming."""
    return _to_py_df(_jvm_bridge(docs).simHashNearDupsStored(
        docs._jdf, table, id_col, text_col, int(max_hamming)), docs)


def write_minhash_reference(reference: DataFrame, id_col: str,
                            text_col: str, table: str,
                            num_hashes: int = 64, bands: int = 16,
                            shingle_k: int = 3, num_buckets: int = 64,
                            max_bucket_size: int = 10000) -> None:
    """Persist a reference corpus's MinHash-LSH index as bucketed store
    tables (``<table>_buckets`` + ``<table>_sigs``): pay shingling,
    signatures, and the bucket shuffle ONCE, then screen any number of
    new batches with ``minhash_near_dups_stored`` — the stored corpus
    never recomputes or re-exchanges. Oversized (boilerplate) buckets
    drop at write time."""
    _jvm_bridge(reference).writeMinHashReference(
        reference._jdf, id_col, text_col, table, int(num_hashes),
        int(bands), int(shingle_k), int(num_buckets),
        int(max_bucket_size))


def minhash_near_dups_stored(docs: DataFrame, table: str, id_col: str,
                             text_col: str, num_hashes: int = 64,
                             bands: int = 16, shingle_k: int = 3,
                             threshold: float = 0.8) -> DataFrame:
    """Near-duplicate pairs between a new batch and a
    ``write_minhash_reference`` store (incremental dedup): only
    batch-derived rows shuffle; the stored sides scan bucketed. Use the
    SAME num_hashes / bands / shingle_k as at write time. Output:
    new_id, ref_id, est_jaccard >= threshold."""
    return _to_py_df(_jvm_bridge(docs).minHashNearDupsStored(
        docs._jdf, table, id_col, text_col, int(num_hashes), int(bands),
        int(shingle_k), float(threshold)), docs)


def psi_matrix(df: DataFrame, group_col: str, value_col: str,
               edges: List[float]) -> DataFrame:
    """Pairwise PSI/JSD drift matrix across ALL groups of a column in
    one corpus scan (one KLL sketch per group, then the K(K-1)/2 pair
    scores read off the broadcast sketch table). Output: group_a,
    group_b, n_a, n_b, psi, jsd, ks."""
    return _to_py_df(_jvm_bridge(df).psiMatrix(
        df._jdf, group_col, value_col, [float(e) for e in edges]), df)


def pca_whiten(df: DataFrame, emb_col: str, k: int) -> DataFrame:
    """PCA-whitened top-``k`` projection: ``pca_project`` scores scaled
    to unit variance per component (decorrelated, equal-energy
    coordinates — the usual prep before cosine / linear probes)."""
    return _to_py_df(_jvm_bridge(df).pcaWhiten(
        df._jdf, emb_col, int(k)), df)


def write_ivf_index(corpus: DataFrame, id_col: str, emb_col: str,
                    table: str, n_centroids: int = 16,
                    iterations: int = 2, num_buckets: int = 16) -> None:
    """Persist an IVF ANN index at rest: the Lloyd-refined codebook and
    norm-precomputed inverted lists as bucketed store tables. Pay
    clustering + assignment once; every later query batch searches via
    ``ivf_top_k_stored`` with zero corpus-side recompute or shuffle."""
    _jvm_bridge(corpus).writeIvfIndex(
        corpus._jdf, id_col, emb_col, table, int(n_centroids),
        int(iterations), int(num_buckets))


def ivf_top_k_stored(queries: DataFrame, table: str, id_col: str,
                     emb_col: str, k: int, n_probe: int = 4) -> DataFrame:
    """Cosine top-k against a ``write_ivf_index`` store: queries assign
    to their n_probe nearest stored lists row-locally and broadcast into
    the bucketed scan. n_probe = n_centroids makes it exhaustive.
    Output: query_id, item_id, cosine, rank."""
    return _to_py_df(_jvm_bridge(queries).ivfTopKStored(
        queries._jdf, table, id_col, emb_col, int(k), int(n_probe)),
        queries)


def negative_samples(df: DataFrame, id_col: str, k: int,
                     domain: DataFrame) -> DataFrame:
    """Deterministic negative sampling for contrastive training: ``k``
    md5-drawn partner ids per anchor over the dense [0, N) id domain of
    ``domain`` (zero shuffle, zero RNG state — same pairs at any scale
    or partitioning; an anchor never draws itself). Output: anchor_id,
    j, neg_id."""
    return _to_py_df(_jvm_bridge(df).negativeSamples(
        df._jdf, id_col, int(k), domain._jdf), df)


def write_fingerprint_reference(reference: DataFrame, text_col: str,
                                table: str, num_buckets: int = 16) -> None:
    """Persist a reference corpus's distinct normalized-text md5
    fingerprints as a bucketed store table — the EXACT half of
    incremental ingest dedup (``write_minhash_reference`` is the fuzzy
    half)."""
    _jvm_bridge(reference).writeFingerprintReference(
        reference._jdf, text_col, table, int(num_buckets))


def filter_unseen_against_store(docs: DataFrame, table: str,
                                text_col: str) -> DataFrame:
    """Rows whose normalized-text fingerprint is NOT in a
    ``write_fingerprint_reference`` store. Stateless anti join against
    the static bucketed table, so the same call screens batch frames
    AND streaming frames (no state store, no watermark)."""
    return _to_py_df(_jvm_bridge(docs).filterUnseenAgainstStore(
        docs._jdf, table, text_col), docs)


def write_image_hash_reference(reference: DataFrame, id_col: str,
                               blob_col: str, table: str,
                               use_dhash: bool = True,
                               num_buckets: int = 16,
                               max_bucket_size: int = 10000) -> None:
    """Persist a reference corpus's perceptual-hash LSH buckets as a
    bucketed store table — incremental IMAGE dedup: decode + hash the
    history once, then screen new image batches with
    ``image_hash_near_dups_stored``."""
    _jvm_bridge(reference).writeImageHashReference(
        reference._jdf, id_col, blob_col, table, bool(use_dhash),
        int(num_buckets), int(max_bucket_size))


def image_hash_near_dups_stored(docs: DataFrame, table: str, id_col: str,
                                blob_col: str, max_hamming: int = 3,
                                use_dhash: bool = True) -> DataFrame:
    """Near-duplicate (new image, stored image) pairs by banded Hamming
    distance against a ``write_image_hash_reference`` store (recall
    exact for max_hamming <= 15 via multi-index-hashing probe
    expansion — the store itself never rewrites; the stored side never
    re-decodes or re-exchanges). Output: new_id, ref_id, hamming."""
    return _to_py_df(_jvm_bridge(docs).imageHashNearDupsStored(
        docs._jdf, table, id_col, blob_col, int(max_hamming),
        bool(use_dhash)), docs)


def k_anonymity_report(df: DataFrame, quasi_cols: List[str],
                       k: int) -> DataFrame:
    """One-row k-anonymity release gate over quasi-identifier columns:
    n_rows, n_groups, min_group_size, n_violating_groups (size < k),
    n_rows_at_risk, k_anonymous. One bounded aggregate; NULL QI
    combinations count as real groups."""
    return _to_py_df(_jvm_bridge(df).kAnonymityReport(
        df._jdf, list(quasi_cols), int(k)), df)


def k_anonymity_violations(df: DataFrame, quasi_cols: List[str],
                           k: int, max_groups: int = 100) -> DataFrame:
    """The violating quasi-identifier groups themselves (size < k),
    smallest — most identifying — first, bounded to ``max_groups``
    via a top-k cut (never a global sort)."""
    return _to_py_df(_jvm_bridge(df).kAnonymityViolations(
        df._jdf, list(quasi_cols), int(k), int(max_groups)), df)


def l_diversity_report(df: DataFrame, quasi_cols: List[str],
                       sensitive_col: str, l: int) -> DataFrame:
    """One-row distinct l-diversity report: do quasi-identifier groups
    cover at least ``l`` distinct sensitive values? NULL sensitive
    values add no diversity. Output: n_groups,
    min_distinct_sensitive, n_violating_groups, n_rows_at_risk,
    l_diverse."""
    return _to_py_df(_jvm_bridge(df).lDiversityReport(
        df._jdf, list(quasi_cols), sensitive_col, int(l)), df)


def feature_relevance(df: DataFrame, feature_cols: List[str],
                      label_col: str) -> DataFrame:
    """Which columns carry signal for a label: mutual information,
    chi-squared, and Cramér's V of each candidate feature vs the label
    (one contingency aggregate per feature; bucket high-cardinality
    features first). Output per feature: feature, mi, chi2, cramers_v,
    n, card_feature, card_label."""
    return _to_py_df(_jvm_bridge(df).featureRelevance(
        df._jdf, list(feature_cols), label_col), df)


def hard_negatives(df: DataFrame, id_col: str, emb_col: str,
                   label_col: str, k: int) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``k`` most-similar vectors with a DIFFERENT label (NULL differs
    from every label) — same-label near-neighbors cannot crowd
    negatives out. Labeled-seed-set regime (frame broadcasts as its
    own query side; bound it with .limit()). Output: anchor_id,
    negative_id, cosine, rank."""
    return _to_py_df(_jvm_bridge(df).hardNegatives(
        df._jdf, id_col, emb_col, label_col, int(k)), df)


def semantic_contamination(train: DataFrame, eval_df: DataFrame,
                           id_col: str, emb_col: str,
                           threshold: float) -> DataFrame:
    """Embedding-space decontamination: every (train, eval) pair whose
    cosine reaches ``threshold`` (cut on the 6-dp-rounded value) —
    catches paraphrased eval leakage that exact n-gram screens miss.
    The eval side broadcasts; the train corpus never shuffles. Output:
    train_id, eval_id, cosine."""
    return _to_py_df(_jvm_bridge(train).semanticContamination(
        train._jdf, eval_df._jdf, id_col, emb_col, float(threshold)),
        train)


def semantic_decontaminate(train: DataFrame, eval_df: DataFrame,
                           id_col: str, emb_col: str,
                           threshold: float) -> DataFrame:
    """The train rows surviving ``semantic_contamination`` (left-anti
    on the flagged ids; payload columns pass through)."""
    return _to_py_df(_jvm_bridge(train).semanticDecontaminate(
        train._jdf, eval_df._jdf, id_col, emb_col, float(threshold)),
        train)


def embedding_outliers(df: DataFrame, id_col: str, emb_col: str,
                       top_k: int) -> DataFrame:
    """Out-of-distribution vector screen: per row, the
    diagonal-Mahalanobis energy sum_d ((x_d - mean_d) / sd_d)^2 against
    the corpus's own per-dimension moments (near-constant dimensions
    contribute 0); top ``top_k`` (rounded score desc, then id). One
    dim-length aggregate + a broadcast, row-local scoring, TakeOrdered
    cut. Output: id, score."""
    return _to_py_df(_jvm_bridge(df).embeddingOutliers(
        df._jdf, id_col, emb_col, int(top_k)), df)


def benford(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law conformance screen: one row per leading digit 1-9
    (zero-count digits included) with n, observed share, the Benford
    expectation log10(1 + 1/d), and the overall chi-squared / mean
    absolute deviation repeated per row. Values below 1, NULL, and NaN
    are excluded; the corpus collapses to 9 digit counts in one
    aggregate."""
    return _to_py_df(_jvm_bridge(df).benford(df._jdf, value_col), df)


def functional_dependencies(df: DataFrame,
                            pairs: List[Tuple[str, str]]) -> DataFrame:
    """Functional-dependency screen: one row per candidate
    (determinant, dependent) pair with n_groups, n_violating_groups
    (determinant values mapping to >1 distinct dependent — NULL counts
    as a value when present alongside non-NULLs), n_rows_at_risk, and
    ``holds``. One bounded aggregate per pair."""
    dets = [p[0] for p in pairs]
    deps = [p[1] for p in pairs]
    return _to_py_df(_jvm_bridge(df).functionalDependencies(
        df._jdf, dets, deps), df)


def t_closeness_report(df: DataFrame, quasi_cols: List[str],
                       sensitive_col: str, t: float) -> DataFrame:
    """One-row t-closeness report over a CATEGORICAL sensitive column:
    per quasi-identifier group, the total-variation distance between
    the group's sensitive distribution and the global one; violations
    where the 6-dp-rounded distance exceeds ``t``. NULL sensitive
    values form a real category. Output: n_rows, n_groups, max_tvd,
    n_violating_groups, n_rows_at_risk, t_close."""
    return _to_py_df(_jvm_bridge(df).tClosenessReport(
        df._jdf, list(quasi_cols), sensitive_col, float(t)), df)


def seasonality(df: DataFrame, ts_col: str) -> DataFrame:
    """Hour-of-week seasonality profile: every event buckets into one
    of 168 (day-of-week, hour) UTC cells by integer epoch arithmetic
    (dow 0 = Monday), one bounded aggregate. Output per non-empty
    cell: dow, hour, n, share, lift (share x 168 — the multiple of
    uniform traffic)."""
    return _to_py_df(_jvm_bridge(df).seasonality(df._jdf, ts_col), df)


def write_audio_fp_reference(reference: DataFrame, id_col: str,
                             blob_col: str, table: str,
                             window_frames: int = 256,
                             num_buckets: int = 16,
                             max_bucket_size: int = 10000) -> None:
    """Persist a reference corpus's audio sub-fingerprints as a
    bucketed store table — incremental AUDIO dedup (the stored-screen
    family's third member beside text MinHash and image hashes):
    decode + fingerprint the history once, then screen new clip
    batches with ``audio_near_dups_stored``."""
    _jvm_bridge(reference).writeAudioFpReference(
        reference._jdf, id_col, blob_col, table, int(window_frames),
        int(num_buckets), int(max_bucket_size))


def append_audio_fp_reference(docs: DataFrame, table: str, id_col: str,
                              blob_col: str,
                              window_frames: int = 256) -> None:
    """Grow a ``write_audio_fp_reference`` store with a new clip batch
    (screen first — ids are assumed fresh). The probe re-applies the
    bucket cap at read time, so cross-batch growth cannot restore the
    quadratic fan-out."""
    _jvm_bridge(docs).appendAudioFpReference(
        docs._jdf, table, id_col, blob_col, int(window_frames))


def audio_near_dups_stored(docs: DataFrame, table: str, id_col: str,
                           blob_col: str, window_frames: int = 256,
                           min_shared_blocks: int = 2,
                           max_bucket_size: int = 10000) -> DataFrame:
    """Near-duplicate (new clip, stored clip) pairs against a
    ``write_audio_fp_reference`` store — the stored side never
    re-decodes or re-exchanges; pass the same window_frames as at
    write time. Output: new_id, ref_id, n_shared."""
    return _to_py_df(_jvm_bridge(docs).audioNearDupsStored(
        docs._jdf, table, id_col, blob_col, int(window_frames),
        int(min_shared_blocks), int(max_bucket_size)), docs)


def write_bpe_merges(merges: DataFrame, table: str) -> None:
    """Persist a ``bpe_train`` merge table as a store table, so a
    vocabulary trained once serves every later encode job."""
    _jvm_bridge(merges).writeBpeMerges(merges._jdf, table)


def bpe_encode_stored(df: DataFrame, id_col: str, text_col: str,
                      table: str) -> DataFrame:
    """Piece counts per row against a ``write_bpe_merges`` store — the
    merge list is collected (k rows) and replayed row-locally; a
    zero-shuffle map pass on batch or streaming frames. Output: id,
    n_pieces."""
    return _to_py_df(_jvm_bridge(df).bpeEncodeStored(
        df._jdf, id_col, text_col, table), df)


def append_fingerprints(docs: DataFrame, table: str,
                        text_col: str) -> None:
    """Grow a ``write_fingerprint_reference`` store with a screened
    batch: only fingerprints not already present append (history never
    rewrites). The ingest loop: screen -> process -> append."""
    _jvm_bridge(docs).appendFingerprints(docs._jdf, table, text_col)


def append_minhash_reference(docs: DataFrame, table: str, id_col: str,
                             text_col: str, num_hashes: int = 64,
                             bands: int = 16, shingle_k: int = 3,
                             max_bucket_size: int = 10000) -> None:
    """Grow a ``write_minhash_reference`` store with a new batch (ids
    assumed fresh — screen first). Same parameters as at write time."""
    _jvm_bridge(docs).appendMinHashReference(
        docs._jdf, table, id_col, text_col, int(num_hashes), int(bands),
        int(shingle_k), int(max_bucket_size))


def append_image_hash_reference(docs: DataFrame, id_col: str,
                                blob_col: str, table: str,
                                use_dhash: bool = True) -> None:
    """Grow a ``write_image_hash_reference`` store with a new image
    batch (screen first)."""
    _jvm_bridge(docs).appendImageHashReference(
        docs._jdf, id_col, blob_col, table, bool(use_dhash))


def write_phash_reference(reference: DataFrame, id_col: str,
                          blob_col: str, table: str,
                          num_buckets: int = 16,
                          max_bucket_size: int = 10000) -> None:
    """Persist a reference corpus's pHash (DCT) LSH buckets as a
    bucketed store table — the recompression-robust stored image
    screen; probe with ``phash_near_dups_stored``."""
    _jvm_bridge(reference).writePHashReference(
        reference._jdf, id_col, blob_col, table, int(num_buckets),
        int(max_bucket_size))


def append_phash_reference(docs: DataFrame, id_col: str,
                           blob_col: str, table: str) -> None:
    """Grow a ``write_phash_reference`` store with a new image batch
    (screen first)."""
    _jvm_bridge(docs).appendPHashReference(
        docs._jdf, id_col, blob_col, table)


def phash_near_dups_stored(docs: DataFrame, table: str, id_col: str,
                           blob_col: str,
                           max_hamming: int = 3) -> DataFrame:
    """Near-duplicate (new image, stored image) pairs by banded pHash
    Hamming distance against a ``write_phash_reference`` store —
    radii 4..15 (the JPEG-recompression regime) probe with
    multi-index-hashing expansion against the UNCHANGED store.
    Output: new_id, ref_id, hamming."""
    return _to_py_df(_jvm_bridge(docs).pHashNearDupsStored(
        docs._jdf, table, id_col, blob_col, int(max_hamming)), docs)


def append_to_ivf_index(corpus: DataFrame, id_col: str, emb_col: str,
                        table: str) -> None:
    """Grow a ``write_ivf_index`` store: new vectors assign to the
    FROZEN stored codebook and append to the inverted lists (old
    queries untouched; re-index periodically after heavy growth)."""
    _jvm_bridge(corpus).appendToIvfIndex(
        corpus._jdf, id_col, emb_col, table)


def append_novelty_reference(reference: DataFrame, text_col: str,
                             table: str, n: int = 8) -> None:
    """Grow a ``write_novelty_reference`` gram store with newly
    ingested documents (only unseen gram hashes append)."""
    _jvm_bridge(reference).appendNoveltyReference(
        reference._jdf, text_col, int(n), table)


def compact_store(spark, table: str) -> None:
    """Compact a CorpusStore table after many appends: a staged
    rewrite folds the accumulated per-ingest file sets back together
    (a failed compaction leaves the store untouched)."""
    getattr(spark._jvm, "graft.python.PyBridge").compactStore(
        spark._jsparkSession, table)


def store_stats(spark, table: str) -> DataFrame:
    """Row / bucket / file census of a CorpusStore table — watch
    files_per_bucket to decide when to ``compact_store``."""
    jdf = getattr(spark._jvm, "graft.python.PyBridge").storeStats(
        spark._jsparkSession, table)
    return DataFrame(jdf, spark)


def store_batch_profiles(batch: DataFrame, batch_id: int,
                         store_path: str,
                         keys: Optional[List[str]] = None,
                         time_column: Optional[str] = None,
                         cadence: str = "1 hour") -> None:
    """foreachBatch body of the streaming profile store sink: profile
    one micro-batch and write its partial profiles to a ``batch=<id>``
    subdirectory of the parquet store (overwrite, so at-least-once
    replay of a batch is idempotent). ``time_column`` adds event-time
    bucketing at ``cadence`` (profiles per window x keys). Use inside
    pyspark's ``writeStream.foreachBatch``; read back with
    ``merge_stored_profiles``."""
    _jvm_bridge(batch).storeBatchProfiles(
        batch._jdf, int(batch_id), store_path, list(keys or []),
        time_column, cadence)


def merge_stored_profiles(spark, store_path: str,
                          keys: Optional[List[str]] = None) -> DataFrame:
    """Re-aggregate a streaming profile store down to one profile per
    group — the cross-batch merge (same monoid as batch profiles).
    Checkpoint-aware: reads the highest COMPLETE ``batch=compact_<id>``
    checkpoint plus strictly newer trigger directories."""
    jdf = getattr(spark._jvm, "graft.python.PyBridge").mergeStoredProfiles(
        spark._jsparkSession, store_path, list(keys or []))
    return DataFrame(jdf, spark)


def compact_profile_store(spark, store_path: str,
                          up_to_batch_id: int) -> None:
    """Fold every trigger directory (and any previous checkpoint) with
    batch id <= ``up_to_batch_id`` into one ``batch=compact_<id>``
    checkpoint — retention drops from O(triggers) to O(1) directories.
    Readers only see a checkpoint once its _SUCCESS marker lands, so a
    crash mid-compaction neither double-counts nor loses data; run
    ``vacuum_profile_store`` afterwards to GC the covered dirs."""
    getattr(spark._jvm, "graft.python.PyBridge").compactProfileStore(
        spark._jsparkSession, store_path, int(up_to_batch_id))


def vacuum_profile_store(spark, store_path: str) -> None:
    """Delete store directories made redundant by a complete
    checkpoint — pure GC, safe to run (or crash in) at any point after
    the checkpoint's _SUCCESS landed."""
    getattr(spark._jvm, "graft.python.PyBridge").vacuumProfileStore(
        store_path)


def time_to_event(df: DataFrame, key_col: str, ts_col: str,
                  type_col: str, target_type: str) -> DataFrame:
    """Per key: duration (micros) from the first event to the first
    ``target_type`` event, right-censored at the last observed event
    when the target never comes. One conditional-min/max aggregate.
    Output: key, duration, observed (1 = target reached)."""
    return _to_py_df(_jvm_bridge(df).timeToEvent(
        df._jdf, key_col, ts_col, type_col, target_type), df)


def kaplan_meier(df: DataFrame, duration_col: str,
                 observed_col: str) -> DataFrame:
    """Kaplan-Meier survival curve with right censoring — the
    time-to-conversion / churn estimator. Closed-form product via
    exp(cumsum(ln)); one aggregate to distinct times + one sort.
    Bucket durations first when cardinality is large. Output: t,
    n_risk, n_events, n_censored, survival, hazard, cum_hazard
    (Nelson-Aalen), survival_lo / survival_hi (95% Greenwood band)."""
    return _to_py_df(_jvm_bridge(df).kaplanMeier(
        df._jdf, duration_col, observed_col), df)


def log_rank(df: DataFrame, duration_col: str, observed_col: str,
             group_col: str) -> DataFrame:
    """Two-sample log-rank test: do two cohorts share a survival
    curve? chi2 gates at 3.84 for alpha=0.05 (df 1); with more than
    two groups, lexicographic-min tests against the rest pooled.
    Output: group_a, group_b, n_a, n_b, observed_a, expected_a,
    chi2."""
    return _to_py_df(_jvm_bridge(df).logRank(
        df._jdf, duration_col, observed_col, group_col), df)


def rfm(df: DataFrame, key_col: str, ts_col: str, value_col: str,
        n_tiles: int = 5) -> DataFrame:
    """RFM segmentation per key: recency (seconds to the corpus-max
    event time), frequency, monetary, each ntile-scored 1..n_tiles
    with the best metric earning the top score (key tie-breaks keep
    replays and engines identical). Output: key, recency_s, frequency,
    monetary, r_score, f_score, m_score, rfm."""
    return _to_py_df(_jvm_bridge(df).rfm(
        df._jdf, key_col, ts_col, value_col, int(n_tiles)), df)


def ltv_curve(df: DataFrame, user_col: str, ts_col: str,
              value_col: str) -> DataFrame:
    """Cohort LTV curve: cumulative revenue per acquired user by
    cohort age (users cohort by first-active day; cohort size reads
    back from the offset-0 cell, so events aggregate once). Output:
    cohort_day, day_offset, n_active, revenue, cohort_users,
    cum_revenue, ltv."""
    return _to_py_df(_jvm_bridge(df).ltvCurve(
        df._jdf, user_col, ts_col, value_col), df)


def kaplan_meier_grouped(df: DataFrame, duration_col: str,
                         observed_col: str, group_col: str) -> DataFrame:
    """One Kaplan-Meier curve per group in a single pass — the windows
    partition on the group, so no global sort exists (the scale-correct
    form for many simultaneous cohorts). Output: group + the
    ``kaplan_meier`` columns."""
    return _to_py_df(_jvm_bridge(df).kaplanMeierGrouped(
        df._jdf, duration_col, observed_col, group_col), df)


def funnel_report(df: DataFrame, group_col: str,
                  stages: List) -> DataFrame:
    """Per-group curation-funnel attrition for an ORDERED filter chain,
    counted in one corpus scan. ``stages`` is a list of (name,
    sql_condition) pairs; each stage only sees survivors of the
    previous ones, and NULL conditions count as failures. Output:
    group, stage, stage_name, n_in, n_out, keep_rate."""
    names = [n for n, _ in stages]
    conds = [c for _, c in stages]
    return _to_py_df(_jvm_bridge(df).funnelReport(
        df._jdf, group_col, names, conds), df)
