package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, language ID, quality scoring, fingerprinting.
  *
  * Everything is composed from `org.apache.spark.sql.functions` (codegen'd,
  * no UDFs) so the operators run inside whole-stage codegen and scale
  * linearly with input — no shuffle unless the caller aggregates.
  */
object TextOps {

  /** Tokens under Java split-on-space semantics (interior empties kept,
    * trailing empties dropped — matches
    * graft.metrics.StringState.spaceTokenCount).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count (consecutive spaces produce empty tokens that
    * are NOT counted here — this is the "BPE-ish" user-facing token count,
    * distinct from the profile's Java-split semantics).
    */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** Canonical text cleanup for ingest: Unicode NFC composition (via the
    * codegen'd [[graft.functions.nfc_normalize]]), ASCII control
    * characters (C0 + DEL) replaced by spaces, whitespace runs collapsed
    * to one space, ends trimmed — in that order, so a control char
    * sandwiched between spaces leaves exactly one space. Dedup keys,
    * shingles and fingerprints computed downstream then agree across
    * canonically-equal inputs and byte-noise variants. Row-local, zero
    * shuffle; every step is SQL-expressible for oracle checks
    * (nfc_normalize / regexp_replace with 'g' / trim).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.nfc_normalize(text),
        "[\\x00-\\x1f\\x7f]", " "),
      "\\s+", " "))

  /** Collapse CONSECUTIVE repeated lines to one occurrence (run-length
    * dedup): the cleanup for degenerate generations and copy-paste
    * stutter, where a model or a scraper emits the same line N times in
    * a row. Non-adjacent repeats are untouched (that's
    * [[graft.ops.Dedup.removeFrequentLines]]'s corpus-level job).
    * Row-local codegen HOFs (zip against the 1-shifted line array),
    * zero shuffle, SQL-expressible for oracle checks.
    */
  def collapseRepeatedLines(text: Column): Column = {
    val l = split(text, "\n")
    val prev = concat(array(lit(null).cast("string")),
      slice(l, lit(1), greatest(size(l) - 1, lit(0))))
    array_join(filter(zip_with(l, prev,
      (x, p) => when(p.isNull || x =!= p, x)), x => x.isNotNull), "\n")
  }

  /** BPE-style pre-tokenization count: alphabetic runs, digit runs, and
    * individual non-alphanumeric symbols each count as one token — the
    * piece boundaries a byte-pair tokenizer starts from (whitespace-only
    * counting undercounts punctuation-heavy text badly).
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Language marker sets. Occurrence counts of these tokens decide the
    * language; fixed and deliberately small so the same rule is exactly
    * expressible in ANSI SQL for oracle checks.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "zu"),
    "es" -> Seq("el", "los", "que", "es", "una", "por", "con", "para"),
    "fr" -> Seq("le", "les", "et", "des", "est", "dans", "une", "pour"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  /** Marker-occurrence count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(set, t)))
  }

  /** n-gram-heuristic language ID: argmax of marker occurrences, ties
    * resolved by [[LangMarkers]] order; "und" (undetermined) when no
    * marker hits.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => (lang, langScore(text, ms)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight gives later entries lower priority; first match wins
    pick
  }

  private val PunctChars = ".,!?;:"

  /** Punctuation character count (fixed class, SQL-portable). */
  def punctCount(text: Column): Column =
    length(text) - length(translate(text, PunctChars, ""))

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Heuristic document quality score in [0,1]:
    * 0.25*len_ok + 0.25*token_len_ok + 0.25*(1-punct_ratio) +
    * 0.25*stopword_presence. Deterministic arithmetic — SQL-expressible.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val lenOk = when(nChars >= 100 && nChars <= 10000, 1.0).otherwise(
      when(nChars >= 20, 0.5).otherwise(0.0))
    val avgTokLen = when(toks > 0, nChars / toks).otherwise(0.0)
    val tokOk = when(avgTokLen >= 3 && avgTokLen <= 12, 1.0).otherwise(0.0)
    val punctRatio = when(nChars > 0, punctCount(text).cast("double") / nChars)
      .otherwise(1.0)
    val stopSet = array(StopWords.map(lit): _*)
    val stopHits =
      size(filter(tokens(lower(text)), t => array_contains(stopSet, t))).cast("double")
    val stopOk = when(toks > 0 && stopHits / toks >= 0.05, 1.0).otherwise(0.0)
    round(lit(0.25) * lenOk + lit(0.25) * tokOk +
      lit(0.25) * (lit(1.0) - punctRatio) + lit(0.25) * stopOk, 4)
  }

  /** Gopher stopword set (Rae et al. 2021, Appendix A: a document must
    * contain at least two of these to pass the quality battery).
    */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The published Gopher document-quality battery (Rae et al. 2021,
    * Appendix A), one row per document with every rule's measured value
    * and the combined verdict — the standard pretraining-corpus filter
    * the repetition screens ([[dupNgramRatio]]/[[dupLineRatio]]/
    * [[topNgramStats]]) complement:
    *
    *  - word count in [minWords, maxWords] (50..100k)
    *  - mean word length in [3, 10]
    *  - hash-to-word ratio (#) <= 0.1 and ellipsis-to-word ratio
    *    (...) <= 0.1 — two SEPARATE gates, as published (Rae et al.
    *    apply the 0.1 symbol threshold to each symbol independently)
    *  - lines starting with a bullet <= 90%
    *  - lines ending with an ellipsis <= 30%
    *  - words containing an alphabetic character >= 80%
    *  - at least 2 distinct [[GopherStopWords]] present
    *
    * Entirely row-local codegen arithmetic (one pass, zero shuffle at
    * any corpus size) and SQL-portable (fixed-precision rounding) for
    * oracle checks. Output: idCol, n_words, mean_word_len, hash_ratio,
    * ellipsis_ratio (both per word), bullet_frac, ellipsis_frac (both
    * per line), alpha_frac, stop_hits, passed (int).
    */
  def gopherReport(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val nWordsD = nWords.cast("double")
    // single-space token semantics make total word chars = len - (n-1)
    val meanLen = when(nWords > 0,
      (length(text) - (nWords - 1)).cast("double") / nWordsD)
      .otherwise(lit(0.0))
    val hashes = (length(text) - length(translate(text, "#", "")))
      .cast("double")
    val ellipses = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("double")
    val hashRatio = when(nWords > 0, hashes / nWordsD).otherwise(lit(0.0))
    val ellipsisRatio = when(nWords > 0, ellipses / nWordsD)
      .otherwise(lit(0.0))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => l.endsWith("..."))).cast("double") / nLines
    val alphaFrac = when(nWords > 0,
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / nWordsD)
      .otherwise(lit(0.0))
    val stopSet = array(GopherStopWords.map(lit): _*)
    val lowered = tokens(lower(text))
    val stopHits = size(filter(stopSet,
      s => array_contains(lowered, s))).cast("long")
    df.select(col(idCol), nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(hashRatio, 6).as("hash_ratio"),
      round(ellipsisRatio, 6).as("ellipsis_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"))
      .withColumn("passed",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("hash_ratio") <= 0.1 && col("ellipsis_ratio") <= 0.1 &&
          col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3 &&
          col("alpha_frac") >= 0.8 &&
          col("stop_hits") >= 2L).cast("int"))
  }

  /** Model-based quality scoring plumbing: a fastText-style LINEAR
    * classifier over hashing-trick token features, scored in one
    * row-local pass (zero shuffle at any corpus size). Each token hashes
    * into one of `nBuckets` weight slots (rolling 31-hash — the q95
    * engine-reproducible recipe); the document's logit is the mean slot
    * weight and `score` = sigmoid(logit).
    *
    * `weights`: broadcast a trained table (length nBuckets) for real
    * classification — the plumbing (hashing, pooling, scoring) is
    * exactly what a trained model needs. Without it, slots carry a
    * deterministic formula weight (reproducible in SQL, so the
    * untrained form is oracle-checkable end to end — q104).
    *
    * Output: idCol, logit, score.
    */
  def linearQualityScore(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 4096,
      weights: Option[org.apache.spark.broadcast.Broadcast[Array[Double]]] =
        None): org.apache.spark.sql.DataFrame = {
    val mw = graft.functions.hashed_token_score(col(textCol), nBuckets,
      weights)
    df.select(col(idCol), mw.as("logit"))
      .select(col(idCol), col("logit"),
        (lit(1.0) / (lit(1.0) + exp(-col("logit")))).as("score"))
  }

  /** Tag-level markup strip for web-scraped text — the step BEFORE
    * [[c4Clean]] in a crawl pipeline: removes `<...>` tags (replaced
    * by a space so `a<br>b` stays two words), decodes the six
    * ubiquitous HTML entities (`&amp;` LAST, so `&amp;lt;` decodes to
    * the literal `&lt;` and never double-decodes), collapses runs of
    * spaces/tabs, and trims — newlines survive for the line-based
    * cleaners downstream. Deliberately NOT an HTML parser (no
    * script/style content awareness): it is the deterministic,
    * SQL-portable 95% answer; route genuinely structured HTML through
    * a real parser upstream. Row-local, zero shuffle, codegen regex.
    */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(unescaped, "[ \t]+", " "))
  }

  /** Count of `<...>` tags [[stripMarkup]] would remove — the
    * markup-density signal (a page that is mostly tags is boilerplate
    * or template residue).
    */
  def markupTagCount(text: Column): Column =
    size(regexp_extract_all(text, lit("<[^>]*>"), lit(0)))

  /** Canonical URL for crawl-level dedup: lowercased scheme and host,
    * query string and fragment stripped (tracking parameters are the
    * #1 cause of duplicate fetches), trailing path slashes trimmed;
    * the PATH keeps its case (case-sensitive by standard). Returns
    * NULL for strings that do not parse as http(s) URLs — callers
    * decide whether unparseable means drop or keep-verbatim.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = regexp_extract(url, "^(?i)(https?)://", 1)
    val host = regexp_extract(url, "^(?i)https?://([^/?#]+)", 1)
    val path = regexp_extract(url, "^(?i)https?://[^/?#]+([^?#]*)", 1)
    when(scheme =!= "" && host =!= "",
      concat(lower(scheme), lit("://"), lower(host),
        rtrim(path, "/")))
  }

  /** URL-level exact dedup over canonical forms — "have we fetched
    * this page already" for a crawl frontier: one row per canonical
    * URL with the smallest id as survivor and the duplicate count.
    * Unparseable URLs (NULL canonical) are excluded. One
    * map-side-combined aggregate; the raw URLs never shuffle beyond
    * their canonical group keys.
    */
  def urlDedup(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      urlCol: String): org.apache.spark.sql.DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"),
        col(idCol).as("__id"))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col("__id")).as("survivor_id"),
        count(lit(1)).as("n_dupes"))

  /** C4-style cleaning (Raffel et al. 2020, §2.2) — the line/page
    * heuristics that built the canonical public pretraining corpus:
    *
    *  - keep only lines ending in a terminal punctuation mark
    *  - keep only lines with at least `minLineWords` words
    *  - drop lines mentioning javascript
    *  - drop the whole page when fewer than `minLines` lines survive,
    *    or the RAW page text contains "lorem ipsum" or a curly brace
    *    anywhere (the published recipe drops pages on these markers
    *    wherever they appear — including on lines the line rules
    *    already removed)
    *
    * One row-local pass (codegen HOFs over the line array, zero
    * shuffle); rows come back 1:1 with `kept` = the page verdict so the
    * report is total — callers filter `kept = 1` for the cleaned
    * corpus. SQL-portable for oracle checks. Output: idCol, text
    * (surviving lines), n_lines_in, n_lines_kept, kept (int).
    */
  def c4Clean(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minLineWords: Int = 5,
      minLines: Int = 3): org.apache.spark.sql.DataFrame = {
    require(minLineWords >= 1 && minLines >= 1,
      s"need minLineWords/minLines >= 1, got $minLineWords/$minLines")
    val lines = split(col(textCol), "\n")
    val keptLines = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(filter(split(t, " "), w => length(w) > 0)) >= minLineWords &&
        !lower(t).contains("javascript")
    })
    val cleaned = array_join(keptLines, "\n")
    val pageOk = size(keptLines) >= minLines &&
      !lower(col(textCol)).contains("lorem ipsum") &&
      !col(textCol).contains("{")
    df.select(col(idCol), cleaned.as(textCol),
      size(lines).as("n_lines_in"),
      size(keptLines).as("n_lines_kept"),
      pageOk.cast("int").as("kept"))
  }

  /** Fixed-size context-window chunking with overlap — the
    * complementary half of [[Packing]]: where packing concatenates
    * SHORT documents up to a budget, chunking splits LONG documents
    * into `windowTokens`-token windows starting every `strideTokens`
    * (stride < window = sliding overlap, the standard LM data recipe).
    * The final window of a document may be partial; a window is emitted
    * only where new tokens start (start <= n_tokens). Tokens are the
    * NON-EMPTY whitespace pieces, so empty and all-whitespace docs emit
    * nothing (a bare `split` would turn "" into one empty token and
    * hand downstream packing/training a junk empty chunk).
    *
    * Row-local: one posexplode of an in-row transform — zero shuffle,
    * output rows ~ n_tokens / stride per document. Output: idCol,
    * chunk_idx (0-based), chunk (text), n_tokens.
    */
  def contextChunks(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      strideTokens: Int): org.apache.spark.sql.DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    require(strideTokens >= 1, s"strideTokens must be >= 1, got $strideTokens")
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val starts = when(size(toks) > 0,
      sequence(lit(1), size(toks), lit(strideTokens)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts,
      i => slice(toks, i, lit(windowTokens)))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("c"), " ").as("chunk"),
        size(col("c")).as("n_tokens"))
  }

  /** N-gram NOVELTY: per document, the fraction of its distinct token
    * n-grams NOT present anywhere in a reference corpus — the inverse
    * of [[graft.ops.Dedup.ngramContamination]]'s question, scoring how
    * much genuinely new text a candidate document adds (memorization
    * screens, crawl-refresh dedup, curriculum novelty weighting).
    *
    * Scale shape: grams de-duplicate INSIDE each row first ([[ngrams]]),
    * both sides reduce grams to 64-bit xxhash64 keys BEFORE any
    * exchange (membership only needs identity — the shuffle carries 8
    * bytes per gram, not gram text; a cross-gram hash collision
    * mis-counts one gram as seen, ~0.03 expected collisions even at
    * 10^12 distinct grams), the reference set reduces to distinct
    * keys, and the membership join is left to AQE (no broadcast hint —
    * the reference gram set is corpus-sized in general, the
    * [[AdaptiveVocabJoin]] reasoning). Documents shorter than n tokens
    * produce no row. Output: idCol, n_grams, n_novel, novelty.
    */
  def ngramNovelty(
      docs: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val refGrams = reference
      .select(explode(ngrams(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .withColumn("__seen", lit(1))
    docs.select(col(idCol), explode(ngrams(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(refGrams, Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  /** Persist the reference side of [[ngramNovelty]] as a bucketed
    * gram-hash table ([[graft.io.CorpusStore]]): grams reduce to
    * distinct 64-bit xxhash64 keys at WRITE time, bucketed + in-bucket
    * sorted on the hash. Repeated novelty scans against the same
    * reference corpus then pay its gram extraction + distinct + shuffle
    * exactly once ever — at 100 TB the reference gram set is
    * corpus-sized, and re-deriving it per batch of new documents is the
    * dominant cost this kills.
    */
  def writeNoveltyReference(
      reference: org.apache.spark.sql.DataFrame,
      textCol: String,
      n: Int,
      table: String,
      numBuckets: Int): Unit = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    graft.io.CorpusStore.writeBucketed(
      reference.select(explode(ngrams(col(textCol), n)).as("g"))
        .select(xxhash64(col("g")).as("gh")).distinct(),
      table, "gh", numBuckets, Seq("gh"))
  }

  /** GROW a novelty gram store with newly ingested documents: gram
    * hashes not already present append (anti-join dedup keeps the
    * store distinct) — the canonical loop is score
    * ([[ngramNoveltyStored]]) → keep the novel docs → append their
    * grams, so the reference tracks the corpus without ever rewriting
    * history.
    */
  def appendNoveltyReference(
      reference: org.apache.spark.sql.DataFrame,
      textCol: String,
      n: Int,
      table: String): Unit = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val spark = reference.sparkSession
    val nb = graft.io.CorpusStore.storedNumBuckets(spark, table)
    val fresh = reference
      .select(explode(ngrams(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .join(graft.io.CorpusStore.readBucketed(spark, table)
        .select(col("gh")), Seq("gh"), "left_anti")
    graft.io.CorpusStore.appendBucketed(fresh, table, "gh", nb, Seq("gh"))
  }

  /** [[ngramNovelty]] against a [[writeNoveltyReference]] table: the
    * stored gram-hash side scans bucketed (its hash partitioning
    * reaches the planner), so the membership join shuffles ONLY the
    * incoming documents' grams — the corpus-sized reference never
    * re-exchanges (plan-pinned in StoredNoveltySpec). Semantics are
    * identical to the two-frame form.
    */
  def ngramNoveltyStored(
      docs: org.apache.spark.sql.DataFrame,
      table: String,
      idCol: String,
      textCol: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val refGrams = graft.io.CorpusStore
      .readBucketed(docs.sparkSession, table)
      .withColumn("__seen", lit(1))
    docs.select(col(idCol), explode(ngrams(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .join(refGrams, Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  /** TRAIN a fastText-style linear quality classifier in-engine:
    * logistic regression over the hashing-trick mean-pooled features
    * [[linearQualityScore]] scores with — full-batch gradient descent,
    * one bounded aggregate per epoch. Each epoch: score every doc with
    * the current weights (row-local broadcast expression), spread the
    * residual sigmoid(score) - y over the doc's tokens, and reduce per
    * bucket (<= nBuckets rows cross the exchange regardless of corpus
    * size); the driver applies w -= lr/N * grad and re-broadcasts.
    *
    * Returns the trained weight table — apply it with
    * [[linearQualityScore]]'s `weights` parameter (or
    * [[graft.functions.hashed_token_score]] directly) for a row-local,
    * shuffle-free scoring pass on any frame, batch or streaming. The
    * single-epoch path is closed-form from zero init (sigmoid(0) = 1/2)
    * and therefore SQL-oracle-able end to end.
    */
  def trainHashedLogReg(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      labelCol: String,
      nBuckets: Int = 4096,
      epochs: Int = 3,
      lr: Double = 1.0): Array[Double] = {
    require(nBuckets >= 1 && nBuckets <= (1 << 22),
      s"nBuckets must be in [1, 2^22], got $nBuckets")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = df.sparkSession
    val n = df.count().toDouble
    require(n > 0, "trainHashedLogReg needs a non-empty training frame")
    var weights = new Array[Double](nBuckets)
    (0 until epochs).foreach { _ =>
      val bc = spark.sparkContext.broadcast(weights)
      val grad = df.select(col(labelCol).cast("double").as("y"),
        graft.functions.hashed_token_score(col(textCol), nBuckets,
          Some(bc)).as("score"),
        filter(tokens(lower(col(textCol))), t => length(t) > 0).as("ts"))
        .filter(size(col("ts")) > 0)
        .select(
          (lit(1.0) / (lit(1.0) + exp(-col("score"))) - col("y")).as("r"),
          size(col("ts")).cast("double").as("nt"),
          explode(col("ts")).as("t"))
        .select(pmod(rollingHash(col("t")), lit(nBuckets.toLong))
          .cast("int").as("b"), (col("r") / col("nt")).as("g"))
        .groupBy(col("b")).agg(sum(col("g")).as("g"))
        .collect()
      val next = weights.clone()
      grad.foreach(r => next(r.getInt(0)) -= lr / n * r.getDouble(1))
      weights = next
      bc.unpersist()
    }
    weights
  }

  /** TRAINED multiclass language ID, one-vs-rest over the
    * [[trainHashedLogReg]] machinery: one hashed-LR weight table per
    * language, ALL classes trained in a single bounded aggregate per
    * epoch (K gradient columns ride the same <= nBuckets-row exchange —
    * not K separate jobs), so the pass count is epochs, not
    * epochs x languages. From zero init the single-epoch update is
    * closed-form (sigmoid(0) = 1/2), which keeps the whole
    * train-then-predict loop SQL-oracle-able exactly like q125.
    *
    * Returns the per-language weight tables in `langs` order; apply
    * them with [[langIdTrained]] (row-local, shuffle-free, usable on
    * streaming frames — the batch-train/stream-score shape).
    */
  def trainLangIdOneVsRest(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      langCol: String,
      langs: Seq[String],
      nBuckets: Int = 4096,
      epochs: Int = 1,
      lr: Double = 1.0): Seq[(String, Array[Double])] = {
    require(langs.nonEmpty, "trainLangIdOneVsRest needs >= 1 language")
    require(langs.distinct.size == langs.size, "duplicate language labels")
    require(nBuckets >= 1 && nBuckets <= (1 << 22),
      s"nBuckets must be in [1, 2^22], got $nBuckets")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = df.sparkSession
    val n = df.count().toDouble
    require(n > 0, "trainLangIdOneVsRest needs a non-empty training frame")
    var weights: Array[Array[Double]] =
      Array.fill(langs.size)(new Array[Double](nBuckets))
    (0 until epochs).foreach { _ =>
      val bcs = weights.map(w => spark.sparkContext.broadcast(w))
      val scored = df.select(
        Seq(col(langCol).as("__lang"),
          filter(tokens(lower(col(textCol))), t => length(t) > 0).as("__ts")) ++
          langs.indices.map(i => graft.functions.hashed_token_score(
            col(textCol), nBuckets, Some(bcs(i))).as(s"__s$i")): _*)
        .filter(size(col("__ts")) > 0)
      val resid = scored.select(
        Seq(size(col("__ts")).cast("double").as("__nt"),
          explode(col("__ts")).as("__t")) ++
          langs.indices.map(i =>
            (lit(1.0) / (lit(1.0) + exp(-col(s"__s$i"))) -
              (col("__lang") === langs(i)).cast("double")).as(s"__r$i")): _*)
      val gradCols = langs.indices
        .map(i => sum(col(s"__r$i") / col("__nt")).as(s"__g$i"))
      val grad = resid
        .select(pmod(rollingHash(col("__t")), lit(nBuckets.toLong))
          .cast("int").as("__b") +:
          langs.indices.map(i => col(s"__r$i") / col("__nt")): _*)
        .toDF("__b" +: langs.indices.map(i => s"__r$i"): _*)
        .groupBy(col("__b"))
        .agg(sum(col("__r0")).as("__g0"),
          langs.indices.tail.map(i => sum(col(s"__r$i")).as(s"__g$i")): _*)
        .collect()
      val next = weights.map(_.clone())
      grad.foreach { r =>
        val b = r.getInt(0)
        langs.indices.foreach(i => next(i)(b) -= lr / n * r.getDouble(i + 1))
      }
      weights = next
      bcs.foreach(_.unpersist())
    }
    langs.zip(weights)
  }

  /** Score every document against [[trainLangIdOneVsRest]] models and
    * predict the argmax language — one row-local pass (K broadcast
    * scoring expressions, zero shuffle at any corpus size).
    *
    * The argmax is taken over logits ROUNDED to `roundTo` decimals with
    * ties (and token-less or null text) resolved deterministically —
    * rounded comparison so a cross-engine float-sum ulp difference
    * cannot flip the winner (ties break to the lexicographically
    * smallest language; token-less text predicts "und"). Output: idCol,
    * pred_lang, best_logit (rounded), plus one raw logit_<lang> column
    * per model.
    */
  def langIdTrained(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      models: Seq[(String, Array[Double])],
      nBuckets: Int = 4096,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(models.nonEmpty, "langIdTrained needs >= 1 model")
    val spark = df.sparkSession
    val bcs = models.map { case (l, w) =>
      l -> spark.sparkContext.broadcast(w)
    }
    val base = df.select(
      Seq(col(idCol),
        size(filter(tokens(lower(col(textCol))), t => length(t) > 0))
          .as("__ntok")) ++
        bcs.map { case (l, bc) => graft.functions.hashed_token_score(
          col(textCol), nBuckets, Some(bc)).as(s"logit_$l") }: _*)
    val rounded = models.map { case (l, _) =>
      l -> round(col(s"logit_$l"), roundTo)
    }
    val best = rounded.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = rounded.sortBy(_._1).foldRight(lit("und")) {
      case ((l, r), acc) => when(r === best, lit(l)).otherwise(acc)
    }
    base.select(
      Seq(col(idCol),
        when(col("__ntok") === 0 || col("__ntok").isNull, lit("und"))
          .otherwise(pick).as("pred_lang"),
        (best + lit(0.0)).as("best_logit")) ++
        models.map { case (l, _) => col(s"logit_$l") }: _*)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-unigram distribution is —
    * logratio = mean over token occurrences of
    * log p_target(bucket) - log p_raw(bucket), with add-one smoothed
    * bucket probabilities over `nBuckets` hashing-trick slots (the
    * [[linearQualityScore]] hash recipe, so the scoring pass is the
    * same codegen expression). Resample the corpus proportional to
    * exp(logratio) — or top-k by logratio — to tilt it toward the
    * target domain.
    *
    * Scale shape: TWO bounded aggregates (bucket histograms — at most
    * `nBuckets` rows cross each exchange regardless of corpus size),
    * the log-ratio table rides one broadcast, and scoring is a single
    * row-local pass over the raw corpus. Documents with no tokens score
    * 0.0. Output: idCol, logratio.
    */
  def dsirWeights(
      raw: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 4096): org.apache.spark.sql.DataFrame =
    raw.select(col(idCol),
      dsirScorer(raw, target, textCol, nBuckets).as("logratio"))

  /** The trained half of [[dsirWeights]] as a reusable scoring COLUMN:
    * fits the smoothed log-ratio table from the two corpora (two
    * bounded histogram jobs, run eagerly at plan-build), broadcasts it,
    * and returns the row-local scoring expression — apply it to ANY
    * frame with the same text column, including a Structured Streaming
    * frame (batch-train, stream-score: the standard deployment shape
    * for importance filters).
    */
  def dsirScorer(
      raw: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame,
      textCol: String,
      nBuckets: Int = 4096): Column = {
    require(nBuckets >= 1 && nBuckets <= (1 << 22),
      s"nBuckets must be in [1, 2^22], got $nBuckets")
    def bucketCounts(df: org.apache.spark.sql.DataFrame): (Array[Long], Long) = {
      val rows = df
        .select(explode(filter(tokens(lower(col(textCol))),
          t => length(t) > 0)).as("t"))
        .select(pmod(rollingHash(col("t")), lit(nBuckets.toLong))
          .cast("int").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .collect()
      val arr = new Array[Long](nBuckets)
      var total = 0L
      rows.foreach { r =>
        val n = r.getLong(1); arr(r.getInt(0)) = n; total += n
      }
      (arr, total)
    }
    val (tc, tt) = bucketCounts(target)
    val (rc, rt) = bucketCounts(raw)
    val weights = Array.tabulate(nBuckets) { b =>
      math.log((tc(b) + 1.0) / (tt + nBuckets.toDouble)) -
        math.log((rc(b) + 1.0) / (rt + nBuckets.toDouble))
    }
    val bc = raw.sparkSession.sparkContext.broadcast(weights)
    graft.functions.hashed_token_score(col(textCol), nBuckets, Some(bc))
  }

  /** ALL token n-gram windows of `text` as space-joined strings, repeats
    * kept; empty array for docs shorter than n tokens. Row-local
    * (codegen HOFs over the token array), zero shuffle.
    */
  def allNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** DISTINCT token n-grams of `text` — [[allNgrams]] deduped inside the
    * row, so no per-doc aggregation is ever needed downstream.
    */
  def ngrams(text: Column, n: Int): Column =
    array_distinct(allNgrams(text, n))

  /** Fraction of REPEATED token n-grams within one document (the
    * Gopher-style repetition quality filter: boilerplate, keyword
    * stuffing and degenerate generations score high): 1 - distinct/total
    * n-gram windows, 0.0 below n tokens. Row-local, zero shuffle.
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val total = size(tokens(text)) - (n - 1)
    when(total <= lit(0), lit(0.0))
      .otherwise(lit(1.0) -
        size(ngrams(text, n)).cast("double") / total.cast("double"))
  }

  /** Per-document most frequent n-gram (the Gopher top-n-gram quality
    * filter: a high top_frac flags templated or degenerate text that the
    * distinct-ratio screen can miss). Output: idCol, top_gram, top_count,
    * n_windows, top_frac. Ties break to the lexicographically GREATEST
    * gram (max over (count, gram) structs) so results are deterministic
    * and SQL-oracle-able. Docs shorter than n tokens produce no row.
    *
    * Scale: explode + two-level hash aggregate — map-side combine on
    * (doc, gram), then a struct-max per doc. The tf-idf shuffle shape;
    * no window, no sort, shuffle volume = distinct (doc, gram) pairs.
    */
  def topNgramStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(allNgrams(col(textCol), n)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(max(struct(col("cnt"), col("gram"))).as("top"),
        sum(col("cnt")).as("n_windows"))
      .select(col(idCol), col("top.gram").as("top_gram"),
        col("top.cnt").as("top_count"), col("n_windows"),
        (col("top.cnt").cast("double") / col("n_windows")).as("top_frac"))

  /** Fraction of repeated lines within one document (the duplicate-line
    * quality filter — headers, nav bars, chat transcripts). Row-local.
    */
  def dupLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    lit(1.0) -
      size(array_distinct(lines)).cast("double") / size(lines).cast("double")
  }

  /** Whitespace-normalized MD5 fingerprint: stable document identity for
    * exact/near-exact dedup across formatting differences.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Polynomial rolling hash (base 31, mod 1e9+7 — intermediate products
    * stay well inside Long range) over the normalized text — cheap
    * shard-stable fingerprint. One-pass expression
    * ([[graft.functions.RollingHash64]]); the HOF composition it replaced
    * materialized a per-char array and dispatched a lambda per character.
    */
  def rollingHash(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.RollingHash64(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** PII-ish pattern counts for training-data redaction triage. Patterns
    * deliberately use only constructs with identical semantics in Java
    * regex and RE2 (no backrefs, no lookaround) so the same rule is
    * exactly oracle-able in other engines. Map-only (codegen
    * regexp_count) — scales linearly, no shuffle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // explicit whitespace class, NOT \s: Java's \s includes \x0B while
  // RE2's does not — an explicit class is byte-identical in both engines
  val UrlPattern = "https?://[^ \\t\\n\\x0B\\f\\r]+"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def urlCount(text: Column): Column = regexp_count(text, lit(UrlPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** PII REDACTION — the action to the counting triage above: every
    * email / URL / phone match replaced by a fixed placeholder token, in
    * that order (emails before URLs so a mailto-like tail can't leave a
    * partial address; URL second so its greedy run eats query strings;
    * phone last). Same engine-portable patterns as the counters, so the
    * redacted text is exactly oracle-able. Row-local codegen
    * regexp_replace chain — zero shuffle at any corpus size.
    */
  def redactPii(
      text: Column,
      emailToken: String = "[EMAIL]",
      urlToken: String = "[URL]",
      phoneToken: String = "[PHONE]"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, emailToken),
        UrlPattern, urlToken),
      PhonePattern, phoneToken)

  /** Vocabulary join strategy knob for [[tfIdfTopTerms]] /
    * [[unigramPerplexity]]. Lowercase-whitespace tokens over a web corpus
    * are effectively unbounded (URLs, typos), so an unconditionally
    * broadcast vocabulary is a driver/executor OOM at 100 TB. Values:
    *
    *  - [[AdaptiveVocabJoin]] (default): NO join hint — AQE measures the
    *    vocabulary exchange at runtime and broadcast-converts the join
    *    only when the actual size is under
    *    `spark.sql.autoBroadcastJoinThreshold`. Memory-safe at any
    *    vocabulary size, zero extra jobs (the size gate is the runtime
    *    statistic Spark already collects). Trade: the corpus side's
    *    term-keyed exchange is still WRITTEN before AQE converts (reads
    *    become local) — bounded disk I/O, vs. the forced-broadcast
    *    plan's unbounded executor memory.
    *  - finite > 0: explicit gate — the term-count intermediate persists,
    *    one cheap count job compares the vocabulary against the cap, and
    *    the join is broadcast iff it fits. Deterministic strategy for
    *    pipelines that must not depend on AQE conf.
    *  - `Long.MaxValue`: force the broadcast hint (the pre-gate plan).
    */
  val AdaptiveVocabJoin: Long = -1L

  /** Per-document unigram language-model perplexity — the classic
    * LM-based quality filter: score each document by how surprising its
    * tokens are under the corpus's own unigram distribution
    * (perplexity = exp(mean(-ln p(token))), p = corpus_count/total).
    *
    * Scale shape: one token-count shuffle whose RESULT is
    * vocabulary-sized. The vocabulary is bounded two ways:
    *  - `minCount` floors the vocabulary (terms seen < minCount times are
    *    dropped from the table and scored with the default NLL
    *    -ln(max(minCount-1,1)/total) — rare-term surprisal saturates at
    *    the floor instead of keeping billions of hapaxes resident);
    *  - `maxBroadcastVocab` picks the join strategy (see
    *    [[AdaptiveVocabJoin]]): by default AQE broadcast-converts the
    *    scoring join only when the measured vocabulary is actually small;
    *    otherwise it shuffles on `term` — bounded memory at any
    *    vocabulary size, no extra jobs.
    * The corpus total rides every token row via a 1-row broadcast cross
    * join, so OOV rows still see the denominator under the left join.
    * The per-document mean aggregates with map-side combine on the
    * document key; the corpus never takes a corpus-sized wide shuffle.
    *
    * Defaults (minCount=1) keep every term: the left join never misses
    * and results are identical to the unfloored formulation.
    */
  def unigramPerplexity(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 1L,
      maxBroadcastVocab: Long = AdaptiveVocabJoin)
      : org.apache.spark.sql.DataFrame =
    unigramPerplexityReleasable(df, idCol, textCol, minCount,
      maxBroadcastVocab)._1

  /** [[unigramPerplexity]] plus a release() thunk for the persisted
    * term-count intermediate (a no-op unless an explicit finite cap made
    * the gate persist; cache is keyed by logical plan, release after
    * materializing the result).
    */
  def unigramPerplexityReleasable(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 1L,
      maxBroadcastVocab: Long = AdaptiveVocabJoin)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("term"))
    val counts0 = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // explicit finite cap: persist (counts feeds the gate count job, the
    // total, and the scoring join — one materialization)
    val gated = maxBroadcastVocab > 0L && maxBroadcastVocab != Long.MaxValue
    val counts = if (gated)
      counts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else counts0
    // total over the UNfloored counts: the denominator is the true corpus
    // token count regardless of the vocabulary floor. Summing cnt's VALUE
    // keeps this branch canonically identical to the join branch's counts
    // subplan, so the ungated plan reuses the count exchange (the
    // tfIdfTopTerms RemoveRedundantAggregates lesson).
    val tot = counts.agg(sum(col("cnt")).cast("double").as("total"))
    val vocab = if (minCount > 1L) counts.filter(col("cnt") >= minCount)
      else counts
    val vocabSide =
      if (maxBroadcastVocab == Long.MaxValue) broadcast(vocab)
      else if (gated && vocab.count() <= maxBroadcastVocab) broadcast(vocab)
      else vocab // no hint: AQE broadcast-converts iff measured size fits
    // OOV (floored-out) terms score as if seen at the floor boundary
    val defaultCnt = math.max(minCount - 1L, 1L).toDouble
    val result = toks.crossJoin(broadcast(tot))
      .join(vocabSide, Seq("term"), "left")
      .select(col("id"),
        (-log(coalesce(col("cnt").cast("double"), lit(defaultCnt))
          / col("total"))).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), exp(avg(col("nll"))).as("perplexity"))
    (result,
      () => { if (gated) counts.unpersist(blocking = false); () })
  }

  /** Per-document interpolated bigram language-model perplexity — the
    * CCNet-style quality filter one order up from [[unigramPerplexity]]:
    * each bigram position scores
    * p(w2|w1) = lambda * c(w1 w2)/c(w1) + (1-lambda) * c(w2)/total
    * (Jelinek–Mercer interpolation with the corpus's own counts), and a
    * document's perplexity is exp(mean(-ln p)) over its bigram
    * positions. Documents with fewer than 2 tokens have no bigram
    * positions and are absent from the output.
    *
    * Scale shape: bigrams are built ROW-LOCALLY (`zip_with` over the
    * token array against its own 1-shifted slice — no window, no
    * per-doc shuffle for adjacency). Two count shuffles produce the
    * unigram and bigram vocabularies; both are floored by `minCount`
    * (the bigram table is the one that explodes on a web corpus — the
    * floor is the defense), and all three scoring joins follow the
    * [[AdaptiveVocabJoin]] strategy: no hint, AQE broadcast-converts
    * from measured size. Floored-out bigrams score their conditional
    * term as 0 (pure interpolation fallback to the unigram term);
    * floored-out unigrams score the unigram term at the floor boundary
    * like [[unigramPerplexity]]. The interpolation weight should be a
    * dyadic rational (default 0.75) so `lambda` and `1-lambda` are both
    * exact doubles — scores then reproduce bit-for-bit across engines.
    *
    * Defaults (minCount=1) keep every n-gram: the unigram joins never
    * miss and the conditional term is exact.
    */
  def bigramPerplexity(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.75,
      minCount: Long = 1L)
      : org.apache.spark.sql.DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    // with a floor active, a floored-out bigram's conditional term is 0;
    // at lambda == 1 there is no unigram mass to interpolate with, so the
    // doc's score would be -ln(0) = Infinity — reject the combination
    require(minCount == 1L || lambda < 1.0,
      s"lambda must be < 1 when minCount > 1 (floored bigrams score 0 " +
        s"conditional mass and need unigram interpolation), got lambda=$lambda")
    // NOT spread (Parallelism.spreadIfNarrow): measured on the bench —
    // the added exchange REGRESSES the two-consumer bigram LM (interleaved
    // draws 1.20/0.91 s -> 1.76/1.80 s) while the three-consumer trigram
    // LM improves; the tokenize here is light enough that the scan's
    // split count wins
    val docs = df.select(col(idCol).as("id"),
      filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0).as("toks"))
    val toks = docs.select(col("id"), explode(col("toks")).as("term"))
    val bi = docs
      .select(col("id"), explode(zip_with(
        // greatest(.,0): slice throws on negative length for token-less docs
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni0 = toks.groupBy(col("term")).agg(count(lit(1)).as("ucnt"))
    // denominator = true corpus token count, independent of the floor
    val tot = uni0.agg(sum(col("ucnt")).cast("double").as("total"))
    val uni = if (minCount > 1L) uni0.filter(col("ucnt") >= minCount) else uni0
    val big0 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bcnt"))
    val big = if (minCount > 1L) big0.filter(col("bcnt") >= minCount) else big0
    val defaultCnt = math.max(minCount - 1L, 1L).toDouble
    val u1 = uni.select(col("term").as("w1"), col("ucnt").as("c1"))
    val u2 = uni.select(col("term").as("w2"), col("ucnt").as("c2"))
    // conditional term: null bcnt OR null c1 -> 0 (floor consistency:
    // c(w1) < minCount implies every (w1,*) bigram is floored too)
    val p = lit(lambda) * coalesce(col("bcnt").cast("double") / col("c1"), lit(0.0)) +
      lit(1.0 - lambda) * coalesce(col("c2").cast("double"), lit(defaultCnt)) / col("total")
    bi.crossJoin(broadcast(tot))
      .join(big, Seq("w1", "w2"), "left")
      .join(u1, Seq("w1"), "left")
      .join(u2, Seq("w2"), "left")
      .select(col("id"), (-log(p)).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), exp(avg(col("nll"))).as("perplexity"))
  }

  /** Trigram language-model perplexity with stupid backoff (Brants et
    * al., "Large Language Models in Machine Translation") — the order-3
    * member of the perplexity family ([[unigramPerplexity]],
    * [[bigramPerplexity]]): each trigram position scores
    *   p = c(w1 w2 w3)/c(w1 w2)            if the trigram survives the
    *                                       count floor,
    *     = alpha * c(w2 w3)/c(w2)          else if the bigram survives,
    *     = alpha^2 * c(w3)/total           otherwise,
    * and a document's perplexity is exp(mean(-ln p)) over its trigram
    * positions (documents under 3 tokens are absent). With
    * `minCount` = 1 every scored trigram was observed, so the backoff
    * branches only matter at `minCount` >= 2 — the pruned-LM regime
    * that is ALSO the scale answer: the raw trigram table is the
    * object that explodes on a web corpus, and the floor bounds it.
    *
    * Scale shape: trigram positions are built ROW-LOCALLY (zip_with
    * over the token array against its own shifted slices — no window,
    * no per-doc shuffle for adjacency); the three count tables shuffle
    * with map-side combine; the five scoring joins follow the
    * [[AdaptiveVocabJoin]] strategy (no hint — AQE broadcast-converts
    * from measured size). The floor keeps branch-1's denominator
    * total: c(w1 w2) >= c(w1 w2 w3) >= minCount, so a surviving
    * trigram's prefix bigram always survives too.
    */
  def trigramPerplexity(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4,
      minCount: Long = 1L)
      : org.apache.spark.sql.DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    // tokenize + the n-gram explodes re-run per consumer off the scan:
    // spread an under-split source (no-op at scale,
    // Parallelism.spreadIfNarrow) so the LM count stages run at session
    // parallelism and the consumers share one exchange
    val docs = Parallelism.spreadIfNarrow(
      df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"),
        filter(split(lower(col("__text")), "\\s+"),
          t => length(t) > 0).as("toks"))
    val toks = docs.select(col("id"), explode(col("toks")).as("term"))
    def shifted(from: Int, span: Column): Column =
      slice(col("toks"), lit(from), span)
    val span2 = greatest(size(col("toks")) - 1, lit(0))
    val span3 = greatest(size(col("toks")) - 2, lit(0))
    val bi = docs
      .select(explode(zip_with(shifted(1, span2), shifted(2, span2),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val tri = docs
      .select(col("id"), explode(zip_with(
        zip_with(shifted(1, span3), shifted(2, span3),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        shifted(3, span3),
        (ab, c3) => struct(ab.getField("w1").as("w1"),
          ab.getField("w2").as("w2"), c3.as("w3")))).as("tg"))
      .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("ucnt"))
    val tot = uni.agg(sum(col("ucnt")).cast("double").as("total"))
    val bic0 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bcnt"))
    val bic = if (minCount > 1L) bic0.filter(col("bcnt") >= minCount) else bic0
    val tric0 = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("tcnt"))
    val tric = if (minCount > 1L) tric0.filter(col("tcnt") >= minCount)
      else tric0
    val b12 = bic.select(col("w1"), col("w2"), col("bcnt").as("c12"))
    val b23 = bic.select(col("w1").as("w2"), col("w2").as("w3"),
      col("bcnt").as("c23"))
    val u2 = uni.select(col("term").as("w2"), col("ucnt").as("cw2"))
    val u3 = uni.select(col("term").as("w3"), col("ucnt").as("cw3"))
    val p = when(col("tcnt").isNotNull,
        col("tcnt").cast("double") / col("c12"))
      .when(col("c23").isNotNull,
        lit(alpha) * col("c23").cast("double") / col("cw2"))
      .otherwise(lit(alpha) * lit(alpha) *
        col("cw3").cast("double") / col("total"))
    tri.crossJoin(broadcast(tot))
      .join(tric, Seq("w1", "w2", "w3"), "left")
      .join(b12, Seq("w1", "w2"), "left")
      .join(b23, Seq("w2", "w3"), "left")
      .join(u2, Seq("w2"), "left")
      .join(u3, Seq("w3"), "left")
      .select(col("id"), (-log(p)).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        exp(avg(col("nll"))).as("perplexity"))
  }

  /** Top-n terms per document by tf-idf (raw term count x ln(N/df)).
    *
    * Scale shape: one shuffle builds (id, term) counts with map-side
    * combine. The document-frequency table is vocabulary-sized and
    * bounded two ways:
    *  - `minDf` floors it (terms in fewer than minDf documents are
    *    dropped from scoring — on a web corpus the hapax tail is
    *    tokenizer noise, and it is also what makes the vocabulary
    *    unbounded);
    *  - `maxBroadcastVocab` picks the join strategy (see
    *    [[AdaptiveVocabJoin]]): by default AQE broadcast-converts the
    *    scoring join only when the measured document-frequency exchange
    *    is actually small; above the threshold it shuffles on `term`.
    * The per-document top-n is the bounded top-k aggregate (string ids),
    * so only n terms per document per partition reach the final exchange.
    *
    * Returns (id, term, score, rank), rank 1..n by score desc / term asc.
    * Defaults (minDf=1) score every term.
    */
  def tfIdfTopTerms(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      topN: Int,
      minDf: Long = 1L,
      maxBroadcastVocab: Long = AdaptiveVocabJoin)
      : org.apache.spark.sql.DataFrame =
    tfIdfTopTermsReleasable(df, idCol, textCol, topN, minDf,
      maxBroadcastVocab)._1

  /** [[tfIdfTopTerms]] plus a release() thunk for the persisted (doc,
    * term) count intermediate (a no-op unless an explicit finite cap made
    * the gate persist; cache is keyed by logical plan, release after
    * materializing the result).
    */
  def tfIdfTopTermsReleasable(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      topN: Int,
      minDf: Long = 1L,
      maxBroadcastVocab: Long = AdaptiveVocabJoin)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val nDocs = df.count() // one tiny job; N is a literal in the plan
    val toks = df.select(col(idCol).as("id"),
        explode(filter(split(lower(col(textCol)), "\\s+"),
          t => length(t) > 0)).as("term"))
    val tf0 = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    // explicit finite cap: persist tf (it feeds the df branch, the gate
    // count job, and the scoring join — one materialization)
    val gated = maxBroadcastVocab > 0L && maxBroadcastVocab != Long.MaxValue
    val tf = if (gated)
      tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tf0
    // df falls out of tf (already one row per (doc, term)) — no separate
    // distinct() shuffle. The predicate on cnt's VALUE keeps this branch's
    // copy of tf structurally identical to the join branch's (otherwise
    // RemoveRedundantAggregates rewrites it into a bare distinct, subplan
    // equality breaks, and the UNgated plan re-scans + re-shuffles the
    // corpus instead of reusing tf's exchange). cnt >= 1 always, so
    // df == count.
    val docFreq0 = tf.groupBy(col("term"))
      .agg(count(when(col("cnt") >= 1, 1)).as("df"))
    val docFreq = if (minDf > 1L) docFreq0.filter(col("df") >= minDf)
      else docFreq0
    val dfSide =
      if (maxBroadcastVocab == Long.MaxValue) broadcast(docFreq)
      else if (gated && docFreq.count() <= maxBroadcastVocab)
        broadcast(docFreq)
      else docFreq // no hint: AQE broadcast-converts iff measured size fits
    val scored = tf.join(dfSide, Seq("term"))
      .select(col("id"), col("term"),
        (col("cnt").cast("double") * log(lit(nDocs.toDouble) / col("df")))
          .as("score"))
    val result = scored.groupBy(col("id"))
      .agg(graft.functions.topk_agg(col("score"), col("term"), topN).as("topk"))
      .select(col("id"), posexplode(col("topk")).as(Seq("r", "t")))
      .select(col("id"), col("t.item_id").as("term"),
        col("t.score").as("score"), (col("r") + 1).as("rank"))
    (result, () => { if (gated) tf.unpersist(blocking = false); () })
  }

  /** Okapi BM25 top-k retrieval: score every document against a (small)
    * query set and keep the k best per query. Standard
    * Robertson–Sparck Jones weighting:
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    * contribution = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    * summed over the query's distinct terms. Output: query_id, doc_id,
    * score (rounded to 6 decimals — ranking uses the ROUNDED score with
    * doc-id tiebreak, so results are deterministic across engines and
    * partitionings), rank (1-based, <= k).
    *
    * Scale shape: the query term set broadcasts and SEMI-JOINS the token
    * stream map-side, so only tokens matching some query term ever reach
    * an exchange — the corpus itself never shuffles. The corpus is
    * tokenized ONCE per scan (a named array column feeds both size()
    * and explode(); CollapseProject won't inline a non-cheap expression
    * referenced twice), document length rides the surviving tokens (no
    * window), and the N/avgdl stats take one additional pruned scan.
    * Per-term document frequencies aggregate from the already-filtered
    * tf rows (query-vocabulary-sized), corpus N/avgdl ride a 1-row
    * broadcast, and the final per-query top-k is the bounded
    * [[graft.functions.topk_agg]] — <= partitions x |queries| x k rows
    * cross the last exchange, not |matches|.
    */
  def bm25TopK(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queries: org.apache.spark.sql.DataFrame,
      qidCol: String,
      qtextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): org.apache.spark.sql.DataFrame =
    bm25TopKReleasable(docs, idCol, textCol, queries, qidCol, qtextCol,
      k, k1, b)._1

  /** [[bm25TopK]] plus a release() thunk for the persisted matched-tf
    * frame (call once the result has been materialized). The persist is
    * what keeps the corpus explode + term semi-join + (doc, term)
    * aggregation a SINGLE execution — its two consumers (per-term doc
    * frequencies and the scoring join) would otherwise each recompute
    * the whole chain. The cached frame is bounded by match volume
    * (docs containing query terms x query terms), not corpus size.
    */
  def bm25TopKReleasable(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queries: org.apache.spark.sql.DataFrame,
      qidCol: String,
      qtextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): (org.apache.spark.sql.DataFrame, () => Unit) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val idType = docs.schema(idCol).dataType
    def toksOf(c: Column): Column =
      filter(split(lower(c), "\\s+"), t => length(t) > 0)
    // tokenize ONCE into a named array column; size() and explode()
    // both consume the attribute (CollapseProject won't inline a
    // non-cheap expression referenced twice), so the regex split runs
    // once per row, not once per consumer
    val toked = docs.select(col(idCol).as("id"),
      toksOf(col(textCol)).as("__toks"))
    val docToks = toked.select(col("id"),
      size(col("__toks")).cast("double").as("dl"),
      explode(col("__toks")).as("term"))
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(toksOf(col(qtextCol)))).as("term"))
    val tfq = docToks
      .join(broadcast(qterms.select(col("term")).distinct()),
        Seq("term"), "left_semi")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = toked
      .select(size(col("__toks")).cast("double").as("dl0"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl0")).as("avgdl"))
    val docFreq = tfq.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tfq.join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("contrib"))
      .groupBy(col("query_id"), col("id"))
      .agg(round(sum(col("contrib")), 6).as("score"))
    val result = scored.groupBy(col("query_id"))
      .agg(graft.functions.topk_agg(col("score"), col("id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r", "t")))
      .select(col("query_id"),
        col("t.item_id").cast(idType).as("doc_id"),
        col("t.score").as("score"), (col("r") + 1).as("rank"))
    (result, () => { tfq.unpersist(blocking = false); () })
  }

  /** Pairwise n-gram Jaccard overlap BETWEEN corpus groups (sources,
    * snapshots, shards) — the overlap matrix that decides whether two
    * sources are near-copies of each other before any document-level
    * dedup runs. One row per unordered group pair: per-side distinct
    * gram counts, the intersection size, and Jaccard.
    *
    * Scale shape: grams reduce to per-(group, 64-bit xxhash64) DISTINCT
    * keys in one exchange — gram text never shuffles; the pair stage
    * re-exchanges only the deduped gram keys, and per shared gram emits
    * at most nGroups^2 pairs (nGroups is small by definition — it's the
    * GROUP label, not the document id). Per-group totals are a tiny
    * re-aggregation broadcast onto the pair counts.
    */
  def sourceOverlap(
      docs: org.apache.spark.sql.DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 8): org.apache.spark.sql.DataFrame = {
    val grams = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(ngrams(col(textCol), n)).as("__gram"))
      .select(col("__g"), xxhash64(col("__gram")).as("__h"))
      .distinct()
    val sizes = grams.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val a = grams.select(col("__g").as("source_a"), col("__h"))
    val b = grams.select(col("__g").as("source_b"), col("__h"))
    val inter = a.join(b, Seq("__h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    // complete matrix: every unordered group pair appears, zero-overlap
    // pairs included (the pair frame is sizes x sizes — tiny)
    val allPairs = sizes.select(col("__g").as("source_a"),
        col("__n").as("n_a"))
      .crossJoin(sizes.select(col("__g").as("source_b"),
        col("__n").as("n_b")))
      .filter(col("source_a") < col("source_b"))
    val out = allPairs
      .join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_common"), lit(0L))))
          .as("jaccard"))
    // the deduped gram frame appears three times in this one plan
    // (sizes, both join sides) — ReuseExchange collapses them onto a
    // single physical shuffle, so no persist is needed
    out
  }

  /** Zipf law fit over the corpus token-frequency distribution: OLS of
    * ln(count) against ln(rank) for the top-`topN` tokens (rank 1 =
    * most frequent, count ties broken by token ascending). Natural
    * corpora fit slope ~ -1; a slope far off flags synthetic,
    * boilerplate-heavy, or truncated-vocabulary text. Output one row:
    * `slope`, `intercept`, `r2`, `n_ranks`.
    *
    * Scale shape: tokens collapse to per-token counts in one map-side
    * combined exchange; the rank window + regression run over the
    * top-`topN` rows only (a bounded TakeOrdered, not a global sort
    * of the vocabulary).
    */
  def zipfFit(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      topN: Int = 200): org.apache.spark.sql.DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val counts = docs
      .select(explode(filter(tokens(lower(col(textCol))),
        t => length(t) > 0)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok").asc)
    counts.withColumn("rank", row_number().over(w))
      .agg(
        corr(log(col("rank").cast("double")), log(col("c").cast("double")))
          .as("__r"),
        covar_samp(log(col("rank").cast("double")),
          log(col("c").cast("double"))).as("__cov"),
        var_samp(log(col("rank").cast("double"))).as("__vx"),
        avg(log(col("rank").cast("double"))).as("__mx"),
        avg(log(col("c").cast("double"))).as("__my"),
        count(lit(1)).as("n_ranks"))
      .select(
        (col("__cov") / col("__vx")).as("slope"),
        (col("__my") - col("__cov") / col("__vx") * col("__mx"))
          .as("intercept"),
        (col("__r") * col("__r")).as("r2"),
        col("n_ranks"))
  }

  /** Blocklist screen (the C4-style "bad words" filter): per document
    * — token count, flagged-token count (case-folded exact token
    * match against the list), flagged ratio, and the pass verdict
    * (ratio <= maxRatio; empty documents pass). Entirely row-local
    * codegen array ops, zero shuffle, SQL-portable.
    */
  def blocklistReport(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      words: Seq[String],
      maxRatio: Double = 0.0): org.apache.spark.sql.DataFrame = {
    require(words.nonEmpty, "blocklist must be non-empty")
    require(maxRatio >= 0, s"maxRatio must be >= 0, got $maxRatio")
    val set = array(words.map(w => lit(w.toLowerCase)): _*)
    val toks = filter(tokens(lower(col(textCol))),
      t => length(t) > 0)
    val flagged = size(filter(toks, t => array_contains(set, t)))
    df.select(col(idCol),
        size(toks).as("n_tokens"),
        flagged.as("n_flagged"))
      .withColumn("flagged_ratio",
        when(col("n_tokens") > 0,
          col("n_flagged").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("passed", col("flagged_ratio") <= maxRatio)
  }

  /** URL-domain histogram over a text corpus — the source-mix profile
    * behind web-corpus curation (domain caps, quality-by-domain
    * weighting): extract every `http(s)://host` occurrence, count
    * URLS and DISTINCT DOCUMENTS per lowercased host. Extraction is
    * a row-local regex pass; the exchange carries (domain, doc)
    * pairs, never text.
    */
  def urlDomainStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val hosts = df.select(col(idCol).as("__id"),
        explode(expr(
          s"regexp_extract_all($textCol, 'https?://([^/\\\\s]+)', 1)"))
          .as("__h"))
      .select(col("__id"), lower(col("__h")).as("domain"))
    hosts.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("__id")).as("n_docs"))
  }

  /** Classic readability statistics per text, from three countable
    * surface features (Flesch 1948; Kincaid 1975; Senter & Smith 1967):
    * words (non-empty whitespace tokens), sentences (runs of `.!?`,
    * floored at 1), and syllables (vowel-group count `[aeiouy]+` per
    * word, floored at 1 per word — the standard cheap estimator).
    * Returns a struct column (n_words, n_sentences, n_syllables,
    * n_alnum, flesch, fk_grade, ari); empty text yields NULL scores.
    * Row-local built-ins only — zero shuffle, whole-stage codegen, and
    * every count is exactly SQL-expressible for oracle checks.
    */
  def readability(text: Column): Column = {
    val words = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    // NULL text must yield NULL counts, not artifacts: Spark's
    // size(NULL array) is -1 (legacy) and greatest() SKIPS nulls (so
    // an ungated sentence count would report 1) — both diverge from
    // the SQL-oracle semantics where every count of NULL input is
    // NULL. The gate is an ADDED null-or-zero term, NOT a when()
    // around the count: wrapping the counts (or the whole struct) in
    // a conditional makes every expensive subtree (the split+filter,
    // the per-word syllable fold) a conditional branch after
    // field-extraction pushdown, which codegen's subexpression
    // elimination refuses to share across fields — measured 1.8x on
    // the corpus scan both ways it was tried (r13's struct-level gate
    // AND the older per-count when()); the additive gate keeps the
    // shared subtrees unconditional and costs one long add.
    val nullGate = when(text.isNotNull, lit(0L))
    // ungated (non-null) longs: -1 words / 1 sentence on NULL text —
    // used only inside branches the nW0 > 0 gate already closed
    val nW0 = size(words).cast("long")
    val nS0 = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast("long")
    // the fold and the alnum count propagate NULL input on their own
    val nSyl = aggregate(words, lit(0L),
      (acc, w) => acc +
        greatest(regexp_count(w, lit("[aeiouy]+")), lit(1)).cast("long"))
    val nAl = regexp_count(text, lit("[A-Za-z0-9]")).cast("long")
    // the score gate doubles as the NULL gate for free: size(NULL
    // array) is -1, so NULL text fails nW0 > 0 exactly like an empty
    // document — no nullable arithmetic inside the branches
    val gate = (c: Column) => when(nW0 > 0, c)
    // Each score is ONE integer-exact fraction (the formula multiplied
    // through by its denominators): the numerator and denominator are
    // exact in int64, so the single IEEE division yields a BIT-IDENTICAL
    // double on any engine — no operation-order or FMA drift, which
    // matters because integer-ratio inputs land on exact decimal
    // rounding boundaries far more often than generic floats.
    val w = nW0; val s = nS0; val syl = nSyl; val al = nAl
    val flesch = (lit(206835L) * w * s - lit(1015L) * w * w -
      lit(84600L) * syl * s).cast("double") /
      (lit(1000L) * w * s).cast("double")
    val fk = (lit(39L) * w * w + lit(1180L) * syl * s -
      lit(1559L) * w * s).cast("double") /
      (lit(100L) * w * s).cast("double")
    val ari = (lit(471L) * al * s + lit(50L) * w * w -
      lit(2143L) * w * s).cast("double") /
      (lit(100L) * w * s).cast("double")
    struct(
      (nW0 + nullGate).as("n_words"),
      (nS0 + nullGate).as("n_sentences"),
      nSyl.as("n_syllables"),
      nAl.as("n_alnum"),
      gate(flesch).as("flesch"),
      gate(fk).as("fk_grade"),
      gate(ari).as("ari"))
  }

  /** Encoding-hygiene profile — the mojibake / corruption screen a
    * web crawl needs before any text op trusts the bytes: per-row
    * counts of ASCII, letters, digits, whitespace, control characters
    * (tab / CR / LF excluded — those are formatting, not damage), and
    * U+FFFD replacement characters (the indelible mark of a failed
    * decode), plus `non_ascii_ratio` and a `mojibake` verdict (any
    * replacement char, or control characters above 1% of the text —
    * compared as `n_control * 100 > n_chars`, integer-exact on any
    * engine). NULL text yields NULL fields ([[readability]]'s
    * convention). Row-local codegen regexp counts over EXPLICIT char
    * ranges — identical semantics in Java regex and RE2, so a SQL
    * oracle replays bit-for-bit; zero shuffle at any scale.
    */
  def encodingProfile(text: Column): Column = {
    val nChars = when(text.isNotNull, length(text)).cast("long")
    def cnt(cls: String) = regexp_count(text, lit(cls)).cast("long")
    val nAscii = cnt("[\\x00-\\x7f]")
    val nCtl = cnt("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]")
    val nRepl = cnt("\uFFFD")
    struct(
      nChars.as("n_chars"),
      nAscii.as("n_ascii"),
      cnt("[A-Za-z]").as("n_letter"),
      cnt("[0-9]").as("n_digit"),
      cnt("[ \\t\\n\\r]").as("n_ws"),
      nCtl.as("n_control"),
      nRepl.as("n_replacement"),
      when(nChars > 0,
        (nChars - nAscii).cast("double") / nChars.cast("double"))
        .when(nChars === 0, lit(0.0)).as("non_ascii_ratio"),
      (nRepl > 0 || nCtl * 100 > nChars).as("mojibake"))
  }

  /** Top bigram collocations by pointwise mutual information —
    * `log P(w1,w2) / (P(w1) P(w2))` with probabilities estimated from
    * corpus bigram / unigram counts (Church & Hanks 1990). The corpus
    * reduces to two vocabulary-sized count tables (one exchange each,
    * map-side combined); PMI assembly then joins the `minCount`-filtered
    * bigram table to the unigram table twice — vocabulary-sized inputs,
    * so AQE broadcasts whenever they fit, and the full corpus never
    * re-shuffles. Grand totals attach via a broadcast 1-row cross join.
    * Ranking sorts by ROUNDED pmi (6 places) with (w1, w2) tie-break so
    * the top-k cut is deterministic and engine-independent.
    *
    * Output: w1, w2, cnt, pmi — `topK` rows.
    */
  def pmiCollocations(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Int,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(
      filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bi = toks.select(explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val totals = uni.agg(sum("c1").as("nu"))
    val nb = bi.agg(sum("c12").as("nb"))
    bi
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c1", "cl"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c1", "cr"), "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12").as("cnt"),
        (round(log((col("c12").cast("double") / col("nb")) /
          ((col("cl").cast("double") / col("nu")) *
            (col("cr").cast("double") / col("nu")))), 6) + 0.0).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(topK)
  }

  // ===== compression (java.util.zip) ================================
  // The one place TextOps leaves pure column composition: zlib rides
  // the JDK's native binding, so these are partition-local
  // mapPartitions at the codec boundary — the Media-decoder pattern,
  // not a per-row UDF (one Deflater instance serves a whole partition).

  final case class CompressionRecord(
      id: Long, raw_bytes: Int, compressed_bytes: Long, ratio: Double)

  /** Deflate compressibility screen — the Gopher/FineWeb-class
    * repetitiveness signal: boilerplate and looped text compress far
    * below normal prose, so `ratio = deflate(utf8) / raw` is a cheap
    * quality filter that needs no model and no reference corpus.
    * One Deflater per PARTITION (reset per row — the native context is
    * not reallocated in the hot loop); a null text scores as empty
    * (raw_bytes 0, ratio 1.0). Output: id, raw_bytes,
    * compressed_bytes, ratio. Partition-local, zero shuffle.
    */
  def compressionRatio(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      level: Int = 6): org.apache.spark.sql.DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level out of [1,9]: $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (raw.isEmpty) CompressionRecord(id, 0, 0L, 1.0)
          else {
            defl.reset()
            defl.setInput(raw)
            defl.finish()
            var total = 0L
            while (!defl.finished()) total += defl.deflate(buf)
            CompressionRecord(id, raw.length, total,
              total.toDouble / raw.length)
          }
        }
      }
      .toDF()
  }

  /** Gzip-compress a text column to a binary column (id, blob) — the
    * shipping/round-trip twin of [[gunzipTexts]]. A null text
    * compresses as empty bytes (the [[compressionRatio]] null policy —
    * one rule across the compression family), round-tripping to "".
    */
  def gzipTexts(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        if (text != null)
          gz.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        gz.close()
        (id, bos.toByteArray)
      })
      .toDF("id", "blob")
  }

  /** Decompress a gzip binary column to text (WARC-style crawl
    * payloads arrive as gzip members) — STRICT: a corrupt or truncated
    * member fails the job; crawl feeds use [[gunzipTextsLenient]].
    * Partition-local, zero shuffle.
    */
  def gunzipTexts(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) => (id, gunzipOne(blob)) })
      .toDF("id", "text")
  }

  /** [[gunzipTexts]] with crawl-ingest DROP semantics: a corrupt
    * member costs its row, never the job.
    */
  def gunzipTextsLenient(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try Some((id, gunzipOne(blob)))
        catch { case scala.util.control.NonFatal(_) => None }
      })
      .toDF("id", "text")
  }

  private def gunzipOne(blob: Array[Byte]): String = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(blob))
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
