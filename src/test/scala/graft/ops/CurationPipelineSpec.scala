package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** The full curation pipeline must COMPOSE: quality filter -> exact +
  * near dedup -> decontaminate against an eval set -> stratified split
  * -> sequence packing, each stage consuming the previous stage's
  * frame, ending in a consistent pack layout. This is the end-to-end
  * path a training-data team actually runs; composition bugs (column
  * contracts, null handling, nondeterminism across stages) don't show
  * up in per-op specs.
  */
class CurationPipelineSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("corpus -> filter -> dedup -> decontaminate -> split -> pack") {
    import spark.implicits._

    // 60 good docs; 10 exact dups of doc 0; 5 near-dups of doc 1 (tiny
    // suffix); 5 repetition-degenerate docs; 3 docs quoting the eval set
    val good = (0L until 60L).map(i =>
      i -> (s"doc $i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i " +
        s"eta$i theta$i iota$i kappa$i"))
    val exactDups = (100L until 110L).map(i => i -> good(0)._2)
    val nearDups = (200L until 205L).map(i => i -> (good(1)._2 + " tail"))
    val degenerate = (300L until 305L).map(i =>
      i -> Seq.fill(12)("spam spam").mkString(" "))
    val evalSet = Seq(900L -> "question one secret eval answer text here now",
      901L -> "question two hidden holdout reply words go here")
    val leaky = (400L until 403L).map(i =>
      i -> s"prefix $i question one secret eval answer text here now suffix")
    val corpus = (good ++ exactDups ++ nearDups ++ degenerate ++ leaky)
      .toDF("doc_id", "text")
    val probe = evalSet.toDF("doc_id", "text")

    // 1. quality: drop repetition-degenerate docs
    val filtered = corpus.filter(TextOps.dupNgramRatio(col("text"), 2) < 0.5)
    filtered.count() shouldBe 78 // 83 - 5 degenerate

    // 2a. exact dedup on normalized fingerprint
    val deduped = Dedup.exact(
      filtered.withColumn("fp", TextOps.fingerprint(col("text"))),
      "doc_id", Seq("fp")).drop("fp")
    // 10 exact dups of doc 0 gone, plus 4 of the 5 mutually-identical
    // near-dup copies (exact dedup catches them before LSH ever runs)
    deduped.count() shouldBe 64
    deduped.filter(col("doc_id") === 0L).count() shouldBe 1

    // 2b. near dedup: LSH pairs -> components -> keep min id per comp
    val pairs = Dedup.minHashLshPairs(deduped, "doc_id", "text",
      numHashes = 64, bands = 32, shingleK = 2)
      .filter(col("est_jaccard") >= 0.5)
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val losers = comps.filter(col("id") =!= col("comp")).select(col("id"))
    val nearDeduped = deduped.join(losers,
      deduped("doc_id") === losers("id"), "left_anti")
    // the doc-1 near-dup collapses into doc 1, AND the three leaky docs
    // (identical but for their prefix token) collapse among themselves
    nearDeduped.count() shouldBe 61
    nearDeduped.filter(col("doc_id") === 1L).count() shouldBe 1
    nearDeduped.filter(col("doc_id") >= 400L).count() shouldBe 1

    // 3. decontaminate: exact 5-gram overlap against the eval set
    val contaminated = Dedup.ngramContamination(nearDeduped, probe,
      "doc_id", "text", n = 5, minShared = 3)
      .select(col("train_id").as("doc_id")).distinct()
    contaminated.collect().map(_.getLong(0)).sorted shouldBe Array(400L)
    val clean = nearDeduped.join(contaminated, Seq("doc_id"), "left_anti")
    clean.count() shouldBe 60

    // 4. stratified split (deterministic, disjoint, covering)
    val split = Sampling.hashSplit(clean, "doc_id",
      Map("train" -> 0.9, "heldout" -> 0.1))
    split.count() shouldBe 60
    val trainSet = split.filter(col("split") === "train")

    // 5. pack the training split; layout must be a consistent
    // concat-and-chunk of exactly the surviving train docs
    val (packed, release) = Packing.packSequencesReleasable(
      trainSet.withColumn("n_tok", TextOps.tokenCount(col("text"))),
      "doc_id", "n_tok", "doc_id", budget = 64L)
    try {
      val rows = packed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      rows.length.toLong shouldBe trainSet.count()
      var off = 0L
      for ((_, ntok, start) <- rows.map(r => (r._1, r._2, r._3))
             .sortBy(_._3)) {
        start shouldBe off
        off += ntok
      }
    } finally release()
  }

  test("round-5 chain: normalize -> collapse repeats -> bloom " +
    "decontaminate -> best-copy dedup -> temperature mix -> budget") {
    import spark.implicits._

    // two sources, skewed 4:1; every doc carries whitespace noise; doc
    // pairs (i, i+500) are same-content copies where the high-id copy
    // is longer (higher quality score); docs 0-9's texts leak into the
    // eval probe verbatim
    def body(i: Long) =
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i " * 3
    val base = (0L until 400L).map(i =>
      (i, s"  ${body(i)}\t", if (i < 320) "web" else "books"))
    val copies = (0L until 400L).map(i =>
      (i + 500L, s" ${body(i)} extra tokens of real content here ",
        if (i < 320) "web" else "books"))
    val corpus = (base ++ copies).toDF("doc_id", "text", "source")
    val probe = (0L until 10L).map(i => (900L + i, body(i).trim))
      .toDF("doc_id", "text")

    // 1. canonical cleanup: whitespace noise gone, idempotent
    val normed = corpus.withColumn("text",
      TextOps.normalizeText(col("text")))
    normed.filter(col("text").startsWith(" ")).count() shouldBe 0

    // 2. run-length cleanup composes (no repeated lines here -> no-op)
    val collapsed = normed.withColumn("text",
      TextOps.collapseRepeatedLines(col("text")))
    collapsed.count() shouldBe 800

    // 3. bloom decontaminate on the normalized prefix key: the probe
    // texts equal body(i).trim == normalized base texts of docs 0-9
    val clean = Dedup.bloomAntiJoin(collapsed,
      probe.withColumn("text", TextOps.normalizeText(col("text"))),
      "text", numBits = 1L << 14, numHashFns = 5)
    clean.count() shouldBe 790
    clean.filter(col("doc_id") < 10).count() shouldBe 0

    // 4. quality-aware dedup on the shared 6-token prefix fingerprint:
    // each (i, i+500) pair collapses to the LONGER copy (higher score)
    val keyed = clean.withColumn("pfx",
      array_join(slice(split(col("text"), " "), 1, 6), " "))
      .withColumn("score",
        org.apache.spark.sql.functions.length(col("text")).cast("double"))
    val best = Dedup.exactBest(keyed, Seq("pfx"), "score", "doc_id")
      .drop("pfx", "score")
    best.count() shouldBe 400
    // every pair's winner is the longer 500+ copy (and the 10
    // decontaminated base docs survive only as their copies)
    best.filter(col("doc_id") >= 500L).count() shouldBe 400
    best.filter(col("doc_id") === 505L).count() shouldBe 1

    // 5. temperature mix flattens the 4:1 source skew toward books
    val mixed = Sampling.temperatureMix(best, "doc_id", "source",
      targetFraction = 0.5, temperature = 0.5)
    val byS = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val webRate = byS.getOrElse("web", 0L).toDouble / 320.0
    val bookRate = byS.getOrElse("books", 0L).toDouble / 80.0
    bookRate should be > webRate // cooler temperature favors the tail

    // 6. token budget: survivors fit, order-hash deterministic
    val toks = mixed.withColumn("n_tok", TextOps.tokenCount(col("text")))
    val picked = Sampling.tokenBudgetSelect(toks, "doc_id", "n_tok", 900L)
    val total = picked.agg(sum(col("n_tok"))).collect()(0).getLong(0)
    total should be <= 900L
    val again = Sampling.tokenBudgetSelect(toks.repartition(7), "doc_id",
      "n_tok", 900L).select("doc_id").collect().map(_.getLong(0)).toSet
    picked.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("round-6 chain: excise shared spans -> validation gate -> " +
    "weighted select -> profile anomaly screen") {
    import spark.implicits._
    import graft.profile.ProfileSession.ProfilingOps

    // 12 sources x 20 docs; EVERY doc ends in the same boilerplate
    // sentence; source s11's docs are ~8x longer (the planted anomaly)
    def body(i: Long) =
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    val boiler = "this shared boiler plate sentence appears in every document"
    val corpus = (0 until 12).flatMap { s =>
      (0 until 20).map { d =>
        val i = s * 100L + d
        val base = if (s == 11) Seq.fill(8)(body(i)).mkString(" ")
                   else body(i)
        (i, s"s$s", s"$base $boiler")
      }
    }.toDF("doc_id", "source", "text")

    // 1. shared-span excision: the boilerplate vanishes from every doc,
    // per-doc unique content survives
    val cleaned = Dedup.removeDuplicatedSpans(corpus, "doc_id", "text",
      windowTokens = 6, minDocs = 100)
    cleaned.filter(col("n_removed") === 0).count() shouldBe 0L
    cleaned.filter(col("text").contains("boiler")).count() shouldBe 0L
    val withLen = cleaned
      .join(corpus.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("len",
        org.apache.spark.sql.functions.length(col("text")).cast("double"))

    // 2. validation gate on the cleaned corpus's profile — no raw
    // re-scan after profiling
    val prof = withLen.newProfilingSession()
      .groupBy("source").aggProfiles()
    Validation.allPass(prof, Seq(
      Validation.MinAtLeast("len", 1.0), // nothing emptied out
      Validation.NullFractionAtMost("text", 0.0),
      Validation.TypeIs("text", "STRING"))) shouldBe true

    // 3. weighted selection: 5 docs per source, weight = cleaned length
    val sel = Sampling.weightedBottomK(withLen, Seq("source"),
      "doc_id", "len", k = 5)
    sel.groupBy("source").count().collect()
      .foreach(_.getLong(1) shouldBe 5L)

    // 4. anomaly screen over the same profiles: exactly the long source
    val anomalies = Drift.metricAnomalies(prof, Seq("len"),
      keep = Seq("source"), threshold = 3.0)
      .filter(col("is_anomaly"))
      .collect().map(_.getString(0))
    anomalies.toSeq shouldBe Seq("s11")
  }

  test("round-7 chain: c4 clean -> gopher gate -> redact -> novelty " +
    "screen -> dsir weights -> weighted select -> chunk") {
    import spark.implicits._

    // three-sentence pages built from per-doc vocabulary; docs % 5 == 0
    // carry an email; docs %7 == 0 quote the reference sentence
    val refSentence =
      "the shared reference sentence that with some documents quote here."
    def page(i: Long): String = {
      val quote = if (i % 7 == 0) s"$refSentence\n" else ""
      val pii = if (i % 5 == 0) s"contact agent$i@mail.com for details " else ""
      s"the first sentence of document number $i speaks of alpha$i here.\n" +
        s"${pii}a second sentence with beta$i and of gamma$i follows on.\n" +
        quote +
        s"finally the third sentence that closes with delta$i here."
    }
    val corpus = (0L until 80L).map(i => (i, page(i), if (i % 2 == 0) "web"
      else "books")).toDF("doc_id", "text", "source")
    val reference = Seq((999L, refSentence)).toDF("doc_id", "text")

    // 1. C4 cleaning keeps every page (all sentences terminal-punctuated
    // and long enough)
    val c4 = TextOps.c4Clean(corpus, "doc_id", "text")
    c4.filter(col("kept") === 1).count() shouldBe 80L

    // 2. gopher gate: measured values ride the report; pages here are
    // short so the word-count rule fails — gate on the other rules
    val rep = TextOps.gopherReport(
      c4.select(col("doc_id"), col("text")), "doc_id", "text",
      minWords = 10)
    rep.filter(col("passed") === 1).count() shouldBe 80L

    // 3. redact the planted PII; nothing else changes
    val redacted = c4.select(col("doc_id"),
      TextOps.redactPii(col("text")).as("text"))
    redacted.filter(col("text").contains("@")).count() shouldBe 0L
    redacted.filter(col("text").contains("[EMAIL]")).count() shouldBe 16L

    // 4. novelty vs the reference: quoting docs score measurably lower
    val nov = TextOps.ngramNovelty(redacted, reference, "doc_id", "text",
      n = 8)
    val (quoting, fresh) = (nov.filter(col("doc_id") % 7 === 0),
      nov.filter(col("doc_id") % 7 =!= 0))
    val maxQuoting = quoting.agg(max(col("novelty"))).head().getDouble(0)
    val minFresh = fresh.agg(min(col("novelty"))).head().getDouble(0)
    maxQuoting should be < minFresh
    minFresh shouldBe 1.0

    // 5. DSIR weights toward the books cohort, then weighted selection
    val withSource = redacted
      .join(corpus.select(col("doc_id"), col("source")), "doc_id")
    val w = TextOps.dsirWeights(withSource,
      withSource.filter(col("source") === "books"), "doc_id", "text")
      .withColumn("wexp", exp(col("logratio")))
      .join(withSource.select(col("doc_id"), col("source")), "doc_id")
    val sel = Sampling.weightedBottomK(w, Nil, "doc_id", "wexp", k = 20)
    sel.count() shouldBe 20L
    // books-tilted weights: books docs dominate the selection
    sel.filter(col("source") === "books").count().toDouble should be >= 12.0

    // 6. chunk the selected docs for the context window
    val chunks = TextOps.contextChunks(
      sel.join(redacted, "doc_id").select(col("doc_id"), col("text")),
      "doc_id", "text", windowTokens = 16, strideTokens = 16)
    chunks.groupBy("doc_id").count().count() shouldBe 20L
    chunks.filter(col("n_tokens") > 16).count() shouldBe 0L
  }

  test("round-12 chain: per-doc losses -> doremi solve -> mixture " +
    "resample -> shard layout round-trips") {
    import spark.implicits._
    // three sources of very different sizes
    val corpus = ((0L until 600L).map(i =>
      (i, s"common web page text number $i with filler tokens", "web")) ++
      (1000L until 1100L).map(i =>
        (i, s"curated book passage $i longer cleaner prose", "books")) ++
      (2000L until 2040L).map(i =>
        (i, s"reference encyclopedia entry $i", "wiki")))
      .toDF("doc_id", "text", "source")

    // 1. per-doc proxy/reference losses (stand-ins for upstream
    // perplexity scorers), 2. solve the mixture
    val losses = corpus.select(col("source"),
      expr("ln(1 + cast(length(text) as double))").as("lp"),
      expr("ln(1 + cast(size(split(text, ' ')) as double))").as("lr"))
    val w = Sampling.doremiWeights(losses, "source", "lp", "lr")
    w.agg(sum(col("weight"))).head.getDouble(0) shouldBe 1.0 +- 1e-9

    // 3. resample toward it: a strict subset spanning every source
    // (the two small sources rate-cap at 1 and keep everything)
    val mixed = Sampling.applyMixtureWeights(corpus, "source", "doc_id",
      w, targetFraction = 0.5)
    val n = mixed.count()
    n should be > 140L
    n should be < 740L
    mixed.select(col("source")).distinct().count() shouldBe 3L
    mixed.filter(col("source") === "wiki").count() shouldBe 40L

    // 4. shard the survivors for training; lossless, stable round trip
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chain_shards").toString
    graft.io.ShardWriter.writeShards(
      mixed.select(col("doc_id"), col("source")), "doc_id", 4, dir)
    val back = spark.read.parquet(dir)
    back.count() shouldBe n
    back.select(col("doc_id")).distinct().count() shouldBe n
  }
}
