package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Empty and degenerate inputs across the round-5 operators: a curation
  * pipeline stage that throws on an empty upstream result (a filter
  * that matched nothing, an empty probe set) takes the whole job down —
  * every op must return an empty/identity frame instead.
  */
class DegenerateInputsSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  import org.apache.spark.sql.DataFrame

  private def emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("id", "text")
  }

  private def someDocs: DataFrame = {
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi")).toDF("id", "text")
  }

  test("duplicatedSpans: empty corpus and all-short docs are silent") {
    import spark.implicits._
    Dedup.duplicatedSpans(emptyDocs, "id", "text", 8).count() shouldBe 0L
    Dedup.duplicatedSpans(Seq((1L, "too short")).toDF("id", "text"),
      "id", "text", 8).count() shouldBe 0L
  }

  test("removeDuplicatedSpans excises merged flagged runs, keeps unique " +
    "text, and passes empty/short corpora through") {
    import spark.implicits._
    // "b1..b5" is a shared 5-token run in docs 1-3 (windows of 4 merge
    // across its 2 flagged positions); unique prefixes/suffixes survive
    val docs = Seq(
      (1L, "u1 u2 b1 b2 b3 b4 b5 t1"),
      (2L, "v1 b1 b2 b3 b4 b5 w9"),
      (3L, "b1 b2 b3 b4 b5"),
      (4L, "x1 x2 x3 x4 x5 x6 x7")).toDF("id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "id", "text",
      windowTokens = 4, minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    got(1L) shouldBe (("u1 u2 t1", 5))
    got(2L) shouldBe (("v1 w9", 5))
    got(3L) shouldBe (("", 5)) // the whole doc was boilerplate
    got(4L) shouldBe (("x1 x2 x3 x4 x5 x6 x7", 0)) // untouched
    // degenerate inputs pass through silently
    Dedup.removeDuplicatedSpans(emptyDocs, "id", "text", 8).count() shouldBe 0L
    val short = Dedup.removeDuplicatedSpans(
      Seq((1L, "too short")).toDF("id", "text"), "id", "text", 8)
      .collect().head
    short.getString(1) shouldBe "too short"
    short.getInt(2) shouldBe 0
  }

  test("bloom joins: empty probe keeps/drops everything correctly; " +
    "empty corpus is empty") {
    Dedup.bloomSemiJoin(someDocs, emptyDocs, "text").count() shouldBe 0L
    Dedup.bloomAntiJoin(someDocs, emptyDocs, "text").count() shouldBe 2L
    Dedup.bloomSemiJoin(emptyDocs, someDocs, "text").count() shouldBe 0L
  }

  test("bm25: empty query set and empty corpus produce no rows") {
    TextOps.bm25TopK(someDocs, "id", "text",
      emptyDocs.select(col("id").as("qid"), col("text").as("qtext")),
      "qid", "qtext", k = 5).count() shouldBe 0L
    TextOps.bm25TopK(emptyDocs, "id", "text",
      someDocs.select(col("id").as("qid"), col("text").as("qtext")),
      "qid", "qtext", k = 5).count() shouldBe 0L
  }

  test("keySkew / temperatureMix / tokenBudgetSelect / weightedSample " +
    "on empty frames are empty, not errors") {
    import spark.implicits._
    Diagnostics.keySkew(emptyDocs, Seq("text"), 5).count() shouldBe 0L
    Sampling.temperatureMix(
      emptyDocs.withColumn("source", lit("web")), "id", "source", 0.5)
      .count() shouldBe 0L
    Sampling.tokenBudgetSelect(
      emptyDocs.withColumn("n_tok", lit(1L)), "id", "n_tok", 100L)
      .count() shouldBe 0L
    Sampling.weightedSample(
      emptyDocs.withColumn("w", lit(0.5)), "id", "w").count() shouldBe 0L
  }

  test("exactBest / collapseRepeatedLines / normalizeText identity cases") {
    import spark.implicits._
    Dedup.exactBest(emptyDocs.withColumn("s", lit(1.0)),
      Seq("text"), "s", "id").count() shouldBe 0L
    val noop = someDocs
      .select(TextOps.collapseRepeatedLines(col("text")).as("c"),
        TextOps.normalizeText(col("text")).as("n"), col("text"))
      .collect()
    noop.foreach { r =>
      r.getString(0) shouldBe r.getString(2) // no repeated lines -> id
      r.getString(1) shouldBe r.getString(2) // already clean -> identity
    }
    // empty string survives the whole cleanup chain as empty
    Seq((1L, "")).toDF("id", "text")
      .select(TextOps.normalizeText(
        TextOps.collapseRepeatedLines(col("text"))))
      .collect()(0).getString(0) shouldBe ""
  }

  test("round-6 ops survive empty inputs: scaling, validation, anomaly " +
    "screen, weighted sampling, linear scoring") {
    import spark.implicits._
    import graft.profile.ProfileSession.ProfilingOps
    val emptyNum = Seq.empty[(String, Double)].toDF("g", "x")
    FeatureScale.zscore(emptyNum, Seq("x"), Seq("g")).count() shouldBe 0L
    FeatureScale.minMax(emptyNum, Seq("x")).count() shouldBe 0L
    FeatureScale.robustScale(emptyNum, "x", Seq("g")).count() shouldBe 0L
    FeatureScale.winsorize(emptyNum, "x", 0.1, 0.9).count() shouldBe 0L
    val emptyProf = emptyNum.newProfilingSession()
      .groupBy("g").aggProfiles()
    Validation.report(emptyProf, Seq(
      Validation.MinAtLeast("x", 0.0))).count() shouldBe 0L
    Validation.allPass(emptyProf, Seq(
      Validation.MinAtLeast("x", 0.0))) shouldBe true // vacuous
    Drift.metricAnomalies(emptyProf, Seq("x"), keep = Seq("g"))
      .count() shouldBe 0L
    val emptyW = Seq.empty[(String, Long, Double)].toDF("g", "id", "w")
    Sampling.weightedBottomK(emptyW, Seq("g"), "id", "w", 5)
      .count() shouldBe 0L
    TextOps.linearQualityScore(emptyDocs, "id", "text").count() shouldBe 0L
    Dedup.removeDuplicatedSpans(emptyDocs, "id", "text", 8)
      .count() shouldBe 0L
  }

  test("semDedup / ivf / quantize on an empty embedding table are empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    Dedup.semDedupSurvivors(empty, "vec_id", "embedding",
      threshold = 0.99, nCentroids = 4).count() shouldBe 0L
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    Similarity.ivfTopK(empty, queries, "vec_id", "embedding",
      k = 3, nCentroids = 4, nProbe = 2).count() shouldBe 0L
    Similarity.ivfPqTopK(empty, queries, "vec_id", "embedding",
      k = 3, nCentroids = 4, nProbe = 2, m = 2, ksub = 4).count() shouldBe 0L
    Similarity.pqTrain(empty, "vec_id", "embedding", m = 2, ksub = 4)
      .foreach(_.length shouldBe 0)
    empty.select(Similarity.quantizeInt8(col("embedding"))).count() shouldBe 0L
  }

  test("round-7 ops survive empty inputs: filters, novelty, dsir, " +
    "drift, chunks, projection") {
    import spark.implicits._
    TextOps.gopherReport(emptyDocs, "id", "text").count() shouldBe 0L
    TextOps.c4Clean(emptyDocs, "id", "text").count() shouldBe 0L
    TextOps.contextChunks(emptyDocs, "id", "text", 8, 4).count() shouldBe 0L
    emptyDocs.select(TextOps.redactPii(col("text"))).count() shouldBe 0L

    // novelty: empty probe -> no rows; empty reference -> all novel
    TextOps.ngramNovelty(emptyDocs, someDocs, "id", "text", 4)
      .count() shouldBe 0L
    val allNovel = TextOps.ngramNovelty(someDocs, emptyDocs,
      "id", "text", 4).collect()
    allNovel.length shouldBe 2
    allNovel.foreach(_.getAs[Double]("novelty") shouldBe 1.0)

    // dsir: empty target degrades to a raw-only prior (finite scores);
    // empty raw produces no rows
    val w = TextOps.dsirWeights(someDocs, emptyDocs, "id", "text",
      nBuckets = 64).collect()
    w.length shouldBe 2
    w.foreach(r => assert(!r.getAs[Double]("logratio").isNaN))
    TextOps.dsirWeights(emptyDocs, someDocs, "id", "text", 64)
      .count() shouldBe 0L

    // categorical drift of two EMPTY sketches: zero totals, zero psi
    // (no categories tracked -> empty union -> empty sum)
    val sk = emptyDocs.agg(
      graft.functions.freq_items_agg(col("text")).as("sa"),
      graft.functions.freq_items_agg(col("text")).as("sb"))
    val d = sk.select(Drift.categoricalPsi(col("sa"), col("sb")).as("p"),
      Drift.categoricalJsd(col("sa"), col("sb")).as("j"),
      Drift.categoricalTotal(col("sa")).as("n")).head()
    d.getDouble(0) shouldBe 0.0
    d.getDouble(1) shouldBe 0.0
    d.getLong(2) shouldBe 0L

    // schemaDrift with one empty side's profile (0-row frame profiles
    // to a row of zero counts, not an error)
    import graft.profile.ProfileSession.ProfilingOps
    val pa = someDocs.newProfilingSession().aggProfiles()
    val pb = emptyDocs.newProfilingSession().aggProfiles()
    val rep = Drift.schemaDrift(pa, pb).collect()
    rep.length shouldBe 2
    rep.foreach(_.getAs[Double]("null_frac_b") shouldBe 0.0)

    // projection / truncation / media on empty frames
    val emptyEmb = Seq.empty[(Long, Array[Double])].toDF("vec_id", "e")
    emptyEmb.select(Similarity.randomProject(col("e"), 4))
      .count() shouldBe 0L
    emptyEmb.select(Similarity.truncateNormalize(col("e"), 2))
      .count() shouldBe 0L
    val emptyBlobs = Seq.empty[(Long, Array[Byte])].toDF("id", "blob")
    Media.resizePpmImages(emptyBlobs, "id", "blob", 4, 4)
      .count() shouldBe 0L
    Media.wavWindowRms(emptyBlobs, "id", "blob", 100).count() shouldBe 0L
  }

  test("round-12 mixture ops: degenerate domains and empty frames") {
    import spark.implicits._
    val losses = Seq(("a", 2.0, 1.0), ("a", 3.0, 1.0))
      .toDF("dom", "lp", "lr")

    // single domain: weight is exactly 1 regardless of excess/steps
    val one = Sampling.doremiWeights(losses, "dom", "lp", "lr",
      eta = 2.0, steps = 5, smoothing = 0.1).collect()
    one.length shouldBe 1
    one.head.getDouble(2) shouldBe 1.0 +- 1e-12

    // empty loss frame is a hard error (no mixture to solve), not a
    // silent empty result a pipeline would keep feeding downstream
    an[IllegalArgumentException] should be thrownBy
      Sampling.doremiWeights(losses.filter(col("lp") < 0), "dom",
        "lp", "lr")

    // mixture apply: empty corpus -> empty out; empty weights -> all
    // domains dropped (explicit empty, not a crash); weight 0 domain
    // keeps nothing, weight-1 domain at fraction 1 keeps everything
    val corpus = ((1L to 40L).map(i => (i, "a")) ++
      (41L to 80L).map(i => (i, "b"))).toDF("id", "dom")
    val w1 = Seq(("a", 1.0), ("b", 0.0)).toDF("domain", "weight")
    Sampling.applyMixtureWeights(corpus.filter(col("id") < 0), "dom",
      "id", w1, 0.5).count() shouldBe 0L
    Sampling.applyMixtureWeights(corpus, "dom", "id",
      w1.filter(col("weight") < 0), 0.5).count() shouldBe 0L
    val kept = Sampling.applyMixtureWeights(corpus, "dom", "id", w1,
      targetFraction = 1.0)
    kept.filter(col("dom") === "b").count() shouldBe 0L
    kept.filter(col("dom") === "a").count() shouldBe 40L
  }

  test("round-13 ops survive empty inputs: encoding profile, audio " +
    "fingerprints, seasonality, runningTotals, auc") {
    import spark.implicits._
    emptyDocs.select(TextOps.encodingProfile(col("text")))
      .count() shouldBe 0L
    val emptyBlobs = Seq.empty[(Long, Array[Byte])].toDF("id", "blob")
    Media.audioFingerprints(emptyBlobs, "id", "blob", 16)
      .count() shouldBe 0L
    Media.audioNearDups(emptyBlobs, "id", "blob", 16).count() shouldBe 0L
    EventStats.seasonality(Seq.empty[Long].toDF("ts"), "ts")
      .count() shouldBe 0L
    val (rt, release) = FeatureScale.runningTotalsReleasable(
      emptyDocs, Seq(col("id").asc), lit(1L))
    try rt.count() shouldBe 0L finally release()
    // empty scored frame: the 1-row auc report with NULL verdicts
    val (a, relA) = ModelEval.aucReleasable(
      Seq.empty[(Double, Boolean)].toDF("s", "y"), "s", "y")
    try {
      val row = a.collect().head
      row.isNullAt(0) shouldBe true
      row.isNullAt(2) shouldBe true
    } finally relA()
  }

  test("late-round-13 ops survive empty inputs: privacy trio, quality " +
    "screens, embedding ops, media dedup, trigram LM") {
    import spark.implicits._
    val emptyTab = Seq.empty[(String, Long, String)]
      .toDF("qi", "k2", "sensitive")
    Privacy.tClosenessReport(emptyTab, Seq("qi", "k2"), "sensitive",
      t = 0.2).collect().head.getBoolean(5) shouldBe true
    Diagnostics.benford(Seq.empty[Double].toDF("x"), "x")
      .count() shouldBe 9L // the digit frame survives, all n = 0
    Diagnostics.functionalDependencies(emptyTab,
      Seq("qi" -> "sensitive")).collect().head.getBoolean(5) shouldBe true
    val emptyVecs = Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    Similarity.embeddingOutliers(emptyVecs, "vec_id", "embedding", 5)
      .count() shouldBe 0L
    Similarity.semanticContamination(emptyVecs, emptyVecs, "vec_id",
      "embedding", 0.9).count() shouldBe 0L
    Similarity.hardNegatives(
      emptyVecs.withColumn("label", lit("x")), "vec_id", "embedding",
      "label", 3).count() shouldBe 0L
    val emptyBlobs2 = Seq.empty[(Long, Array[Byte])].toDF("id", "blob")
    Media.imagePHashes(emptyBlobs2, "id", "blob").count() shouldBe 0L
    Media.pHashNearDups(emptyBlobs2, "id", "blob").count() shouldBe 0L
    Media.videoNearDups(emptyBlobs2, "id", "blob").count() shouldBe 0L
    // a corrupt-only video corpus yields zero pairs, not a crash
    Media.videoNearDups(Seq((1L, "junk".getBytes)).toDF("id", "blob"),
      "id", "blob").count() shouldBe 0L
    TextOps.trigramPerplexity(emptyDocs, "id", "text").count() shouldBe 0L
    // empty input: the 1-row-per-feature report survives with NULL
    // stats (same contract as categoricalAssociation on no pairs)
    val rel = Stats.featureRelevance(emptyTab, Seq("qi"), "sensitive")
      .collect().head
    rel.getString(0) shouldBe "qi"
    rel.isNullAt(4) shouldBe true
  }
}
