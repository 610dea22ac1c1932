package graft

import java.{util => ju}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profile.ProfileSession
import graft.python.PyBridge

/** The Py4J gateway surface (graft.python.PyBridge) must stay callable with
  * plain-Java argument shapes (java.util.List, nullable String) — exactly
  * what pyspark's gateway sends — and produce the same frames as the Scala
  * API. The Python side itself is exercised end-to-end by
  * python/tests/test_facade.py.
  */
class PyBridgeSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def orders: DataFrame = spark.read.parquet(s"$sfDir/orders.parquet")

  private def jList(xs: String*): ju.List[String] = {
    val l = new ju.ArrayList[String]()
    xs.foreach(l.add)
    l
  }

  test("bridge groupBy(java list) equals Scala varargs session") {
    val viaBridge = PyBridge.newProfilingSession(orders, "p")
      .groupBy(jList("o_orderstatus"))
      .aggProfiles()
      .select(col("o_orderstatus"), col("o_totalprice.count"),
        col("o_totalprice.numbers.mean"))
      .collect().map(_.toSeq).toSet
    val viaScala = ProfileSession(orders, "p")
      .groupBy("o_orderstatus")
      .aggProfiles()
      .select(col("o_orderstatus"), col("o_totalprice.count"),
        col("o_totalprice.numbers.mean"))
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should not be empty
  }

  test("timestamped aggProfiles carries the wire column; tags ride it") {
    val wire = PyBridge.newProfilingSession(orders, "wire")
      .groupBy(jList("o_orderstatus"))
      .withTag("env", "test")
      .aggProfiles(1700000000000L)
    wire.columns should contain("why_profile")
    val bytes = wire.select("why_profile").head.getAs[Array[Byte]](0)
    val msg = graft.io.ProfileProto.fromBytes(bytes)
    msg.tags should contain(graft.io.ProfileProto.TagPrefix + "env" -> "test")
    msg.sessionTimestamp shouldBe 1700000000000L
  }

  test("null / empty scoreField routes to the score-less confusion matrix") {
    val labeled = orders.select(
      (col("o_totalprice") > 150000).cast("string").as("t"),
      (col("o_totalprice") > 140000).cast("string").as("p"))
    // Py4J sends null for python None
    val viaNull = PyBridge.newProfilingSession(labeled, "m")
      .withClassificationModel("p", "t", null)
      .aggProfiles()
    viaNull.columns should contain("classification_metrics")
    viaNull.count() shouldBe 1L
  }

  test("mergeProfiles with an empty java list is the global rollup") {
    val per = PyBridge.newProfilingSession(orders, "m")
      .groupBy(jList("o_orderstatus")).aggProfiles()
    val merged = PyBridge.mergeProfiles(per, new ju.ArrayList[String]())
    val n = merged.select(col("o_totalprice.count")).head.getLong(0)
    n shouldBe orders.filter(col("o_totalprice").isNotNull).count()
  }

  test("estimateSegments accepts null target and returns a java list") {
    val segs = PyBridge.estimateSegments(orders, null, 30)
    segs shouldBe a[ju.List[_]]
    segs.forEach(s => orders.columns should contain(s))
  }

  private def documents: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  test("bridge lang-ID train+score equals the Scala two-step path") {
    val docs = documents.select(col("doc_id"), col("text"), col("lang"))
      .filter(col("lang").isin("en", "de")).limit(120)
    val viaBridge = PyBridge.trainAndScoreLangId(docs, docs, "doc_id",
        "text", "lang", jList("de", "en"), 1024, 1, 1.0)
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(_.toSeq).toSet
    val models = graft.ops.TextOps.trainLangIdOneVsRest(docs, "text",
      "lang", Seq("de", "en"), 1024, 1, 1.0)
    val viaScala = graft.ops.TextOps.langIdTrained(docs, "doc_id", "text",
        models, 1024)
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should not be empty
  }

  test("bridge image hashes + near-dup pairs run end to end") {
    import spark.implicits._
    val base = graft.ops.Media.synthesizePpm(7L)
    val df = ((0L until 20L).map(id =>
      (id, graft.ops.Media.synthesizePpm(id))) ++
      Seq((500L, base.clone()))).toDF("id", "blob")
    val hashes = PyBridge.imageHashes(df, "id", "blob")
    hashes.columns.toSeq shouldBe Seq("id", "ahash", "dhash")
    hashes.count() shouldBe 21L
    val pairs = PyBridge.imageHashNearDups(df, "id", "blob", 3, true, 10000,
      100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    pairs((7L, 500L)) shouldBe 0
    PyBridge.imagePHashes(df, "id", "blob").columns.toSeq shouldBe
      Seq("id", "phash")
    val ppairs = PyBridge.pHashNearDups(df, "id", "blob", 0, 10000, 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    ppairs((7L, 500L)) shouldBe 0
    val vids = Seq(
      (1L, graft.ops.Media.synthesizeGvid(1L, 3)),
      (2L, graft.ops.Media.synthesizeGvid(1L, 3)),
      (3L, graft.ops.Media.synthesizeGvid(9L, 4))).toDF("id", "blob")
    PyBridge.videoNearDups(vids, "id", "blob", 1, 1, 10000)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Media.videoNearDups(vids, "id", "blob", 1, 1, 10000)
        .collect().map(_.toSeq).toSet
  }

  test("bridge wavWindowStats equals the Scala call") {
    import spark.implicits._
    val blob = graft.ops.Media.encodeWavPcm16(8000, 1,
      Array.tabulate[Short](100)(i => if (i % 4 < 2) 900 else -900))
    val df = Seq((1L, blob)).toDF("id", "blob")
    val viaBridge = PyBridge.wavWindowStats(df, "id", "blob", 25)
      .collect().map(_.toSeq).toSet
    val viaScala = graft.ops.Media.wavWindowStats(df, "id", "blob", 25)
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should have size 4
  }

  test("bridge stored-novelty write + score equals the two-frame form") {
    val docs = documents.select(col("doc_id"), col("text")).limit(200)
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val probe = docs.filter(col("doc_id") % 3 =!= 0)
    PyBridge.writeNoveltyReference(ref, "text", 8,
      "graft_pybridge_novelty_ref", 4)
    val viaStore = PyBridge.ngramNoveltyStored(probe,
        "graft_pybridge_novelty_ref", "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    val direct = graft.ops.TextOps.ngramNovelty(probe, ref, "doc_id",
        "text", 8)
      .collect().map(_.toSeq).toSet
    viaStore shouldBe direct
    viaStore should not be empty
  }

  test("bridge broadcast novelty equals the two-frame form") {
    val docs = documents.select(col("doc_id"), col("text")).limit(200)
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val probe = docs.filter(col("doc_id") % 3 =!= 0)
    val viaBridge = PyBridge.noveltyScoreBroadcast(probe, ref, "doc_id",
        "text", 8)
      .collect().map(_.toSeq).toSet
    val direct = graft.ops.TextOps.ngramNovelty(probe, ref, "doc_id",
        "text", 8)
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe direct
  }

  test("bridge bloom novelty equals the exact form at a generous " +
    "filter size") {
    val docs = documents.select(col("doc_id"), col("text")).limit(200)
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val probe = docs.filter(col("doc_id") % 3 =!= 0)
    val viaBloom = PyBridge.noveltyScoreBloom(probe, ref, "doc_id",
        "text", 8, 1L << 22, 5)
      .collect().map(_.toSeq).toSet
    val direct = graft.ops.TextOps.ngramNovelty(probe, ref, "doc_id",
        "text", 8)
      .collect().map(_.toSeq).toSet
    viaBloom shouldBe direct
  }

  test("bridge privacy screens equal the Scala calls") {
    import scala.jdk.CollectionConverters._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val qi = List("o_orderstatus", "o_custkey").asJava
    PyBridge.kAnonymityReport(orders, qi, 3L).collect().toSeq shouldBe
      graft.ops.Privacy.kAnonymityReport(orders,
        Seq("o_orderstatus", "o_custkey"), 3L).collect().toSeq
    PyBridge.kAnonymityViolations(orders, qi, 3L, 10)
      .collect().toSeq shouldBe
      graft.ops.Privacy.kAnonymityViolations(orders,
        Seq("o_orderstatus", "o_custkey"), 3L, 10).collect().toSeq
    PyBridge.lDiversityReport(orders, qi, "o_orderpriority", 2L)
      .collect().toSeq shouldBe
      graft.ops.Privacy.lDiversityReport(orders,
        Seq("o_orderstatus", "o_custkey"), "o_orderpriority", 2L)
        .collect().toSeq
    PyBridge.tClosenessReport(orders, qi, "o_orderpriority", 0.2)
      .collect().toSeq shouldBe
      graft.ops.Privacy.tClosenessReport(orders,
        Seq("o_orderstatus", "o_custkey"), "o_orderpriority", 0.2)
        .collect().toSeq
  }

  test("bridge quality screens (benford, functional deps) equal the " +
    "Scala calls") {
    import scala.jdk.CollectionConverters._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    PyBridge.benford(orders, "o_totalprice").collect().toSeq shouldBe
      graft.ops.Diagnostics.benford(orders, "o_totalprice")
        .collect().toSeq
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    PyBridge.embeddingOutliers(embs, "vec_id", "embedding", 5)
      .collect().toSeq shouldBe
      graft.ops.Similarity.embeddingOutliers(embs, "vec_id",
        "embedding", 5).collect().toSeq
    val ev = embs.filter(col("vec_id") >= 490)
    PyBridge.semanticContamination(embs, ev, "vec_id", "embedding",
      0.99).collect().map(_.toSeq).toSet shouldBe
      graft.ops.Similarity.semanticContamination(embs, ev, "vec_id",
        "embedding", 0.99).collect().map(_.toSeq).toSet
    PyBridge.semanticDecontaminate(embs, ev, "vec_id", "embedding",
      0.99).count() shouldBe
      graft.ops.Similarity.semanticDecontaminate(embs, ev, "vec_id",
        "embedding", 0.99).count()
    PyBridge.hardNegatives(embs.limit(50), "vec_id", "embedding",
      "label", 2).collect().map(_.toSeq).toSet shouldBe
      graft.ops.Similarity.hardNegatives(embs.limit(50), "vec_id",
        "embedding", "label", 2).collect().map(_.toSeq).toSet
    PyBridge.functionalDependencies(orders,
      List("o_orderkey", "o_custkey").asJava,
      List("o_custkey", "o_orderpriority").asJava)
      .collect().toSeq shouldBe
      graft.ops.Diagnostics.functionalDependencies(orders,
        Seq("o_orderkey" -> "o_custkey",
          "o_custkey" -> "o_orderpriority")).collect().toSeq
    PyBridge.featureRelevance(orders,
      List("o_orderpriority").asJava, "o_orderstatus")
      .collect().toSeq shouldBe
      graft.ops.Stats.featureRelevance(orders,
        Seq("o_orderpriority"), "o_orderstatus").collect().toSeq
  }

  test("bridge model-eval additions (brier, lift table) equal the " +
    "Scala calls") {
    val scored = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("(vec_id % 97) / 96.0 AS s", "label >= 5 AS y")
    PyBridge.brierScore(scored, "s", "y").collect().toSeq shouldBe
      graft.ops.ModelEval.brierScore(scored, "s", "y").collect().toSeq
    PyBridge.liftTable(scored, "s", "y", 10)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.ModelEval.liftTable(scored, "s", "y", 10)
        .collect().map(_.toSeq).toSet
  }

  test("bridge audio fingerprint + near-dups equal the Scala calls") {
    import spark.implicits._
    val df = ((0L until 10L).map(i =>
      (i, graft.ops.Media.synthesizeWavNoise(i))) ++
      (0L until 4L).map(i =>
        (i + 100L, graft.ops.Media.synthesizeWavNoise(i))))
      .toDF("id", "blob")
    val viaBridge = PyBridge.audioNearDups(df, "id", "blob", 16, 2, 10000)
      .collect().map(_.toSeq).toSet
    val direct = graft.ops.Media.audioNearDups(df, "id", "blob",
        windowFrames = 16, minSharedBlocks = 2)
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe direct
    viaBridge.map(r => (r(0), r(1))) shouldBe
      (0L until 4L).map(i => (i, i + 100L)).toSet
    PyBridge.audioFingerprints(df, "id", "blob", 16).count() should be > 0L
  }

  test("bridge encodingProfile equals the Scala struct flattened") {
    val docs = documents.select(col("doc_id"), col("text")).limit(50)
    val viaBridge = PyBridge.encodingProfile(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val direct = docs.select(col("doc_id"),
        graft.ops.TextOps.encodingProfile(col("text")).as("p"))
      .select(col("doc_id"), col("p.*"))
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe direct
    viaBridge should not be empty
  }

  test("bridge doremiWeights equals the Scala call") {
    import spark.implicits._
    val df = Seq(("a", 2.0, 1.0), ("b", 1.0, 1.5), ("c", 3.0, 1.0))
      .toDF("dom", "lp", "lr")
    val viaBridge = PyBridge.doremiWeights(df, "dom", "lp", "lr",
      1.0, 10, 0.1).collect().map(_.toSeq).toSet
    val viaScala = graft.ops.Sampling.doremiWeights(df, "dom", "lp", "lr",
      1.0, 10, 0.1).collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should have size 3
  }

  test("bridge funnelDepth equals the Scala call") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val viaBridge = PyBridge.funnelDepth(ev, "user_id", "ts",
        "event_type", jList("view", "click", "purchase"),
        jList("event_id"))
      .collect().map(_.toSeq).toSet
    val viaScala = graft.ops.Funnel.depth(ev, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), Seq("event_id"))
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should not be empty
  }

  test("bridge retentionCohorts and eventTransitions equal the Scala " +
    "calls") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    PyBridge.retentionCohorts(ev, "user_id", "ts")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Retention.cohorts(ev, "user_id", "ts")
        .collect().map(_.toSeq).toSet
    PyBridge.eventTransitions(ev, "user_id", "ts", "event_type",
        jList("event_id"))
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Funnel.transitions(ev, "user_id", "ts", "event_type",
        Seq("event_id"))
        .collect().map(_.toSeq).toSet
  }

  test("bridge applyMixtureWeights equals the Scala call") {
    import spark.implicits._
    val df = ((1L to 500L).map(i => (i, "a")) ++
      (1001L to 1100L).map(i => (i, "b"))).toDF("id", "dom")
    val w = Seq(("a", 0.5), ("b", 0.5)).toDF("domain", "weight")
    val viaBridge = PyBridge.applyMixtureWeights(df, "dom", "id", w,
      0.3, "domain", "weight").collect().map(_.toSeq).toSet
    val viaScala = graft.ops.Sampling.applyMixtureWeights(df, "dom", "id",
      w, 0.3).collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should not be empty
  }

  test("bridge percentileRanks/percentileRank equal the Scala calls") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_quantity"))
    PyBridge.percentileRanks(li, "l_quantity", jList("l_returnflag"),
        "pct_rank")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.FeatureScale.percentileRanks(li, "l_quantity",
        Seq("l_returnflag")).collect().map(_.toSeq).toSet
    PyBridge.percentileRank(li, "l_quantity", jList(), "pr")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.FeatureScale.percentileRank(li, "l_quantity",
        outCol = "pr").collect().map(_.toSeq).toSet
  }

  test("bridge embeddingDrift + byDim equal the Scala calls") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cur = emb.filter(col("label") >= 5)
    val ref = emb.filter(col("label") < 5)
    PyBridge.embeddingDrift(cur, ref, "embedding")
      .collect().map(_.toSeq) shouldBe
      graft.ops.Drift.embeddingDrift(cur, ref, "embedding")
        .collect().map(_.toSeq)
    PyBridge.embeddingDriftByDim(cur, ref, "embedding")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Drift.embeddingDriftByDim(cur, ref, "embedding")
        .collect().map(_.toSeq).toSet
  }

  test("bridge manifest write + pruned read and decayed scores equal " +
    "the Scala calls") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val layout = java.nio.file.Files
      .createTempDirectory("graft_pybridge_layout").toString
    graft.io.ZOrderLayout.writeZOrdered(li, Seq("l_quantity"), layout,
      bits = 8, numFiles = 4)
    val manifest = java.nio.file.Files
      .createTempDirectory("graft_pybridge_manifest").toString
    PyBridge.writeManifest(spark, layout, jList("l_quantity"), manifest)
    val pruned = PyBridge.prunedRead(spark, layout, manifest,
      "l_quantity", 5.0, 10.0)
    pruned.count() shouldBe
      li.filter(col("l_quantity").between(5.0, 10.0)).count()

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    PyBridge.decayedScore(ev, "user_id", "ts", "value", 3600.0)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.EventStats.decayedScore(ev, "user_id", "ts", "value",
        3600.0).collect().map(_.toSeq).toSet
    PyBridge.decayedCount(ev, "user_id", "ts", 3600.0)
      .count() should be > 0L
  }

  test("bridge association stats, pagerank, and label-noise mirror the " +
    "Scala API") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    PyBridge.corrMatrix(li, jList("l_quantity", "l_extendedprice"))
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Stats.corrMatrix(li,
        Seq("l_quantity", "l_extendedprice"))
        .collect().map(_.toSeq).toSet
    PyBridge.categoricalAssociation(orders, "o_orderstatus",
      "o_orderpriority").collect().map(_.toSeq).toSet shouldBe
      graft.ops.Stats.categoricalAssociation(orders, "o_orderstatus",
        "o_orderpriority").collect().map(_.toSeq).toSet
    // empty weightCol string (pyspark's None) routes to unweighted
    import spark.implicits._
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("s", "d")
    PyBridge.pageRank(e, "s", "d", "", 3, 0.85)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Graph.pageRank(e, "s", "d", None, 3, 0.85)
        .collect().map(_.toSeq).toSet
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 60)
    PyBridge.knnLabelNoise(emb, "vec_id", "embedding", "label", 5)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Similarity.knnLabelNoise(emb, "vec_id", "embedding",
        "label", 5).collect().map(_.toSeq).toSet
  }

  test("bridge source overlap and rolling windows equal the Scala calls") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    PyBridge.sourceOverlap(docs, "source", "text", 8)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.TextOps.sourceOverlap(docs, "source", "text", 8)
        .collect().map(_.toSeq).toSet
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    PyBridge.rollingWindowStats(ev, "user_id", "ts", "value", 3600L)
      .count() shouldBe ev.count()
  }

  test("bridge fuzzy join, trending, attribution, label propagation " +
    "mirror the Scala API") {
    import spark.implicits._
    val l = Seq((1L, "smith"), (2L, "jones")).toDF("id", "name")
    val r = Seq((10L, "smyth"), (11L, "bones")).toDF("id", "name")
    PyBridge.fuzzyJoin(l, r, "id", "name", 1, 1, true)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Joins.fuzzyJoin(l, r, "id", "name", 1)
        .collect().map(_.toSeq).toSet
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    PyBridge.trendingItems(ev, "ts", "event_type", 14400L, 3)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.EventStats.trendingItems(ev, "ts", "event_type",
        14400L, 3).collect().map(_.toSeq).toSet
    PyBridge.touchAttribution(ev, "user_id", "ts", "event_type",
      "event_id", jList("view", "click"), "purchase", 3600L)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.EventStats.touchAttribution(ev, "user_id", "ts",
        "event_type", "event_id", Seq("view", "click"), "purchase",
        3600L).collect().map(_.toSeq).toSet
    val e = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("s", "d")
    PyBridge.labelPropagation(e, "s", "d", 3)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Graph.labelPropagation(e, "s", "d", 3)
        .collect().map(_.toSeq).toSet
  }

  test("bridge kmeans, burstiness, concentration, zipf mirror the " +
    "Scala API") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    PyBridge.kmeansClusters(emb, "vec_id", "embedding", 4, 1)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Similarity.kmeansClusters(emb, "vec_id", "embedding",
        4, 1).collect().map(_.toSeq).toSet
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    PyBridge.interArrivalStats(ev, "user_id", "ts")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.EventStats.interArrivalStats(ev, "user_id", "ts")
        .collect().map(_.toSeq).toSet
    // empty valueCol string (pyspark's None) routes to count weights
    PyBridge.concentration(ev, "user_id", "")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.EventStats.concentration(ev, "user_id", None)
        .collect().map(_.toSeq).toSet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    PyBridge.zipfFit(docs, "text", 50)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.TextOps.zipfFit(docs, "text", 50)
        .collect().map(_.toSeq).toSet
  }

  test("bridge degree and triangle stats mirror the Scala API") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    PyBridge.degreeStats(e, "s", "d").collect().map(_.toSeq).toSet shouldBe
      graft.ops.Graph.degreeStats(e, "s", "d")
        .collect().map(_.toSeq).toSet
    PyBridge.triangleStats(e, "s", "d").collect().map(_.toSeq) shouldBe
      graft.ops.Graph.triangleStats(e, "s", "d").collect().map(_.toSeq)
  }

  test("bridge cusum and corpusDiff mirror the Scala API") {
    import spark.implicits._
    val series = (0 until 12).map(i =>
      ("m", i.toLong, if (i < 8) 5.0 else 9.0)).toDF("g", "t", "v")
    PyBridge.cusum(series, jList("g"), "t", "v", 0.5, 4.0)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Drift.cusum(series, Seq("g"), "t", "v", 0.5, 4.0)
        .collect().map(_.toSeq).toSet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val newer = docs.filter(col("doc_id") % 2 === 0)
    PyBridge.corpusDiff(docs, newer, "doc_id", jList("text"))
      .collect().map(_.toSeq) shouldBe
      graft.ops.Diagnostics.corpusDiff(docs, newer, "doc_id",
        Seq("text")).collect().map(_.toSeq)
  }

  test("bridge bloom manifest + lookup reads mirror the Scala API") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val layout = java.nio.file.Files
      .createTempDirectory("graft_pybridge_bloom").toString
    graft.io.ShardWriter.writeShards(li, "l_orderkey", 4, layout)
    val man = java.nio.file.Files
      .createTempDirectory("graft_pybridge_bloom_man").toString
    PyBridge.writeBloomManifest(spark, layout, "l_orderkey", man,
      1L << 20, 5)
    val key = li.select("l_orderkey").head.getLong(0)
    PyBridge.lookupRead(spark, layout, man, "l_orderkey", key)
      .count() shouldBe li.filter(col("l_orderkey") === key).count()
  }

  test("bridge basket pairs and model eval mirror the Scala API") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    PyBridge.basketCoOccurrence(li, "l_orderkey", "l_suppkey", 2L)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Baskets.coOccurrence(li, "l_orderkey", "l_suppkey", 2L)
        .collect().map(_.toSeq).toSet
    val scored = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("(vec_id % 7) / 6.0 AS s", "label >= 5 AS y")
    PyBridge.auc(scored, "s", "y").collect().map(_.toSeq) shouldBe
      graft.ops.ModelEval.auc(scored, "s", "y").collect().map(_.toSeq)
    PyBridge.calibrationReport(scored, "s", "y", 10)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.ModelEval.calibrationReport(scored, "s", "y", 10)
        .collect().map(_.toSeq).toSet
    PyBridge.ece(scored, "s", "y", 10).collect().map(_.toSeq) shouldBe
      graft.ops.ModelEval.ece(scored, "s", "y", 10)
        .collect().map(_.toSeq)
  }

  test("bridge data-quality trio mirrors the Scala API") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    PyBridge.joinSizeEstimate(orders, li, jList("o_orderkey"),
      jList("l_orderkey")).collect().map(_.toSeq) shouldBe
      graft.ops.Diagnostics.joinSizeEstimate(orders, li,
        Seq("o_orderkey"), Seq("l_orderkey")).collect().map(_.toSeq)
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
    PyBridge.referentialIntegrity(li, jList("l_suppkey"), supp,
      jList("s_suppkey")).collect().map(_.toSeq) shouldBe
      graft.ops.Validation.referentialIntegrity(li, Seq("l_suppkey"),
        supp, Seq("s_suppkey")).collect().map(_.toSeq)
    PyBridge.uniquenessReport(li, jList("l_orderkey"))
      .collect().map(_.toSeq) shouldBe
      graft.ops.Validation.uniquenessReport(li, Seq("l_orderkey"))
        .collect().map(_.toSeq)
  }

  test("bridge length buckets and interleave mirror the Scala API") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bounds = new ju.ArrayList[java.lang.Number]()
    // Py4J sends small python ints as Integer — exercise that shape
    Seq[java.lang.Number](Integer.valueOf(128), Integer.valueOf(256),
      java.lang.Long.valueOf(512L)).foreach(bounds.add)
    PyBridge.lengthBuckets(docs, "n_chars", bounds)
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Packing.lengthBuckets(docs, "n_chars",
        Seq(128L, 256L, 512L)).collect().map(_.toSeq).toSet
    PyBridge.interleaveSources(docs, "source", "doc_id")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Sampling.interleaveSources(docs, "source", "doc_id")
        .collect().map(_.toSeq).toSet
  }

  test("bridge blocklist and domain stats mirror the Scala API") {
    val docs = documents.select(col("doc_id"), col("text"))
    PyBridge.blocklistReport(docs, "doc_id", "text", jList("spark"),
      0.05).collect().map(_.toSeq).toSet shouldBe
      graft.ops.TextOps.blocklistReport(docs, "doc_id", "text",
        Seq("spark"), 0.05).collect().map(_.toSeq).toSet
    val withUrls = docs.withColumn("text",
      concat(col("text"), lit(" http://d.example/x")))
    PyBridge.urlDomainStats(withUrls, "doc_id", "text")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.TextOps.urlDomainStats(withUrls, "doc_id", "text")
        .collect().map(_.toSeq).toSet
  }

  test("bridge personalized pagerank and hits mirror the Scala API") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val seeds = Seq("a").toDF("seed")
    PyBridge.personalizedPageRank(e, "s", "d", seeds, "seed", "", 3,
      0.85).collect().map(_.toSeq).toSet shouldBe
      graft.ops.Graph.personalizedPageRank(e, "s", "d", seeds, "seed",
        None, 3, 0.85).collect().map(_.toSeq).toSet
    PyBridge.hits(e, "s", "d", 2).collect().map(_.toSeq).toSet shouldBe
      graft.ops.Graph.hits(e, "s", "d", 2)
        .collect().map(_.toSeq).toSet
  }

  test("bridge z-order key + layout write run end to end") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("l_quantity"))
    PyBridge.withZKey(li, jList("l_extendedprice", "l_quantity"), 8)
      .collect().map(_.toSeq).toSet shouldBe
      graft.io.ZOrderLayout.withZKey(li,
        Seq("l_extendedprice", "l_quantity"), 8)
        .collect().map(_.toSeq).toSet
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_pybridge_zorder").toString
    PyBridge.writeZOrdered(li, jList("l_extendedprice", "l_quantity"),
      tmp, 8, 4)
    spark.read.parquet(tmp).count() shouldBe li.count()
  }

  test("bridge readability / pmi / bpe mirror the Scala API") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
    PyBridge.readability(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet shouldBe
      docs.select(col("doc_id"),
          graft.ops.TextOps.readability(col("text")).as("r"))
        .select(col("doc_id"), col("r.*"))
        .collect().map(_.toSeq).toSet
    PyBridge.pmiCollocations(docs, "text", 2, 10)
      .collect().map(_.toSeq) shouldBe
      graft.ops.TextOps.pmiCollocations(docs, "text", 2, 10)
        .collect().map(_.toSeq)
    val merges = PyBridge.bpeTrain(docs, "text", 3)
    merges.collect().map(_.toSeq) shouldBe
      graft.ops.Tokenizer.bpeTrain(docs, "text", 3)
        .collect().map(_.toSeq)
    val enc = PyBridge.bpeEncode(docs, "doc_id", "text", merges)
    enc.columns.toSeq shouldBe Seq("doc_id", "n_pieces")
    enc.count() shouldBe docs.count()
  }

  test("bridge covariance / pca mirror the Scala API") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(80)
    PyBridge.embedCovMatrix(emb, "embedding")
      .collect().map(_.toSeq).toSet shouldBe
      graft.ops.Pca.covMatrix(emb, "embedding")
        .collect().map(_.toSeq).toSet
    val proj = PyBridge.pcaProject(emb, "embedding", 4)
    proj.columns should contain("pca")
    proj.select(org.apache.spark.sql.functions.size(col("pca"))).distinct()
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(4)
    val ev = PyBridge.pcaExplainedVariance(emb, "embedding").collect()
    ev.map(_.getDouble(2)).sum shouldBe 1.0 +- 1e-9
  }

  private def jDoubles(xs: Double*): ju.List[java.lang.Double] = {
    val l = new ju.ArrayList[java.lang.Double]()
    xs.foreach(x => l.add(java.lang.Double.valueOf(x)))
    l
  }

  // the bridge is a pass-through, but double-summing aggregates are
  // only reproducible to ~1e-15 relative across runs (partition order
  // varies) — normalize doubles before the set compare
  private def same(a: DataFrame, b: DataFrame): Unit = {
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map {
        case d: Double => math.round(d * 1e6) / 1e6
        case x => x
      }).toSet
    norm(a.collect()) shouldBe norm(b.collect())
  }

  test("bridge round-13 model-eval / ranking methods mirror the " +
    "Scala API") {
    val scored = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "(vec_id % 7) / 6.0 AS s",
        "label >= 5 AS y", "vec_id % 5 AS q",
        "greatest(0, label - 6) AS rel")
    same(PyBridge.averagePrecision(scored, "s", "y"),
      graft.ops.ModelEval.averagePrecision(scored, "s", "y"))
    same(PyBridge.thresholdReport(scored, "s", "y", jDoubles(0.3, 0.7)),
      graft.ops.ModelEval.thresholdReport(scored, "s", "y",
        Seq(0.3, 0.7)))
    same(PyBridge.rankingReport(scored, "q", "vec_id", "s", "rel", 5),
      graft.ops.ModelEval.rankingReport(scored, "q", "vec_id", "s",
        "rel", 5))
  }

  test("bridge round-13 experimentation methods mirror the Scala API") {
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .selectExpr("s_suppkey", "s_acctbal", "s_nationkey",
        "CASE WHEN s_nationkey < 12 THEN 'a' ELSE 'b' END AS g",
        "s_acctbal > 0 AS conv")
    same(PyBridge.welchTTest(sup, "g", "s_acctbal", "a", "b"),
      graft.ops.Stats.welchTTest(sup, "g", "s_acctbal", "a", "b"))
    same(PyBridge.welchTTestBy(sup, jList("s_nationkey"), "g",
      "s_acctbal", "a", "b"),
      graft.ops.Stats.welchTTestBy(sup, Seq("s_nationkey"), "g",
        "s_acctbal", "a", "b"))
    same(PyBridge.mannWhitney(sup, "g", "s_acctbal", "a", "b"),
      graft.ops.Stats.mannWhitney(sup, "g", "s_acctbal", "a", "b"))
    same(PyBridge.proportionTest(sup, "g", "conv", "a", "b"),
      graft.ops.Stats.proportionTest(sup, "g", "conv", "a", "b"))
    same(PyBridge.cuped(sup, "s_acctbal", "s_nationkey", "adj"),
      graft.ops.Stats.cuped(sup, "s_acctbal", "s_nationkey", "adj"))
    same(PyBridge.srmCheck(sup, "g", jList("a", "b"),
      jDoubles(1.0, 1.0)),
      graft.ops.Stats.srmCheck(sup, "g",
        Seq("a" -> 1.0, "b" -> 1.0)))
    same(PyBridge.simpsonCheck(sup, "conv", "s_acctbal", "g"),
      graft.ops.Stats.simpsonCheck(sup, "conv", "s_acctbal", "g"))
    same(PyBridge.trimmedMean(sup, "s_acctbal", 0.1, 0.9),
      graft.ops.Stats.trimmedMean(sup, "s_acctbal", 0.1, 0.9))
    same(PyBridge.quantileTreatmentEffects(sup, "g", "s_acctbal",
      jDoubles(0.5), "a", "b"),
      graft.ops.Stats.quantileTreatmentEffects(sup, "g", "s_acctbal",
        Seq(0.5), "a", "b"))
    same(PyBridge.agreementReport(sup, "g", "conv"),
      graft.ops.Stats.agreementReport(sup, "g", "conv"))
    val units = sup.selectExpr("g", "s_acctbal AS x",
      "abs(s_acctbal) + 1.0 AS y")
    same(PyBridge.ratioTest(units, "g", "x", "y", "a", "b"),
      graft.ops.Stats.ratioTest(units, "g", "x", "y", "a", "b"))
  }

  test("bridge round-13 series / quantile / linkage / checksum " +
    "methods mirror the Scala API") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    same(PyBridge.eventSeries(ev, "ts", 3600L),
      graft.ops.EventStats.eventSeries(ev, "ts", 3600L))
    same(PyBridge.eventAcf(ev, "ts", 3600L, 3),
      graft.ops.EventStats.eventAcf(ev, "ts", 3600L, 3))
    val series = graft.ops.EventStats.eventSeries(ev, "ts", 3600L)
    same(PyBridge.acf(series, "t", "n", 2),
      graft.ops.EventStats.acf(series, "t", "n", 2))
    same(PyBridge.decompose(series, "t", "n", 24, 6),
      graft.ops.EventStats.decompose(series, "t", "n", 24, 6))
    same(PyBridge.seasonalAnomalies(series, "t", "n", 24, 6, 2.0),
      graft.ops.EventStats.seasonalAnomalies(series, "t", "n", 24, 6,
        2.0))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    same(PyBridge.exactQuantiles(li, "l_quantity", jDoubles(0.5, 0.9),
      jList()),
      graft.ops.FeatureScale.exactQuantiles(li, "l_quantity",
        Seq(0.5, 0.9)))
    same(PyBridge.weightedQuantiles(li, "l_quantity",
      "l_linenumber", jDoubles(0.5), jList()),
      graft.ops.FeatureScale.weightedQuantiles(li, "l_quantity",
        col("l_linenumber"), Seq(0.5)))
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .selectExpr("p_partkey AS id", "p_name AS key",
        "p_partkey % 10 AS blk")
    same(PyBridge.nameMatchPairs(part, part, "id", "key", 0.95, 2, 4),
      graft.ops.Joins.nameMatchPairs(part, part, "id", "key", 0.95,
        2, 4))
    same(PyBridge.nameMatchPairsBlocked(part, part, "id", "key",
      "blk", 0.95),
      graft.ops.Joins.nameMatchPairsBlocked(part, part, "id", "key",
        "blk", 0.95))
    same(PyBridge.tableChecksum(li, jList("l_orderkey", "l_returnflag")),
      graft.ops.Diagnostics.tableChecksum(li,
        Seq("l_orderkey", "l_returnflag")))
  }
}
