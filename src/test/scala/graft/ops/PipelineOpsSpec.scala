package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Pinned-value and invariance tests for the pipeline utility operators
  * (sessionize / deterministic sampling / IQR outliers / PII / tf-idf).
  */
class PipelineOpsSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("sessionize splits on gaps and counts per-session events") {
    import spark.implicits._
    // user 1: events at t=0,10,20 then 100 (gap>30) -> two sessions
    // user 2: single event -> one session
    val ev = Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 100L), (2L, 5L))
      .toDF("user_id", "t")
    val got = Sessionize.stats(ev, "user_id", "t", gap = 30L)
      .orderBy(col("user_id"), col("session_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    got shouldBe Array(
      (1L, 1L, 3L, 0L, 20L, 20L),
      (1L, 2L, 1L, 100L, 100L, 0L),
      (2L, 1L, 1L, 5L, 5L, 0L))
  }

  test("sessionize boundary: gap exactly equal does NOT split") {
    import spark.implicits._
    val ev = Seq((1L, 0L), (1L, 30L)).toDF("user_id", "t")
    Sessionize.stats(ev, "user_id", "t", gap = 30L).count() shouldBe 1L
  }

  test("sessionize handles TIMESTAMP and TIMESTAMP_NTZ time columns") {
    import spark.implicits._
    val base = Seq((1L, 0L), (1L, 10L), (1L, 100L)).toDF("user_id", "sec")
    for (t <- Seq("timestamp", "timestamp_ntz")) {
      val ev = base.withColumn("ts", timestamp_seconds(col("sec")).cast(t))
      val sessions = Sessionize.stats(ev, "user_id", "ts",
        gap = 30L * 1000000L) // 30s in micros
      sessions.count() shouldBe 2L // 0,10 | 100
    }
  }

  test("sessionize NTZ gaps are immune to a DST-observing session timezone") {
    import spark.implicits._
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // US spring-forward 2026-03-08: 02:00-03:00 local does not exist.
      // Wall-clock gap between the two events is 30 min; a session-tz cast
      // would shift 02:15 across the gap and fake a 90-min split.
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val ev = Seq(
        ("u", "2026-03-08 01:45:00"),
        ("u", "2026-03-08 02:15:00")).toDF("user_id", "s")
        .select(col("user_id"),
          col("s").cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"))
      val sessions = Sessionize.stats(ev, "user_id", "ts",
        gap = 35L * 60L * 1000000L) // 35 min in micros
      sessions.count() shouldBe 1L // one session: the 30-min gap holds
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("topk_agg accepts decimal scores") {
    import spark.implicits._
    val df = Seq((1, "10.50"), (2, "99.99"), (3, "5.00")).toDF("id", "s")
      .select(col("id").cast("long").as("id"),
        col("s").cast("decimal(12,2)").as("score"))
    val top = df.agg(graft.functions.topk_agg(col("score"), col("id"), 2)
      .as("topk"))
      .select(posexplode(col("topk"))).select(col("col.item_id"))
      .collect().map(_.getLong(0))
    top.toSeq shouldBe Seq(2L, 1L)
  }

  test("iqr outlier stats keeps the NULL-key group") {
    import spark.implicits._
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 100.0)) ++
      Seq((null, 5.0), (null, 6.0), (null, 7.0), (null, 10000.0)))
      .toDF("k", "v")
    val rows = Outliers.iqrStats(df, "v", Seq("k")).collect()
    rows.length shouldBe 2
    val nullRow = rows.find(_.isNullAt(0)).get
    nullRow.getAs[Long]("n") shouldBe 4L
    // fences for [5,6,7,10000]: q1=5.75, q3~=2505, hi~=6254 -> 10000 out
    nullRow.getAs[Long]("n_outliers") shouldBe 1L
  }

  test("hash sample is deterministic and partition-invariant") {
    import spark.implicits._
    val df = (1 to 2000).map(_.toLong).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(df.repartition(13), "id", 0.2)
      .collect().map(_.getLong(0)).sorted
    a shouldBe b
    // md5 is uniform: 20% +- a loose tolerance
    a.length.toDouble should (be > 2000 * 0.15 and be < 2000 * 0.25)
    Sampling.hashSample(df, "id", 0.0).count() shouldBe 0L
    Sampling.hashSample(df, "id", 1.0).count() shouldBe 2000L
  }

  test("weighted sample: rate tracks the weight, w>=1 keeps all, w<=0 " +
    "drops all, partition-invariant") {
    import spark.implicits._
    val df = (1 to 4000).map(i =>
      (i.toLong, if (i <= 2000) 0.2 else 1.5)).toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", "w").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // w=1.5 clamps to 1.0: every high-weight row survives
    kept.count(_._2 > 1.0) shouldBe 2000
    // w=0.2: ~20% of the low-weight rows survive
    val low = kept.count(_._2 < 1.0)
    low.toDouble should (be > 2000 * 0.14 and be < 2000 * 0.26)
    // deterministic across partitionings
    Sampling.weightedSample(df.repartition(13), "id", "w")
      .collect().map(_.getLong(0)).toSet shouldBe kept.map(_._1).toSet
    // zero / null weights drop rows
    Sampling.weightedSample(
      df.withColumn("w", lit(0.0)), "id", "w").count() shouldBe 0L
    Sampling.weightedSample(
      df.withColumn("w", lit(null).cast("double")), "id", "w")
      .count() shouldBe 0L
  }

  test("stratified sample: per-stratum rates, subset of hashSample, " +
    "default drops unknown strata") {
    import spark.implicits._
    val df = (1 to 3000).map(i =>
      (i.toLong, Seq("en", "de", "zz")(i % 3))).toDF("id", "lang")
    val got = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.8, "de" -> 0.3)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    byLang.getOrElse("zz", 0) shouldBe 0 // default = 0.0 drops them
    byLang("en").toDouble should (be > 1000 * 0.7 and be < 1000 * 0.9)
    byLang("de").toDouble should (be > 1000 * 0.2 and be < 1000 * 0.4)
    // same hash as hashSample: each stratum's survivors are exactly the
    // plain Bernoulli survivors at that fraction
    val en = Sampling.hashSample(df.filter(col("lang") === "en"), "id", 0.8)
      .collect().map(_.getLong(0)).toSet
    got.filter(_._2 == "en").map(_._1).toSet shouldBe en
    // partition invariance
    val again = Sampling.stratifiedSample(df.repartition(17), "id", "lang",
      Map("en" -> 0.8, "de" -> 0.3)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    again shouldBe got.toSet
  }

  test("capPerKey keeps at most k original rows per key, exactly the " +
    "bottom-k winners") {
    import spark.implicits._
    val df = (1 to 300).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", s"payload$i"))
      .toDF("id", "g", "p")
    val capped = Sampling.capPerKey(df, Seq("g"), "id", 7)
    capped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .values.toSet shouldBe Set(7L)
    // full payload survives and survivors == bottomK ids
    capped.columns.toSeq shouldBe Seq("id", "g", "p")
    val winners = Sampling.bottomK(df, Seq("g"), "id", 7)
      .select("id").collect().map(_.getLong(0)).toSet
    capped.select("id").collect().map(_.getLong(0)).toSet shouldBe winners
  }

  test("bottom-k sample equals the sort-based formulation, any partitioning") {
    import spark.implicits._
    val df = (1 to 500).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("g", "id")
    val fast = Sampling.bottomK(df.repartition(11), Seq("g"), "id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"))
      .orderBy(Sampling.md5Hash52(col("id")).asc, col("id").asc)
    val slow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7).select(col("g"), col("id"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    fast shouldBe slow
    fast.size shouldBe 14
  }

  test("temperatureMix: t=1 matches natural proportions, t->0 flattens, " +
    "survivors are the per-source Bernoulli sets, partition-invariant") {
    import spark.implicits._
    // skewed corpus: web 8000 rows, books 500, code 1500
    val df = (1 to 10000).map { i =>
      val src = if (i <= 8000) "web" else if (i <= 8500) "books" else "code"
      (i.toLong, src)
    }.toDF("id", "source")
    // t=1: rate is targetFraction for every source (weights = sizes)
    val t1 = Sampling.temperatureMix(df, "id", "source", 0.5, temperature = 1.0)
    val by1 = t1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    by1("web").toDouble should (be > 8000 * 0.45 and be < 8000 * 0.55)
    by1("books").toDouble should (be > 500 * 0.4 and be < 500 * 0.6)
    // t=1 survivors per source == hashSample at targetFraction
    val webPlain = Sampling.hashSample(
      df.filter(col("source") === "web"), "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    t1.filter(col("source") === "web").collect().map(_.getLong(0))
      .toSet shouldBe webPlain
    // t=0.5: books (small source) keeps a HIGHER fraction than web
    val t5 = Sampling.temperatureMix(df, "id", "source", 0.5,
      temperature = 0.5)
    val by5 = t5.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val webRate = by5("web") / 8000.0
    val bookRate = by5("books") / 500.0
    bookRate should be > webRate * 2
    // expected rates: w_s = n_s^0.5; rate_s = min(1, f*N*w_s/(wsum*n_s))
    val wsum = math.sqrt(8000.0) + math.sqrt(500.0) + math.sqrt(1500.0)
    def rate(n: Double) =
      math.min(1.0, 0.5 * 10000 * math.sqrt(n) / (wsum * n))
    by5("books").toDouble should
      (be > 500 * rate(500) * 0.8 and be < 500 * rate(500) * 1.2)
    // schema preserved, partition invariance
    t5.columns.toSeq shouldBe Seq("id", "source")
    val again = Sampling.temperatureMix(df.repartition(13), "id", "source",
      0.5, temperature = 0.5).collect().map(_.getLong(0)).toSet
    again shouldBe t5.collect().map(_.getLong(0)).toSet
  }

  test("temperatureMix caps tiny sources at keep-everything (rate 1)") {
    import spark.implicits._
    val df = ((1 to 5000).map(i => (i.toLong, "web")) ++
      (5001 to 5010).map(i => (i.toLong, "gold"))).toDF("id", "source")
    // at t=0.1 the 10-row gold source's target far exceeds its size
    val got = Sampling.temperatureMix(df, "id", "source", 0.5,
      temperature = 0.1)
    got.filter(col("source") === "gold").count() shouldBe 10L
  }

  test("weightedBottomK: weight-proportional winners, deterministic, " +
    "zero/null weights never win") {
    import spark.implicits._
    // two weight classes: heavy rows (w=20) vs light (w=1), 500 each.
    // A-ES selects ~proportional to weight, so heavies dominate the 100
    // winners; exact determinism pinned by the re-run
    val df = (1 to 1000).map { i =>
      val w = if (i <= 500) 20.0 else 1.0
      ("g", i.toLong, w)
    }.toDF("g", "id", "w")
    val got = Sampling.weightedBottomK(df, Seq("g"), "id", "w", k = 100)
      .collect().map(_.getLong(1)).toSet
    got.size shouldBe 100
    val heavies = got.count(_ <= 500)
    heavies.toDouble should be > 75.0 // ~95 expected at 20:1 weights
    // partition invariance / determinism
    val again = Sampling.weightedBottomK(df.repartition(17), Seq("g"),
      "id", "w", k = 100).collect().map(_.getLong(1)).toSet
    again shouldBe got
    // zero/null weights are excluded even when k exceeds the group
    val degenerate = Seq(("g", 1L, 0.0), ("g", 2L, Double.NaN),
      ("g", 3L, 5.0)).toDF("g", "id", "w")
      .withColumn("w", when(col("id") === 2L, lit(null)
        .cast("double")).otherwise(col("w")))
    Sampling.weightedBottomK(degenerate, Seq("g"), "id", "w", k = 5)
      .collect().map(_.getLong(1)).toSeq shouldBe Seq(3L)
  }

  test("temperatureMix gives NULL-source rows their own stratum") {
    import spark.implicits._
    val df = ((1 to 4000).map(i => (i.toLong, Some("web"))) ++
      (4001 to 8000).map(i => (i.toLong, Option.empty[String])))
      .toDF("id", "source")
    val got = Sampling.temperatureMix(df, "id", "source", 0.5,
      temperature = 1.0)
    // NULL sources must not be silently dropped: at t=1 they sample at
    // targetFraction like any other stratum (same Bernoulli set as
    // hashSample over just the NULL rows)
    val nullKept = got.filter(col("source").isNull)
      .collect().map(_.getLong(0)).toSet
    val expected = Sampling.hashSample(
      df.filter(col("source").isNull), "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    nullKept shouldBe expected
    nullKept.size.toDouble should (be > 4000 * 0.4 and be < 4000 * 0.6)
  }

  test("bigramPerplexity rejects lambda=1 with an active floor") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextOps.bigramPerplexity(docs, "doc_id", "text",
        lambda = 1.0, minCount = 2L)
    // lambda=1 without a floor stays legal: the conditional term is exact
    noException should be thrownBy
      TextOps.bigramPerplexity(docs, "doc_id", "text", lambda = 1.0)
  }

  test("tokenBudgetSelect keeps exactly the hash-order prefix that fits, " +
    "never truncates a doc, partition-invariant") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, 1L + i % 13, s"doc$i"))
      .toDF("id", "n_tok", "payload")
    val budget = 800L
    val got = Sampling.tokenBudgetSelect(df, "id", "n_tok", budget)
    got.columns.toSeq shouldBe Seq("id", "n_tok", "payload")
    val gotIds = got.collect().map(_.getLong(0)).toSet
    // oracle: cumulative-inclusive sum over (md5hash52(id), id) order
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(Sampling.md5Hash52(col("id")).asc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val oracle = df.withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= budget).select("id")
      .collect().map(_.getLong(0)).toSet
    gotIds shouldBe oracle
    // sum of kept tokens fits the budget; adding the first excluded doc
    // (in hash order) would overflow it
    val keptSum = df.filter(col("id").isin(gotIds.toSeq: _*))
      .agg(sum("n_tok")).head().getLong(0)
    assert(keptSum <= budget)
    val firstExcluded = df.filter(!col("id").isin(gotIds.toSeq: _*))
      .orderBy(Sampling.md5Hash52(col("id")).asc, col("id").asc)
      .select("n_tok").head().getLong(0)
    assert(keptSum + firstExcluded > budget)
    // partition invariance
    val again = Sampling.tokenBudgetSelect(df.repartition(17), "id",
      "n_tok", budget).collect().map(_.getLong(0)).toSet
    again shouldBe gotIds
  }

  test("tokenBudgetSelect edge: zero budget keeps nothing, huge budget " +
    "keeps everything") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, 3L)).toDF("id", "n_tok")
    Sampling.tokenBudgetSelect(df, "id", "n_tok", 0L).count() shouldBe 0L
    Sampling.tokenBudgetSelect(df, "id", "n_tok", 1000000L)
      .count() shouldBe 50L
  }

  test("iqr outlier plan carries NO exact Percentile aggregate") {
    import spark.implicits._
    // the exact Percentile aggregate buffers every distinct value per
    // group — executor OOM at 100 TB; the plan must use the KLL sketch
    val df = Seq(("g", 1.0), ("g", 2.0)).toDF("k", "v")
    val plan = Outliers.iqrStats(df, "v", Seq("k"))
      .queryExecution.optimizedPlan.toString
    plan.toLowerCase should not include "percentile"
    plan should include ("kll_agg")
  }

  test("iqr outlier stats: pinned quartiles and fence counts") {
    import spark.implicits._
    // values 1..100 plus outliers -500 and 250 in one group (the fences
    // for this mix are lo=-50.5, hi=151.5)
    val df = ((1 to 100).map(v => ("g", v.toDouble)) ++
      Seq(("g", -500.0), ("g", 250.0))).toDF("k", "v")
    val r = Outliers.iqrStats(df, "v", Seq("k")).collect().head
    val q1 = r.getAs[Double]("q1")
    val q3 = r.getAs[Double]("q3")
    q1 should be (25.0 +- 1.5) // exact interpolated quartile of the mix
    q3 should be (76.0 +- 1.5)
    r.getAs[Long]("n_outliers") shouldBe 2L
    r.getAs[Long]("n") shouldBe 102L
  }

  test("linearQualityScore: trained weights drive the logit; empty text " +
    "scores neutral; formula path is tokenization-consistent") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "  "), (3L, ""),
      (4L, "ALPHA Beta gamma")).toDF("doc_id", "text")
    // a constant trained table makes every token weigh 1.0 -> logit 1.0
    val ones = spark.sparkContext.broadcast(Array.fill(64)(1.0))
    val trained = TextOps.linearQualityScore(docs, "doc_id", "text",
      nBuckets = 64, weights = Some(ones))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    trained(1L)._1 shouldBe 1.0
    trained(1L)._2 shouldBe (1.0 / (1.0 + math.exp(-1.0)) +- 1e-12)
    // token-less docs are neutral: logit 0, score 0.5 (not NaN)
    trained(2L) shouldBe ((0.0, 0.5))
    trained(3L) shouldBe ((0.0, 0.5))
    // formula path: scoring is case-insensitive (lowercased tokens)
    val formula = TextOps.linearQualityScore(docs, "doc_id", "text",
      nBuckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    formula(4L) shouldBe (formula(1L) +- 1e-12)
  }

  test("metricAnomalies flags the planted bad window and nothing else") {
    import graft.profile.ProfileSession.ProfilingOps
    import spark.implicits._
    // 20 windows of mean ~50, one window (w7) at mean ~500
    val rows = (0 until 21).flatMap { w =>
      val base = if (w == 7) 500.0 else 50.0
      (0 until 30).map(i => (f"w$w%02d", base + (i % 5)))
    }
    val df = rows.map { case (w, v) => (w, v) }.toDF("w", "v")
    val prof = df.newProfilingSession().groupBy("w").aggProfiles()
    val rep = Drift.metricAnomalies(prof, Seq("v"), keep = Seq("w"),
      threshold = 3.0)
    val flagged = rep.filter(col("is_anomaly")).collect()
    flagged.map(_.getString(0)).toSeq shouldBe Seq("w07")
    flagged.head.getAs[Double]("z") should be > 3.0
    rep.count() shouldBe 21L
    // single-window series: degenerate spread -> z 0, no anomaly, no NaN
    val one = df.filter(col("w") === "w03")
      .newProfilingSession().groupBy("w").aggProfiles()
    val r1 = Drift.metricAnomalies(one, Seq("v"), keep = Seq("w")).collect()
    r1.length shouldBe 1
    r1.head.getAs[Double]("z") shouldBe 0.0
    r1.head.getAs[Boolean]("is_anomaly") shouldBe false
  }

  test("autoEdges derives sketch quartiles, collapses duplicates, " +
    "rejects multi-row references") {
    import graft.profile.ProfileSession.ProfilingOps
    import spark.implicits._
    val df = (1 to 10).map(v => v.toDouble).toDF("v")
    val sk = df.agg(graft.functions.kll_agg(col("v")).as("sk"))
    // rank-rule quartiles of 1..10 are 3, 5, 8 (q13 semantics)
    Drift.autoEdges(sk, "sk") shouldBe Seq(3.0, 5.0, 8.0)
    // a point mass collapses duplicate quantiles instead of emitting
    // zero-width bins
    val const = Seq.fill(10)(7.0).toDF("v")
      .agg(graft.functions.kll_agg(col("v")).as("sk"))
    Drift.autoEdges(const, "sk") shouldBe Seq(7.0)
    // two reference rows is a caller bug, not a silent wrong answer
    val two = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .newProfilingSession().groupBy("l_returnflag").aggProfiles()
      .select(col("l_quantity.numbers.kll").as("sk"))
    an[IllegalArgumentException] should be thrownBy
      Drift.autoEdges(two, "sk")
    // an EMPTY reference sketch yields null quantiles; getDouble would
    // silently coerce those to 0.0 and hand back identical bogus edges
    val empty = df.filter(col("v") < 0)
      .agg(graft.functions.kll_agg(col("v")).as("sk"))
    val err = the[IllegalArgumentException] thrownBy
      Drift.autoEdges(empty, "sk")
    err.getMessage should include("empty or null sketch")
  }

  test("categoricalTvd: half the L1 share gap, zero on identical, " +
    "1 on disjoint supports (up to the eps floor)") {
    import spark.implicits._
    import graft.functions.freq_items_agg
    // cohort a: 60/30/10 over x/y/z; cohort b: 10/30/60
    // TVD = (|.6-.1| + |.3-.3| + |.1-.6|) / 2 = 0.5
    val rows = (1 to 100).map { i =>
      val ca = if (i <= 60) "x" else if (i <= 90) "y" else "z"
      val cb = if (i <= 10) "x" else if (i <= 40) "y" else "z"
      (ca, cb)
    }
    val sk = rows.toDF("a", "b")
      .agg(freq_items_agg(col("a")).as("sa"),
        freq_items_agg(col("b")).as("sb"))
    sk.select(Drift.categoricalTvd(col("sa"), col("sb")))
      .head().getDouble(0) shouldBe (0.5 +- 1e-12)
    sk.select(Drift.categoricalTvd(col("sa"), col("sa")))
      .head().getDouble(0) shouldBe 0.0
    val disjoint = Seq(("only_a", "only_b")).toDF("a", "b")
      .agg(freq_items_agg(col("a")).as("sa"),
        freq_items_agg(col("b")).as("sb"))
    disjoint.select(Drift.categoricalTvd(col("sa"), col("sb")))
      .head().getDouble(0) shouldBe (1.0 +- 1e-5) // eps-floored ends
  }

  test("categoricalPsi: exact in the low-cardinality regime, zero on " +
    "identical shares, per-group usable") {
    import spark.implicits._
    import graft.functions.freq_items_agg
    // cohort a: 60/30/10 over x/y/z; cohort b: 10/30/60 — hand PSI
    val rows = (1 to 100).map { i =>
      val ca = if (i <= 60) "x" else if (i <= 90) "y" else "z"
      val cb = if (i <= 10) "x" else if (i <= 40) "y" else "z"
      (ca, cb)
    }
    val sk = rows.toDF("a", "b")
      .agg(freq_items_agg(col("a")).as("sa"), freq_items_agg(col("b")).as("sb"))
    val got = sk.select(
      Drift.categoricalPsi(col("sa"), col("sb")).as("psi"),
      Drift.categoricalTotal(col("sa")).as("na")).head()
    val hand = Seq((0.6, 0.1), (0.3, 0.3), (0.1, 0.6))
      .map { case (p, q) => (p - q) * math.log(p / q) }.sum
    got.getDouble(0) shouldBe (hand +- 1e-12)
    got.getLong(1) shouldBe 100L

    // identical sketches -> exactly zero drift
    sk.select(Drift.categoricalPsi(col("sa"), col("sa")))
      .head().getDouble(0) shouldBe 0.0

    // one-sided categories get the eps floor, not NaN/Infinity
    val disjoint = Seq(("only_a", "only_b")).toDF("a", "b")
      .agg(freq_items_agg(col("a")).as("sa"), freq_items_agg(col("b")).as("sb"))
    val d = disjoint.select(
      Drift.categoricalPsi(col("sa"), col("sb"))).head().getDouble(0)
    d.isNaN shouldBe false
    d should be > 1.0 // two fully-shifted categories

    // per-group: a scalar expression, so it rides a grouped select
    val grouped = (1 to 100).map { i =>
      (if (i % 2 == 0) "g1" else "g2",
        if (i % 4 < 2) "u" else "v",
        if (i % 4 < 1) "u" else "v")
    }.toDF("g", "a", "b")
      .groupBy("g")
      .agg(freq_items_agg(col("a")).as("sa"), freq_items_agg(col("b")).as("sb"))
      .select(col("g"), Drift.categoricalPsi(col("sa"), col("sb")).as("psi"))
    grouped.count() shouldBe 2L
    grouped.collect().foreach(_.getDouble(1).isNaN shouldBe false)
  }

  test("ks: zero on identical sketches, symmetric, equals the exact " +
    "grid CDF gap below sketch capacity") {
    import spark.implicits._
    import graft.functions.kll_agg
    val edges = Seq(2.0, 5.0, 8.0)
    val va = (1 to 50).map(_.toDouble)       // uniform 1..50
    val vb = (1 to 50).map(_ / 5.0)          // compressed to 0.2..10
    val sk = (va.map((true, _)) ++ vb.map((false, _))).toDF("first", "v")
      .agg(kll_agg(when(col("first"), col("v"))).as("a"),
        kll_agg(when(!col("first"), col("v"))).as("b"))
    val r = sk.select(
      Drift.ks(col("a"), col("a"), edges).as("self"),
      Drift.ks(col("a"), col("b"), edges).as("ab"),
      Drift.ks(col("b"), col("a"), edges).as("ba")).head()
    r.getDouble(0) shouldBe 0.0
    r.getDouble(1) shouldBe r.getDouble(2) // |.| makes it symmetric
    // exact regime: hand-computed max grid CDF gap
    def cdf(vs: Seq[Double], e: Double) = vs.count(_ <= e).toDouble / vs.size
    val expected = edges.map(e => math.abs(cdf(va, e) - cdf(vb, e))).max
    r.getDouble(1) shouldBe (expected +- 1e-12)
    r.getDouble(1) should (be > 0.0 and be <= 1.0)
  }

  test("emd: zero on identical sketches, symmetric, equals the exact " +
    "grid CDF-gap x cell-width sum; shift distance in value units") {
    import spark.implicits._
    import graft.functions.kll_agg
    val edges = Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0)
    val va = (1 to 50).map(_ / 5.0)          // 0.2..10
    val vb = (1 to 50).map(v => v / 5.0 + 2) // the same, shifted by +2
    val sk = (va.map((true, _)) ++ vb.map((false, _))).toDF("first", "v")
      .agg(kll_agg(when(col("first"), col("v"))).as("a"),
        kll_agg(when(!col("first"), col("v"))).as("b"))
    val r = sk.select(
      Drift.emd(col("a"), col("a"), edges).as("self"),
      Drift.emd(col("a"), col("b"), edges).as("ab"),
      Drift.emd(col("b"), col("a"), edges).as("ba")).head()
    r.getDouble(0) shouldBe 0.0
    r.getDouble(1) shouldBe r.getDouble(2)
    def cdf(vs: Seq[Double], e: Double) = vs.count(_ <= e).toDouble / vs.size
    val expected = edges.init.zip(edges.tail).map { case (lo, hi) =>
      math.abs(cdf(va, lo) - cdf(vb, lo)) * (hi - lo)
    }.sum
    r.getDouble(1) shouldBe (expected +- 1e-12)
    // a pure +2 shift of a distribution spanning the grid reads back
    // as a distance NEAR 2 in value units (grid-resolution-bounded)
    r.getDouble(1) shouldBe (2.0 +- 0.5)

    an[IllegalArgumentException] should be thrownBy
      Drift.emd(col("a"), col("b"), Seq(5.0))
    an[IllegalArgumentException] should be thrownBy
      Drift.emd(col("a"), col("b"), Seq(5.0, 1.0))
  }

  test("jsd: zero on identical sketches, symmetric, bounded by ln 2") {
    import spark.implicits._
    import graft.functions.{freq_items_agg, kll_agg}
    val edges = Seq(2.0, 5.0, 8.0)
    val sk = ((1 to 50).map(_.toDouble) ++ (1 to 50).map(_ / 5.0))
      .zipWithIndex.map { case (v, i) => (i < 50, v) }.toDF("first", "v")
      .agg(kll_agg(when(col("first"), col("v"))).as("a"),
        kll_agg(when(!col("first"), col("v"))).as("b"))
    val r = sk.select(
      Drift.jsd(col("a"), col("a"), edges).as("self"),
      Drift.jsd(col("a"), col("b"), edges).as("ab"),
      Drift.jsd(col("b"), col("a"), edges).as("ba")).head()
    r.getDouble(0) shouldBe 0.0
    r.getDouble(1) shouldBe (r.getDouble(2) +- 1e-15)
    r.getDouble(1) should (be > 0.0 and be <= math.log(2.0))

    // categorical: disjoint categories saturate at ln 2 (up to the eps
    // floor), identical sketches at exactly 0
    val cat = Seq(("onlya", "onlyb")).toDF("a", "b")
      .agg(freq_items_agg(col("a")).as("sa"), freq_items_agg(col("b")).as("sb"))
    val c = cat.select(
      Drift.categoricalJsd(col("sa"), col("sb")).as("ab"),
      Drift.categoricalJsd(col("sa"), col("sa")).as("self")).head()
    c.getDouble(1) shouldBe 0.0
    c.getDouble(0) shouldBe (math.log(2.0) +- 1e-4)
  }

  test("schemaDrift surfaces type changes, null-fraction shifts, and " +
    "added/removed columns") {
    import graft.profile.ProfileSession.ProfilingOps
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toDouble, s"s$i", i.toLong))
    val a = rows.toDF("x", "y", "z").newProfilingSession().aggProfiles()
    val b = rows.toDF("x", "y", "z")
      .select(col("x").cast("string").as("x"), // retyped
        when(col("z") % 4 === 0, lit(null).cast("string"))
          .otherwise(col("y")).as("y"), // 25% nulls
        (col("z") * 2).as("w")) // z removed, w added
      .newProfilingSession().aggProfiles()
    val rep = Drift.schemaDrift(a, b).collect()
      .map(r => r.getAs[String]("column") -> r).toMap

    rep("x").getAs[Int]("type_changed") shouldBe 1
    rep("x").getAs[String]("type_a") shouldBe "FRACTIONAL"
    rep("x").getAs[String]("type_b") shouldBe "STRING"
    rep("y").getAs[Int]("type_changed") shouldBe 0
    rep("y").getAs[Double]("null_frac_delta") shouldBe 0.25
    rep("z").getAs[Int]("present_b") shouldBe 0
    rep("z").getAs[Int]("type_changed") shouldBe 0 // one-sided: no change
    rep("w").getAs[Int]("present_a") shouldBe 0
    rep("w").getAs[Long]("card_b") shouldBe 100L

    // a grouped (multi-row) profile frame is a caller bug, not a
    // silently multiplied report
    val grouped = rows.toDF("x", "y", "z")
      .withColumn("g", col("z") % 2)
      .newProfilingSession().groupBy("g").aggProfiles()
    val err = the[IllegalArgumentException] thrownBy
      Drift.schemaDrift(grouped, b)
    err.getMessage should include("ONE global profile row")
  }

  test("weightedBottomK: a NULL-key stratum wins like any other group") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (Some("g"), i.toLong, 1.0)) ++
      (101 to 200).map(i => (Option.empty[String], i.toLong, 1.0)))
      .toDF("g", "id", "w")
    val got = Sampling.weightedBottomK(df, Seq("g"), "id", "w", k = 10)
      .collect()
    // the NULL-key group's winners must survive the semi-join back
    got.count(_.isNullAt(0)) shouldBe 10
    got.count(!_.isNullAt(0)) shouldBe 10
    // and match the same draw computed over just the NULL-key rows
    val nullOnly = Sampling.weightedBottomK(
      df.filter(col("g").isNull), Seq("g"), "id", "w", k = 10)
      .collect().map(_.getLong(1)).toSet
    got.filter(_.isNullAt(0)).map(_.getLong(1)).toSet shouldBe nullOnly
  }

  test("profile drift: zero against itself, positive under a real shift") {
    import graft.profile.ProfileSession.ProfilingOps
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // persist: self-drift must read the SAME materialized profile on both
    // sides. Without it the join evaluates the plan twice, and since r16's
    // update-parallelize rule the 4 partials merge in arrival order —
    // above KLL exact capacity two recomputations are only near-identical
    // (the engine's claim is merge-order-insensitive SUMMARIES, not
    // bit-identical sketch bytes across independent aggregations)
    val profA = li.filter(col("l_orderkey") % 2 === 0)
      .newProfilingSession().aggProfiles()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val profShifted = li.filter(col("l_orderkey") % 2 === 1)
      .withColumn("l_quantity", col("l_quantity") * 3)
      .newProfilingSession().aggProfiles()
    val edges = Map("l_quantity" -> Seq(10.0, 25.0, 40.0))

    val self = Drift.profileDrift(profA, profA, edges).collect().head
    self.getDouble(1) shouldBe 0.0 // identical distributions: every term 0
    self.getDouble(2) shouldBe 0.0

    val shifted = Drift.profileDrift(profShifted, profA, edges).collect().head
    shifted.getString(0) shouldBe "l_quantity"
    shifted.getDouble(1) should be > 0.25 // tripled values: strong PSI shift
  }

  test("profile drift is single-pass on a 120-column profile") {
    import graft.profile.ProfileSession.ProfilingOps
    val cols = (0 until 120).map(i => s"c$i")
    // 200 rows: below KLL sketch-exact capacity, so two independent
    // aggregations of the same column yield bit-identical sketches (above
    // capacity compaction is randomized and self-PSI is only near-zero)
    val wide = spark.range(0, 200).select(
      cols.zipWithIndex.map { case (c, i) =>
        ((col("id") % 97 + i).cast("double")).as(c)
      }: _*)
    // single-level profile plan for the fixture: the >= 64-col wide
    // path adds its own posexplode per profile (per-column merge),
    // which would make the Generate pin below count profile-subplan
    // generates instead of the drift operator's one explode
    spark.conf.set("spark.graft.profile.twoLevelMerge", "false")
    val (profA, profB) =
      try {
        (wide.newProfilingSession().aggProfiles(),
          wide.withColumn("c3", col("c3") * 2.0)
            .newProfilingSession().aggProfiles())
      } finally spark.conf.unset("spark.graft.profile.twoLevelMerge")
    val edges = cols.map(c => c -> Seq(20.0, 50.0, 80.0)).toMap

    val t0 = System.nanoTime()
    val drift = Drift.profileDrift(profB, profA, edges)
    // plan growth check: exactly ONE explode and zero unions — the plan
    // must stay constant-size in column count, not one subplan per column
    // (the old unionAll shape whose analyzer cost exploded at width)
    val plan = drift.queryExecution.optimizedPlan.toString
    "Union".r.findAllIn(plan).length shouldBe 0
    "Generate".r.findAllIn(plan).length shouldBe 1
    val rows = drift.collect()
    // analyzer + execution must stay interactive at width; a quadratic
    // analyzer blowup (the r4 concern at 1000 columns) lands in minutes
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    elapsedSec should be < 90.0
    rows.length shouldBe 120
    val byCol = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    byCol("c3") should be > 0.1 // the shifted column stands out
    byCol("c7") shouldBe 0.0 // identical distribution: zero PSI
    // the single-pass path must agree with the scalar psi() expression
    val expected = profB.crossJoin(profA.select(
        col("c3.numbers.kll").as("__ref")))
      .select(Drift.psi(col("c3.numbers.kll"), col("__ref"),
        Seq(20.0, 50.0, 80.0)).as("p")).collect().head.getDouble(0)
    byCol("c3") shouldBe (expected +- 1e-12)
  }

  test("hash split: disjoint covering labels at the requested ratios, " +
    "consistent with hashSample") {
    import spark.implicits._
    val df = (1 to 5000).map(_.toLong).toDF("id")
    val split = Sampling.hashSplit(df, "id",
      Map("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 5000L // total coverage, no dropped rows
    counts.keySet shouldBe Set("train", "val", "test")
    counts("train").toDouble should (be > 5000 * 0.75 and be < 5000 * 0.85)
    counts("val").toDouble should (be > 5000 * 0.06 and be < 5000 * 0.14)
    // label ranges nest with hashSample: the first-decile sample IS the
    // lexicographically-first label's rows
    val test_ = split.filter(col("split") === "test")
      .collect().map(_.getLong(0)).toSet
    Sampling.hashSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet shouldBe test_
    // weights normalize: 8/1/1 == 0.8/0.1/0.1
    val again = Sampling.hashSplit(df.repartition(9), "id",
      Map("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    again shouldBe split.collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  test("top n-gram stats: pinned argmax with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a c"),   // bigrams: "a b"x2, "b a"x2, "a c"x1 -> tie,
                             // greatest gram wins: "b a"
      (2L, "x y"),           // one window
      (3L, "q"))             // below n -> no row
      .toDF("id", "text")
    val got = TextOps.topNgramStats(df, "id", "text", 2).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    got.keySet shouldBe Set(1L, 2L)
    got(1L) shouldBe (("b a", 2L, 5L, 0.4))
    got(2L) shouldBe (("x y", 1L, 1L, 1.0))
  }

  test("repetition filters: pinned duplicate n-gram and line ratios") {
    import spark.implicits._
    val rows = Seq(
      "a b c a b c a b",   // 8 toks, 6 3-gram windows, 3 distinct -> 0.5
      "x y z w",           // no repeats -> 0.0
      "q r",               // below n -> 0.0
      "l1\nl2\nl1\nl1")    // 4 lines, 2 distinct -> 0.5
      .toDF("text")
    val got = rows.select(
      TextOps.dupNgramRatio(col("text"), 3).as("g"),
      TextOps.dupLineRatio(col("text")).as("l")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    got(0)._1 shouldBe 0.5 +- 1e-12
    got(1)._1 shouldBe 0.0
    got(2)._1 shouldBe 0.0
    got(3)._2 shouldBe 0.5 +- 1e-12
    got(1)._2 shouldBe 0.0 // single line, no dup
  }

  test("pii counts: pinned per-pattern counts") {
    import spark.implicits._
    val df = Seq(
      "mail a@b.com and c.d@e.org, site https://x.y/z?q=1",
      "call 555-123-4567 or 555.987.6543 now",
      "nothing here").toDF("text")
    val got = df.select(
        TextOps.emailCount(col("text")).as("e"),
        TextOps.urlCount(col("text")).as("u"),
        TextOps.phoneCount(col("text")).as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    got shouldBe Array((2, 1, 0), (0, 0, 2), (0, 0, 0))
  }

  test("tf-idf: corpus-unique terms outrank ubiquitous terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "gamma common")).toDF("doc_id", "text")
    val top1 = TextOps.tfIdfTopTerms(docs, "doc_id", "text", 1)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' appears in every doc -> idf ln(1)=0; the unique term wins
    top1 shouldBe Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
  }

  private def fixtureDocs = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
  }

  test("tf-idf: adaptive, gated, and forced join strategies all agree") {
    // releasable variant + release: a leaked gate persist would be
    // auto-served by the cache manager to ANY later identical subplan
    // (other suites' plan audits included)
    def run(cap: Long) = {
      val (df, release) = TextOps.tfIdfTopTermsReleasable(fixtureDocs,
        "doc_id", "text", 3, maxBroadcastVocab = cap)
      try df.collect()
        .map(r => (r.getLong(0), r.getString(1),
          math.rint(r.getDouble(2) * 1e9), r.getInt(3))).toSet
      finally release()
    }
    val forced = run(Long.MaxValue) // broadcast hint
    run(TextOps.AdaptiveVocabJoin) shouldBe forced // AQE-decided
    run(10_000_000L) shouldBe forced // exact gate -> broadcast branch
    run(1L) shouldBe forced // exact gate -> shuffle branch (vocab > 1)
  }

  test("tf-idf: minDf floors the vocabulary (hapax terms dropped)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha shared shared"),
      (2L, "beta shared"),
      (3L, "gamma shared rare")).toDF("doc_id", "text")
    val terms = TextOps.tfIdfTopTerms(docs, "doc_id", "text", 5, minDf = 2L)
      .collect().map(_.getString(1)).toSet
    // only 'shared' reaches minDf=2; every hapax is out of scoring
    terms shouldBe Set("shared")
  }

  test("perplexity: adaptive, gated, and forced join strategies all agree") {
    def run(cap: Long) = {
      val (df, release) = TextOps.unigramPerplexityReleasable(fixtureDocs,
        "doc_id", "text", maxBroadcastVocab = cap)
      try df.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e6))).toSet
      finally release()
    }
    val forced = run(Long.MaxValue) // broadcast hint
    run(TextOps.AdaptiveVocabJoin) shouldBe forced // AQE-decided
    run(10_000_000L) shouldBe forced // exact gate -> broadcast branch
    run(1L) shouldBe forced // exact gate -> shuffle branch (vocab > 1)
  }

  test("perplexity: minCount floor scores rare terms at the floor NLL") {
    import spark.implicits._
    // corpus: 'a' x6, 'b' x3, 'z' x1 (total 10)
    val docs = Seq((1L, "a a a a a a"), (2L, "b b b"), (3L, "z"))
      .toDF("doc_id", "text")
    val r = TextOps.unigramPerplexity(docs, "doc_id", "text", minCount = 2L)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc 3's only term is floored out -> default NLL -ln(1/10) -> ppl 10
    r(3L) shouldBe (10.0 +- 1e-9)
    // doc 1 is unaffected by the floor: ppl = 1/p(a) = 10/6
    r(1L) shouldBe (10.0 / 6.0 +- 1e-9)
  }

  test("bigram perplexity: pinned interpolated values on a hand corpus") {
    import spark.implicits._
    // uni: a:3 b:3, total 6; big: (a,b):2 (b,a):2
    // every position: p = .75*(2/3) + .25*(3/6) = .625 -> ppl = 1.6
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val r = TextOps.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .sortBy(_._1)
    r.map(_._1).toSeq shouldBe Seq(1L, 2L)
    r.map(_._2).toSeq shouldBe Seq(3L, 1L) // bigram positions per doc
    r.foreach(_._3 shouldBe (1.6 +- 1e-12))
  }

  test("bigram perplexity: sub-2-token docs absent; floor sends unseen " +
    "contexts to the pure unigram term") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a"), (2L, "c a"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextOps.bigramPerplexity(docs, "doc_id", "text", minCount = 2L)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    r.keySet shouldBe Set(1L, 2L) // docs 3 (one token) and 4 (none) absent
    // unfloored uni: a:4 b:2 c:1 solo:1 -> total 8
    // floored uni: a:4, b:2. floored big: (a,b):2, (b,a):2 ((c,a) dropped)
    // doc2 (c,a): cond 0 (c floored) -> p = .25*4/8 -> ppl 8
    r(2L) shouldBe (8.0 +- 1e-9)
    // doc1: (a,b)x2: .75*(2/4)+.25*2/8 ; (b,a)x2: .75*(2/2)+.25*4/8
    val pab = 0.75 * (2.0 / 4.0) + 0.25 * 2.0 / 8.0
    val pba = 0.75 * (2.0 / 2.0) + 0.25 * 4.0 / 8.0
    r(1L) shouldBe (1.0 / math.sqrt(pab * pba) +- 1e-9)
  }

  test("trigram perplexity: stupid backoff walks all three branches " +
    "under a floor; sub-3-token docs absent") {
    import spark.implicits._
    // uni: a:3 b:3 c:2 d:1 x:1 y:1 (total 11); floored(>=2) bigrams:
    // (a,b):3 (b,c):2; floored trigrams: (a,b,c):2
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val r = TextOps.trigramPerplexity(docs, "doc_id", "text",
      alpha = 0.4, minCount = 2L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    r.keySet shouldBe Set(1L, 2L) // doc 3 has no trigram position
    r(1L)._1 shouldBe 4L
    r(2L)._1 shouldBe 1L
    // doc1: (a,b,c) seen -> 2/3 (x2); (b,c,a) backs off past the
    // floored (c,a) to alpha^2*c(a)/11; (c,a,b) backs off to the
    // surviving (a,b): alpha*3/c(a)
    val pSeen = 2.0 / 3
    val pUni = 0.4 * 0.4 * 3.0 / 11
    val pBi = 0.4 * 3.0 / 3
    r(1L)._2 shouldBe math.exp(
      -(2 * math.log(pSeen) + math.log(pUni) + math.log(pBi)) / 4) +- 1e-9
    // doc2: (a,b,d) and (b,d) both floored out -> alpha^2*c(d)/11
    r(2L)._2 shouldBe (1.0 / (0.4 * 0.4 * 1.0 / 11)) +- 1e-9

    // minCount=1: every observed trigram is seen, pure branch 1
    val r1 = TextOps.trigramPerplexity(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc2: p = c(a,b,d)/c(a,b) = 1/3
    r1(2L) shouldBe (3.0 +- 1e-9)
  }

  test("normalizeText: NFC composes, controls strip, whitespace " +
    "collapses, ends trim; idempotent; null-safe") {
    import spark.implicits._
    val rows = Seq(
      "cafe\u0301",               // decomposed -> composed
      "a\u0001b\u0007c",           // controls -> single spaces
      "  x \t\n y  ",              // collapse + trim
      "already clean",
      null)
    val got = rows.toDF("t")
      .select(TextOps.normalizeText(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    got(0) shouldBe "caf\u00e9"
    got(1) shouldBe "a b c"
    got(2) shouldBe "x y"
    got(3) shouldBe "already clean"
    got(4) shouldBe null
    // idempotence over the already-normalized output
    val again = got.take(4).toSeq.toDF("t")
      .select(TextOps.normalizeText(col("t"))).collect().map(_.getString(0))
    again shouldBe got.take(4)
  }

  test("nfc_normalize is SQL-registered and codegen-friendly") {
    graft.functions.registerAll(spark)
    import spark.implicits._
    Seq("nai\u0308ve").toDF("t").createOrReplaceTempView("nfc_probe")
    spark.sql("SELECT nfc_normalize(t) AS n FROM nfc_probe")
      .collect()(0).getString(0) shouldBe "na\u00efve"
    // the projection stays inside whole-stage codegen (no fallback);
    // a non-foldable input defeats ConvertToLocalRelation so the span
    // is observable
    val df = spark.range(1)
      .select(graft.functions.nfc_normalize(
        concat(lit("cafe\u0301"), col("id").cast("string"))).as("n"))
    "\\*\\(\\d+\\) Project".r.findFirstIn(
      df.queryExecution.executedPlan.toString) should not be empty
    df.collect()(0).getString(0) shouldBe "caf\u00e90"
  }

  test("bm25: hand-computed scores, rank order, and absent non-matches") {
    import spark.implicits._
    val docs = Seq((1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "durian elderberry fig")).toDF("doc_id", "text")
    val queries = Seq((10L, "apple")).toDF("query_id", "qtext")
    val got = TextOps.bm25TopK(docs, "doc_id", "text",
      queries, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._4)
    // N=3, df(apple)=2, avgdl=8/3; idf = ln(1 + 1.5/2.5) = ln(1.6)
    val idf = math.log(1.6)
    def w(tf: Double, dl: Double): Double =
      BigDecimal(idf * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.map(r => (r._1, r._2, r._4)) shouldBe
      Array((10L, 1L, 1), (10L, 2L, 2)) // tf=2,dl=3 outranks tf=1,dl=2
    got(0)._3 shouldBe (w(2.0, 3.0) +- 1e-6)
    got(1)._3 shouldBe (w(1.0, 2.0) +- 1e-6)
    // doc 3 shares no terms and must be absent entirely
  }

  test("bm25: multi-term queries sum contributions; k bounds each " +
    "query's rows; corpus never shuffles before the term semi-join") {
    import spark.implicits._
    val docs = (1 to 100).map(i =>
      (i.toLong, s"common w${i % 10} filler${i} extra${i}")).toDF(
      "doc_id", "text")
    val queries = Seq((1L, "common w1"), (2L, "w2 w3")).toDF(
      "query_id", "qtext")
    val got = TextOps.bm25TopK(docs, "doc_id", "text",
      queries, "query_id", "qtext", k = 5)
    val rows = got.collect()
    rows.groupBy(_.getLong(0)).values.foreach(_.length should be <= 5)
    // query 1: docs with BOTH 'common' and 'w1' (i%10==1) must outrank
    // docs with only 'common'
    val q1top = rows.filter(_.getLong(0) == 1L).sortBy(_.getInt(3)).head
    (q1top.getLong(1) % 10) shouldBe 1L
  }

  test("char_entropy: pinned values, uniform bound, codepoint units") {
    import spark.implicits._
    val got = Seq("aabb", "aaaa", "abcd", "", "naïve")
      .toDF("t").select(graft.functions.char_entropy(col("t")).as("h"))
      .collect().map(_.getDouble(0))
    got(0) shouldBe math.log(2.0) +- 1e-12     // two equiprobable chars
    got(1) shouldBe 0.0                        // constant string
    got(2) shouldBe math.log(4.0) +- 1e-12     // four equiprobable chars
    got(3) shouldBe 0.0                        // empty string
    got(4) should be > 0.0                     // multibyte counts as 1 cp
    // entropy never exceeds ln(distinct chars)
    got(4) should be <= math.log(5.0) + 1e-12
  }

  test("collapseRepeatedLines: runs collapse to one, non-adjacent " +
    "repeats survive, single line untouched") {
    import spark.implicits._
    val got = Seq(
      "a\na\na\nb\na\nc\nc",   // runs a*3 and c*2; non-adjacent 'a' kept
      "only",
      "x\nx")
      .toDF("t").select(TextOps.collapseRepeatedLines(col("t")).as("n"))
      .collect().map(_.getString(0))
    got(0) shouldBe "a\nb\na\nc"
    got(1) shouldBe "only"
    got(2) shouldBe "x"
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2, " +
    "constant vectors survive") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 1.0f, 0.5f, -1.0f)),
      (2L, Array(3.0f, 3.0f, 3.0f, 3.0f)))     // constant -> scale 0
      .toDF("id", "emb")
    val q = df.select(col("id"), col("emb"),
      Similarity.quantizeInt8(col("emb")).as("q"))
    val rows = q.select(col("id"),
      col("q.scale"),
      array_min(col("q.codes")).as("lo"), array_max(col("q.codes")).as("hi"),
      array_max(zip_with(col("emb"), Similarity.dequantizeInt8(col("q")),
        (o, d) => abs(o.cast("double") - d))).as("err"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).sortBy(_._1)
    val (_, scale1, lo1, hi1, err1) = rows(0)
    lo1 shouldBe 0     // min element maps to code 0
    hi1 shouldBe 255   // max element maps to code 255
    err1 should be <= scale1 / 2 + 1e-9
    rows(1) shouldBe ((2L, 0.0, 0, 0, 0.0)) // constant vector: all zeros
  }

  test("exactBest keeps the highest-scoring row per key, ties to the " +
    "greatest id") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 0.5), (2L, "a", 0.9), (3L, "a", 0.9), // tie at 0.9 -> id 3
      (4L, "b", 0.1))
      .toDF("id", "k", "score")
    val got = Dedup.exactBest(df, Seq("k"), "score", "id")
      .collect().map(r => (r.getString(1), r.getLong(0))).toMap
    got shouldBe Map("a" -> 3L, "b" -> 4L)
  }

  test("bigram perplexity is partition-invariant") {
    import spark.implicits._
    val docs = (1 to 200).map(i =>
      (i.toLong, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 7}"))
      .toDF("doc_id", "text")
    val a = TextOps.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        math.round(x.getDouble(2) * 1e9))).toSet
    val b = TextOps.bigramPerplexity(docs.repartition(13), "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        math.round(x.getDouble(2) * 1e9))).toSet
    a shouldBe b
  }

  test("doremiWeights: one step, no smoothing matches the closed form") {
    import spark.implicits._
    // domain a: excess (2-1)=1 on both rows; domain b: 1-1.5 clips to 0
    val df = Seq(("a", 2.0, 1.0), ("a", 2.0, 1.0), ("b", 1.0, 1.5))
      .toDF("dom", "lp", "lr")
    val got = Sampling.doremiWeights(df, "dom", "lp", "lr",
        eta = 1.0, steps = 1, smoothing = 0.0)
      .orderBy("domain").collect()
    got.map(_.getString(0)) shouldBe Array("a", "b")
    got.map(_.getDouble(1)) shouldBe Array(1.0, 0.0)
    // from uniform: w_a = e / (e + 1), w_b = 1 / (e + 1)
    val e = math.exp(1.0)
    got(0).getDouble(2) shouldBe (e / (e + 1)) +- 1e-12
    got(1).getDouble(2) shouldBe (1 / (e + 1)) +- 1e-12
  }

  test("doremiWeights: zero excess everywhere stays uniform") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 2.0), ("b", 1.0, 1.0), ("c", 0.5, 0.9))
      .toDF("dom", "lp", "lr")
    val got = Sampling.doremiWeights(df, "dom", "lp", "lr",
        eta = 2.0, steps = 7, smoothing = 0.1)
      .collect().map(_.getDouble(2))
    got.foreach(_ shouldBe (1.0 / 3) +- 1e-12)
  }

  test("doremiWeights: smoothing floors every domain, weights sum to 1," +
      " hottest excess wins") {
    import spark.implicits._
    val df = Seq(("hot", 5.0, 1.0), ("warm", 2.0, 1.0), ("cold", 1.0, 1.0))
      .toDF("dom", "lp", "lr")
    val rows = Sampling.doremiWeights(df, "dom", "lp", "lr",
        eta = 1.0, steps = 25, smoothing = 0.2)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    rows.values.sum shouldBe 1.0 +- 1e-9
    rows.values.foreach(_ should be >= 0.2 / 3 - 1e-12)
    rows("hot") should be > rows("warm")
    rows("warm") should be > rows("cold")
  }

  test("applyMixtureWeights: hits target rates, caps at 1, drops " +
      "unweighted domains, and is deterministic") {
    import spark.implicits._
    // big: 2000 rows, small: 100 rows, ghost: 50 rows (no weight)
    val df = ((1L to 2000L).map(i => (i, "big")) ++
      (3001L to 3100L).map(i => (i, "small")) ++
      (4001L to 4050L).map(i => (i, "ghost"))).toDF("id", "dom")
    val w = Seq(("big", 0.5), ("small", 0.5)).toDF("domain", "weight")
    val got = Sampling.applyMixtureWeights(df, "dom", "id", w,
      targetFraction = 0.2)
    val byDom = got.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byDom.keySet shouldBe Set("big", "small")
    // small: rate = min(1, .2*2150*.5/100) = 1 -> ALL 100 rows kept
    byDom("small") shouldBe 100L
    // big: rate = .2*2150*.5/2000 = .1075 -> ~215 of 2000 (hash noise)
    byDom("big").toDouble shouldBe 215.0 +- 60.0
    // deterministic: identical survivor set on re-run
    val again = Sampling.applyMixtureWeights(df, "dom", "id", w,
      targetFraction = 0.2).select("id").collect().map(_.getLong(0)).toSet
    got.select("id").collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("leakageSafeSplit: every near-dup component lands in ONE split " +
    "(the min id's hashSplit label); unpaired docs match hashSplit; " +
    "empty pairs degrade to hashSplit exactly") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc $i")).toDF("id", "text")
    val w = Map("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // components: {7, 107, 207} (chain), {8, 108}, singletons elsewhere
    val pairs = Seq((7L, 107L), (107L, 207L), (8L, 108L))
      .toDF("id_a", "id_b")
    val (out, release) = Sampling.leakageSafeSplitReleasable(
      docs, "id", pairs, w)
    try {
      val got = out.collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      got.size shouldBe 300
      val base = Sampling.hashSplit(docs, "id", w).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      // whole component carries the representative's label
      got(107L) shouldBe base(7L)
      got(207L) shouldBe base(7L)
      got(7L) shouldBe base(7L)
      got(108L) shouldBe base(8L)
      // everything unpaired is untouched
      (got -- Seq(107L, 207L, 108L)) shouldBe
        (base -- Seq(107L, 207L, 108L))
    } finally release()
    // empty pairs: label-for-label identical to hashSplit
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val (same, rel2) = Sampling.leakageSafeSplitReleasable(
      docs, "id", empty, w)
    try {
      same.collect().map(r => r.getLong(0) -> r.getString(2)).toMap shouldBe
        Sampling.hashSplit(docs, "id", w).collect()
          .map(r => r.getLong(0) -> r.getString(2)).toMap
    } finally rel2()
  }
}
