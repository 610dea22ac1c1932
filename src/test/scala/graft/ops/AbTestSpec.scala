package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** A/B-test statistics and agreement: Welch's t against hand-computed
  * moments, Mann-Whitney against the textbook example, Cohen's kappa
  * against a hand-built contingency table, and the series
  * decomposition against a constructed trend + seasonality.
  */
class AbTestSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("welchTTest: hand-computed two-group case; degenerate groups " +
    "yield NULL t/df") {
    import spark.implicits._
    // a = [1,2,3] (mean 2, var 1), b = [2,4,6,8] (mean 5, var 20/3)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "v")
    val r = ModelEvalHelpers.one(
      Stats.welchTTest(df, "g", "v", "a", "b"))
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe (2.0 +- 1e-12)
    r.getDouble(3) shouldBe (5.0 +- 1e-12)
    r.getDouble(4) shouldBe (-3.0 +- 1e-12)
    val sa = 1.0 / 3
    val sb = (20.0 / 3) / 4
    r.getDouble(5) shouldBe (math.sqrt(sa + sb) +- 1e-12)
    r.getDouble(6) shouldBe (-3.0 / math.sqrt(sa + sb) +- 1e-12)
    val dfExp = math.pow(sa + sb, 2) /
      (math.pow(sa, 2) / 2 + math.pow(sb, 2) / 3)
    r.getDouble(7) shouldBe (dfExp +- 1e-12)

    // single-element group: t/df NULL, means still reported
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r2 = ModelEvalHelpers.one(
      Stats.welchTTest(tiny, "g", "v", "a", "b"))
    r2.isNullAt(6) shouldBe true
    r2.isNullAt(7) shouldBe true
  }

  test("mannWhitney: U equals n_a*n_b*AUC with average-rank ties; " +
    "all-tied yields NULL z") {
    import spark.implicits._
    // a = [1, 3, 3], b = [2, 3]: ranks 1,2,(3.5 avg over 3-way... )
    // values sorted: 1(a) 2(b) 3,3,3 (two a, one b) -> ranks 1, 2,
    // and the tie group spans 3..5 with average rank 4
    // R_a = 1 + 4 + 4 = 9; U = 9 - 3*4/2 = 3
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 3.0), ("b", 2.0),
      ("b", 3.0)).toDF("g", "v")
    val r = ModelEvalHelpers.one(Stats.mannWhitney(df, "g", "v", "a", "b"))
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe (3.0 +- 1e-12)
    // sigma^2 = (3*2/12) * ((5+1) - (27-3)/(5*4)) = 0.5 * 4.8 = 2.4
    r.getDouble(3) shouldBe ((3.0 - 3.0) / math.sqrt(2.4) +- 1e-12)

    val allTied = Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v")
    ModelEvalHelpers.one(Stats.mannWhitney(allTied, "g", "v", "a", "b"))
      .isNullAt(3) shouldBe true
  }

  test("mannWhitney: U / (n_a n_b) equals the tie-corrected AUC") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(300)(
      (if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(20).toDouble))
    val df = rows.toDF("g", "v")
    val mw = ModelEvalHelpers.one(Stats.mannWhitney(df, "g", "v", "a", "b"))
    val auc = ModelEvalHelpers.one(ModelEval.auc(
      df.withColumn("y", col("g") === "a"), "v", "y"))
    (mw.getDouble(2) / (mw.getLong(0).toDouble * mw.getLong(1))
      ) shouldBe (auc.getDouble(2) +- 1e-12)
  }

  test("agreementReport: hand-computed kappa; perfect agreement 1; " +
    "constant raters NULL") {
    import spark.implicits._
    // 2x2: both-yes 20, both-no 5, a-yes-b-no 10, a-no-b-yes 15
    // po = 25/50 = 0.5; pe = (30*35 + 20*15)/2500 = 0.54
    // kappa = (0.5 - 0.54)/0.46
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("n", "n")) ++
        Seq.fill(10)(("y", "n")) ++ Seq.fill(15)(("n", "y"))
    val r = ModelEvalHelpers.one(
      Stats.agreementReport(rows.toDF("a", "b"), "a", "b"))
    r.getLong(0) shouldBe 50L
    r.getDouble(1) shouldBe (0.5 +- 1e-12)
    r.getDouble(2) shouldBe (0.54 +- 1e-12)
    r.getDouble(3) shouldBe ((0.5 - 0.54) / 0.46 +- 1e-12)

    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    ModelEvalHelpers.one(Stats.agreementReport(perfect, "a", "b"))
      .getDouble(3) shouldBe (1.0 +- 1e-12)

    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    ModelEvalHelpers.one(Stats.agreementReport(const, "a", "b"))
      .isNullAt(3) shouldBe true
  }

  test("proportionTest: hand-computed pooled z; degenerate pooled " +
    "rate yields NULL z") {
    import spark.implicits._
    // a: 3/4 convert, b: 1/4 convert -> pooled 0.5
    val df = Seq(("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false))
      .toDF("g", "y")
    val r = ModelEvalHelpers.one(
      Stats.proportionTest(df, "g", "y", "a", "b"))
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe (0.75 +- 1e-12)
    r.getDouble(3) shouldBe (0.25 +- 1e-12)
    val se = math.sqrt(0.5 * 0.5 * (0.25 + 0.25))
    r.getDouble(5) shouldBe (0.5 / se +- 1e-12)

    val allConvert = Seq(("a", true), ("b", true)).toDF("g", "y")
    ModelEvalHelpers.one(
      Stats.proportionTest(allConvert, "g", "y", "a", "b"))
      .isNullAt(5) shouldBe true
  }

  test("cuped: removes a perfectly linear covariate; preserves the " +
    "group-mean difference; constant covariate is identity") {
    import spark.implicits._
    // y = 3x + group effect: after CUPED the within-group variance
    // from x vanishes but the a-vs-b difference survives. 42 = lcm(2,
    // 7) * 3 full cycles, so x is EXACTLY balanced across groups and
    // theta = 3 to float precision.
    val rows = (1 to 42).map { i =>
      val x = (i % 7).toDouble
      val g = if (i % 2 == 0) "a" else "b"
      (g, x, 3.0 * x + (if (g == "a") 10.0 else 0.0))
    }
    val adj = Stats.cuped(rows.toDF("g", "x", "y"), "y", "x")
    val byG = adj.groupBy("g")
      .agg(avg(col("adjusted")).as("m"), var_samp(col("adjusted")).as("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    (byG("a")._1 - byG("b")._1) shouldBe (10.0 +- 1e-6)
    // theta ~ 3 exactly here (group effect is orthogonal to x by
    // construction i%2 vs i%7 over full cycles is near-balanced);
    // residual variance collapses vs the raw ~ var(3x) + group term
    byG("a")._2 should be < 1e-6
    val const = Seq(("a", 1.0, 5.0), ("b", 1.0, 7.0)).toDF("g", "x", "y")
    Stats.cuped(const, "y", "x").select(col("adjusted"))
      .collect().map(_.getDouble(0)).sorted shouldBe Array(5.0, 7.0)
  }

  test("srmCheck: hand-computed chi2; zero-observed listed group " +
    "appears; unlisted rows counted") {
    import spark.implicits._
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b") ++
      Seq.fill(7)("ghost")).toDF("g")
    val rows = Stats.srmCheck(df, "g",
      Seq("a" -> 1.0, "b" -> 1.0, "c" -> 2.0)).orderBy("group")
      .collect()
    rows.length shouldBe 3
    val byG = rows.map(r => r.getString(0) -> r).toMap
    byG("a").getLong(1) shouldBe 60L
    byG("c").getLong(1) shouldBe 0L
    // expected: a 25, b 25, c 50 of n=100
    byG("a").getDouble(2) shouldBe (25.0 +- 1e-12)
    byG("c").getDouble(2) shouldBe (50.0 +- 1e-12)
    byG("a").getLong(5) shouldBe 7L // n_unlisted
    val chi2 = math.pow(60 - 25, 2) / 25 + math.pow(40 - 25, 2) / 25 +
      math.pow(0 - 50, 2) / 50
    byG("b").getDouble(6) shouldBe (chi2 +- 1e-9)
  }

  test("simpsonCheck: hand-built paradox flips; balanced strata do " +
    "not") {
    import spark.implicits._
    // classic: treatment wins in BOTH strata, loses pooled.
    // stratum E (easy): treat 10 @ mean 8, control 90 @ mean 7
    // stratum H (hard): treat 90 @ mean 3, control 10 @ mean 2
    // pooled: treat (10*8 + 90*3)/100 = 3.5 ; control (90*7+10*2)/100
    //   = 6.5 -> pooled diff = -3; every stratum diff = +1
    val rows =
      Seq.fill(10)((true, 8.0, "E")) ++ Seq.fill(90)((false, 7.0, "E")) ++
        Seq.fill(90)((true, 3.0, "H")) ++ Seq.fill(10)((false, 2.0, "H"))
    val r = ModelEvalHelpers.one(Stats.simpsonCheck(
      rows.toDF("tr", "y", "st"), "tr", "y", "st"))
    r.getLong(0) shouldBe 200L
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe (-3.0 +- 1e-12)
    r.getDouble(3) shouldBe (1.0 +- 1e-12)
    r.getLong(4) shouldBe 2L
    r.getBoolean(5) shouldBe true

    val balanced = Seq((true, 2.0, "x"), (false, 1.0, "x"),
      (true, 4.0, "y"), (false, 3.0, "y")).toDF("tr", "y", "st")
    val b = ModelEvalHelpers.one(
      Stats.simpsonCheck(balanced, "tr", "y", "st"))
    b.getBoolean(5) shouldBe false
    b.getLong(4) shouldBe 0L
  }

  test("trimmedMean: whale row cannot move the trimmed mean; cuts " +
    "are the exact discrete quantiles") {
    import spark.implicits._
    val base = (1 to 98).map(_.toDouble)
    val withWhale = (base :+ 1.0 :+ 1e9).toDF("v")
    val r = ModelEvalHelpers.one(
      Stats.trimmedMean(withWhale, "v", 0.01, 0.99))
    r.getLong(0) shouldBe 100L
    // cuts: rank ceil(0.01*100)=1 -> 1.0; ceil(0.99*100)=99 -> 98.0
    r.getDouble(2) shouldBe 1.0
    r.getDouble(3) shouldBe 98.0
    r.getLong(1) shouldBe 99L // the 1e9 whale is the only drop
    r.getDouble(4) shouldBe ((base.sum + 1.0) / 99 +- 1e-9)
  }

  test("ratioTest: sum/sum ratios, not mean-of-ratios; degenerate " +
    "group yields NULL se/z") {
    import spark.implicits._
    // a: units (x,y) = (1,2), (3,2) -> ratio 4/4 = 1.0 (mean of
    // per-unit ratios would be (0.5 + 1.5)/2 = 1.0 here, so also
    // check b where they differ): b: (1,1), (1,4) -> 2/5 = 0.4
    // (mean-of-ratios 0.625)
    val df = Seq(("a", 1.0, 2.0), ("a", 3.0, 2.0),
      ("b", 1.0, 1.0), ("b", 1.0, 4.0)).toDF("g", "x", "y")
    val r = ModelEvalHelpers.one(Stats.ratioTest(df, "g", "x", "y", "a", "b"))
    r.getDouble(2) shouldBe (1.0 +- 1e-12)
    r.getDouble(3) shouldBe (0.4 +- 1e-12)
    r.getDouble(4) shouldBe (0.6 +- 1e-12)
    r.getDouble(6) should not be 0.0

    val tiny = Seq(("a", 1.0, 2.0), ("b", 1.0, 1.0), ("b", 2.0, 3.0))
      .toDF("g", "x", "y")
    ModelEvalHelpers.one(Stats.ratioTest(tiny, "g", "x", "y", "a", "b"))
      .isNullAt(5) shouldBe true
  }

  test("quantileTreatmentEffects: per-quantile gaps on a hand case " +
    "where the mean test nets to zero") {
    import spark.implicits._
    // a = [1, 5], b = [3, 3]: equal means; p-low gap -2, p-high +2
    val df = Seq(("a", 1.0), ("a", 5.0), ("b", 3.0), ("b", 3.0))
      .toDF("g", "v")
    val got = Stats.quantileTreatmentEffects(df, "g", "v",
      Seq(0.5, 1.0), "a", "b")
      .collect().map(r => r.getDouble(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    got(0.5) shouldBe ((1.0, 3.0, -2.0))
    got(1.0) shouldBe ((5.0, 3.0, 2.0))
    ModelEvalHelpers.one(Stats.welchTTest(df, "g", "v", "a", "b"))
      .getDouble(4) shouldBe (0.0 +- 1e-12) // the mean saw nothing
  }

  test("decompose: recovers a constructed linear trend + period-3 " +
    "seasonality with zero residual away from the edges") {
    import spark.implicits._
    // v(t) = 2t + s(t%3), s = (3, -1, -2) -> sums to 0 per cycle.
    // centered MA over a full period window (w=1 covers 3 points)
    // averages the seasonal away on a linear trend.
    val season = Array(3.0, -1.0, -2.0)
    val rows = (0L until 30L).map(t =>
      (t, 2.0 * t + season((t % 3).toInt)))
    val out = EventStats.decompose(rows.toDF("t", "v"), "t", "v",
      period = 3, trendWindow = 1).orderBy("t").collect()
    // edges: incomplete window -> NULL trend/residual
    out.head.isNullAt(2) shouldBe true
    out.last.isNullAt(2) shouldBe true
    out.drop(1).dropRight(1).foreach { r =>
      val t = r.getLong(0)
      r.getDouble(2) shouldBe (2.0 * t +- 1e-9)          // trend
      r.getDouble(3) shouldBe (season((t % 3).toInt) +- 1e-9)
      r.getDouble(4) shouldBe (0.0 +- 1e-9)              // residual
    }
  }

  test("welchTTestBy: per-segment tests equal per-slice global tests") {
    import spark.implicits._
    val df = Seq(("s1", "a", 1.0), ("s1", "a", 2.0), ("s1", "b", 4.0),
      ("s1", "b", 6.0), ("s2", "a", 1.0), ("s2", "b", 1.0))
      .toDF("seg", "g", "v")
    val by = Stats.welchTTestBy(df, Seq("seg"), "g", "v", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = ModelEvalHelpers.one(Stats.welchTTest(
      df.filter(col("seg") === "s1"), "g", "v", "a", "b"))
    by("s1").getDouble(5) shouldBe s1.getDouble(4) // diff
    by("s1").getDouble(7) shouldBe s1.getDouble(6) // t
    // single-row arms: present, NULL t
    by("s2").isNullAt(7) shouldBe true
  }

  test("seasonalAnomalies: flags only the planted spike, not the " +
    "seasonal shape") {
    import spark.implicits._
    // strong period-3 shape + one spike at t=13
    val season = Array(30.0, -10.0, -20.0)
    val rows = (0L until 30L).map { t =>
      val spike = if (t == 13) 25.0 else 0.0
      (t, 100.0 + season((t % 3).toInt) + spike)
    }
    val got = EventStats.seasonalAnomalies(rows.toDF("t", "v"), "t",
      "v", period = 3, trendWindow = 3, zThreshold = 2.0)
      .collect().map(_.getLong(0))
    got should contain(13L)
    // the seasonal extremes themselves do not flag
    got.length should be <= 5
  }

  test("changePoint: clean level shift found exactly; ties break to " +
    "the smallest split; zero reduction on a constant series") {
    import spark.implicits._
    val shift = ((0L to 9L).map(t => (t, 1.0)) ++
      (10L to 19L).map(t => (t, 5.0))).toDF("t", "v")
    val r = ModelEvalHelpers.one(EventStats.changePoint(shift, "t", "v"))
    r.getLong(1) shouldBe 9L // last index of the left segment
    r.getDouble(3) shouldBe (1.0 +- 1e-12)
    r.getDouble(4) shouldBe (5.0 +- 1e-12)
    r.getDouble(6) shouldBe (0.0 +- 1e-9) // sse at the true split
    r.getDouble(7) shouldBe (r.getDouble(5) +- 1e-9)

    // [1, 2, 1]: splits at t=0 and t=1 tie at sse 0.5 -> t=0 wins
    val tie = Seq((0L, 1.0), (1L, 2.0), (2L, 1.0)).toDF("t", "v")
    ModelEvalHelpers.one(EventStats.changePoint(tie, "t", "v"))
      .getLong(1) shouldBe 0L

    val const = Seq((0L, 3.0), (1L, 3.0), (2L, 3.0)).toDF("t", "v")
    ModelEvalHelpers.one(EventStats.changePoint(const, "t", "v"))
      .getDouble(7) shouldBe (0.0 +- 1e-12)
  }

  test("trendSlope: exact on a line; one outlier moves OLS but not " +
    "Theil-Sen; index shift changes nothing (centered internally)") {
    import spark.implicits._
    val line = (0L to 9L).map(t => (t, 2.0 * t + 1.0)).toDF("t", "v")
    val r = ModelEvalHelpers.one(EventStats.trendSlope(line, "t", "v"))
    r.getLong(1) shouldBe 45L
    r.getDouble(2) shouldBe (2.0 +- 1e-12)
    r.getDouble(3) shouldBe (2.0 +- 1e-12)

    val dirty = (0L to 9L).map(t =>
      (t, if (t == 5) 100.0 else 2.0 * t)).toDF("t", "v")
    val d = ModelEvalHelpers.one(EventStats.trendSlope(dirty, "t", "v"))
    d.getDouble(2) shouldBe (2.0 +- 1e-12) // robust
    d.getDouble(3) should be > 2.5 // OLS owned by the outlier

    // epoch-magnitude indices: centering keeps both slopes exact
    val shifted = (0L to 9L).map(t =>
      (t + 490000L, 2.0 * (t + 490000L) + 1.0)).toDF("t", "v")
    val s2 = ModelEvalHelpers.one(
      EventStats.trendSlope(shifted, "t", "v"))
    s2.getDouble(2) shouldBe (2.0 +- 1e-12)
    s2.getDouble(3) shouldBe (2.0 +- 1e-9)
  }

  test("categoricalProfile: hand-computed entropy/gini/top-share; " +
    "constant column degenerates cleanly") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b").toDF("c")
    val r = ModelEvalHelpers.one(Stats.categoricalProfile(df, "c"))
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 2L
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    r.getDouble(2) shouldBe (h +- 1e-12)
    r.getDouble(3) shouldBe (h / math.log(2.0) +- 1e-12)
    r.getDouble(4) shouldBe (0.375 +- 1e-12)
    r.getDouble(5) shouldBe (0.75 +- 1e-12)

    val const = Seq("x", "x").toDF("c")
    val c = ModelEvalHelpers.one(Stats.categoricalProfile(const, "c"))
    c.getLong(1) shouldBe 1L
    c.getDouble(2) shouldBe (0.0 +- 1e-12)
    c.getDouble(3) shouldBe (0.0 +- 1e-12)
    c.getDouble(5) shouldBe (1.0 +- 1e-12)
  }

  test("eventSeries: dense from first to last bucket with zero fill") {
    import spark.implicits._
    val ev = Seq(0L, 500000L, 3000000L).toDF("ts") // buckets 0,0,3
    val got = EventStats.eventSeries(ev, "ts", 1L)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe Array((0L, 2L), (1L, 0L), (2L, 0L), (3L, 1L))
  }

  test("eventSeries: FLOOR bucketing — pre-1970 (negative-micros) " +
    "timestamps land one bucket LOW, matching the oracle's //") {
    import spark.implicits._
    // -0.5s at 1s buckets: floor(-0.5) = bucket -1, NOT the
    // truncate-toward-zero bucket 0; +0.5s stays in bucket 0
    val ev = Seq(-500000L, 500000L).toDF("ts")
    val got = EventStats.eventSeries(ev, "ts", 1L)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe Array((-1L, 1L), (0L, 1L))
  }
}

/** Tiny shared helper: collect exactly one row. */
private[ops] object ModelEvalHelpers {
  def one(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    rows.head
  }
}
