package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Basket co-occurrence and score evaluation: hand-computed
  * support/confidence/lift, AUC against closed forms (perfect,
  * random-tie, ties), calibration on a planted miscalibrated scorer.
  */
class BasketsModelEvalSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("coOccurrence: hand-computed association stats; in-basket " +
    "duplicates count once") {
    import spark.implicits._
    // baskets: {A,B,C}, {A,B}, {A} (with A duplicated), {B,C}
    val df = Seq((1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"),
      (3, "A"), (3, "A"), (4, "B"), (4, "C")).toDF("b", "i")
    val got = Baskets.coOccurrence(df, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    // n=4 baskets; nA=3 nB=3 nC=2; AB=2, AC=1, BC=2
    got.keySet shouldBe Set(("A", "B"), ("A", "C"), ("B", "C"))
    val ab = got(("A", "B"))
    ab._1 shouldBe 2L
    ab._4 shouldBe (0.5 +- 1e-12)            // support 2/4
    ab._5 shouldBe (2.0 / 3 +- 1e-12)        // confidence 2/3
    ab._6 shouldBe (2.0 * 4 / 9 +- 1e-12)    // lift
    got(("B", "C"))._1 shouldBe 2L
    // minCount prunes
    Baskets.coOccurrence(df, "b", "i", minCount = 2L)
      .count() shouldBe 2L
  }

  test("auc: perfect separation 1.0, inverted 0.0, all-tied 0.5; " +
    "single-class is NULL") {
    import spark.implicits._
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false),
      (0.1, false)).toDF("s", "y")
    ModelEval.auc(perfect, "s", "y").collect().head
      .getDouble(2) shouldBe (1.0 +- 1e-12)
    val inverted = perfect.withColumn("y", !col("y"))
    ModelEval.auc(inverted, "s", "y").collect().head
      .getDouble(2) shouldBe (0.0 +- 1e-12)
    val tied = Seq((0.5, true), (0.5, false), (0.5, true),
      (0.5, false)).toDF("s", "y")
    ModelEval.auc(tied, "s", "y").collect().head
      .getDouble(2) shouldBe (0.5 +- 1e-12)
    val onlyPos = Seq((0.5, true)).toDF("s", "y")
    ModelEval.auc(onlyPos, "s", "y").collect().head
      .isNullAt(2) shouldBe true
  }

  test("auc: hand-computed mixed case with a tie straddling classes") {
    import spark.implicits._
    // scores: 0.1(neg) 0.4(neg) 0.4(pos) 0.8(pos)
    // avg ranks: 1, 2.5, 2.5, 4 -> rankSumPos = 6.5
    // auc = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    val df = Seq((0.1, false), (0.4, false), (0.4, true), (0.8, true))
      .toDF("s", "y")
    ModelEval.auc(df, "s", "y").collect().head
      .getDouble(2) shouldBe (0.875 +- 1e-12)
  }

  test("calibration: a perfectly calibrated bin has zero gap; ece " +
    "aggregates the planted miscalibration") {
    import spark.implicits._
    // bin 2 (scores .25): half positive -> gap .25; bin 7 (scores
    // .75): 3/4 positive -> gap 0
    val rows = Seq.fill(2)((0.25, true)) ++ Seq.fill(2)((0.25, false)) ++
      Seq.fill(3)((0.75, true)) ++ Seq((0.75, false))
    val df = rows.toDF("s", "y")
    val rep = ModelEval.calibrationReport(df, "s", "y", nBins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    rep.keySet shouldBe Set(2L, 7L)
    rep(2L)._2 shouldBe (0.5 +- 1e-12)
    rep(2L)._3 shouldBe (0.25 +- 1e-12)
    rep(7L)._3 shouldBe (0.0 +- 1e-12)
    val e = ModelEval.ece(df, "s", "y", nBins = 10).collect().head
    e.getDouble(0) shouldBe (0.25 * 4 / 8 +- 1e-12)
    // score 1.0 lands in the LAST bin, not bin 10
    val edge = Seq((1.0, true)).toDF("s", "y")
    ModelEval.calibrationReport(edge, "s", "y", 10)
      .collect().head.getLong(0) shouldBe 9L
  }

  test("brierScore: hand-computed mean squared gap and base rate; " +
    "null rows excluded") {
    import spark.implicits._
    val df = Seq((Some(1.0), Some(true)), (Some(0.0), Some(false)),
      (Some(0.5), Some(true)), (Some(0.8), Some(false)),
      (None, Some(true)), (Some(0.3), Option.empty[Boolean]))
      .toDF("s", "y")
    val r = ModelEval.brierScore(df, "s", "y").collect().head
    r.getLong(0) shouldBe 4L
    r.getDouble(1) shouldBe ((0.0 + 0.0 + 0.25 + 0.64) / 4 +- 1e-12)
    r.getDouble(2) shouldBe (0.5 +- 1e-12)
  }

  test("liftTable: hand-computed deciles, gains accumulate to 1, " +
    "a tie group lands whole in the bin of its last row") {
    import spark.implicits._
    // scores 1..20 distinct; positives: 17-20 and 3 -> n_pos = 5
    val df = (1 to 20).map(i =>
      (i.toDouble, i >= 17 || i == 3)).toDF("s", "y")
    val bins = ModelEval.liftTable(df, "s", "y", nBins = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    bins.keySet shouldBe (1L to 5L).toSet
    bins(1L)._1 shouldBe 4L        // 20,19,18,17
    bins(1L)._2 shouldBe 4L
    bins(1L)._3 shouldBe 1.0
    bins(1L)._5 shouldBe (1.0 / (5.0 / 20.0) +- 1e-12) // lift 4x
    bins(1L)._4 shouldBe (4.0 / 5.0 +- 1e-12)          // gains 80%
    bins(5L)._2 shouldBe 1L        // the stray positive at score 3
    bins(5L)._4 shouldBe (1.0 +- 1e-12)                // gains end at 1
    (2L to 4L).map(bins(_)._2).sum shouldBe 0L

    // ties: scores [5,4,3,3,3,1] at nBins=2 — the 3-tie (cum 5 of 6)
    // lands WHOLE in bin 2, so bin 1 holds only 2 rows
    val ties = Seq(5.0, 4.0, 3.0, 3.0, 3.0, 1.0).map((_, false))
      .toDF("s", "y")
    val tb = ModelEval.liftTable(ties, "s", "y", nBins = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tb shouldBe Map(1L -> 2L, 2L -> 4L)
  }
}
