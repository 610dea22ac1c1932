package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Negative-zero hygiene for the oracle board.
  *
  * The driver hashes FORMATTED values, and DuckDB's round() preserves the
  * sign of a tiny negative (round(-1e-9, 2) = -0.0) while Spark's round()
  * goes through BigDecimal and cannot produce a signed zero. Any oracle
  * that rounds a signed near-zero quantity (z-scores, scaled features,
  * PSI/KL, logits, cosines, negated entropies) must therefore normalize
  * with `+ 0.0` (IEEE: -0.0 + 0.0 = +0.0; every other value unchanged).
  * This spec pins that convention per signed output column so a future
  * oracle edit cannot silently reintroduce the r5/r6 hash-miss class.
  */
class NegativeZeroSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  /** (query, signed output column) pairs whose oracle rounds a quantity
    * that can be negative-tiny; each must carry the `+ 0.0` normalizer.
    */
  private val signedRoundedColumns: Seq[(String, String)] = Seq(
    "q27_entropy_segmentation" -> "entropy", // -1.0 * sum(...) hits -0.0 at zero entropy
    "q45_embedding_top1" -> "cosine",
    "q61_psi_drift" -> "psi",
    "q61_psi_drift" -> "kl",
    "q69_drift_monitor" -> "psi",
    "q72_streaming_drift" -> "psi",
    "q97_char_entropy" -> "entropy",
    "q99_feature_scale" -> "z",
    "q102_drift_autoedges" -> "psi",
    "q103_robust_scale" -> "acctbal_r",
    "q104_linear_score" -> "logit",
    "q107_metric_anomalies" -> "z")

  test("every signed rounded oracle column carries the + 0.0 normalizer") {
    signedRoundedColumns.foreach { case (query, colName) =>
      val sql = SparkEntry.oracleSql.getOrElse(
        query, fail(s"$query missing from oracleSql"))
      withClue(s"$query.$colName: ") {
        sql should include(s"+ 0.0 AS $colName")
      }
    }
  }

  test("no oracle rounds a bare signed-zero source without normalizing") {
    // Any alias list drift is caught above; this guards the inverse: the
    // known signed sources must never reappear rounded WITHOUT + 0.0.
    val signedSourcePattern =
      """round\((?:zv|logit|h)\s*,\s*\d+\)\s+AS""".r
    SparkEntry.oracleSql.foreach { case (query, sql) =>
      withClue(s"$query: ") {
        signedSourcePattern.findFirstIn(sql) shouldBe empty
      }
    }
  }

  test("spark round() cannot emit -0.0 (so the fix is oracle-side only)") {
    import spark.implicits._
    val out = Seq(-1e-9, -0.0, 0.0).toDF("v")
      .select(round(col("v"), 2).as("r")).as[Double].collect()
    out.foreach { r =>
      r shouldBe 0.0
      // bit-exact: +0.0 has raw bits 0; -0.0 has the sign bit set
      java.lang.Double.doubleToRawLongBits(r) shouldBe 0L
    }
  }
}
