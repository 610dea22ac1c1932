package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{kll_quantile, theta_estimate}

/** Data-quality expectation checks evaluated FROM PROFILE ROWS — never
  * from the raw data. A 100 TB table validates from the kilobytes of
  * sketch state its profile already holds: the report is a pure
  * projection + one explode over the profile frame (constant plan size
  * in check count, the profileDrift shape), so checking 50 expectations
  * over 1000 windows costs the same scan as reading the profiles.
  *
  * The reference profiles exactly the statistics these checks consume
  * (NumberTracker min/max/mean, SchemaTracker inferred type,
  * CountersTracker null counts — core/DatasetProfile.java); the
  * expectation DSL on top is the validation half its host pipelines
  * bolt on.
  */
object Validation {

  /** One declarative expectation against a profiled column. */
  sealed trait Check {
    def column: String
    def name: String
  }
  /** numbers.min >= bound. */
  final case class MinAtLeast(column: String, bound: Double) extends Check {
    val name = "min_at_least"
  }
  /** numbers.max <= bound. */
  final case class MaxAtMost(column: String, bound: Double) extends Check {
    val name = "max_at_most"
  }
  /** numbers.mean in [lo, hi]. */
  final case class MeanBetween(column: String, lo: Double, hi: Double)
      extends Check {
    val name = "mean_between"
  }
  /** null_count / count <= frac (count includes nulls). */
  final case class NullFractionAtMost(column: String, frac: Double)
      extends Check {
    val name = "null_fraction_at_most"
  }
  /** Numeric distinct estimate (Theta) in [lo, hi] — exact below sketch
    * capacity, estimate-accurate above.
    */
  final case class DistinctBetween(column: String, lo: Double, hi: Double)
      extends Check {
    val name = "distinct_between"
  }
  /** KLL quantile(q) <= bound — exact below sketch capacity. */
  final case class QuantileAtMost(column: String, q: Double, bound: Double)
      extends Check {
    val name = "quantile_at_most"
  }
  /** Majority inferred type equals `expected` (e.g. "FRACTIONAL",
    * "INTEGRAL", "STRING", "BOOLEAN"); observed reports the type ratio.
    */
  final case class TypeIs(column: String, expected: String) extends Check {
    val name = "type_is"
  }
  /** numbers.stddev in [lo, hi] — a dispersion gate (e.g. "this feature
    * hasn't collapsed to a constant").
    */
  final case class StddevBetween(column: String, lo: Double, hi: Double)
      extends Check {
    val name = "stddev_between"
  }
  /** HLL distinct estimate / row count in [lo, hi] — catches both
    * exploded-cardinality keys (ratio ~1 where duplicates are expected)
    * and collapsed columns (ratio ~0 where spread is expected).
    */
  final case class UniqueRatioBetween(column: String, lo: Double, hi: Double)
      extends Check {
    val name = "unique_ratio_between"
  }
  /** true_count / count >= frac (boolean columns). */
  final case class TrueFractionAtLeast(column: String, frac: Double)
      extends Check {
    val name = "true_fraction_at_least"
  }

  private def eval(c: Check): (Column, Column) = c match {
    case MinAtLeast(cc, b) =>
      (col(s"$cc.numbers.min"), col(s"$cc.numbers.min") >= b)
    case MaxAtMost(cc, b) =>
      (col(s"$cc.numbers.max"), col(s"$cc.numbers.max") <= b)
    case MeanBetween(cc, lo, hi) =>
      (col(s"$cc.numbers.mean"),
        col(s"$cc.numbers.mean").between(lo, hi))
    case NullFractionAtMost(cc, f) =>
      val frac = col(s"$cc.null_count").cast("double") /
        greatest(col(s"$cc.count"), lit(1L)).cast("double")
      (frac, frac <= f)
    case DistinctBetween(cc, lo, hi) =>
      val est = theta_estimate(col(s"$cc.numbers.theta"))
      (est, est.between(lo, hi))
    case QuantileAtMost(cc, q, b) =>
      val v = kll_quantile(col(s"$cc.numbers.kll"), lit(q))
      (v, v <= b)
    case TypeIs(cc, t) =>
      (col(s"$cc.type_ratio"), col(s"$cc.inferred_type") === t)
    case StddevBetween(cc, lo, hi) =>
      (col(s"$cc.numbers.stddev"),
        col(s"$cc.numbers.stddev").between(lo, hi))
    case UniqueRatioBetween(cc, lo, hi) =>
      val ratio = col(s"$cc.cardinality.estimate") /
        greatest(col(s"$cc.count"), lit(1L)).cast("double")
      (ratio, ratio.between(lo, hi))
    case TrueFractionAtLeast(cc, f) =>
      val frac = col(s"$cc.true_count").cast("double") /
        greatest(col(s"$cc.count"), lit(1L)).cast("double")
      (frac, frac >= f)
  }

  /** Evaluate `checks` against every profile row. Output: `keep` columns
    * (group keys, window) + (check_name, col_name, observed, passed) —
    * one row per (profile row, check); `passed` is 0/1 (a failed or
    * inapplicable check — e.g. numeric bounds on an unprofiled column —
    * reads 0). Single explode, constant plan size in |checks|.
    */
  def report(
      profiles: DataFrame,
      checks: Seq[Check],
      keep: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    val entries = array(checks.map { c =>
      val (observed, passed) = eval(c)
      struct(
        lit(c.name).as("check_name"),
        lit(c.column).as("col_name"),
        observed.cast("double").as("observed"),
        coalesce(passed.cast("int"), lit(0)).as("passed"))
    }: _*)
    profiles
      .select(keep.map(col) :+ explode(entries).as("e"): _*)
      .select(keep.map(col) ++ Seq(
        col("e.check_name").as("check_name"),
        col("e.col_name").as("col_name"),
        col("e.observed").as("observed"),
        col("e.passed").as("passed")): _*)
  }

  /** Gate form of [[report]]: true iff every check passes on every
    * profile row (one tiny aggregate over the report). Vacuously true
    * on an empty profile frame — nothing failed.
    */
  def allPass(
      profiles: DataFrame,
      checks: Seq[Check]): Boolean =
    report(profiles, checks)
      .agg(coalesce(min(col("passed")), lit(1)).as("m"))
      .head().getInt(0) == 1
}
