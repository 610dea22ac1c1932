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

  /** Referential-integrity check: how many child rows reference a key
    * absent from the parent table (the FK-violation counter every
    * warehouse validation suite runs). One row: n_child (non-null
    * keys), n_orphans, n_null_keys, orphan_frac. NULL child keys are
    * counted separately, never as orphans (SQL FK semantics).
    *
    * Scale shape: the parent reduces to its DISTINCT keys before the
    * join (parent payload never moves), the child streams through a
    * left-anti-style presence join keyed on the FK, and only the
    * final 1-row count aggregate leaves it.
    */
  def referentialIntegrity(
      child: DataFrame,
      childKeyCols: Seq[String],
      parent: DataFrame,
      parentKeyCols: Seq[String]): DataFrame = {
    require(childKeyCols.nonEmpty &&
      childKeyCols.size == parentKeyCols.size,
      "child/parent key column lists must be non-empty and same-length")
    val anyNull = childKeyCols.map(col(_).isNull).reduce(_ || _)
    val pkeys = parent
      .filter(parentKeyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(parentKeyCols.zip(childKeyCols)
        .map { case (p, c) => col(p).as(c) }: _*)
      .distinct()
      .withColumn("__present", lit(1))
    val nullCount = child.filter(anyNull).count()
    val joined = child.filter(!anyNull)
      .join(pkeys, childKeyCols, "left")
    joined.agg(
        count(lit(1)).as("n_child"),
        sum(when(col("__present").isNull, 1L).otherwise(0L))
          .as("n_orphans"))
      .select(col("n_child"), col("n_orphans"),
        lit(nullCount).as("n_null_keys"),
        when(col("n_child") > 0,
          col("n_orphans").cast("double") / col("n_child"))
          .otherwise(lit(0.0)).as("orphan_frac"))
  }

  /** Key-uniqueness report: one row with n_rows, n_keys (distinct
    * non-null key tuples), n_dupe_keys (keys appearing more than
    * once), n_dupe_rows (rows beyond the first per key), n_null_rows
    * (rows with any NULL key part), and dupe_frac. The "is this
    * really a primary key" pre-flight. One hash aggregate to per-key
    * counts, one bounded re-aggregation.
    */
  def uniquenessReport(
      df: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val nullRows = df.filter(anyNull).count()
    df.filter(!anyNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_dupe_keys"),
        coalesce(sum(when(col("__c") > 1, col("__c") - 1)
          .otherwise(0L)), lit(0L)).as("n_dupe_rows"))
      .select(col("n_rows"), col("n_keys"), col("n_dupe_keys"),
        col("n_dupe_rows"), lit(nullRows).as("n_null_rows"),
        when(col("n_rows") > 0,
          col("n_dupe_rows").cast("double") / col("n_rows"))
          .otherwise(lit(0.0)).as("dupe_frac"))
  }
}
