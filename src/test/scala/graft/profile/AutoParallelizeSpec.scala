package graft.profile

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.profile.ProfileSession.ProfilingOps

/** The update-pass parallelism rule of [[ProfileSession.aggProfiles]]:
  * the sketch updates run in the PARTIAL aggregate — on the input's own
  * partitions — so an under-split input must be round-robin repartitioned
  * to the session's shuffle parallelism first (measured at sf0.1: a
  * 150-column profile on a 3-split scan took 22.5 s vs 7 s repartitioned
  * to 32), while a well-split input must keep the single-shuffle
  * states-only plan (the 100 TB shape).
  */
class AutoParallelizeSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def base = {
    import spark.implicits._
    (1 to 200).map(i => (i.toLong, i * 1.5, s"v${i % 7}"))
      .toDF("id", "x", "s")
  }

  test("under-split input is round-robin repartitioned to shuffle parallelism") {
    // 1 partition, shuffle.partitions = 4 in the suite session -> fires
    val p = plan(base.coalesce(1).newProfilingSession().aggProfiles())
    p.toLowerCase should include ("roundrobinpartitioning(4")
  }

  test("well-split input keeps the states-only single-shuffle plan") {
    // 4 partitions == shuffle parallelism -> the rule must NOT add a
    // data shuffle (at corpus scale inputs are always well-split)
    val p = plan(base.repartition(4).newProfilingSession()
      .groupBy("s").aggProfiles())
    // exactly the upstream repartition's round-robin, none added by the
    // session: one occurrence, and one hash exchange for the groupBy
    "roundrobinpartitioning".r.findAllIn(p.toLowerCase).length shouldBe 1
    "Exchange hashpartitioning".r.findAllIn(p).length shouldBe 1
  }

  test("withParallelism pins the update-pass width explicitly") {
    val p = plan(base.repartition(4).newProfilingSession()
      .withParallelism(3).aggProfiles())
    p.toLowerCase should include ("roundrobinpartitioning(3")
  }

  test("spark.graft.profile.autoParallelize=false opts out") {
    spark.conf.set("spark.graft.profile.autoParallelize", "false")
    try {
      val p = plan(base.coalesce(1).newProfilingSession().aggProfiles())
      p.toLowerCase should not include "roundrobinpartitioning"
    } finally spark.conf.unset("spark.graft.profile.autoParallelize")
  }

  test("widening projections shuffle NARROW: the round-robin exchange " +
    "ships the source rows, not the projected ones") {
    // 40 derived columns over a 3-column 1-partition source: the
    // parallelize repartition fires, and NarrowRepartitionRule must hoist
    // the widening projection ABOVE it so the exchange carries 3 columns
    val wide = base.coalesce(1).select(
      (0 until 40).map(i => (col("x") + lit(i)).as(s"w$i")): _*)
    val prof = wide.newProfilingSession().aggProfiles()
    val reparts = prof.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }
    reparts should have size 1
    // the exchange input is the narrow source projection (pruned to the
    // single referenced column), NOT the 40 widened columns
    reparts.head.output.length should be < 40
    // and the profile still computes over all 40
    prof.schema.fields.count(_.name.startsWith("w")) shouldBe 40
    prof.select(col("w39.count")).collect().head.getLong(0) shouldBe 200L
  }

  test("variable-length child rows disable the hoist: numerics derived " +
    "from a string column must NOT ship the text through the exchange") {
    // static defaultSize counts a string as ~20 bytes, so 40 derived
    // numerics would look "widening" over (x, s) — but the real rows
    // carry arbitrary-length text and hoisting would shuffle it. The
    // fixedWidth guard keeps the projection BELOW the exchange.
    val wide = base.coalesce(1).select(
      (0 until 40).map(i =>
        (org.apache.spark.sql.functions.length(col("s")) + col("x") +
          lit(i)).as(s"w$i")): _*)
    val prof = wide.newProfilingSession().aggProfiles()
    val reparts = prof.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
          if r.shuffle => r
    }
    reparts should have size 1
    // the exchange input is the PROJECTED fixed-width rows (40 cols),
    // proving the string never rides the shuffle
    reparts.head.output.length shouldBe 40
    prof.select(col("w0.count")).collect().head.getLong(0) shouldBe 200L
  }

  test("parallelized profile equals the as-is profile exactly") {
    val direct = {
      spark.conf.set("spark.graft.profile.autoParallelize", "false")
      try base.coalesce(1).newProfilingSession().groupBy("s").aggProfiles()
        .select(col("s"), col("x.count"), col("x.numbers.sum"),
          col("x.numbers.min"), col("x.numbers.max"),
          col("id.cardinality.estimate"))
        .collect().map(_.toSeq).toSet
      finally spark.conf.unset("spark.graft.profile.autoParallelize")
    }
    val auto = base.coalesce(1).newProfilingSession().groupBy("s").aggProfiles()
      .select(col("s"), col("x.count"), col("x.numbers.sum"),
        col("x.numbers.min"), col("x.numbers.max"),
        col("id.cardinality.estimate"))
      .collect().map(_.toSeq).toSet
    auto shouldBe direct
  }
}
