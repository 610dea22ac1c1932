package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Feature scaling transforms: hand-computable values, group handling,
  * constant-column degenerate cases, and the broadcast-projection plan
  * shape (the corpus side must not shuffle).
  */
class FeatureScaleSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("zscore matches hand-computed values and zeroes constant groups") {
    import spark.implicits._
    // group a: values 1,2,3 -> mean 2, sd 1 -> z = -1, 0, 1
    // group b: constant 7,7 -> sd 0 -> z = 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "x").withColumn("id", monotonically_increasing_id())
    val z = FeatureScale.zscore(df, Seq("x"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    z shouldBe Array(("a", -1.0), ("a", 0.0), ("a", 1.0),
      ("b", 0.0), ("b", 0.0))
    // single-row frame: stddev_samp is null -> 0.0, not NaN
    val one = FeatureScale.zscore(Seq(("a", 5.0)).toDF("g", "x"), Seq("x"))
      .collect().head.getDouble(1)
    one shouldBe 0.0
  }

  test("minMax maps to [0,1] with exact endpoints; constants to 0") {
    import spark.implicits._
    val df = Seq(10.0, 20.0, 15.0, 10.0).toDF("x")
    val got = FeatureScale.minMax(df, Seq("x"))
      .collect().map(_.getDouble(0)).sorted
    got shouldBe Array(0.0, 0.0, 0.5, 1.0)
    FeatureScale.minMax(Seq(3.0, 3.0).toDF("x"), Seq("x"))
      .collect().map(_.getDouble(0)) shouldBe Array(0.0, 0.0)
  }

  test("winsorize clips exactly at the rank-based fences per group") {
    import spark.implicits._
    // 10 values 1..10 in one group: lo fence = smallest rank >= ceil(.1*10)
    // = value at rank 1 = 1; hi = rank >= ceil(.9*10) = value 9
    val df = (1 to 10).map(v => ("g", v.toDouble)).toDF("g", "x")
    val got = FeatureScale.winsorize(df, "x", 0.1, 0.9, Seq("g"))
      .collect().map(_.getDouble(1)).sorted
    got.max shouldBe 9.0 // 10 clipped down
    got.min shouldBe 1.0
    got.count(_ == 9.0) shouldBe 2 // original 9 plus clipped 10
  }

  test("robustScale matches hand-computed median/IQR values") {
    import spark.implicits._
    // 1..10: rank-rule quartiles q1 = ceil(2.5)=rank3 -> 3, q2 -> 5, q3 -> 8
    val df = (1 to 10).map(v => ("g", v.toDouble)).toDF("g", "x")
    val got = FeatureScale.robustScale(df, "x", Seq("g"))
      .collect().map(_.getDouble(1)).sorted
    got.head shouldBe ((1.0 - 5.0) / 5.0 +- 1e-12)
    got.last shouldBe ((10.0 - 5.0) / 5.0 +- 1e-12)
    // constant column: degenerate IQR -> all zeros, no NaN/Infinity
    FeatureScale.robustScale(Seq(("g", 4.0), ("g", 4.0)).toDF("g", "x"), "x")
      .collect().map(_.getDouble(1)) shouldBe Array(0.0, 0.0)
  }

  test("transforms keep schema and row count; apply side is projection-only") {
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).cast("double").as("x"),
        (col("id") % 3).cast("string").as("g"))
    val z = FeatureScale.zscore(df, Seq("x"), Seq("g"))
    z.columns.toSeq shouldBe df.columns.toSeq
    z.count() shouldBe 1000L
    // the only exchanges feed the stats aggregate / its broadcast — the
    // data side reaches the projection through scan -> broadcast join
    val plan = z.queryExecution.executedPlan.toString
    plan should include ("BroadcastHashJoin")
  }

  test("NULL-key rows form a real stratum and are never dropped") {
    import spark.implicits._
    // groupBy computes a NULL-key stratum; the stats join back must be
    // null-safe or every NULL-key row silently vanishes from the output
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 30.0))
      .toDF("g", "x")
    val z = FeatureScale.zscore(df, Seq("x"), Seq("g"))
    z.count() shouldBe 4L
    // NULL group: mean 20, sd = sqrt(200) -> z = -+10/sqrt(200)
    val nz = z.filter(col("g").isNull).collect().map(_.getDouble(1)).sorted
    nz(0) shouldBe (-10.0 / math.sqrt(200.0) +- 1e-12)
    nz(1) shouldBe (10.0 / math.sqrt(200.0) +- 1e-12)
    // same guarantee for every transform that joins stats back
    FeatureScale.minMax(df, Seq("x"), Seq("g")).count() shouldBe 4L
    FeatureScale.robustScale(df, "x", Seq("g")).count() shouldBe 4L
    FeatureScale.winsorize(df, "x", 0.1, 0.9, Seq("g")).count() shouldBe 4L
  }

  test("percentileRanks: exact cume_dist semantics with duplicates") {
    import spark.implicits._
    // values 1,2,2,5: rank(1)=1/4, rank(2)=3/4 (peers count), rank(5)=1
    val df = Seq(1.0, 2.0, 2.0, 5.0).toDF("x")
    val got = FeatureScale.percentileRanks(df, "x")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    got shouldBe Array((1.0, 0.25), (2.0, 0.75), (5.0, 1.0))
  }

  test("percentileRanks equals the window cume_dist on a random frame") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 7919) % 23 + 1).toDouble).toDF("x")
      .repartition(8)
    val want = df.select(col("x"),
        cume_dist().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("x"))).as("pr"))
      .distinct().collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val got = FeatureScale.percentileRanks(df, "x")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    got shouldBe want
  }

  test("percentileRanks per group: groups rank independently, NULL key " +
      "is a stratum, NULL values carry no rank") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Option.empty[String], Some(4.0)), (Option.empty[String], Some(8.0)),
      (Some("a"), Option.empty[Double]))
      .toDF("g", "x")
    val got = FeatureScale.percentileRanks(df, "x", Seq("g"))
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
        r.getDouble(1), r.getDouble(2))).toSet
    // the NULL-x row is excluded from ranking entirely
    got shouldBe Set(("a", 1.0, 0.5), ("a", 2.0, 1.0),
      ("<null>", 4.0, 0.5), ("<null>", 8.0, 1.0))
    // attach: original row count preserved; the NULL-x row gets NULL rank
    val attached = FeatureScale.percentileRank(df, "x", Seq("g"))
    attached.count() shouldBe 5L
    attached.filter(col("x").isNull).select(col("pct_rank"))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("percentileRank attach is invariant to input partitioning") {
    import spark.implicits._
    def frame(n: Int) = (1 to 200)
      .map(i => (i.toLong, ((i * 31) % 13).toDouble)).toDF("id", "x")
      .repartition(n)
    val a = FeatureScale.percentileRank(frame(1), "x")
      .collect().map(_.toSeq).toSet
    val b = FeatureScale.percentileRank(frame(32), "x")
      .collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("percentile prefix-sum passes read ONE materialized range " +
      "partitioning; no corpus-scale global window") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 17) % 97).toDouble).toDF("x")
      .repartition(8)
    val (ranks, release) =
      FeatureScale.percentileRanksReleasable(df, "x")
    try {
      ranks.collect()
      val plan = ranks.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // same re-sampling argument as PackingSpec: two physical range
      // exchanges could disagree on boundaries and corrupt offsets
      "Exchange rangepartitioning".r.findAllIn(plan).length shouldBe 1
      "InMemoryTableScan".r.findAllIn(plan).length should be >= 1
      // the corpus collapses to distinct values through ONE partial+final
      // count aggregate before any exchange
      plan should include ("partial_count")
    } finally release()
  }

  test("runningTotals: __cum/__n match a global-window oracle on asc, " +
    "desc, and weighted orderings") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 400)
      .map(i => (((i * 37) % 89).toDouble, i.toLong, ((i * 13) % 7 + 1).toLong))
      .toDF("x", "id", "w").repartition(8)

    // weight 1 over (x asc, id asc) == global row_number
    val (rn, rel1) = FeatureScale.runningTotalsReleasable(
      df, Seq(col("x").asc, col("id").asc), lit(1L))
    try {
      val got = rn.select(col("id"), col("__cum"), col("__n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val want = df.withColumn("__rn", row_number().over(
          Window.orderBy(col("x").asc, col("id").asc)))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("__rn").toLong, 400L))
        .sortBy(_._1)
      got shouldBe want
    } finally rel1()

    // real weights over a DESC ordering == windowed running sum
    val (ws, rel2) = FeatureScale.runningTotalsReleasable(
      df, Seq(col("x").desc, col("id").asc), col("w"))
    try {
      val got = ws.select(col("id"), col("__cum"), col("__n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val want = df.withColumn("__cum", sum(col("w")).over(
          Window.orderBy(col("x").desc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__n", sum(col("w")).over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("__cum"),
          r.getAs[Long]("__n")))
        .sortBy(_._1)
      got shouldBe want
    } finally rel2()
  }

  test("runningTotals plan: one range exchange, offsets window bounded " +
    "by __pid — no unpartitioned corpus-scale window") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 17) % 97).toDouble).toDF("x")
      .withColumn("id", monotonically_increasing_id()).repartition(8)
    val (out, release) = FeatureScale.runningTotalsReleasable(
      df, Seq(col("x").asc, col("id").asc), lit(1L))
    try {
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      "Exchange rangepartitioning".r.findAllIn(plan).length shouldBe 1
      // every unpartitioned window in the plan orders by __pid — the
      // #partitions-row offsets frame, bounded by construction
      // both the offsets window (orders by __pid) and the running
      // window (partitions by __pid) are keyed on the partition id
      val winLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
      winLines should not be empty
      winLines.filterNot(_.contains("__pid")) shouldBe empty
    } finally release()
  }

  test("runningTotalsMulti rejects duplicate weight names (a dup would " +
    "silently overwrite the earlier weight column)") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("t", "v")
    val e = intercept[IllegalArgumentException] {
      FeatureScale.runningTotalsMultiReleasable(df, Seq(col("t")),
        Seq("w" -> lit(1L), "w" -> col("v")))
    }
    e.getMessage should include("duplicate weight names")
  }
}
