package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Z-order layout: hand-computed Morton keys, degenerate columns, the
  * multi-column locality property the layout exists for, and the
  * one-exchange plan shape.
  */
class ZOrderLayoutSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("zkey matches the hand-computed Morton interleave") {
    import spark.implicits._
    // x, y in [0, 3] with bits=2: bucket = min(3, floor(v * 4 / 3));
    // x=3,y=3 -> buckets (3,3) -> z = 0b1111 = 15; x=0,y=0 -> 0;
    // x=3,y=0 -> x bits at positions 0 and 2 -> 0b0101 = 5
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0))
      .toDF("x", "y")
    val got = ZOrderLayout.withZKey(df, Seq("x", "y"), bits = 2)
      .collect().map(r => ((r.getDouble(0), r.getDouble(1)),
        r.getLong(2))).toMap
    got((0.0, 0.0)) shouldBe 0L
    got((3.0, 0.0)) shouldBe 5L
    got((0.0, 3.0)) shouldBe 10L
    got((3.0, 3.0)) shouldBe 15L
  }

  test("NULL and constant columns bucket to 0 and drop out of the key") {
    import spark.implicits._
    val df = Seq((Some(1.0), 7.0), (Option.empty[Double], 7.0),
      (Some(2.0), 7.0)).toDF("x", "c")
    val got = ZOrderLayout.withZKey(df, Seq("x", "c"), bits = 2).collect()
    // constant c contributes nothing; null x buckets to 0
    got.foreach { r =>
      val z = r.getLong(2)
      (z & 2L) shouldBe 0L // c's bit positions (1, 3) stay empty
      (z & 8L) shouldBe 0L
    }
  }

  test("z-ordered files have narrow spans on BOTH clustered columns") {
    import spark.implicits._
    // 64x64 grid: a z-order layout into 16 files should give each file
    // ~1/4 of each column's range; a single-column sort would give one
    // column full-range spans
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toDouble, y.toDouble)
    val df = grid.toDF("x", "y").repartition(8)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_zorder_spec").toString
    ZOrderLayout.writeZOrdered(df, Seq("x", "y"), tmp, bits = 6,
      numFiles = 16)
    val back = ZOrderLayout.readZOrdered(spark, tmp)
    back.count() shouldBe (64L * 64L)
    val spans = back.groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .collect()
    spans.length shouldBe 16
    // perfect Z tiling of 16 files over a 64x64 grid = 16x16 tiles;
    // allow slack for range-boundary straddle, but far below the
    // full-range 63 a one-column sort would leave on the other column
    val avgX = spans.map(_.getDouble(1)).sum / spans.length
    val avgY = spans.map(_.getDouble(2)).sum / spans.length
    avgX should be < 32.0
    avgY should be < 32.0
  }

  test("roundtrip preserves rows; plan is stats + map + ONE range " +
      "exchange") {
    import spark.implicits._
    val df = (1 to 1000)
      .map(i => (i.toLong, (i % 97).toDouble, ((i * 31) % 83).toDouble))
      .toDF("id", "a", "b").repartition(8)
    val keyed = ZOrderLayout.withZKey(df, Seq("a", "b"), bits = 8)
      .repartitionByRange(4, col(ZOrderLayout.KeyCol))
      .sortWithinPartitions(col(ZOrderLayout.KeyCol))
    keyed.count() shouldBe 1000L
    val plan = keyed.queryExecution.executedPlan.toString
    "Exchange rangepartitioning".r.findAllIn(plan).length shouldBe 1
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 0
    plan should include ("BroadcastNestedLoopJoin")
  }
}
