package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Deterministic negative sampling: formula pinned against a local md5
  * recompute, self-pair avoidance, domain bounds, partition
  * invariance, and the no-shuffle plan.
  */
class NegativeSamplesSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {
  import spark.implicits._

  private def localDraw(anchor: Long, j: Long, n: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$anchor:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val raw = java.lang.Long.parseLong(hex.substring(0, 13), 16) % n
    if (raw == anchor) (raw + 1) % n else raw
  }

  private val domain = spark.range(0, 40).select(col("id").as("vec_id"))

  test("draws equal a local md5 recompute of the same formula") {
    val got = Sampling.negativeSamples(
      domain.filter(col("vec_id") < 10), "vec_id", k = 3, domain)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.size shouldBe 30
    for (a <- 0L until 10L; j <- 0L until 3L) {
      got((a, j)) shouldBe localDraw(a, j, 40)
    }
  }

  test("no anchor is its own negative; all draws land in [0, N)") {
    val rows = Sampling.negativeSamples(domain, "vec_id", k = 5, domain)
      .collect()
    rows.length shouldBe 200
    rows.foreach { r =>
      r.getLong(2) should not be r.getLong(0)
      r.getLong(2) should (be >= 0L and be < 40L)
    }
  }

  test("partition-invariant: repartition(7) yields identical pairs") {
    val base = Sampling.negativeSamples(domain, "vec_id", 4, domain)
      .collect().map(_.toSeq).toSet
    val rep = Sampling.negativeSamples(domain.repartition(7), "vec_id",
      4, domain).collect().map(_.toSeq).toSet
    rep shouldBe base
  }

  test("zero shuffle: the only non-broadcast plan nodes are row-local") {
    val plan = Sampling.negativeSamples(domain, "vec_id", 4, domain)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(plan).isEmpty shouldBe true
  }

  test("k < 1 is rejected") {
    intercept[IllegalArgumentException] {
      Sampling.negativeSamples(domain, "vec_id", 0, domain)
    }
  }
}
