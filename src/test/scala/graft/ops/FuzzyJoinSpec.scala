package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Fuzzy record-linkage join: hand-checked edit distances, blocking
  * recall on the documented regimes, and candidate-shape plan checks.
  */
class FuzzyJoinSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("pairs within maxDist survive with the exact distance; " +
    "beyond-threshold pairs are cut") {
    import spark.implicits._
    val l = Seq((1L, "smith"), (2L, "jones"), (3L, "smyth"))
      .toDF("id", "name")
    val r = Seq((10L, "smith"), (11L, "smithe"), (12L, "bones"))
      .toDF("id", "name")
    val got = Joins.fuzzyJoin(l, r, "id", "name", maxDist = 2)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getInt(4)))
      .toSet
    got should contain((1L, 10L, 0))  // smith == smith
    got should contain((1L, 11L, 1))  // smith -> smithe
    got should contain((3L, 10L, 1))  // smyth -> smith
    got should contain((3L, 11L, 2))  // smyth -> smithe
    got should contain((2L, 12L, 1))  // jones -> bones (first-char edit)
    // smith vs jones = 5 edits: never a pair
    got.map(p => (p._1, p._2)) should not contain ((1L, 12L))
  }

  test("recall equals brute force on a same-first-char corpus " +
    "(provably lossless blocking: prefix constant, bands complete)") {
    import spark.implicits._
    val names = (0 until 120).map(i => (i.toLong, f"Customer#$i%05d"))
    val l = names.toDF("id", "name")
    // perturb: one digit substituted -> dist 1 (or 0 for unchanged)
    val r = names.map { case (i, n) =>
      (i + 1000L, if (i % 3 == 0) n.dropRight(1) + "X" else n)
    }.toDF("id", "name")
    val fuzzy = Joins.fuzzyJoin(l, r, "id", "name", maxDist = 1)
      .select(col("left_id"), col("right_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = l.crossJoin(
        r.withColumnRenamed("id", "rid").withColumnRenamed("name", "rname"))
      .filter(levenshtein(col("name"), col("rname")) <= 1)
      .select(col("id"), col("rid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    fuzzy shouldBe brute
    brute should not be empty
  }

  test("duplicate blocks yield ONE output pair; null keys drop") {
    import spark.implicits._
    val l = Seq((1L, "ab"), (2L, null.asInstanceOf[String]))
      .toDF("id", "name")
    val r = Seq((10L, "ab")).toDF("id", "name")
    val got = Joins.fuzzyJoin(l, r, "id", "name", maxDist = 1)
      .collect()
    got.length shouldBe 1
    got.head.getInt(4) shouldBe 0
  }

  test("candidate generation is an equi-join on block keys, not a " +
    "cartesian product") {
    import spark.implicits._
    val l = (0 until 300).map(i => (i.toLong, s"name$i")).toDF("id", "k")
    val r = (0 until 300).map(i => (i.toLong, s"name$i")).toDF("id", "k")
    val plan = Joins.fuzzyJoin(l, r, "id", "k", maxDist = 1)
      .queryExecution.sparkPlan.toString
    plan shouldNot include("CartesianProduct")
    plan shouldNot include("BroadcastNestedLoopJoin")
  }
}
