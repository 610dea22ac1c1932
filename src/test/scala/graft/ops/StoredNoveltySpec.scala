package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored-corpus novelty: [[TextOps.writeNoveltyReference]] persists the
  * reference gram-hash set as a bucketed table so that scoring a new
  * batch (a) gives EXACTLY the two-frame [[TextOps.ngramNovelty]]
  * numbers and (b) never re-exchanges the corpus-sized reference side —
  * the bucketed scan's hash partitioning feeds the membership join
  * directly, so only the incoming batch's grams shuffle.
  */
class StoredNoveltySpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def exchanges(df: DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r.findAllIn(
      df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)).length
  }

  // spark.range-backed synthetic docs (a Seq.toDF would collapse to
  // LocalRelation and hide the plan shape): 12 words drawn from a
  // 40-word vocab by a pattern that repeats mod 40 (so probe ids 0-59
  // share most grams with reference ids 60-119), plus one per-doc
  // unique word at position 5 (so every probe doc also has grams NO
  // reference doc can contain) — novelty lands strictly in (0, 1).
  private def docs(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        if (j == 5) concat(lit("u"), col("id").cast("string"))
        else concat(lit("w"), ((col("id") * 7 + lit(j * j)) % 40)
          .cast("string"))): _*).as("text"))

  test("stored novelty matches the two-frame form row-for-row") {
    val ref = docs(60, 120)
    val probe = docs(0, 60)
    TextOps.writeNoveltyReference(ref, "text", n = 3,
      table = "nov_ref_eq", numBuckets = 4)
    try {
      val stored = TextOps.ngramNoveltyStored(
        probe, "nov_ref_eq", "doc_id", "text", n = 3)
      val direct = TextOps.ngramNovelty(
        probe, ref, "doc_id", "text", n = 3)
      val a = stored.orderBy("doc_id").collect().toSeq
      val b = direct.orderBy("doc_id").collect().toSeq
      a shouldBe b
      a.size shouldBe 60
      // the fixture must actually exercise both branches of membership
      a.map(_.getAs[Double]("novelty")).exists(_ > 0.0) shouldBe true
      a.map(_.getAs[Double]("novelty")).exists(_ < 1.0) shouldBe true
    } finally spark.sql("DROP TABLE IF EXISTS nov_ref_eq")
  }

  test("stored reference never re-exchanges: one fewer shuffle than " +
    "the two-frame plan, which re-distincts the reference per run") {
    val ref = docs(60, 120)
    val probe = docs(0, 60)
    TextOps.writeNoveltyReference(ref, "text", n = 3,
      table = "nov_ref_plan", numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the merge-join path: a broadcast of the (here tiny)
      // reference would hide the partitioning the store provides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val stored = TextOps.ngramNoveltyStored(
        probe, "nov_ref_plan", "doc_id", "text", n = 3)
      val direct = TextOps.ngramNovelty(
        probe, ref, "doc_id", "text", n = 3)
      // stored plan: probe grams -> join key, post-join doc_id agg.
      // The bucketed reference scan contributes ZERO exchanges.
      exchanges(stored) shouldBe 2
      // control: the two-frame form additionally shuffles the
      // reference grams for its distinct
      exchanges(direct) shouldBe 3
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS nov_ref_plan")
    }
  }
}
