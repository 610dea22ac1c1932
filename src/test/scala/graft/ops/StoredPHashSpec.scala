package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored pHash index: the frequency-domain twin of
  * [[StoredImageHashSpec]] — exact copies recover at hamming 0,
  * appends grow the store, and the stored side never re-exchanges.
  */
class StoredPHashSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {
  import spark.implicits._

  private def refDf: DataFrame =
    (0L until 30L).map(id => (id, Media.synthesizePpm(id)))
      .toDF("id", "blob")

  test("exact copies recover at hamming 0; contrast-scaled copies " +
    "too (the pHash invariant carries to the store)") {
    def mkBlob(scale: Int) = {
      val px = Array.tabulate(40 * 36 * 3) { i =>
        val x = (i / 3) % 40; val y = i / 120
        (((x * 2 + y + (x * y) % 7) % 100) * scale).toByte
      }
      Media.encodePpm(Media.PpmImage(40, 36, px))
    }
    val ref = refDf.unionAll(Seq((500L, mkBlob(1))).toDF("id", "blob"))
    Media.writePHashReference(ref, "id", "blob", "ph_ref_eq",
      numBuckets = 4)
    try {
      val batch = ((0L until 10L).map(id =>
        (id + 1000L, Media.synthesizePpm(id))) ++
        Seq((1500L, mkBlob(2))))  // x2 contrast: identical pHash
        .toDF("id", "blob")
      val got = Media.pHashNearDupsStored(batch, "ph_ref_eq",
        "id", "blob", maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      (0L until 10L).foreach { id =>
        got.get((id + 1000L, id)) shouldBe Some(0)
      }
      got.get((1500L, 500L)) shouldBe Some(0)
    } finally spark.sql("DROP TABLE IF EXISTS ph_ref_eq_buckets")
  }

  test("append grows the store; the stored side never re-exchanges") {
    Media.writePHashReference(refDf, "id", "blob", "ph_ref_grow",
      numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Media.appendPHashReference(
        (30L until 40L).map(id => (id, Media.synthesizePpm(id)))
          .toDF("id", "blob"), "id", "blob", "ph_ref_grow")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = (25L until 40L).map(id =>
        (id + 1000L, Media.synthesizePpm(id))).toDF("id", "blob")
      val res = Media.pHashNearDupsStored(batch, "ph_ref_grow",
        "id", "blob", maxHamming = 0)
      val found = res.collect()
        .map(r => (r.getLong(0) - 1000L, r.getLong(1)))
        .filter(p => p._1 == p._2).toSet
      // copies of both the original AND the appended ids resolve
      found.map(_._1) shouldBe (25L until 40L).toSet
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ph_ref_grow_buckets")
    }
  }
}
