package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored image-hash index: incremental image dedup against persisted
  * band buckets — exact copies recover at hamming 0, perturbed copies
  * within the banded bound, and the stored side never re-exchanges.
  */
class StoredImageHashSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {
  import spark.implicits._

  private def refDf: DataFrame =
    (0L until 30L).map(id => (id, Media.synthesizePpm(id)))
      .toDF("id", "blob")

  test("exact and perturbed copies are recovered against the store") {
    def mkBlob(f: (Int, Int) => Int) = {
      val px = Array.tabulate(18 * 16 * 3)(i => f((i / 3) % 18, i / 54))
        .map(v => (((v % 256) + 256) % 256).toByte)
      Media.encodePpm(Media.PpmImage(18, 16, px))
    }
    val baseF = (x: Int, y: Int) => 7 * x + 11 * y
    val base = mkBlob(baseF)
    val near = mkBlob((x, y) =>
      if (x == 4 && y == 6) 180 - baseF(x, y) else baseF(x, y))
    val ref = refDf.unionAll(Seq((500L, base)).toDF("id", "blob"))
    Media.writeImageHashReference(ref, "id", "blob", "img_ref_eq",
      numBuckets = 4)
    try {
      // batch: copies of stored ids 0-9 at +1000, the near-variant of
      // stored 500, and 10 fresh images
      val batch = ((0L until 10L).map(id =>
        (id + 1000L, Media.synthesizePpm(id))) ++
        Seq((1500L, near)) ++
        (200L until 210L).map(id => (id, Media.synthesizePpm(id))))
        .toDF("id", "blob")
      val got = Media.imageHashNearDupsStored(batch, "img_ref_eq",
        "id", "blob", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      (0L until 10L).foreach { id =>
        got.get((id + 1000L, id)) shouldBe Some(0)
      }
      got.keys.count(_._1 == 1500L) should be >= 1
      got.get((1500L, 500L)).foreach(_ should be <= 2)
    } finally spark.sql("DROP TABLE IF EXISTS img_ref_eq_buckets")
  }

  test("agrees with the in-memory pair path on planted copies") {
    Media.writeImageHashReference(refDf, "id", "blob", "img_ref_agree",
      numBuckets = 4)
    try {
      val batch = (0L until 30L).map(id =>
        (id + 1000L, Media.synthesizePpm(id))).toDF("id", "blob")
      val stored = Media.imageHashNearDupsStored(batch, "img_ref_agree",
        "id", "blob", maxHamming = 3)
        .collect().map(r => (r.getLong(0) - 1000L, r.getLong(1)))
        .filter(p => p._1 == p._2).toSet
      stored.size shouldBe 30 // every copy found its original
    } finally spark.sql("DROP TABLE IF EXISTS img_ref_agree_buckets")
  }

  test("the stored side never re-exchanges") {
    Media.writeImageHashReference(refDf, "id", "blob", "img_ref_plan",
      numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = (0L until 5L).map(id =>
        (id + 1000L, Media.synthesizePpm(id))).toDF("id", "blob")
      val res = Media.imageHashNearDupsStored(batch, "img_ref_plan",
        "id", "blob", maxHamming = 3)
      res.collect()
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // probe bands on bb + the pair distinct — both batch-derived;
      // the bucketed stored scan contributes zero hash exchanges
      "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS img_ref_plan_buckets")
    }
  }
}
