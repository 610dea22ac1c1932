package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored audio-fingerprint index: incremental audio dedup against the
  * persisted (block, fp) buckets — amplified copies recover with the
  * full shared-block count, the stored path agrees with the in-memory
  * pair path, appends grow the store with a read-time bucket cap, and
  * the stored side never re-exchanges.
  */
class StoredAudioFpSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {
  import spark.implicits._

  private def noise(id: Long, amp: Int = 1): Array[Byte] = {
    val base = Media.synthesizeWavNoise(id)
    if (amp == 1) base
    else {
      val buf = java.nio.ByteBuffer.wrap(base.clone())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 44
      while (i + 1 < base.length) {
        buf.putShort(i, (buf.getShort(i) * amp).toShort); i += 2
      }
      buf.array()
    }
  }

  private def refDf: DataFrame =
    (0L until 30L).map(id => (id, noise(id))).toDF("id", "blob")

  private def blocks(id: Long): Long =
    ((1600 + (id % 3) * 160) / 16 - 1) / 8

  test("amplified copies recover with the full shared-block count; " +
    "fresh clips match nothing") {
    Media.writeAudioFpReference(refDf, "id", "blob", "au_ref_eq",
      windowFrames = 16, numBuckets = 4)
    try {
      val batch = ((0L until 10L).map(id => (id + 1000L, noise(id, 4))) ++
        (200L until 210L).map(id => (id, noise(id))))
        .toDF("id", "blob")
      val got = Media.audioNearDupsStored(batch, "au_ref_eq", "id",
          "blob", windowFrames = 16, minSharedBlocks = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      got.keySet shouldBe (0L until 10L).map(id => (id + 1000L, id)).toSet
      got.foreach { case ((_, ref), n) => n shouldBe blocks(ref) }
    } finally spark.sql("DROP TABLE IF EXISTS au_ref_eq_buckets")
  }

  test("append grows the store; the read-time cap drops buckets grown " +
    "past it across appends") {
    // every clip IDENTICAL -> each (block, fp) bucket holds all ids
    val same = (0L until 8L).map(i => (i, noise(77L))).toDF("id", "blob")
    Media.writeAudioFpReference(same, "id", "blob", "au_ref_grow",
      windowFrames = 16, numBuckets = 2, maxBucketSize = 20)
    try {
      Media.appendAudioFpReference(
        (8L until 16L).map(i => (i, noise(77L))).toDF("id", "blob"),
        "au_ref_grow", "id", "blob", windowFrames = 16)
      val probe = Seq((999L, noise(77L, 4))).toDF("id", "blob")
      // 16 stored twins under the default cap
      Media.audioNearDupsStored(probe, "au_ref_grow", "id", "blob",
        windowFrames = 16, minSharedBlocks = 1).count() shouldBe 16L
      // bucket size 16 > 10: the read-time cap kills the fan-out
      Media.audioNearDupsStored(probe, "au_ref_grow", "id", "blob",
        windowFrames = 16, minSharedBlocks = 1, maxBucketSize = 10)
        .count() shouldBe 0L
    } finally spark.sql("DROP TABLE IF EXISTS au_ref_grow_buckets")
  }

  test("agrees with the in-memory pair path on planted copies") {
    Media.writeAudioFpReference(refDf, "id", "blob", "au_ref_agree",
      windowFrames = 16, numBuckets = 4)
    try {
      val copies = (0L until 30L).map(id => (id + 1000L, noise(id, 4)))
        .toDF("id", "blob")
      val stored = Media.audioNearDupsStored(copies, "au_ref_agree",
          "id", "blob", windowFrames = 16, minSharedBlocks = 2)
        .collect().map(r => (r.getLong(0) - 1000L, r.getLong(1), r.getLong(2)))
      stored.count(p => p._1 == p._2) shouldBe 30
      // in-memory path over the union finds the same pairs
      val both = refDf.unionAll(copies)
      val mem = Media.audioNearDups(both, "id", "blob",
          windowFrames = 16, minSharedBlocks = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      stored.map(p => (p._2, p._2 + 1000L, p._3)).toSet shouldBe mem
    } finally spark.sql("DROP TABLE IF EXISTS au_ref_agree_buckets")
  }

  test("the stored side never re-exchanges") {
    Media.writeAudioFpReference(refDf, "id", "blob", "au_ref_plan",
      windowFrames = 16, numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = (0L until 5L).map(id => (id + 1000L, noise(id, 4)))
        .toDF("id", "blob")
      val res = Media.audioNearDupsStored(batch, "au_ref_plan", "id",
        "blob", windowFrames = 16, minSharedBlocks = 1)
      res.collect()
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // probe bb rows + the pair count aggregate — both batch-derived;
      // the bucketed stored scan (and its read-time size count)
      // contributes zero hash exchanges
      "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS au_ref_plan_buckets")
    }
  }
}
