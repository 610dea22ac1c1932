package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored MinHash-LSH index: [[Dedup.writeMinHashReference]] persists a
  * corpus's band buckets + signatures as bucketed tables so that
  * screening a new batch (a) recovers planted duplicates exactly like
  * the two-frame LSH path, and (b) never re-exchanges the stored side —
  * only batch-derived rows shuffle.
  */
class StoredMinHashSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def exchanges(df: DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r.findAllIn(
      df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)).length
  }

  // spark.range-backed docs (LocalRelation would hide plan shape): 10
  // words from a 30-word vocab, pattern repeats mod 30, plus a per-doc
  // unique word so distinct ids are near- but not exact duplicates
  private def docs(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        if (j == 4) concat(lit("u"), col("id").cast("string"))
        else concat(lit("w"), ((col("id") * 11 + lit(j * 3)) % 30)
          .cast("string"))): _*).as("text"))

  test("planted exact duplicates are recovered at est_jaccard 1.0") {
    val ref = docs(0, 60)
    Dedup.writeMinHashReference(ref, "doc_id", "text", "mh_ref_eq",
      numHashes = 32, bands = 8, shingleK = 2, numBuckets = 4)
    try {
      // batch = copies of ref ids 0-19 at +1000, plus 20 fresh docs
      val batch = docs(0, 20)
        .select((col("doc_id") + 1000).as("doc_id"), col("text"))
        .unionAll(docs(200, 220))
      val got = Dedup.minHashNearDupsStored(batch, "mh_ref_eq",
        "doc_id", "text", numHashes = 32, bands = 8, shingleK = 2,
        threshold = 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // every copy hits exactly its original, at exactly 1.0
      got.filter(_._3 >= 0.999).map(p => (p._1, p._2)).toSet shouldBe
        (0L until 20L).map(i => (i + 1000, i)).toSet
      got.foreach(_._3 shouldBe 1.0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mh_ref_eq_buckets")
      spark.sql("DROP TABLE IF EXISTS mh_ref_eq_sigs")
    }
  }

  test("threshold gates near-but-not-exact pairs, and the stored path " +
      "equals the two-frame LSH path pair-for-pair") {
    // fixture docs are rotations of one cyclic word sequence, so many
    // cross-id pairs land at genuine 0.5-0.8 jaccard — a realistic
    // near-dup population, not just planted twins
    val ref = docs(0, 30)
    Dedup.writeMinHashReference(ref, "doc_id", "text", "mh_ref_thr",
      numHashes = 32, bands = 8, shingleK = 2, numBuckets = 4)
    try {
      val batch = docs(30, 60)
      val strict = Dedup.minHashNearDupsStored(batch, "mh_ref_thr",
        "doc_id", "text", numHashes = 32, bands = 8, shingleK = 2,
        threshold = 1.0).collect()
      val loose = Dedup.minHashNearDupsStored(batch, "mh_ref_thr",
        "doc_id", "text", numHashes = 32, bands = 8, shingleK = 2,
        threshold = 0.5).collect()
      strict.length shouldBe 0 // per-doc unique words break exactness
      loose.length should be > 0
      loose.foreach(_.getDouble(2) should (be >= 0.5 and be < 1.0))
      // ground truth: the in-memory two-frame LSH over the union,
      // restricted to cross-side pairs at the same threshold
      val direct = Dedup.minHashLshPairs(ref.unionAll(batch), "doc_id",
        "text", numHashes = 32, bands = 8, shingleK = 2)
        .filter(col("id_a") < 30 && col("id_b") >= 30 &&
          col("est_jaccard") >= 0.5)
        .collect()
        .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
      loose.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet shouldBe direct
    } finally {
      spark.sql("DROP TABLE IF EXISTS mh_ref_thr_buckets")
      spark.sql("DROP TABLE IF EXISTS mh_ref_thr_sigs")
    }
  }

  test("write-time bucket cap drops boilerplate buckets entirely") {
    import spark.implicits._
    // 50 identical docs: every band bucket holds all 50 ids
    val boiler = (0 until 50)
      .map(i => (i.toLong, "same same same same")).toDF("doc_id", "text")
    Dedup.writeMinHashReference(boiler, "doc_id", "text", "mh_ref_cap",
      numHashes = 32, bands = 8, shingleK = 2, numBuckets = 2,
      maxBucketSize = 10)
    try {
      graft.io.CorpusStore.readBucketed(spark, "mh_ref_cap_buckets")
        .count() shouldBe 0
      // and a probe against the capped store finds nothing
      Dedup.minHashNearDupsStored(
        Seq((99L, "same same same same")).toDF("doc_id", "text"),
        "mh_ref_cap", "doc_id", "text", numHashes = 32, bands = 8,
        shingleK = 2, threshold = 0.5).count() shouldBe 0
    } finally {
      spark.sql("DROP TABLE IF EXISTS mh_ref_cap_buckets")
      spark.sql("DROP TABLE IF EXISTS mh_ref_cap_sigs")
    }
  }

  test("read-time cap drops buckets grown past the cap ACROSS appends " +
      "(each batch alone under the write-time cap)") {
    import spark.implicits._
    def boiler(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, "alpha beta alpha beta")).toDF("doc_id", "text")
    // 10 docs per batch, cap 25: every write passes its own cap, but
    // after two appends each band bucket holds 30 ids
    Dedup.writeMinHashReference(boiler(0, 10), "doc_id", "text",
      "mh_growth", numHashes = 32, bands = 8, shingleK = 2,
      numBuckets = 2, maxBucketSize = 25)
    try {
      Dedup.appendMinHashReference(boiler(10, 20), "mh_growth",
        "doc_id", "text", numHashes = 32, bands = 8, shingleK = 2,
        maxBucketSize = 25)
      Dedup.appendMinHashReference(boiler(20, 30), "mh_growth",
        "doc_id", "text", numHashes = 32, bands = 8, shingleK = 2,
        maxBucketSize = 25)
      val batch = boiler(1000, 1001)
      // default read cap (10000): the grown bucket still probes
      Dedup.minHashNearDupsStored(batch, "mh_growth", "doc_id", "text",
        numHashes = 32, bands = 8, shingleK = 2, threshold = 0.9)
        .count() shouldBe 30
      // the write-time cap re-applied at read time: bucket size 30 > 25
      // -> dropped, candidate fan-out gone
      Dedup.minHashNearDupsStored(batch, "mh_growth", "doc_id", "text",
        numHashes = 32, bands = 8, shingleK = 2, threshold = 0.9,
        maxBucketSize = 25).count() shouldBe 0L
    } finally {
      spark.sql("DROP TABLE IF EXISTS mh_growth_buckets")
      spark.sql("DROP TABLE IF EXISTS mh_growth_sigs")
    }
  }

  test("stored sides never re-exchange: only batch-derived rows shuffle") {
    val ref = docs(0, 60)
    Dedup.writeMinHashReference(ref, "doc_id", "text", "mh_ref_plan",
      numHashes = 32, bands = 8, shingleK = 2, numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force merge joins so the store's partitioning must carry the day
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = docs(0, 20)
        .select((col("doc_id") + 1000).as("doc_id"), col("text"))
      val (res, release) = Dedup.minHashNearDupsStoredReleasable(batch,
        "mh_ref_plan", "doc_id", "text", numHashes = 32, bands = 8,
        shingleK = 2, threshold = 0.9)
      try {
        // exchanges: probe bands on bb, candidate dedup on
        // (new_id, ref_id), candidates on ref_id, candidates + cached
        // batch signatures on new_id — all batch-derived. The two
        // bucketed scans contribute ZERO.
        exchanges(res) shouldBe 5
      } finally release()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS mh_ref_plan_buckets")
      spark.sql("DROP TABLE IF EXISTS mh_ref_plan_sigs")
    }
  }
}
