package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** The grow-the-store half of incremental ingest: every stored index
  * (fingerprint, novelty grams, MinHash, image hash, IVF lists)
  * supports append — screen a batch, process it, add it to history —
  * without rewriting history, and probes after an append see both the
  * original and the appended generations.
  */
class StoreAppendSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {
  import spark.implicits._

  private def docs(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong, s"document body number $i"))
      .toDF("doc_id", "text")

  test("fingerprint store: screen -> append -> same batch now drops; " +
      "fresh still passes") {
    Dedup.writeFingerprintReference(docs(0, 20), "text", "fp_app",
      numBuckets = 4)
    try {
      val batch = docs(10, 40) // 10-19 seen, 20-39 fresh
      Dedup.filterUnseenAgainstStore(batch, "fp_app", "text")
        .count() shouldBe 20
      Dedup.appendFingerprints(batch, "fp_app", "text")
      Dedup.filterUnseenAgainstStore(batch, "fp_app", "text")
        .count() shouldBe 0
      Dedup.filterUnseenAgainstStore(docs(100, 105), "fp_app", "text")
        .count() shouldBe 5
      // anti-join dedup kept the store distinct
      graft.io.CorpusStore.readBucketed(spark, "fp_app")
        .count() shouldBe 40
    } finally spark.sql("DROP TABLE IF EXISTS fp_app")
  }

  test("novelty store: append the novel batch, rescore at novelty 0") {
    TextOps.writeNoveltyReference(docs(0, 20), "text", n = 3,
      table = "nov_app", numBuckets = 4)
    try {
      val batch = docs(50, 60)
      val before = TextOps.ngramNoveltyStored(batch, "nov_app",
        "doc_id", "text", n = 3)
        .agg(min(col("novelty"))).collect()(0).getDouble(0)
      before should be > 0.0
      TextOps.appendNoveltyReference(batch, "text", n = 3, "nov_app")
      val after = TextOps.ngramNoveltyStored(batch, "nov_app",
        "doc_id", "text", n = 3)
        .agg(max(col("novelty"))).collect()(0).getDouble(0)
      after shouldBe 0.0
    } finally spark.sql("DROP TABLE IF EXISTS nov_app")
  }

  test("minhash store: a probe after append sees both generations") {
    Dedup.writeMinHashReference(docs(0, 20), "doc_id", "text",
      "mh_app", numHashes = 32, bands = 8, shingleK = 2, numBuckets = 4)
    try {
      Dedup.appendMinHashReference(docs(20, 40), "mh_app", "doc_id",
        "text", numHashes = 32, bands = 8, shingleK = 2)
      // probe exact copies of one old and one new stored doc
      val probe = Seq(
        (1005L, "document body number 5"),   // generation 1
        (1025L, "document body number 25"))  // generation 2
        .toDF("doc_id", "text")
      val got = Dedup.minHashNearDupsStored(probe, "mh_app", "doc_id",
        "text", numHashes = 32, bands = 8, shingleK = 2,
        threshold = 0.999)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got should contain allOf ((1005L, 5L), (1025L, 25L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mh_app_buckets")
      spark.sql("DROP TABLE IF EXISTS mh_app_sigs")
    }
  }

  test("image store: a probe after append sees both generations") {
    def img(id: Long) = Media.synthesizePpm(id)
    val gen1 = (0L until 10L).map(id => (id, img(id))).toDF("id", "blob")
    val gen2 = (10L until 20L).map(id => (id, img(id))).toDF("id", "blob")
    Media.writeImageHashReference(gen1, "id", "blob", "img_app",
      numBuckets = 4)
    try {
      Media.appendImageHashReference(gen2, "id", "blob", "img_app")
      val probe = Seq((1005L, img(5L)), (1015L, img(15L)))
        .toDF("id", "blob")
      val got = Media.imageHashNearDupsStored(probe, "img_app", "id",
        "blob", maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got should contain allOf ((1005L, 5L), (1015L, 15L))
    } finally spark.sql("DROP TABLE IF EXISTS img_app_buckets")
  }

  test("ivf index: appended vectors are searchable under the frozen " +
      "codebook; old results are untouched") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val gen1 = embs.filter(col("vec_id") < 100)
    val gen2 = embs.filter(col("vec_id") >= 100 && col("vec_id") < 150)
    Similarity.writeIvfIndex(gen1, "vec_id", "embedding", "ivf_app",
      nCentroids = 4, iterations = 1, numBuckets = 2)
    try {
      val q1 = gen1.filter(col("vec_id") < 3)
      val before = Similarity.ivfTopKStored(q1, "ivf_app", "vec_id",
        "embedding", k = 5, nProbe = 4).collect().map(_.toSeq).toSet
      Similarity.appendToIvfIndex(gen2, "vec_id", "embedding", "ivf_app")
      // shifted-id copies of appended vectors find their originals at
      // cosine ~1 with exhaustive probe
      val probe = gen2.select((col("vec_id") + 10000).as("vec_id"),
        col("embedding"))
      val hits = Similarity.ivfTopKStored(probe, "ivf_app", "vec_id",
        "embedding", k = 1, nProbe = 4)
        .filter(col("item_id") === col("query_id") - 10000)
      hits.count() shouldBe 50
      hits.agg(min(col("cosine"))).collect()(0)
        .getDouble(0) shouldBe (1.0 +- 1e-9)
      // old queries: same ids recovered (scores may tie-shift), and
      // every generation-1 result id is still present
      val after = Similarity.ivfTopKStored(q1, "ivf_app", "vec_id",
        "embedding", k = 5, nProbe = 4).collect().map(_.toSeq).toSet
      after.size shouldBe before.size
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_app_centroids")
      spark.sql("DROP TABLE IF EXISTS ivf_app_lists")
    }
  }

  test("storeStats tracks append file growth; compaction folds it back " +
      "to one file per bucket without changing the answers") {
    Dedup.writeFingerprintReference(docs(0, 20), "text", "fp_cmp",
      numBuckets = 2)
    try {
      Dedup.appendFingerprints(docs(20, 40), "fp_cmp", "text")
      Dedup.appendFingerprints(docs(40, 60), "fp_cmp", "text")
      val grown = graft.io.CorpusStore.storeStats(spark, "fp_cmp")
        .collect()(0)
      grown.getAs[Long]("n_rows") shouldBe 60
      grown.getAs[Long]("n_files") should be > 2L
      graft.io.CorpusStore.compactBucketed(spark, "fp_cmp")
      val compacted = graft.io.CorpusStore.storeStats(spark, "fp_cmp")
        .collect()(0)
      compacted.getAs[Long]("n_rows") shouldBe 60
      // one write pass replaces the three generations' file sets (the
      // exact count depends on AQE's task coalescing, so pin the
      // direction, not the number)
      compacted.getAs[Long]("n_files") should
        be < grown.getAs[Long]("n_files")
      // behaviour unchanged: the full corpus still screens to zero
      Dedup.filterUnseenAgainstStore(docs(0, 60), "fp_cmp", "text")
        .count() shouldBe 0
    } finally spark.sql("DROP TABLE IF EXISTS fp_cmp")
  }

  test("append to a non-store table is rejected via the catalog check") {
    import spark.implicits._
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").saveAsTable("plain_tbl")
    try {
      intercept[IllegalArgumentException] {
        Dedup.appendFingerprints(docs(0, 5), "plain_tbl", "text")
      }
    } finally spark.sql("DROP TABLE IF EXISTS plain_tbl")
  }
}
