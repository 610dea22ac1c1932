package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Layout manifest: stats fidelity, pruned-read row-exactness, actual
  * file skipping on a z-ordered layout, and partition-column survival
  * on direct file reads.
  */
class LayoutManifestSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("manifest stats match per-file truth") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v")
    val layout = tmpDir("graft_manifest_layout")
    ZOrderLayout.writeZOrdered(df, Seq("v"), layout, bits = 8,
      numFiles = 4)
    val stats = LayoutManifest.collectStats(spark, layout, Seq("v"))
      .collect()
    stats.length shouldBe 4
    stats.map(_.getLong(1)).sum shouldBe 1000L
    // each file's recorded envelope matches a direct read of that file
    stats.foreach { r =>
      val direct = spark.read.parquet(r.getString(0))
        .agg(min(col("v")), max(col("v"))).collect().head
      r.getDouble(2) shouldBe direct.getDouble(0)
      r.getDouble(3) shouldBe direct.getDouble(1)
    }
  }

  test("pruned read is row-exact and actually skips files") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i.toLong, (i % 512).toDouble))
      .toDF("id", "v")
    val layout = tmpDir("graft_manifest_prune")
    val manifest = tmpDir("graft_manifest_idx")
    ZOrderLayout.writeZOrdered(df, Seq("v"), layout, bits = 9,
      numFiles = 8)
    LayoutManifest.writeManifest(spark, layout, Seq("v"), manifest)

    val pruned = LayoutManifest.prunedRead(spark, layout, manifest,
      "v", 10.0, 40.0)
    val full = spark.read.parquet(layout)
      .filter(col("v").between(10.0, 40.0))
    pruned.select("id").collect().map(_.getLong(0)).toSet shouldBe
      full.select("id").collect().map(_.getLong(0)).toSet

    // a 31/512 slice of a value-sorted 8-file layout lives in 1 file
    val (kept, total) = LayoutManifest.pruningStats(spark, manifest,
      "v", 10.0, 40.0)
    total shouldBe 8L
    kept should be <= 2L
    // an out-of-range probe prunes everything and still returns a
    // well-typed empty frame
    LayoutManifest.prunedRead(spark, layout, manifest, "v",
      1e9, 2e9).count() shouldBe 0L
  }

  test("bloom manifest: point lookups prune files, never lose rows, " +
    "and misses prune everything") {
    import spark.implicits._
    // ids clustered per shard by construction: shard = md5-hash, so a
    // single id lives in exactly one file — the bloom should keep ~1
    val df = (1 to 2000).map(i => (i.toLong, s"payload$i"))
      .toDF("id", "payload")
    val layout = tmpDir("graft_bloom_layout")
    ShardWriter.writeShards(df, "id", 8, layout)
    val man = tmpDir("graft_bloom_manifest")
    LayoutManifest.writeBloomManifest(spark, layout, "id", man)
    // every single id is findable (no false negatives), row-exactly
    Seq(1L, 777L, 2000L).foreach { id =>
      val got = LayoutManifest.lookupRead(spark, layout, man, "id", id)
        .collect()
      got.length shouldBe 1
      got.head.getLong(0) shouldBe id
    }
    // pruning actually skips files: one id keeps far fewer than all 8
    val (kept, total) = LayoutManifest.lookupStats(spark, man, 777L)
    total shouldBe 8L
    kept should be < 8L
    // an absent id returns an empty, well-typed frame
    LayoutManifest.lookupRead(spark, layout, man, "id", 999999L)
      .count() shouldBe 0L
  }

  test("partition-directory columns survive a pruned direct-file read") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 50).toDouble))
      .toDF("id", "v")
    val layout = tmpDir("graft_manifest_shards")
    ShardWriter.writeShards(df, "id", 4, layout)
    val manifest = tmpDir("graft_manifest_shards_idx")
    LayoutManifest.writeManifest(spark, layout, Seq("v"), manifest)
    val pruned = LayoutManifest.prunedRead(spark, layout, manifest,
      "v", 0.0, 49.0)
    pruned.columns should contain ("shard")
    pruned.count() shouldBe 500L
    pruned.select("shard").distinct().count() shouldBe 4L
  }
}
