package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The salted in-bucket pair generator shared by every LSH family
  * member ([[Dedup.cappedBucketPairs]]). Two contracts:
  *
  *  - EQUIVALENCE: the emitted pair set is identical to the historical
  *    unsalted collect_list + pair_generator shape for every bucket
  *    size — below the salt target (generator path), above it (salted
  *    block equi-join), and above the cap (dropped whole).
  *  - NO STRAGGLER: a near-cap bucket's pairs must NOT serialize
  *    through one task. A generator row is unsplittable by AQE (one
  *    input row's output cannot be re-partitioned), so before the salt
  *    a 10k-id bucket emitted all ~50M of its pairs from a single row
  *    in a single task; salted blocks spread them across the join's
  *    shuffle partitions.
  */
class CappedBucketPairsSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private def brutePairs(ids: Seq[Long]): Set[(Long, Long)] =
    (for { a <- ids; b <- ids if a < b } yield (a, b)).toSet

  test("salted pair set equals the unsalted generator across the " +
    "size regimes: sub-target, salted, and dropped-over-cap buckets") {
    import spark.implicits._
    // bucket k holds `sizes(k)` ids; 25 > maxBucketSize drops whole
    val sizes = Seq(1, 2, 5, 8, 9, 17, 25)
    val rows = for {
      (s, k) <- sizes.zipWithIndex
      i <- 0 until s
    } yield (k.toLong, k * 1000L + i * 7L) // non-contiguous ids
    val banded = rows.toDF("bb", "id")
    val got = Dedup
      .cappedBucketPairs(banded, Seq("bb"), "id",
        maxBucketSize = 20, saltTarget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (s, k) <- sizes.zipWithIndex if s <= 20
      pair <- brutePairs((0 until s).map(i => k * 1000L + i * 7L))
    } yield pair).toSet
    got shouldBe want
    // ordering convention holds on the salted path too
    got.foreach { case (a, b) => a should be < b }
  }

  test("multi-column bucket keys (band, bucket) pair independently " +
    "per key, duplicates across keys preserved for the caller's " +
    "cross-band dedupe") {
    import spark.implicits._
    // ids 1,2 share band-0 bucket 10 AND band-1 bucket 20 -> the pair
    // must appear twice (the historical per-band multiplicity)
    val banded = Seq((0, 10L, 1L), (0, 10L, 2L), (1, 20L, 1L),
      (1, 20L, 2L), (1, 30L, 3L)).toDF("band", "bucket", "id")
    val got = Dedup
      .cappedBucketPairs(banded, Seq("band", "bucket"), "id",
        maxBucketSize = 100, saltTarget = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq.sorted shouldBe Seq((1L, 2L), (1L, 2L))
  }

  test("property: salted == brute on SEEDED RANDOM bucket layouts " +
    "(random sizes straddling random salt targets and caps)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xB0CCEL)
    for (_ <- 1 to 5) {
      val saltTarget = 2 + rnd.nextInt(12)
      val maxBucketSize = saltTarget + rnd.nextInt(30)
      val nBuckets = 1 + rnd.nextInt(8)
      val layout = (0 until nBuckets).map(k =>
        k.toLong -> (1 + rnd.nextInt(maxBucketSize + 10)))
      val rows = for {
        (bucket, sz) <- layout
        i <- 0 until sz
      } yield (bucket, bucket * 100000L + i * 3L)
      val got = Dedup
        .cappedBucketPairs(rows.toDF("bb", "id"), Seq("bb"), "id",
          maxBucketSize, saltTarget)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (bucket, sz) <- layout if sz <= maxBucketSize
        pair <- brutePairs((0 until sz).map(i => bucket * 100000L + i * 3L))
      } yield pair).toSet
      withClue(s"saltTarget=$saltTarget cap=$maxBucketSize " +
        s"layout=$layout: ") { got shouldBe want }
    }
  }

  test("dedupYield: hand-computed chains — cluster count, largest " +
    "cluster, keep-one drop math; out-of-corpus pair ids ignored; " +
    "empty pair set reports zero drops") {
    import spark.implicits._
    val corpus = ((0L to 9L) ++ (100L to 103L) ++ (200L to 201L))
      .toDF("doc_id")
    // chains: {0,100,200} {1,101,201} size 3; {2,102} {3,103} size 2;
    // (500,501) is entirely outside the corpus and must not count
    val pairs = Seq((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L),
      (100L, 200L), (101L, 201L), (500L, 501L)).toDF("id_a", "id_b")
    val r = Dedup.dedupYield(corpus, "doc_id", pairs).head()
    r.getLong(0) shouldBe 16 // n_docs
    r.getLong(1) shouldBe 10 // n_in_pairs
    r.getLong(2) shouldBe 4 // n_clusters
    r.getLong(3) shouldBe 3 // max_cluster_size
    r.getLong(4) shouldBe 6 // n_dropped
    r.getDouble(5) shouldBe 6.0 / 16
    r.getLong(6) shouldBe 10 // n_survivors
    val empty = Dedup.dedupYield(corpus,
      "doc_id", Seq.empty[(Long, Long)].toDF("id_a", "id_b")).head()
    empty.getLong(0) shouldBe 16
    empty.getLong(2) shouldBe 0
    empty.getLong(4) shouldBe 0
    empty.getLong(6) shouldBe 16
  }

  test("measured-probe routing: an all-small layout gets the historical " +
    "single-consumer generator plan (no union, no join); an oversized " +
    "bucket brings the salted union back") {
    import spark.implicits._
    val small = (0 until 4).flatMap(k =>
      (0 until 5).map(i => (k.toLong, k * 100L + i))).toDF("bb", "id")
    val smallPlan = Dedup
      .cappedBucketPairs(small, Seq("bb"), "id",
        maxBucketSize = 100, saltTarget = 8)
      .queryExecution.optimizedPlan.toString
    withClue(s"small-layout plan: $smallPlan\n") {
      smallPlan should not include "Union"
      smallPlan should not include "Join"
    }
    val mixed = small.unionAll(
      (0 until 30).map(i => (99L, 9900L + i)).toDF("bb", "id"))
    val mixedPlan = Dedup
      .cappedBucketPairs(mixed, Seq("bb"), "id",
        maxBucketSize = 100, saltTarget = 8)
      .queryExecution.optimizedPlan.toString
    withClue(s"mixed-layout plan: $mixedPlan\n") {
      mixedPlan should include("Union")
      mixedPlan should include("Join")
    }
  }

  test("a planted 10k-id bucket (the near-cap straggler case) spreads " +
    "its ~50M pairs so no single task owns more than 10%") {
    import spark.implicits._
    val n = 10000
    val banded = (0 until n).map(i => (1L, i.toLong)).toDF("bb", "id")
    val pairs = Dedup.cappedBucketPairs(banded, Seq("bb"), "id",
      maxBucketSize = 10000, saltTarget = 500)
    val perTask = pairs
      .groupBy(spark_partition_id().as("task"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1))
    val total = perTask.sum
    total shouldBe n.toLong * (n - 1) / 2 // exhaustive: all 49,995,000
    val maxShare = perTask.max.toDouble / total
    info(f"tasks=${perTask.length} maxShare=$maxShare%.3f")
    maxShare should be <= 0.10
  }
}
