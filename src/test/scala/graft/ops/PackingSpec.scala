package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Sequence packing must reproduce the sequential concat-and-chunk
  * layout under any input partitioning, and its prefix sum must reuse
  * the one range exchange rather than re-sampling boundaries.
  */
class PackingSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def fixture(nParts: Int) = {
    import spark.implicits._
    // deterministic pseudo-random token counts, ids shuffled into the
    // frame out of order
    (0L until 500L).map(i => ((i * 131) % 500, (i * 7919) % 97 + 3))
      .toDF("doc_id", "n_tok").repartition(nParts)
  }

  private def sequentialLayout(budget: Long): Map[Long, (Long, Long, Long)] = {
    // driver-side oracle: sort by doc_id, running offset
    var off = 0L
    (0L until 500L).toSeq.sortBy(identity).map { id =>
      val tok = (ids(id) * 7919) % 97 + 3
      val r = (id, (off, off / budget, off % budget))
      off += tok
      r
    }.toMap
  }
  // invert i*131 % 500 -> original i so token counts match the fixture
  private val ids: Map[Long, Long] =
    (0L until 500L).map(i => ((i * 131) % 500) -> i).toMap

  test("packing equals the sequential concat-and-chunk layout") {
    val got = Packing.packSequences(fixture(13), "doc_id", "n_tok",
        "doc_id", budget = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got should have size 500
    val want = sequentialLayout(256)
    got shouldBe want
  }

  test("layout is invariant to input partitioning") {
    val a = Packing.packSequences(fixture(1), "doc_id", "n_tok",
      "doc_id", 100).collect().map(_.toSeq).toSet
    val b = Packing.packSequences(fixture(32), "doc_id", "n_tok",
      "doc_id", 100).collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("both prefix-sum passes read ONE materialized range partitioning") {
    // two physical range exchanges would re-SAMPLE boundaries and could
    // disagree on partition membership, corrupting offsets at scale —
    // the persisted layout frame pins a single materialization
    val (packed, release) = Packing.packSequencesReleasable(fixture(8),
      "doc_id", "n_tok", "doc_id", 256)
    try {
      packed.collect()
      val plan = packed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the one range exchange prints INSIDE the cached relation (the
      // broadcast side's cache scan is elided inside its query stage);
      // a second standalone rangepartitioning would mean a re-sample
      "Exchange rangepartitioning".r.findAllIn(plan).length shouldBe 1
      "InMemoryTableScan".r.findAllIn(plan).length should be >= 1
    } finally release()
  }

  test("packStats accounts for every document exactly once") {
    val packed = Packing.packSequences(fixture(8), "doc_id", "n_tok",
      "doc_id", 256)
    val stats = Packing.packStats(packed).collect()
    stats.map(_.getLong(1)).sum shouldBe 500L
    val totalTokens = (0L until 500L).map(i => (i * 7919) % 97 + 3).sum
    stats.map(_.getLong(2)).sum shouldBe totalTokens
  }

  test("lengthBuckets: smallest-fitting bucket, truncation at the " +
    "last boundary, hand-computed waste") {
    import spark.implicits._
    // lengths: 10, 128 -> bucket 128; 200 -> 256; 900 -> truncates 512
    val df = Seq(10L, 128L, 200L, 900L).toDF("len")
    val got = Packing.lengthBuckets(df, "len", Seq(128L, 256L, 512L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    got(128L) shouldBe ((2L, 138L, 256L, (256.0 - 138) / 256))
    got(256L) shouldBe ((1L, 200L, 256L, 56.0 / 256))
    got(512L) shouldBe ((1L, 512L, 512L, 0.0))
    // zero/null lengths drop
    Packing.lengthBuckets(Seq(Some(0L), Option.empty[Long])
      .toDF("len"), "len", Seq(8L)).count() shouldBe 0L
  }

  test("interleaveSources: sorting by (rank, source) round-robins " +
    "proportionally; ranks are replay-stable") {
    import spark.implicits._
    val df = (1 to 90).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("id", "src")
    val a = graft.ops.Sampling.interleaveSources(df, "src", "id")
    // each source gets a dense 1..30 rank
    a.groupBy(col("src"))
      .agg(max(col("interleave_rank")).as("m"), count(lit(1)).as("n"))
      .collect().foreach { r =>
        r.getLong(1) shouldBe 30L
        r.getLong(2) shouldBe 30L
      }
    // the first 3k rows of the interleave hold exactly k per source
    val ordered = a.orderBy(col("interleave_rank"), col("src"))
      .select(col("src")).collect().map(_.getString(0))
    ordered.take(9).count(_ == "s0") shouldBe 3
    ordered.take(9).count(_ == "s1") shouldBe 3
    // deterministic across partitionings
    val b = graft.ops.Sampling.interleaveSources(
      df.repartition(17), "src", "id")
    a.collect().map(_.toSeq).toSet shouldBe b.collect().map(_.toSeq).toSet
  }
}
