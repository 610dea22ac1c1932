package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.Dedup

/** Bloom membership filter: no false negatives ever, false positives
  * always removed by the exact confirm stage, merge invariance, and the
  * codegen'd map-side prefilter plan.
  */
class BloomSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def docs(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"payload text number $i")).toDF("id", "key")
  }

  test("no false negatives: every inserted key hits the filter") {
    import spark.implicits._
    val keys = docs(0 until 500)
    val blm = keys.agg(bloom_agg(xxhash64(col("key")), 1L << 12, 5)
      .as("b"))
    val hits = keys.crossJoin(broadcast(blm))
      .select(bloom_might_contain(col("b"), xxhash64(col("key"))).as("h"))
      .as[Boolean].collect()
    all(hits) shouldBe true
  }

  test("an undersized filter false-positives, but semi/anti answers " +
    "stay exact and partition the corpus") {
    val corpus = docs(0 until 2000)
    val probe = docs(0 until 2000 by 7)
    // 64 bits for ~286 keys: the filter saturates, nearly everything hits
    val semi = Dedup.bloomSemiJoin(corpus, probe, "key",
      numBits = 64, numHashFns = 3)
    val anti = Dedup.bloomAntiJoin(corpus, probe, "key",
      numBits = 64, numHashFns = 3)
    val semiIds = semi.select("id").collect().map(_.getLong(0)).toSet
    val antiIds = anti.select("id").collect().map(_.getLong(0)).toSet
    semiIds shouldBe (0L until 2000L by 7).toSet
    antiIds shouldBe (0L until 2000L).toSet -- semiIds
    (semiIds & antiIds) shouldBe empty
  }

  test("the bloom prefilter runs BELOW the confirm join (candidate " +
    "barrier holds against semi-join pushdown), codegen'd") {
    // range-backed (non-local) frames so ConvertToLocalRelation cannot
    // pre-evaluate the probe and erase the plan under audit
    val corpus = spark.range(2000).select(col("id"),
      concat(lit("payload text number "), col("id")).as("key"))
    val probe = spark.range(10).select(col("id"),
      concat(lit("payload text number "), col("id")).as("key"))
    val (semi, release) = Dedup.bloomSemiJoinReleasable(corpus, probe,
      "key", numBits = 1L << 16, numHashFns = 5)
    try {
      semi.select("id").collect().map(_.getLong(0)).toSet shouldBe
        (0L until 10L).toSet
      // the persisted candidate frame is the barrier: the bloom probe
      // must live INSIDE the cached plan, and the exact confirm join must
      // NOT have been pushed in there with it
      val imr = semi.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      imr should have size 1
      val cached = imr.head.cachedPlan.toString
      cached should include("bloom_might_contain")
      cached should not include "LeftSemi"
      // and the membership probe evaluates inside a whole-stage-codegen
      // span, not an interpreted fallback
      "\\*\\(\\d+\\) [A-Za-z]+.*bloom_might_contain".r
        .findFirstIn(cached) should not be empty
    } finally release()
  }

  test("merge invariance: filter bytes are identical at any parallelism") {
    val keys = docs(0 until 1000)
    def bytes(parts: Int): Seq[Byte] =
      keys.repartition(parts)
        .agg(bloom_agg(xxhash64(col("key")), 1L << 12, 4).as("b"))
        .collect()(0).getAs[Array[Byte]](0).toSeq
    bytes(1) shouldBe bytes(13)
  }

  test("bad filter shapes fail at plan construction, not in a task") {
    an[IllegalArgumentException] should be thrownBy
      bloom_agg(xxhash64(col("key")), numBits = 100, numHashFns = 5)
    an[IllegalArgumentException] should be thrownBy
      bloom_agg(xxhash64(col("key")), numBits = 1L << 12, numHashFns = 0)
  }

  test("SQL surface: bloom_agg + bloom_might_contain are registered, " +
    "and sizing arguments are honored, not dropped") {
    registerAll(spark)
    docs(0 until 100).createOrReplaceTempView("bloom_keys")
    val n = spark.sql(
      """SELECT count(*) FROM bloom_keys,
        |  (SELECT bloom_agg(xxhash64(key)) AS b FROM bloom_keys)
        |WHERE bloom_might_contain(b, xxhash64(key))""".stripMargin)
      .collect()(0).getLong(0)
    n shouldBe 100L
    // 3-arg form: the serialized size reflects the requested 2^12 bits
    // (24-byte header + 512 bytes of words), proving the args reached
    // the aggregate instead of being silently replaced by defaults
    val bytes = spark.sql(
      "SELECT bloom_agg(xxhash64(key), 4096, 3) FROM bloom_keys")
      .collect()(0).getAs[Array[Byte]](0)
    bytes.length shouldBe (24 + 4096 / 8)
    // and invalid sizes fail fast at plan construction, like the Scala
    // helper
    an[IllegalArgumentException] should be thrownBy
      spark.sql("SELECT bloom_agg(xxhash64(key), 100) FROM bloom_keys")
  }
}
