package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Streaming exact dedup: repeats within the watermark horizon are
  * suppressed (within AND across micro-batches), the key set equals batch
  * DISTINCT, and state for expired keys re-emits by design.
  */
class StreamingDedupSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def ts(sec: Int): Timestamp =
    new Timestamp(1700000000000L + sec * 1000L)

  private def run(batches: Seq[Seq[(String, Timestamp)]],
      delay: String): Seq[String] = {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(String, Timestamp)]
    val stream = input.toDF().toDF("k", "ts")
    val deduped = StreamingDedup.firstArrivals(stream, "ts", Seq("k"), delay)
    val name = "dedup_stream_" + System.nanoTime()
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).select("k").collect().map(_.getString(0)).toSeq
  }

  test("repeats are suppressed within and across batches; key set " +
    "equals batch DISTINCT") {
    val out = run(Seq(
      Seq(("a", ts(0)), ("b", ts(1)), ("a", ts(2))),   // in-batch repeat
      Seq(("a", ts(3)), ("c", ts(4)))),                // cross-batch repeat
      delay = "1 hour")
    out.sorted shouldBe Seq("a", "b", "c")
  }

  test("a key re-arriving AFTER its state expired re-emits (documented " +
    "horizon semantics)") {
    val out = run(Seq(
      Seq(("a", ts(0))),
      // watermark advances to 100-10=90s; 'a'@0s state (expires at
      // 0+10s) is evicted, so the third batch's 'a' re-emits
      Seq(("z", ts(100))),
      Seq(("a", ts(101)))),
      delay = "10 seconds")
    out.count(_ == "a") shouldBe 2
    out.count(_ == "z") shouldBe 1
  }

  test("bloom prefilter composes with streaming: a static probe set " +
    "drops matching stream rows map-side, no stream-static join") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    // static probe set -> one bloom filter, broadcast once; the
    // streaming filter is a pure projection (works in ANY output mode,
    // no watermark needed — nothing stateful happens)
    val probe = (0 until 50).map(i => s"banned text $i").toDF("k")
    val bytes = probe.agg(graft.functions.bloom_agg(
      xxhash64(col("k")), 1L << 16, 5)).head().getAs[Array[Byte]](0)
    val handle = spark.sparkContext.broadcast(bytes)
    val input = MemoryStream[String]
    val clean = input.toDF().toDF("k")
      .filter(!graft.functions.bloom_might_contain_bcast(handle,
        xxhash64(col("k"))))
    val name = "bloom_stream_" + System.nanoTime()
    val q = clean.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData("banned text 7", "fresh a", "banned text 49", "fresh b")
      q.processAllAvailable()
    } finally q.stop()
    // no false negatives: every banned row is gone; the two fresh rows
    // survive unless a (possible but unlikely at 2^16 bits / 4 keys)
    // false positive dropped them — assert banned rows only
    val out = spark.table(name).as[String].collect().toSet
    out should contain allOf ("fresh a", "fresh b")
    out.exists(_.startsWith("banned")) shouldBe false
  }

  test("unbounded variant never re-emits, whatever the gap") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(String, Timestamp)]
    val stream = input.toDF().toDF("k", "ts")
    val deduped = StreamingDedup.firstArrivalsUnbounded(stream, Seq("k"))
    val name = "dedup_stream_" + System.nanoTime()
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      Seq(Seq(("a", ts(0))), Seq(("z", ts(100000))), Seq(("a", ts(100001))))
        .foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).select("k").collect().map(_.getString(0)).sorted
      .toSeq shouldBe Seq("a", "z")
  }
}
