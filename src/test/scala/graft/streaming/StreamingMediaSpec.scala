package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.Media

/** The media quality screens under Structured Streaming: the stateless
  * per-row screens run UNCHANGED on a streaming frame (zero state-store
  * operators, append mode), and the windowed monitors converge to the
  * batch answer over the same rows — with corrupt blobs costing their
  * row (counted per window), never the query.
  */
class StreamingMediaSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  test("stateless image screen runs unchanged on a stream: append " +
    "mode, ZERO state-store operators, rows equal the batch screen") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val rows = (0L until 12L).map(id => (id, Media.synthesizePng(id)))
    val input = MemoryStream[(Long, Array[Byte])]
    val streamDf = input.toDF().toDF("id", "blob")
    val screened = Media.imageQualityStats(streamDf, "id", "blob")
    val q = screened.writeStream.format("memory")
      .queryName("img_screen_stream").outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      q.lastProgress.stateOperators shouldBe empty
    } finally q.stop()

    val streamed = spark.table("img_screen_stream")
      .select(col("id"), col("gray_mean"), col("low_contrast"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    val batch = Media
      .imageQualityStats(rows.toDF("id", "blob"), "id", "blob")
      .select(col("id"), col("gray_mean"), col("low_contrast"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    streamed shouldBe batch
    streamed.size shouldBe 12
  }

  test("the round-15 stateless screens run unchanged on streams in " +
    "append mode with ZERO state-store operators: header-only image " +
    "and audio metadata, and the compression-ratio screen") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    // image meta on a stream
    val imgIn = MemoryStream[(Long, Array[Byte])]
    val imgQ = Media
      .imageMeta(imgIn.toDF().toDF("id", "blob"), "id", "blob")
      .writeStream.format("memory").queryName("meta_img_stream")
      .outputMode("append").start()
    try {
      imgIn.addData((0L until 6L).map(id => (id, Media.synthesizePng(id))))
      imgQ.processAllAvailable()
      imgQ.lastProgress.stateOperators shouldBe empty
    } finally imgQ.stop()
    spark.table("meta_img_stream").count() shouldBe 6

    // audio meta on a stream
    val audIn = MemoryStream[(Long, Array[Byte])]
    val audQ = Media
      .audioMeta(audIn.toDF().toDF("id", "blob"), "id", "blob")
      .writeStream.format("memory").queryName("meta_aud_stream")
      .outputMode("append").start()
    try {
      audIn.addData((0L until 5L).map(id =>
        (id, Media.synthesizeWav(id))))
      audQ.processAllAvailable()
      audQ.lastProgress.stateOperators shouldBe empty
    } finally audQ.stop()
    spark.table("meta_aud_stream").count() shouldBe 5

    // compression screen on a stream
    val cIn = MemoryStream[(Long, String)]
    val cQ = graft.ops.TextOps
      .compressionRatio(cIn.toDF().toDF("id", "text"), "id", "text")
      .writeStream.format("memory").queryName("comp_stream")
      .outputMode("append").start()
    try {
      cIn.addData(Seq((1L, "spam ham " * 200), (2L, "varied prose here")))
      cQ.processAllAvailable()
      cQ.lastProgress.stateOperators shouldBe empty
    } finally cQ.stop()
    val ratios = spark.table("comp_stream")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ratios(1L) should be < 0.1
    ratios(2L) should be > 0.3
  }

  test("windowed image-quality monitor equals the batch aggregate; a " +
    "corrupt blob costs its row (n_corrupt) and never the query") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val good = Seq(
      (ts(1, 1), 0L), (ts(1, 2), 1L), (ts(1, 3), 2L),
      (ts(2, 1), 3L), (ts(2, 2), 4L))
      .map { case (t, id) => (t, id, Media.synthesizePng(id)) }
    val corrupt = Seq((ts(1, 5), 100L,
      "not an image at all".getBytes("UTF-8")))
    val (b1, b2) = (good.take(3) ++ corrupt, good.drop(3))

    val input = MemoryStream[(Timestamp, Long, Array[Byte])]
    val streamDf = input.toDF().toDF("ts", "id", "blob")
    val mon = StreamingMedia.imageQualityMonitor(
      streamDf, "ts", "1 day", "2 days", "id", "blob")
    val q = mon.writeStream.format("memory").queryName("img_mon")
      .outputMode("complete").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("img_mon")
      .select(col("window.start").cast("date").cast("string").as("day"),
        col("n"), col("n_corrupt"), col("n_low_contrast"),
        round(col("mean_gray"), 9).as("mg"),
        col("gray_min"), col("gray_max"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getInt(5), r.getInt(6)))).toMap

    // batch oracle over the same rows: the screen on the good blobs,
    // grouped by the same day window, corrupt counted separately
    val goodStats = Media.imageQualityStats(
      good.toDF("ts", "id", "blob"), "id", "blob")
    val expected = good.toDF("ts", "id", "blob")
      .join(goodStats, Seq("id"))
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_good"),
        sum(when(col("low_contrast"), 1L).otherwise(0L)).as("lc"),
        avg(col("gray_mean")).as("mg"),
        min(col("gray_min")).as("gmin"), max(col("gray_max")).as("gmax"))
      .select(col("window.start").cast("date").cast("string"),
        col("n_good"), col("lc"), round(col("mg"), 9), col("gmin"),
        col("gmax"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4),
          r.getInt(5)))).toMap

    streamed.keySet shouldBe expected.keySet
    for ((day, (n, nCorrupt, lc, mg, gmin, gmax)) <- streamed) {
      val (nGood, elc, emg, egmin, egmax) = expected(day)
      val ec = if (day == "2024-03-01") 1L else 0L
      n shouldBe nGood + ec
      nCorrupt shouldBe ec
      lc shouldBe elc
      mg shouldBe emg
      gmin shouldBe egmin
      gmax shouldBe egmax
    }
  }

  test("windowed audio-quality monitor: clipped / near-silent verdicts " +
    "aggregate per window like the batch screen; corrupt audio drops " +
    "row-wise") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    // synthesizeWavQuality plants regimes: id%7==0 clips, id%5==0 is
    // near-silent (q259's fixture scheme)
    val good = Seq(
      (ts(1, 1), 0L), (ts(1, 2), 5L), (ts(1, 3), 3L),
      (ts(2, 1), 7L), (ts(2, 2), 10L), (ts(2, 3), 11L))
      .map { case (t, id) => (t, id, Media.synthesizeWavQuality(id)) }
    val corrupt = Seq((ts(2, 5), 200L, Array[Byte](1, 2, 3)))

    val input = MemoryStream[(Timestamp, Long, Array[Byte])]
    val streamDf = input.toDF().toDF("ts", "id", "blob")
    val mon = StreamingMedia.audioQualityMonitor(
      streamDf, "ts", "1 day", "2 days", "id", "blob")
    val q = mon.writeStream.format("memory").queryName("aud_mon")
      .outputMode("complete").start()
    try {
      input.addData(good ++ corrupt)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("aud_mon")
      .select(col("window.start").cast("date").cast("string").as("day"),
        col("n"), col("n_corrupt"), col("n_clipped"),
        col("n_near_silent"), col("peak_max"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getInt(5)))).toMap

    val batch = Media.audioQualityStats(
      good.toDF("ts", "id", "blob"), "id", "blob")
      .select(col("id"), col("clipped"), col("near_silent"), col("peak"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getInt(3)))).toMap
    def day(ids: Seq[Long], d: String, nCorrupt: Long): Unit = {
      val (n, c, cl, ns, pk) = streamed(d)
      n shouldBe ids.size + nCorrupt
      c shouldBe nCorrupt
      cl shouldBe ids.count(batch(_)._1)
      ns shouldBe ids.count(batch(_)._2)
      pk shouldBe ids.map(batch(_)._3).max
    }
    day(Seq(0L, 5L, 3L), "2024-03-01", 0L)
    day(Seq(7L, 10L, 11L), "2024-03-02", 1L)
  }
}
