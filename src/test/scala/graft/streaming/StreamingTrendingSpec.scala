package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.EventStats

/** The windowed streaming item counts must converge to the batch cell
  * table over any batch split, and topK over the converged cells must
  * equal the batch trending operator.
  */
class StreamingTrendingSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("streamed cells == batch cells; topK over cells == batch " +
    "trendingItems") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    // offset keeps bucket timestamps well above epoch 0: Spark's late
    // filter drops rows with event time <= the (initial 0) watermark
    val off = 1000000000000000L
    val rows = (1 to 300).map { i =>
      (off + i.toLong * 1000000L, s"item${i % 7}")
    }
    val (b1, b2) = rows.splitAt(150)
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("t", "item")
    val counts = StreamingTrending.itemCounts(stream, "t", "item",
      bucketSeconds = 60L, watermarkDelay = "30 days")
    val name = s"trend_stream_${System.nanoTime()}"
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val cells = spark.table(name)
      .groupBy(col("bucket_start"), col("item"))
      .agg(max(col("n")).as("n"))
    val batchDf = rows.toDF("t", "item")
    val batchCells = batchDf
      .select((floor(col("t") / 60000000L) * 60000000L)
        .as("bucket_start"), col("item"))
      .groupBy(col("bucket_start"), col("item"))
      .agg(count(lit(1)).as("n"))
    cells.collect().map(_.toSeq).toSet shouldBe
      batchCells.collect().map(_.toSeq).toSet
    StreamingTrending.topK(cells, 2).collect().map(_.toSeq).toSet shouldBe
      EventStats.trendingItems(batchDf, "t", "item", 60L, 2)
        .collect().map(_.toSeq).toSet
  }

  test("null items are dropped before the stateful aggregate") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("t", "item")
      .withColumn("item",
        when(col("item") === "x", lit(null).cast("string"))
          .otherwise(col("item")))
    val counts = StreamingTrending.itemCounts(stream, "t", "item", 60L,
      watermarkDelay = "30 days")
    val name = s"trend_null_${System.nanoTime()}"
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(Seq((1000000000001000000L, "x"),
        (1000000000002000000L, "y")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
    got.map(_.getString(1)).toSet shouldBe Set("y")
  }
}
