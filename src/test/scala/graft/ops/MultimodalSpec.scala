package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** The partition-scoped codec path must agree exactly with the
  * expression-composed stub pipeline (same fake decode arithmetic, same
  * resize rule, same content ids) — proving the mapPartitions plumbing
  * (schema, batching, codec lifecycle) carries the identical contract a
  * real decoder would plug into.
  */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("decodePartitions equals the expression stub pipeline") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaExpr = Multimodal.imagePipeline(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))
      .toMap
    val viaCodec = Multimodal.decodePartitions(docs, "doc_id", "text")
      .collect().map(r =>
        r.id -> (r.blob_bytes, r.width, r.height, r.channels, r.content_id))
      .toMap
    viaCodec shouldBe viaExpr
    viaCodec.size shouldBe 500
  }

  test("codec open/close run once per partition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(3)
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val codec = new Multimodal.ImageCodec {
      override def open(): Unit = opens.add(1)
      override def decode(blob: Array[Byte]): (Int, Int, Int) = (10, 10, 3)
      override def close(): Unit = closes.add(1)
    }
    Multimodal.decodePartitions(docs, "doc_id", "text", codec).count()
    opens.value shouldBe 3L
    closes.value shouldBe 3L
  }

  test("frame sampling emits n distinct deterministic frame ids") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(5)
    val frames = docs.select(
      Multimodal.sampleFramesStub(Multimodal.asBlob(col("text")), 4).as("f"))
      .collect().map(_.getSeq[String](0))
    all(frames.map(_.size)) shouldBe 4
    // deterministic: second run identical
    val again = docs.select(
      Multimodal.sampleFramesStub(Multimodal.asBlob(col("text")), 4).as("f"))
      .collect().map(_.getSeq[String](0))
    frames.map(_.toList).toSeq shouldBe again.map(_.toList).toSeq
  }
}
