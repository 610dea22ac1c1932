package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Compression ops ([[TextOps.compressionRatio]], gzip round trip):
  * the deflate-ratio quality signal separates repetitive boilerplate
  * from varied prose with a wide margin, compression is deterministic
  * under repartition, and gzip ingest follows the drop-vs-fail policy
  * of every other codec boundary.
  */
class CompressionSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private def varied(id: Long): String =
    (0 until 120).map(w =>
      s"w${(id * 131 + w * 37 + w * w * 11) % 9973}").mkString(" ")

  test("repetitive text compresses far below varied prose (the " +
    "quality-screen margin), and the ratio is repartition-invariant") {
    import spark.implicits._
    val rows = (0L until 20L).map(i => (i, varied(i))) ++
      (100L until 110L).map(i => (i, "lorem ipsum " * 200))
    val df = rows.toDF("id", "text")
    val r = TextOps.compressionRatio(df, "id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    (0L until 20L).foreach(i => r(i) should be > 0.3)
    (100L until 110L).foreach(i => r(i) should be < 0.05)
    val r7 = TextOps.compressionRatio(df.repartition(7), "id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    r7 shouldBe r
    // null and empty texts score as empty: ratio 1.0, raw 0
    val edge = TextOps.compressionRatio(
      Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "text"),
      "id", "text")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getDouble(3)))
    edge.toSet shouldBe Set((1L, 0, 1.0), (2L, 0, 1.0))
  }

  test("gzip -> gunzip round-trips exactly; corrupt members drop " +
    "lenient and fail strict") {
    import spark.implicits._
    val texts = (0L until 12L).map(i => (i, varied(i) + " é中"))
    val blobs = TextOps.gzipTexts(texts.toDF("id", "text"), "id", "text")
    val back = TextOps.gunzipTexts(blobs, "id", "blob")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) => back(id) shouldBe t }
    // corrupt member: a gzip blob with flipped payload bytes
    val goodBlob = blobs.filter(col("id") === 0L)
      .collect().head.getAs[Array[Byte]](1)
    val corrupt = goodBlob.clone()
    corrupt(goodBlob.length / 2) = (corrupt(goodBlob.length / 2) ^ 0x5f).toByte
    corrupt(goodBlob.length - 5) = (corrupt(goodBlob.length - 5) ^ 0x5f).toByte
    val mixed = (Seq((50L, goodBlob), (51L, corrupt),
      (52L, Array[Byte](1, 2, 3)))).toDF("id", "blob")
    val kept = TextOps.gunzipTextsLenient(mixed, "id", "blob")
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(50L)
    intercept[org.apache.spark.SparkException] {
      TextOps.gunzipTexts(mixed, "id", "blob").collect()
    }
  }

  test("gzipTexts treats a null text as empty bytes (the " +
    "compressionRatio null policy — one rule across the family), " +
    "round-tripping to \"\"") {
    import spark.implicits._
    val withNull = Seq((0L, "alive"), (1L, null))
      .toDF("id", "text")
    val back = TextOps.gunzipTexts(
      TextOps.gzipTexts(withNull, "id", "text"), "id", "blob")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    back(0L) shouldBe "alive"
    back(1L) shouldBe ""
  }
}
