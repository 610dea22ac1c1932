package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video-as-bytes) plumbing: opaque `binary`
  * columns + typed metadata, with decode/feature steps STUBBED behind a
  * deterministic fake (this container has no image/audio codecs — the
  * Spark-side schema, batching, and partitioning are real; swap
  * [[decodeImageStub]]'s arithmetic for a real codec UDF in production).
  */
object Multimodal {

  /** Pack a string column as a binary payload (stand-in for real media
    * bytes in the test tables, which carry no binary columns).
    */
  def asBlob(c: Column): Column = encode(c, "UTF-8")

  /** Content-addressed id: sha256 hex of the blob. */
  def contentId(blob: Column): Column = sha2(blob, 256)

  /** STUB image decode: deterministic fake dimensions derived from the
    * byte length (real decode would parse the container header). Returns
    * struct<bytes, width, height, channels, content_id>.
    */
  def decodeImageStub(blob: Column): Column = {
    val n = length(blob) // octet length for binary
    struct(
      n.cast("long").as("bytes"),
      (lit(64) + pmod(n, lit(512))).cast("int").as("width"),
      (lit(64) + pmod(n * lit(7), lit(512))).cast("int").as("height"),
      lit(3).as("channels"),
      contentId(blob).as("content_id"))
  }

  /** STUB resize: scales the fake dims, keeping provenance. */
  def resizeStub(meta: Column, maxSide: Int): Column = {
    val scale = when(greatest(meta("width"), meta("height")) > maxSide,
      lit(maxSide).cast("double") / greatest(meta("width"), meta("height")))
      .otherwise(lit(1.0))
    struct(
      meta("bytes").as("bytes"),
      floor(meta("width") * scale).cast("int").as("width"),
      floor(meta("height") * scale).cast("int").as("height"),
      meta("channels").as("channels"),
      meta("content_id").as("content_id"))
  }

  /** STUB frame sampling for "video" blobs: n evenly spaced 16-byte slices
    * hashed into frame content ids (real impl: demux + decode keyframes).
    */
  def sampleFramesStub(blob: Column, n: Int): Column = {
    val len = length(blob)
    transform(sequence(lit(0), lit(n - 1)), i => {
      val off = (i * greatest(len - 16, lit(1))) / lit(math.max(n - 1, 1)) + 1
      sha2(substring(blob, off.cast("int"), lit(16)), 256)
    })
  }

  /** Full stub pipeline over a DataFrame: blob -> decode -> resize ->
    * features; demonstrates partition-preserving multimodal flow (no
    * shuffle, stays in one codegen stage).
    */
  def imagePipeline(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val blob = asBlob(col(textCol))
    df.select(col(idCol), decodeImageStub(blob).as("img"))
      .select(col(idCol), resizeStub(col("img"), 256).as("img"))
      .select(col(idCol),
        col("img.bytes").as("blob_bytes"),
        col("img.width").as("width"),
        col("img.height").as("height"),
        col("img.channels").as("channels"),
        col("img.content_id").as("content_id"))
  }
}
