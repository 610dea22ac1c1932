package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video-as-bytes) plumbing: opaque `binary`
  * columns + typed metadata behind a partition-scoped codec boundary.
  * REAL decoders exist for every container the JVM handles without
  * external libraries: PPM/WAV/GVID byte-walkers in [[Media]], PNG/JPEG
  * through the JDK's `javax.imageio` ([[ImageIoCodec]] /
  * [[Media.decodeImage]]). [[FakeImageCodec]] remains only for
  * formats the JVM genuinely cannot decode here (MP3/MP4/WebP) and for
  * text-as-blob demo pipelines — the Spark-side schema, batching, and
  * partitioning are identical either way, so swapping a native codec in
  * production changes one object.
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

  // --- executor-side codec boundary (the mapInPandas-equivalent shape) ---

  /** One decoded media row. */
  final case class ImageRecord(
      id: Long, blob_bytes: Long, width: Int, height: Int, channels: Int,
      content_id: String)

  /** Codec boundary for real decoders: `open()` runs ONCE per partition
    * (native decoder/model init is the expensive part — amortized across
    * the partition, the reason this is a mapPartitions and not a per-row
    * UDF), `decode` per blob, `close()` when the partition drains.
    */
  trait ImageCodec extends Serializable {
    def open(): Unit = ()
    /** @return (width, height, channels) parsed from the container. */
    def decode(blob: Array[Byte]): (Int, Int, Int)
    def close(): Unit = ()
  }

  /** Deterministic FAKE codec for containers the JVM cannot decode here
    * (MP3/MP4/WebP) and text-as-blob demo pipelines: dimensions derive
    * from the byte length (same arithmetic as [[decodeImageStub]]).
    * Every JVM-decodable format has a REAL codec instead:
    * [[ImageIoCodec]] (PNG/JPEG/PPM).
    */
  object FakeImageCodec extends ImageCodec {
    override def decode(blob: Array[Byte]): (Int, Int, Int) =
      (64 + blob.length % 512, 64 + (blob.length * 7) % 512, 3)
  }

  /** REAL codec through [[Media.decodeImage]]: P6 PPM via the
    * byte-level parser, PNG/JPEG via the JDK's `javax.imageio` — zero
    * external dependencies, headless-safe. The production plug for the
    * [[ImageCodec]] boundary; retires [[FakeImageCodec]] for every
    * container this JVM can decode.
    */
  object ImageIoCodec extends ImageCodec {
    override def decode(blob: Array[Byte]): (Int, Int, Int) = {
      val img = Media.decodeImage(blob)
      (img.width, img.height, img.channels)
    }
  }

  /** Decode + resize through a partition-scoped codec: no shuffle, codec
    * init amortized per partition, rows stream through the iterator (the
    * Scala-side equivalent of a mapInPandas batch pipeline).
    */
  def decodePartitions(
      df: DataFrame,
      idCol: String,
      textCol: String,
      codec: ImageCodec = FakeImageCodec,
      maxSide: Int = 256): org.apache.spark.sql.Dataset[ImageRecord] =
    decodeCore(df.select(col(idCol).cast("long"), asBlob(col(textCol))),
      codec, maxSide)

  /** [[decodePartitions]] over a REAL binary image column (no
    * text-as-blob packing) — default codec is the real [[ImageIoCodec]].
    */
  def decodeBlobPartitions(
      df: DataFrame,
      idCol: String,
      blobCol: String,
      codec: ImageCodec = ImageIoCodec,
      maxSide: Int = 256): org.apache.spark.sql.Dataset[ImageRecord] =
    decodeCore(df.select(col(idCol).cast("long"), col(blobCol)),
      codec, maxSide)

  private def decodeCore(
      pairs: DataFrame,
      codec: ImageCodec,
      maxSide: Int): org.apache.spark.sql.Dataset[ImageRecord] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        codec.open()
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        val decoded = it.map { case (id, blob) =>
          val (w0, h0, c) = codec.decode(blob)
          val scale =
            if (math.max(w0, h0) > maxSide) maxSide.toDouble / math.max(w0, h0)
            else 1.0
          digest.reset()
          val hex = digest.digest(blob).map("%02x".format(_)).mkString
          ImageRecord(id, blob.length.toLong,
            math.floor(w0 * scale).toInt, math.floor(h0 * scale).toInt, c, hex)
        }
        new Iterator[ImageRecord] {
          override def hasNext: Boolean = {
            val h = decoded.hasNext
            if (!h) codec.close()
            h
          }
          override def next(): ImageRecord = decoded.next()
        }
      }
  }
}
