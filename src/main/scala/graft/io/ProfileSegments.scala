package graft.io

import java.io.{InputStream, OutputStream}

import scala.collection.mutable

import graft.metrics.ColumnProfileState

/** Chunked `MessageSegment` wire form for very wide profiles — the
  * reference splits a DatasetProfile into one metadata segment plus
  * column chunks capped at ~1 MB each so a 10k-column profile streams as
  * bounded messages instead of one giant blob
  * (core/src/main/java/com/whylogs/core/iterator/ColumnsChunkSegmentIterator.java:11-75,
  * DatasetProfile.java:190-215). Segment layout (reconstructed — the
  * reference snapshot ships no .proto; numbering is pinned by round-trip
  * specs, same caveat as the CharPosMessage codec):
  *
  *  - `MessageSegment { marker=1, oneof { metadata: DatasetMetadataSegment=2,
  *    columns: ColumnsChunkSegment=3 } }`
  *  - `DatasetMetadataSegment { properties: DatasetProperties=2, marker=3 }`
  *  - `ColumnsChunkSegment { marker=1, repeated columns: ColumnMessage=2 }`
  *
  * The marker (sessionId + random UUID in the reference,
  * DatasetProfile.java:193) ties column chunks back to their metadata
  * segment, so several profiles can interleave on one stream; the reader
  * reassembles by marker.
  */
object ProfileSegments {

  /** Max serialized ColumnMessage content per chunk
    * (ColumnsChunkSegmentIterator.java:12: 1 MB minus framing slack).
    */
  val MaxChunkContentBytes: Int = 1000000 - 10

  /** Serialize `p` into MessageSegment binaries: segment 0 carries the
    * profile identity (properties), the rest carry column chunks packed
    * greedily up to `maxChunkContentBytes` of ColumnMessage content.
    * Mirrors the reference's greedy cut: a chunk closes when the NEXT
    * column would overflow it; a single column larger than the cap gets
    * its own (oversized) chunk — the reference has the same unresolved
    * case (ColumnsChunkSegmentIterator.java:46 TODO).
    */
  def segments(
      p: ProfileProto.DatasetProfile,
      marker: String,
      maxChunkContentBytes: Int = MaxChunkContentBytes): Seq[Array[Byte]] = {
    val metaSeg = {
      val w = new Wire.Writer
      w.string(1, marker)
      w.message(2) { md =>
        md.message(2)(ProfileProto.propertiesBody(_, p))
        md.string(3, marker)
      }
      w.toByteArray
    }

    val colMsgs = p.columns.toSeq.sortBy(_._1)
      .map { case (n, st) => ProfileProto.columnBytes(n, st) }
    val chunks = mutable.ArrayBuffer.empty[Seq[Array[Byte]]]
    var current = mutable.ArrayBuffer.empty[Array[Byte]]
    var contentLen = 0
    colMsgs.foreach { msg =>
      if (current.nonEmpty && contentLen + msg.length > maxChunkContentBytes) {
        chunks += current.toSeq
        current = mutable.ArrayBuffer.empty[Array[Byte]]
        contentLen = 0
      }
      current += msg
      contentLen += msg.length
    }
    if (current.nonEmpty) chunks += current.toSeq

    val colSegs = chunks.toSeq.map { msgs =>
      val w = new Wire.Writer
      w.message(3) { cs =>
        cs.string(1, marker)
        msgs.foreach(cs.bytes(2, _))
      }
      w.toByteArray
    }
    metaSeg +: colSegs
  }

  /** Write `p` as varint-delimited MessageSegments. */
  def writeDelimited(
      out: OutputStream,
      p: ProfileProto.DatasetProfile,
      marker: String,
      maxChunkContentBytes: Int = MaxChunkContentBytes): Unit =
    segments(p, marker, maxChunkContentBytes).foreach { seg =>
      val w = new Wire.Writer
      w.varint(seg.length.toLong)
      out.write(w.toByteArray)
      out.write(seg)
    }

  /** Read ALL varint-delimited MessageSegments from `in` and reassemble
    * profiles by marker (stream order of profiles is preserved; chunks of
    * different profiles may interleave).
    */
  def readDelimited(in: InputStream): Seq[ProfileProto.DatasetProfile] = {
    val order = mutable.ArrayBuffer.empty[String]
    val props = mutable.Map.empty[String, ProfileProto.DatasetProfile]
    val cols = mutable.Map.empty[String, mutable.Map[String, ColumnProfileState]]

    var next = Wire.readDelimited(in)
    while (next.isDefined) {
      var marker = ""
      var metadata: Option[Array[Byte]] = None
      var chunk: Option[Array[Byte]] = None
      Wire.fields(next.get).foreach {
        case f @ Wire.Field(1, 2, _) => marker = f.asString
        case f @ Wire.Field(2, 2, _) => metadata = Some(f.asBytes)
        case f @ Wire.Field(3, 2, _) => chunk = Some(f.asBytes)
        case _ =>
      }
      metadata.foreach { md =>
        var body: Option[Array[Byte]] = None
        Wire.fields(md).foreach {
          case f @ Wire.Field(2, 2, _) => body = Some(f.asBytes)
          case f @ Wire.Field(3, 2, _) => if (marker.isEmpty) marker = f.asString
          case _ =>
        }
        if (!props.contains(marker)) order += marker
        props(marker) = body.map(ProfileProto.parseProperties)
          .getOrElse(ProfileProto.DatasetProfile("", 0L, None, Map.empty,
            Map.empty, Map.empty))
      }
      chunk.foreach { ch =>
        var chunkMarker = marker
        val msgs = mutable.ArrayBuffer.empty[Array[Byte]]
        Wire.fields(ch).foreach {
          case f @ Wire.Field(1, 2, _) => chunkMarker = f.asString
          case f @ Wire.Field(2, 2, _) => msgs += f.asBytes
          case _ =>
        }
        val target = cols.getOrElseUpdate(chunkMarker,
          mutable.Map.empty[String, ColumnProfileState])
        msgs.foreach { m =>
          val name = Wire.fields(m).find(_.number == 1).map(_.asString)
            .getOrElse("")
          target(name) = ProfileProto.parseColumn(m)
        }
      }
      next = Wire.readDelimited(in)
    }

    order.toSeq.map { m =>
      props(m).copy(columns =
        cols.getOrElse(m, mutable.Map.empty).toMap)
    }
  }
}
