package graft.io

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}

import scala.collection.mutable

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation}

import graft.metrics.{ColumnProfileState, Moments, ProfileConfig}
import graft.types.InferredType

/** Hand-rolled protobuf wire-format writer/reader (no generated classes, no
  * protobuf dependency — varint/fixed64/length-delimited are the whole
  * format). Field numbers were recovered from the reference's own binary
  * fixtures (core/src/test/resources/{python_profile.bin, regression.bin},
  * decoded with a generic wire-format reader) and its builder call sites
  * (/root/reference/core/src/main/java/com/whylogs/core/DatasetProfile.java:302-337,
  * ColumnProfile.java:198-212, NumberTracker.java:92-107,
  * StringTracker.java:162-180).
  */
private[io] object Wire {
  final class Writer {
    private val bos = new ByteArrayOutputStream()

    def toByteArray: Array[Byte] = bos.toByteArray

    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        bos.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      bos.write(x.toInt)
    }
    private def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)

    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def double(field: Int, v: Double): Unit = {
      tag(field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { bos.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def bytes(field: Int, v: Array[Byte]): Unit = {
      tag(field, 2); varint(v.length.toLong); bos.write(v)
    }
    def string(field: Int, v: String): Unit =
      bytes(field, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def message(field: Int)(body: Writer => Unit): Unit = {
      val w = new Writer
      body(w)
      bytes(field, w.toByteArray)
    }
    def writeDelimitedTo(out: OutputStream): Unit = {
      val b = toByteArray
      val lw = new Writer
      lw.varint(b.length.toLong)
      out.write(lw.toByteArray)
      out.write(b)
    }
  }

  /** One decoded field: (number, wireType, value). varint -> Long,
    * fixed64 -> Long bits, length-delimited -> Array[Byte].
    */
  final case class Field(number: Int, wireType: Int, value: Any) {
    def asLong: Long = value.asInstanceOf[Long]
    def asDouble: Double = java.lang.Double.longBitsToDouble(asLong)
    def asBytes: Array[Byte] = value.asInstanceOf[Array[Byte]]
    def asString: String =
      new String(asBytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var x = 0L; var s = 0; var i = pos
    while (true) {
      val byte = b(i) & 0xff
      x |= (byte & 0x7fL) << s
      i += 1
      if ((byte & 0x80) == 0) return (x, i)
      s += 7
    }
    throw new IllegalStateException("unreachable")
  }

  def fields(b: Array[Byte]): Seq[Field] = {
    val out = mutable.ArrayBuffer.empty[Field]
    var i = 0
    while (i < b.length) {
      val (t, i1) = readVarint(b, i)
      val fn = (t >>> 3).toInt
      val wt = (t & 7).toInt
      wt match {
        case 0 =>
          val (v, i2) = readVarint(b, i1)
          out += Field(fn, 0, v); i = i2
        case 1 =>
          var bits = 0L; var j = 0
          while (j < 8) { bits |= (b(i1 + j) & 0xffL) << (8 * j); j += 1 }
          out += Field(fn, 1, bits); i = i1 + 8
        case 2 =>
          val (ln, i2) = readVarint(b, i1)
          out += Field(fn, 2, java.util.Arrays.copyOfRange(b, i2, i2 + ln.toInt))
          i = i2 + ln.toInt
        case 5 =>
          var bits = 0L; var j = 0
          while (j < 4) { bits |= (b(i1 + j) & 0xffL) << (8 * j); j += 1 }
          out += Field(fn, 5, bits); i = i1 + 4
        case other => throw new IllegalArgumentException(s"wire type $other")
      }
    }
    out.toSeq
  }

  def readDelimited(in: InputStream): Option[Array[Byte]] = {
    // varint length prefix, then the message
    var x = 0L; var s = 0
    var byte = in.read()
    if (byte < 0) return None
    while ((byte & 0x80) != 0) {
      x |= (byte & 0x7fL) << s; s += 7
      byte = in.read()
      if (byte < 0) return None
    }
    x |= (byte & 0x7fL) << s
    val buf = new Array[Byte](x.toInt)
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) throw new java.io.EOFException()
      off += n
    }
    Some(buf)
  }
}

/** whylogs `DatasetProfileMessage` codec over the engine's profile states —
  * the interchange format profiles written by the reference's Java/Python
  * implementations use. Schema version 1.3 (SchemaInformation.java:10-11).
  */
object ProfileProto {

  /** Tag keys set through [[DatasetProfile.withTag]] get this prefix —
    * the reference's session-tag namespace (DatasetProfile.java:43,107).
    */
  val TagPrefix = "whylogs.tag."

  /** A parsed dataset profile: identity + per-column states. */
  final case class DatasetProfile(
      sessionId: String,
      sessionTimestamp: Long,
      dataTimestamp: Option[Long],
      tags: Map[String, String],
      metadata: Map[String, String],
      columns: Map[String, ColumnProfileState]) {

    /** Add a session tag under the `whylogs.tag.` namespace
      * (DatasetProfile.java:107-110).
      */
    def withTag(key: String, value: String): DatasetProfile =
      copy(tags = tags + (TagPrefix + key -> value))

    def withMetadata(key: String, value: String): DatasetProfile =
      copy(metadata = metadata + (key -> value))

    /** Permissive merge (DatasetProfile.java:251-262): identity fields
      * come from `this`; tags and metadata keep only entries identical on
      * BOTH sides (intersect-on-merge); columns union with pairwise state
      * merge.
      */
    def merge(other: DatasetProfile): DatasetProfile = {
      val sharedTags = tags.filter { case (k, v) => other.tags.get(k).contains(v) }
      doMerge(other, sharedTags)
    }

    /** Strict merge (DatasetProfile.java:217-239): rejects mismatched
      * sessionId / sessionTimestamp / dataTimestamp / tags with
      * IllegalArgumentException before merging.
      */
    def mergeStrict(other: DatasetProfile): DatasetProfile = {
      require(sessionId == other.sessionId,
        s"Mismatched name. Current name [$sessionId] is merged with " +
          s"[${other.sessionId}]")
      require(sessionTimestamp == other.sessionTimestamp,
        s"Mismatched session timestamp. Current ts [$sessionTimestamp] is " +
          s"merged with [${other.sessionTimestamp}]")
      require(dataTimestamp == other.dataTimestamp,
        s"Mismatched data timestamp. Current ts [$dataTimestamp] is merged " +
          s"with [${other.dataTimestamp}]")
      require(tags == other.tags,
        s"Mismatched tags. Current $tags being merged with ${other.tags}")
      doMerge(other, tags)
    }

    private def doMerge(
        other: DatasetProfile, mergedTags: Map[String, String]): DatasetProfile = {
      val sharedMeta =
        metadata.filter { case (k, v) => other.metadata.get(k).contains(v) }
      val mergedCols = (columns.keySet ++ other.columns.keySet).map { name =>
        val m = new ColumnProfileState(graft.metrics.ProfileConfig.default,
          allocate = false)
        // merge THROWAWAY deep copies: ColumnProfileState.merge adopts the
        // other side's mutable sketches by reference when its own are null,
        // so merging the originals would let a later merge corrupt them
        def copyOf(st: ColumnProfileState): ColumnProfileState =
          ColumnProfileState.deserialize(st.serialize())
        columns.get(name).foreach(s => m.merge(copyOf(s)))
        other.columns.get(name).foreach(s => m.merge(copyOf(s)))
        name -> m
      }.toMap
      DatasetProfile(sessionId, sessionTimestamp, dataTimestamp, mergedTags,
        sharedMeta, mergedCols)
    }
  }

  /** Model-quality metrics carried at field 10 of DatasetProfileMessage
    * (ModelProfileMessage — DatasetProfile.java line with modelProfile,
    * ModelProfile.java:36-41). Numbering reconstructed from builder call
    * order (the snapshot ships no .proto), pinned by round-trip specs.
    */
  sealed trait ModelMetricsProto

  /** RegressionMetricsMessage (RegressionMetrics.java:70-78). */
  final case class RegressionProto(
      predictionField: String,
      targetField: String,
      sumAbsDiff: Double,
      sumDiff: Double,
      sum2Diff: Double,
      count: Long) extends ModelMetricsProto

  /** ScoreMatrixMessage (ClassificationMetrics.java:207-223): sorted
    * labels, row-major n x n per-cell score trackers
    * (row = prediction, col = target — ClassificationMetrics.java:85-90),
    * each serialized as a NumbersMessage.
    */
  final case class ClassificationProto(
      labels: Seq[String],
      predictionField: String,
      targetField: String,
      scoreField: String,
      cells: Map[(String, String), Moments]) extends ModelMetricsProto

  // ---- writer ----

  /** ModelProfileMessage body: outputFields=1 (repeated), metrics=2
    * {modelType=1 (CLASSIFICATION=1 / REGRESSION=2), scoreMatrix=2,
    * regressionMetrics=3}.
    */
  private def modelProfileBody(w: Wire.Writer, m: ModelMetricsProto): Unit = {
    m match {
      case r: RegressionProto => w.string(1, r.predictionField)
      case c: ClassificationProto => w.string(1, c.predictionField)
    }
    w.message(2) { mm =>
      m match {
        case c: ClassificationProto =>
          mm.int64(1, 1L) // ModelType.CLASSIFICATION
          mm.message(2) { sm =>
            c.labels.foreach(sm.string(1, _))
            for (i <- c.labels.indices; j <- c.labels.indices) {
              val cell = c.cells.getOrElse((c.labels(i), c.labels(j)),
                new Moments)
              numbersFromMoments(sm, 2, cell)
            }
            sm.string(3, c.predictionField)
            sm.string(4, c.targetField)
            sm.string(5, c.scoreField)
          }
        case r: RegressionProto =>
          mm.int64(1, 2L) // ModelType.REGRESSION
          mm.message(3) { rm =>
            rm.string(1, r.predictionField)
            rm.string(2, r.targetField)
            rm.double(3, r.sumAbsDiff)
            rm.double(4, r.sumDiff)
            rm.double(5, r.sum2Diff)
            rm.int64(6, r.count)
          }
      }
    }
  }

  /** DatasetProperties message body — shared by the whole-profile writer
    * and the chunked MessageSegment writer ([[ProfileSegments]]).
    */
  private[io] def propertiesBody(props: Wire.Writer, p: DatasetProfile): Unit = {
    props.int64(1, 1L) // schemaMajorVersion (SchemaInformation.java:10)
    props.int64(2, 3L) // schemaMinorVersion
    props.string(3, p.sessionId)
    props.int64(4, p.sessionTimestamp)
    props.int64(5, p.dataTimestamp.getOrElse(-1L)) // -1 = null
    p.tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      props.message(6) { e => e.string(1, k); e.string(2, v) }
    }
    p.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      props.message(7) { e => e.string(1, k); e.string(2, v) }
    }
  }

  /** Parse a DatasetProperties body into an empty-columns profile. */
  private[io] def parseProperties(b: Array[Byte]): DatasetProfile = {
    var sessionId = ""
    var sessionTs = 0L
    var dataTs: Option[Long] = None
    val tags = mutable.Map.empty[String, String]
    val meta = mutable.Map.empty[String, String]
    Wire.fields(b).foreach {
      case Wire.Field(3, 2, v: Array[Byte]) =>
        sessionId = new String(v, java.nio.charset.StandardCharsets.UTF_8)
      case Wire.Field(4, 0, v: Long) => sessionTs = v
      case Wire.Field(5, 0, v: Long) => if (v != -1L) dataTs = Some(v)
      case f @ Wire.Field(6, 2, _) =>
        val kv = Wire.fields(f.asBytes)
        tags(kv.find(_.number == 1).map(_.asString).getOrElse("")) =
          kv.find(_.number == 2).map(_.asString).getOrElse("")
      case f @ Wire.Field(7, 2, _) =>
        val kv = Wire.fields(f.asBytes)
        meta(kv.find(_.number == 1).map(_.asString).getOrElse("")) =
          kv.find(_.number == 2).map(_.asString).getOrElse("")
      case _ =>
    }
    DatasetProfile(sessionId, sessionTs, dataTs, tags.toMap, meta.toMap,
      Map.empty)
  }

  def toBytes(
      p: DatasetProfile,
      model: Option[ModelMetricsProto] = None): Array[Byte] = {
    val w = new Wire.Writer
    w.message(1)(propertiesBody(_, p))
    model.foreach(m => w.message(10)(modelProfileBody(_, m)))
    p.columns.toSeq.sortBy(_._1).foreach { case (name, st) =>
      w.message(2) { e =>
        e.string(1, name)
        e.bytes(2, columnBytes(name, st))
      }
    }
    w.toByteArray
  }

  def writeDelimited(out: OutputStream, p: DatasetProfile): Unit = {
    val w = new Wire.Writer
    val b = toBytes(p)
    w.varint(b.length.toLong)
    out.write(w.toByteArray)
    out.write(b)
  }

  private def momentsMessage(w: Wire.Writer, field: Int, m: Moments,
      asLongs: Boolean): Unit =
    if (m.count > 0) w.message(field) { t =>
      t.int64(1, m.count)
      if (asLongs) {
        t.int64(2, m.min.toLong); t.int64(3, m.max.toLong)
        t.int64(4, m.sum.toLong)
      } else {
        t.double(2, m.min); t.double(3, m.max); t.double(4, m.sum)
      }
    }

  /** Serialized KLL histogram, valid even when the sketch is null/empty —
    * the reference reader heapifies the histogram bytes unconditionally
    * (NumberTracker.java:110-112), so the field must always hold a
    * parseable sketch image.
    */
  private def kllBytes(k: KllFloatsSketch): Array[Byte] =
    (if (k == null) KllFloatsSketch.newHeapInstance(256) else k).toByteArray

  /** Uncompressed compact theta image (serial format 3). The reference's
    * ThetaSketch.serialize emits getResult().toByteArray() and its pinned
    * datasketches 1.3.0 Sketch.heapify rejects the compressed v4 format
    * that toByteArrayCompressed would produce (ThetaSketch.java:12-21).
    */
  private def thetaBytes(
      u: org.apache.datasketches.theta.Union): Array[Byte] = {
    val union = if (u == null) SetOperation.builder().buildUnion() else u
    union.getResult.toByteArray
  }

  /** NumbersMessage for a tracker-of-moments (string length/token length):
    * the reference nests a full NumberTracker there; we emit the exact
    * long/double tracker part plus the always-required (possibly empty)
    * histogram and theta images NumberTracker.fromProtobuf heapifies.
    */
  private def numbersFromMoments(w: Wire.Writer, field: Int, m: Moments): Unit =
    w.message(field) { n =>
      n.message(1) { v => // variance{count, sum(m2), mean}
        v.int64(1, m.count); v.double(2, m.m2); v.double(3, m.mean)
      }
      if (m.count > 0) {
        val isIntegral = m.min == m.min.floor && m.max == m.max.floor &&
          m.sum == m.sum.floor
        momentsMessage(n, if (isIntegral) 3 else 2, m, asLongs = isIntegral)
      }
      n.bytes(4, kllBytes(null))
      n.bytes(6, thetaBytes(null))
    }

  def columnBytes(name: String, st: ColumnProfileState): Array[Byte] = {
    val w = new Wire.Writer
    w.string(1, name)
    w.message(2) { c => // Counters{count, trueCount: Int64Value}
      c.int64(1, st.count)
      if (st.trueCount > 0) c.message(2)(_.int64(1, st.trueCount))
    }
    w.message(3) { s => // SchemaMessage{typeCounts: map<int32,int64>}
      st.schema.counts.zipWithIndex.foreach { case (n, id) =>
        if (n > 0) s.message(1) { e => e.int64(1, id.toLong); e.int64(2, n) }
      }
    }
    w.message(4) { n => // NumbersMessage — always written: the reference
      // decodes it unconditionally (ColumnProfile.java:227) and heapifies
      // histogram + theta whether or not data was numeric.
      val num = st.numbers
      n.message(1) { v => // variance{count, sum, mean}
        v.int64(1, num.variance.count)
        v.double(2, num.variance.m2)
        v.double(3, num.variance.mean)
      }
      momentsMessage(n, 2, num.doubles, asLongs = false) // doubles{c,min,max,sum}
      if (num.longCount > 0) n.message(3) { l => // longs{c,min,max,sum}
        l.int64(1, num.longCount); l.int64(2, num.longMin)
        l.int64(3, num.longMax); l.int64(4, num.longSum)
      }
      n.bytes(4, kllBytes(num.kll))
      n.bytes(6, thetaBytes(num.theta))
    }
    if (st.strings.count > 0) w.message(5) { s => // StringsMessage
      s.int64(1, st.strings.count)
      s.bytes(4, thetaBytes(st.strings.theta))
      // hasLength implies the reference also decodes tokenLength and
      // charPosTracker (StringTracker.java:198-203) — write both trackers
      // whenever the message exists so the pair stays parseable.
      numbersFromMoments(s, 5, st.strings.length)
      numbersFromMoments(s, 6, st.strings.tokenLength)
      // CharPosMessage{charList=1, charPosMap=2: map<string, NumbersMessage>}
      // (CharPosTracker.java:171-181). No fixture binary carries the
      // new-format strings fields, so 5/6/7 numbering is reconstructed from
      // the builder call order; round-trip correctness is spec-pinned.
      if (st.strings.charPos != null) s.message(7) { cp =>
        cp.string(1, st.strings.charPos.charset)
        st.strings.charPos.perChar.toSeq.sortBy(_._1).foreach { case (c, m) =>
          cp.message(2) { e =>
            e.string(1, c.toString)
            numbersFromMoments(e, 2, m)
          }
        }
      }
    }
    if (st.freq != null) w.message(7) { f => // FrequentItemsSketchMessage
      f.bytes(1, st.freq.toByteArray(new ArrayOfStringsSerDe))
      f.int64(2, 7L) // lgMaxK (maxMapSize 128)
    }
    w.message(8) { h => // HllSketchMessage — always written: the reference
      // heapifies cardinalityTracker.sketch unconditionally
      // (ColumnProfile.java:229-230).
      val hll = if (st.hll == null) new HllSketch(12) else st.hll
      h.bytes(1, hll.toCompactByteArray)
      h.int64(2, hll.getLgConfigK.toLong)
    }
    w.toByteArray
  }

  // ---- reader ----

  def fromBytes(b: Array[Byte]): DatasetProfile = {
    var props = DatasetProfile("", 0L, None, Map.empty, Map.empty, Map.empty)
    val cols = mutable.Map.empty[String, ColumnProfileState]
    Wire.fields(b).foreach {
      case f @ Wire.Field(1, 2, _) =>
        props = parseProperties(f.asBytes)
      case f @ Wire.Field(2, 2, _) =>
        val entry = Wire.fields(f.asBytes)
        val name = entry.find(_.number == 1).map(_.asString).getOrElse("")
        entry.find(_.number == 2).foreach { v =>
          cols(name) = parseColumn(v.asBytes)
        }
      case _ => // modeProfile (10) and unknown fields skipped
    }
    props.copy(columns = cols.toMap)
  }

  def readDelimited(in: InputStream): Option[DatasetProfile] =
    Wire.readDelimited(in).map(fromBytes)

  /** Parse the optional ModelProfileMessage at field 10 of a
    * DatasetProfileMessage binary (the reader half of
    * [[modelProfileBody]]; ModelProfile.fromProtobuf semantics —
    * ModelProfile.java:44-62).
    */
  def parseModelProfile(b: Array[Byte]): Option[ModelMetricsProto] =
    Wire.fields(b).find(f => f.number == 10 && f.wireType == 2)
      .flatMap { mp =>
        Wire.fields(mp.asBytes).find(f => f.number == 2 && f.wireType == 2)
          .map(_.asBytes)
      }
      .flatMap { mm =>
        var tpe = 0L
        var score: Option[Array[Byte]] = None
        var regr: Option[Array[Byte]] = None
        Wire.fields(mm).foreach {
          case Wire.Field(1, 0, v: Long) => tpe = v
          case f @ Wire.Field(2, 2, _)   => score = Some(f.asBytes)
          case f @ Wire.Field(3, 2, _)   => regr = Some(f.asBytes)
          case _ =>
        }
        if (tpe == 2L) regr.map { r =>
          var pf = ""; var tf = ""
          var sad = 0.0; var sd = 0.0; var s2 = 0.0; var n = 0L
          Wire.fields(r).foreach {
            case f @ Wire.Field(1, 2, _)   => pf = f.asString
            case f @ Wire.Field(2, 2, _)   => tf = f.asString
            case f @ Wire.Field(3, 1, _)   => sad = f.asDouble
            case f @ Wire.Field(4, 1, _)   => sd = f.asDouble
            case f @ Wire.Field(5, 1, _)   => s2 = f.asDouble
            case Wire.Field(6, 0, v: Long) => n = v
            case _ =>
          }
          RegressionProto(pf, tf, sad, sd, s2, n)
        }
        else if (tpe == 1L) score.map { sm =>
          val labels = mutable.ArrayBuffer.empty[String]
          val cellBufs = mutable.ArrayBuffer.empty[Array[Byte]]
          var pf = ""; var tf = ""; var sf = ""
          Wire.fields(sm).foreach {
            case f @ Wire.Field(1, 2, _) => labels += f.asString
            case f @ Wire.Field(2, 2, _) => cellBufs += f.asBytes
            case f @ Wire.Field(3, 2, _) => pf = f.asString
            case f @ Wire.Field(4, 2, _) => tf = f.asString
            case f @ Wire.Field(5, 2, _) => sf = f.asString
            case _ =>
          }
          val n = labels.length
          val cells = cellBufs.zipWithIndex.flatMap { case (cb, idx) =>
            val m = readNumbersAsMoments(cb)
            if (m.count > 0 && n > 0)
              Some((labels(idx / n), labels(idx % n)) -> m)
            else None
          }.toMap
          ClassificationProto(labels.toSeq, pf, tf, sf, cells)
        }
        else None
      }

  private def readMoments(b: Array[Byte], asLongs: Boolean): Moments = {
    val m = new Moments
    Wire.fields(b).foreach {
      case Wire.Field(1, 0, v: Long) => m.count = v
      case f @ Wire.Field(2, _, _) =>
        m.min = if (asLongs) f.asLong.toDouble else f.asDouble
      case f @ Wire.Field(3, _, _) =>
        m.max = if (asLongs) f.asLong.toDouble else f.asDouble
      case f @ Wire.Field(4, _, _) =>
        m.sum = if (asLongs) f.asLong.toDouble else f.asDouble
      case _ =>
    }
    if (m.count > 0) { m.mean = m.sum / m.count }
    m
  }

  def parseColumn(b: Array[Byte]): ColumnProfileState = {
    val st = new ColumnProfileState(ProfileConfig.default, allocate = false)
    Wire.fields(b).foreach {
      case f @ Wire.Field(2, 2, _) => // counters
        Wire.fields(f.asBytes).foreach {
          case Wire.Field(1, 0, v: Long) => st.count = v
          case tc @ Wire.Field(2, 2, _) => // trueCount Int64Value
            Wire.fields(tc.asBytes).foreach {
              case Wire.Field(1, 0, v: Long) => st.trueCount = v
              case _ =>
            }
          case nc @ Wire.Field(3, 2, _) =>
            // legacy nullCount (pre-schema-tracker writers): fold into the
            // NULL type count, additive with any schema-tracked nulls —
            // reference SchemaTracker.fromProtobuf:120-128 +
            // ColumnProfile.fromProtobuf:225-226
            Wire.fields(nc.asBytes).foreach {
              case Wire.Field(1, 0, v: Long) =>
                st.schema.counts(graft.types.InferredType.Null.id) += v
              case _ =>
            }
          case _ =>
        }
      case f @ Wire.Field(3, 2, _) => // schema typeCounts
        Wire.fields(f.asBytes).foreach {
          case e @ Wire.Field(1, 2, _) =>
            val kv = Wire.fields(e.asBytes)
            val id = kv.find(_.number == 1).map(_.asLong.toInt).getOrElse(0)
            val n = kv.find(_.number == 2).map(_.asLong).getOrElse(0L)
            if (id >= 0 && id < 6)
              st.schema.counts(id) += n
          case _ =>
        }
      case f @ Wire.Field(4, 2, _) => // numbers
        Wire.fields(f.asBytes).foreach {
          case v @ Wire.Field(1, 2, _) => // variance{count, sum(m2), mean}
            Wire.fields(v.asBytes).foreach {
              case Wire.Field(1, 0, c: Long) => st.numbers.variance.count = c
              case d @ Wire.Field(2, 1, _) => st.numbers.variance.m2 = d.asDouble
              case d @ Wire.Field(3, 1, _) => st.numbers.variance.mean = d.asDouble
              case _ =>
            }
          case d @ Wire.Field(2, 2, _) => // doubles
            st.numbers.doubles.merge(readMoments(d.asBytes, asLongs = false))
          case l @ Wire.Field(3, 2, _) => // longs
            Wire.fields(l.asBytes).foreach {
              case Wire.Field(1, 0, v: Long) => st.numbers.longCount = v
              case Wire.Field(2, 0, v: Long) => st.numbers.longMin = v
              case Wire.Field(3, 0, v: Long) => st.numbers.longMax = v
              case Wire.Field(4, 0, v: Long) => st.numbers.longSum = v
              case _ =>
            }
          case k @ Wire.Field(4, 2, _) =>
            st.numbers.kll = KllFloatsSketch.heapify(Memory.wrap(k.asBytes))
          case t @ Wire.Field(6, 2, _) =>
            val u = SetOperation.builder().buildUnion()
            u.union(CompactSketch.heapify(Memory.wrap(t.asBytes)))
            st.numbers.theta = u
          case _ =>
        }
        // keep variance min/max sum-consistent (variance tracker carries
        // mean/m2; count is the numeric total)
      case f @ Wire.Field(5, 2, _) => // strings
        Wire.fields(f.asBytes).foreach {
          case Wire.Field(1, 0, v: Long) => st.strings.count = v
          case t @ Wire.Field(4, 2, _) =>
            val u = SetOperation.builder().buildUnion()
            u.union(CompactSketch.heapify(Memory.wrap(t.asBytes)))
            st.strings.theta = u
          case n @ Wire.Field(5, 2, _) =>
            st.strings.length.merge(readNumbersAsMoments(n.asBytes))
          case n @ Wire.Field(6, 2, _) =>
            st.strings.tokenLength.merge(readNumbersAsMoments(n.asBytes))
          case f @ Wire.Field(7, 2, _) => // CharPosMessage
            var charset = graft.metrics.CharPosState.DefaultCharset
            val entries =
              mutable.ArrayBuffer.empty[(Char, graft.metrics.Moments)]
            Wire.fields(f.asBytes).foreach {
              case cl @ Wire.Field(1, 2, _) => charset = cl.asString
              case e @ Wire.Field(2, 2, _) =>
                val kv = Wire.fields(e.asBytes)
                val key = kv.find(_.number == 1).map(_.asString).getOrElse("")
                val m = kv.find(_.number == 2)
                  .map(x => readNumbersAsMoments(x.asBytes))
                if (key.nonEmpty && m.isDefined)
                  entries += ((key.charAt(0), m.get))
              case _ =>
            }
            val cp = new graft.metrics.CharPosState(charset)
            entries.foreach { case (c, m) => cp.perChar(c) = m }
            st.strings.charPos = cp
          case _ => // items sketch (3): column-level freq covers it
        }
      case f @ Wire.Field(7, 2, _) => // frequentItems
        Wire.fields(f.asBytes).foreach {
          case s @ Wire.Field(1, 2, _) if s.asBytes.nonEmpty =>
            st.freq = ItemsSketch.getInstance[String](
              Memory.wrap(s.asBytes), new ArrayOfStringsSerDe)
          case _ =>
        }
      case f @ Wire.Field(8, 2, _) => // cardinalityTracker
        Wire.fields(f.asBytes).foreach {
          case s @ Wire.Field(1, 2, _) if s.asBytes.nonEmpty =>
            st.hll = HllSketch.heapify(Memory.wrap(s.asBytes))
          case _ =>
        }
      case _ =>
    }
    st
  }

  /** NumbersMessage (nested under strings.length/tokenLength) -> Moments. */
  private def readNumbersAsMoments(b: Array[Byte]): Moments = {
    val out = new Moments
    Wire.fields(b).foreach {
      case v @ Wire.Field(1, 2, _) => // variance{count, m2, mean}
        Wire.fields(v.asBytes).foreach {
          case Wire.Field(1, 0, c: Long) => out.count = c
          case d @ Wire.Field(2, 1, _) => out.m2 = d.asDouble
          case d @ Wire.Field(3, 1, _) => out.mean = d.asDouble
          case _ =>
        }
      case d @ Wire.Field(2, 2, _) =>
        val m = readMoments(d.asBytes, asLongs = false)
        out.min = m.min; out.max = m.max; out.sum = m.sum
        if (out.count == 0) out.count = m.count
      case l @ Wire.Field(3, 2, _) =>
        val m = readMoments(l.asBytes, asLongs = true)
        out.min = m.min; out.max = m.max; out.sum = m.sum
        if (out.count == 0) out.count = m.count
      case _ =>
    }
    out
  }
}
