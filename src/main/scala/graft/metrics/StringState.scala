package graft.metrics

import java.io.{DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}

/** Per-character position statistics: for every tracked character, exact
  * moments of the (0-based) positions at which it occurs. Characters outside
  * the tracked set pool under the NITL ("not in the list") slot `'\\u0000'`.
  *
  * Mirrors the reference's CharPosTracker semantics
  * (/root/reference/core/src/main/java/com/whylogs/core/statistics/datatypes/CharPosTracker.java:48-120)
  * — input lowercased, default charset below — except positions are tracked
  * with exact moments rather than full KLL/theta sketches per character
  * (a deliberate state-size reduction; quantiles of char positions are not
  * part of the correctness surface).
  */
final class CharPosState(initialCharset: String) extends Serializable {
  private var _charset: String = initialCharset
  private var tracked: Set[Char] = initialCharset.toSet
  val perChar: mutable.Map[Char, Moments] = mutable.Map.empty

  def charset: String = _charset

  def update(s: String): Unit = {
    val lower = s.toLowerCase
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      val key = if (tracked.contains(c)) c else '\u0000'
      perChar.getOrElseUpdate(key, new Moments).update(i.toDouble)
      i += 1
    }
  }

  /** Track against an explicit charset: when it differs from the current
    * tracked SET, accumulated positions are ambiguous (the NITL pool
    * changes meaning) and the state resets before tracking — the
    * reference's charset-change semantics (CharPosTracker.java:105-120).
    */
  def update(s: String, charString: String): Unit = {
    if (charString != null && charString.toSet != tracked) {
      tracked = charString.toSet
      _charset = charString
      perChar.clear()
    }
    update(s)
  }

  /** Position moments merge per character; the tracked set unions, as in
    * the reference's merge (CharPosTracker.java:128-156).
    */
  def merge(o: CharPosState): Unit = {
    if (o.tracked != tracked) {
      tracked = tracked ++ o.tracked
      _charset = tracked.toSeq.sorted.mkString
    }
    o.perChar.foreach { case (c, m) =>
      perChar.getOrElseUpdate(c, new Moments).merge(m)
    }
  }

  def write(out: DataOutputStream): Unit = {
    out.writeUTF(charset)
    out.writeInt(perChar.size)
    perChar.toSeq.sortBy(_._1).foreach { case (c, m) =>
      out.writeChar(c); m.write(out)
    }
  }
}

object CharPosState {
  /** default tracked charset, as the reference's
    * (/root/reference/core/src/main/java/com/whylogs/core/statistics/datatypes/CharPosTracker.java:48-50)
    */
  val DefaultCharset = "abcdefghijklmnopqrstuvwzyz0123456789-@!#$%^&*()[]{}"

  def read(in: DataInputStream): CharPosState = {
    val s = new CharPosState(in.readUTF())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val c = in.readChar()
      s.perChar(c) = Moments.read(in)
      i += 1
    }
    s
  }
}

/** String-column statistics: count, Theta distinct sketch over full strings,
  * exact length stats, token-count stats (default tokenizer: split on " "),
  * optional char-position tracker.
  *
  * Reference: /root/reference/core/src/main/java/com/whylogs/core/statistics/datatypes/StringTracker.java:63-90.
  */
final class StringState(val withTheta: Boolean, val withCharPos: Boolean)
    extends Serializable {
  var count: Long = 0L
  var theta: Union =
    if (withTheta) SetOperation.builder().buildUnion() else null
  val length = new Moments
  val tokenLength = new Moments
  var charPos: CharPosState =
    if (withCharPos) new CharPosState(CharPosState.DefaultCharset) else null

  def update(s: String): Unit = updateImpl(s, updateTheta = true)

  /** Repeat-value fast path (r17 memo cache): the caller PROVES this exact
    * string was already tracked by this state, so the theta update — a
    * byte-level no-op on a duplicate (MemoizedUpdateSpec) — is skipped.
    * Everything per-occurrence (count, length/token moments, char
    * positions) still runs.
    */
  def updateRepeat(s: String): Unit = updateImpl(s, updateTheta = false)

  private def updateImpl(s: String, updateTheta: Boolean): Unit = {
    count += 1
    if (updateTheta && theta != null) theta.update(s)
    length.update(s.length.toDouble)
    // Java String.split(" ") drops trailing empty tokens but keeps
    // leading/interior empties — replicate via -1 limit then trim trailing.
    tokenLength.update(StringState.spaceTokenCount(s).toDouble)
    if (charPos != null) charPos.update(s)
  }

  def merge(o: StringState): Unit = {
    count += o.count
    if (theta != null && o.theta != null) theta.union(o.theta.getResult)
    else if (theta == null) theta = o.theta
    length.merge(o.length)
    tokenLength.merge(o.tokenLength)
    if (charPos != null && o.charPos != null) charPos.merge(o.charPos)
    else if (charPos == null) charPos = o.charPos
  }

  def write(out: DataOutputStream): Unit = {
    out.writeLong(count)
    out.writeBoolean(theta != null)
    out.writeBoolean(charPos != null)
    length.write(out)
    tokenLength.write(out)
    if (theta != null) Ser.writeBytes(out, theta.getResult.toByteArrayCompressed)
    if (charPos != null) charPos.write(out)
  }
}

object StringState {
  /** Token count under Java `String.split(" ")` semantics — computed by
    * a character walk instead of materializing the split (the split
    * allocated one array + one substring per token PER TRACKED VALUE on
    * the update hot path; SpaceTokenCountSpec pins walk == split on
    * randomized inputs). split(" ") keeps leading/interior empty tokens
    * and drops trailing ones, so the count is (spaces before the last
    * non-space char) + 1, or 0 when the string is all spaces/empty.
    */
  def spaceTokenCount(s: String): Int = {
    var last = s.length - 1
    while (last >= 0 && s.charAt(last) == ' ') last -= 1
    if (last < 0) 0
    else {
      var k = 0
      var i = 0
      while (i < last) {
        if (s.charAt(i) == ' ') k += 1
        i += 1
      }
      k + 1
    }
  }

  def read(in: DataInputStream): StringState = {
    val count = in.readLong()
    val hasTheta = in.readBoolean()
    val hasCharPos = in.readBoolean()
    val s = new StringState(withTheta = false, withCharPos = false)
    s.count = count
    s.length.merge(Moments.read(in))
    s.tokenLength.merge(Moments.read(in))
    if (hasTheta) {
      val u = SetOperation.builder().buildUnion()
      u.union(CompactSketch.heapify(Memory.wrap(Ser.readBytes(in))))
      s.theta = u
    }
    if (hasCharPos) s.charPos = CharPosState.read(in)
    s
  }
}
