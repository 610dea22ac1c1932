package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of positions where two long arrays agree — the MinHash signature
  * agreement count. A real codegen expression (fused loop in whole-stage
  * codegen) replacing the interpreted `aggregate(zip_with(...))` HOF
  * composition, which dispatches a lambda per element.
  */
case class VecMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_match_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_match_count requires two array<bigint>, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over whitespace tokens of the lowercased text, in ONE
  * pass: tokenize, xxhash64 each token (Spark's seed 42 — identical hashes
  * to `xxhash64(token)`), accumulate the per-bit +-1 majority vote, pack.
  *
  * Replaces the 64-HOF-aggregate composition that re-walked the token-hash
  * array once per bit (64 interpreted passes per document).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip \s whitespace (space, \t, \n, \x0B, \f, \r — the regex class
      // the previous split("\\s+") used; ASCII bytes, multi-byte UTF-8
      // chars are never in this set)
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-band bucket hashes of a MinHash signature: band b's bucket is an
  * xxhash64 chain over its `len(sig)/bands` signature slice. One scan of
  * the signature produces all band buckets (the previous composition
  * sliced + stringified + re-hashed per band: 16 array copies per row).
  */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(bands >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"band_hashes requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong // band index seeds the chain: same slice in a
      var i = b * rows // different band never collides structurally
      val end = i + rows
      while (i < end) {
        h = XXH64.hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-band sign-bit LSH buckets of an embedding under fixed hyperplanes:
  * band b's bucket packs the sign bits of its `bitsPerBand` hyperplane
  * projections. ALL bands*bitsPerBand projections are computed in one scan
  * of the embedding (the expression-composed version re-scanned the array
  * once per plane).
  */
case class HyperplaneBands(
    child: Expression,
    planes: Array[Array[Double]],
    bitsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  require(planes.nonEmpty && planes.length % bitsPerBand == 0)
  private val bands = planes.length / bitsPerBand

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires array<float|double>, got $t")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val out = new Array[Any](bands)
    var band = 0
    var p = 0
    while (band < bands) {
      var bucket = 0L
      var bit = 0
      while (bit < bitsPerBand) {
        val plane = planes(p)
        val n = math.min(d, plane.length)
        var acc = 0.0
        var i = 0
        if (isFloat) while (i < n) { acc += v.getFloat(i) * plane(i); i += 1 }
        else while (i < n) { acc += v.getDouble(i) * plane(i); i += 1 }
        if (acc > 0) bucket |= (1L << bit)
        bit += 1
        p += 1
      }
      out(band) = bucket
      band += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Top-n centroid ids for an embedding by cosine similarity, computed in a
  * single pass over a driver-side centroid literal — zero shuffle, zero
  * join. Ordering: cosine desc, centroid id asc (ties); zero-norm rows get
  * all-zero scores and fall back to the lowest ids, matching the previous
  * window-based argmax semantics.
  *
  * Replaces the crossJoin(corpus x centroids) + row_number window that
  * shuffled corpus x nCentroids rows per assignment pass.
  */
private[functions] object TopCentroidsEval {
  def norms(centroids: Array[Array[Double]]): Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  def eval(input: Any, centroids: Array[Array[Double]],
      centroidNorms: Array[Double], isFloat: Boolean, n: Int): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val plane = centroids(c)
      val nd = math.min(d, plane.length)
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < nd) { acc += v.getFloat(i) * plane(i); i += 1 }
      else while (i < nd) { acc += v.getDouble(i) * plane(i); i += 1 }
      // item norm is a positive constant across candidates — dropping it
      // preserves the ranking; zero norms score 0 like the cosine() guard
      scores(c) = if (centroidNorms(c) > 0) acc / centroidNorms(c) else 0.0
      c += 1
    }
    val picked = new Array[Any](math.min(n, k))
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < picked.length) {
      var best = -1
      var i = 0
      while (i < k) {
        if (!used(i) && (best < 0 || scores(i) > scores(best))) best = i
        i += 1
      }
      used(best) = true
      picked(slot) = best
      slot += 1
    }
    new GenericArrayData(picked)
  }
}

case class TopCentroids(
    child: Expression,
    centroids: Array[Array[Double]],
    n: Int)
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty && n >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_centroids requires array<float|double>, got $t")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centroidNorms: Array[Double] =
    TopCentroidsEval.norms(centroids)

  override def nullSafeEval(input: Any): Any =
    TopCentroidsEval.eval(input, centroids, centroidNorms, isFloat, n)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TopCentroids]] with the centroid table carried as a Spark BROADCAST
  * handle instead of an embedded array: the serialized expression is a
  * few bytes regardless of centroid count, so large codebooks (10^4+
  * centroids x hundreds of dims) ship to each executor once via torrent
  * instead of riding inside every serialized task/plan.
  */
case class TopCentroidsBroadcast(
    child: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroids_bcast"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_centroids_bcast requires array<float|double>, got $t")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centroids: Array[Array[Double]] = bcast.value

  @transient private lazy val centroidNorms: Array[Double] =
    TopCentroidsEval.norms(centroids)

  override def nullSafeEval(input: Any): Any =
    TopCentroidsEval.eval(input, centroids, centroidNorms, isFloat, n)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Lazily generates all ordered pairs (a, b), a < b, from an array of ids —
  * the in-bucket candidate-pair step of LSH dedup. A Catalyst `Generator`
  * (like explode): pairs stream out of the iterator, so a bucket of n ids
  * yields n*(n-1)/2 rows without materializing them as one array value.
  */
case class PairGenerator(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {

  override def elementSchema: StructType = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    StructType(Seq(
      StructField("id_a", et, nullable = false),
      StructField("id_b", et, nullable = false)))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pair_generator requires array<int|bigint>, got $t")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val isLong = child.dataType.asInstanceOf[ArrayType].elementType == LongType
    val ids: Array[Long] = {
      val a = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = if (isLong) arr.getLong(i) else arr.getInt(i).toLong
        i += 1
      }
      java.util.Arrays.sort(a)
      a
    }
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        val row =
          if (isLong) org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j))
          else org.apache.spark.sql.catalyst.InternalRow(ids(i).toInt, ids(j).toInt)
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Polynomial rolling hash (base 31, mod 1e9+7) over whitespace-normalized
  * lowercased text in ONE pass — replaces the regexp_replace + per-char
  * split + interpreted HOF aggregate composition (which materialized a
  * char-array per row and dispatched a lambda per character).
  *
  * Semantics (bit-for-bit with the composition it replaces): runs of \s
  * whitespace collapse to one space, text is lowercased, each character's
  * codepoint folds in as h = (h*31 + cp) mod 1e9+7.
  */
/** Shannon entropy (nats) of the codepoint distribution of a string in
  * ONE pass: count codepoints, then sum -(p ln p) over codepoints in
  * ASCENDING order — the fixed summation order makes the float result
  * deterministic across JVMs and reproducible by a SQL oracle that
  * aggregates the same terms. The classic cheap gibberish screen: binary
  * junk and key-mash text score far from natural language's ~3 nats.
  * Empty/null-free strings score 0.0. Row-local, zero shuffle.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[Int, Long]()
    var i = 0
    var n = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
    }
    if (n == 0L) 0.0
    else {
      var h = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        h -= p * math.log(p)
      }
      h
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class RollingHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Mod = 1000000007L

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash64 requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    var h = 0L
    var i = 0
    val n = text.length
    var pendingSpace = false
    while (i < n) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
          cp == '\f' || cp == '\r') {
        pendingSpace = true
      } else {
        if (pendingSpace) { h = (h * 31L + 32L) % Mod; pendingSpace = false }
        h = (h * 31L + cp) % Mod
      }
      if (i >= n && pendingSpace) h = (h * 31L + 32L) % Mod
    }
    h
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Full MinHash signature of a text in ONE row-local pass: word k-shingle
  * -> xxhash64 (Spark seed 42) -> all Carter-Wegman rehashes -> running
  * elementwise min. Identical arithmetic to
  * explode(word_shingles) -> pmod(xxhash64, p) -> carter_wegman_hashes ->
  * groupBy(id).agg(vec_min), but the signature of a document depends only
  * on that document, so the explode + hash-aggregate (and its shuffle) were
  * pure overhead — this makes the signature stage map-only.
  *
  * Shingle semantics match [[WordShingles]]: maximal non-whitespace runs of
  * `lower(text)`, k consecutive tokens joined by one space; fewer than k
  * tokens yields the whole text as one shingle (duplicates are irrelevant
  * under min).
  */
case class MinHashSig(child: Expression, k: Int, params: Array[(Long, Long)])
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle size must be >= 1")

  private val Mod = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val tokens = Shingling.tokenize(text)
    val sig = new Array[Long](params.length)
    java.util.Arrays.fill(sig, Long.MaxValue)
    // shared shingle enumeration ([[Shingling]]) keeps signatures
    // byte-identical to WordShingles' sets by construction; distinct-only
    // also skips re-hashing repeated shingles (min is duplicate-blind)
    Shingling.foreachDistinctShingle(tokens, k) { shingle =>
      val u = UTF8String.fromString(shingle)
      val raw = XXH64.hashUnsafeBytes(u.getBytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, u.numBytes, 42L)
      val h = ((raw % Mod) + Mod) % Mod // pmod: non-negative base hash
      var j = 0
      while (j < params.length) {
        val v = (params(j)._1 * h + params(j)._2) % Mod
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All Carter-Wegman rehashes of a base hash in one pass:
  * out[i] = (a_i * h + b_i) mod p. Pairs with [[VecMinAgg]] to form MinHash
  * signatures as ONE aggregate instead of numHashes separate min-aggregate
  * columns — same arithmetic, same shuffle bytes, but the generated plan
  * compiles one function instead of 64 (whole-stage codegen compile time
  * was the dominant cold-start cost of the LSH pipeline).
  */
case class CarterWegmanHashes(child: Expression, params: Array[(Long, Long)])
    extends UnaryExpression with CodegenFallback {

  private val Mod = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "carter_wegman_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires bigint, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val out = new Array[Long](params.length)
    var i = 0
    while (i < params.length) {
      out(i) = (params(i)._1 * h + params(i)._2) % Mod
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Product-quantization asymmetric distance (ADC) inner product: the
  * codebooks ride a broadcast handle (m sub-codebooks of ksub rows x dsub
  * dims each); `left` is the full d = m x dsub query vector, `right` the
  * item's m PQ codes. Result = sum_j dot(query[j*dsub ..+dsub],
  * codebook_j[code_j]) — the dot product of the query with the item's
  * RECONSTRUCTION, computed without ever materializing the reconstruction
  * (one fused loop over d, no allocation per pair). On an L2-normalized
  * corpus this approximates cosine, so candidate ranking by ADC matches
  * the exact ranking up to quantization error.
  */
case class PqAdcBroadcast(
    left: Expression,
    right: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_bcast"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_bcast requires (array<float|double>, array<int>), " +
          s"got ${left.dataType} / ${right.dataType}")
    }

  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val codebooks: Array[Array[Array[Double]]] =
    bcast.value

  override def nullSafeEval(q: Any, c: Any): Any = {
    val query = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), codebooks.length)
    var acc = 0.0
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val code = codes.getInt(j)
      if (code >= 0 && code < cb.length) {
        val row = cb(code)
        val dsub = row.length
        var i = 0
        if (isFloat)
          while (i < dsub) { acc += query.getFloat(off + i) * row(i); i += 1 }
        else
          while (i < dsub) { acc += query.getDouble(off + i) * row(i); i += 1 }
        off += dsub
      } else {
        off += (if (cb.nonEmpty) cb(0).length else 0)
      }
      j += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Product-quantization encoder: euclidean-argmin code per subspace, all
  * `m` subspaces in ONE pass over the vector (no per-subspace slice
  * allocation). `bcast` carries codebooks(j)(code) = dsub-dim centroid;
  * the result is the item's array<int> of m codes. Also serves Lloyd
  * training when called with a single sub-codebook over a sliced column.
  */
case class PqEncodeBroadcast(
    child: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_bcast"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_bcast requires array<float|double>, got $t")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val codebooks: Array[Array[Array[Double]]] =
    bcast.value

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val m = codebooks.length
    val out = new Array[Int](m)
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = if (cb.nonEmpty) cb(0).length else 0
      var best = 0
      var bestDist = Double.MaxValue
      var code = 0
      while (code < cb.length) {
        val row = cb(code)
        var acc = 0.0
        var i = 0
        while (i < dsub && off + i < d) {
          val x = if (isFloat) v.getFloat(off + i).toDouble
                  else v.getDouble(off + i)
          val diff = x - row(i)
          acc += diff * diff
          i += 1
        }
        // strict < keeps the LOWEST code on exact ties — deterministic
        if (acc < bestDist) { bestDist = acc; best = code }
        code += 1
      }
      out(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Hashing-trick linear text score — the scoring core of a
  * fastText-style quality classifier, one row-local pass: tokens
  * (lowercased, whitespace-split) hash by the q95 rolling 31-hash into
  * one of `nBuckets` weight slots, and the document scores the MEAN
  * slot weight (0.0 for token-less text; squash outside). Weights come
  * from `bcast` (a trained table of length nBuckets) or, when absent,
  * from the deterministic formula
  * w(b) = ((b * 2654435761) % 1000000007) / 1000000007.0 - 0.5 —
  * engine-reproducible, so the untrained form is SQL-oracle-able end
  * to end.
  */
case class HashedTokenScore(
    child: Expression,
    nBuckets: Int,
    bcast: Option[org.apache.spark.broadcast.Broadcast[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")

  private val Mod = 1000000007L

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_token_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_token_score requires string, got $t")
  }

  @transient private lazy val table: Array[Double] = bcast.map(_.value).orNull

  private def weightOf(bucket: Int): Double =
    if (table != null) table(bucket)
    else (bucket.toLong * 2654435761L % Mod).toDouble / Mod.toDouble - 0.5

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    var sum = 0.0
    var cnt = 0L
    var h = 0L
    var inTok = false
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
        cp == '\f' || cp == '\r'
      if (isWs) {
        if (inTok) {
          sum += weightOf((h % nBuckets).toInt); cnt += 1
          h = 0L; inTok = false
        }
      } else {
        h = (h * 31L + cp) % Mod
        inTok = true
      }
    }
    if (inTok) { sum += weightOf((h % nBuckets).toInt); cnt += 1 }
    if (cnt == 0L) 0.0 else sum / cnt
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
