package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, bit_count, broadcast, col,
  collect_list, count, count_distinct, explode, lit, posexplode,
  shiftrightunsigned, size, transform, typedLit, xxhash64}

/** REAL media decode for self-contained formats that need no external
  * codec libraries: PPM (P6) raster images and WAV (RIFF PCM16) audio —
  * byte-level header parsing and sample/pixel math in pure JVM code.
  *
  * This upgrades the multimodal story from [[Multimodal]]'s documented
  * stub: formats with in-band structure (PPM, WAV, BMP-class containers)
  * decode for real here; codec-dependent formats (JPEG/MP4/...) keep the
  * [[Multimodal.ImageCodec]] boundary to plug native decoders into.
  *
  * Scale shape: decode is row-local inside `mapPartitions` (no shuffle,
  * no per-row UDF dispatch — one iterator pass per partition); blobs
  * never leave the executor that read them.
  */
object Media {

  // ---------- PPM (P6): "P6\n<w> <h>\n<maxval>\n" + raw RGB ----------

  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte]) {
    def channels: Int = 3
  }

  def encodePpm(img: PpmImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** P6 header parse shared by the full decode and the header-only
    * metadata walk: (width, height, position of the first pixel byte).
    * Touches header bytes only.
    */
  private def parsePpmHeader(blob: Array[Byte]): (Int, Int, Int) = {
    require(blob.length >= 2 && blob(0) == 'P' && blob(1) == '6',
      "not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      var inComment = false
      while (pos < blob.length &&
        (inComment || Character.isWhitespace(blob(pos)) || blob(pos) == '#')) {
        if (blob(pos) == '#') inComment = true
        if (blob(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      var digits = 0
      while (pos < blob.length && !Character.isWhitespace(blob(pos))) {
        val b = blob(pos)
        require(b >= '0' && b <= '9', s"malformed header token byte $b")
        v = v * 10 + (b - '0'); pos += 1; digits += 1
        require(digits <= 9, "header value out of range")
      }
      require(digits > 0, "missing header value")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
    require(maxVal == 255, s"unsupported maxval $maxVal")
    require(w > 0 && h > 0, s"invalid dimensions ${w}x$h")
    pos += 1 // single whitespace after maxval per spec
    (w, h, pos)
  }

  /** Parse a P6 PPM: magic, whitespace/comment-tolerant header tokens,
    * then width*height*3 raw bytes.
    */
  def decodePpm(blob: Array[Byte]): PpmImage = {
    val (w, h, pos) = parsePpmHeader(blob)
    // size math in Long — Int w*h*3 can overflow to a negative that would
    // defeat the truncation guard below
    val n = w.toLong * h * 3
    require(n <= blob.length - pos, "truncated pixel data")
    PpmImage(w, h,
      java.util.Arrays.copyOfRange(blob, pos, pos + n.toInt))
  }

  /** Nearest-neighbor resize — real pixel resampling, no libraries. */
  def resizeNearest(img: PpmImage, newW: Int, newH: Int): PpmImage = {
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * img.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * img.width / newW
        val src = (sy * img.width + sx) * 3
        val dst = (y * newW + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(newW, newH, out)
  }

  /** Per-pixel gray value scaled by 3 (r+g+b, range 0..765) — integer,
    * so every downstream comparison is exact and SQL-replicable (no
    * luma float weights, no /3 rounding choice to match).
    */
  def gray3(img: PpmImage): Array[Int] = {
    val n = img.width * img.height
    val out = new Array[Int](n)
    var p = 0
    while (p < n) {
      out(p) = (img.pixels(3 * p) & 0xff) + (img.pixels(3 * p + 1) & 0xff) +
        (img.pixels(3 * p + 2) & 0xff)
      p += 1
    }
    out
  }

  /** 64-bit average hash: nearest-neighbor resize to 8x8, bit p (=y*8+x,
    * LSB first) set iff pixel p's gray is STRICTLY above the 8x8 mean
    * (exact integer form: 64*gray3 > sum of all gray3). Robust to
    * uniform brightness/contrast changes; identical images hash
    * identically by construction.
    */
  def aHash64(img: PpmImage): Long = {
    val g = gray3(resizeNearest(img, 8, 8))
    var sum = 0L
    var p = 0
    while (p < 64) { sum += g(p); p += 1 }
    var hash = 0L
    p = 0
    while (p < 64) {
      if (64L * g(p) > sum) hash |= 1L << p
      p += 1
    }
    hash
  }

  /** 64-bit difference hash: resize to 9x8, bit p (=y*8+x) set iff
    * gray(x+1,y) > gray(x,y) — horizontal gradient signs, the classic
    * dHash. More robust than aHash to global level shifts.
    */
  def dHash64(img: PpmImage): Long = {
    val r = resizeNearest(img, 9, 8)
    val g = gray3(r)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit perceptual DCT hash (pHash): nearest-neighbor resize to
    * 32x32, gray, orthonormal 2D DCT-II (separable, two 8x32 passes —
    * only the low 8x8 block is ever computed), bit p (=v*8+u, LSB
    * first) set iff coefficient (u,v) is strictly above the median
    * (32nd smallest) of the 63 non-DC coefficients. Exact invariants,
    * spec-pinned: a global brightness shift moves only the DC
    * coefficient (AC terms of a constant are 0), so Hamming <= 1; a
    * pure contrast scale multiplies every coefficient AND the median
    * by the same positive factor, so the hash is identical. Survives
    * recompression-style perturbation far better than aHash/dHash
    * (bits live in the frequency domain, not single pixels).
    */
  def pHash64(img: PpmImage): Long = {
    val g = gray3(resizeNearest(img, 32, 32))
    val cosTab = Array.tabulate(8, 32) { (u, x) =>
      val a = if (u == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)
      a * math.cos((2 * x + 1) * u * math.Pi / 64)
    }
    val tmp = Array.ofDim[Double](32, 8)
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += g(y * 32 + x) * cosTab(u)(x); x += 1 }
        tmp(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += tmp(yy)(u) * cosTab(v)(yy); yy += 1 }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val rest = new Array[Double](63)
    System.arraycopy(coef, 1, rest, 0, 63)
    java.util.Arrays.sort(rest)
    val m = rest(31)
    var hash = 0L
    var p = 0
    while (p < 64) {
      if (coef(p) > m) hash |= 1L << p
      p += 1
    }
    hash
  }

  final case class ImageHashRecord(id: Long, ahash: Long, dhash: Long)

  final case class PHashRecord(id: Long, phash: Long)

  /** The shared (id, blob) scaffold of every per-row media op: cast
    * the id long, keep the raw bytes. Centralized so the schema and
    * cast live in ONE place for the strict and lenient twins alike.
    */
  private def blobPairs(
      df: DataFrame, idCol: String, blobCol: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
  }

  /** DCT perceptual hashes of a binary image column (PPM/PNG/JPEG,
    * sniffed per row via [[decodeImage]]) — same codec-boundary shape
    * as [[imageHashes]]: partition-local decode, zero shuffle, 8 bytes
    * of hash state per row.
    */
  def imagePHashes(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    blobPairs(df, idCol, blobCol)
      .mapPartitions(_.map { case (id, blob) =>
        PHashRecord(id, pHash64(decodeImage(blob)))
      })
      .toDF()
  }

  /** Perceptual hashes (aHash + dHash) of a binary image column
    * (PPM/PNG/JPEG, sniffed per row via [[decodeImage]]) —
    * partition-local decode at the codec boundary, zero shuffle; the
    * whole image column reduces to 16 bytes/row of hash state.
    */
  def imageHashes(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    blobPairs(df, idCol, blobCol)
      .mapPartitions(_.map { case (id, blob) =>
        val img = decodeImage(blob)
        ImageHashRecord(id, aHash64(img), dHash64(img))
      })
      .toDF()
  }

  /** Image near-duplicate pairs by perceptual-hash Hamming distance.
    * Recall is EXACT at every radius, via the routed engine
    * ([[bandedHammingPairsReleasable]]): `maxHamming <= 15` is served
    * lazily by multi-index hashing over 4 x 16-bit substrings
    * (pigeonhole probe expansion — scale shape is
    * [[Dedup.minHashLshPairs]]: only (id, hash/bucket) rows shuffle,
    * oversized exact buckets drop at `maxBucketSize`, pairs dedupe
    * across bands before the exact Hamming verify); `maxHamming >= 16`
    * routes to a measured-count bounded broadcast scan that
    * materializes the decode EAGERLY at construction and REFUSES past
    * `bruteThreshold` (see the engine's scaladoc). Returns (id_a,
    * id_b, hamming) with id_a < id_b.
    */
  def imageHashNearDups(
      df: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 3, useDHash: Boolean = true,
      maxBucketSize: Int = 10000,
      bruteThreshold: Long = 100000L): DataFrame =
    imageHashNearDupsReleasable(df, idCol, blobCol, maxHamming, useDHash,
      maxBucketSize, bruteThreshold)._1

  /** [[imageHashNearDups]] plus a release() thunk for the cached hash
    * intermediate (same contract as
    * [[Dedup.minHashLshPairsReleasable]]).
    */
  def imageHashNearDupsReleasable(
      df: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 3, useDHash: Boolean = true,
      maxBucketSize: Int = 10000,
      bruteThreshold: Long = 100000L): (DataFrame, () => Unit) = {
    val hashCol = if (useDHash) "dhash" else "ahash"
    bandedHammingPairsReleasable(
      imageHashes(df, idCol, blobCol)
        .select(col("id"), col(hashCol).as("h")),
      maxHamming, maxBucketSize, bruteThreshold)
  }

  /** All 16-bit XOR deltas with popcount <= rPrime — the probe-expansion
    * set of the multi-index-hashing regime (17 at rPrime=1, 137 at 2,
    * 697 at 3). A plan-time literal array: probe expansion multiplies
    * BUCKET KEYS, never corpus rows at rest.
    */
  private[ops] def mihProbeDeltas(rPrime: Int): Array[Long] =
    (0 until 65536).collect {
      case v if java.lang.Integer.bitCount(v) <= rPrime => v.toLong
    }.toArray

  /** Hamming-distance pair join over an (id, 64-bit hash) frame — the
    * shared engine behind [[imageHashNearDupsReleasable]],
    * [[pHashNearDupsReleasable]] and
    * [[Dedup.simHashNearDupsReleasable]]. Regimes, routed on the radius
    * alone (construction stays lazy for every radius <= 15):
    *
    *  - `maxHamming <= 15`: MULTI-INDEX HASHING (Norouzi et al., "Fast
    *    Search in Hamming Space with Multi-Index Hashing", CVPR'12)
    *    over 4 disjoint 16-bit substrings. Pigeonhole: if
    *    Hamming(a, b) <= r then some substring differs by at most
    *    r' = floor(r/4) (4(r'+1) > r), so EXACT recall comes from an
    *    equi-join of probe-expanded buckets against exact buckets —
    *    each row probes, per band, every bucket within Hamming r' of
    *    its own substring (XOR with a literal delta array: 1 delta at
    *    r' = 0, 17 at 1, 137 at 2, 697 at 3). Probe expansion
    *    multiplies join KEYS, not stored rows; the 16-bit bucket
    *    domain (65k values x 4 bands) stays sparse at corpus scale.
    *    At r' = 0 this degenerates to the classic 4 x 16 banding and
    *    pairs generate in-bucket via the salted
    *    [[Dedup.cappedBucketPairs]]; at r' >= 1 candidates come from
    *    the probe-vs-index equi-join (sort-merge, AQE-skew-splittable —
    *    unlike a generator row, a hot join key CAN be split).
    *    Oversized (flat-content) EXACT buckets drop at the documented
    *    cap on the index side; pairs dedupe across bands/probes before
    *    the exact bit_count verify.
    *  - `maxHamming >= 16`: the probe set per band exceeds 2.5k
    *    buckets (r' >= 4) and nearly half the key domain at r' -> 8,
    *    so MIH degrades toward all-pairs; the radius routes to an
    *    EXACT bounded broadcast scan instead: the (id, hash) pairs
    *    (16 bytes/row) collect and broadcast, every partition streams
    *    its rows against the array — exact recall by construction,
    *    O(n^2) xor+popcount, guarded by a MEASURED count at
    *    `bruteThreshold` (default 100k rows = 1.6 MB broadcast,
    *    ~1e10 two-instruction compares — seconds on a 32-core stage).
    *    Past the threshold the op REFUSES with honest alternatives
    *    rather than silently degrading. NOTE: this branch (and only
    *    this branch) runs the count — and therefore the upstream
    *    decode/hash stages — EAGERLY at construction time; on refusal
    *    the persisted input is released before the error propagates.
    *
    * The input is persisted here (the pair join re-reads it for the
    * verify; for decoded-image hashes that materializes the expensive
    * decode stage once). At radius >= 16 release() also drops the
    * executor copies of the broadcast scan array.
    */
  private[graft] def bandedHammingPairsReleasable(
      hashes0: DataFrame, maxHamming: Int, maxBucketSize: Int,
      bruteThreshold: Long = 100000L): (DataFrame, () => Unit) = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val hashes = hashes0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val release = () => { hashes.unpersist(blocking = false); () }
    if (maxHamming <= 15) {
      val rPrime = maxHamming / 4
      val index = hashes.select(col("id"),
        posexplode(bandCols(col("h"))).as(Seq("band", "bucket")))
      val cand =
        if (rPrime == 0) {
          Dedup.cappedBucketPairs(index, Seq("band", "bucket"), "id",
            maxBucketSize)
        } else {
          // the flat-content cap, applied to EXACT buckets before the
          // probe join (a probe into a dropped bucket finds nothing)
          val oversized = index.groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("__n"))
            .filter(col("__n") > maxBucketSize)
            .select(col("band"), col("bucket"), lit(1).as("__drop"))
          val kept = index
            .join(broadcast(oversized), Seq("band", "bucket"), "left")
            .filter(col("__drop").isNull).drop("__drop")
          // explode the LITERAL delta array first, XOR after: the
          // transform-then-explode shape materialized a fresh
          // 697-element array per input row per band (the generator's
          // child re-evaluates per row); exploding the literal emits
          // rows off the one shared array and the XOR is a per-output
          // projection — no per-row array allocation, much smaller
          // generated code on the hottest mih loop
          val deltas = typedLit(mihProbeDeltas(rPrime))
          val probes = kept
            .select(col("id").as("id_a"), col("band"), col("bucket"),
              explode(deltas).as("__d"))
            .select(col("id_a"), col("band"),
              col("bucket").bitwiseXOR(col("__d")).as("bucket"))
          // Build-side determinism (r18, the bench's one bimodal row):
          // Catalyst prices the probe side at its Generate CHILD's size —
          // it cannot see the literal-delta multiplier (697x at radius
          // 12) — so the static planner picks the PROBE stream as the
          // broadcast build side. That is a driver-side single-threaded
          // hash build over millions of exploded rows plus hundreds of
          // MB of per-pass garbage; AQE flips the build to the exact-
          // bucket side only when its re-planning beats the broadcast
          // stage's materialization, and losing that race is exactly the
          // row's 1.4 s vs 12 s session lottery. Pin the build side
          // deliberately: the exact-bucket side broadcasts under a
          // counted bound (the count materializes the caller-persisted
          // fingerprints the pipeline scans right after — one cached
          // pass, same eager pattern as the capped-bucket probe), and
          // above the bound it becomes the per-partition build of a
          // shuffled hash join, where the flat-bucket cap keeps every
          // partition's build bounded at any corpus size.
          val nHashes = hashes.count()
          val bcastMax = hashes.sparkSession.conf
            .get("spark.graft.mih.broadcastMaxHashes", "1000000").toLong
          val keptB = kept.select(col("band"), col("bucket"),
            col("id").as("id_b"))
          val attach =
            if (nHashes <= bcastMax) broadcast(keptB)
            else keptB.hint("shuffle_hash")
          probes
            .join(attach, Seq("band", "bucket"))
            .filter(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"))
        }
      val pairs = cand
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__nb"))
        .drop("__nb")
      val result = pairs
        .join(hashes.select(col("id").as("id_a"), col("h").as("h_a")),
          Seq("id_a"))
        .join(hashes.select(col("id").as("id_b"), col("h").as("h_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int")
            .as("hamming"))
        .filter(col("hamming") <= maxHamming)
      (result, release)
    } else {
      // EAGER: the measured-count guard materializes the input here;
      // on refusal, release the persisted frame before propagating.
      val n = try hashes.count() catch {
        case t: Throwable => release(); throw t
      }
      if (n > bruteThreshold) {
        release()
        throw new IllegalArgumentException(
          s"very-wide Hamming join (maxHamming=$maxHamming >= 16) needs " +
            s"the exact bounded scan, but the input has $n rows > " +
            s"bruteThreshold=$bruteThreshold. Use maxHamming <= 15 " +
            "(exact multi-index-hashing recall), pre-normalize so " +
            "duplicates land closer, shard the corpus, or raise " +
            "bruteThreshold knowingly (cost grows with n^2).")
      }
      val spark = hashes.sparkSession
      import spark.implicits._
      val all = hashes.select(col("id").cast("long"), col("h"))
        .as[(Long, Long)].collect()
      val bc = spark.sparkContext.broadcast(all)
      val releaseAll = () => {
        hashes.unpersist(blocking = false)
        // unpersist (not destroy): executor copies drop now; a
        // re-materialization after release re-broadcasts from the
        // driver copy instead of failing
        bc.unpersist(blocking = false)
        ()
      }
      val result = hashes.select(col("id").cast("long"), col("h"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          val arr = bc.value
          it.flatMap { case (id, h) =>
            arr.iterator.collect {
              case (idB, hB)
                  if idB > id &&
                    java.lang.Long.bitCount(h ^ hB) <= maxHamming =>
                (id, idB, java.lang.Long.bitCount(h ^ hB))
            }
          }
        }
        .toDF("id_a", "id_b", "hamming")
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
      (result, releaseAll)
    }
  }

  /** Near-duplicate image pairs by DCT perceptual-hash (pHash) Hamming
    * distance — the recompression-robust twin of [[imageHashNearDups]]
    * with the identical routed engine. The JPEG-recompression regime
    * (measured pHash drift 8-10 of 64 at quality 0.95) needs
    * `maxHamming` ~ 10-12, served at ANY corpus size by the exact
    * multi-index-hashing equi-join (probe expansion of 137 buckets per
    * band at radius 8-11 — keys multiply, rows don't); only
    * `maxHamming >= 16` falls back to the measured bounded scan with
    * its `bruteThreshold` refusal. Output: (id_a, id_b, hamming),
    * id_a < id_b.
    */
  def pHashNearDups(
      df: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      bruteThreshold: Long = 100000L): DataFrame =
    pHashNearDupsReleasable(df, idCol, blobCol, maxHamming,
      maxBucketSize, bruteThreshold)._1

  /** [[pHashNearDups]] plus a release() thunk for the cached hash
    * intermediate.
    */
  def pHashNearDupsReleasable(
      df: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      bruteThreshold: Long = 100000L): (DataFrame, () => Unit) =
    bandedHammingPairsReleasable(
      imagePHashes(df, idCol, blobCol)
        .select(col("id"), col("phash").as("h")),
      maxHamming, maxBucketSize, bruteThreshold)

  private def bandCols(h: Column): Column =
    array((0 until 4).map(b =>
      shiftrightunsigned(h, 16 * b).bitwiseAND(lit(0xffffL))): _*)

  /** Persist a reference corpus's perceptual-hash LSH buckets as a
    * CorpusStore table — incremental IMAGE dedup, the multimodal twin
    * of [[Dedup.writeMinHashReference]]: decode + hash + band-bucket
    * the historical images ONCE; each new batch then probes with
    * [[imageHashNearDupsStored]] and only batch-derived rows shuffle.
    * One table suffices (`<table>_buckets`: bb, id, h) because the
    * 8-byte hash rides each of its 4 band rows — no second fetch join.
    * Oversized (flat-image) buckets drop at write time.
    */
  /** (id, h) -> (id, h, bb) band-bucket rows shared by the aHash/dHash
    * and pHash store writers and probes.
    */
  private[ops] def bandedStoreRows(hashes: DataFrame): DataFrame =
    hashes
      .select(col("id"), col("h"),
        posexplode(bandCols(col("h"))).as(Seq("band", "bucket")))
      .select(col("id"), col("h"),
        xxhash64(col("band"), col("bucket")).as("bb"))

  /** Probe-side twin of [[bandedStoreRows]] with multi-index-hashing
    * expansion: at `maxHamming <= 3` each row probes its 4 exact band
    * buckets (identical to the store rows); at 4..15 each band
    * additionally probes every bucket within floor(maxHamming/4) —
    * the pigeonhole guarantee of [[bandedHammingPairsReleasable]]
    * against an UNCHANGED exact-bucket store (expansion multiplies
    * probe keys only; stored history never rewrites for a wider
    * read-time radius).
    */
  private[ops] def bandedProbeRows(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      "multi-index-hashing probe recall is exact only for " +
        s"maxHamming <= 15, got $maxHamming")
    val rPrime = maxHamming / 4
    val base = hashes.select(col("id"), col("h"),
      posexplode(bandCols(col("h"))).as(Seq("band", "bucket")))
    val probed =
      if (rPrime == 0) base
      else base
        // explode the LITERAL delta array, XOR after — the
        // transform-then-explode shape allocated a fresh delta-sized
        // array per probe row (see bandedHammingPairsReleasable)
        .select(col("id"), col("h"), col("band"), col("bucket"),
          explode(typedLit(mihProbeDeltas(rPrime))).as("__d"))
        .select(col("id"), col("h"), col("band"),
          col("bucket").bitwiseXOR(col("__d")).as("bucket"))
    probed.select(col("id"), col("h"),
      xxhash64(col("band"), col("bucket")).as("bb"))
  }

  /** Oversized-bucket drop + bucketed write shared by the hash stores. */
  private[ops] def writeHashReferenceRows(
      banded: DataFrame, table: String, numBuckets: Int,
      maxBucketSize: Int): Unit = {
    val oversized = banded.groupBy(col("bb"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("bb"), lit(1).as("__drop"))
    val kept = banded.join(broadcast(oversized), Seq("bb"), "left")
      .filter(col("__drop").isNull).drop("__drop")
    graft.io.CorpusStore.writeBucketed(kept, s"${table}_buckets",
      "bb", numBuckets, Seq("bb"))
  }

  def writeImageHashReference(
      reference: DataFrame, idCol: String, blobCol: String,
      table: String, useDHash: Boolean = true, numBuckets: Int = 16,
      maxBucketSize: Int = 10000): Unit = {
    val hashCol = if (useDHash) "dhash" else "ahash"
    writeHashReferenceRows(
      bandedStoreRows(imageHashes(reference, idCol, blobCol)
        .select(col("id"), col(hashCol).as("h"))),
      table, numBuckets, maxBucketSize)
  }

  /** The DCT-perceptual-hash twin of [[writeImageHashReference]]:
    * persist a reference corpus's pHash LSH buckets once; probe new
    * batches with [[pHashNearDupsStored]]. Same store layout
    * (`<table>_buckets`: bb, id, h), same oversized-bucket drop.
    */
  def writePHashReference(
      reference: DataFrame, idCol: String, blobCol: String,
      table: String, numBuckets: Int = 16,
      maxBucketSize: Int = 10000): Unit =
    writeHashReferenceRows(
      bandedStoreRows(imagePHashes(reference, idCol, blobCol)
        .select(col("id"), col("phash").as("h"))),
      table, numBuckets, maxBucketSize)

  /** GROW a pHash store with a new batch (screen first — ids are
    * assumed fresh); history never rewrites.
    */
  def appendPHashReference(
      docs: DataFrame, idCol: String, blobCol: String,
      table: String): Unit = {
    val n = graft.io.CorpusStore
      .storedNumBuckets(docs.sparkSession, s"${table}_buckets")
    graft.io.CorpusStore.appendBucketed(
      bandedStoreRows(imagePHashes(docs, idCol, blobCol)
        .select(col("id"), col("phash").as("h"))),
      s"${table}_buckets", "bb", n, Seq("bb"))
  }

  /** Near-duplicate (new image, stored image) pairs by banded pHash
    * Hamming distance against a [[writePHashReference]] store — the
    * recompression-robust stored screen; scale shape identical to
    * [[imageHashNearDupsStored]] (batch decodes row-locally, stored
    * side never re-decodes or re-exchanges). Radii 4..15 probe with
    * multi-index-hashing expansion against the UNCHANGED store — the
    * JPEG-recompression regime (maxHamming ~ 10-12) works read-time
    * without rewriting history. Output: new_id, ref_id, hamming.
    */
  def pHashNearDupsStored(
      docs: DataFrame, table: String, idCol: String, blobCol: String,
      maxHamming: Int = 3): DataFrame = {
    val probe = bandedProbeRows(imagePHashes(docs, idCol, blobCol)
      .select(col("id"), col("phash").as("h")), maxHamming)
      .select(col("id").as("new_id"), col("h").as("h_new"), col("bb"))
    val ref = graft.io.CorpusStore
      .readBucketed(docs.sparkSession, s"${table}_buckets")
    probe.join(ref, Seq("bb"))
      .select(col("new_id"), col("id").as("ref_id"),
        col("h_new"), col("h").as("h_ref"))
      .distinct()
      .select(col("new_id"), col("ref_id"),
        bit_count(col("h_new").bitwiseXOR(col("h_ref"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** GROW an image-hash store with a new batch (screen first — ids are
    * assumed fresh): decode + hash + band rows append to the bucket
    * table; history never rewrites.
    */
  def appendImageHashReference(
      docs: DataFrame, idCol: String, blobCol: String, table: String,
      useDHash: Boolean = true): Unit = {
    val n = graft.io.CorpusStore
      .storedNumBuckets(docs.sparkSession, s"${table}_buckets")
    val hashCol = if (useDHash) "dhash" else "ahash"
    graft.io.CorpusStore.appendBucketed(
      bandedStoreRows(imageHashes(docs, idCol, blobCol)
        .select(col("id"), col(hashCol).as("h"))),
      s"${table}_buckets", "bb", n, Seq("bb"))
  }

  /** Near-duplicate (new image, stored image) pairs by banded Hamming
    * distance against a [[writeImageHashReference]] store: the batch
    * decodes and hashes row-locally, its band rows broadcast-or-shuffle
    * into the bucketed stored scan (the store never re-decodes or
    * re-exchanges), candidate pairs dedupe across bands, and the exact
    * bit_count Hamming verify decides. Recall is exact for
    * `maxHamming` <= 15 by the multi-index-hashing pigeonhole
    * ([[bandedProbeRows]] — wider radii expand PROBE keys; the store
    * itself never rewrites). Pass the same `useDHash` as at write
    * time. Output: new_id, ref_id, hamming.
    */
  def imageHashNearDupsStored(
      docs: DataFrame, table: String, idCol: String, blobCol: String,
      maxHamming: Int = 3, useDHash: Boolean = true): DataFrame = {
    val hashCol = if (useDHash) "dhash" else "ahash"
    val probe = bandedProbeRows(imageHashes(docs, idCol, blobCol)
      .select(col("id"), col(hashCol).as("h")), maxHamming)
      .select(col("id").as("new_id"), col("h").as("h_new"), col("bb"))
    val ref = graft.io.CorpusStore
      .readBucketed(docs.sparkSession, s"${table}_buckets")
    probe.join(ref, Seq("bb"))
      .select(col("new_id"), col("id").as("ref_id"),
        col("h_new"), col("h").as("h_ref"))
      .distinct() // hash values are functions of the ids, so this
                  // dedupes multi-band collisions of the same pair
      .select(col("new_id"), col("ref_id"),
        bit_count(col("h_new").bitwiseXOR(col("h_ref"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ===== video: GVID container =====================================
  // A self-contained video format in the same spirit as the PPM / WAV
  // codecs: "GVID" magic, big-endian fps_milli (frames/sec x 1000) and
  // frame count, then length-prefixed PPM frames. Real byte-walking
  // decode with zero native dependencies; codec-dependent containers
  // (MP4/WebM) sit behind the same ImageCodec-style boundary as
  // JPEG/PNG stills.

  final case class GvidMeta(fpsMilli: Int, nFrames: Int)

  def encodeGvid(fpsMilli: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fpsMilli > 0, s"fpsMilli must be > 0, got $fpsMilli")
    val size = 12 + frames.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.put("GVID".getBytes("US-ASCII"))
    bb.putInt(fpsMilli)
    bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  def parseGvidMeta(blob: Array[Byte]): GvidMeta = {
    require(blob != null && blob.length >= 12, "truncated GVID header")
    val bb = java.nio.ByteBuffer.wrap(blob)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID blob")
    val fpsMilli = bb.getInt()
    val nFrames = bb.getInt()
    // a corrupt count must fail the PARSE, not allocate: a negative
    // count underflows the frame loop, a huge one promises more bytes
    // than exist (each frame costs at least its 4-byte length prefix)
    require(fpsMilli > 0, s"corrupt GVID fps_milli $fpsMilli")
    require(nFrames >= 0 && nFrames.toLong * 4 <= blob.length - 12,
      s"corrupt GVID frame count $nFrames for ${blob.length} bytes")
    GvidMeta(fpsMilli, nFrames)
  }

  /** Frames of a GVID blob in order, lazily: (frame index, PPM bytes).
    * Every frame length is validated against the bytes that remain —
    * truncation or a negative/oversized length raises
    * IllegalArgumentException at that frame instead of
    * BufferUnderflow/NegativeArraySize/OOM mid-allocation.
    */
  def gvidFrames(blob: Array[Byte]): Iterator[(Int, Array[Byte])] = {
    val meta = parseGvidMeta(blob)
    val bb = java.nio.ByteBuffer.wrap(blob)
    bb.position(12)
    (0 until meta.nFrames).iterator.map { i =>
      require(bb.remaining >= 4, s"truncated GVID at frame $i")
      val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining,
        s"corrupt GVID frame length $len at frame $i " +
          s"(${bb.remaining} bytes remain)")
      val frame = new Array[Byte](len)
      bb.get(frame)
      (i, frame)
    }
  }

  /** Deterministic synthetic video: frame f is the analytic PPM
    * [[synthesizePpm]](id * 31 + f), so every sampled pixel is
    * SQL-derivable from (id, f) alone.
    */
  def synthesizeGvid(id: Long, nFrames: Int,
      fpsMilli: Int = 4000): Array[Byte] =
    encodeGvid(fpsMilli,
      (0 until nFrames).map(f => synthesizePpm(id * 31L + f)))

  final case class VideoStatsRecord(id: Long, n_frames: Int,
      fps_milli: Int, duration_us: Long)

  /** Container-level stats per video blob — header walk only, frames
    * never decode. Partition-local, zero shuffle. Corrupt blobs DROP
    * (the python mirror's ValueError policy —
    * `multimodal.extract_video_features`): one bad container in a
    * large corpus must cost its row, never the job.
    */
  def videoStats(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try {
          val m = parseGvidMeta(blob)
          Iterator.single(VideoStatsRecord(id, m.nFrames, m.fpsMilli,
            m.nFrames.toLong * 1000000000L / m.fpsMilli))
        } catch {
          case _: IllegalArgumentException => Iterator.empty
        }
      })
      .toDF()
  }

  final case class VideoFrameRecord(id: Long, frame_idx: Int,
      width: Int, height: Int, mean_r: Double, mean_g: Double,
      mean_b: Double, frame: Array[Byte])

  /** Sample every `everyN`-th frame of a GVID column: one output row
    * per sampled frame with its dimensions, per-channel pixel means,
    * and the decoded frame as a standalone PPM blob (ready for
    * [[imageHashes]] / [[resizePpmImages]] / the image store).
    * Partition-local decode at the codec boundary — video bytes never
    * shuffle; only the (much smaller) sampled frames leave the row.
    * Corrupt videos DROP WHOLE (the python mirror's ValueError policy
    * — `multimodal.sample_video_frames`): a container or frame that
    * fails validation costs every frame of that video, never the job.
    */
  def videoFrameSample(
      df: DataFrame, idCol: String, blobCol: String,
      everyN: Int): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try {
          // materialize the whole video's sample before emitting any
          // row: drop-whole semantics (a mid-stream corrupt frame must
          // not leave a partial prefix in the output)
          gvidFrames(blob).collect {
            case (i, ppm) if i % everyN == 0 =>
              val img = decodePpm(ppm)
              val (mr, mg, mb) = meanRgb(img)
              VideoFrameRecord(id, i, img.width, img.height, mr, mg,
                mb, ppm)
          }.toVector
        } catch {
          case _: IllegalArgumentException => Vector.empty
        }
      })
      .toDF()
  }

  /** Video near-duplicate pairs by shared sampled-frame perceptual
    * hashes — the fourth modality of the dedup matrix (text MinHash,
    * image pHash/dHash, audio fingerprint blocks): two videos pair
    * when at least `minSharedFrames` of their sampled frames hash
    * identically (aHash — re-encoded copies and brightness variants
    * still collide). Frame hashes are DISTINCT per video row-locally,
    * so a still video (one frame repeated) counts once.
    *
    * Scale shape: decode + hash is ONE partition-local pass over the
    * container (video bytes never shuffle — 8-byte hash rows do);
    * candidate pairs generate only inside per-hash buckets with an
    * oversized-bucket cap (a black-frame hash shared by half the
    * corpus is dropped, like the LSH mega-bucket rule), never
    * all-pairs; the shared-frame count is the bucket-collision count,
    * no second fetch join. Corrupt containers drop whole.
    * Output: (id_a, id_b, n_shared), id_a < id_b.
    *
    * Caches the per-frame hash frame for the session (plan-keyed, so
    * repeated calls over the SAME input reuse one entry); long-lived
    * sessions running many distinct corpora should use
    * [[videoNearDupsReleasable]] and release() after materializing.
    */
  def videoNearDups(
      df: DataFrame, idCol: String, blobCol: String,
      everyN: Int = 1, minSharedFrames: Int = 2,
      maxBucketSize: Int = 10000): DataFrame =
    videoNearDupsReleasable(df, idCol, blobCol, everyN, minSharedFrames,
      maxBucketSize)._1

  /** [[videoNearDups]] plus a release() thunk for the cached per-frame
    * hash intermediate (the [[audioNearDupsReleasable]] contract). The
    * decode pass has two consumers — the bucket-size probe inside
    * [[Dedup.cappedBucketPairs]] and the pair join — so the 8-byte
    * hash rows persist and the container decode runs exactly once.
    */
  def videoNearDupsReleasable(
      df: DataFrame, idCol: String, blobCol: String,
      everyN: Int = 1, minSharedFrames: Int = 2,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    require(minSharedFrames >= 1,
      s"minSharedFrames must be >= 1, got $minSharedFrames")
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try {
          gvidFrames(blob).collect {
            case (i, ppm) if i % everyN == 0 =>
              (id, aHash64(decodePpm(ppm)))
          }.distinct.toVector
        } catch {
          case _: IllegalArgumentException => Vector.empty
        }
      })
      .toDF("id", "h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = Dedup.cappedBucketPairs(hashes, Seq("h"), "id", maxBucketSize)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
    (result, () => { hashes.unpersist(blocking = false); () })
  }

  /** RADIUS-TOLERANT video near-duplicate pairs — the fuzzy twin of
    * [[videoNearDups]] for RE-ENCODED copies whose frame hashes drift
    * a few bits (the pHash/aHash recompression regime): two videos
    * pair when at least `minSharedFrames` cross-clip FRAME PAIRS sit
    * within `maxHamming` (a frame matching two frames of the other
    * clip counts twice). Candidates ride the shared multi-index-
    * hashing engine ([[bandedHammingPairsReleasable]]) over
    * (clip, frame)-packed hash rows, so any radius <= 15 is exact by
    * the pigeonhole — never all-pairs, frames of flat content drop at
    * the bucket cap. Clip ids must fit 31 bits (enforced). Corrupt
    * containers drop whole. Output: (id_a, id_b, n_shared),
    * id_a < id_b.
    *
    * Caches the per-frame hash frame for the session (plan-keyed);
    * long-lived sessions running many distinct corpora should use
    * [[videoNearDupsFuzzyReleasable]] and release() after materializing.
    */
  def videoNearDupsFuzzy(
      df: DataFrame, idCol: String, blobCol: String,
      everyN: Int = 1, maxHamming: Int = 6, minSharedFrames: Int = 2,
      maxBucketSize: Int = 10000): DataFrame =
    videoNearDupsFuzzyReleasable(df, idCol, blobCol, everyN, maxHamming,
      minSharedFrames, maxBucketSize)._1

  /** [[videoNearDupsFuzzy]] plus a release() thunk — forwards the
    * [[bandedHammingPairsReleasable]] thunk that the plain form (by the
    * [[minHashLshPairsReleasable]] plan-keyed-cache contract) leaves
    * cached: the MEMORY_AND_DISK per-frame hash frame drops once the
    * returned plan has been materialized.
    */
  def videoNearDupsFuzzyReleasable(
      df: DataFrame, idCol: String, blobCol: String,
      everyN: Int = 1, maxHamming: Int = 6, minSharedFrames: Int = 2,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    require(minSharedFrames >= 1,
      s"minSharedFrames must be >= 1, got $minSharedFrames")
    require(maxHamming >= 0 && maxHamming <= 15,
      "the packed-frame fuzzy join rides the lazy MIH regime only " +
        s"(maxHamming <= 15), got $maxHamming")
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        require(id >= 0 && id < (1L << 31),
          s"clip id $id does not fit 31 bits (the packed pair key)")
        try {
          gvidFrames(blob).collect {
            case (i, ppm) if i % everyN == 0 => aHash64(decodePpm(ppm))
          }.toVector.distinct.zipWithIndex.map { case (h, idx) =>
            (id * 4294967296L + idx, h)
          }
        } catch {
          case _: IllegalArgumentException => Vector.empty
        }
      })
      .toDF("id", "h")
    val (pairs, release) =
      bandedHammingPairsReleasable(hashes, maxHamming, maxBucketSize)
    val result = pairs
      .select(shiftrightunsigned(col("id_a"), 32).as("ca"),
        shiftrightunsigned(col("id_b"), 32).as("cb"))
      .filter(col("ca") =!= col("cb")) // in-clip near-frames are motion
      .groupBy(col("ca"), col("cb"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
      .select(col("ca").as("id_a"), col("cb").as("id_b"), col("n_shared"))
    (result, release)
  }

  /** Per-channel mean pixel values (unsigned bytes, exact integer sums). */
  def meanRgb(img: PpmImage): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.pixels.length) {
      r += img.pixels(i) & 0xff
      g += img.pixels(i + 1) & 0xff
      b += img.pixels(i + 2) & 0xff
      i += 3
    }
    val n = (img.width * img.height).toDouble
    (r / n, g / n, b / n)
  }

  // ---------- WAV (RIFF, PCM signed 16-bit little-endian) ----------

  final case class WavMeta(
      channels: Int, sampleRate: Int, bitsPerSample: Int, nFrames: Long)

  def encodeWavPcm16(
      sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Validated RIFF chunk walk shared by [[parseWav]]/[[rmsPcm16]]:
    * (meta, data-chunk offset, data-chunk length). Corrupt chunk sizes
    * (negative, or extending past the blob) fail fast instead of looping
    * or reading out of bounds — one bad blob must error its row, not
    * hang the executor.
    */
  private def walkWav(blob: Array[Byte]): (WavMeta, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(blob.length >= 12, "truncated RIFF header")
    require(buf.getInt(0) == 0x46464952, "not RIFF") // "RIFF" LE
    require(buf.getInt(8) == 0x45564157, "not WAVE") // "WAVE" LE
    var pos = 12
    var channels = 0; var rate = 0; var bits = 0
    var dataLen = -1; var dataStart = -1
    while (pos + 8 <= blob.length && (channels == 0 || dataLen < 0)) {
      val id = buf.getInt(pos)
      val sz = buf.getInt(pos + 4)
      require(sz >= 0 && pos + 8 + sz.toLong <= blob.length,
        s"corrupt chunk size $sz at offset $pos")
      if (id == 0x20746d66) { // "fmt "
        require(sz >= 16, s"short fmt chunk ($sz bytes)")
        channels = buf.getShort(pos + 10).toInt
        rate = buf.getInt(pos + 12)
        bits = buf.getShort(pos + 22).toInt
      } else if (id == 0x61746164) { // "data"
        dataLen = sz
        dataStart = pos + 8
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(channels > 0 && bits > 0 && dataLen >= 0,
      "missing fmt/data chunk")
    // sub-byte sample widths (e.g. 4-bit ADPCM) would make the frame-size
    // divisor 0 and die with an opaque ArithmeticException — fail cleanly
    require(bits % 8 == 0 && bits >= 8,
      s"unsupported bitsPerSample $bits (whole-byte PCM widths only)")
    (WavMeta(channels, rate, bits, dataLen.toLong / (channels * bits / 8)),
      dataStart, dataLen)
  }

  /** Walk the RIFF chunk list; returns meta from `fmt ` + `data` sizes. */
  def parseWav(blob: Array[Byte]): WavMeta = walkWav(blob)._1

  /** RMS amplitude of the PCM16 payload (exact integer sum of squares). */
  def rmsPcm16(blob: Array[Byte]): Double = {
    val (meta, dataStart, dataLen) = walkWav(blob)
    require(meta.bitsPerSample == 16, "rmsPcm16 requires 16-bit PCM")
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var sumSq = 0L
    var i = 0
    val n = dataLen / 2
    while (i < n) {
      val s = buf.getShort(dataStart + 2 * i).toLong
      sumSq += s * s
      i += 1
    }
    if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
  }

  /** Windowed RMS energy of the PCM16 payload: one (window_idx,
    * n_frames, rms) triple per `windowFrames`-frame window (final
    * window may be partial) — the frame-level feature pass an audio
    * pipeline runs after parse (VAD screens, silence trimming, energy
    * normalization). Exact integer sums of squares per window.
    */
  def windowRmsPcm16(
      blob: Array[Byte], windowFrames: Int): Seq[(Int, Int, Double)] = {
    require(windowFrames >= 1, s"windowFrames must be >= 1, got $windowFrames")
    val (meta, dataStart, dataLen) = walkWav(blob)
    require(meta.bitsPerSample == 16, "windowRmsPcm16 requires 16-bit PCM")
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val samplesPerFrame = meta.channels
    val nFrames = (dataLen / 2 / samplesPerFrame).toInt
    (0 until nFrames by windowFrames).map { start =>
      val end = math.min(nFrames, start + windowFrames)
      var sumSq = 0L
      var f = start
      while (f < end) {
        var c = 0
        while (c < samplesPerFrame) {
          val s = buf.getShort(dataStart + 2 * (f * samplesPerFrame + c))
            .toLong
          sumSq += s * s
          c += 1
        }
        f += 1
      }
      val n = (end - start) * samplesPerFrame
      (start / windowFrames, end - start,
        if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
    }
  }

  /** Per-window RMS + zero-crossing count + peak of 16-bit PCM. ZCR
    * counts frame-to-frame sign flips (sign = `sample >= 0`) per
    * channel WITHIN the window (a window's first frame has no
    * predecessor), summed over channels; peak is max |sample| over all
    * channels. Both are integral, so they are exactly SQL-oracle-able
    * over the analytic fixtures — no float tolerance needed.
    */
  def windowStatsPcm16(
      blob: Array[Byte], windowFrames: Int)
      : Seq[(Int, Int, Double, Long, Int)] = {
    require(windowFrames >= 1, s"windowFrames must be >= 1, got $windowFrames")
    val (meta, dataStart, dataLen) = walkWav(blob)
    require(meta.bitsPerSample == 16, "windowStatsPcm16 requires 16-bit PCM")
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ch = meta.channels
    val nFrames = (dataLen / 2 / ch).toInt
    def sample(f: Int, c: Int): Int =
      buf.getShort(dataStart + 2 * (f * ch + c)).toInt
    (0 until nFrames by windowFrames).map { start =>
      val end = math.min(nFrames, start + windowFrames)
      var sumSq = 0L
      var zcr = 0L
      var peak = 0
      var f = start
      while (f < end) {
        var c = 0
        while (c < ch) {
          val s = sample(f, c)
          sumSq += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          if (f > start && ((sample(f - 1, c) >= 0) != (s >= 0))) zcr += 1
          c += 1
        }
        f += 1
      }
      val n = (end - start) * ch
      (start / windowFrames, end - start,
        if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n), zcr, peak)
    }
  }

  final case class WavWindowRecord(
      id: Long, window_idx: Int, n_frames: Int, rms: Double)

  final case class WavWindowStatsRecord(
      id: Long, window_idx: Int, n_frames: Int, rms: Double,
      zcr: Long, peak: Int)

  /** Per-window RMS / zero-crossing-rate / peak of a binary WAV column
    * — one row per (file, window), the frame-level feature triple a
    * speech-data curation pass filters on (energy + voicedness +
    * clipping). Partition-local flatMap at the codec boundary like
    * [[wavWindowRms]]; zero shuffle at any corpus size.
    */
  def wavWindowStats(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        windowStatsPcm16(blob, windowFrames).map {
          case (w, n, rms, zcr, peak) =>
            WavWindowStatsRecord(id, w, n, rms, zcr, peak)
        }
      })
      .toDF()
  }

  /** Per-window RMS energy of a binary WAV column — one row per
    * (file, window). Partition-local flatMap at the codec boundary,
    * zero shuffle; output rows ~ frames / windowFrames per file.
    */
  def wavWindowRms(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        windowRmsPcm16(blob, windowFrames).map { case (w, n, rms) =>
          WavWindowRecord(id, w, n, rms)
        }
      })
      .toDF()
  }

  // ---------- audio fingerprinting (band-energy sign blocks) -----------

  /** Goertzel spectral power of PCM16 audio at `bands` fixed
    * normalized frequencies, per non-overlapping `windowFrames`-frame
    * window (channels mix down by summation; the partial tail window
    * is dropped so block math is exact). Band k probes
    * ω_k = π (k+1) / (bands + 1) — an even comb over (0, π)
    * independent of sample rate. One O(frames × bands) pass per blob,
    * partition-local.
    */
  def goertzelEnergiesPcm16(
      blob: Array[Byte], windowFrames: Int,
      bands: Int): Seq[Array[Double]] = {
    require(windowFrames >= 2,
      s"windowFrames must be >= 2, got $windowFrames")
    require(bands >= 1 && bands <= 32,
      s"bands must be in [1, 32], got $bands")
    val (meta, dataStart, dataLen) = walkWav(blob)
    require(meta.bitsPerSample == 16,
      "goertzelEnergiesPcm16 requires 16-bit PCM")
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ch = meta.channels
    val nFrames = (dataLen / 2 / ch).toInt
    val coeffs = Array.tabulate(bands)(k =>
      2.0 * math.cos(math.Pi * (k + 1) / (bands + 1)))
    (0 until nFrames / windowFrames).map { w =>
      val base = w * windowFrames
      val energies = new Array[Double](bands)
      var k = 0
      while (k < bands) {
        val c = coeffs(k)
        var s1 = 0.0; var s2 = 0.0
        var f = 0
        while (f < windowFrames) {
          var x = 0.0
          var cc = 0
          while (cc < ch) {
            x += buf.getShort(dataStart + 2 * ((base + f) * ch + cc))
            cc += 1
          }
          val s0 = x + c * s1 - s2
          s2 = s1; s1 = s0
          f += 1
        }
        energies(k) = s1 * s1 + s2 * s2 - c * s1 * s2
        k += 1
      }
      energies
    }
  }

  /** 64-bit audio sub-fingerprints (Haitsma–Kalker-style energy-delta
    * signs): bit (w, k) of a block is `E[w][k] > E[w-1][k]` — the sign
    * of the band-k energy CHANGE between consecutive windows — and 8
    * consecutive delta-windows × 8 bands pack into one long. Signs of
    * ratios are invariant under amplitude scaling (energies scale
    * quadratically but uniformly), so a volume-normalized copy
    * fingerprints identically. Only COMPLETE blocks emit: a clip of F
    * frames yields ((F / windowFrames) - 1) / 8 blocks.
    */
  def audioFingerprintBlocks(
      blob: Array[Byte], windowFrames: Int): Seq[(Int, Long)] = {
    val bands = 8
    val e = goertzelEnergiesPcm16(blob, windowFrames, bands)
    val deltas = math.max(0, e.length - 1)
    (0 until deltas / bands).map { b =>
      var fp = 0L
      var i = 0
      while (i < 8) {
        val w = b * 8 + i + 1
        var k = 0
        while (k < bands) {
          if (e(w)(k) > e(w - 1)(k)) fp |= 1L << (i * 8 + k)
          k += 1
        }
        i += 1
      }
      (b, fp)
    }
  }

  /** Stride-1 SLIDING variant of [[audioFingerprintBlocks]]: one
    * 64-bit fingerprint per delta-window START (8 consecutive deltas x
    * 8 bands from each offset), not per disjoint 8-delta group. A copy
    * time-shifted by any whole number of windows shares every sliding
    * fingerprint outside the splice boundary, at a CONSTANT index
    * offset — the alignment tolerance the blocked form trades away
    * (its fingerprints only survive shifts that are multiples of
    * 8 x windowFrames). Cost: ~8x the fingerprint rows of the blocked
    * form — the classic recall/cost trade, now choosable per call.
    */
  def audioFingerprintsSliding(
      blob: Array[Byte], windowFrames: Int): Seq[(Int, Long)] = {
    val bands = 8
    val e = goertzelEnergiesPcm16(blob, windowFrames, bands)
    val deltas = math.max(0, e.length - 1)
    (0 to deltas - 8).map { s =>
      var fp = 0L
      var i = 0
      while (i < 8) {
        val w = s + i + 1
        var k = 0
        while (k < bands) {
          if (e(w)(k) > e(w - 1)(k)) fp |= 1L << (i * 8 + k)
          k += 1
        }
        i += 1
      }
      (s, fp)
    }
  }

  /** TIME-SHIFT-TOLERANT audio near-duplicate pairs — closes the
    * alignment sensitivity [[audioNearDups]] documents: clips pair
    * when at least `minSharedBlocks` sliding fingerprints
    * ([[audioFingerprintsSliding]]) match at ONE CONSISTENT relative
    * window offset (Shazam-style offset voting: random collisions
    * scatter across offsets; a true shifted copy concentrates on its
    * shift). Tolerance granularity is `windowFrames` frames — shifts
    * that are whole windows recover fully; sub-window shifts still
    * change the energies themselves.
    *
    * Scale shape: decode + sliding fingerprints are ONE partition-local
    * pass (8x the blocked form's rows — the documented trade);
    * candidates bucket on the fingerprint VALUE with the salted
    * oversized-bucket cap (silence / test tones drop, a near-cap
    * bucket spreads across tasks); the (clip, window-index) pair rides
    * the bucket join packed into one long, so the offset vote is a
    * plain groupBy after decode — never all-pairs. Clip ids must fit
    * 31 bits (enforced).
    *
    * Output: (id_a, id_b, shift, n_shared), id_a < id_b, where
    * `shift` = id_a's window index minus id_b's at the winning offset
    * (one row per offset that clears `minSharedBlocks`).
    *
    * Caches the sliding-fingerprint frame for the session (plan-keyed);
    * long-lived sessions running many distinct corpora should use
    * [[audioNearDupsShiftedReleasable]] and release() after
    * materializing.
    */
  def audioNearDupsShifted(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int = 256, minSharedBlocks: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    audioNearDupsShiftedReleasable(df, idCol, blobCol, windowFrames,
      minSharedBlocks, maxBucketSize)._1

  /** [[audioNearDupsShifted]] plus a release() thunk for the cached
    * sliding-fingerprint intermediate (the [[audioNearDupsReleasable]]
    * contract): the decode pass has two consumers — the bucket-size
    * probe inside [[Dedup.cappedBucketPairs]] and the pair join — so
    * the ~16-byte fingerprint rows persist and the WAV decode +
    * Goertzel pass runs exactly once.
    */
  def audioNearDupsShiftedReleasable(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int = 256, minSharedBlocks: Int = 4,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(minSharedBlocks >= 1,
      s"minSharedBlocks must be >= 1, got $minSharedBlocks")
    val spark = df.sparkSession
    import spark.implicits._
    val fps = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        require(id >= 0 && id < (1L << 31),
          s"clip id $id does not fit 31 bits (the packed pair key)")
        try audioFingerprintsSliding(blob, windowFrames)
          .map { case (s, fp) => (id * 4294967296L + s, fp) }
        catch { case _: IllegalArgumentException => Nil }
      })
      .toDF("cid", "fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val decoded = Dedup
      .cappedBucketPairs(fps, Seq("fp"), "cid", maxBucketSize)
      .select(
        shiftrightunsigned(col("id_a"), 32).as("ca"),
        col("id_a").bitwiseAND(lit(0xffffffffL)).as("ia"),
        shiftrightunsigned(col("id_b"), 32).as("cb"),
        col("id_b").bitwiseAND(lit(0xffffffffL)).as("ib"))
      .filter(col("ca") =!= col("cb")) // in-clip repeats are not dups
    val result = decoded
      .groupBy(col("ca"), col("cb"), (col("ia") - col("ib")).as("shift"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedBlocks)
      .select(col("ca").as("id_a"), col("cb").as("id_b"), col("shift"),
        col("n_shared"))
    (result, () => { fps.unpersist(blocking = false); () })
  }

  final case class AudioFpRecord(id: Long, block: Int, fp: Long)

  /** Per-clip audio sub-fingerprints of a binary WAV column: one row
    * per (clip, block) with the 64-bit [[audioFingerprintBlocks]]
    * value. Partition-local decode at the codec boundary — audio bytes
    * never shuffle, each clip reduces to ~12 bytes per block. Corrupt
    * blobs DROP row-wise (the [[videoStats]] policy).
    */
  def audioFingerprints(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try audioFingerprintBlocks(blob, windowFrames)
          .map { case (b, fp) => AudioFpRecord(id, b, fp) }
        catch { case _: IllegalArgumentException => Nil }
      })
      .toDF()
  }

  /** Audio near-duplicate pairs by exact sub-fingerprint match: clips
    * sharing at least `minSharedBlocks` (block index, fingerprint)
    * cells pair up — the re-encoded / volume-normalized duplicate
    * screen for an audio corpus (alignment-sensitive by design: a
    * time-shifted copy needs an overlapping-hop index, the classic
    * recall/cost trade). Scale shape is [[imageHashNearDups]] /
    * [[Dedup.minHashLshPairs]]: the self-match buckets on
    * (block, fp) — never all-pairs — with oversized buckets (silence,
    * test tones) dropped at `maxBucketSize`, and only (id, block, fp)
    * rows ever shuffle.
    */
  def audioNearDups(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int = 256, minSharedBlocks: Int = 2,
      maxBucketSize: Int = 10000): DataFrame =
    audioNearDupsReleasable(df, idCol, blobCol, windowFrames,
      minSharedBlocks, maxBucketSize)._1

  /** [[audioNearDups]] plus a release() thunk for the cached
    * fingerprint intermediate.
    */
  def audioNearDupsReleasable(
      df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int = 256, minSharedBlocks: Int = 2,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(minSharedBlocks >= 1,
      s"minSharedBlocks must be >= 1, got $minSharedBlocks")
    val fps = audioFingerprints(df, idCol, blobCol, windowFrames)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = Dedup
      .cappedBucketPairs(fps, Seq("block", "fp"), "id", maxBucketSize)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedBlocks)
    (result, () => { fps.unpersist(blocking = false); () })
  }

  /** Persist a reference corpus's audio sub-fingerprints as a
    * CorpusStore table — incremental AUDIO dedup, the third member of
    * the stored-screen family ([[Dedup.writeMinHashReference]] for
    * text, [[writeImageHashReference]] for stills): decode +
    * fingerprint the historical clips ONCE into `<table>_buckets`
    * (bb = xxhash64(block, fp), id), bucketed on bb; each new batch
    * then probes with [[audioNearDupsStored]] and only batch-derived
    * rows shuffle. Oversized buckets (silence, test tones) drop at
    * write time.
    */
  def writeAudioFpReference(
      reference: DataFrame, idCol: String, blobCol: String,
      table: String, windowFrames: Int = 256, numBuckets: Int = 16,
      maxBucketSize: Int = 10000): Unit = {
    val rows = audioFingerprints(reference, idCol, blobCol, windowFrames)
      .select(col("id"), xxhash64(col("block"), col("fp")).as("bb"))
    val oversized = rows.groupBy(col("bb"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("bb"), lit(1).as("__drop"))
    val kept = rows.join(broadcast(oversized), Seq("bb"), "left")
      .filter(col("__drop").isNull).drop("__drop")
    graft.io.CorpusStore.writeBucketed(kept, s"${table}_buckets",
      "bb", numBuckets, Seq("bb"))
  }

  /** GROW an audio-fingerprint store with a new batch (screen first —
    * ids are assumed fresh). Like the MinHash store, appends cannot
    * re-apply a global cap; [[audioNearDupsStored]] re-measures bucket
    * sizes at read time so cross-batch growth cannot restore the
    * quadratic fan-out.
    */
  def appendAudioFpReference(
      docs: DataFrame, table: String, idCol: String, blobCol: String,
      windowFrames: Int = 256): Unit = {
    val n = graft.io.CorpusStore
      .storedNumBuckets(docs.sparkSession, s"${table}_buckets")
    val rows = audioFingerprints(docs, idCol, blobCol, windowFrames)
      .select(col("id"), xxhash64(col("block"), col("fp")).as("bb"))
    graft.io.CorpusStore.appendBucketed(rows, s"${table}_buckets",
      "bb", n, Seq("bb"))
  }

  /** Near-duplicate (new clip, stored clip) pairs against a
    * [[writeAudioFpReference]] store: the batch decodes and
    * fingerprints row-locally, its (block, fp) bucket keys join into
    * the bucketed stored scan (the store never re-decodes or
    * re-exchanges), and pairs sharing at least `minSharedBlocks` cells
    * survive. `maxBucketSize` re-applies the write-time cap at READ
    * time (appends cap nothing — the
    * [[Dedup.minHashNearDupsStored]] lesson). Pass the same
    * `windowFrames` as at write time. Output: new_id, ref_id,
    * n_shared.
    */
  def audioNearDupsStored(
      docs: DataFrame, table: String, idCol: String, blobCol: String,
      windowFrames: Int = 256, minSharedBlocks: Int = 2,
      maxBucketSize: Int = 10000): DataFrame = {
    require(minSharedBlocks >= 1,
      s"minSharedBlocks must be >= 1, got $minSharedBlocks")
    val probe = audioFingerprints(docs, idCol, blobCol, windowFrames)
      .select(col("id").as("new_id"),
        xxhash64(col("block"), col("fp")).as("bb"))
    val refAll = graft.io.CorpusStore
      .readBucketed(docs.sparkSession, s"${table}_buckets")
    val oversized = refAll.groupBy(col("bb"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("bb"), lit(1).as("__drop"))
    val ref = refAll.join(broadcast(oversized), Seq("bb"), "left")
      .filter(col("__drop").isNull).drop("__drop")
    probe.join(ref, Seq("bb"))
      .groupBy(col("new_id"), col("id").as("ref_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedBlocks)
  }

  // ---------- deterministic blob synthesis (test tables carry no media) --

  /** Deterministic PPM: w = 4 + id%8, h = 3 + id%5, channel values are
    * fixed affine functions of (id, x, y) mod 256 — analytically
    * replicable in SQL, so REAL decode output is oracle-checkable.
    */
  def synthesizePpm(id: Long): Array[Byte] = {
    val w = (4 + id % 8).toInt
    val h = (3 + id % 5).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        px(i) = ((id + 7L * x + 13L * y) % 256).toByte
        px(i + 1) = ((id * 3 + 5L * x + 11L * y) % 256).toByte
        px(i + 2) = ((id * 7 + 3L * x + 17L * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    encodePpm(PpmImage(w, h, px))
  }

  /** Deterministic WHITE-NOISE mono PCM16 WAV at 8 kHz for the
    * fingerprint fixtures: n = 1600 + (id % 3) * 160 frames,
    * sample_i = splitmix64(id * 1000003 + i) % 1001. The
    * [[synthesizeWav]] ramp is NEAR-PERIODIC and aliases across ids at
    * fingerprint granularity (every clip pairs with every clip);
    * per-sample splitmix noise makes cross-id energy-sign blocks
    * independent, so only planted copies collide.
    */
  def synthesizeWavNoise(id: Long): Array[Byte] = {
    val n = (1600 + (id % 3) * 160).toInt
    val samples = Array.tabulate(n)(i =>
      (graft.functions.BloomRuntime.splitmix64(
        id * 1000003L + i) % 1001).toShort)
    encodeWavPcm16(8000, 1, samples)
  }

  /** Deterministic mono PCM16 WAV at 8 kHz: n = 800 + id%100 frames,
    * sample_i = ((id*31 + i*17) mod 2003) - 1001.
    */
  def synthesizeWav(id: Long): Array[Byte] = {
    val n = (800 + id % 100).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (((id * 31 + i.toLong * 17) % 2003) - 1001).toShort
      i += 1
    }
    encodeWavPcm16(8000, 1, samples)
  }

  // ---------- Spark surface (partition-local decode, no shuffle) --------

  final case class PpmRecord(
      id: Long, width: Int, height: Int, channels: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  final case class WavRecord(
      id: Long, channels: Int, sample_rate: Int, n_frames: Long,
      duration_us: Long, rms: Double)

  /** Decode a binary PPM column into dimensions + channel means. */
  def decodePpmImages(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val img = decodePpm(blob)
        val (r, g, b) = meanRgb(img)
        PpmRecord(id, img.width, img.height, img.channels, r, g, b)
      })
      .toDF()
  }

  final case class PpmResizedRecord(
      id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double,
      n_bytes: Long, blob: Array[Byte])

  /** Decode + nearest-neighbor resize + re-encode a binary PPM column —
    * a REAL pixel transform in the decode/transform/re-encode shape a
    * production media pipeline uses, with the resized blob AND its
    * stats in one pass. Partition-local (mapPartitions at the codec
    * boundary, like [[decodePpmImages]]), zero shuffle.
    */
  def resizePpmImages(
      df: DataFrame, idCol: String, blobCol: String,
      newW: Int, newH: Int): DataFrame = {
    require(newW >= 1 && newH >= 1, s"invalid target ${newW}x$newH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val resized = resizeNearest(decodePpm(blob), newW, newH)
        val out = encodePpm(resized)
        val (r, g, b) = meanRgb(resized)
        PpmResizedRecord(id, resized.width, resized.height, r, g, b,
          out.length.toLong, out)
      })
      .toDF()
  }

  /** Parse a binary WAV column into audio stats. */
  def wavStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val m = parseWav(blob)
        WavRecord(id, m.channels, m.sampleRate, m.nFrames,
          m.nFrames * 1000000L / m.sampleRate, rmsPcm16(blob))
      })
      .toDF()
  }

  // ------ AIFF / AU via the JDK's javax.sound.sampled (zero deps) ------

  /** Audio container sniff from magic bytes: "wav" (RIFF), "aiff"
    * (FORM), "au" (.snd), or "unknown".
    */
  def sniffAudioFormat(blob: Array[Byte]): String =
    if (blob.length < 4) "unknown"
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F') "wav"
    else if (blob(0) == 'F' && blob(1) == 'O' && blob(2) == 'R' &&
      blob(3) == 'M') "aiff"
    else if (blob(0) == '.' && blob(1) == 's' && blob(2) == 'n' &&
      blob(3) == 'd') "au"
    else "unknown"

  private def encodeViaAudioSystem(
      sampleRate: Int, channels: Int, samples: Array[Short],
      fileType: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(samples.length % channels == 0,
      "sample count must be a multiple of channels")
    // big-endian PCM16 frames: AIFF stores big-endian natively and the
    // JDK writer accepts it for AU/WAVE too (re-ordering internally)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) >> 8).toByte
      pcm(2 * i + 1) = samples(i).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      samples.length.toLong / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  /** Encode PCM16 frames as AIFF through the JDK's AudioSystem. */
  def encodeAiffPcm16(
      sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] =
    encodeViaAudioSystem(sampleRate, channels, samples,
      javax.sound.sampled.AudioFileFormat.Type.AIFF)

  /** Encode PCM16 frames as AU through the JDK's AudioSystem. */
  def encodeAuPcm16(
      sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] =
    encodeViaAudioSystem(sampleRate, channels, samples,
      javax.sound.sampled.AudioFileFormat.Type.AU)

  /** REAL WAV/AIFF/AU parse + PCM16 sample decode through the JDK's
    * `javax.sound.sampled.AudioSystem` — zero external codec
    * libraries; MP3/OGG remain genuinely environmental. Returns
    * (meta, interleaved samples). Refuses non-PCM16 payloads (the
    * same contract as the hand-rolled [[rmsPcm16]]).
    */
  def decodeAudioIo(blob: Array[Byte]): (WavMeta, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    val f = ais.getFormat
    require(f.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      f.getSampleSizeInBits == 16,
      s"unsupported audio payload: ${f.getEncoding} " +
        s"${f.getSampleSizeInBits}-bit (16-bit signed PCM only)")
    val data = ais.readAllBytes()
    val n = data.length / 2
    // fail-fast on truncation, like the WAV walker and the PPM
    // decoder: a stream cut inside its sample data must not silently
    // decode as a shorter clip (readAllBytes returns what it got)
    val declaredFrames = ais.getFrameLength
    require(declaredFrames < 0 ||
      n.toLong / f.getChannels == declaredFrames,
      s"truncated audio payload: header declares $declaredFrames " +
        s"frames, stream carried ${n.toLong / f.getChannels}")
    val out = new Array[Short](n)
    val big = f.isBigEndian
    var i = 0
    while (i < n) {
      out(i) =
        if (big) (((data(2 * i) & 0xff) << 8) | (data(2 * i + 1) & 0xff))
          .toShort
        else (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff))
          .toShort
      i += 1
    }
    (WavMeta(f.getChannels, f.getSampleRate.toInt, 16,
      n.toLong / f.getChannels), out)
  }

  /** HEADER-ONLY audio metadata — the audio twin of
    * [[parseImageMeta]]: container, channels, sample rate, bit depth,
    * frame count and exact integer-math duration WITHOUT touching
    * sample data. WAV rides the hand-rolled header walker; AIFF/AU
    * ride `AudioSystem.getAudioFileFormat`, which reads the header
    * and never the payload. Profiling the shape of an audio corpus
    * costs header bytes per row, not a sample decode per row
    * (spec-pinned: blobs truncated inside their sample data still
    * parse, where the decoder rightly fails).
    */
  def parseAudioMeta(blob: Array[Byte]): (String, WavMeta) =
    sniffAudioFormat(blob) match {
      case "wav" => ("wav", parseWav(blob))
      case fmt @ ("aiff" | "au") =>
        val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(blob))
        val f = ff.getFormat
        require(ff.getFrameLength >= 0,
          s"$fmt header carries no frame count")
        (fmt, WavMeta(f.getChannels, f.getSampleRate.toInt,
          f.getSampleSizeInBits, ff.getFrameLength.toLong))
      case _ => throw new IllegalArgumentException(
        "unrecognized audio container (magic bytes match no known format)")
    }

  final case class AudioMetaRecord(id: Long, format: String,
      channels: Int, sample_rate: Int, bits_per_sample: Int,
      n_frames: Long, duration_us: Long)

  /** Header-only metadata of a binary audio column: (id, format,
    * channels, sample_rate, bits_per_sample, n_frames, duration_us) —
    * partition-local, no sample decode, zero shuffle. Strict; crawl
    * feeds use [[audioMetaLenient]].
    */
  def audioMeta(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val (fmt, m) = parseAudioMeta(blob)
        AudioMetaRecord(id, fmt, m.channels, m.sampleRate,
          m.bitsPerSample, m.nFrames,
          m.nFrames * 1000000L / m.sampleRate)
      })
      .toDF()
  }

  /** [[audioMeta]] with crawl-ingest DROP semantics: a corrupt header
    * costs its row, never the job.
    */
  def audioMetaLenient(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try {
          val (fmt, m) = parseAudioMeta(blob)
          Some(AudioMetaRecord(id, fmt, m.channels, m.sampleRate,
            m.bitsPerSample, m.nFrames,
            m.nFrames * 1000000L / m.sampleRate))
        } catch { case scala.util.control.NonFatal(_) => None }
      })
      .toDF()
  }

  /** Format-sniffing audio decode to (meta, PCM16 samples): WAV
    * through the hand-rolled byte walker (validated fail-fast
    * semantics, parity with AudioSystem spec-pinned), AIFF/AU through
    * [[decodeAudioIo]].
    */
  def decodeAudioSamples(blob: Array[Byte]): (WavMeta, Array[Short]) =
    sniffAudioFormat(blob) match {
      case "wav" =>
        val (meta, dataStart, dataLen) = walkWav(blob)
        require(meta.bitsPerSample == 16,
          "decodeAudioSamples requires 16-bit PCM")
        val buf = java.nio.ByteBuffer.wrap(blob)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = dataLen / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = buf.getShort(dataStart + 2 * i); i += 1 }
        (meta, out)
      case "aiff" | "au" => decodeAudioIo(blob)
      case _ => throw new IllegalArgumentException(
        "unrecognized audio container (magic bytes match no known format)")
    }

  /** [[decodeImages]] with DROP semantics for undecodable blobs — the
    * 100 TB ingest form ([[videoFrameSample]]'s policy): one corrupt
    * image in a billion-row crawl must cost its row, never the job.
    * The strict [[decodeImages]] remains the right call for curated
    * inputs where a bad blob means a pipeline bug upstream. Returns
    * the decoded rows plus nothing for corrupt inputs; count the
    * difference against the input when the drop rate itself is the
    * signal.
    */
  def decodeImagesLenient(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    blobPairs(df, idCol, blobCol)
      .mapPartitions(_.flatMap { case (id, blob) =>
        // NonFatal, not a curated exception list: real crawl data
        // makes the JDK readers throw unchecked surprises well beyond
        // IIOException (CMMException on corrupt ICC profiles,
        // NegativeArraySizeException on lying headers) — any of them
        // means "this blob, not this job"; VM errors still propagate
        try {
          val img = decodeImage(blob)
          val (r, g, b) = meanRgb(img)
          Some(PpmRecord(id, img.width, img.height, img.channels,
            r, g, b))
        } catch {
          case scala.util.control.NonFatal(_) => None
        }
      })
      .toDF()
  }

  /** [[imageHashes]] with DROP semantics for undecodable blobs (the
    * crawl-ingest twin — see [[decodeImagesLenient]]).
    */
  def imageHashesLenient(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    blobPairs(df, idCol, blobCol)
      .mapPartitions(_.flatMap { case (id, blob) =>
        try {
          val img = decodeImage(blob)
          Some(ImageHashRecord(id, aHash64(img), dHash64(img)))
        } catch {
          case scala.util.control.NonFatal(_) => None
        }
      })
      .toDF()
  }

  /** Static/low-diversity video screen — the frozen-capture /
    * single-slide detector a video training pipeline runs before
    * paying for frame extraction at scale: per video — the sampled
    * frame count, the number of DISTINCT perceptual frame appearances
    * (aHash+dHash pairs over the sampled frames), the diversity ratio,
    * and the `static` verdict (every sampled frame hashes
    * identically). Frame decode + hashing are partition-local
    * ([[videoFrameSample]] drop-whole semantics for corrupt
    * containers); only (video id, 16 bytes of hash) rows reach the one
    * grouped aggregate.
    */
  def videoFrameDiversity(
      df: DataFrame, idCol: String, blobCol: String,
      everyN: Int = 1): DataFrame = {
    val frames = videoFrameSample(df, idCol, blobCol, everyN)
      .select(col("id"), col("frame"))
    imageHashes(frames, "id", "frame")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sampled"),
        count_distinct(col("ahash"), col("dhash")).as("n_distinct"))
      .select(col("id"), col("n_sampled"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_sampled"))
          .as("diversity"),
        // one sampled frame is EVIDENCE OF NOTHING — an everyN that
        // undersamples a short clip to a single frame must not
        // condemn it as frozen
        (col("n_sampled") > 1 && col("n_distinct") === 1).as("static"))
  }

  final case class AudioQualityRecord(
      id: Long, channels: Int, sample_rate: Int, n_samples: Long,
      rms: Double, peak: Int, clip_frac: Double, silence_frac: Double,
      zero_crossings: Long, clipped: Boolean, near_silent: Boolean)

  /** Audio quality screen — the clipping/silence curation filter a
    * speech/audio training pipeline runs before anything expensive
    * (blown recordings, dead microphones, digital silence): per clip
    * over the PCM16 samples — RMS, peak amplitude, the fraction of
    * near-full-scale samples (`|s| >= clipAbove`), the fraction of
    * near-silent samples (`|s| < silenceBelow`), per-channel
    * zero-crossing count (summed), and two verdicts: `clipped`
    * (`n_clip * 100 > n_samples` — more than 1% of samples at the
    * rail, integer-exact) and `near_silent` (`sum(s^2) < n * 2500` —
    * RMS below 50 compared in the squared domain, so the test is
    * integer-exact too). Decode is the sniffing WAV/AIFF/AU path;
    * partition-local, zero shuffle at any scale.
    */
  def audioQualityStats(
      df: DataFrame, idCol: String, blobCol: String,
      clipAbove: Int = 32000, silenceBelow: Int = 100): DataFrame = {
    require(clipAbove > 0 && clipAbove <= 32768,
      s"clipAbove out of range: $clipAbove")
    require(silenceBelow >= 0 && silenceBelow <= clipAbove,
      s"silenceBelow out of range: $silenceBelow")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        audioQualityRecord(id, blob, clipAbove, silenceBelow)
      })
      .toDF()
  }

  /** The per-row audio quality screen behind [[audioQualityStats]],
    * shared with the streaming monitor
    * ([[graft.streaming.StreamingMedia]]).
    */
  private[graft] def audioQualityRecord(
      id: Long, blob: Array[Byte],
      clipAbove: Int, silenceBelow: Int): AudioQualityRecord = {
    val (m, s) = decodeAudioSamples(blob)
    val n = s.length
    var sumSq = 0L
    var peak = 0
    var nClip = 0L
    var nSil = 0L
    var i = 0
    while (i < n) {
      val v = s(i).toInt
      val a = math.abs(v)
      sumSq += v.toLong * v
      if (a > peak) peak = a
      if (a >= clipAbove) nClip += 1
      if (a < silenceBelow) nSil += 1
      i += 1
    }
    // zero crossings per channel over the interleaved stream
    val ch = m.channels
    var zc = 0L
    var c = 0
    while (c < ch) {
      var f = 1
      while (f.toLong * ch + c < n) {
        val prev = s((f - 1) * ch + c) >= 0
        val cur = s(f * ch + c) >= 0
        if (prev != cur) zc += 1
        f += 1
      }
      c += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
    AudioQualityRecord(id, m.channels, m.sampleRate, n.toLong, rms,
      peak, if (n == 0) 0.0 else nClip.toDouble / n,
      if (n == 0) 0.0 else nSil.toDouble / n, zc,
      nClip * 100 > n, sumSq < n.toLong * 2500)
  }

  /** [[synthesizeWav]] with planted quality regimes for the q259
    * oracle: id % 7 == 0 clips (samples x40, clamped to the PCM16
    * rails), id % 5 == 0 is near-silent (samples mod 50), everything
    * else is the plain analytic ramp — all three replicable in SQL
    * (Scala's Int %, clamp, and abs match DuckDB's % / least /
    * greatest on these operand signs).
    */
  def synthesizeWavQuality(id: Long): Array[Byte] = {
    val n = (800 + id % 100).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val base = ((id * 31 + i.toLong * 17) % 2003 - 1001).toInt
      val v =
        if (id % 7 == 0) math.max(-32768, math.min(32767, base * 40))
        else if (id % 5 == 0) base % 50
        else base
      samples(i) = v.toShort
      i += 1
    }
    encodeWavPcm16(8000, 1, samples)
  }

  /** [[synthesizeWav]]'s samples in an AIFF container: PCM16 is
    * lossless across containers, so every analytic oracle written for
    * the WAV fixtures carries over bit-exactly.
    */
  def synthesizeAiff(id: Long): Array[Byte] = {
    val n = (800 + id % 100).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (((id * 31 + i.toLong * 17) % 2003) - 1001).toShort
      i += 1
    }
    encodeAiffPcm16(8000, 1, samples)
  }

  /** Parse a binary audio column (WAV/AIFF/AU, sniffed per row) into
    * audio stats — [[wavStats]] widened to the AudioSystem formats;
    * same partition-local zero-shuffle scale shape and output schema.
    */
  def audioStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val (m, samples) = decodeAudioSamples(blob)
        var ss = 0L
        var i = 0
        while (i < samples.length) {
          ss += samples(i).toLong * samples(i); i += 1
        }
        val rms =
          if (samples.isEmpty) 0.0
          else math.sqrt(ss.toDouble / samples.length)
        WavRecord(id, m.channels, m.sampleRate, m.nFrames,
          m.nFrames * 1000000L / m.sampleRate, rms)
      })
      .toDF()
  }

  // ---------- PNG / JPEG via the JDK's ImageIO (zero new deps) ----------

  /** Container sniff from magic bytes: "ppm" (P6), "png" (\x89PNG),
    * "jpeg" (\xFF\xD8), or "unknown".
    */
  def sniffImageFormat(blob: Array[Byte]): String =
    if (blob.length >= 2 && blob(0) == 'P' && blob(1) == '6') "ppm"
    else if (blob.length >= 4 && (blob(0) & 0xff) == 0x89 &&
      blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G') "png"
    else if (blob.length >= 2 && (blob(0) & 0xff) == 0xff &&
      (blob(1) & 0xff) == 0xd8) "jpeg"
    else "unknown"

  // ImageIO setup, once per JVM (executor-side too): headless mode (a
  // byte-array codec never needs a display) and the in-memory stream
  // cache (the default spills every encode/decode through a temp FILE —
  // a per-row disk write inside a mapPartitions hot loop).
  private lazy val imageIoReady: Boolean = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  private def toBufferedImage(img: PpmImage): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](img.width)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val i = (y * img.width + x) * 3
        row(x) = ((img.pixels(i) & 0xff) << 16) |
          ((img.pixels(i + 1) & 0xff) << 8) | (img.pixels(i + 2) & 0xff)
        x += 1
      }
      bi.setRGB(0, y, img.width, 1, row, 0, img.width)
      y += 1
    }
    bi
  }

  private def fromBufferedImage(
      bi: java.awt.image.BufferedImage): PpmImage = {
    val w = bi.getWidth; val h = bi.getHeight
    // a lying header can declare dimensions whose pixel buffer
    // overflows Int (w*h*3 wraps negative) — fail cleanly, and in the
    // lenient path that failure costs the row
    require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
      s"image dimensions out of range: ${w}x$h")
    val px = new Array[Byte](w * h * 3)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      // getRGB converts ANY stored color model (BGR bytes, palette,
      // gray) to packed sRGB ints — one row at a time, no per-pixel
      // ColorModel dispatch
      bi.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val v = row(x); val i = (y * w + x) * 3
        px(i) = ((v >> 16) & 0xff).toByte
        px(i + 1) = ((v >> 8) & 0xff).toByte
        px(i + 2) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, px)
  }

  /** Encode as PNG (lossless) through the JDK's ImageIO writer. */
  def encodePng(img: PpmImage): Array[Byte] = {
    require(imageIoReady)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(toBufferedImage(img), "png", bos),
      "no PNG writer available in this JVM")
    bos.toByteArray
  }

  /** Encode as JPEG at an explicit quality in (0, 1] — lossy by
    * nature; pHash survival under recompression is the spec-pinned
    * invariant ([[pHash64]]'s reason to exist).
    */
  def encodeJpeg(img: PpmImage, quality: Float = 0.95f): Array[Byte] = {
    require(imageIoReady)
    require(quality > 0f && quality <= 1f,
      s"jpeg quality out of (0,1]: $quality")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    require(writers.hasNext, "no JPEG writer available in this JVM")
    val writer = writers.next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(toBufferedImage(img), null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL PNG/JPEG decode through the JDK's ImageIO — headless-safe,
    * zero external codec libraries (verified in-container; MP3/MP4
    * remain behind the [[Multimodal.ImageCodec]]-style plug boundary).
    */
  def decodeImageIo(blob: Array[Byte]): PpmImage = {
    require(imageIoReady)
    val bi =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    require(bi != null, "undecodable image bytes (no ImageIO reader matched)")
    fromBufferedImage(bi)
  }

  /** Format-sniffing decode: P6 PPM through the byte-level parser,
    * PNG/JPEG through ImageIO. The image ops route through here, so a
    * mixed-format corpus decodes in one partition-local pass.
    */
  def decodeImage(blob: Array[Byte]): PpmImage =
    sniffImageFormat(blob) match {
      case "ppm" => decodePpm(blob)
      case "png" | "jpeg" => decodeImageIo(blob)
      case _ => throw new IllegalArgumentException(
        "unrecognized image container (magic bytes match no known format)")
    }

  // ===== header-only image metadata (no pixel decode) ===============

  final case class ImageMeta(format: String, width: Int, height: Int,
      bitDepth: Int, nComponents: Int)

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  /** PNG IHDR walk: the 8-byte signature plus the mandatory first
    * chunk (length 13, type IHDR) fix the metadata in the first 33
    * bytes — width/height (big-endian 32), bit depth, color type.
    * Color type -> sample count per the PNG spec (0 gray, 2 truecolor,
    * 3 palette-indexed, 4 gray+alpha, 6 truecolor+alpha).
    */
  def parsePngMeta(blob: Array[Byte]): ImageMeta = {
    require(blob.length >= 33, "truncated PNG header")
    require((blob(0) & 0xff) == 0x89 && blob(1) == 'P' && blob(2) == 'N' &&
      blob(3) == 'G' && (blob(4) & 0xff) == 0x0d && (blob(5) & 0xff) == 0x0a &&
      (blob(6) & 0xff) == 0x1a && (blob(7) & 0xff) == 0x0a,
      "not a PNG signature")
    require(be32(blob, 8) == 13 && blob(12) == 'I' && blob(13) == 'H' &&
      blob(14) == 'D' && blob(15) == 'R',
      "first PNG chunk is not a 13-byte IHDR")
    val w = be32(blob, 16); val h = be32(blob, 20)
    require(w > 0 && h > 0, s"invalid PNG dimensions ${w}x$h")
    val bitDepth = blob(24) & 0xff
    val colorType = blob(25) & 0xff
    val nComp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case t => throw new IllegalArgumentException(s"bad PNG color type $t")
    }
    ImageMeta("png", w, h, bitDepth, nComp)
  }

  /** JPEG marker-segment walk to the SOF frame header: every segment
    * is (0xFF, marker, 2-byte big-endian length), standalone markers
    * (RSTn/TEM) carry no length, and the frame header (SOF0..15 minus
    * DHT/JPG/DAC) holds precision, height, width, component count.
    * Walks SEGMENT HEADERS only — entropy-coded pixel data is never
    * reached (SOF precedes the scan).
    */
  def parseJpegMeta(blob: Array[Byte]): ImageMeta = {
    require(blob.length >= 4 && (blob(0) & 0xff) == 0xff &&
      (blob(1) & 0xff) == 0xd8, "not a JPEG (no SOI marker)")
    var pos = 2
    while (pos + 3 < blob.length) {
      require((blob(pos) & 0xff) == 0xff,
        s"bad JPEG marker byte at $pos")
      val marker = blob(pos + 1) & 0xff
      if (marker == 0xff) pos += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        pos += 2 // standalone: TEM / RSTn / SOI / EOI
      } else {
        val len = be16(blob, pos + 2)
        require(len >= 2 && pos + 2 + len <= blob.length,
          s"truncated JPEG segment at $pos (len $len)")
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          require(len >= 8, s"short SOF segment (len $len)")
          val precision = blob(pos + 4) & 0xff
          val h = be16(blob, pos + 5)
          val w = be16(blob, pos + 7)
          val nComp = blob(pos + 9) & 0xff
          require(w > 0 && h > 0, s"invalid JPEG dimensions ${w}x$h")
          return ImageMeta("jpeg", w, h, precision, nComp)
        }
        require(marker != 0xda,
          "JPEG scan (SOS) reached before any SOF frame header")
        pos += 2 + len
      }
    }
    throw new IllegalArgumentException("no SOF frame header found")
  }

  /** HEADER-ONLY image metadata — format, dimensions, bit depth and
    * component count WITHOUT pixel decode: PNG reads its fixed 33-byte
    * signature+IHDR, JPEG walks marker segments to the SOF header, PPM
    * parses its ASCII header. The [[videoStats]] walks-headers-only
    * pattern applied to stills: profiling the SHAPE of a 100 TB image
    * corpus costs header bytes per row, not a full decode per row
    * (spec-pinned: metadata parses blobs whose pixel data is
    * truncated away, where the decoder rightly fails).
    */
  def parseImageMeta(blob: Array[Byte]): ImageMeta =
    sniffImageFormat(blob) match {
      case "ppm" =>
        val (w, h, _) = parsePpmHeader(blob)
        ImageMeta("ppm", w, h, 8, 3)
      case "png" => parsePngMeta(blob)
      case "jpeg" => parseJpegMeta(blob)
      case _ => throw new IllegalArgumentException(
        "unrecognized image container (magic bytes match no known format)")
    }

  final case class ImageMetaRecord(id: Long, format: String, width: Int,
      height: Int, bit_depth: Int, n_components: Int)

  /** Header-only metadata of a binary image column: (id, format,
    * width, height, bit_depth, n_components), partition-local, no
    * pixel decode, zero shuffle. Strict — corrupt blobs fail the job;
    * crawl feeds use [[imageMetaLenient]].
    */
  def imageMeta(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val m = parseImageMeta(blob)
        ImageMetaRecord(id, m.format, m.width, m.height, m.bitDepth,
          m.nComponents)
      })
      .toDF()
  }

  /** [[imageMeta]] with crawl-ingest DROP semantics: a corrupt header
    * costs its row, never the job.
    */
  def imageMetaLenient(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        try {
          val m = parseImageMeta(blob)
          Some(ImageMetaRecord(id, m.format, m.width, m.height,
            m.bitDepth, m.nComponents))
        } catch { case scala.util.control.NonFatal(_) => None }
      })
      .toDF()
  }

  /** [[synthesizePpm]]'s pixels in a PNG container: PNG is lossless,
    * so the decoded pixels — and therefore every analytic oracle
    * written for the PPM fixtures — carry over bit-exact.
    */
  def synthesizePng(id: Long): Array[Byte] =
    encodePng(decodePpm(synthesizePpm(id)))

  /** [[synthesizePpm]]'s pixels JPEG-compressed — LOSSY: dims and
    * channel count survive exactly, pixel values only approximately
    * (the pHash-stability regime).
    */
  def synthesizeJpeg(id: Long, quality: Float = 0.95f): Array[Byte] =
    encodeJpeg(decodePpm(synthesizePpm(id)), quality)

  /** Decode a binary image column (PPM/PNG/JPEG, sniffed per row) into
    * dimensions + channel means — [[decodePpmImages]] widened to the
    * ImageIO formats; same scale shape (partition-local decode, zero
    * shuffle).
    */
  def decodeImages(
      df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    blobPairs(df, idCol, blobCol)
      .mapPartitions(_.map { case (id, blob) =>
        val img = decodeImage(blob)
        val (r, g, b) = meanRgb(img)
        PpmRecord(id, img.width, img.height, img.channels, r, g, b)
      })
      .toDF()
  }

  final case class ResizedImageRecord(
      id: Long, format: String, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double,
      out_bytes: Long, blob: Array[Byte])

  /** Resize a binary image column (PPM/PNG/JPEG, sniffed per row) with
    * nearest-neighbor resampling and RE-ENCODE into the source
    * container (JPEG at quality 0.95) — the thumbnail/normalize step
    * of a multimodal ingest pipeline, [[resizePpmImages]] widened to
    * the ImageIO formats. Channel means are measured on the resized
    * raster BEFORE re-encode, so they stay analytic-oracle-exact even
    * for the lossy JPEG container; `out_bytes` is the re-encoded size
    * (compressor-dependent for PNG/JPEG — report it, never oracle
    * it). Partition-local, zero shuffle.
    */
  def resizeImages(
      df: DataFrame, idCol: String, blobCol: String,
      newW: Int, newH: Int): DataFrame = {
    require(newW >= 1 && newH >= 1, s"invalid target ${newW}x$newH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val fmt = sniffImageFormat(blob)
        val resized = resizeNearest(decodeImage(blob), newW, newH)
        val out = fmt match {
          case "ppm" => encodePpm(resized)
          case "png" => encodePng(resized)
          case "jpeg" => encodeJpeg(resized, 0.95f)
          case other => throw new IllegalArgumentException(
            s"unrecognized image container: $other")
        }
        val (r, g, b) = meanRgb(resized)
        ResizedImageRecord(id, fmt, resized.width, resized.height,
          r, g, b, out.length.toLong, out)
      })
      .toDF()
  }

  final case class ImageQualityRecord(
      id: Long, width: Int, height: Int,
      gray_min: Int, gray_max: Int, gray_mean: Double, gray_std: Double,
      frac_dark: Double, frac_bright: Double, entropy: Double,
      low_contrast: Boolean)

  /** Image quality screen — the luminance/contrast curation filter a
    * multimodal training pipeline runs before anything expensive
    * (degenerate captures: all-black frames, blown-out scans,
    * near-constant synthetic fills): per image over the integer gray
    * values [[gray3]] (r+g+b, 0..765) — min / max / mean / population
    * std, the fraction of near-black (`gray3 < darkBelow`) and
    * near-white (`gray3 > brightAbove`) pixels, the natural-log
    * entropy of the 16-bin gray histogram (bin = gray3*16/766), and a
    * `low_contrast` verdict (`gray_max - gray_min < minRange` —
    * integer-exact, the SQL-replicable contrast test).
    *
    * Every statistic is built from integer-exact sums so the DuckDB
    * oracle replays bit-for-bit: mean = sum/n (one IEEE division),
    * std = sqrt(n*sumsq - sum^2)/n (one sqrt of an exact integer, one
    * division), entropy = ln(n) - sum(c*ln c)/n over 16 bins.
    * Decode is sniffed per row (PPM/PNG/JPEG); partition-local, zero
    * shuffle at any scale.
    */
  def imageQualityStats(
      df: DataFrame, idCol: String, blobCol: String,
      darkBelow: Int = 77, brightAbove: Int = 688,
      minRange: Int = 100): DataFrame = {
    require(darkBelow >= 0 && brightAbove <= 765 && darkBelow <= brightAbove,
      s"invalid thresholds [$darkBelow, $brightAbove]")
    require(minRange >= 0, s"minRange must be >= 0, got $minRange")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        imageQualityRecord(id, blob, darkBelow, brightAbove, minRange)
      })
      .toDF()
  }

  /** The per-row image quality screen behind [[imageQualityStats]],
    * shared with the streaming monitor
    * ([[graft.streaming.StreamingMedia]]).
    */
  private[graft] def imageQualityRecord(
      id: Long, blob: Array[Byte],
      darkBelow: Int, brightAbove: Int, minRange: Int): ImageQualityRecord = {
    val img = decodeImage(blob)
    val g = gray3(img)
    val n = g.length
    var mn = 765; var mx = 0
    var sum = 0L; var sumSq = 0L
    var dark = 0L; var bright = 0L
    val bins = new Array[Long](16)
    var i = 0
    while (i < n) {
      val v = g(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      sumSq += v.toLong * v
      if (v < darkBelow) dark += 1
      if (v > brightAbove) bright += 1
      bins(v * 16 / 766) += 1
      i += 1
    }
    val mean = sum.toDouble / n
    val std = math.sqrt((n.toLong * sumSq - sum * sum).toDouble) / n
    var clogc = 0.0
    var b = 0
    while (b < 16) {
      if (bins(b) > 0) clogc += bins(b) * math.log(bins(b).toDouble)
      b += 1
    }
    val entropy = math.log(n.toDouble) - clogc / n
    ImageQualityRecord(id, img.width, img.height, mn, mx, mean, std,
      dark.toDouble / n, bright.toDouble / n, entropy,
      mx - mn < minRange)
  }
}
