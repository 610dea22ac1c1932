package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The JDK `javax.imageio` codec path (PNG/JPEG — zero external
  * dependencies, headless-safe):
  *
  *  - PNG is LOSSLESS: encode -> decode must round-trip the pixel
  *    array bit-exactly, so every analytic oracle written for the PPM
  *    fixtures carries over to the PNG container unchanged (q252/q253
  *    pin this against DuckDB; here it is pinned per-pixel).
  *  - JPEG is LOSSY: dims/channels survive exactly, pixels only
  *    approximately — the invariant that matters is the one pHash
  *    exists for: the 64-bit DCT hash must survive recompression at
  *    high quality with small Hamming drift, including a second
  *    generation of recompression.
  *  - the format sniffer routes each container to the right decoder
  *    inside ONE partition-local pass (mixed-format corpora).
  */
class ImageIoSpec extends AnyFunSuite with Matchers with graft.SparkSuiteBase {

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** A 64x48 sinusoidal-texture image: strong low/mid-frequency DCT
    * energy (so pHash's 63 AC signs are DECIDED, not noise — a
    * featureless gradient leaves them near zero and the hash
    * degenerate) with no hard edges to ring under JPEG. The perceptual
    * regime pHash is specified for; the tiny 4..11 px synthesizePpm
    * fixtures exercise decode exactness, not perceptual stability.
    */
  private def textured(id: Long): Media.PpmImage = {
    val w = 64; val h = 48
    val px = new Array[Byte](w * h * 3)
    def v(d: Double): Byte = (128 + 100 * math.sin(d)).toInt.toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        px(i) = v(x * 0.30 + id * 1.0)
        px(i + 1) = v(y * 0.35 + x * 0.10 + id * 0.7)
        px(i + 2) = v((x + y) * 0.20 + id * 1.3)
        x += 1
      }
      y += 1
    }
    Media.PpmImage(w, h, px)
  }

  test("sniffer classifies ppm/png/jpeg/unknown from magic bytes") {
    val img = Media.decodePpm(Media.synthesizePpm(7))
    Media.sniffImageFormat(Media.encodePpm(img)) shouldBe "ppm"
    Media.sniffImageFormat(Media.encodePng(img)) shouldBe "png"
    Media.sniffImageFormat(Media.encodeJpeg(img)) shouldBe "jpeg"
    Media.sniffImageFormat(Array[Byte](1, 2, 3, 4)) shouldBe "unknown"
    an[IllegalArgumentException] should be thrownBy
      Media.decodeImage(Array[Byte](1, 2, 3, 4))
  }

  test("png: encode -> decode round-trips pixels bit-exactly") {
    for (id <- 0L to 20L) {
      val img = Media.decodePpm(Media.synthesizePpm(id))
      val back = Media.decodeImage(Media.encodePng(img))
      back.width shouldBe img.width
      back.height shouldBe img.height
      back.pixels shouldBe img.pixels
    }
    // and on a non-trivial size
    val big = textured(3)
    val back = Media.decodeImage(Media.encodePng(big))
    back.pixels shouldBe big.pixels
  }

  test("png: synthesizePng carries the analytic pixel formula exactly " +
    "(aHash/dHash/pHash identical to the PPM fixture's)") {
    for (id <- 0L to 30L) {
      val ppm = Media.decodePpm(Media.synthesizePpm(id))
      val png = Media.decodeImage(Media.synthesizePng(id))
      Media.aHash64(png) shouldBe Media.aHash64(ppm)
      Media.dHash64(png) shouldBe Media.dHash64(ppm)
      Media.pHash64(png) shouldBe Media.pHash64(ppm)
    }
  }

  test("jpeg: dims and channels survive the lossy container exactly") {
    for (id <- 0L to 10L) {
      val img = Media.decodePpm(Media.synthesizePpm(id))
      val back = Media.decodeImage(Media.encodeJpeg(img))
      back.width shouldBe img.width
      back.height shouldBe img.height
      back.channels shouldBe 3
    }
  }

  test("jpeg: pHash survives recompression at high quality " +
    "(the invariant pHash exists for), two generations deep") {
    // Measured floor in this JVM: worst Hamming 8 even at quality 1.0
    // (the loss is the YCbCr round-trip + chroma handling, not the
    // quantizer — mean drift ~2). The honest invariant is "far below
    // the random-hash expectation of 32, inside the practical near-dup
    // match radius (~10-12 of 64)", NOT the <=3 exact-band guarantee —
    // which is why pHashNearDups verifies candidates with an exact
    // Hamming pass rather than trusting band recall alone.
    var worst1 = 0; var worst2 = 0; var sum1 = 0
    for (id <- 0L to 19L) {
      val img = textured(id)
      val h0 = Media.pHash64(img)
      val gen1 = Media.decodeImage(Media.encodeJpeg(img, 0.95f))
      val d1 = hamming(h0, Media.pHash64(gen1))
      val gen2 = Media.decodeImage(Media.encodeJpeg(gen1, 0.95f))
      val d2 = hamming(h0, Media.pHash64(gen2))
      worst1 = math.max(worst1, d1)
      worst2 = math.max(worst2, d2)
      sum1 += d1
    }
    info(s"worst pHash Hamming drift: gen1=$worst1 gen2=$worst2, " +
      f"mean gen1=${sum1 / 20.0}%.1f (of 64; random ~ 32)")
    worst1 should be <= 12
    worst2 should be <= 12
    (sum1 / 20.0) should be <= 6.0
  }

  test("jpeg: aHash/dHash stay near-stable under one recompression " +
    "on textured content") {
    var worstA = 0; var worstD = 0
    for (id <- 0L to 19L) {
      val img = textured(id)
      val back = Media.decodeImage(Media.encodeJpeg(img, 0.95f))
      worstA = math.max(worstA, hamming(Media.aHash64(img), Media.aHash64(back)))
      worstD = math.max(worstD, hamming(Media.dHash64(img), Media.dHash64(back)))
    }
    info(s"worst aHash drift=$worstA dHash drift=$worstD (of 64)")
    worstA should be <= 4
    worstD should be <= 4
  }

  test("imageHashes/imagePHashes decode a MIXED ppm+png+jpeg column " +
    "in one pass; lossless containers hash identically") {
    import spark.implicits._
    val rows = (0L to 11L).map { id =>
      val fmt = id % 3
      val blob =
        if (fmt == 0) Media.synthesizePpm(id)
        else if (fmt == 1) Media.synthesizePng(id)
        else Media.synthesizeJpeg(id)
      (id, fmt, blob)
    }
    val df = rows.toDF("id", "fmt", "blob")
    val hashed = Media.imageHashes(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    hashed.size shouldBe 12
    for ((id, fmt, _) <- rows if fmt != 2) {
      val ppm = Media.decodePpm(Media.synthesizePpm(id))
      hashed(id) shouldBe ((Media.aHash64(ppm), Media.dHash64(ppm)))
    }
    val ph = Media.imagePHashes(df, "id", "blob").collect()
    ph.length shouldBe 12
  }

  test("Hamming-join routing: radius <= 15 is served lazily by " +
    "multi-index hashing at ANY size (no probe, no refusal); only " +
    "radius >= 16 routes to the measured bounded scan and REFUSES " +
    "past the budget") {
    import spark.implicits._
    val hashes = (0L until 50L).map(i => (i, i * 0x9E3779B97F4A7C15L))
      .toDF("id", "h")
    // radius 12 over the (tiny) brute budget: MIH serves it — no
    // refusal — and the pair set equals brute force
    val (mih, relM) = Media.bandedHammingPairsReleasable(hashes,
      maxHamming = 12, maxBucketSize = 10000, bruteThreshold = 10L)
    val found = try {
      mih.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
        .toMap
    } finally relM()
    val vals = (0L until 50L).map(i => i -> i * 0x9E3779B97F4A7C15L)
    val brute = (for {
      (ia, ha) <- vals; (ib, hb) <- vals if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 12
    } yield (ia, ib) -> d).toMap
    found shouldBe brute
    // radius >= 16 is the only bounded-scan regime: over budget refuses
    val e = intercept[IllegalArgumentException] {
      Media.bandedHammingPairsReleasable(hashes, maxHamming = 16,
        maxBucketSize = 10000, bruteThreshold = 10L)._1.collect()
    }
    e.getMessage should include("bruteThreshold")
    // radius <= 3 never probes or refuses — exact banding at any size
    val (banded, rel) = Media.bandedHammingPairsReleasable(hashes,
      maxHamming = 3, maxBucketSize = 10000, bruteThreshold = 10L)
    try banded.collect() finally rel()
  }

  test("stored pHash screen serves the JPEG-recompression radius " +
    "(maxHamming=12) by probe expansion against an UNCHANGED store: " +
    "planted recompressions pair with their stored originals") {
    import spark.implicits._
    val table = s"mih_store_${System.nanoTime()}"
    val reference = (0L to 14L).map(id => (id, Media.encodePpm(textured(id))))
      .toDF("id", "blob")
    Media.writePHashReference(reference, "id", "blob", table,
      numBuckets = 4)
    try {
      // batch: quality-0.95 JPEG recompressions of stored ids 0..4 plus
      // fresh content that must NOT pair
      val batch = ((0L to 4L).map(id =>
        (100L + id, Media.encodeJpeg(textured(id), 0.95f))) ++
        (200L to 204L).map(id => (id, Media.encodePpm(textured(id + 50)))))
        .toDF("id", "blob")
      val found = Media.pHashNearDupsStored(batch, table, "id", "blob",
        maxHamming = 12)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      // brute-force oracle: every (batch, reference) pair within 12
      val refH = Media.imagePHashes(reference, "id", "blob")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val batchH = Media.imagePHashes(batch, "id", "blob")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val brute = (for {
        (ib, hb) <- batchH; (ir, hr) <- refH
        d = hamming(hb, hr) if d <= 12
      } yield (ib, ir) -> d).toMap
      found shouldBe brute
      for (id <- 0L to 4L)
        assert(found.contains((100L + id, id)),
          s"planted recompression of stored $id not recovered: $found")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${table}_buckets")
  }

  test("pHashNearDups at JPEG-recompression radius (maxHamming=12): " +
    "routed exact-scan recall equals the brute-force pair set, " +
    "planted recompressed copies recovered") {
    import spark.implicits._
    val originals = (0L to 19L).map(id => (id, Media.encodePpm(textured(id))))
    // ids 100.. are quality-0.95 JPEG recompressions of ids 0..4
    val planted = (0L to 4L).map(id =>
      (100L + id, Media.encodeJpeg(textured(id), 0.95f)))
    val df = (originals ++ planted).toDF("id", "blob")
    val found = Media.pHashNearDups(df, "id", "blob", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute-force oracle over the collected hashes
    val hashes = Media.imagePHashes(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = hamming(ha, hb) if d <= 12
    } yield (ia, ib) -> d).toMap
    found shouldBe brute
    // every planted recompression pairs with its original
    for (id <- 0L to 4L) {
      assert(found.contains((id, 100L + id)),
        s"planted recompressed copy of $id not recovered: $found")
    }
  }

  test("imageQualityStats: hand-computed degenerate + two-level cases " +
    "(the curation screen's verdicts, integer-exact stats)") {
    import spark.implicits._
    // constant mid-gray 2x2: zero spread, entropy 0, low_contrast
    val flat = Media.PpmImage(2, 2,
      Array.fill(12)(100.toByte))
    // half black / half white 2x2: max spread, entropy ln 2
    val twoLevel = Media.PpmImage(2, 2,
      (Array.fill(6)(0.toByte) ++ Array.fill(6)(255.toByte)))
    val df = Seq(
      (1L, Media.encodePng(flat)),
      (2L, Media.encodePpm(twoLevel))).toDF("id", "blob")
    val got = Media.imageQualityStats(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap

    val f = got(1L)
    f.getInt(3) shouldBe 300 // gray_min = 3*100
    f.getInt(4) shouldBe 300
    f.getDouble(5) shouldBe 300.0
    f.getDouble(6) shouldBe 0.0 // std
    f.getDouble(7) shouldBe 0.0 // frac_dark (300 >= 77)
    f.getDouble(8) shouldBe 0.0
    f.getDouble(9) shouldBe (0.0 +- 1e-12) // entropy of one bin
    f.getBoolean(10) shouldBe true // range 0 < 100

    val t = got(2L)
    t.getInt(3) shouldBe 0
    t.getInt(4) shouldBe 765
    t.getDouble(5) shouldBe 382.5
    t.getDouble(6) shouldBe 382.5 // half at each extreme
    t.getDouble(7) shouldBe 0.5 // black half < 77
    t.getDouble(8) shouldBe 0.5 // white half > 688
    t.getDouble(9) shouldBe (math.log(2.0) +- 1e-12)
    t.getBoolean(10) shouldBe false
  }

  test("lenient decode: corrupt blobs cost their ROW, never the job " +
    "(truncated PNG, unknown magic, truncated PPM all drop); the " +
    "strict path still fails fast") {
    import spark.implicits._
    val df = Seq(
      (1L, Media.synthesizePng(1)),
      (2L, Media.synthesizePng(2).take(12)), // truncated PNG
      (3L, Array[Byte](9, 9, 9, 9)), // unknown magic
      (4L, Media.synthesizePpm(4).take(6)), // truncated PPM
      (5L, Media.synthesizePpm(5)))
      .toDF("id", "blob")
    val ok = Media.decodeImagesLenient(df, "id", "blob")
      .collect().map(_.getLong(0)).toSet
    ok shouldBe Set(1L, 5L)
    Media.imageHashesLenient(df, "id", "blob")
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 5L)
    // strict semantics unchanged: curated inputs fail fast
    an[Exception] should be thrownBy
      Media.decodeImages(df, "id", "blob").collect()
  }

  test("resizeImages: re-encodes in the source container; resized " +
    "PNG blob round-trips pixel-exact to resizeNearest's raster") {
    import spark.implicits._
    val df = Seq(
      (0L, Media.synthesizePpm(0)),
      (1L, Media.synthesizePng(1)),
      (2L, Media.synthesizeJpeg(2))).toDF("id", "blob")
    val out = Media.resizeImages(df, "id", "blob", 6, 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(0L).getString(1) shouldBe "ppm"
    out(1L).getString(1) shouldBe "png"
    out(2L).getString(1) shouldBe "jpeg"
    out.values.foreach { r =>
      r.getInt(2) shouldBe 6
      r.getInt(3) shouldBe 5
      Media.sniffImageFormat(r.getAs[Array[Byte]](8)) shouldBe
        r.getString(1)
    }
    // PNG output blob decodes back to exactly resizeNearest's pixels
    val want = Media.resizeNearest(
      Media.decodePpm(Media.synthesizePpm(1)), 6, 5)
    Media.decodeImage(out(1L).getAs[Array[Byte]](8)).pixels shouldBe
      want.pixels
  }

  test("ImageIoCodec drives the partition-scoped ImageCodec boundary " +
    "with REAL dims (retiring the fake for JVM-decodable formats)") {
    import spark.implicits._
    val df = (0L to 9L).map(id => (id, Media.synthesizePng(id)))
      .toDF("id", "blob")
    val out = Multimodal.decodeBlobPartitions(df, "id", "blob")
      .collect().map(r => r.id -> r).toMap
    out.size shouldBe 10
    for (id <- 0L to 9L) {
      out(id).width shouldBe (4 + id % 8).toInt
      out(id).height shouldBe (3 + id % 5).toInt
      out(id).channels shouldBe 3
    }
  }
}
