package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Published corpus-filter batteries: the Gopher document-quality rules,
  * C4 line/page cleaning, and context-window chunking — hand-computable
  * fixtures pin every rule, and the plans must stay row-local (no
  * exchange anywhere: these run over the full corpus).
  */
class CorpusFilterSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("gopherReport: every rule measured and the verdict combines them") {
    import spark.implicits._
    val good = ((1 to 48).map(i => s"word$i") ++ Seq("the", "of"))
      .mkString(" ") // 50 words, mean length in [3,10], 2 stopwords
    val fixtures = Seq(
      (1L, good),
      (2L, "too short to pass the word count"),
      (3L, ((1 to 50).map(_ => "## #")).mkString(" ")), // symbol storm
      (4L, ((1 to 50).map(i => s"w$i")).mkString(" "))) // no stopwords
      .toDF("id", "text")
    val rep = TextOps.gopherReport(fixtures, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    rep(1L).getAs[Long]("n_words") shouldBe 50L
    rep(1L).getAs[Long]("stop_hits") shouldBe 2L
    rep(1L).getAs[Double]("alpha_frac") shouldBe 1.0
    rep(1L).getAs[Int]("passed") shouldBe 1

    rep(2L).getAs[Int]("passed") shouldBe 0 // word count
    rep(3L).getAs[Double]("hash_ratio") should be > 0.1
    rep(3L).getAs[Double]("ellipsis_ratio") shouldBe 0.0
    rep(3L).getAs[Int]("passed") shouldBe 0
    rep(4L).getAs[Long]("stop_hits") shouldBe 0L
    rep(4L).getAs[Int]("passed") shouldBe 0
  }

  test("gopherReport: bullet and ellipsis line fractions") {
    import spark.implicits._
    // 4 lines: 2 bullets, 1 ellipsis ending
    val doc = Seq((1L, "- first bullet line\n* second bullet\n" +
      "a normal line\ntrailing thought...")).toDF("id", "text")
    val r = TextOps.gopherReport(doc, "id", "text").collect().head
    r.getAs[Double]("bullet_frac") shouldBe 0.5
    r.getAs[Double]("ellipsis_frac") shouldBe 0.25
    // the ellipsis counts into its own per-symbol ratio; no hashes here
    r.getAs[Double]("ellipsis_ratio") should be > 0.0
    r.getAs[Double]("hash_ratio") shouldBe 0.0
  }

  test("stripMarkup: tags to spaces, entity decode order, whitespace " +
    "collapse, newlines survive") {
    import spark.implicits._
    val got = Seq(
      "<p>a<br>b</p>",                 // tag becomes a word break
      "fish &amp; chips",              // amp decodes
      "&amp;lt; stays literal",        // amp LAST: no double decode
      "a  \t b\nline2   c",            // collapse spaces, keep \n
      "&lt;tag&gt; &quot;q&#39;s&quot; x&nbsp;y")
      .toDF("t")
      .select(TextOps.stripMarkup(col("t")).as("s"))
      .collect().map(_.getString(0))
    got(0) shouldBe "a b"
    got(1) shouldBe "fish & chips"
    got(2) shouldBe "&lt; stays literal"
    got(3) shouldBe "a b\nline2 c"
    got(4) shouldBe "<tag> \"q's\" x y"
    Seq("plain no markup").toDF("t")
      .select(TextOps.markupTagCount(col("t")))
      .collect().head.getInt(0) shouldBe 0
    Seq("<a><b attr=1/></a>").toDF("t")
      .select(TextOps.markupTagCount(col("t")))
      .collect().head.getInt(0) shouldBe 3
  }

  test("canonicalizeUrl + urlDedup: host case, query, fragment, and " +
    "trailing slash collapse; unparseable is NULL") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://Example.COM/Path/?utm=1#x"),
      (2L, "https://example.com/Path"),
      (3L, "HTTPS://example.com/Path"),   // scheme case-insensitive
      (4L, "https://example.com/Other"),
      (5L, "not a url"),
      (6L, "ftp://example.com/Path"))     // non-http(s): NULL
      .toDF("id", "url")
    val canon = urls.select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    canon(0) shouldBe "https://example.com/Path"
    canon(1) shouldBe "https://example.com/Path"
    canon(2) shouldBe "https://example.com/Path"
    canon(4) shouldBe null
    canon(5) shouldBe null
    val dedup = TextOps.urlDedup(urls, "id", "url")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    dedup("https://example.com/Path") shouldBe (1L, 3L)
    dedup("https://example.com/Other") shouldBe (4L, 1L)
    dedup.size shouldBe 2
  }

  test("c4Clean: line rules, page rules, totals") {
    import spark.implicits._
    val page =
      "This line has the needed words and punctuation.\n" +
        "short line.\n" + // < 5 words
        "This javascript line would otherwise be kept here.\n" + // banned
        "No terminal punctuation on this line here\n" +
        "Another fine sentence line that survives cleaning!\n" +
        "A third fine sentence line also survives cleanly?"
    val df = Seq(
      (1L, page),
      (2L, "Only one surviving sentence line is not enough."),
      (3L, "A fine line that mentions lorem ipsum stays banned.\n" +
        "Second fine line to go with the banned one above.\n" +
        "Third fine line to go with the banned one above too."))
      .toDF("id", "text")
    val got = TextOps.c4Clean(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    got(1L).getAs[Int]("n_lines_in") shouldBe 6
    got(1L).getAs[Int]("n_lines_kept") shouldBe 3
    got(1L).getAs[Int]("kept") shouldBe 1
    got(1L).getAs[String]("text").split("\n").length shouldBe 3
    got(1L).getAs[String]("text") should not include "javascript"

    got(2L).getAs[Int]("kept") shouldBe 0 // < 3 surviving lines
    got(3L).getAs[Int]("n_lines_kept") shouldBe 3
    got(3L).getAs[Int]("kept") shouldBe 0 // lorem ipsum page rule
  }

  test("contextChunks: sliding windows, partial tail, empty doc") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "x y"))
      .toDF("id", "text")
    val got = TextOps.contextChunks(df, "id", "text",
      windowTokens = 4, strideTokens = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))

    got.filter(_._1 == 1L).sortBy(_._2) shouldBe Seq(
      (1L, 0, "a b c d", 4), (1L, 1, "c d e f", 4),
      (1L, 2, "e f g", 3), (1L, 3, "g", 1))
    // tokens are the NON-EMPTY pieces: empty docs emit no chunks
    got.filter(_._1 == 2L) shouldBe empty
    got.filter(_._1 == 3L) shouldBe Seq((3L, 0, "x y", 2))
  }

  test("dsirWeights: target-like docs outscore off-target docs, empty " +
    "docs score 0, scoring pass is shuffle-free") {
    import spark.implicits._
    val raw = Seq(
      (1L, "aa bb aa bb aa bb"), // pure target vocabulary
      (2L, "zz yy zz yy zz yy"), // pure off-target vocabulary
      (3L, "aa bb zz yy"), // mixed
      (4L, "")).toDF("id", "text")
    val target = Seq((10L, "aa bb aa bb")).toDF("id", "text")
    val got = TextOps.dsirWeights(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    got(1L) should be > got(3L)
    got(3L) should be > got(2L)
    got(4L) shouldBe 0.0
    // hand check doc 1: target counts aa=2/bb=2 (total 4), raw counts
    // aa=4/bb=4 (doc1 x3 + doc3 x1 each; total 16), so every token of
    // doc 1 scores ln((2+1)/(4+4096)) - ln((4+1)/(16+4096)) and the
    // equal aa/bb mix makes the doc mean equal the per-token value
    val perTok = math.log(3.0 / 4100.0) - math.log(5.0 / 4112.0)
    got(1L) shouldBe (perTok +- 1e-12)

    // the SCORING pass is one row-local select over raw — no exchange
    // (the two bounded histogram aggregates run before, at plan-build)
    val scored = TextOps.dsirWeights(raw, target, "id", "text")
    scored.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("redactPii: every match replaced, counts drop to zero, rest " +
    "untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail alice@example.com then visit https://a.b/c?x=1 now"),
      (2L, "call 555-123-4567 or 555.987.6543 today"),
      (3L, "no pii at all here")).toDF("id", "text")
    val red = df.select(col("id"),
      TextOps.redactPii(col("text")).as("r"))
    val got = red.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got(1L) shouldBe "mail [EMAIL] then visit [URL] now"
    got(2L) shouldBe "call [PHONE] or [PHONE] today"
    got(3L) shouldBe "no pii at all here"
    // redacted text carries zero remaining matches
    red.select(TextOps.emailCount(col("r")) + TextOps.urlCount(col("r")) +
      TextOps.phoneCount(col("r"))).collect()
      .foreach(_.getInt(0) shouldBe 0)
    // custom tokens
    df.filter(col("id") === 1L)
      .select(TextOps.redactPii(col("text"), emailToken = "<e>",
        urlToken = "<u>")).head().getString(0) shouldBe
      "mail <e> then visit <u> now"
  }

  test("ngramNovelty: shared text scores below 1, disjoint text exactly 1") {
    import spark.implicits._
    val shared = "one two three four five six seven eight nine ten"
    val reference = Seq((100L, s"ref preamble words go here $shared"))
      .toDF("id", "text")
    val probe = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $shared"), // overlaps
      (2L, "completely different words that the reference never saw" +
        " in any order at all")) // disjoint
      .toDF("id", "text")
    val rep = TextOps.ngramNovelty(probe, reference, "id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    rep(2L)._3 shouldBe 1.0
    rep(1L)._3 should be < 1.0
    rep(1L)._2 should be < rep(1L)._1 // some grams seen
    // a doc shorter than n tokens produces no row
    val short = Seq((3L, "too short")).toDF("id", "text")
    TextOps.ngramNovelty(short, reference, "id", "text", 8)
      .count() shouldBe 0L
  }

  test("truncateNormalize: unit norm, slice semantics, zero-safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0, 4.0, 100.0, 100.0)),
      (2L, Array(0.0, 0.0, 0.0, 0.0))).toDF("id", "e")
    val got = df.select(col("id"),
      Similarity.truncateNormalize(col("e"), 2).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    got(1L)(0) shouldBe (0.6 +- 1e-12) // 3/5: trailing dims ignored
    got(1L)(1) shouldBe (0.8 +- 1e-12)
    got(2L).foreach(_ shouldBe 0.0) // zero vector stays zero
  }

  test("trainHashedLogReg separates planted classes and improves with " +
    "epochs") {
    import spark.implicits._
    // separable vocabulary: positive docs speak goodN, negative badN
    val df = ((0 until 40).map(i =>
      (i.toLong, s"good$i good${i + 1} good${i + 2} good${i + 3}", 1.0)) ++
      (40 until 80).map(i =>
        (i.toLong, s"bad$i bad${i + 1} bad${i + 2} bad${i + 3}", 0.0)))
      .toDF("id", "text", "y")
    def scores(epochs: Int): Map[Long, Double] = {
      val w = TextOps.trainHashedLogReg(df, "text", "y",
        nBuckets = 1024, epochs = epochs, lr = 8.0)
      val bc = spark.sparkContext.broadcast(w)
      TextOps.linearQualityScore(df, "id", "text", 1024, Some(bc))
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    }
    val s5 = scores(5)
    val posMin = (0 until 40).map(i => s5(i.toLong)).min
    val negMax = (40 until 80).map(i => s5(i.toLong)).max
    posMin should be > negMax // fully separated after 5 epochs
    posMin should be > 0.5
    negMax should be < 0.5

    // more epochs reduce the logistic loss (training is actually
    // descending, not just sign-flipping)
    def loss(s: Map[Long, Double]): Double =
      -((0 until 40).map(i => math.log(s(i.toLong))).sum +
        (40 until 80).map(i => math.log(1.0 - s(i.toLong))).sum) / 80.0
    loss(s5) should be < loss(scores(1))

    // deterministic: same inputs, same weights
    TextOps.trainHashedLogReg(df, "text", "y", 1024, 3, 8.0).toSeq shouldBe
      TextOps.trainHashedLogReg(df, "text", "y", 1024, 3, 8.0).toSeq
  }

  test("all four filters are row-local: zero exchanges in the plan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    Seq(
      TextOps.gopherReport(docs, "doc_id", "text"),
      TextOps.c4Clean(docs, "doc_id", "text"),
      TextOps.contextChunks(docs, "doc_id", "text", 64, 32),
      docs.select(TextOps.redactPii(col("text")))
    ).foreach { df =>
      df.queryExecution.executedPlan.toString should not include "Exchange"
    }
  }

  test("blocklistReport: case-folded exact-token hits, ratio verdict, " +
    "empty documents pass") {
    import spark.implicits._
    val df = Seq((1L, "the BAD word and bad again"), (2L, "all clean"),
      (3L, ""), (4L, "badge bad")).toDF("id", "text")
    val got = TextOps.blocklistReport(df, "id", "text", Seq("bad"),
      maxRatio = 0.25)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    got(1L) shouldBe ((6, 2, 2.0 / 6, false))  // 1/3 > 0.25
    got(2L) shouldBe ((2, 0, 0.0, true))
    got(3L) shouldBe ((0, 0, 0.0, true))       // empty passes
    got(4L) shouldBe ((2, 1, 0.5, false))      // "badge" NOT a hit
  }

  test("urlDomainStats: hosts extracted and case-folded; docs counted " +
    "distinct; no-URL docs contribute nothing") {
    import spark.implicits._
    val df = Seq(
      (1L, "x http://A.com/p1 y https://a.com/p2 z"),
      (2L, "see http://b.org/q and http://b.org/r"),
      (3L, "no links here")).toDF("id", "text")
    val got = TextOps.urlDomainStats(df, "id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    got shouldBe Map("a.com" -> ((2L, 1L)), "b.org" -> ((2L, 1L)))
  }
}
