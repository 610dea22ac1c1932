package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Exact n-gram contamination: verbatim span overlap must be found, fuzzy
  * similarity must not, and the broadcast plan must never shuffle the
  * training corpus.
  */
class NgramContaminationSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("ngrams: distinct space-joined windows, empty below n tokens") {
    import spark.implicits._
    val got = Seq("a b c d", "a b a b a b", "x y")
      .toDF("t").select(TextOps.ngrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect()
    got(0) shouldBe Seq("a b c", "b c d")
    got(1) shouldBe Seq("a b a", "b a b") // repeats collapse in-row
    got(2) shouldBe Seq.empty // 2 tokens < n=3
  }

  test("verbatim span overlap is found; disjoint text is not") {
    val train = df(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "completely unrelated training text about spark plans here")
    // probe 10 quotes a 6-token span of doc 1 inside new text;
    // probe 11 shares nothing
    val probe = df(
      10L -> "question : quick brown fox jumps over the lazy person",
      11L -> "zeta eta theta iota kappa lambda mu nu xi")
    val got = Dedup.ngramContamination(train, probe, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1 x probe10: shared 5-grams within "quick brown fox jumps over
    // the lazy" = 3 windows
    got should contain theSameElementsAs Seq((1L, 10L, 3L))
  }

  test("minShared gates the pair out") {
    val train = df(1L -> "a b c d e f g h")
    val probe = df(10L -> "a b c d e z z z") // exactly one shared 5-gram
    Dedup.ngramContamination(train, probe, "id", "text", n = 5, minShared = 2)
      .count() shouldBe 0L
    Dedup.ngramContamination(train, probe, "id", "text", n = 5, minShared = 1)
      .count() shouldBe 1L
  }

  test("hashed-gram mode (8-byte broadcast keys) agrees with exact strings") {
    val train = df((0L until 300L).map(i =>
      i -> s"alpha beta g$i gamma delta e$i zeta eta theta shared suffix"): _*)
    val probe = df(
      900L -> "alpha beta g42 gamma delta e42 zeta eta theta shared suffix",
      901L -> "nothing in common with anything at all whatsoever today")
    val exact = Dedup.ngramContamination(train, probe, "id", "text", n = 5)
      .collect().map(_.toSeq).toSet
    val hashed = Dedup.ngramContamination(train, probe, "id", "text", n = 5,
      hashGrams = true).collect().map(_.toSeq).toSet
    hashed shouldBe exact
    exact should not be empty
  }

  test("frequent-line removal: order preserved, all-boilerplate doc " +
    "empties, clean doc untouched") {
    val train = df(
      1L -> "COOKIE BANNER\nreal content one\nNAV BAR",
      2L -> "COOKIE BANNER\nother real text\nNAV BAR",
      3L -> "COOKIE BANNER\nNAV BAR",           // nothing but boilerplate
      4L -> "totally unique document")
    val got = Dedup.removeFrequentLines(train, "id", "text", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    got(1L) shouldBe (("real content one", 2L))
    got(2L) shouldBe (("other real text", 2L))
    got(3L) shouldBe (("", 2L))
    got(4L) shouldBe (("totally unique document", 0L))
    Dedup.frequentLines(train, "text", 2).collect()
      .map(_.getString(0)).toSet shouldBe Set("COOKIE BANNER", "NAV BAR")
  }

  test("duplicatedSpans: repeated windows found with exact doc counts, " +
    "per-doc repeats count once, unique text is silent") {
    val docs = df(
      1L -> "alpha beta gamma delta unique one",
      2L -> "intro words alpha beta gamma delta trailer",
      3L -> "alpha beta gamma delta alpha beta gamma delta", // repeat in-doc
      4L -> "totally different content here now")
    val got = Dedup.duplicatedSpans(docs, "id", "text",
      windowTokens = 4, minDocs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the shared 4-window appears in docs 1,2,3 — doc 3's in-doc repeat
    // must NOT inflate the count
    got("alpha beta gamma delta") shouldBe 3L
    // no window of doc 4 is repeated anywhere
    got.keys.exists(_.contains("totally")) shouldBe false
  }

  test("duplicatedSpans: minDocs gates, and the counting exchange " +
    "carries only hashes (no span text)") {
    val docs = df((0L until 50L).map(i =>
      i -> (s"head$i filler$i " + "shared tail of five words")): _*)
    val spans = Dedup.duplicatedSpans(docs, "id", "text",
      windowTokens = 5, minDocs = 40)
    val rows = spans.collect()
    // only the one window fully inside the shared 5-word tail survives
    rows.map(r => (r.getString(0), r.getLong(1))) shouldBe
      Array(("shared tail of five words", 50L))
    // plan audit: the first (full-corpus) aggregation groups on the two
    // hash columns only — the span string column must not appear in any
    // hashpartitioning clause
    val plan = spans.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "hashpartitioning\\(span".r.findAllIn(plan).isEmpty shouldBe true
  }

  test("broadcast mode: the training side reaches the join without an " +
    "exchange; non-broadcast mode agrees on the answer") {
    val train = df((0L until 200L).map(i =>
      i -> s"doc $i token a$i b$i c$i d$i e$i f$i common tail here"): _*)
    val probe = df(500L -> "doc 7 token a7 b7 c7 d7 e7 f7 common tail here")
    val bc = Dedup.ngramContamination(train, probe, "id", "text", n = 4)
    bc.collect()
    val plan = bc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include("BroadcastHashJoin")
    // the only hash-partitioning exchange is the post-join aggregation on
    // (train_id, probe_id) — the corpus gram stream itself never shuffles
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1

    val shuffled = Dedup.ngramContamination(train, probe, "id", "text",
      n = 4, broadcastProbe = false)
    shuffled.collect().toSet shouldBe bc.collect().toSet
  }

  test("semanticContamination: copies and scaled twins flag at cosine " +
    "1.0, orthogonal and zero vectors never match") {
    import spark.implicits._
    val train = Seq(
      (1L, Array(1f, 0f, 0f)),   // exact eval copy
      (2L, Array(2f, 0f, 0f)),   // scaled twin: cosine 1.0
      (3L, Array(0f, 1f, 0f)),   // orthogonal
      (4L, Array(0f, 0f, 0f)),   // zero vector
      (5L, Array(1f, 1f, 0f)))   // cosine ~0.7071
      .toDF("vec_id", "embedding")
    val eval = Seq((100L, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val flagged = graft.ops.Similarity.semanticContamination(
      train, eval, "vec_id", "embedding", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    flagged.map(_._1).sorted.toSeq shouldBe Seq(1L, 2L)
    all(flagged.map(_._3)) shouldBe 1.0
    // at 0.7: the diagonal joins (rounded 0.707107 >= 0.7)
    graft.ops.Similarity.semanticContamination(
      train, eval, "vec_id", "embedding", threshold = 0.7)
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L, 5L)
  }

  test("semanticDecontaminate drops exactly the flagged rows, payload " +
    "intact") {
    import spark.implicits._
    val train = Seq(
      (1L, Array(1f, 0f), "keepable a"),
      (2L, Array(1f, 0.01f), "leaked"),
      (3L, Array(0f, 1f), "keepable b"))
      .toDF("vec_id", "embedding", "payload")
    val eval = Seq((9L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val kept = graft.ops.Similarity.semanticDecontaminate(
      train, eval, "vec_id", "embedding", threshold = 0.99)
    kept.columns.toSeq shouldBe Seq("vec_id", "embedding", "payload")
    kept.select("vec_id").collect().map(_.getLong(0)).sorted
      .toSeq shouldBe Seq(3L)
  }
}
