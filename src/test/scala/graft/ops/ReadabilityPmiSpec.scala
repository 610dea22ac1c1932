package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Readability battery and PMI collocations: hand-computed fixtures,
  * degenerate inputs, tie-break determinism.
  */
class ReadabilityPmiSpec extends AnyFunSpec with SparkSuiteBase {
  import spark.implicits._

  describe("TextOps.readability") {
    it("matches the hand-computed battery on a two-sentence text") {
      val df = Seq("Hello world. It works!").toDF("text")
      val r = df.select(TextOps.readability(col("text")).as("r"))
        .select("r.*").collect()(0)
      assert(r.getLong(0) == 4L)   // words
      assert(r.getLong(1) == 2L)   // sentences
      assert(r.getLong(2) == 5L)   // syllables (he-llo=2, world=1, it=1, works=1)
      assert(r.getLong(3) == 17L)  // alnum chars
      assert(math.abs(r.getDouble(4) - 99.055) < 1e-9)    // flesch
      assert(math.abs(r.getDouble(5) - (-0.06)) < 1e-9)   // fk_grade
      assert(math.abs(r.getDouble(6) - (-0.4125)) < 1e-9) // ari
    }

    it("floors syllables at one per word (vowelless words)") {
      val df = Seq("tsk pfft").toDF("text")
      val r = df.select(TextOps.readability(col("text")).as("r"))
        .select("r.n_syllables").collect()(0)
      assert(r.getLong(0) == 2L)
    }

    it("empty text: zero words, NULL scores, sentence floor of 1") {
      val r = Seq("").toDF("text")
        .select(TextOps.readability(col("text")).as("r"))
        .select("r.*").collect()(0)
      assert(r.getLong(0) == 0L)
      assert(r.getLong(1) == 1L)
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }

    it("NULL text: every count and score NULL (oracle semantics), " +
      "never size(null) = -1") {
      val r = Seq[Option[String]](None).toDF("text")
        .select(TextOps.readability(col("text")).as("r"))
        .select("r.*").collect()(0)
      (0 until 7).foreach(i => assert(r.isNullAt(i),
        s"field $i should be NULL for NULL text, got ${r.get(i)}"))
    }
  }

  describe("TextOps.encodingProfile") {

    it("hand-computed counts; replacement chars and heavy control " +
      "bytes flag mojibake, tab/CR/LF do not") {
      val rows = Seq(
        ("clean", "Ab1 c\td\n"),                       // formatting only
        ("repl", "ok\uFFFDtext"),                      // failed decode
        ("ctl", "ab" + "\u0001" * 5),                  // 5/7 control
        ("nonascii", "café 中文"))        // accents + CJK
        .toDF("id", "text")
      val got = rows
        .select(col("id"), TextOps.encodingProfile(col("text")).as("p"))
        .select(col("id"), col("p.*"))
        .collect().map(r => r.getString(0) -> r).toMap

      val clean = got("clean")   // "Ab1 c\td\n": 8 chars, all ascii
      assert(clean.getLong(1) == 8L)   // n_chars
      assert(clean.getLong(2) == 8L)   // n_ascii
      assert(clean.getLong(3) == 4L)   // letters A b c d
      assert(clean.getLong(4) == 1L)   // digit 1
      assert(clean.getLong(5) == 3L)   // space, tab, newline
      assert(clean.getLong(6) == 0L)   // tab/LF are NOT control damage
      assert(clean.getLong(7) == 0L)
      assert(clean.getDouble(8) == 0.0)
      assert(!clean.getBoolean(9))

      assert(got("repl").getLong(7) == 1L)
      assert(got("repl").getBoolean(9))
      assert(got("ctl").getLong(6) == 5L)  // 5 * 100 > 7 chars
      assert(got("ctl").getBoolean(9))
      val na = got("nonascii")         // 7 chars, 3 non-ascii
      assert(na.getLong(1) == 7L)
      assert(na.getLong(2) == 4L)
      assert(math.abs(na.getDouble(8) - 3.0 / 7.0) < 1e-12)
      assert(!na.getBoolean(9))
    }

    it("NULL text yields NULL fields; empty text a zero profile") {
      val r = Seq[Option[String]](None, Some("")).toDF("text")
        .select(TextOps.encodingProfile(col("text")).as("p"))
        .select("p.*").collect()
      val nul = r(0); val empty = r(1)
      (0 until 9).foreach(i => assert(nul.isNullAt(i),
        s"field $i should be NULL for NULL text"))
      assert(empty.getLong(0) == 0L)
      assert(empty.getDouble(7) == 0.0)
      assert(!empty.getBoolean(8))
    }
  }

  describe("TextOps.pmiCollocations") {
    val docs = Seq("a b a b", "a c").toDF("text")

    it("matches hand-computed PMI with deterministic tie-break") {
      val got = TextOps.pmiCollocations(docs, "text", minCount = 1, topK = 10)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
      // uni: a=3 b=2 c=1 (N=6); bi: (a,b)=2 (b,a)=1 (a,c)=1 (N=4)
      // pmi(a,b) = pmi(a,c) = ln 3; pmi(b,a) = ln 1.5; ties order by w1,w2
      val ln3 = math.floor(math.log(3.0) * 1e6 + 0.5) / 1e6
      assert(got.map(x => (x._1, x._2, x._3)).toSeq ==
        Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L)))
      assert(math.abs(got(0)._4 - ln3) < 1e-12)
      assert(math.abs(got(1)._4 - ln3) < 1e-12)
    }

    it("minCount filters the bigram table before the joins") {
      val got = TextOps.pmiCollocations(docs, "text", minCount = 2, topK = 10)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq == Seq(("a", "b")))
    }

    it("topK cuts after the rounded-pmi sort") {
      val got = TextOps.pmiCollocations(docs, "text", minCount = 1, topK = 2)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq == Seq(("a", "b"), ("a", "c")))
    }

    it("empty corpus yields an empty result, not an error") {
      val empty = Seq.empty[String].toDF("text")
      assert(TextOps.pmiCollocations(empty, "text", 1, 5).collect().isEmpty)
    }
  }

  describe("plan shape") {
    it("readability is row-local: no exchange in the scoring plan") {
      val df = spark.read.parquet(s"$sfDir/documents.parquet")
      val plan = df.select(TextOps.readability(col("text")).as("r"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
    }
  }
}
