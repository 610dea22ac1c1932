package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** BPE training: hand-computed merges on a fixed corpus, greedy
  * left-to-right merge semantics, early exhaustion, and encode replay.
  */
class TokenizerSpec extends AnyFunSpec with SparkSuiteBase {
  import spark.implicits._

  describe("Tokenizer.wordFreq / pairCounts") {
    it("collapses the corpus to lowercase alphabetic word frequencies") {
      val df = Seq("Low low LOW ab2 x-y", "low ab").toDF("text")
      val wf = Tokenizer.wordFreq(df, "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(wf == Map("low" -> 4, "ab" -> 1))
    }

    it("counts weighted adjacent pairs; single-symbol words contribute none") {
      val words = Seq(("aaab", 3L), ("ab", 2L), ("z", 9L)).toDF("word", "freq")
        .select(Tokenizer.symInit(col("word")).as("sym"), col("freq"))
      val pc = Tokenizer.pairCounts(words)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // aaab: (a,a) twice, (a,b) once, freq 3; ab: (a,b) once, freq 2
      assert(pc == Map(("a", "a") -> 6L, ("a", "b") -> 5L))
    }
  }

  describe("Tokenizer.trainMerges") {
    it("reproduces hand-computed merges with greedy overlap handling") {
      val df = Seq.fill(3)("aaab").union(Seq.fill(2)("ab")).toDF("text")
      val m = Tokenizer.trainMerges(df, "text", 3)
      // step0: (a,a)=6 beats (a,b)=5; aaab -> <aa><a><b> (greedy
      // left-to-right: the SECOND aa pair is consumed by the first)
      // step1: (a,b)=3+2=5 beats (aa,a)=3
      // step2: (aa,ab)=3 is all that remains
      assert(m.map(x => (x.step, x.left, x.right, x.cnt)) ==
        Seq((0, "a", "a", 6L), (1, "a", "b", 5L), (2, "aa", "ab", 3L)))
    }

    it("ties break lexicographically, so training is deterministic") {
      val df = Seq("xy", "ab").toDF("text")
      val m = Tokenizer.trainMerges(df, "text", 1)
      assert(m.map(x => (x.left, x.right)) == Seq(("a", "b")))
    }

    it("stops early when every word is one symbol") {
      val df = Seq("ab", "ab").toDF("text")
      val m = Tokenizer.trainMerges(df, "text", 5)
      assert(m.map(x => (x.step, x.left, x.right, x.cnt)) ==
        Seq((0, "a", "b", 2L)))
    }
  }

  describe("Tokenizer.encodePieceCount") {
    it("replays merges; unmerged chars stay pieces; non-alpha counts 1") {
      val merges = Seq(("a", "a"), ("a", "b"))
      val df = Seq("aaab xq 42", "aaa").toDF("text")
      val got = df.select(Tokenizer.encodePieceCount(col("text"), merges)
        .as("n")).collect().map(_.getLong(0)).toSeq
      // aaab -> <aa><ab> = 2 pieces, xq -> 2, 42 -> 1 piece (non-alpha)
      // aaa -> <aa><a> = 2
      assert(got == Seq(5L, 2L))
    }

    it("with no merges, pieces = characters for alphabetic words") {
      val df = Seq("abc de").toDF("text")
      val got = df.select(Tokenizer.encodePieceCount(col("text"), Nil)
        .as("n")).collect().map(_.getLong(0)).toSeq
      assert(got == Seq(5L))
    }
  }

  describe("merge store") {
    it("write -> encodeWithStored equals direct encode with the " +
        "trained merges") {
      val df = Seq.fill(3)("aaab").union(Seq.fill(2)("ab")).toDF("text")
      val ms = Tokenizer.trainMerges(df, "text", 3)
      Tokenizer.writeMerges(ms, "bpe_store_eq", spark)
      try {
        val docs = Seq((1L, "aaab ab xyz"), (2L, "aaa 42")).toDF("doc_id", "text")
        val stored = Tokenizer.encodeWithStored(docs, "doc_id", "text",
          "bpe_store_eq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val direct = docs.select(col("doc_id"),
          Tokenizer.encodePieceCount(col("text"),
            ms.map(m => (m.left, m.right))).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(stored == direct)
      } finally spark.sql("DROP TABLE IF EXISTS bpe_store_eq")
    }
  }

  describe("oracle generator") {
    it("emits one CTE block per merge and a final union of the steps") {
      val sql = Tokenizer.bpeTrainOracleSql("documents", "text", 3)
      assert(sql.contains("w0 AS"))
      assert(sql.contains("m2 AS"))
      assert(!sql.contains("m3 AS"))
      assert(sql.contains("ORDER BY step"))
    }
  }
}
