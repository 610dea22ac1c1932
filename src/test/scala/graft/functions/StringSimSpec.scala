package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** [[JaroWinkler]] semantics, pinned to the DuckDB oracle's
  * `jaro_winkler_similarity` (every literal below was probed against
  * DuckDB 1.0 directly, plus a 3000-pair random fuzz with zero
  * mismatches): byte-level comparison, 0.7 boost threshold, prefix
  * cap 4, both-empty = 0.0.
  */
class StringSimSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def jw(a: String, b: String): Double =
    StringSimRuntime.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("classic literature pairs match the DuckDB-probed values") {
    jw("MARTHA", "MARHTA") shouldBe (0.9611111111111111 +- 1e-15)
    jw("DIXON", "DICKSONX") shouldBe (0.8133333333333332 +- 1e-15)
    jw("DWAYNE", "DUANE") shouldBe (0.8400000000000001 +- 1e-15)
    jw("abc", "xyz") shouldBe 0.0
  }

  test("winkler boost applies only above jaro 0.7 (DuckDB-probed)") {
    // jaro('abcdef','abzzzz') = 0.5556 < 0.7: prefix bonus suppressed
    jw("abcdef", "abzzzz") shouldBe (0.5555555555555555 +- 1e-15)
    // jaro('ab','abcdefgh') = 0.75 > 0.7: boosted to 0.8
    jw("ab", "abcdefgh") shouldBe (0.8 +- 1e-15)
  }

  test("prefix bonus caps at 4 shared bytes (DuckDB-probed)") {
    // jaro = 0.8333..., shared prefix 6 but capped: jw = 0.9
    jw("abcdefgh", "abcdefzz") shouldBe (0.9 +- 1e-15)
  }

  test("comparison is byte-level UTF-8, not codepoint-level " +
    "(DuckDB-probed: multibyte e-acute is two unmatched units)") {
    jw("héllo", "hello") shouldBe (0.8400000000000001 +- 1e-15)
  }

  test("empty-side and identity edges follow DuckDB: both-empty 0.0") {
    jw("", "abc") shouldBe 0.0
    jw("", "") shouldBe 0.0
    jw("a", "a") shouldBe 1.0
    jw("a", "b") shouldBe 0.0
  }

  test("column API and SQL registration agree with the runtime; " +
    "NULL input yields NULL") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), (null, "x"))
      .toDF("a", "b")
    val viaCol = df.select(jaro_winkler(col("a"), col("b"))).collect()
    viaCol(0).getDouble(0) shouldBe (0.9611111111111111 +- 1e-15)
    viaCol(1).isNullAt(0) shouldBe true
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA')").collect().head
    viaSql.getDouble(0) shouldBe (0.9611111111111111 +- 1e-15)
  }

  test("nameMatchPairs: planted typos recover through the blocks; " +
    "pairs meet exactly once; prefix mismatches are pruned") {
    import spark.implicits._
    val clean = Seq((1L, "jonathan smith"), (2L, "maria garcia"),
      (3L, "zz")).toDF("id", "key")
    val dirty = Seq((11L, "jonathon smith"), (12L, "maria garcai"),
      (13L, "conathan smith")).toDF("id", "key")
    val got = graft.ops.Joins.nameMatchPairs(clean, dirty, "id", "key",
      minSim = 0.9)
    val pairs = got.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    pairs should contain((1L, 11L))
    pairs should contain((2L, 12L))
    // first-byte mismatch blocks apart (the documented recall dial)
    pairs should not contain ((1L, 13L))
    // no duplicate meetings: output rows equal distinct pairs
    got.count() shouldBe got.dropDuplicates("left_id", "right_id")
      .count()
  }

  test("nameMatchPairsBlocked: external block key pairs within-block " +
    "only; NULL blocks drop") {
    import spark.implicits._
    val l = Seq((1L, "jonathan smith", "90210"),
      (2L, "maria garcia", "10001"),
      (3L, "ann lee", null)).toDF("id", "key", "zip")
    val r = Seq((11L, "jonathon smith", "90210"),
      (12L, "maria garcai", "90210"), // right name, WRONG block
      (13L, "ann lee", null)).toDF("id", "key", "zip")
    val pairs = graft.ops.Joins.nameMatchPairsBlocked(l, r, "id",
      "key", "zip", minSim = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    pairs should contain((1L, 11L))
    pairs should not contain ((2L, 12L)) // blocked apart
    pairs should not contain ((3L, 13L)) // NULL block drops
  }
}
