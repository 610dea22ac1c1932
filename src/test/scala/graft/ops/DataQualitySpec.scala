package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Data-quality pre-flight trio: exact join-size forecast,
  * referential integrity, key uniqueness — hand-counted fixtures and
  * the forecast-equals-actual invariant.
  */
class DataQualitySpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("joinSizeEstimate forecasts the EXACT join cardinality, " +
    "many-to-many included; null keys never match") {
    import spark.implicits._
    val l = Seq((Some(1), "a"), (Some(1), "b"), (Some(2), "c"),
      (Some(3), "d"), (Option.empty[Int], "e")).toDF("k", "v")
    val r = Seq((1, "x"), (1, "y"), (1, "z"), (2, "w"), (9, "q"))
      .toDF("k", "w")
    val est = Diagnostics.joinSizeEstimate(l, r, Seq("k"), Seq("k"))
      .collect().head
    est.getLong(0) shouldBe 4L // non-null left rows
    est.getLong(1) shouldBe 5L
    est.getLong(2) shouldBe 3L // left keys 1,2,3
    est.getLong(3) shouldBe 3L // right keys 1,2,9
    est.getLong(4) shouldBe 2L // matched 1,2
    est.getLong(5) shouldBe 7L // 2*3 + 1*1
    // forecast == the actual inner join
    val actual = l.filter(col("k").isNotNull)
      .join(r, Seq("k")).count()
    est.getLong(5) shouldBe (actual: Long)
  }

  test("referentialIntegrity: orphans counted once per child row, " +
    "null FKs tracked separately") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(8L),
      Option.empty[Long]).toDF("fk")
    val r = Validation.referentialIntegrity(child, Seq("fk"),
      parent, Seq("pk")).collect().head
    r.getLong(0) shouldBe 4L  // non-null child rows
    r.getLong(1) shouldBe 2L  // 9, 8
    r.getLong(2) shouldBe 1L  // null FK
    r.getDouble(3) shouldBe (0.5 +- 1e-12)
  }

  test("referentialIntegrity: duplicate parent keys don't multiply " +
    "child rows") {
    import spark.implicits._
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk")
    val child = Seq(1L, 2L, 3L).toDF("fk")
    val r = Validation.referentialIntegrity(child, Seq("fk"),
      parent, Seq("pk")).collect().head
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 1L
  }

  test("uniquenessReport: true PK reports zero dupes; a duplicated " +
    "key is counted with its extra rows") {
    import spark.implicits._
    val pk = Seq((1L, 1), (1L, 2), (2L, 1)).toDF("a", "b")
    val u1 = Validation.uniquenessReport(pk, Seq("a", "b"))
      .collect().head
    u1.getLong(2) shouldBe 0L
    u1.getLong(3) shouldBe 0L
    u1.getDouble(5) shouldBe (0.0 +- 1e-12)
    val u2 = Validation.uniquenessReport(pk, Seq("a")).collect().head
    u2.getLong(0) shouldBe 3L
    u2.getLong(1) shouldBe 2L
    u2.getLong(2) shouldBe 1L  // key 1 duplicated
    u2.getLong(3) shouldBe 1L  // one extra row
    // null key parts route to n_null_rows
    val withNull = Seq(Option(1L), Option.empty[Long]).toDF("a")
    Validation.uniquenessReport(withNull, Seq("a"))
      .collect().head.getLong(4) shouldBe 1L
  }

  test("benford: hand-computed digit profile; sub-1 and null values " +
    "excluded; zero-count digits present") {
    import spark.implicits._
    // digits: 1 (from 1.5, 123, 19), 2 (from 250), 9 (from 9000);
    // 0.5 (sub-1) and null are excluded -> N = 5
    val df = Seq(Some(1.5), Some(123.0), Some(19.0), Some(250.0),
      Some(9000.0), Some(0.5), Option.empty[Double]).toDF("x")
    val rows = Diagnostics.benford(df, "x").collect()
      .map(r => r.getLong(0) -> r).toMap
    rows.keySet shouldBe (1L to 9L).toSet
    rows(1L).getLong(1) shouldBe 3L
    rows(2L).getLong(1) shouldBe 1L
    rows(9L).getLong(1) shouldBe 1L
    rows(3L).getLong(1) shouldBe 0L
    rows(1L).getDouble(2) shouldBe 0.6 +- 1e-9          // share 3/5
    rows(1L).getDouble(3) shouldBe 0.30103 +- 1e-6      // log10(2)
    // chi2 replays: sum over digits of (n - N*e)^2 / (N*e)
    val exp = (1 to 9).map(d => math.log(1.0 + 1.0 / d) / math.log(10))
    val n = Map(1 -> 3.0, 2 -> 1.0, 9 -> 1.0).withDefaultValue(0.0)
    val chi2 = (1 to 9).map { d =>
      val e = 5.0 * exp(d - 1); (n(d) - e) * (n(d) - e) / e
    }.sum
    rows(5L).getDouble(4) shouldBe
      (math.floor(chi2 * 1e6 + 0.5) / 1e6) +- 2e-6
  }

  test("benford: empty input still yields the 9-digit frame") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("x")
    val rows = Diagnostics.benford(empty, "x").collect()
    rows.length shouldBe 9
    rows.map(_.getLong(1)).sum shouldBe 0L
  }

  test("functionalDependencies: holds vs violated, NULL dependent is " +
    "a distinct value") {
    import spark.implicits._
    val df = Seq(
      (1, Some("a")), (1, Some("a")),        // k=1 -> {a} fine
      (2, Some("a")), (2, Some("b")),        // k=2 -> {a,b} violates
      (3, Option.empty[String]), (3, Some("a")), // {NULL,a} violates
      (4, Option.empty[String])              // {NULL} alone fine
    ).toDF("k", "v")
    val r = Diagnostics.functionalDependencies(df, Seq("k" -> "v"))
      .collect().head
    r.getString(0) shouldBe "k"
    r.getString(1) shouldBe "v"
    r.getLong(2) shouldBe 4L  // groups
    r.getLong(3) shouldBe 2L  // k=2 and k=3
    r.getLong(4) shouldBe 4L  // their rows
    r.getBoolean(5) shouldBe false
    // a real dependency over the same frame
    val ok = Diagnostics.functionalDependencies(
      df.withColumn("kk", col("k") * 10), Seq("k" -> "kk"))
      .collect().head
    ok.getBoolean(5) shouldBe true
    // multiple pairs -> one row each, in order
    Diagnostics.functionalDependencies(df,
      Seq("k" -> "v", "v" -> "k")).collect().length shouldBe 2
  }

  test("empty inputs produce clean zero reports") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val est = Diagnostics.joinSizeEstimate(empty, empty,
      Seq("k"), Seq("k")).collect().head
    est.getLong(5) shouldBe 0L
    val u = Validation.uniquenessReport(empty, Seq("k")).collect().head
    u.getLong(0) shouldBe 0L
    u.getDouble(5) shouldBe (0.0 +- 1e-12)
  }

  test("tableChecksum: invariant under row order and partitioning; " +
    "any single-cell change moves the row digest and the touched " +
    "column's digest only") {
    import spark.implicits._
    val df = Seq((1L, "x", "p"), (2L, "y", "q"), (3L, null, "r"))
      .toDF("k", "v", "w")
    def snap(d: org.apache.spark.sql.DataFrame) =
      Diagnostics.tableChecksum(d, Seq("k", "v", "w")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val base = snap(df)
    base("__rows")._1 shouldBe 3L
    snap(df.repartition(7)) shouldBe base
    snap(df.orderBy(col("v").desc_nulls_first)) shouldBe base

    val changed = snap(df.withColumn("w",
      when(col("k") === 2, "Q").otherwise(col("w"))))
    changed("__rows")._2 should not be base("__rows")._2
    changed("w")._2 should not be base("w")._2
    changed("k") shouldBe base("k")
    changed("v") shouldBe base("v")

    // documented sentinel caveat: a literal "<NULL>" string collides
    // with NULL in the per-column digest
    val lit0 = snap(df.withColumn("v",
      coalesce(col("v"), lit("<NULL>"))))
    lit0("v") shouldBe base("v")

    // the decimal(38,0) sum folds back mod P, so every reported
    // checksum is BIGINT-safe on both engines regardless of row count
    // (a LONG sum of sub-P digests would wrap past ~9.2e9 rows)
    val P = 1000000007L
    base.values.foreach { case (_, ck) =>
      ck should be >= 0L
      ck should be < P
    }
  }
}
