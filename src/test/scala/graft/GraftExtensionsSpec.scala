package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SparkSessionExtensions registration path: the shared test session is
  * built with `spark.sql.extensions=graft.GraftExtensions`, so every engine
  * function must be callable from pure SQL with no registerAll call.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("sketch aggregates are SQL-callable via session extensions") {
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .createOrReplaceTempView("li_ext")
    val row = spark.sql(
      """SELECT
        |  kll_n(kll_agg(l_quantity)) AS n,
        |  round(theta_estimate(theta_agg(l_partkey))) AS parts,
        |  round(hll_estimate(hll_agg(l_orderkey))) AS orders
        |FROM li_ext""".stripMargin).first()
    val exact = spark.sql(
      """SELECT count(l_quantity), count(DISTINCT l_partkey),
        |  count(DISTINCT l_orderkey) FROM li_ext""".stripMargin).first()
    row.getLong(0) shouldBe exact.getLong(0)
    row.getDouble(1) shouldBe exact.getLong(1).toDouble +- exact.getLong(1) * 0.03
    row.getDouble(2) shouldBe exact.getLong(2).toDouble +- exact.getLong(2) * 0.03
  }

  test("splitpoint histogram: pinned counts, SQL-callable, JSON exposure") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1..100: exact sketch, counts are knowable per bin
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val bins = df.agg(graft.functions.kll_agg(col("v")).as("sk"))
      .select(explode(graft.functions.kll_histogram_splits(
        col("sk"), Seq(10.0, 50.0))).as("b"))
      .select(col("b.lo"), col("b.hi"), col("b.count"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    // INCLUSIVE pmf: (-inf,10], (10,50], (50,+inf); edges are min/splits/max
    bins.toSeq shouldBe Seq((1.0, 10.0, 10L), (10.0, 50.0, 40L),
      (50.0, 100.0, 50L))

    val sqlBins = spark.sql(
      """SELECT kll_histogram_splits(kll_agg(v), array(10.0D, 50.0D)) AS h
        |FROM (SELECT CAST(x AS DOUBLE) AS v
        |      FROM (SELECT explode(sequence(1, 100)) AS x))""".stripMargin)
      .selectExpr("h[1].count").first().getLong(0)
    sqlBins shouldBe 40L

    // jsonSummary overload swaps the named column's histogram in place
    import graft.profile.ProfileSession.ProfilingOps
    val prof = df.newProfilingSession().aggProfiles()
    val json = graft.io.ProfileIO.jsonSummary(prof,
      Map("v" -> Seq(10.0, 50.0))).first().getString(0)
    json should include ("\"histogram\":[{\"lo\":1.0,\"hi\":10.0,\"count\":10}")
  }

  test("topk_agg and vec aggregates are SQL-callable via extensions") {
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .createOrReplaceTempView("li_topk")
    val rows = spark.sql(
      """SELECT t.item_id, t.score
        |FROM (SELECT topk_agg(l_extendedprice, l_orderkey, 3) AS topk
        |      FROM li_topk)
        |LATERAL VIEW explode(topk) AS t""".stripMargin).collect()
    rows.length shouldBe 3
    rows.map(_.getDouble(1)).toSeq shouldBe
      rows.map(_.getDouble(1)).sorted.reverse.toSeq
    val vec = spark.sql(
      """SELECT vec_min(a) AS mn, vec_sum(b) AS sm FROM (
        |  SELECT array(3L, 9L) AS a, array(1.0D, 2.0D) AS b
        |  UNION ALL SELECT array(5L, 4L), array(3.0D, 4.0D))""".stripMargin)
      .first()
    vec.getSeq[Long](0) shouldBe Seq(3L, 4L)
    vec.getSeq[Double](1) shouldBe Seq(4.0, 6.0)
  }

  test("profile aggregate and scalar expressions are SQL-callable") {
    val row = spark.sql(
      """SELECT p.count, p.numbers.min, p.inferred_type,
        |  simhash64('hello world') AS sh,
        |  rolling_hash64('hello world') AS rh,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
        |FROM (SELECT graft_profile(l_quantity) AS p
        |      FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`)""".stripMargin)
      .first()
    row.getLong(0) shouldBe 6000L
    row.getDouble(1) shouldBe 1.0
    row.getString(2) shouldBe "FRACTIONAL"
    row.getDouble(5) shouldBe 11.0
  }

  test("hashed_token_score is SQL-callable and matches the API column") {
    val sql = spark.sql(
      "SELECT hashed_token_score('alpha beta gamma', 64) AS s").first()
      .getDouble(0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val api = Seq("alpha beta gamma").toDF("t")
      .select(graft.functions.hashed_token_score(col("t"), 64))
      .first().getDouble(0)
    sql shouldBe api
    sql should (be >= -0.5 and be <= 0.5) // mean of formula weights
  }

  test("proto reader expressions are SQL-callable") {
    import graft.profile.ProfileSession.ProfilingOps
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .newProfilingSession("sql-proto")
      .withTag("env", "test")
      .groupBy("l_returnflag")
      .exportProto()
      .createOrReplaceTempView("proto_ext")
    val rows = spark.sql(
      """SELECT l_returnflag,
        |  proto_column_stats(why_profile, 'l_quantity').count AS n,
        |  proto_tags(why_profile)['whylogs.tag.env'] AS env
        |FROM proto_ext""".stripMargin).collect()
    rows.length shouldBe 3
    rows.map(_.getLong(1)).sum shouldBe 6000L
    all(rows.map(_.getString(2))) shouldBe "test"
  }

  test("easy_datetime is SQL-callable with a pattern literal") {
    val micros = spark.sql(
      "SELECT unix_micros(easy_datetime('2020-12-23', 'yyyy-MM-dd'))")
      .first().getLong(0)
    micros shouldBe java.time.Instant.parse("2020-12-23T00:00:00Z")
      .getEpochSecond * 1000000L
  }

  test("empty-sketch KLL readers return null, not an unboxing NPE") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // kll_agg over zero rows serializes an EMPTY sketch (non-null bytes),
    // so every reader expression must declare itself nullable even when
    // its children are not — otherwise the planner elides the null check
    // and generated code NPEs unboxing the primitive
    val empty = (1 to 5).map(_.toDouble).toDF("v").filter(col("v") < 0)
      .agg(graft.functions.kll_agg(col("v")).as("sk"))
    val row = empty.select(
      graft.functions.kll_quantile(col("sk"), lit(0.5)).as("q"),
      graft.functions.kll_quantiles(col("sk"), array(lit(0.5))).as("qs"),
      graft.functions.kll_rank(col("sk"), lit(1.0)).as("r"),
      graft.functions.kll_histogram(col("sk"), lit(10)).as("h"),
      graft.functions.kll_histogram_splits(col("sk"),
        array(lit(1.0), lit(2.0))).as("hs")).head()
    (0 until row.length).foreach(i => assert(row.isNullAt(i),
      s"field $i should be null for an empty sketch"))
  }
}
