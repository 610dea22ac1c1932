package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profile.ProfileSession
import graft.profile.ProfileSession.ProfilingOps

/** End-to-end Spark checks of the profiling engine against exact SQL on the
  * driver-provided sf0.001 tables — the engine-level equivalent of the
  * reference's Spark tests
  * (/root/reference/spark/src/test/scala/com/whylogs/spark/WhyLogsTest.scala:50-153).
  */
class ProfileE2ESpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def lineitem: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("grouped profile matches exact SQL aggregates") {
    val prof = lineitem.newProfilingSession()
      .groupBy("l_returnflag").aggProfiles()
      .select(col("l_returnflag"),
        col("l_quantity.count").as("n"),
        col("l_quantity.numbers.min").as("mn"),
        col("l_quantity.numbers.max").as("mx"),
        col("l_quantity.numbers.sum").as("sm"),
        col("l_quantity.numbers.mean").as("mean"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    val exact = lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"), sum(col("l_quantity")).as("sm"),
        avg(col("l_quantity")).as("mean"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    prof.keySet shouldBe exact.keySet
    for ((k, (n, mn, mx, sm, mean)) <- exact) {
      val (pn, pmn, pmx, psm, pmean) = prof(k)
      pn shouldBe n
      pmn shouldBe mn
      pmx shouldBe mx
      psm shouldBe sm +- math.abs(sm) * 1e-9
      pmean shouldBe mean +- math.abs(mean) * 1e-9
    }
  }

  test("profile is partition-invariant: repartition(7) gives identical exact metrics") {
    def metrics(df: DataFrame): Map[String, Row] =
      df.newProfilingSession().groupBy("l_returnflag").aggProfiles()
        .select(col("l_returnflag"),
          col("l_quantity.count"), col("l_quantity.null_count"),
          col("l_quantity.numbers.min"), col("l_quantity.numbers.max"),
          col("l_extendedprice.numbers.count"),
          col("l_linestatus.strings.count"),
          col("l_linestatus.strings.length.sum"))
        .collect().map(r => r.getString(0) -> r).toMap

    val base = metrics(lineitem)
    val repart = metrics(lineitem.repartition(7))
    base.keySet shouldBe repart.keySet
    for (k <- base.keySet) {
      base(k).toSeq.drop(1) shouldBe repart(k).toSeq.drop(1)
    }
  }

  test("profile merge (re-aggregation) equals direct coarse profile") {
    val fine = lineitem.newProfilingSession()
      .groupBy("l_returnflag", "l_linestatus").aggProfiles()
    val merged = ProfileSession.mergeProfiles(fine, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("l_quantity.count"),
        col("l_quantity.numbers.sum"), col("l_quantity.numbers.min"),
        col("l_quantity.numbers.max"), col("l_quantity.null_count"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

    val direct = lineitem.newProfilingSession()
      .groupBy("l_returnflag").aggProfiles()
      .select(col("l_returnflag"), col("l_quantity.count"),
        col("l_quantity.numbers.sum"), col("l_quantity.numbers.min"),
        col("l_quantity.numbers.max"), col("l_quantity.null_count"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

    merged.keySet shouldBe direct.keySet
    for (k <- merged.keySet) {
      merged(k).head shouldBe direct(k).head // count
      merged(k)(2) shouldBe direct(k)(2) // min
      merged(k)(3) shouldBe direct(k)(3) // max
      merged(k)(1).asInstanceOf[Double] shouldBe
        direct(k)(1).asInstanceOf[Double] +- 1e-6
    }
  }

  test("variance from the profile matches var_samp") {
    val prof = lineitem.newProfilingSession().aggProfiles()
      .select(col("l_extendedprice.numbers.variance")).first().getDouble(0)
    val exact = lineitem.agg(var_samp(col("l_extendedprice"))).first().getDouble(0)
    prof shouldBe exact +- math.abs(exact) * 1e-9
  }

  test("inferred type is INTEGRAL for long columns, STRING for text") {
    val p = lineitem.newProfilingSession().aggProfiles()
      .select(col("l_orderkey.inferred_type"), col("l_linestatus.inferred_type"))
      .first()
    p.getString(0) shouldBe "INTEGRAL"
    p.getString(1) shouldBe "STRING"
  }

  test("quantile grid: KLL median within rank error of the exact median") {
    val q = lineitem.newProfilingSession().aggProfiles()
      .select(col("l_extendedprice.numbers.quantiles")).first()
      .getSeq[Double](0)
    q should have size 9
    val exact = lineitem.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val n = lineitem.count().toDouble
    // KLL k=256 normalized rank error ~1.7%; compare by rank, not value
    val below = lineitem.filter(col("l_extendedprice") <= q(4)).count().toDouble
    (below / n) shouldBe 0.5 +- 0.02
    // min/max endpoints are exact in KLL
    q.head shouldBe lineitem.agg(min(col("l_extendedprice"))).first().getDouble(0).toFloat.toDouble
    q.last shouldBe lineitem.agg(max(col("l_extendedprice"))).first().getDouble(0).toFloat.toDouble +- math.abs(exact) * 1e-6
  }

  test("histogram bins partition the data exactly below sketch capacity") {
    import spark.implicits._
    val values = (1 to 200).map(_.toDouble)
    val hist = values.toDF("v").newProfilingSession().aggProfiles()
      .select(col("v.numbers.histogram")).first()
      .getSeq[Row](0)
    hist.map(_.getLong(2)).sum shouldBe 200L
    // expected: same float split arithmetic as the implementation
    val mn = 1.0f; val mx = 200.0f
    val width = (mx - mn) / 30.0f
    val splits = (1 until 30).map(i => mn + width * i)
    val bounds = (mn +: splits :+ mx).map(_.toDouble)
    val expected = bounds.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      values.count(v => (v.toFloat <= hi) && (i == 0 || v.toFloat > lo)).toLong
    }.toSeq
    hist.map(_.getLong(2)) shouldBe expected
    hist.head.getDouble(0) shouldBe 1.0
    hist.last.getDouble(1) shouldBe 200.0
  }

  test("unique-count summary: estimate with bounds, exact below capacity") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 100).toLong).toDF("v")
    val u = df.newProfilingSession().aggProfiles()
      .select(col("v.numbers.unique")).first().getStruct(0)
    u.getDouble(0) shouldBe 100.0 +- 1e-9 // estimate
    u.getDouble(1) should be <= u.getDouble(0) // lower
    u.getDouble(2) should be >= u.getDouble(0) // upper
  }

  test("string unique + frequent-strings gate (<100 distinct emits)") {
    import spark.implicits._
    val small = (1 to 300).map(i => s"v${i % 7}").toDF("s")
    val smallRow = small.newProfilingSession().aggProfiles()
      .select(col("s.strings.unique.estimate"), col("s.strings.frequent")).first()
    smallRow.getDouble(0) shouldBe 7.0 +- 1e-9
    smallRow.getSeq[Row](1) should have size 7

    val big = (1 to 300).map(i => s"u$i").toDF("s")
    val bigRow = big.newProfilingSession().aggProfiles()
      .select(col("s.strings.unique.estimate"), col("s.strings.frequent")).first()
    bigRow.getDouble(0) shouldBe 300.0 +- 1e-9
    bigRow.isNullAt(1) shouldBe true // gated: >= 100 distinct
  }

  test("wide schema: 300 columns profile in one pass (reference: 608)") {
    import spark.implicits._
    val base = (1 to 200).toDF("v")
    val wide = (1 to 299).foldLeft(base)((df, i) =>
      df.withColumn(s"c$i", col("v") * i))
    val prof = wide.newProfilingSession().aggProfiles()
    prof.columns should have length 300
    val row = prof.select(col("v.count"), col("c1.numbers.sum"),
      col("c299.numbers.max")).first()
    row.getLong(0) shouldBe 200L
    row.getDouble(1) shouldBe (1 to 200).sum.toDouble
    row.getDouble(2) shouldBe 200.0 * 299
  }

  test("wide per-column merge matches the single-level plan's summaries") {
    // the >= 64-column path re-plans the merge tail per column; exact
    // counters must be EXACT and sketch estimates must agree with the
    // single-exchange plan (same data, merge-order-insensitive)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey")
    val wide = li.select((0 until 70).map(i =>
      (col(cols(i % cols.length)) + lit(i)).as(s"c$i")): _*)
    def summarize(df: org.apache.spark.sql.DataFrame) = {
      val row = df.select((0 until 70).flatMap(i => Seq(
        col(s"c$i.count"), col(s"c$i.null_count"),
        col(s"c$i.numbers.min"), col(s"c$i.numbers.max"),
        col(s"c$i.numbers.count"),
        round(col(s"c$i.cardinality.estimate"), 6),
        col(s"c$i.numbers.sum"))): _*).first().toSeq
      // merge ORDER differs between the two plans, so fractional sums
      // agree only to fp-associativity (exact fields stay exact)
      (row.grouped(7).flatMap(_.take(6)).toSeq,
        row.grouped(7).map(_.last.asInstanceOf[Double]).toSeq)
    }
    val (pcExact, pcSums) = summarize(wide.newProfilingSession().aggProfiles())
    spark.conf.set("spark.graft.profile.twoLevelMerge", "false")
    val (slExact, slSums) =
      try summarize(wide.newProfilingSession().aggProfiles())
      finally spark.conf.unset("spark.graft.profile.twoLevelMerge")
    pcExact shouldBe slExact
    pcSums.zip(slSums).foreach { case (a, b) =>
      math.abs(a - b) should be <= 1e-9 * math.max(math.abs(a), 1.0)
    }
  }

  test("zero-row wide profile equals the narrow plan's count=0 structs") {
    // the >= 64-column per-column merge coalesces missing map entries
    // with a driver-built empty-finish literal; it must stay EXACTLY the
    // single-level plan's empty-input finish (count=0 structs, not nulls)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_orderkey")
    val wide = li.filter(lit(false)).select((0 until 70).map(i =>
      (col(cols(i % cols.length)) + lit(i)).as(s"c$i")): _*)
    def firstRow(df: org.apache.spark.sql.DataFrame): Row =
      df.select((0 until 70).flatMap(i => Seq(
        col(s"c$i.count"), col(s"c$i.null_count"),
        col(s"c$i.numbers"), col(s"c$i.inferred_type"),
        col(s"c$i.cardinality.estimate"))): _*).first()
    val pc = firstRow(wide.newProfilingSession().aggProfiles())
    spark.conf.set("spark.graft.profile.twoLevelMerge", "false")
    val sl =
      try firstRow(wide.newProfilingSession().aggProfiles())
      finally spark.conf.unset("spark.graft.profile.twoLevelMerge")
    pc shouldBe sl
    pc.getLong(0) shouldBe 0L // count=0, not null
  }

  test("cardinality estimate is exact for small distinct counts") {
    val p = spark.read.parquet(s"$sfDir/nation.parquet")
      .newProfilingSession().aggProfiles()
      .select(col("n_name.cardinality.estimate")).first().getDouble(0)
    p shouldBe 25.0 +- 0.01
  }

  test("profile state is sketch-bounded: 10x the rows, not 10x the bytes") {
    // BASELINE's headline invariant (reference: ~15 MB profile for 75 GB
    // input): every tracker is a fixed-capacity sketch, so the exported
    // wire profile stops growing once sketches saturate
    def profileBytes(dir: String): Long = {
      val prof = spark.read.parquet(s"$dir/lineitem.parquet")
        .newProfilingSession().aggProfiles()
      graft.io.ProfileIO.withProtoColumn(prof)
        .select(org.apache.spark.sql.functions.length(col("why_profile")))
        .first().getInt(0).toLong
    }
    val small = profileBytes("/root/testdata/sf0.001") // ~6k rows
    val big = profileBytes("/root/testdata/sf0.01") // ~60k rows
    big.toDouble / small.toDouble should be < 3.0 // sub-linear in rows
    big should be < (1L << 20) // whole-table profile stays under 1 MB
  }
}
