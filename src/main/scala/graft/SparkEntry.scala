package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.metrics.ProfileConfig
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.profile.ProfileSession.ProfilingOps
import graft.profile.ProfileSession

/** Driver contract: `entry` (smoke), `queries` (operator inventory, each
  * verified against `oracleSql` by DuckDB on the same parquet tables).
  *
  * Naming: q0x profile-engine operators, q1x sketch operators, q2x dataflow
  * / relational, q4x training-data ops (dedup/similarity/text/multimodal),
  * q9x scale demonstrations without SQL oracles (rows-only checks).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
    li.newProfilingSession("flagship")
      .groupBy("l_returnflag")
      .withTimeColumn("l_shipdate", "30 days")
      .aggProfiles()
      .select(col("l_returnflag"), col("window.start").cast("date").as("day"),
        col("l_quantity.count").as("n"),
        col("l_quantity.numbers.mean").as("qty_mean"),
        col("l_extendedprice.numbers.quantiles").as("price_quantiles"),
        col("l_linestatus.frequent_items")(0)("item").as("top_status"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q0x: profiling engine (ColumnProfileAgg / ProfileSession) ----
    "q01_profile_counts" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("qty_nullable",
          when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity")))
      li.newProfilingSession().groupBy("l_returnflag").aggProfiles()
        .select(col("l_returnflag"),
          col("qty_nullable.count").as("n_rows"),
          col("qty_nullable.null_count").as("n_null"),
          (col("qty_nullable.count") - col("qty_nullable.null_count")).as("n_vals"))
    }),

    "q02_profile_numbers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.newProfilingSession().groupBy("l_returnflag").aggProfiles()
        .select(col("l_returnflag"),
          col("l_quantity.numbers.count").as("qty_n"),
          col("l_quantity.numbers.min").as("qty_min"),
          col("l_quantity.numbers.max").as("qty_max"),
          round(col("l_quantity.numbers.sum"), 2).as("qty_sum"),
          round(col("l_quantity.numbers.mean"), 6).as("qty_mean"),
          round(col("l_quantity.numbers.variance"), 6).as("qty_var"),
          round(col("l_extendedprice.numbers.sum"), 2).as("price_sum"),
          round(col("l_extendedprice.numbers.mean"), 4).as("price_mean"))
    }),

    "q03_profile_merge" -> ((s, dir) => {
      // profiles at (flag x status), re-aggregated to flag: merged exact
      // metrics must equal direct computation
      val li = t(s, dir, "lineitem")
      val fine = li.newProfilingSession()
        .groupBy("l_returnflag", "l_linestatus").aggProfiles()
      ProfileSession.mergeProfiles(fine, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          col("l_quantity.count").as("n"),
          col("l_quantity.numbers.min").as("qty_min"),
          col("l_quantity.numbers.max").as("qty_max"),
          round(col("l_quantity.numbers.sum"), 2).as("qty_sum"),
          col("l_quantity.null_count").as("n_null"))
    }),

    "q04_profile_strings" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.newProfilingSession().groupBy("lang").aggProfiles()
        .select(col("lang"),
          col("text.strings.count").as("n_text"),
          col("text.strings.length.min").cast("long").as("len_min"),
          col("text.strings.length.max").cast("long").as("len_max"),
          col("text.strings.length.sum").cast("long").as("len_sum"),
          round(col("text.strings.length.mean"), 6).as("len_mean"),
          col("text.strings.token_length.max").cast("long").as("tok_max"),
          round(col("text.strings.token_length.mean"), 6).as("tok_mean"),
          col("text.inferred_type").as("inferred_type"))
    }),

    "q05_schema_inference" -> ((s, dir) => {
      // dynamically-typed string column: value class depends on row;
      // stringMatching classifies numeric strings (reference
      // WHYLOGS_ENABLE_STRING_MATCHING semantics)
      val li = t(s, dir, "lineitem").withColumn("mixed",
        when(pmod(col("l_linenumber"), lit(3)) === 0, col("l_quantity").cast("string"))
          .when(pmod(col("l_linenumber"), lit(3)) === 1, col("l_linestatus"))
          .otherwise(col("l_orderkey").cast("string")))
      val cfg = ProfileConfig(stringMatching = true)
      li.groupBy("l_returnflag")
        .agg(profile(col("mixed"), cfg).as("p"))
        .select(col("l_returnflag"),
          col("p.type_counts.fractional").as("n_fractional"),
          col("p.type_counts.integral").as("n_integral"),
          col("p.type_counts.string").as("n_string"),
          col("p.inferred_type").as("inferred_type"))
    }),

    "q06_charpos" -> ((s, dir) => {
      val cfg = ProfileConfig(withCharPos = true)
      t(s, dir, "nation")
        .agg(profile(col("n_name"), cfg).as("p"))
        .select(explode(col("p.strings.char_pos")).as(Seq("ch", "m")))
        .select(col("ch"), col("m.count").as("n"),
          col("m.min").cast("long").as("pos_min"),
          col("m.max").cast("long").as("pos_max"),
          col("m.sum").cast("long").as("pos_sum"))
    }),

    "q07_profile_global" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.newProfilingSession().aggProfiles()
        .select(col("o_totalprice.count").as("n"),
          round(col("o_totalprice.numbers.sum"), 2).as("price_sum"),
          // variance here is ~2.07e10: rounding at 4 DECIMALS demanded
          // ~1e-14 relative agreement between a parallel Chan merge and
          // DuckDB's sequential var_samp — one merge-tree change (the
          // r16 update-parallelize rule) flipped the 4th decimal. Round
          // to the nearest hundred instead: 5e-9 relative, ~1000x the
          // float64 parallel-reduction drift, scale-appropriate.
          round(col("o_totalprice.numbers.variance"), -2).as("price_var"),
          col("o_orderstatus.strings.count").as("n_status"),
          col("o_custkey.numbers.long_min").as("cust_min"),
          col("o_custkey.numbers.long_max").as("cust_max"),
          col("o_custkey.numbers.long_sum").as("cust_sum"))
    }),

    "q08_profile_timewindow" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.newProfilingSession().withTimeColumn("l_shipdate", "1 day").aggProfiles()
        .select(col("window.start").cast("date").as("day"),
          col("l_quantity.count").as("n"),
          round(col("l_quantity.numbers.sum"), 2).as("qty_sum"))
    }),

    // ---- q1x: sketch operators (SQL-callable) ----
    "q10_theta_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(theta_estimate(theta_agg(col("l_partkey")))).cast("long")
          .as("n_parts"),
          round(theta_estimate(theta_agg(col("l_suppkey")))).cast("long")
            .as("n_supps"))
        .select(col("l_returnflag"), col("n_parts"), col("n_supps"))
    }),

    "q11_hll_distinct" -> ((s, dir) => {
      t(s, dir, "documents").groupBy(col("lang"))
        .agg(round(hll_estimate(hll_agg(col("source")))).cast("long")
          .as("n_sources"))
    }),

    "q12_freq_items" -> ((s, dir) => {
      val top = freq_items_topk(freq_items_agg(col("o_orderpriority")), lit(1))(0)
      t(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(top.as("top"))
        .select(col("o_orderstatus"), col("top.item").as("item"),
          col("top.estimate").as("estimate"))
    }),

    "q13_kll_quantiles" -> ((s, dir) => {
      t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(round(kll_quantile(kll_agg(col("s_acctbal")), lit(0.25)), 2).as("q25"),
          round(kll_quantile(kll_agg(col("s_acctbal")), lit(0.5)), 2).as("q50"),
          round(kll_quantile(kll_agg(col("s_acctbal")), lit(0.75)), 2).as("q75"),
          kll_n(kll_agg(col("s_acctbal"))).as("n"))
    }),

    "q14_kll_merge" -> ((s, dir) => {
      // two-level KLL: per-(nation,supplier-half) sketches merged to nation;
      // exact because every value is retained below sketch capacity
      val sup = t(s, dir, "supplier")
        .withColumn("half", pmod(col("s_suppkey"), lit(2)))
      sup.groupBy(col("s_nationkey"), col("half"))
        .agg(kll_agg(col("s_acctbal")).as("sk"))
        .groupBy(col("s_nationkey"))
        .agg(round(kll_quantile(kll_merge(col("sk")), lit(0.5)), 2).as("q50"),
          kll_n(kll_merge(col("sk"))).as("n"))
    }),

    "q15_theta_merge" -> ((s, dir) => {
      // theta re-aggregation: per-(flag,status) part sketches unioned to flag
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(theta_agg(col("l_partkey")).as("sk"))
        .groupBy(col("l_returnflag"))
        .agg(round(theta_estimate(theta_merge(col("sk")))).cast("long")
          .as("n_parts"))
    }),

    "q17_kll_rank" -> ((s, dir) => {
      // normalized rank (CDF point) from KLL: exact below sketch capacity
      t(s, dir, "supplier").groupBy(col("s_nationkey"))
        .agg(kll_agg(col("s_acctbal")).as("sk"), count(lit(1)).as("n"))
        .select(col("s_nationkey"), col("n"),
          round(kll_rank(col("sk"), lit(5000.0)), 6).as("rank_5000"))
    }),

    "q18_theta_set_algebra" -> ((s, dir) => {
      // theta set algebra: parts shipped under flag A intersect / minus
      // parts under flag R — exact below sketch capacity
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "A")
        .agg(theta_agg(col("l_partkey")).as("sk_a"))
      val r = li.filter(col("l_returnflag") === "R")
        .agg(theta_agg(col("l_partkey")).as("sk_r"))
      a.crossJoin(r).select(
        round(theta_estimate(theta_intersect(col("sk_a"), col("sk_r"))))
          .cast("long").as("n_both"),
        round(theta_estimate(theta_a_not_b(col("sk_a"), col("sk_r"))))
          .cast("long").as("n_only_a"))
    }),

    "q16_strings_summary" -> ((s, dir) => {
      // string-theta unique counts + the <100-distinct frequent-strings
      // gate: low-cardinality o_orderpriority emits frequent items (top
      // estimate = exact modal count below sketch capacity); the
      // high-cardinality stringified key column is gated to null
      val o = t(s, dir, "orders")
        .withColumn("okey_str", col("o_orderkey").cast("string"))
      o.newProfilingSession().groupBy("o_orderstatus").aggProfiles()
        .select(col("o_orderstatus"),
          round(col("o_orderpriority.strings.unique.estimate")).cast("long")
            .as("n_unique_prio"),
          coalesce(size(col("o_orderpriority.strings.frequent")), lit(-1))
            .as("prio_freq_n"),
          col("o_orderpriority.strings.frequent")(0)("estimate")
            .as("prio_top_estimate"),
          coalesce(size(col("okey_str.strings.frequent")), lit(-1))
            .as("key_freq_n"))
    }),

    // ---- q2x: dataflow / relational ----
    "q20_csv_roundtrip" -> ((s, dir) => {
      // CSV sink + scan (EP3 surface): parquet -> csv -> aggregate
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_csv").toString
      t(s, dir, "nation").write.mode("overwrite")
        .option("header", "true").csv(tmp)
      s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(tmp)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
    }),

    "q21_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q22_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("top_price"))
    }),

    "q23_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    }),

    "q24_dedup_exact" -> ((s, dir) => {
      // duplicate the corpus, dedup on content, counts must match original
      val docs = t(s, dir, "documents")
      val doubled = docs.unionAll(docs)
      Dedup.exact(doubled, "doc_id", Seq("text"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    }),

    "q36_cube_profile" -> ((s, dir) => {
      // grouping sets: the profile aggregate under CUBE — Catalyst's
      // Expand feeds the same ObjectHashAggregate, so rollup hierarchies
      // come for free (SURVEY §2.b "grouping sets work for free")
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(profile(col("l_quantity")).as("p"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("p.count").as("n"),
          round(col("p.numbers.sum"), 2).as("qty_sum"),
          col("p.numbers.min").as("qty_min"))
    }),

    "q33_salted_join" -> ((s, dir) => {
      // skew-resistant equi-join: result must equal the plain join
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_quantity"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      ops.Joins.saltedJoin(li, o, "okey", saltBuckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty_sum"))
    }),

    "q34_range_join" -> ((s, dir) => {
      // band join via range bucketing: equi-join on bucket id + residual
      // filter instead of a nested-loop cross product
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val bands = Seq((1, 900.0, 1100.0), (2, 5000.0, 5500.0),
        (3, 90000.0, 95000.0)).toDF("band_id", "lo", "hi")
      ops.Joins.rangeBucketJoin(li, bands, "l_extendedprice", "lo", "hi",
          bucketWidth = 1000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("price_sum"))
    }),

    "q35_asof_join" -> ((s, dir) => {
      // as-of join: each click enriched with the latest prior view's value
      // per user — union + window, one shuffle on the key
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("value"))
      ops.Joins.asOfJoin(clicks, views, "user_id", "ts", "vts", Seq("value"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("value")).as("n_matched"),
          round(sum(col("value")), 2).as("value_sum"))
    }),

    "q70_asof_bucketed" -> ((s, dir) => {
      // skew-safe as-of join: same semantics as q35, two-pass time-bucketed
      // plan (hot keys spread over (key, hour-bucket) tasks)
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("value"))
      ops.Joins.asOfJoinBucketed(clicks, views, "user_id", "ts", "vts",
          Seq("value"), bucketWidth = 3600.0)
        .agg(count(lit(1)).as("n_clicks"),
          count(col("value")).as("n_matched"),
          round(sum(col("value")), 2).as("value_sum"))
    }),

    "q32_inmemory_scan" -> ((s, dir) => {
      // in-memory source (reference DatasetProfile.track(Map) row API):
      // profile a literal dataset created on the driver
      import s.implicits._
      val df = Seq(
        (1L, Some("a"), 1.5), (2L, Some("b"), 2.5), (3L, Some("a"), 3.5),
        (4L, None, 4.5), (5L, Some("b"), 5.5), (6L, Some("a"), 6.5))
        .toDF("id", "k", "v")
      df.newProfilingSession().aggProfiles()
        .select(col("id.count").as("n"),
          col("k.null_count").as("k_nulls"),
          col("k.type_counts.string").as("k_strings"),
          round(col("v.numbers.sum"), 2).as("v_sum"),
          col("v.numbers.min").as("v_min"),
          col("id.numbers.long_sum").as("id_sum"))
    }),

    "q25_regression_metrics" -> ((s, dir) => {
      t(s, dir, "lineitem").newProfilingSession()
        .withRegressionModel("l_extendedprice", "l_quantity")
        .aggProfiles()
        .select(col("regression_metrics.count").as("n"),
          round(col("regression_metrics.sum_abs_diff"), 2).as("sum_abs"),
          round(col("regression_metrics.mae"), 4).as("mae"),
          round(col("regression_metrics.rmse"), 4).as("rmse"))
    }),

    "q26_confusion_matrix" -> ((s, dir) => {
      t(s, dir, "lineitem").newProfilingSession()
        .withClassificationModel("l_returnflag", "l_linestatus",
          Some("l_discount"))
        .aggProfiles()
        .select(explode(col("classification_metrics.cells")).as("c"))
        .select(col("c.prediction").as("prediction"),
          col("c.target").as("target"),
          col("c.count").as("n"),
          round(col("c.score_sum"), 4).as("score_sum"))
    }),

    "q27_entropy_segmentation" -> ((s, dir) => {
      // entropy-based auto-segmentation scoring (reference's python extra,
      // autosegmentation.py:9-74): normalized entropy of a candidate
      // segment column
      val ev = t(s, dir, "events")
      val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      counts.crossJoin(total).agg(
        lit("event_type").as("column_name"),
        round(lit(-1.0) * sum((col("cnt") / col("total")) *
          log2(col("cnt") / col("total"))), 6).as("entropy"),
        count(lit(1)).as("n_unique"))
    }),

    "q31_autosegmentation" -> ((s, dir) => {
      // estimate_segments greedy loop (autosegmentation.py:77-173): pick
      // segment columns by normalized weighted-entropy gain until the
      // segment budget is exhausted; derived categorical columns give the
      // loop a real two-step choice on events
      import s.implicits._
      val ev = t(s, dir, "events").select(
        col("event_type").as("etype"),
        floor(col("value") / 100).cast("int").cast("string").as("vb"),
        pmod(col("user_id"), lit(4)).cast("string").as("ub"))
      val segs = ops.AutoSegmentation.estimateSegments(ev, Some("etype"))
      segs.zipWithIndex.map { case (c, i) => (i + 1, c) }
        .toDF("pos", "column_name")
    }),

    "q30_csv_date_profile" -> ((s, dir) => {
      // EP3 CLI-profiler surface: CSV scan (all strings) -> EasyDateTime
      // date parsing -> per-date profiles with numeric-string matching;
      // exact metrics recovered from string-typed CSV columns
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_csv_dates").toString
      t(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      graft.io.CsvProfiler.profile(s, tmp,
          dateColumn = Some(("o_orderdate", "yyyy-MM-dd")))
        .select(col("profile_ts").cast("date").as("order_date"),
          col("o_totalprice.count").as("n"),
          round(col("o_totalprice.numbers.sum"), 2).as("price_sum"),
          col("o_totalprice.numbers.min").as("price_min"),
          col("o_totalprice.inferred_type").as("price_type"),
          col("o_orderkey.inferred_type").as("key_type"))
    }),

    "q28_json_summary" -> ((s, dir) => {
      // JSON summary sink (reference cli/Profiler.java:150-168): profile ->
      // one JSON document per row; verified by parsing metrics back out
      val prof = t(s, dir, "lineitem")
        .newProfilingSession().groupBy("l_returnflag").aggProfiles()
      graft.io.ProfileIO.jsonSummary(prof)
        .select(col("l_returnflag"),
          get_json_object(col("summary_json"), "$.l_quantity.count")
            .cast("long").as("n"),
          get_json_object(col("summary_json"), "$.l_quantity.numbers.min")
            .cast("double").as("qty_min"),
          get_json_object(col("summary_json"), "$.l_quantity.numbers.max")
            .cast("double").as("qty_max"),
          round(get_json_object(col("summary_json"), "$.l_quantity.numbers.sum")
            .cast("double"), 2).as("qty_sum"))
    }),

    "q68_sql_surface" -> ((s, dir) => {
      // the SQL registration surface itself, driver-checked: registerAll
      // injects every engine function and the whole query is pure SQL —
      // what a spark-sql-only cluster user would run
      graft.functions.registerAll(s)
      t(s, dir, "supplier").createOrReplaceTempView("q68_supplier")
      s.sql("""SELECT s_nationkey,
        |  kll_n(kll_agg(s_acctbal)) AS n,
        |  CAST(round(theta_estimate(theta_agg(s_suppkey))) AS BIGINT)
        |    AS n_distinct
        |FROM q68_supplier GROUP BY s_nationkey""".stripMargin)
    }),

    "q67_streaming_profile" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // Structured Streaming profiles, driver-checked: event rows feed a
      // MemoryStream (the collect below CONSTRUCTS the fixture-scale
      // stream source; it is not a query-path collect) and the windowed
      // profile aggregation runs as a real streaming query into a memory
      // sink. Day windows over event time must reproduce the batch GROUP
      // BY day answer.
      val evd = t(s, dir, "events").filter(col("user_id") < 50)
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"),
          col("user_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Double)]
      val stream = input.toDF().toDF("us", "user_id", "value")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val profiles = graft.streaming.StreamingProfile.windowedProfiles(
        stream, "ts", "1 day", "1 minute")
      val name = "q67_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = profiles.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        input.addData(rows.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name).select(
        col("window.start").cast("date").as("day"),
        col("value.count").as("n"),
        round(col("value.numbers.sum"), 2).as("val_sum"))
    }),

    "q87_streaming_dedup" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING exact dedup, driver-checked: the event feed replays
      // through a MemoryStream in two time-ordered micro-batches and
      // dropDuplicatesWithinWatermark keeps one state entry per
      // (user_id, event_type) within the horizon. The collect below
      // CONSTRUCTS the fixture-scale stream source; it is not a
      // query-path collect. The final distinct projection makes the
      // result independent of which arrival each key emitted (and of
      // any re-emission after state eviction), so the set of keys is
      // exactly batch DISTINCT — the oracle.
      val evd = t(s, dir, "events").filter(col("user_id") < 50)
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"), col("user_id"),
          col("event_type"))
        .orderBy(col("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val (batch1, batch2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String)]
      val stream = input.toDF().toDF("us", "user_id", "event_type")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val deduped = graft.streaming.StreamingDedup.firstArrivals(
        stream, "ts", Seq("user_id", "event_type"), "1 day")
      val name = "q87_mem_" + java.util.UUID.randomUUID().toString
        .replace("-", "")
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(batch1.toIndexedSeq)
        q.processAllAvailable()
        input.addData(batch2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name).select(col("user_id"), col("event_type")).distinct()
    }),

    "q72_streaming_drift" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // continuous STREAMING drift monitor, driver-checked: the q67
      // MemoryStream fixture feeds StreamingDrift.monitor and every day
      // window is PSI-scored against a STATIC day-1 reference profile as
      // the stream runs — one stateful aggregation, scoring as a pure
      // projection (no stream-static join). The collect below CONSTRUCTS
      // the fixture-scale stream source; it is not a query-path collect.
      // Day windows stay under KLL capacity, so PSI is sketch-exact.
      val evd = t(s, dir, "events").filter(col("user_id") < 50)
      val base = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"), col("value"))
      val rows = base.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val reference = base
        .withColumn("ts", timestamp_micros(col("us")))
        .filter(col("ts").cast("date") === lit("2024-01-01"))
        .select(col("value"))
        .newProfilingSession().aggProfiles()
      val edges = Map("value" -> Seq(10.0, 25.0, 45.0, 90.0))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Double)]
      val stream = input.toDF().toDF("us", "value")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val scored = graft.streaming.StreamingDrift.monitor(
        stream, "ts", "1 day", "1 minute", reference, edges)
      val name = "q72_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = scored.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        input.addData(rows.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name).select(
        col("window.start").cast("date").as("day"),
        round(col("value_psi"), 6).as("psi"))
    }),

    "q66_parquet_sink" -> ((s, dir) => {
      // parquet profile sink round trip: grouped profiles written as
      // typed structs, read back, metrics re-derived from the stored
      // rows — the store half of the re-aggregation story (the merge
      // half is q03/q14/q15)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q66").toString
      t(s, dir, "lineitem").newProfilingSession().groupBy("l_returnflag")
        .aggProfiles().write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp).select(col("l_returnflag"),
        col("l_quantity.count").as("n"),
        col("l_quantity.numbers.min").as("qty_min"),
        col("l_quantity.numbers.max").as("qty_max"),
        round(col("l_quantity.numbers.sum"), 2).as("qty_sum"))
    }),

    "q65_histogram" -> ((s, dir) => {
      // 30-bin equal-width histogram from the profile's KLL sketch. The
      // 1/293 filter keeps each group under sketch-exact capacity (q94's
      // regime) so the inclusive-PMF bin counts are exact, and the FLOAT
      // bin edges (mn + width*i computed in float) replicate in the
      // oracle by stepwise REAL casts.
      t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(293)) === 0)
        .newProfilingSession().groupBy("l_returnflag").aggProfiles()
        .select(col("l_returnflag"),
          posexplode(col("l_extendedprice").getField("numbers")
            .getField("histogram")).as(Seq("bin", "h")))
        .select(col("l_returnflag"), col("bin"),
          round(col("h.lo"), 2).as("lo"), round(col("h.hi"), 2).as("hi"),
          col("h.count").as("cnt"))
    }),

    "q71_histogram_splits" -> ((s, dir) => {
      // caller-supplied splitpoint histogram (SummaryConverters.java:164-221
      // parity): edges are [sketch min] ++ splits ++ [sketch max]; counts
      // from the inclusive PMF, exact under the q65 sketch-exact regime
      t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(293)) === 0)
        .newProfilingSession().groupBy("l_returnflag").aggProfiles()
        .select(col("l_returnflag"),
          posexplode(graft.functions.kll_histogram_splits(
            col("l_extendedprice.numbers.kll"),
            Seq(10000.0, 30000.0, 60000.0))).as(Seq("bin", "h")))
        .select(col("l_returnflag"), col("bin"),
          round(col("h.lo"), 2).as("lo"), round(col("h.hi"), 2).as("hi"),
          col("h.count").as("cnt"))
    }),

    "q64_viewer_counts" -> ((s, dir) => {
      // stored-binary viewer: write grouped profiles as delimited wire
      // binaries (the sink), read them back with the binaryFile-source
      // viewer, and re-derive per-column row counts — driver-checks the
      // store -> view loop end to end (cli/ProfileViewer.java's contract)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q64").toString
      val prof = t(s, dir, "lineitem").newProfilingSession()
        .groupBy("l_returnflag").aggProfiles()
      graft.io.ProfileIO.writeDelimitedBinaries(prof, tmp)
      graft.io.ProfileViewer.view(s, s"$tmp/*.bin")
        .groupBy(col("column_name"))
        .agg(sum(col("profile.count")).as("n"),
          count(lit(1)).as("n_profiles"))
    }),

    "q63_profile_tags" -> ((s, dir) => {
      // session tags (whylogs.tag.* namespace, DatasetProfile.java:43)
      // PLUS the per-row group-key segment tag (reference SegmentTag
      // semantics) ride the exported wire profile and parse back per
      // group — the tag round trip through the export edge
      t(s, dir, "lineitem")
        .newProfilingSession("tagged")
        .withTags(Map("env" -> "prod", "source" -> "lineitem"))
        .groupBy("l_returnflag")
        .exportProto()
        .select(col("l_returnflag"),
          explode(graft.io.ProfileIO.protoTags(col("why_profile")))
            .as(Seq("tag_key", "tag_value")))
    }),

    "q29_proto_roundtrip" -> ((s, dir) => {
      // whylogs wire-format export (DatasetProfileMessage) + reparse: the
      // parsed stats must equal direct SQL — a full write->read round trip
      // through the hand-rolled protobuf codec, per row on executors
      val prof = t(s, dir, "lineitem")
        .newProfilingSession().groupBy("l_returnflag").aggProfiles()
      graft.io.ProfileIO.withProtoColumn(prof)
        .select(col("l_returnflag"),
          graft.io.ProfileIO.protoColumnStats(col("why_profile"), "l_quantity")
            .as("st"))
        .select(col("l_returnflag"),
          col("st.count").as("n"),
          col("st.null_count").as("n_null"),
          col("st.min").as("qty_min"),
          col("st.max").as("qty_max"),
          round(col("st.sum"), 2).as("qty_sum"))
    }),

    // ---- q4x: training-data pipeline ops ----
    "q40_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    "q41_quality_score" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("score"))
    }),

    "q42_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextOps.tokenCount(col("text")).as("n_tok"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).as("tokens"),
          round(avg(col("n_tok")), 4).as("avg_tokens"),
          max(col("n_tok")).as("max_tokens"))
    }),

    "q48_dedup_clusters" -> ((s, dir) => {
      // connected components over a deterministic near-dup graph: 30 docs
      // x 3 mutated generations, chain edges (gen0-gen1, gen1-gen2) plus
      // any jaccard>=0.5 edges — components need transitive closure, and
      // the oracle replicates it with a recursive CTE
      val docs0 = t(s, dir, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id").as("id"), col("text"))
      val gen1 = docs0.select((col("id") + 100000).as("id"),
        concat(col("text"), lit(" mutation suffix")).as("text"))
      val gen2 = docs0.select((col("id") + 200000).as("id"),
        concat(col("text"), lit(" mutation suffix mutation suffix")).as("text"))
      val all = docs0.unionAll(gen1).unionAll(gen2)
      val a = all.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = all.select(col("id").as("id_b"), col("text").as("text_b"))
      // FIXTURE-ONLY edge construction: the crossJoin is deliberately
      // exact (90 docs) so the recursive-CTE oracle can replicate it.
      // The at-scale path for edge generation is Dedup.minHashLshPairs
      // (banded LSH, capped buckets) -> connectedComponents.
      val jaccardEdges = a.crossJoin(b)
        .filter(col("id_a") < col("id_b"))
        .filter(Dedup.ngramJaccard(col("text_a"), col("text_b"), 2) >= 0.5)
        .select(col("id_a"), col("id_b"))
      val chainEdges = docs0.select(col("id").as("id_a"),
          (col("id") + 100000).as("id_b"))
        .unionAll(docs0.select((col("id") + 100000).as("id_a"),
          (col("id") + 200000).as("id_b")))
      val edges = jaccardEdges.unionAll(chainEdges).distinct()
      Dedup.connectedComponents(edges)
        .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
    }),

    // ---- q5x: pipeline utilities (sessionize / sample / outliers /
    //           pii / tf-idf) ----
    "q50_sessionize" -> ((s, dir) => {
      // events.ts is parquet TIMESTAMP_MICROS (read as TIMESTAMP_NTZ);
      // Sessionize's schema dispatch compares it as exact epoch-micro
      // integers, matching the oracle's epoch_us(ts). gap is in micros.
      graft.ops.Sessionize.stats(t(s, dir, "events"), "user_id", "ts",
        gap = 14400L * 1000000L)
    }),

    "q51_sample_bottomk" -> ((s, dir) => {
      graft.ops.Sampling.bottomK(t(s, dir, "events"), Seq("event_type"),
        "event_id", k = 5)
    }),

    "q52_hash_sample" -> ((s, dir) => {
      graft.ops.Sampling.hashSample(t(s, dir, "documents"), "doc_id", 0.1)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q80_cap_per_key" -> ((s, dir) => {
      // per-source document caps (at most 10 docs per source — below the
      // 25/source fixture density so the cap actually bites; survivors
      // = the deterministic bottom-k id-hash sample, full rows kept)
      graft.ops.Sampling.capPerKey(t(s, dir, "documents"),
        Seq("source"), "doc_id", k = 10)
        .select(col("doc_id"), col("source"), col("lang"))
    }),

    "q79_boilerplate_lines" -> ((s, dir) => {
      // CCNet-style line-level dedup over a token-per-line rewrite: the
      // fixture vocabulary is 31 tokens, so >= 400 docs isolates exactly
      // the ubiquitous one — removed from every doc, order preserved
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), " ", "\n").as("text"))
      Dedup.removeFrequentLines(docs, "doc_id", "text", minDocFreq = 400L)
        .select(col("doc_id"),
          regexp_replace(col("text"), "\n", " ").as("text"),
          col("n_removed"))
    }),

    "q78_top_ngram" -> ((s, dir) => {
      // Gopher top-n-gram filter over the q76 planted fixture: the
      // most frequent bigram per doc, its share of all bigram windows
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      TextOps.topNgramStats(docs, "doc_id", "text", n = 2)
        .select(col("doc_id"), col("top_gram"), col("top_count"),
          col("n_windows"), round(col("top_frac"), 6).as("top_frac"))
    }),

    "q77_hash_split" -> ((s, dir) => {
      // deterministic 80/10/10 train/val/test split: label = id-hash
      // range, disjoint + covering by construction, stable at any scale
      graft.ops.Sampling.hashSplit(t(s, dir, "documents"), "doc_id",
        Map("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("lang"), col("split"))
    }),

    "q76_repetition_filter" -> ((s, dir) => {
      // Gopher-style repetition quality filters: docs with doc_id % 5 == 0
      // are self-concatenated (planted boilerplate — every 3-gram
      // duplicated) and the line filter runs over a token-per-line
      // rewrite so both ratios exercise non-trivial values
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      docs.select(col("doc_id"),
        round(TextOps.dupNgramRatio(col("text"), 3), 6)
          .as("dup_3gram_ratio"),
        round(TextOps.dupLineRatio(
          regexp_replace(col("text"), " ", "\n")), 6).as("dup_line_ratio"))
    }),

    "q83_bigram_perplexity" -> ((s, dir) => {
      // interpolated bigram LM quality scoring: adjacency built
      // row-locally (zip_with against the 1-shifted slice), counts
      // floored, scoring joins AQE-sized; lambda dyadic so the score is
      // bit-identical across engines
      graft.ops.TextOps.bigramPerplexity(t(s, dir, "documents"),
        "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"),
          round(col("perplexity"), 6).as("perplexity"))
    }),

    "q81_temperature_mix" -> ((s, dir) => {
      // temperature-weighted source mixing (sampling weight ∝ size^t):
      // small sources keep a higher fraction than bulk sources; the
      // corpus-side filter is map-only, cutoffs ride an AQE-sized join
      graft.ops.Sampling.temperatureMix(t(s, dir, "documents"),
        "doc_id", "source", targetFraction = 0.5, temperature = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q82_token_budget" -> ((s, dir) => {
      // deterministic token-budget selection: the hash-order prefix of
      // docs whose total size fits 100k chars — distributed prefix sum
      // (range repartition + per-partition offsets), never a global
      // single-reducer window
      graft.ops.Sampling.tokenBudgetSelect(t(s, dir, "documents"),
        "doc_id", "n_chars", budget = 100000L)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q75_stratified_sample" -> ((s, dir) => {
      // corpus rebalance: keep 80% of 'en', 30% of 'de', drop everything
      // else — one codegen'd filter, the fraction table a literal map
      graft.ops.Sampling.stratifiedSample(t(s, dir, "documents"),
        "doc_id", "lang", Map("en" -> 0.8, "de" -> 0.3), default = 0.0)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q53_pii_scan" -> ((s, dir) => {
      // synthetic docs carry no PII — plant deterministic emails/urls/
      // phones on id-modulo subsets (the q92 planted-pair trick) so the
      // counts are non-trivial and the oracle replicates the planting
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            lit(" contact alice@example.com or bob.smith@mail.org"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" see https://example.org/data?id=1 or http://foo.bar/x"))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit(" call 555-123-4567 or 555.987.6543")).otherwise(lit("")))
          .as("text"))
      docs.select(col("doc_id"),
          TextOps.emailCount(col("text")).as("n_emails"),
          TextOps.urlCount(col("text")).as("n_urls"),
          TextOps.phoneCount(col("text")).as("n_phones"))
        .filter(col("n_emails") + col("n_urls") + col("n_phones") > 0)
    }),

    "q62_unigram_perplexity" -> ((s, dir) => {
      TextOps.unigramPerplexity(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("perplexity"), 6).as("perplexity"))
    }),

    "q69_drift_monitor" -> ((s, dir) => {
      // continuous drift monitor: every per-nation profile scored against
      // ONE reference profile (the global distribution) — the reference
      // sketch embeds as a literal so scoring is a pure map over the
      // profile frame (no join), the shape that runs unchanged on a
      // Structured Streaming profile stream
      val sup = t(s, dir, "supplier")
      val edges = Seq(0.0, 2500.0, 5000.0, 7500.0)
      val reference = sup.select(col("s_acctbal"))
        .newProfilingSession().aggProfiles()
      val profiles = sup.select(col("s_nationkey"), col("s_acctbal"))
        .newProfilingSession().groupBy("s_nationkey").aggProfiles()
      graft.ops.Drift.againstReference(profiles, reference,
        Map("s_acctbal" -> edges), keep = Seq("s_nationkey"))
        .select(col("s_nationkey"),
          round(col("s_acctbal_psi"), 6).as("psi"))
    }),

    "q61_psi_drift" -> ((s, dir) => {
      // profile-to-profile drift: PSI/KL between the acctbal distribution
      // of two supplier cohorts, computed ONLY from their KLL sketches
      // (exact below capacity) over fixed bin edges — the monitoring query
      // a profile store answers without rescanning data
      val sup = t(s, dir, "supplier")
      val edges = Seq(0.0, 2500.0, 5000.0, 7500.0)
      val sketches = sup
        .withColumn("cohort",
          when(col("s_nationkey") < 12, "old").otherwise("new"))
        .groupBy(col("cohort"))
        .agg(kll_agg(col("s_acctbal")).as("sk"), count(lit(1)).as("n"))
      val a = sketches.filter(col("cohort") === "old")
        .select(col("sk").as("sk_a"), col("n").as("n_a"))
      val b = sketches.filter(col("cohort") === "new")
        .select(col("sk").as("sk_b"), col("n").as("n_b"))
      a.crossJoin(b).select(col("n_a"), col("n_b"),
        round(graft.ops.Drift.psi(col("sk_a"), col("sk_b"), edges), 6)
          .as("psi"),
        round(graft.ops.Drift.klDivergence(col("sk_a"), col("sk_b"), edges), 6)
          .as("kl"))
    }),

    "q128_ks_drift" -> ((s, dir) => {
      // Kolmogorov–Smirnov drift between the same two supplier cohorts
      // as q61, read ONLY from their KLL sketches over a fixed edge
      // grid: max |CDF_a(e) - CDF_b(e)|. Sketch-exact regime (cohorts
      // below KLL capacity), so the oracle recomputes the grid CDFs by
      // counting.
      val sup = t(s, dir, "supplier")
      val edges = Seq(0.0, 2500.0, 5000.0, 7500.0)
      val sketches = sup
        .withColumn("cohort",
          when(col("s_nationkey") < 12, "old").otherwise("new"))
        .groupBy(col("cohort"))
        .agg(kll_agg(col("s_acctbal")).as("sk"), count(lit(1)).as("n"))
      val a = sketches.filter(col("cohort") === "old")
        .select(col("sk").as("sk_a"), col("n").as("n_a"))
      val b = sketches.filter(col("cohort") === "new")
        .select(col("sk").as("sk_b"), col("n").as("n_b"))
      a.crossJoin(b).select(col("n_a"), col("n_b"),
        round(graft.ops.Drift.ks(col("sk_a"), col("sk_b"), edges), 6)
          .as("ks"))
    }),

    "q129_lang_id_trained" -> ((s, dir) => {
      // TRAINED multiclass language ID: one-vs-rest hashed logistic
      // regression (one epoch from zero init => closed-form, so the
      // whole train->predict loop is SQL-oracle-able like q125), then a
      // row-local argmax-scoring pass with the learned weight tables.
      // All K classes train inside ONE bounded <= nBuckets-row
      // aggregate per epoch; scoring is K broadcast expressions, zero
      // shuffle. Multi-epoch accuracy (beating the marker heuristic on
      // held-out docs) is spec-pinned in LangIdTrainedSpec.
      val langs = Seq("de", "en", "es", "fr", "zh")
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"), col("lang"))
      val models = ops.TextOps.trainLangIdOneVsRest(d, "text", "lang",
        langs, nBuckets = 4096, epochs = 1, lr = 1.0)
      ops.TextOps.langIdTrained(d, "doc_id", "text", models,
        nBuckets = 4096)
        .select(Seq(col("doc_id"), col("pred_lang"),
          (col("best_logit") + 0.0).as("best_logit")) ++
          langs.map(l =>
            (round(col(s"logit_$l"), 6) + 0.0).as(s"logit_$l")): _*)
    }),

    "q74_sequence_packing" -> ((s, dir) => {
      // LM training-prep sequence packing: every document's
      // concat-and-chunk layout coordinates (global start offset, pack
      // id, in-pack offset) via the distributed two-pass prefix sum —
      // the oracle is the equivalent single-window SQL cumsum
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      graft.ops.Packing.packSequences(docs, "doc_id", "n_tok",
        "doc_id", budget = 512L)
    }),

    "q73_ngram_contamination" -> ((s, dir) => {
      // EXACT n-gram decontamination: probe = 40 corpus docs behind an
      // added header (verbatim span overlap survives) + 20 char-reversed
      // docs (clean controls — no 8-gram survives reversal). The probe
      // gram stream broadcasts; the training corpus never shuffles.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val probe = docs.filter(col("doc_id") < 40)
        .select(col("doc_id"),
          concat(lit("eval header : "), col("text")).as("text"))
        .unionAll(docs.filter(col("doc_id").between(200, 219))
          .select(col("doc_id"), reverse(col("text")).as("text")))
      Dedup.ngramContamination(docs, probe, "doc_id", "text",
        n = 8, minShared = 3)
    }),

    "q60_contamination" -> ((s, dir) => {
      // train/test decontamination: probe = 40 corpus docs with a tiny
      // suffix (planted contamination). The banded-MinHash candidate
      // stage proposes cross-corpus pairs; the EXACT shingle-Jaccard
      // filter decides, so the output is oracle-checkable against a full
      // exact cross join.
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val probe = corpus.filter(col("doc_id") < 40)
        .select(col("doc_id"),
          concat(col("text"), lit(" contamination tail")).as("text"))
      Dedup.crossCorpusNearDups(corpus, probe, "doc_id", "text",
        threshold = 0.8, numHashes = 64, bands = 16, shingleK = 2)
        .select(col("corpus_id"), col("probe_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    "q59_corpus_heavy_hitters" -> ((s, dir) => {
      // corpus-level heavy hitters: frequent-items sketch over the token
      // stream (vocab 31 << sketch capacity 128 => exact counts); re-sorted
      // (estimate desc, term asc) at the DataFrame level because the
      // sketch's own tie order among equal estimates is unspecified
      val toks = t(s, dir, "documents").select(
        explode(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).as("term"))
      toks.agg(freq_items_topk(freq_items_agg(col("term")), lit(128)).as("tops"))
        .select(explode(col("tops")).as("t"))
        .select(col("t.item").as("term"), col("t.estimate").as("estimate"))
        .orderBy(col("estimate").desc, col("term").asc)
        .limit(10)
    }),

    "q58_embedding_normalize" -> ((s, dir) => {
      // L2 normalization: post-norm == 1 for nonzero vectors, and cosine
      // against the original is 1 (direction preserved) — all scalars so
      // the driver's hasher never sees an array column
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
      emb.select(col("vec_id"),
        round(Similarity.norm(col("embedding")), 6).as("norm_before"),
        round(Similarity.norm(
          Similarity.normalizeL2(col("embedding"))), 6).as("norm_after"),
        round(Similarity.cosine(col("embedding"),
          Similarity.normalizeL2(col("embedding"))), 6).as("direction_cos"))
    }),

    "q56_ppm_decode" -> ((s, dir) => {
      // REAL image decode (PPM/P6 byte-level parse + pixel math). Blobs
      // are synthesized deterministically (test tables carry no media)
      // with analytically-known pixels, so the decoded dims and channel
      // means are exactly oracle-checkable.
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.decodePpmImages(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("channels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
    }),

    "q57_wav_stats" -> ((s, dir) => {
      // REAL audio parse (RIFF/WAV chunk walk + PCM16 RMS), same
      // synthesized-blob oracle pattern as q56
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizeWav(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.wavStats(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("channels"), col("sample_rate"),
          col("n_frames"), col("duration_us"), round(col("rms"), 6).as("rms"))
    }),

    "q55_iqr_outliers" -> ((s, dir) => {
      // 1/293 orderkey filter keeps each group under KLL's exact capacity
      // (same regime as q94) so the sketch-derived quartiles are
      // oracle-exact; above capacity they are rank-error-bounded, which is
      // the 100 TB operating mode.
      graft.ops.Outliers.iqrStats(
        t(s, dir, "lineitem").filter(pmod(col("l_orderkey"), lit(293)) === 0),
        "l_extendedprice", Seq("l_returnflag"))
        .select(col("l_returnflag"), round(col("q1"), 2).as("q1"),
          round(col("q3"), 2).as("q3"), round(col("lo"), 2).as("lo"),
          round(col("hi"), 2).as("hi"), col("n_outliers"), col("n"))
    }),

    "q54_tfidf_topterms" -> ((s, dir) => {
      TextOps.tfIdfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id").as("doc_id"), col("term"),
          round(col("score"), 6).as("score"), col("rank"))
    }),

    "q47_bpeish_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"),
          TextOps.bpeishTokenCount(col("text")).as("n_bpe"),
          TextOps.tokenCount(col("text")).as("n_ws"))
        .groupBy(col("lang"))
        .agg(sum(col("n_bpe")).as("bpe_tokens"),
          sum(col("n_ws")).as("ws_tokens"),
          round(avg(col("n_bpe")), 4).as("avg_bpe"))
    }),

    "q43_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    }),

    "q44_ngram_jaccard" -> ((s, dir) => {
      val a = t(s, dir, "documents").select(col("doc_id").as("id_a"),
        col("text").as("text_a"))
      val b = t(s, dir, "documents").select(col("doc_id").as("id_b"),
        col("text").as("text_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          round(Dedup.ngramJaccard(col("text_a"), col("text_b"), 2), 4)
            .as("jaccard"))
    }),

    "q45_embedding_top1" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("item_id"),
          round(col("cosine"), 6).as("cosine"))
    }),

    "q46_multimodal_stub" -> ((s, dir) => {
      Multimodal.imagePipeline(t(s, dir, "documents"), "text", "doc_id")
    }),

    "q85_substring_dedup" -> ((s, dir) => {
      // exact-substring (repeated 8-token window) detection. Every 20th
      // doc gets a shared 10-word boilerplate tail, so the windows lying
      // fully inside the tail are verbatim-repeated across ~5% of the
      // corpus; junction windows and any natural repeats are counted
      // identically by the oracle. minDocs=3 keeps the output to truly
      // corpus-frequent spans.
      // trim on BOTH sides (here and the oracle): Java split drops
      // trailing empty tokens while DuckDB string_split keeps them, so
      // without the trim the equivalence would silently depend on fixture
      // texts never ending in a space
      val docs = t(s, dir, "documents").select(col("doc_id"),
        trim(when(col("doc_id") % 20 === 0,
          concat(col("text"), lit(" this boilerplate sentence repeats" +
            " verbatim across many documents here")))
          .otherwise(col("text"))).as("text"))
      Dedup.duplicatedSpans(docs, "doc_id", "text",
        windowTokens = 8, minDocs = 3)
    }),

    "q97_char_entropy" -> ((s, dir) => {
      // character-entropy gibberish screen: per-doc codepoint-
      // distribution entropy (single-pass expression, fixed ascending
      // summation order) binned into the low/natural/high quality bands
      t(s, dir, "documents").filter(length(col("text")) > 0)
        .select(col("doc_id"),
          graft.functions.char_entropy(col("text")).as("h"))
        .select(col("doc_id"), round(col("h"), 6).as("entropy"),
          when(col("h") < 2.0, "low").when(col("h") > 4.5, "high")
            .otherwise("natural").as("band"))
    }),

    "q09_weighted_sample" -> ((s, dir) => {
      // soft quality filtering: keep probability = min(1, n_chars/400)
      // per doc — long docs always survive, short ones thin out
      // proportionally; deterministic md5 hash, map-only
      val docs = t(s, dir, "documents")
        .withColumn("w", col("n_chars").cast("double") / 400.0)
      graft.ops.Sampling.weightedSample(docs, "doc_id", "w")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q19_collapse_repeats" -> ((s, dir) => {
      // run-length line dedup (degenerate-generation cleanup): tokens
      // become lines, a tripled "tail" line is planted, and consecutive
      // repeats — planted AND natural — must collapse to one occurrence
      val nl = "\n"
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(regexp_replace(col("text"), " ", nl),
          lit(nl + "tail" + nl + "tail" + nl + "tail")).as("text"))
      docs.select(col("doc_id"),
        TextOps.collapseRepeatedLines(col("text")).as("text"))
        .withColumn("n_lines", size(split(col("text"), nl)))
    }),

    "q39_embedding_quantize" -> ((s, dir) => {
      // int8 embedding quantization: per-vector code stats + max
      // reconstruction error (bounded by scale/2). floor(z+0.5)
      // arithmetic reproduces exactly in the SQL oracle.
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
      val q = emb.select(col("vec_id"), col("embedding"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
      q.select(col("vec_id"),
        round(col("q.qmin"), 6).as("qmin"),
        round(col("q.scale"), 6).as("qscale"),
        size(col("q.codes")).as("n_codes"),
        aggregate(col("q.codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_min(col("q.codes")).as("code_min"),
        array_max(col("q.codes")).as("code_max"),
        round(array_max(zip_with(col("embedding"),
          Similarity.dequantizeInt8(col("q")),
          (o, d) => abs(o.cast("double") - d))), 6).as("max_err"))
    }),

    "q49_best_dedup" -> ((s, dir) => {
      // quality-aware dedup: one winner per (lang, source) cell — the
      // highest quality-score doc, ties to the greatest doc_id. The
      // score is the q41 formula, so the oracle recomputes it exactly.
      val docs = t(s, dir, "documents")
        .withColumn("score", TextOps.qualityScore(col("text")))
      Dedup.exactBest(docs, Seq("lang", "source"), "score", "doc_id")
        .select(col("lang"), col("source"), col("doc_id"), col("score"))
    }),

    "q38_key_skew" -> ((s, dir) => {
      // pre-shuffle skew diagnostic: heaviest event-stream users with
      // exact counts and corpus share — the "do I need a salted join
      // here" report, as one map-side-combined aggregation + bounded
      // top-k (TakeOrderedAndProject)
      graft.ops.Diagnostics.keySkew(t(s, dir, "events"),
        Seq("user_id"), topK = 10)
    }),

    "q37_json_props" -> ((s, dir) => {
      // semi-structured payloads: the event stream's JSON props column
      // parsed in-plan (codegen get_json_object path) and aggregated —
      // the log-enrichment shape of a telemetry/training-feed pipeline
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          round(avg(col("k")), 4).as("k_avg"))
    }),

    "q89_text_normalize" -> ((s, dir) => {
      // ingest text cleanup: every doc gets a noisy suffix — decomposed
      // unicode (e+COMBINING ACUTE, i+COMBINING DIAERESIS), a tab, a BEL
      // control char, double spaces — and normalizeText must compose,
      // strip, collapse and trim it identically to the SQL oracle's
      // nfc_normalize + regexp_replace chain.
      val noisy = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit("  cafe\u0301 \u0007 nai\u0308ve\tx  ")).as("text"))
      noisy.select(col("doc_id"),
        TextOps.normalizeText(col("text")).as("norm_text"))
        .withColumn("n_chars_norm", length(col("norm_text")))
    }),

    "q88_bm25" -> ((s, dir) => {
      // Okapi BM25 retrieval: the first 3 docs' 6-token prefixes are the
      // query set; top-10 docs per query. Ranking uses the 6-decimal
      // rounded score with doc-id tiebreak (deterministic across
      // engines), which is exactly the oracle's row_number ordering.
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            tk => length(tk) > 0), 1, 6), " ").as("qtext"))
      TextOps.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 10)
    }),

    "q86_bloom_decontaminate" -> ((s, dir) => {
      // Bloom-accelerated exact decontamination: every 13th doc's text is
      // the probe set; corpus rows matching a probe text are flagged. The
      // Bloom stage is a prefilter only — the exact confirm join makes
      // the answer identical to a plain semi-join, which is the oracle.
      // An undersized filter (2^16 bits) is deliberate: false positives
      // MUST occur and MUST be removed by the confirm stage.
      val corpus = t(s, dir, "documents")
      val probe = corpus.filter(col("doc_id") % 13 === 0)
      Dedup.bloomSemiJoin(corpus, probe, "text",
        numBits = 1L << 16, numHashFns = 5)
        .select(col("doc_id"), col("lang"))
    }),

    // ---- q9x: scale paths re-shaped to invariant outputs (r17): the
    // raw signatures/candidates are seeded-hash-dependent, so each query
    // emits a quantity with an independent SQL twin instead — planted
    // near-dup recall with the exact Jaccard recomputed from shingle
    // sets (q90), token-multiset fingerprint invariance through the full
    // screen (q91), planted-copy exact top-k under real cell pruning
    // (q93/q98). The scale path itself (banding, bucket join, IVF probe)
    // still executes; only the OUTPUT is the oracle-able invariant. ----
    "q90_minhash_lsh" -> ((s, dir) => {
      // Near-dup recall at provable odds: each source doc with >= 30
      // distinct 2-shingles gets a planted variant (two novel tokens
      // appended -> true Jaccard >= 30/32). A j >= 0.9375 pair misses a
      // 16x4 banding with prob (1 - j^4)^16 <= 7e-11 — and the seeded
      // pipeline is deterministic, so the fixture either recovers all
      // pairs forever or never. The reported jaccard is the EXACT
      // shingle-set value (Dedup.ngramJaccard, the q44 recipe), which
      // DuckDB recomputes independently from the same planting rule —
      // est_jaccard (signature-dependent for j < 1) never leaves the
      // engine.
      val src = t(s, dir, "documents")
        .filter(col("doc_id") < 200 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .withColumn("__toks",
          filter(split(lower(col("text")), " "), t => length(t) > 0))
        .withColumn("__sh", when(size(col("__toks")) >= 2,
            array_distinct(zip_with(
              slice(col("__toks"), lit(1), size(col("__toks")) - 1),
              slice(col("__toks"), lit(2), size(col("__toks")) - 1),
              (a, b) => concat(a, lit(" "), b))))
          .otherwise(array(array_join(col("__toks"), " "))))
        .filter(size(col("__sh")) >= 30)
        .select(col("doc_id"), col("text"))
      val planted = src.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" graftnoisea graftnoiseb")).as("text"))
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionAll(planted)
      Dedup.minHashLshPairs(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleK = 2)
        .filter(col("id_b") === col("id_a") + 200000 && col("id_a") < 200)
        .join(corpus.select(col("doc_id").as("id_a"),
          col("text").as("__ta")), Seq("id_a"))
        .join(corpus.select(col("doc_id").as("id_b"),
          col("text").as("__tb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.ngramJaccard(col("__ta"), col("__tb"), 2), 4)
            .as("jaccard"))
    }),

    "q91_simhash" -> ((s, dir) => {
      // SimHash is a pure function of the TOKEN MULTISET (whitespace-
      // class split, case-folded, every occurrence votes), so a copy
      // with reversed token order, doubled spaces, and a trailing tab
      // MUST fingerprint identically — and the multi-index screen's
      // pigeonhole guarantee makes recall at hamming 0 exact, so every
      // planted pair comes back with hamming exactly 0. Pins (beyond
      // q127's identical-text purity): multiset-not-sequence semantics,
      // whitespace normalization, and screen completeness end-to-end.
      val src = t(s, dir, "documents")
        .filter(col("doc_id") < 60 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val mangled = src.select((col("doc_id") + 300000).as("doc_id"),
        concat(array_join(reverse(filter(split(col("text"), "\\s+"),
            t => length(t) > 0)), "  "), lit("\t")).as("text"))
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionAll(mangled)
      Dedup.simHashNearDups(corpus, "doc_id", "text", maxHamming = 3)
        .filter(col("id_b") === col("id_a") + 300000 && col("id_a") < 60)
        .select(col("id_a").as("doc_id"), col("id_b").as("dup_id"),
          col("hamming"))
    }),

    "q92_embedding_neardups" -> ((s, dir) => {
      // the synthetic embeddings have no near-dup pairs (max pairwise
      // cosine ~0.51), so plant deterministic near-dups: vec_id<50 get a
      // perturbed copy at id+10000. Multi-band LSH must then recover
      // exactly the 50 planted pairs — brute-force oracle-checkable.
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val dups = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.1)).otherwise(x)).as("embedding"))
      Dedup.embeddingNearDups(emb.unionAll(dups), "vec_id", "embedding",
        threshold = 0.95, signBits = 8, bands = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    }),

    "q84_semdedup" -> ((s, dir) => {
      // SemDeDup survivors under exact-copy planting: vec_id<50 get an
      // identical copy at id+10000. Identical vectors share a k-means
      // cell by construction (deterministic assignment), so EVERY copy
      // must be found and dropped (keep-lowest-id) and no original may
      // be falsely dropped (max natural cosine ~0.5 << 0.99) — the
      // result is exactly the original table, independent of the
      // clustering, which makes the approximate op fully oracle-able.
      val emb = t(s, dir, "embeddings")
      val dups = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"),
          col("label"))
      graft.ops.Dedup.semDedupSurvivors(emb.unionAll(dups),
        "vec_id", "embedding", threshold = 0.99, nCentroids = 8)
        .select(col("vec_id"), col("label"))
    }),

    "q93_ivf_ann" -> ((s, dir) => {
      // IVF under REAL pruning (nProbe=3 of 8), oracle-checked: each
      // query vec_id<10 gets three planted near-copies (dim0 + 0.01g at
      // +10000g) whose cosine to the query is ~1 while the natural max
      // is ~0.51 — so the exact top-3 is the copy set, and because a
      // near-identical vector shares its source's nearest centroid, all
      // three live in the first probed cell: pruned IVF must return the
      // exact answer. DuckDB rebuilds the planted corpus with list ops
      // and computes exact cosine top-3; ranks re-derive from the
      // ROUNDED cosine with an id tiebreak on both engines (q108's
      // float-ulp guard).
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val copies = (1 to 3).map { g =>
        emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 10000 * g).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + lit(0.01 * g)).otherwise(x))
              .as("embedding"))
      }.reduce(_ unionAll _)
      val corpus = emb.unionAll(copies)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cosine"), 6).desc, col("item_id"))
      Similarity.ivfTopK(corpus, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 3)
        .select(col("query_id"), col("item_id"),
          (round(col("cosine"), 6) + 0.0).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("long"))
    }),

    "q98_ivfpq_ann" -> ((s, dir) => {
      // IVF-PQ under real pruning with the q93 planted-copy fixture:
      // ADC scores are k-means-code approximations (never SQL-twinned),
      // but the copies' approximate cosine ~1 clears the natural ~0.51
      // ceiling by far more than any PQ distortion, so all three copies
      // survive into the 20-candidate exact re-rank — whose output is
      // the exact top-3 DuckDB computes by brute force. Same rounded-
      // cosine re-rank guard as q93.
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val copies = (1 to 3).map { g =>
        emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 10000 * g).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + lit(0.01 * g)).otherwise(x))
              .as("embedding"))
      }.reduce(_ unionAll _)
      val corpus = emb.unionAll(copies)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cosine"), 6).desc, col("item_id"))
      Similarity.ivfPqTopK(corpus, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 4,
        m = 8, ksub = 16, rerank = 20)
        .select(col("query_id"), col("item_id"),
          (round(col("cosine"), 6) + 0.0).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("long"))
    }),

    "q108_ivf_recall" -> ((s, dir) => {
      // HASH-CHECKED invariant for the ANN family (q93 checks the
      // PRUNED path on a planted fixture; this row checks exhaustive):
      // probing EVERY centroid makes IVF exhaustive, so its top-k must
      // equal exact brute force — which DuckDB CAN compute. Ranks are
      // recomputed on the ROUNDED cosine with an id tiebreak on both
      // engines so float ulps can't flip the order.
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
      val top = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 10, nCentroids = 8, nProbe = 8)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cosine"), 6).desc, col("item_id"))
      top.select(col("query_id"), col("item_id"),
        (round(col("cosine"), 6) + 0.0).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("long"))
    }),

    "q109_ivfpq_recall" -> ((s, dir) => {
      // HASH-CHECKED recall row for IVF-PQ (q98 checks real pruning
      // on a planted fixture; this row checks the lossless regime): with a
      // full probe and a re-rank bound past the corpus size, the exact
      // re-rank re-scores EVERY candidate, so recall vs brute force is
      // 1.0 regardless of quantization error — pinning the
      // train/encode/ADC/re-rank plumbing end-to-end through the
      // recallAtK helper the tuning loop uses.
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val pq = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 10, nCentroids = 8, nProbe = 8, m = 8, ksub = 16,
        rerank = 4096)
      val brute = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 10)
      Similarity.recallAtK(pq, brute)
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          col("recall"))
    }),

    "q110_auto_join" -> ((s, dir) => {
      // skew-probe-routed equi-join on the driver board: half the events
      // collapse onto key 0 (top-key share ~0.5, far past the 0.05
      // threshold), so the probe measurably routes through the SALTED
      // plan — and the oracle is the PLAIN join, proving the salted
      // rewrite is answer-identical. JoinsSpec pins that this regime
      // takes the salt path; this query pins that the path is correct.
      val ev = t(s, dir, "events").select(
        when(col("user_id") % 2 === 0, lit(0L))
          .otherwise(col("user_id")).as("k"),
        col("value"))
      val dim = ev.select(col("k")).distinct()
        .select(col("k"),
          concat(lit("g"), pmod(col("k"), lit(7))).as("label"))
      ops.Joins.autoJoin(ev, dim, "k", saltBuckets = 8,
        skewThreshold = 0.05)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("value")), 2) + 0.0).as("value_sum"))
    }),

    "q111_gopher_quality" -> ((s, dir) => {
      // the published Gopher quality battery over the corpus; the
      // fixture vocabulary carries only 'the', so stopwords / symbol
      // storms / bullet+ellipsis lines are planted deterministically to
      // exercise every measured rule on both engines
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" of and that"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit(" ## ## ## ##"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\n- a bullet line here\nmore trailing thought..."))
            .otherwise(lit(""))).as("text"))
      ops.TextOps.gopherReport(d, "doc_id", "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("hash_ratio"), col("ellipsis_ratio"), col("bullet_frac"),
          col("ellipsis_frac"), col("alpha_frac"), col("stop_hits"),
          col("passed"))
    }),

    "q112_c4_clean" -> ((s, dir) => {
      // C4 line/page cleaning over a deterministic multi-line rewrite of
      // the corpus: 8-token lines where (doc_id + line) % 3 == 0 drops
      // terminal punctuation, % 7 == 0 plants javascript, and doc-level
      // plants add curly-brace / lorem-ipsum page violations
      val toks = split(col("text"), " ")
      val starts = sequence(lit(1), size(toks), lit(8))
      val lines = transform(starts, i => {
        val li = (i - 1) / 8
        val base = array_join(slice(toks, i, lit(8)), " ")
        concat(base,
          when((col("doc_id") + li) % 7 === 0, lit(" javascript."))
            .otherwise(when((col("doc_id") + li) % 3 === 0, lit(""))
              .otherwise(lit("."))))
      })
      val d = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), concat(array_join(lines, "\n"),
          when(col("doc_id") % 11 === 0,
            lit("\nbrace { line with enough words here."))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit("\nlorem ipsum dolor sit amet line."))
            .otherwise(lit(""))).as("text"))
      ops.TextOps.c4Clean(d, "doc_id", "text")
        .select(col("doc_id"), col("text"),
          col("n_lines_in").cast("long").as("n_lines_in"),
          col("n_lines_kept").cast("long").as("n_lines_kept"),
          col("kept"))
    }),

    "q113_context_chunks" -> ((s, dir) => {
      // sliding context-window chunking: 32-token windows every 24
      // tokens (overlap 8), partial tails kept
      val d = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      ops.TextOps.contextChunks(d, "doc_id", "text",
        windowTokens = 32, strideTokens = 24)
        .select(col("doc_id"),
          col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"),
          col("n_tokens").cast("long").as("n_tokens"))
    }),

    "q114_categorical_drift" -> ((s, dir) => {
      // categorical PSI from frequent-items sketches: event_type shares
      // of two user cohorts, computed purely from the sketches (exact
      // regime: the fixture's category count is far below sketch
      // capacity). One aggregate, then a scalar expression.
      val ev = t(s, dir, "events").select(col("event_type"),
        (col("user_id") % 2 === 0).as("is_a"))
      ev.agg(
        graft.functions.freq_items_agg(
          when(col("is_a"), col("event_type"))).as("sk_a"),
        graft.functions.freq_items_agg(
          when(!col("is_a"), col("event_type"))).as("sk_b"))
        .select(
          ops.Drift.categoricalTotal(col("sk_a")).as("n_a"),
          ops.Drift.categoricalTotal(col("sk_b")).as("n_b"),
          (round(ops.Drift.categoricalPsi(col("sk_a"), col("sk_b")), 6)
            + 0.0).as("psi"))
    }),

    "q115_dsir_weights" -> ((s, dir) => {
      // DSIR importance weights: every raw doc scored by how 'en'-like
      // its hashed-unigram distribution is (add-one smoothed log
      // ratios over 4096 hashing-trick buckets; two bounded histogram
      // aggregates + one broadcast + a row-local scoring pass)
      val raw = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"), col("lang"))
      val target = raw.filter(col("lang") === "en")
      ops.TextOps.dsirWeights(raw, target, "doc_id", "text")
        .select(col("doc_id"),
          (round(col("logratio"), 6) + 0.0).as("logratio"))
    }),

    "q116_pii_redact" -> ((s, dir) => {
      // PII redaction — the action to q53's counting triage, on the
      // same deterministic planting; n_redacted counts on the ORIGINAL
      // text, the redacted text must carry zero remaining matches
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            lit(" contact alice@example.com or bob.smith@mail.org"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" see https://example.org/data?id=1 or http://foo.bar/x"))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit(" call 555-123-4567 or 555.987.6543")).otherwise(lit("")))
          .as("text"))
        .filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0 ||
          col("doc_id") % 13 === 0)
      docs.select(col("doc_id"),
        TextOps.redactPii(col("text")).as("text"),
        (TextOps.emailCount(col("text")) + TextOps.urlCount(col("text")) +
          TextOps.phoneCount(col("text"))).cast("long").as("n_redacted"))
    }),

    "q117_schema_drift" -> ((s, dir) => {
      // schema drift between two stored dataset profiles: cohort B
      // retypes l_quantity to string, plants 20% nulls in l_linestatus,
      // drops l_linenumber and adds l_tax — the report must surface
      // exactly those changes from the profile rows alone. Low-
      // cardinality columns keep the HLL distinct estimates exact, so
      // the whole report is SQL-oracle-able.
      val li = t(s, dir, "lineitem")
      val a = li.select(col("l_quantity"), col("l_linestatus"),
        col("l_linenumber")).newProfilingSession().aggProfiles()
      val b = li.select(
        col("l_quantity").cast("string").as("l_quantity"),
        when(col("l_linenumber") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("l_linestatus")).as("l_linestatus"),
        col("l_tax")).newProfilingSession().aggProfiles()
      ops.Drift.schemaDrift(a, b)
        .select(col("column").as("col_name"), col("present_a"),
          col("present_b"), col("type_a"), col("type_b"),
          col("type_changed"), round(col("null_frac_a"), 6).as("null_frac_a"),
          round(col("null_frac_b"), 6).as("null_frac_b"),
          round(col("null_frac_delta"), 6).as("null_frac_delta"),
          col("card_a"), col("card_b"))
    }),

    "q143_embedding_drift" -> ((s, dir) => {
      // embedding-space drift between two label cohorts: each side is
      // ONE map-side-combined aggregate (vector sum + count + norm
      // sum); all metrics are scalar array math on the two 1-row
      // results — vectors never shuffle
      val emb = t(s, dir, "embeddings")
      val cur = emb.filter(col("label") >= 5)
      val ref = emb.filter(col("label") < 5)
      ops.Drift.embeddingDrift(cur, ref, "embedding").select(
        col("n_cur"), col("n_ref"),
        (round(col("mean_cosine"), 6) + 0.0).as("mean_cosine"),
        (round(col("mean_l2_shift"), 6) + 0.0).as("mean_l2_shift"),
        (round(col("norm_mean_cur"), 6) + 0.0).as("norm_mean_cur"),
        (round(col("norm_mean_ref"), 6) + 0.0).as("norm_mean_ref"))
    }),

    "q144_embedding_drift_dim" -> ((s, dir) => {
      // per-dimension drill-down of q143: where the representation
      // moved — 64 rows from the same single-aggregate-per-side shape
      val emb = t(s, dir, "embeddings")
      ops.Drift.embeddingDriftByDim(
        emb.filter(col("label") >= 5), emb.filter(col("label") < 5),
        "embedding").select(col("dim"),
        (round(col("mean_cur"), 6) + 0.0).as("mean_cur"),
        (round(col("mean_ref"), 6) + 0.0).as("mean_ref"),
        (round(col("shift"), 6) + 0.0).as("shift"))
    }),

    "q118_jsd_drift" -> ((s, dir) => {
      // Jensen-Shannon drift, numeric (KLL-rank bins over supplier
      // cohorts, the q61 shape) and categorical (event-type shares of
      // two user cohorts from frequent-items sketches) in one row —
      // both scalar expressions over sketch state
      val sup = t(s, dir, "supplier").select(
        when(col("s_nationkey") < 12, lit("old")).otherwise(lit("new"))
          .as("cohort"), col("s_acctbal").cast("float").as("v"))
      val numSk = sup.agg(
        graft.functions.kll_agg(when(col("cohort") === "old", col("v")))
          .as("sk_old"),
        graft.functions.kll_agg(when(col("cohort") === "new", col("v")))
          .as("sk_new"))
      val edges = Seq(0.0, 2500.0, 5000.0, 7500.0)
      val ev = t(s, dir, "events").select(col("event_type"),
        (col("user_id") % 2 === 0).as("is_a"))
      val catSk = ev.agg(
        graft.functions.freq_items_agg(
          when(col("is_a"), col("event_type"))).as("sk_a"),
        graft.functions.freq_items_agg(
          when(!col("is_a"), col("event_type"))).as("sk_b"))
      numSk.crossJoin(catSk).select(
        (round(ops.Drift.jsd(col("sk_old"), col("sk_new"), edges), 6)
          + 0.0).as("jsd_num"),
        (round(ops.Drift.categoricalJsd(col("sk_a"), col("sk_b")), 6)
          + 0.0).as("jsd_cat"))
    }),

    "q119_ppm_resize" -> ((s, dir) => {
      // REAL pixel transform: decode -> nearest-neighbor resize to 8x4
      // -> re-encode, on the q56 synthesized PPMs whose pixels are
      // affine in (id, x, y) — so the resized means are analytically
      // oracle-able (source coords sx = x*w/8, sy = y*h/4, int div)
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.resizePpmImages(blobs, "doc_id", "blob", 8, 4)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"), col("n_bytes"))
    }),

    "q120_wav_windows" -> ((s, dir) => {
      // frame-level audio features: 200-frame windowed RMS over the q57
      // synthesized PCM16 fixtures (sample_i analytic, so every
      // window's energy is exactly oracle-able; final window partial)
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizeWav(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.wavWindowRms(blobs, "doc_id", "blob",
        windowFrames = 200)
        .select(col("id").as("doc_id"),
          col("window_idx").cast("long").as("window_idx"),
          col("n_frames").cast("long").as("n_frames"),
          round(col("rms"), 6).as("rms"))
    }),

    "q130_wav_zcr_peak" -> ((s, dir) => {
      // frame-level audio feature triple (RMS energy + zero-crossing
      // count + peak) per 200-frame window over the q57 analytic PCM16
      // fixtures — ZCR and peak are integral, so the oracle recomputes
      // them exactly (lag-based sign flips; max |sample|)
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizeWav(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.wavWindowStats(blobs, "doc_id", "blob",
        windowFrames = 200)
        .select(col("id").as("doc_id"),
          col("window_idx").cast("long").as("window_idx"),
          col("n_frames").cast("long").as("n_frames"),
          round(col("rms"), 6).as("rms"),
          col("zcr"),
          col("peak").cast("long").as("peak"))
    }),

    "q131_image_hash" -> ((s, dir) => {
      // perceptual image hashes over the q56/q119 analytic PPM
      // fixtures: aHash (8x8 mean-threshold) and dHash (9x8 horizontal
      // gradient signs), both exact integer constructions, so the
      // oracle rebuilds every bit from the synthetic pixel formula.
      // 64-bit values ship as two unsigned 32-bit halves (BIGINT-safe
      // in any SQL engine). Near-dup pair recovery is spec-pinned in
      // MediaSpec (banded Hamming join, planted perturbed copy).
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.imageHashes(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"),
          shiftrightunsigned(col("ahash"), 32).as("ahash_hi"),
          col("ahash").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"))
    }),

    "q121_matryoshka" -> ((s, dir) => {
      // Matryoshka truncation: first-16-dim renormalized embeddings;
      // the report carries the reduced-width cosine to vec 0 next to
      // the full-width cosine so the dimension-reduction error is the
      // visible quantity
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("e"))
      // limit(1) bounds the broadcast build in the PLAN (vec_id is
      // unique so it drops nothing) — the nested-loop canary requires
      // provable boundedness, not data luck
      val q0 = emb.filter(col("vec_id") === 0)
        .select(col("e").as("e0")).limit(1)
      emb.crossJoin(broadcast(q0))
        .select(col("vec_id"),
          (round(Similarity.cosine(
            Similarity.truncateNormalize(col("e"), 16),
            Similarity.truncateNormalize(col("e0"), 16)), 6) + 0.0)
            .as("cos16"),
          (round(Similarity.cosine(col("e"), col("e0")), 6) + 0.0)
            .as("cos_full"))
    }),

    "q122_ngram_novelty" -> ((s, dir) => {
      // novelty vs a reference corpus: docs sharing a planted sentence
      // with the reference score below 1.0, everything else is novel
      val base = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
      val shared = lit(" shared boilerplate sentence repeats verbatim" +
        " across many documents here okay")
      val reference = base.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), concat(col("text"), shared).as("text"))
      val probe = base.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0, shared).otherwise(lit("")))
            .as("text"))
      ops.TextOps.ngramNovelty(probe, reference, "doc_id", "text", n = 8)
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("novelty"), 6).as("novelty"))
    }),

    "q132_novelty_stored" -> ((s, dir) => {
      // novelty vs a STORED reference: the reference corpus's distinct
      // gram hashes live in a CorpusStore bucketed table (written once,
      // 8 buckets on the hash), so scoring a batch of new documents
      // shuffles only the batch's grams — the stored side scans
      // bucketed, exchange-free (plan-pinned in StoredNoveltySpec).
      // Same semantics as q122's two-frame form; the oracle recomputes
      // membership from the raw text split.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      ops.TextOps.writeNoveltyReference(
        docs.filter(col("doc_id") >= 250), "text", n = 8,
        table = "graft_q132_ref", numBuckets = 8)
      ops.TextOps.ngramNoveltyStored(docs.filter(col("doc_id") < 250),
        "graft_q132_ref", "doc_id", "text", n = 8)
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("novelty"), 6).as("novelty"))
    }),

    "q133_novelty_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING novelty, driver-checked: probe documents arrive on a
      // MemoryStream and are scored row-locally against a STATIC
      // broadcast reference gram set — stateless append-mode projection,
      // no stream-static join, no state store (StreamingNoveltySpec pins
      // both). The collect below CONSTRUCTS the fixture-scale stream
      // source; it is not a query-path collect. Fixture: q122's planted
      // shared-sentence shape on a different document slice.
      val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val shared = lit(" planted shared sentence for the streaming" +
        " novelty row okay yes")
      val reference = base.filter(col("doc_id") % 7 === 0)
        .select(concat(col("text"), shared).as("text"))
      val probe = base.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0, shared).otherwise(lit("")))
            .as("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val refSet = graft.streaming.StreamingNovelty.referenceGrams(
        reference, "text", n = 8)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val scored = graft.streaming.StreamingNovelty.score(
        input.toDF().toDF("doc_id", "text"), refSet, "doc_id", "text",
        n = 8)
      val name = "q133_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = scored.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(probe.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name).select(col("doc_id"), col("n_grams"),
        col("n_novel"), round(col("novelty"), 6).as("novelty"))
    }),

    "q134_doremi_weights" -> ((s, dir) => {
      // DoReMi-lite mixture weights over the documents corpus: per-doc
      // proxy loss = ln(1+chars), reference loss = ln(1+tokens) —
      // deterministic stand-ins for upstream perplexity scorers whose
      // per-source excess (≈ avg log token length) genuinely differs by
      // source. One K-row aggregate, then the fixed 10-step
      // multiplicative-weights iteration on the driver.
      val d = t(s, dir, "documents").select(col("source"),
        log(lit(1.0) + length(col("text")).cast("double")).as("lp"),
        log(lit(1.0) + size(split(col("text"), " ")).cast("double"))
          .as("lr"))
      ops.Sampling.doremiWeights(d, "source", "lp", "lr",
          eta = 1.0, steps = 10, smoothing = 0.1)
        .select(col("domain").as("source"),
          round(col("excess"), 6).as("excess"),
          round(col("weight"), 6).as("weight"))
    }),

    "q135_mixture_apply" -> ((s, dir) => {
      // the DoReMi loop CLOSED: solver weights (q134's exact fixture)
      // feed the deterministic mixture resampler — per-domain id-hash
      // rates hit the target mixture, corpus-side filter map-only
      val docs = t(s, dir, "documents")
      val d = docs.select(col("source"),
        log(lit(1.0) + length(col("text")).cast("double")).as("lp"),
        log(lit(1.0) + size(split(col("text"), " ")).cast("double"))
          .as("lr"))
      val w = ops.Sampling.doremiWeights(d, "source", "lp", "lr",
        eta = 1.0, steps = 10, smoothing = 0.1)
      ops.Sampling.applyMixtureWeights(docs, "source", "doc_id", w,
          targetFraction = 0.3)
        .select(col("doc_id"), col("source"), col("lang"))
    }),

    "q136_streaming_sessions" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING sessionization, driver-checked: the event feed replays
      // through a MemoryStream in two time-ordered micro-batches and
      // Spark's native session_window merges per-user sessions in the
      // state store (bounded by OPEN sessions, not stream length). The
      // fixture has no gap at exactly 4h — the one boundary where the
      // half-open session_window differs from batch `diff > gap` — so
      // closed sessions equal the batch q50 stats minus the seq number.
      // The collect below CONSTRUCTS the fixture-scale stream source;
      // it is not a query-path collect.
      val evd = t(s, dir, "events")
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"), col("user_id"))
        .orderBy(col("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val stream = input.toDF().toDF("us", "user_id")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val sessions = graft.streaming.StreamingSessions.sessionStats(
        stream, "user_id", "ts", gap = "4 hours")
      val name = "q136_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        input.addData(b1.toIndexedSeq)
        q.processAllAvailable()
        input.addData(b2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name).select(col("user_id"), col("n_events"),
        col("start_t"), col("end_t"), col("duration_t"))
    }),

    "q137_funnel" -> ((s, dir) => {
      // ordered view->click->purchase funnel per user: one events
      // shuffle, K chained window passes over the same sort, unreached
      // step times surface as -1 (an int64 sentinel keeps the column
      // integral on both engines; a NULL would float-coerce in pandas)
      val f = ops.Funnel.depth(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        tieCols = Seq("event_id"))
      f.select(col("user_id"), col("depth"),
        coalesce(col("t_step1"), lit(-1L)).as("t_step1"),
        coalesce(col("t_step2"), lit(-1L)).as("t_step2"),
        coalesce(col("t_step3"), lit(-1L)).as("t_step3"))
    }),

    "q138_retention" -> ((s, dir) => {
      // cohort retention triangle: users cohort by first-event UTC day,
      // one (cohort, offset) row per distinct active (user, day)
      ops.Retention.cohorts(t(s, dir, "events"), "user_id", "ts")
    }),

    "q140_streaming_funnel" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING funnel, driver-checked: the event feed replays
      // through a MemoryStream in two time-ordered micro-batches and
      // per-user progress lives in CUSTOM mapGroupsWithState state
      // (K longs per user). The last update per user must equal the
      // batch q137 answer — same oracle. The collect below CONSTRUCTS
      // the fixture-scale stream source; it is not a query-path collect.
      val evd = t(s, dir, "events")
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"), col("user_id"),
          col("event_type"), col("event_id"))
        .orderBy(col("us"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Long)]
      val stream = input.toDF().toDF("us", "user_id", "event_type",
        "event_id")
      val funnel = graft.streaming.StreamingFunnel.depth(stream,
        "user_id", "us", "event_type", Seq("view", "click", "purchase"),
        "event_id")
      val name = "q140_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = funnel.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        input.addData(b1.toIndexedSeq)
        q.processAllAvailable()
        input.addData(b2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      // update-mode sink keeps every trigger's row; depth and set step
      // times are monotone, so max = the final state
      s.table(name).groupBy(col("user").cast("long").as("user_id"))
        .agg(max(col("depth")).as("depth"),
          max(col("t_step1")).as("t_step1"),
          max(col("t_step2")).as("t_step2"),
          max(col("t_step3")).as("t_step3"))
    }),

    "q141_event_transitions" -> ((s, dir) => {
      // event-flow transition matrix (the path structure behind q137's
      // funnel): terminal rows coalesce to '<end>' so the column stays
      // string-typed and hash-comparable on both engines
      ops.Funnel.transitions(t(s, dir, "events"), "user_id", "ts",
          "event_type", tieCols = Seq("event_id"))
        .select(col("from_type"),
          coalesce(col("to_type"), lit("<end>")).as("to_type"), col("n"))
    }),

    "q146_layout_manifest" -> ((s, dir) => {
      // file-stats manifest over the deterministic shard layout: one
      // column-pruned scan keyed by file name; the oracle recomputes
      // every shard's row count and n_chars envelope analytically from
      // the md5 assignment, so a wrong stat, lost file, or misattributed
      // row all hash-mismatch
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q146_manifest").toString
      io.ShardWriter.writeShards(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", nShards = 8, tmp)
      io.LayoutManifest.collectStats(s, tmp, Seq("n_chars"))
        .withColumn("shard",
          regexp_extract(col("file"), "shard=(\\d+)", 1).cast("int"))
        .groupBy(col("shard"))
        .agg(sum(col("n_rows")).as("n_rows"),
          min(col("min_n_chars")).as("min_n_chars"),
          max(col("max_n_chars")).as("max_n_chars"))
    }),

    "q147_streaming_transitions" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING transition matrix, driver-checked: two time-ordered
      // micro-batches through custom flatMapGroupsWithState state; the
      // collapsed update-mode sink must equal the batch operator's
      // non-terminal rows. The collect CONSTRUCTS the fixture-scale
      // stream source; it is not a query-path collect.
      val evd = t(s, dir, "events")
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"), col("user_id"),
          col("event_type"), col("event_id"))
        .orderBy(col("us"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Long)]
      val stream = input.toDF().toDF("us", "user_id", "event_type",
        "event_id")
      val trans = graft.streaming.StreamingTransitions.matrix(stream,
        "user_id", "us", "event_type", "event_id")
      val name = "q147_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = trans.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        input.addData(b1.toIndexedSeq)
        q.processAllAvailable()
        input.addData(b2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      graft.streaming.StreamingTransitions.collapse(s.table(name))
    }),

    "q148_decayed_score" -> ((s, dir) => {
      // time-decayed per-user activity score (1h half-life), anchored
      // at each user's last event so the answer is replay-stable; one
      // events shuffle (window + agg share the exchange)
      ops.EventStats.decayedScore(t(s, dir, "events"), "user_id", "ts",
        "value", halfLifeSeconds = 3600.0)
        .select(col("user_id"),
          (round(col("ewma_score"), 6) + 0.0).as("ewma_score"),
          col("n_events"), col("last_t"))
    }),

    "q149_corr_matrix" -> ((s, dir) => {
      // pairwise Pearson over the lineitem measures: ONE aggregation
      // job (each corr is a map-side-combined moment buffer), input
      // scans once, nothing row-sized shuffles
      ops.Stats.corrMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select(col("col_a"), col("col_b"),
          (round(col("pearson"), 6) + 0.0).as("pearson"), col("n"))
    }),

    "q150_cat_association" -> ((s, dir) => {
      // MI / chi-squared / Cramer's V between order status and
      // priority: input reduces to its contingency cells in one hash
      // aggregate; marginals re-aggregate the cell table and broadcast
      ops.Stats.categoricalAssociation(t(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")
        .select((round(col("mi"), 6) + 0.0).as("mi"),
          (round(col("chi2"), 6) + 0.0).as("chi2"),
          (round(col("cramers_v"), 6) + 0.0).as("cramers_v"),
          col("n"), col("card_a"), col("card_b"))
    }),

    "q151_pagerank" -> ((s, dir) => {
      // weighted PageRank over the customer->supplier purchase graph
      // (3 power iterations, d=0.85); suppliers have no out-edges, so
      // the dangling-mass redistribution path is fully exercised. Node
      // ids are namespaced (c:/s:) because the key spaces overlap.
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst"))
      ops.Graph.pageRank(edges, "src", "dst", weightCol = None,
        iterations = 3, damping = 0.85)
        .select(col("node"),
          (round(col("scaled_rank"), 6) + 0.0).as("scaled_rank"))
    }),

    "q152_knn_label_noise" -> ((s, dir) => {
      // label-noise screen: exact cosine 10-NN per labeled vector
      // (corpus never shuffles; neighbor-id pairs do), neighborhood
      // majority + disagreement vs own label
      Similarity.knnLabelNoise(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", k = 10)
        .select(col("query_id").as("vec_id"), col("label"),
          col("majority_label"), col("n_neighbors"),
          (round(col("disagree_frac"), 6) + 0.0).as("disagree_frac"),
          col("suspect"))
    }),

    "q153_source_overlap" -> ((s, dir) => {
      // pairwise 8-gram Jaccard BETWEEN sources (the pre-dedup corpus
      // overlap matrix): grams reduce to per-(source, hash) distinct
      // keys in one exchange reused across all three plan occurrences;
      // gram text never shuffles
      ops.TextOps.sourceOverlap(t(s, dir, "documents"),
        "source", "text", n = 8)
        .select(col("source_a"), col("source_b"), col("n_a"),
          col("n_b"), col("n_common"),
          (round(col("jaccard"), 6) + 0.0).as("jaccard"))
    }),

    "q154_rolling_window" -> ((s, dir) => {
      // exact trailing-1h per-event stats: ONE hash exchange on the
      // key + per-partition sort (a single RANGE window), no self-join
      ops.EventStats.rollingWindowStats(t(s, dir, "events"),
        "user_id", "ts", "value", windowSeconds = 3600L)
        .select(col("event_id"), col("user_id"),
          col("t_micros").as("t"), col("n_window"),
          (round(col("sum_window"), 6) + 0.0).as("sum_window"),
          (round(col("mean_window"), 6) + 0.0).as("mean_window"))
    }),

    "q155_streaming_scores" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING decayed scores, driver-checked: the event feed
      // replays through a MemoryStream in two micro-batches; per-key
      // state is 3 numbers (score at anchor, anchor, count) and the
      // exact re-anchoring update makes the final state equal the
      // batch q148 closed form. The collect below CONSTRUCTS the
      // fixture-scale stream source; it is not a query-path collect.
      val evd = t(s, dir, "events")
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"),
          col("user_id"), col("value"))
        .orderBy(col("us"), col("user_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Double)]
      val stream0 = input.toDF().toDF("us", "user_id", "v")
      // NaN encodes the source's NULL values through the typed
      // MemoryStream tuple; restore before scoring
      val stream = stream0.withColumn("value",
        when(isnan(col("v")), lit(null).cast("double"))
          .otherwise(col("v")))
      val scored = graft.streaming.StreamingScores.decayedScores(
        stream, "user_id", "us", "value", halfLifeSeconds = 3600.0)
      val name = "q155_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = scored.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        input.addData(b1.toIndexedSeq)
        q.processAllAvailable()
        input.addData(b2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      // update-mode sink keeps every trigger's row; n_events is
      // monotone per key, so max_by picks the final state
      s.table(name).groupBy(col("key").cast("long").as("user_id"))
        .agg((round(expr("max_by(ewma_score, n_events)"), 6) + 0.0)
          .as("ewma_score"),
          max(col("n_events")).as("n_events"),
          max(col("last_t")).as("last_t"))
    }),

    "q156_fuzzy_join" -> ((s, dir) => {
      // edit-distance record linkage: customer names vs a one-edit
      // perturbed copy under (prefix, length-band) blocking — an
      // equi-join on block keys, never a cartesian product. All names
      // share the first char, so blocking is provably lossless here
      // and the brute-force oracle must agree exactly.
      val c = t(s, dir, "customer").filter(col("c_custkey") <= 400)
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val perturbed = c.select((col("id") + 100000L).as("id"),
        when(col("id") % 3 === 0,
          concat(substring(col("name"), lit(1),
            length(col("name")) - 1), lit("X")))
          .otherwise(col("name")).as("name"))
      ops.Joins.fuzzyJoin(c, perturbed, "id", "name", maxDist = 1)
        .select(col("left_id"), col("left_key"), col("right_id"),
          col("right_key"), col("dist").cast("long").as("dist"))
    }),

    "q157_trending" -> ((s, dir) => {
      // per-4h-bucket top-3 event types: events collapse to
      // (bucket, item) cells in one map-side-combined exchange; the
      // top-k window runs over cells, not events
      ops.EventStats.trendingItems(t(s, dir, "events"), "ts",
        "event_type", bucketSeconds = 14400L, k = 3)
    }),

    "q158_attribution" -> ((s, dir) => {
      // first/last-touch credit for every purchase within a 1h
      // lookback: both window passes share one exchange + sort
      ops.EventStats.touchAttribution(t(s, dir, "events"), "user_id",
        "ts", "event_type", "event_id", Seq("view", "click"),
        "purchase", lookbackSeconds = 3600L)
    }),

    "q159_label_prop" -> ((s, dir) => {
      // community detection over the per-region nation cliques: with
      // disjoint cliques the self-vote LPA fixed point is each
      // clique's minimum member, reached by iteration 1 — the oracle
      // states that closed form; 3 iterations prove stability
      val n = t(s, dir, "nation")
      val m = n.select(col("n_nationkey").as("b"),
        col("n_regionkey").as("r2"))
      val edges = n.join(m, col("n_regionkey") === col("r2") &&
          col("n_nationkey") < col("b"))
        .select(col("n_nationkey").as("src"), col("b").as("dst"))
      ops.Graph.labelPropagation(edges, "src", "dst", iterations = 3)
        .select(col("node").cast("long").as("node"),
          col("label").cast("long").as("label"))
    }),

    "q160_kmeans" -> ((s, dir) => {
      // deterministic cosine k-means (init = first 4 by id, one Lloyd
      // step): training is map passes + a 4-row aggregate each, the
      // assignment a map-only pass — zero corpus shuffles. The oracle
      // replays init/assign/update/assign in SQL.
      Similarity.kmeansClusters(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 4, iterations = 1)
    }),

    "q161_interarrival" -> ((s, dir) => {
      // per-user burstiness: gap stats + CV; the lag window and the
      // aggregate share one exchange on the key
      ops.EventStats.interArrivalStats(t(s, dir, "events"),
        "user_id", "ts")
        .select(col("key").as("user_id"), col("n_gaps"),
          (round(col("mean_gap_s"), 6) + 0.0).as("mean_gap_s"),
          (round(col("min_gap_s"), 6) + 0.0).as("min_gap_s"),
          (round(col("max_gap_s"), 6) + 0.0).as("max_gap_s"),
          (round(col("std_gap_s"), 6) + 0.0).as("std_gap_s"),
          (round(col("cv"), 6) + 0.0).as("cv"))
    }),

    "q162_concentration" -> ((s, dir) => {
      // traffic-inequality screen: Gini + top-decile share of per-user
      // event counts; the global sort ranks USERS, not events
      ops.EventStats.concentration(t(s, dir, "events"), "user_id")
        .select(col("n_keys"), col("total").cast("long").as("total"),
          (round(col("gini"), 6) + 0.0).as("gini"),
          (round(col("top_decile_share"), 6) + 0.0)
            .as("top_decile_share"))
    }),

    "q163_zipf" -> ((s, dir) => {
      // Zipf fit of the corpus token-frequency curve: token counts in
      // one map-side-combined exchange, OLS over the top-200 ranks
      ops.TextOps.zipfFit(t(s, dir, "documents"), "text", topN = 200)
        .select((round(col("slope"), 6) + 0.0).as("slope"),
          (round(col("intercept"), 6) + 0.0).as("intercept"),
          (round(col("r2"), 6) + 0.0).as("r2"), col("n_ranks"))
    }),

    "q164_triangles" -> ((s, dir) => {
      // triangle census of the per-region nation cliques (5 K5s):
      // degree-oriented wedge join, every triangle counted at its
      // smallest corner — n_wedges 150, n_triangles 50, clustering 1
      val n = t(s, dir, "nation")
      val m = n.select(col("n_nationkey").as("b"),
        col("n_regionkey").as("r2"))
      val edges = n.join(m, col("n_regionkey") === col("r2") &&
          col("n_nationkey") < col("b"))
        .select(col("n_nationkey").as("src"), col("b").as("dst"))
      ops.Graph.triangleStats(edges, "src", "dst")
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          (round(col("global_clustering"), 6) + 0.0)
            .as("global_clustering"))
    }),

    "q165_degrees" -> ((s, dir) => {
      // per-node degrees of the customer->supplier purchase graph
      // (namespaced: the key spaces overlap); everything edge-sized
      // dies at the first distinct
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst"))
      ops.Graph.degreeStats(edges, "src", "dst")
    }),

    "q166_streaming_trending" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // STREAMING trending, driver-checked: windowed stateful counts
      // (watermark + groupBy(bucket, item).count) replayed through a
      // MemoryStream in two batches; the latest update per cell must
      // equal the batch cell table, and the post-query top-k matches
      // the batch q157 oracle. The collect below CONSTRUCTS the
      // fixture-scale stream source; it is not a query-path collect.
      val evd = t(s, dir, "events")
      val rows = evd
        .select(ops.EventTime.micros(evd, "ts").as("us"),
          col("event_type"))
        .orderBy(col("us"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val stream = input.toDF().toDF("us", "event_type")
      val counts = graft.streaming.StreamingTrending.itemCounts(
        stream, "us", "event_type", bucketSeconds = 14400L,
        watermarkDelay = "3650 days")
      val name = "q166_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        input.addData(b1.toIndexedSeq)
        q.processAllAvailable()
        input.addData(b2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      // update-mode sink: counts are monotone per cell, max = final
      val cells = s.table(name)
        .groupBy(col("bucket_start"), col("item"))
        .agg(max(col("n")).as("n"))
      graft.streaming.StreamingTrending.topK(cells, 3)
    }),

    "q167_cusum" -> ((s, dir) => {
      // CUSUM level-shift screen over per-type 4h event-count series:
      // the recursion runs in closed form (running sum - running min),
      // four window passes over ONE exchange on the series key
      val cells = t(s, dir, "events")
        .filter(col("event_type").isNotNull)
        .groupBy(col("event_type"),
          (floor(expr("unix_micros(cast(ts as timestamp))") /
            14400000000L) * 14400000000L).as("bucket_start"))
        .agg(count(lit(1)).as("n"))
      ops.Drift.cusum(cells, Seq("event_type"), "bucket_start", "n",
        k = 0.5, h = 4.0)
        .select(col("event_type"), col("bucket_start"), col("value"),
          (round(col("z"), 6) + 0.0).as("z"),
          (round(col("cusum_pos"), 6) + 0.0).as("cusum_pos"),
          (round(col("cusum_neg"), 6) + 0.0).as("cusum_neg"),
          col("alarm"))
    }),

    "q168_corpus_diff" -> ((s, dir) => {
      // snapshot diff of documents vs a perturbed copy (9% removed,
      // texts changed on the 7-multiples, 30 added): sides reduce to
      // (id, hash) map-side — payload text never shuffles
      val d = t(s, dir, "documents")
      val newer = d.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit("!")))
            .otherwise(col("text")).as("text"), col("source"))
        .union(d.filter(col("doc_id") < 30)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
            col("source")))
      ops.Diagnostics.corpusDiff(d, newer, "doc_id",
        Seq("text", "source"))
    }),

    "q169_bloom_lookup" -> ((s, dir) => {
      // per-file bloom manifest + point-lookup read: the layout is
      // written sharded by l_partkey hash (so an orderkey probe can't
      // be pruned by sort order), the bloom prunes files, the equality
      // filter re-applies row-exactly — result must equal the plain
      // full-table predicate
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q169_layout").toString
      val li = t(s, dir, "lineitem")
      io.ShardWriter.writeShards(li, "l_partkey", nShards = 8, tmp)
      val man = java.nio.file.Files
        .createTempDirectory("graft_q169_bloom").toString
      io.LayoutManifest.writeBloomManifest(s, tmp, "l_orderkey", man)
      io.LayoutManifest.lookupRead(s, tmp, man, "l_orderkey", 1988L)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    }),

    "q170_basket_pairs" -> ((s, dir) => {
      // supplier co-occurrence across orders: support/confidence/lift
      // per pair; pair generation stays inside each basket's partition
      // and only counts survive
      val li = t(s, dir, "lineitem")
      ops.Baskets.coOccurrence(li, "l_orderkey", "l_suppkey",
        minCount = 2L)
        .select(col("item_a"), col("item_b"), col("n_ab"),
          col("n_a"), col("n_b"),
          (round(col("support"), 6) + 0.0).as("support"),
          (round(col("confidence"), 6) + 0.0).as("confidence"),
          (round(col("lift"), 6) + 0.0).as("lift"))
    }),

    "q171_calibration" -> ((s, dir) => {
      // reliability table of a deterministic score vs the embedding
      // labels: one hash aggregate over <= 10 bins
      val emb = t(s, dir, "embeddings")
        .select(((col("vec_id") % 97).cast("double") / 96.0)
          .as("score"), (col("label") >= 5).as("y"))
      ops.ModelEval.calibrationReport(emb, "score", "y", nBins = 10)
        .select(col("bin"), col("n"),
          (round(col("mean_score"), 6) + 0.0).as("mean_score"),
          (round(col("frac_pos"), 6) + 0.0).as("frac_pos"),
          (round(col("gap"), 6) + 0.0).as("gap"))
    }),

    "q172_auc" -> ((s, dir) => {
      // tie-corrected Mann-Whitney AUC: one sort via window, 1-row
      // aggregate, no pairwise join; 97 distinct scores over 500 rows
      // exercise the average-rank tie handling
      val emb = t(s, dir, "embeddings")
        .select(((col("vec_id") % 97).cast("double") / 96.0)
          .as("score"), (col("label") >= 5).as("y"))
      ops.ModelEval.auc(emb, "score", "y")
        .select(col("n_pos"), col("n_neg"),
          (round(col("auc"), 6) + 0.0).as("auc"))
    }),

    "q173_join_estimate" -> ((s, dir) => {
      // exact pre-flight join-size forecast: sides reduce to (key,
      // count) map-side, the count tables join key-cardinality-sized
      ops.Diagnostics.joinSizeEstimate(t(s, dir, "orders"),
        t(s, dir, "lineitem"), Seq("o_orderkey"), Seq("l_orderkey"))
    }),

    "q174_ref_integrity" -> ((s, dir) => {
      // FK-violation counter against a parent with every 5th supplier
      // deleted: parent reduces to distinct keys, child counted once
      ops.Validation.referentialIntegrity(
        t(s, dir, "lineitem"), Seq("l_suppkey"),
        t(s, dir, "supplier").filter(col("s_suppkey") % 5 =!= 0),
        Seq("s_suppkey"))
        .select(col("n_child"), col("n_orphans"), col("n_null_keys"),
          (round(col("orphan_frac"), 6) + 0.0).as("orphan_frac"))
    }),

    "q175_uniqueness" -> ((s, dir) => {
      // "is l_orderkey a primary key?" — no (multi-line orders):
      // per-key counts in one hash aggregate, bounded re-aggregation
      ops.Validation.uniquenessReport(t(s, dir, "lineitem"),
        Seq("l_orderkey"))
        .select(col("n_rows"), col("n_keys"), col("n_dupe_keys"),
          col("n_dupe_rows"), col("n_null_rows"),
          (round(col("dupe_frac"), 6) + 0.0).as("dupe_frac"))
    }),

    "q176_length_buckets" -> ((s, dir) => {
      // padding-waste report for length-bucketed batching (128/256/
      // 512 ladder; >512 truncates): map-only assignment + one
      // bounded aggregate
      ops.Packing.lengthBuckets(t(s, dir, "documents"), "n_chars",
        Seq(128L, 256L, 512L))
        .select(col("bucket_len"), col("n_seqs"), col("sum_len"),
          col("padded_tokens"),
          (round(col("waste_frac"), 6) + 0.0).as("waste_frac"))
    }),

    "q177_interleave" -> ((s, dir) => {
      // deterministic source-interleaved curriculum order: the first
      // 100 rows of the (rank, source) round-robin — TakeOrdered, no
      // global sort materialization
      ops.Sampling.interleaveSources(t(s, dir, "documents"),
        "source", "doc_id")
        .select(col("doc_id"), col("source"), col("interleave_rank"))
        .orderBy(col("interleave_rank"), col("source"), col("doc_id"))
        .limit(100)
    }),

    "q178_blocklist" -> ((s, dir) => {
      // C4-style blocklist screen over natural corpus tokens:
      // row-local array ops, pass verdict at ratio <= 2%
      ops.TextOps.blocklistReport(t(s, dir, "documents"), "doc_id",
        "text", Seq("spark", "window"), maxRatio = 0.02)
        .select(col("doc_id"), col("n_tokens"), col("n_flagged"),
          (round(col("flagged_ratio"), 6) + 0.0).as("flagged_ratio"),
          col("passed"))
    }),

    "q179_domain_stats" -> ((s, dir) => {
      // URL-domain histogram: the synthetic corpus carries no URLs,
      // so the fixture plants deterministic ones (doc_id mod 7
      // domains, a second URL on the 3-multiples) — extraction is a
      // row-local regex pass, the exchange carries (domain, doc)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" see http://site"), col("doc_id") % 7,
          lit(".example/page"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" and https://Mirror"), col("doc_id") % 7,
              lit(".example/x"))).otherwise(lit(""))).as("text"))
      ops.TextOps.urlDomainStats(docs, "doc_id", "text")
    }),

    "q180_personalized_pr" -> ((s, dir) => {
      // personalized PageRank seeded on nation-0 customers: teleport
      // AND dangling mass return to the seeds, so rank is
      // relevance-to-the-seed-set (3 iterations, d=0.85)
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst"))
      val seeds = t(s, dir, "customer")
        .filter(col("c_nationkey") === 0)
        .select(concat(lit("c:"), col("c_custkey")).as("seed"))
      ops.Graph.personalizedPageRank(edges, "src", "dst", seeds,
        "seed", weightCol = None, iterations = 3, damping = 0.85)
        .select(col("node"), (round(col("rank"), 6) + 0.0).as("rank"))
    }),

    "q181_hits" -> ((s, dir) => {
      // HITS on the purchase graph (2 rounds, L1-normalized): hub =
      // breadth of buying, authority = breadth of being bought; both
      // edge copies persist partitioned on their own update key
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst"))
      ops.Graph.hits(edges, "src", "dst", iterations = 2)
        .select(col("node"),
          (round(col("hub"), 6) + 0.0).as("hub"),
          (round(col("authority"), 6) + 0.0).as("authority"))
    }),

    "q182_readability" -> ((s, dir) => {
      // classic readability battery per document (Flesch reading ease,
      // Flesch-Kincaid grade, ARI) from countable surface features —
      // row-local, zero shuffle, every count SQL-exact
      // scores floor-round explicitly (floor(x*1e6+0.5)/1e6) instead of
      // round(): the op guarantees bit-identical doubles cross-engine,
      // and this rounding is a pure double op chain — so it cannot
      // disagree at exact decimal halves the way round() does
      val r = ops.TextOps.readability(col("text"))
      val r6 = (c: org.apache.spark.sql.Column) =>
        floor(c * 1e6 + 0.5) / 1e6 + 0.0
      t(s, dir, "documents")
        .select(col("doc_id"), r.as("r"))
        .select(col("doc_id"),
          col("r.n_words").as("n_words"),
          col("r.n_sentences").as("n_sentences"),
          col("r.n_syllables").as("n_syllables"),
          col("r.n_alnum").as("n_alnum"),
          r6(col("r.flesch")).as("flesch"),
          r6(col("r.fk_grade")).as("fk_grade"),
          r6(col("r.ari")).as("ari"))
    }),

    "q183_pmi_collocations" -> ((s, dir) => {
      // top-50 bigram collocations by PMI (min count 5): two
      // vocabulary-sized count tables, AQE-broadcast joins, ranking on
      // ROUNDED pmi with lexicographic tie-break for a deterministic cut
      ops.TextOps.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 5, topK = 50)
    }),

    "q184_bpe_pairs" -> ((s, dir) => {
      // BPE training's inner statistic: weighted adjacent-symbol pair
      // counts over the word-frequency table at the initial (per-char)
      // segmentation — the corpus collapses to |vocab| rows first, so
      // the pair aggregate never rescans the corpus
      ops.Tokenizer.pairCounts(
        ops.Tokenizer.wordFreq(t(s, dir, "documents"), "text")
          .select(ops.Tokenizer.symInit(col("word")).as("sym"), col("freq")))
    }),

    "q185_bpe_merges" -> ((s, dir) => {
      // six full BPE merge steps (Sennrich 2016) over the documents
      // corpus: per step one vocab-sized pair aggregate + a 1-row argmax
      // collect + a literal replace — the oracle unrolls the identical
      // loop in SQL, so pair counting, tie-breaks, AND the merge rewrite
      // itself are all hash-checked
      ops.Tokenizer.bpeTrain(t(s, dir, "documents"), "text", merges = 6)
    }),

    "q188_bpe_encode" -> ((s, dir) => {
      // the tokenizer round trip: train six merges on the corpus, then
      // encode the same corpus with them (row-local replace replay) —
      // the oracle re-derives the merges AND the per-document piece
      // counts entirely in SQL, so training and encoding are verified
      // together end to end
      val d = t(s, dir, "documents")
      val ms = ops.Tokenizer.trainMerges(d, "text", 6)
        .map(m => (m.left, m.right))
      d.select(col("doc_id"),
        ops.Tokenizer.encodePieceCount(col("text"), ms).as("n_pieces"))
    }),

    "q189_minhash_stored" -> ((s, dir) => {
      // INCREMENTAL near-dup screening against a STORED MinHash-LSH
      // index (the q126 invariant, store edition): the corpus's band
      // buckets + signatures persist as bucketed tables, a batch of
      // planted exact copies probes them, and every copy must recover
      // its original at est_jaccard exactly 1.0 (identical text ->
      // identical signature -> every band collides). Stored sides scan
      // bucketed, exchange-free (plan-pinned in StoredMinHashSpec);
      // the oracle recomputes the pairs from the planting rule alone.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      ops.Dedup.writeMinHashReference(docs, "doc_id", "text",
        "graft_q189_ref", numHashes = 64, bands = 16, shingleK = 2,
        numBuckets = 8)
      val batch = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      ops.Dedup.minHashNearDupsStored(batch, "graft_q189_ref",
        "doc_id", "text", numHashes = 64, bands = 16, shingleK = 2,
        threshold = 0.999)
        .filter(col("ref_id") === col("new_id") - 100000)
        .select(col("ref_id").as("doc_id"), col("new_id").as("dup_id"),
          col("est_jaccard"))
    }),

    "q190_source_psi_matrix" -> ((s, dir) => {
      // pairwise drift matrix across ALL 20 sources in one corpus scan:
      // one KLL sketch per source (single map-side-combined aggregate),
      // then the 190-pair PSI/JSD matrix reads off the broadcast K-row
      // sketch table — the oracle recomputes every bin fraction exactly
      val edges = Seq(150.0, 250.0, 350.0, 450.0)
      ops.Drift.psiMatrix(t(s, dir, "documents"), "source", "n_chars",
        edges)
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          (round(col("psi"), 6) + 0.0).as("psi"),
          (round(col("jsd"), 6) + 0.0).as("jsd"),
          (round(col("ks"), 6) + 0.0).as("ks"))
    }),

    "q191_ivf_stored" -> ((s, dir) => {
      // the vector index AT REST (q108's invariant, store edition):
      // codebook + inverted lists persist as CorpusStore tables, query
      // batches search without re-clustering, and probing EVERY stored
      // list makes the search exhaustive — so it must equal DuckDB's
      // exact brute force. Ranks recompute on the ROUNDED cosine with
      // an id tiebreak on both engines.
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
      ops.Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        "graft_q191_ivf", nCentroids = 8, iterations = 2, numBuckets = 4)
      val top = ops.Similarity.ivfTopKStored(
        emb.filter(col("vec_id") < 20), "graft_q191_ivf",
        "vec_id", "embedding", k = 10, nProbe = 8)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cosine"), 6).desc, col("item_id"))
      top.select(col("query_id"), col("item_id"),
        (round(col("cosine"), 6) + 0.0).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("long"))
    }),

    "q192_negative_sampling" -> ((s, dir) => {
      // deterministic contrastive negative sampling: 4 md5-drawn
      // partners per anchor over the dense vec_id domain, zero shuffle,
      // zero RNG state — the oracle re-derives every draw from the
      // same md5 formula, so the pairing is hash-checked end to end
      val emb = t(s, dir, "embeddings")
      ops.Sampling.negativeSamples(emb.filter(col("vec_id") < 100),
        "vec_id", k = 4, domain = emb)
    }),

    "q195_survival" -> ((s, dir) => {
      // Kaplan-Meier time-to-purchase with right censoring: per user,
      // duration from first event to first purchase (censored at the
      // last event otherwise), bucketed to hours so the curve's global
      // window runs over bounded distinct times; survival is the
      // closed-form exp(cumsum(ln(1 - d/n))) product — every term
      // SQL-exact, so the oracle replays extraction AND curve
      val tte = ops.EventStats.timeToEvent(t(s, dir, "events"),
        "user_id", "ts", "event_type", "purchase")
        .select(col("key"), expr("duration div 3600000000").as("dh"),
          col("observed"))
      ops.EventStats.kaplanMeier(tte, "dh", "observed")
        .select(col("t"), col("n_risk"), col("n_events"),
          col("n_censored"),
          (round(col("survival"), 6) + 0.0).as("survival"),
          (round(col("hazard"), 6) + 0.0).as("hazard"),
          (round(col("cum_hazard"), 6) + 0.0).as("cum_hazard"),
          (round(col("survival_lo"), 6) + 0.0).as("survival_lo"),
          (round(col("survival_hi"), 6) + 0.0).as("survival_hi"))
    }),

    "q201_video_frames" -> ((s, dir) => {
      // video frame sampling over the GVID analytic container: every
      // 2nd frame decodes to dims + per-channel pixel means, all
      // SQL-derivable from (id, frame) alone — decode is partition-
      // local, video bytes never shuffle
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 24)
        .select(col("doc_id")).as[Long]
      val vids = ids.map(id =>
        (id, graft.ops.Media.synthesizeGvid(id, 3 + (id % 3).toInt)))
        .toDF("doc_id", "blob")
      graft.ops.Media.videoFrameSample(vids, "doc_id", "blob",
        everyN = 2)
        .select(col("id").as("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          (round(col("mean_r"), 6) + 0.0).as("mean_r"),
          (round(col("mean_g"), 6) + 0.0).as("mean_g"),
          (round(col("mean_b"), 6) + 0.0).as("mean_b"))
    }),

    "q202_video_stats" -> ((s, dir) => {
      // container-level stats: header walk only, frames never decode;
      // duration derives exactly from the frame count and fps
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
      val vids = ids.map(id =>
        (id, graft.ops.Media.synthesizeGvid(id, 4 + (id % 5).toInt)))
        .toDF("doc_id", "blob")
      graft.ops.Media.videoStats(vids, "doc_id", "blob")
        .select(col("id").as("doc_id"),
          col("n_frames").cast("long").as("n_frames"),
          col("fps_milli").cast("long").as("fps_milli"),
          col("duration_us"))
    }),

    "q203_encoding_profile" -> ((s, dir) => {
      // encoding-hygiene screen with deterministic corruption
      // injection so every branch exercises cross-engine: doc_id%7==0
      // gains a U+FFFD replacement char (failed-decode mark), %7==1
      // two stray control bytes (under the 1% mojibake gate), %7==2
      // twenty control bytes (over it); everything is explicit-range
      // regexp counting, row-local in both engines
      val mutated = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit("\uFFFD")))
          .when(col("doc_id") % 7 === 1,
            concat(col("text"), lit("\u0003\u0007")))
          .when(col("doc_id") % 7 === 2,
            concat(col("text"), lit("\u0008" * 20)))
          .otherwise(col("text")).as("text"))
      mutated.select(col("doc_id"),
          ops.TextOps.encodingProfile(col("text")).as("p"))
        .select(col("doc_id"),
          col("p.n_chars").as("n_chars"),
          col("p.n_ascii").as("n_ascii"),
          col("p.n_letter").as("n_letter"),
          col("p.n_digit").as("n_digit"),
          col("p.n_ws").as("n_ws"),
          col("p.n_control").as("n_control"),
          col("p.n_replacement").as("n_replacement"),
          (round(col("p.non_ascii_ratio"), 6) + 0.0)
            .as("non_ascii_ratio"),
          col("p.mojibake").as("mojibake"))
    }),

    "q204_audio_dups" -> ((s, dir) => {
      // audio near-dup screen: white-noise clips for doc_id < 80, the
      // first 25 replanted at +1000 with 4x amplitude (a re-encoded /
      // volume-normalized copy; power of two, so the scaled Goertzel
      // recursion is BIT-exact and every energy-delta sign provably
      // survives) — each copy matches its original on ALL blocks and
      // nothing else matches anything (cross-id blocks are independent
      // white noise). The pair list + closed-form shared count
      // (((frames/16)-1)/8 blocks) is the analytic oracle.
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 80)
        .select(col("doc_id")).as[Long]
      val originals = ids.map(id =>
        (id, graft.ops.Media.synthesizeWavNoise(id)))
        .toDF("doc_id", "blob")
      val copies = ids.filter(col("doc_id") < 25).map { id =>
        val base = graft.ops.Media.synthesizeWavNoise(id)
        val meta = graft.ops.Media.parseWav(base)
        val _ = meta // parse validates; amplitude-scale the payload
        val buf = java.nio.ByteBuffer.wrap(base.clone())
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 44
        while (i + 1 < base.length) {
          buf.putShort(i, (buf.getShort(i) * 4).toShort); i += 2
        }
        (id + 1000L, buf.array())
      }.toDF("doc_id", "blob")
      graft.ops.Media.audioNearDups(originals.unionAll(copies),
        "doc_id", "blob", windowFrames = 16, minSharedBlocks = 2)
        .select(col("id_a"), col("id_b"), col("n_shared"))
    }),

    "q208_k_anonymity" -> ((s, dir) => {
      // release-gate privacy screen: is (status, priority, custkey)
      // k-anonymous at k=3? custkey is the high-cardinality
      // quasi-identifier, so the synthetic table fails realistically;
      // the one-row verdict replays exactly in SQL
      ops.Privacy.kAnonymityReport(t(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey"), k = 3)
    }),

    "q209_l_diversity" -> ((s, dir) => {
      // l-diversity of the order status within each (priority,
      // custkey) cohort: does knowing the cohort disclose the status?
      ops.Privacy.lDiversityReport(t(s, dir, "orders"),
        Seq("o_orderpriority", "o_custkey"), "o_orderstatus", l = 2)
    }),

    "q210_t_closeness" -> ((s, dir) => {
      // the third privacy gate: does any (priority, custkey) cohort's
      // order-status distribution sit further than t=0.2 (total
      // variation) from the global one? Single-order cohorts are
      // point masses, so the synthetic table fails realistically
      ops.Privacy.tClosenessReport(t(s, dir, "orders"),
        Seq("o_orderpriority", "o_custkey"), "o_orderstatus", t = 0.2)
    }),

    "q225_brier" -> ((s, dir) => {
      // strictly proper scoring of the q172 scored fixture: mean
      // squared probability gap + the base rate skill reference
      val emb = t(s, dir, "embeddings")
        .select(((col("vec_id") % 97).cast("double") / 96.0)
          .as("score"), (col("label") >= 5).as("y"))
      ops.ModelEval.brierScore(emb, "score", "y")
        .select(col("n"),
          (round(col("brier"), 6) + 0.0).as("brier"),
          (round(col("base_rate"), 6) + 0.0).as("base_rate"))
    }),

    "q226_lift_table" -> ((s, dir) => {
      // decile gains over the q172 fixture: distinct-score counts ->
      // distributed prefix sum over score DESC -> <= nBins bin rows;
      // tie groups land whole in the bin of their last row
      val emb = t(s, dir, "embeddings")
        .select(((col("vec_id") % 97).cast("double") / 96.0)
          .as("score"), (col("label") >= 5).as("y"))
      ops.ModelEval.liftTable(emb, "score", "y", nBins = 10)
        .select(col("bin"), col("n"), col("n_pos"),
          (round(col("pos_rate"), 6) + 0.0).as("pos_rate"),
          (round(col("cum_capture"), 6) + 0.0).as("cum_capture"),
          (round(col("lift"), 6) + 0.0).as("lift"))
    }),

    "q227_average_precision" -> ((s, dir) => {
      // PR-curve area over the q172 fixture: BOTH cumulatives (trials
      // and positives per descending threshold) from ONE multi-weight
      // prefix-sum pass — the imbalance-honest twin of the AUC
      val emb = t(s, dir, "embeddings")
        .select(((col("vec_id") % 97).cast("double") / 96.0)
          .as("score"), (col("label") >= 5).as("y"))
      ops.ModelEval.averagePrecision(emb, "score", "y")
        .select(col("n_pos"), col("n_neg"),
          (round(col("ap"), 6) + 0.0).as("ap"))
    }),

    "q228_threshold_report" -> ((s, dir) => {
      // operating-point table: confusion counts + derived metrics at
      // five candidate cuts; one aggregate with |thresholds| groups
      val emb = t(s, dir, "embeddings")
        .select(((col("vec_id") % 97).cast("double") / 96.0)
          .as("score"), (col("label") >= 5).as("y"))
      ops.ModelEval.thresholdReport(emb, "score", "y",
        Seq(0.2, 0.35, 0.5, 0.65, 0.8))
        .select((round(col("threshold"), 6) + 0.0).as("threshold"),
          col("tp"), col("fp"), col("fn"), col("tn"),
          (round(col("accuracy"), 6) + 0.0).as("accuracy"),
          (round(col("precision"), 6) + 0.0).as("precision"),
          (round(col("recall"), 6) + 0.0).as("recall"),
          (round(col("f1"), 6) + 0.0).as("f1"),
          (round(col("mcc"), 6) + 0.0).as("mcc"),
          (round(col("kappa"), 6) + 0.0).as("kappa"))
    }),

    "q229_ranking_metrics" -> ((s, dir) => {
      // per-query retrieval quality: NDCG@10 / reciprocal rank /
      // precision@10 / recall@10 over a deterministic 25-query ranking
      // fixture with graded relevance; windows partition BY QUERY
      val runs = t(s, dir, "embeddings").select(
        (col("vec_id") % 25).as("query"), col("vec_id").as("item"),
        (((col("vec_id") * 37) % 101).cast("double") / 100.0)
          .as("score"),
        greatest(lit(0), col("label") - 6).cast("double").as("rel"))
      ops.ModelEval.rankingReport(runs, "query", "item", "score",
        "rel", k = 10)
        .select(col("query"), col("n_items"), col("n_rel"),
          (round(col("dcg"), 6) + 0.0).as("dcg"),
          (round(col("ndcg"), 6) + 0.0).as("ndcg"),
          (round(col("rr"), 6) + 0.0).as("rr"),
          (round(col("precision_at_k"), 6) + 0.0).as("precision_at_k"),
          (round(col("recall_at_k"), 6) + 0.0).as("recall_at_k"))
    }),

    "q230_event_acf" -> ((s, dir) => {
      // hourly-bucket autocorrelation of the event stream, lags 1..30:
      // quiet hours count as zeros; the lag pairs come from an
      // equi-join on the shifted index, never a global-sort window
      ops.EventStats.eventAcf(t(s, dir, "events"), "ts",
        bucketSeconds = 3600L, maxLag = 30)
        .select(col("lag"), col("n_pairs"),
          (round(col("acf"), 6) + 0.0).as("acf"))
    }),

    "q231_exact_quantiles" -> ((s, dir) => {
      // exact discrete quantiles of lineitem prices at seven cuts —
      // quantile_disc parity via the distributed prefix sum (the KLL
      // sketch answers the same question with a rank epsilon; this is
      // the bit-exact contract form)
      ops.FeatureScale.exactQuantiles(t(s, dir, "lineitem"),
        "l_extendedprice", Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
        .select((round(col("q"), 6) + 0.0).as("q"), col("n"),
          (round(col("value"), 6) + 0.0).as("value"))
    }),

    "q250_trend_slope" -> ((s, dir) => {
      // robust vs OLS trend of the hourly event series: the exact
      // median of 259k pairwise slopes via the rank prefix sum
      val series = ops.EventStats.eventSeries(t(s, dir, "events"),
        "ts", bucketSeconds = 3600L)
      ops.EventStats.trendSlope(series, "t", "n")
        .select(col("n"), col("n_pairs"),
          (round(col("theil_sen"), 6) + 0.0).as("theil_sen"),
          (round(col("ols"), 6) + 0.0).as("ols"))
    }),

    "q252_png_decode" -> ((s, dir) => {
      // REAL PNG decode through the JDK's javax.imageio: the q56
      // analytic pixels re-encoded into a PNG container (lossless, so
      // the decoded dims and channel means stay exactly
      // oracle-checkable), decoded back through the format-sniffing
      // partition-local codec path
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizePng(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.decodeImages(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("channels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
    }),

    "q253_png_image_hash" -> ((s, dir) => {
      // perceptual hashes computed FROM PNG bytes: ImageIO decode must
      // reproduce the synthetic pixel formula bit-exactly for the
      // aHash/dHash oracle (same SQL as q131) to hold — the strongest
      // possible pin on the PNG decode path
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizePng(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.imageHashes(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"),
          shiftrightunsigned(col("ahash"), 32).as("ahash_hi"),
          col("ahash").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"))
    }),

    "q254_aiff_stats" -> ((s, dir) => {
      // REAL AIFF decode through the JDK's javax.sound.sampled: the
      // q57 analytic samples re-encoded into an AIFF container (PCM16
      // is lossless across containers), parsed back through the
      // format-sniffing partition-local audio path
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizeAiff(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.audioStats(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("channels"), col("sample_rate"),
          col("n_frames"), col("duration_us"), round(col("rms"), 6).as("rms"))
    }),

    "q255_image_quality" -> ((s, dir) => {
      // the multimodal curation screen: luminance/contrast/entropy
      // stats per image over MIXED ppm+png containers (sniffed
      // per row through the real decoders) — every statistic an
      // integer-exact sum so the oracle replays bit-for-bit
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id,
        if (id % 2 == 0) graft.ops.Media.synthesizePpm(id)
        else graft.ops.Media.synthesizePng(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.imageQualityStats(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("gray_min"), col("gray_max"),
          (round(col("gray_mean"), 6) + 0.0).as("gray_mean"),
          (round(col("gray_std"), 6) + 0.0).as("gray_std"),
          (round(col("frac_dark"), 6) + 0.0).as("frac_dark"),
          (round(col("frac_bright"), 6) + 0.0).as("frac_bright"),
          (round(col("entropy"), 6) + 0.0).as("entropy"),
          col("low_contrast"))
    }),

    "q256_image_resize" -> ((s, dir) => {
      // the thumbnail/normalize ingest step over MIXED ppm+png
      // containers: sniffing decode -> nearest-neighbor resize to 8x4
      // -> re-encode in the source container; dims + means measured on
      // the resized raster are analytic (the q119 oracle minus the
      // container-dependent byte size)
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id,
        if (id % 2 == 0) graft.ops.Media.synthesizePpm(id)
        else graft.ops.Media.synthesizePng(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.resizeImages(blobs, "doc_id", "blob", 8, 4)
        .select(col("id").as("doc_id"), col("format"),
          col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
    }),

    "q262_lenient_decode" -> ((s, dir) => {
      // crawl-ingest decode policy: planted corrupt blobs (id % 9 == 0
      // gets truncated-PNG garbage) cost their ROW, never the job —
      // survivors decode exactly as in q252, and the oracle replays
      // both the drop set and the survivors' analytic means
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map { id =>
        val blob =
          if (id % 9 == 0)
            graft.ops.Media.synthesizePng(id).take(12) // truncated PNG
          else if (id % 2 == 0) graft.ops.Media.synthesizePpm(id)
          else graft.ops.Media.synthesizePng(id)
        (id, blob)
      }.toDF("doc_id", "blob")
      graft.ops.Media.decodeImagesLenient(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"))
    }),

    "q273_profile_state" -> ((s, dir) => {
      // the raw-state intermediate (r17 profile_state): per-group state
      // binaries re-aggregate through profile_merge's BinaryType route —
      // the wide-profile per-column merge plan's building block, pinned
      // here on exact counters against plain SQL
      val li = t(s, dir, "lineitem")
      val states = li.groupBy(col("l_returnflag"))
        .agg(graft.functions.profile_state(col("l_quantity")).as("st"))
      states.agg(graft.functions.profile_merge(col("st")).as("p"))
        .select(col("p.count").as("cnt"),
          col("p.null_count").as("null_cnt"),
          (round(col("p.numbers.min"), 6) + 0.0).as("q_min"),
          (round(col("p.numbers.max"), 6) + 0.0).as("q_max"),
          (round(col("p.numbers.sum"), 4) + 0.0).as("q_sum"))
    }),

    "q274_wide_merge" -> ((s, dir) => {
      // the >= 64-column wide-profile plan (partials -> posexplode ->
      // per-column profile_merge -> reassembly) on the correctness
      // board: exact counters of four representative columns must match
      // plain SQL (sums restricted to integral-valued columns — exact
      // in double under any merge order)
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_orderkey")
      val wide = li.select((0 until 64).map(i =>
        (col(cols(i % 4)) + lit(i)).as(s"c$i")): _*)
      val prof = wide.newProfilingSession().aggProfiles()
      prof.select(
        col("c0.count").as("cnt0"),
        (round(col("c0.numbers.sum"), 4) + 0.0).as("sum0"),
        (round(col("c1.numbers.min"), 6) + 0.0).as("min1"),
        (round(col("c2.numbers.max"), 6) + 0.0).as("max2"),
        col("c3.numbers.long_min").as("lmin3"),
        col("c63.null_count").as("nulls63"))
    }),

    "q275_store_lifecycle" -> ((s, dir) => {
      // the streaming profile store's retention lifecycle end-to-end
      // on the correctness board: six simulated triggers append
      // batch=<id> partials of events keyed by event_type, batches
      // 0-3 fold into a checkpoint, vacuum deletes the covered dirs,
      // a second compaction folds the checkpoint + 4-5 into
      // compact_5, vacuum again (the store is now ONE directory) —
      // and mergeStored still equals the all-data profile EXACTLY:
      // the stored rows are partials of one monoid, so DuckDB
      // recomputes the emitted counters from plain SQL over the
      // same table
      val ev = t(s, dir, "events")
      val store = java.nio.file.Files
        .createTempDirectory("graft_q275_store_").toString
      (0L until 6L).foreach { b =>
        graft.streaming.StreamingProfile.storeBatchProfiles(
          ev.filter(pmod(col("event_id"), lit(6)) === b), b, store,
          keys = Seq("event_type"))
      }
      graft.streaming.StreamingProfile.compactStore(s, store, 3L)
      graft.streaming.StreamingProfile.vacuumStore(store)
      graft.streaming.StreamingProfile.compactStore(s, store, 5L)
      graft.streaming.StreamingProfile.vacuumStore(store)
      graft.streaming.StreamingProfile
        .mergeStored(s, store, Seq("event_type"))
        .select(col("event_type"),
          col("value.count").as("cnt"),
          (round(col("value.numbers.min"), 6) + 0.0).as("v_min"),
          (round(col("value.numbers.max"), 6) + 0.0).as("v_max"),
          (round(col("value.numbers.sum"), 4) + 0.0).as("v_sum"))
    }),

    "q272_dedup_yield" -> ((s, dir) => {
      // the operational dedup-yield report over the q257 planted
      // chains (a~a+100 for a<50, a+100~a+200 for a<25): 25 clusters
      // of 3 + 25 of 2 -> 50 clusters, 75 keep-one drops — every
      // field replays in closed form from the planting rule
      val docs = t(s, dir, "documents")
      val p1 = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("id_a"),
          (col("doc_id") + 100).as("id_b"))
      val p2 = docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 100).as("id_a"),
          (col("doc_id") + 200).as("id_b"))
      Dedup.dedupYield(docs, "doc_id", p1.unionAll(p2))
        .select(col("n_docs"), col("n_in_pairs"), col("n_clusters"),
          col("max_cluster_size"), col("n_dropped"),
          (round(col("drop_frac"), 6) + 0.0).as("drop_frac"),
          col("n_survivors"))
    }),

    "q271_compression" -> ((s, dir) => {
      // the deflate-compressibility quality screen (Gopher/FineWeb-
      // class repetitiveness signal, no model, no reference corpus):
      // planted boilerplate copies (doc_id < 50, text replaced by a
      // 200x-repeated phrase in SQL-derivable form) must flag below
      // ratio 0.2 while the whole corpus flows through one
      // partition-local deflate pass; CompressionSpec pins the margin
      // and repartition invariance
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat_ws(" ", array_repeat(lit("lorem ipsum dolor"), 200))
            .as("text"))
      graft.ops.TextOps.compressionRatio(
        docs.unionAll(planted), "doc_id", "text")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("id") >= 100000 && col("ratio") < 0.2, 1L)
            .otherwise(0L)).as("n_flagged_planted"))
    }),

    "q270_audio_meta" -> ((s, dir) => {
      // HEADER-ONLY audio metadata over mixed wav+aiff+au containers:
      // channels/rate/frames/duration from header bytes alone (no
      // sample decode — AudioMetaSpec proves truncated-payload AIFF/AU
      // still parse); every field replays analytically
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map { id =>
        val n = (200 + (id % 50) * 4).toInt
        val smp = Array.tabulate(n)(i => ((i * 37) % 2003 - 1001).toShort)
        val blob = (id % 3) match {
          case 0 => graft.ops.Media.encodeWavPcm16(8000, 1, smp)
          case 1 => graft.ops.Media.encodeAiffPcm16(8000, 1, smp)
          case _ => graft.ops.Media.encodeAuPcm16(8000, 1, smp)
        }
        (id, blob)
      }.toDF("doc_id", "blob")
      graft.ops.Media.audioMeta(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("format"), col("channels"),
          col("sample_rate"), col("bits_per_sample"), col("n_frames"),
          col("duration_us"))
    }),

    "q269_image_meta" -> ((s, dir) => {
      // HEADER-ONLY image metadata over mixed ppm+png+jpeg containers:
      // format/dims/depth from header bytes alone (no pixel decode —
      // ImageMetaSpec proves truncated-pixel blobs still parse); dims
      // replay analytically from the synthetic formula
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map { id =>
        val blob = (id % 3) match {
          case 0 => graft.ops.Media.synthesizePpm(id)
          case 1 => graft.ops.Media.synthesizePng(id)
          case _ => graft.ops.Media.synthesizeJpeg(id)
        }
        (id, blob)
      }.toDF("doc_id", "blob")
      graft.ops.Media.imageMeta(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), col("bit_depth"))
    }),

    "q268_video_fuzzy" -> ((s, dir) => {
      // radius-tolerant video dedup END-TO-END (the fuzzy twin of
      // q217, riding the multi-index-hashing frame join): planted
      // copies of doc_id < 20 whose every frame carries a small dark
      // patch (aHash drifts a few bits — the re-encode regime) must
      // pair with their originals at radius 10; the exact-match join
      // cannot serve these. Recovery count is the oracle;
      // VideoFuzzySpec pins routed == brute on real frame hashes.
      import s.implicits._
      def mkFrame(id: Long, f: Int, patch: Int): Array[Byte] = {
        val w = 32; val h = 24
        val px = Array.tabulate(w * h * 3) { i =>
          val p = i / 3; val x = p % w; val y = p / w
          ((id * 7 + f * 13 + 3 * x * x / (y + 1) + 5 * y) % 256).toByte
        }
        var y = 0
        while (y < patch) {
          var x = 0
          while (x < patch) {
            val p = (y * w + x) * 3
            px(p) = 0; px(p + 1) = 0; px(p + 2) = 0
            x += 1
          }
          y += 1
        }
        graft.ops.Media.encodePpm(graft.ops.Media.PpmImage(w, h, px))
      }
      def mkClip(id: Long, patch: Int): Array[Byte] =
        graft.ops.Media.encodeGvid(4000,
          (0 until 5).map(f => mkFrame(id, f, patch)))
      val ids = t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id")).as[Long]
      val clips = ids.flatMap { id =>
        val orig = Seq((id, mkClip(id, 0)))
        if (id < 20) orig :+ ((id + 100000L, mkClip(id, 6))) else orig
      }.toDF("doc_id", "blob")
      graft.ops.Media.videoNearDupsFuzzy(clips, "doc_id", "blob",
        maxHamming = 10, minSharedFrames = 2)
        .filter(col("id_b") === col("id_a") + 100000)
        .agg(count(lit(1)).as("n_recovered"))
    }),

    "q267_audio_shifted" -> ((s, dir) => {
      // time-shift-tolerant audio dedup END-TO-END: planted copies of
      // doc_id < 20 with 1..4 windows of prepended silence must pair
      // with their originals AT EXACTLY the planted offset (the
      // offset-voting contract — the blocked q204 join cannot recover
      // any of these); recovery count is the oracle, AudioShiftSpec
      // pins the sliding-fingerprint identities
      import s.implicits._
      val w = 32
      def mk(id: Long, n: Int): Array[Short] =
        Array.tabulate(n)(i =>
          (((id * 31 + i.toLong * 17 + (i * i) % 97) % 2003) - 1001).toShort)
      val ids = t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
      val blobs = ids.flatMap { id =>
        val base = mk(id, 50 * w)
        val orig = Seq((id, graft.ops.Media.encodeWavPcm16(8000, 1, base)))
        if (id < 20) {
          val sh = (1 + id % 4).toInt
          orig :+ ((id + 100000L, graft.ops.Media.encodeWavPcm16(8000, 1,
            new Array[Short](sh * w) ++ base)))
        } else orig
      }.toDF("doc_id", "blob")
      graft.ops.Media.audioNearDupsShifted(blobs, "doc_id", "blob",
        windowFrames = w, minSharedBlocks = 10)
        .filter(col("id_b") === col("id_a") + 100000 &&
          col("shift") === -(lit(1) + pmod(col("id_a"), lit(4))))
        .agg(count(lit(1)).as("n_recovered"))
    }),

    "q266_simhash_stored" -> ((s, dir) => {
      // incremental TEXT dedup against a stored 8-byte SimHash index —
      // the cheapest stored screen by state, with the WIDE radius
      // served by multi-index-hashing probe expansion against the
      // unchanged store: exact copies (of doc_id < 25) recover at
      // hamming 0 and one-word edits (of 25 <= doc_id < 50) recover at
      // radius 12; recovery counts are the oracle (the planting rule
      // alone — StoredSimHashSpec pins stored == brute).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.writeSimHashReference(docs.filter(col("doc_id") < 200),
        "doc_id", "text", "graft_q266_ref", numBuckets = 4)
      val batch = docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") >= 25 && col("doc_id") < 50)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(lit("edited "), expr("substring(text, 8)")).as("text")))
      Dedup.simHashNearDupsStored(batch, "graft_q266_ref",
        "doc_id", "text", maxHamming = 12)
        .agg(
          sum(when(col("ref_id") === col("new_id") - 100000 &&
            col("hamming") === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("ref_id") === col("new_id") - 200000, 1L)
            .otherwise(0L)).as("n_edit"))
    }),

    "q265_streaming_media" -> ((s, dir) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      // the windowed media-quality monitor END-TO-END as a real
      // streaming query (the q67 MemoryStream pattern): doc_id < 50
      // lands on day 1, 50..99 on day 2, two corrupt blobs planted on
      // day 1 — corrupt rows cost themselves (n_corrupt), never the
      // query; verdict counts and gray extremes replay analytically
      // from the synthetic pixel formula (the q255 oracle, grouped by
      // the planted day). The collect below CONSTRUCTS the
      // fixture-scale stream source; it is not a query-path collect.
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long].collect().sorted
      val rows = ids.toIndexedSeq.map { id =>
        val day = if (id < 50) 1 else 2
        (java.sql.Timestamp.valueOf(f"2024-03-0$day 06:00:00"), id,
          if (id % 2 == 0) graft.ops.Media.synthesizePpm(id)
          else graft.ops.Media.synthesizePng(id))
      } ++ IndexedSeq(
        (java.sql.Timestamp.valueOf("2024-03-01 07:00:00"), 1000L,
          "not an image".getBytes("UTF-8")),
        (java.sql.Timestamp.valueOf("2024-03-01 08:00:00"), 1001L,
          Array[Byte](1, 2, 3)))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long, Array[Byte])]
      val stream = input.toDF().toDF("ts", "doc_id", "blob")
      val mon = graft.streaming.StreamingMedia.imageQualityMonitor(
        stream, "ts", "1 day", "1 minute", "doc_id", "blob")
      val name = "q265_mem_" + java.util.UUID.randomUUID().toString
        .replace("-", "")
      val q = mon.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        input.addData(rows)
        q.processAllAvailable()
      } finally q.stop()
      s.table(name).select(
        col("window.start").cast("date").cast("string").as("day"),
        col("n"), col("n_corrupt"), col("n_low_contrast"),
        col("gray_min"), col("gray_max"))
    }),

    "q263_mih_neardups" -> ((s, dir) => {
      // the wide-radius Hamming regime END-TO-END through multi-index
      // hashing (the route that replaced the >100k-hash refusal at
      // radius 4..15): planted one-word edits of doc_id < 50 must pair
      // with their originals within Hamming 12 — the SimHash drift of
      // a single leading-word rewrite on these fixture docs (and the
      // pHash JPEG-recompression radius class). Recovery count is the
      // oracle; MihHammingSpec pins routed == brute exhaustively.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val edits = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("edited "), expr("substring(text, 8)")).as("text"))
      Dedup.simHashNearDups(docs.unionAll(edits), "doc_id", "text",
        maxHamming = 12)
        .filter(col("id_b") === col("id_a") + 100000)
        .agg(count(lit(1)).as("n_recovered"))
    }),

    "q264_nested_profile" -> ((s, dir) => {
      // nested-column profiling (the reference degrades non-primitives
      // to UNKNOWN; flattenNested sees inside): a struct of
      // (n_chars, lang), a words array, and a source->n_chars map
      // profile in ONE aggregate pass — struct leaves as dotted paths,
      // arrays/maps as element + size profiles, all DuckDB-replayable
      // via UNNEST / string_split
      val docs = t(s, dir, "documents").select(
        struct(col("n_chars").as("len"), col("lang").as("lg")).as("meta"),
        split(col("text"), " ").as("words"),
        map(col("source"), col("n_chars")).as("src_len"))
      docs.newProfilingSession().flattenNested().aggProfiles()
        .select(
          col("`meta.len`.numbers.count").as("len_n"),
          col("`meta.len`.numbers.min").cast("long").as("len_min"),
          col("`meta.len`.numbers.max").cast("long").as("len_max"),
          round(col("`meta.len`.numbers.mean"), 6).as("len_mean"),
          col("`meta.lg`.strings.count").as("lg_n"),
          col("`meta.lg`.strings.length.min").cast("long").as("lg_len_min"),
          col("`words`.strings.count").as("w_n"),
          col("`words`.strings.length.sum").cast("long").as("w_len_sum"),
          round(col("`words`.strings.length.mean"), 6).as("w_len_mean"),
          col("`words.size`.numbers.min").cast("long").as("wsz_min"),
          col("`words.size`.numbers.max").cast("long").as("wsz_max"),
          round(col("`words.size`.numbers.mean"), 6).as("wsz_mean"),
          col("`src_len`.numbers.count").as("sv_n"),
          col("`src_len`.numbers.sum").cast("long").as("sv_sum"),
          col("`src_len.keys`.strings.count").as("sk_n"),
          col("`src_len.size`.numbers.max").cast("long").as("msz_max"))
    }),

    "q261_simhash_neardups" -> ((s, dir) => {
      // the banded SimHash near-dup join END-TO-END (bucket shuffle,
      // capped pair generation, exact Hamming verify): planted exact
      // copies (doc_id + 100000 for doc_id < 50) MUST pair at
      // Hamming 0; the count of recovered planted pairs is the
      // hash-checked oracle (q127 pins fingerprint equality; this
      // pins the JOIN finds them)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val union = docs.unionAll(
        docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.simHashNearDups(union, "doc_id", "text", maxHamming = 0)
        .filter(col("id_b") === col("id_a") + 100000)
        .agg(count(lit(1)).as("n_recovered"))
    }),

    "q260_video_diversity" -> ((s, dir) => {
      // the frozen-capture video screen: planted static videos
      // (id % 6 == 0 repeats ONE frame) against normal multi-frame
      // clips — distinct perceptual frame appearances per video decide
      // the verdict; the oracle replays the planting scheme (distinct
      // analytic frames hash distinctly — deterministic fixture)
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map { id =>
        val n = (2 + id % 3).toInt
        val frames =
          if (id % 6 == 0)
            Vector.fill(n)(graft.ops.Media.synthesizePpm(id * 31L))
          else (0 until n)
            .map(f => graft.ops.Media.synthesizePpm(id * 31L + f))
        (id, graft.ops.Media.encodeGvid(4000, frames))
      }.toDF("doc_id", "blob")
      graft.ops.Media.videoFrameDiversity(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("n_sampled"),
          col("n_distinct"), round(col("diversity"), 6).as("diversity"),
          col("static"))
    }),

    "q259_audio_quality" -> ((s, dir) => {
      // the speech-corpus curation screen: clipping / silence / ZCR
      // verdicts over planted quality regimes (id%7 clips at the
      // rails, id%5 is near-silent, rest is the plain ramp) — every
      // statistic integer-exact or a single IEEE op, so the oracle
      // replays bit-for-bit
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val blobs = ids
        .map(id => (id, graft.ops.Media.synthesizeWavQuality(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.audioQualityStats(blobs, "doc_id", "blob")
        .select(col("id").as("doc_id"), col("channels"),
          col("sample_rate"), col("n_samples"),
          round(col("rms"), 6).as("rms"), col("peak"),
          round(col("clip_frac"), 6).as("clip_frac"),
          round(col("silence_frac"), 6).as("silence_frac"),
          col("zero_crossings"), col("clipped"), col("near_silent"))
    }),

    "q258_source_separation" -> ((s, dir) => {
      // data-mix diagnostic: does each label occupy its own region of
      // embedding space? one vec_sum aggregate builds the K centroids,
      // members score against their own centroid via broadcast, the
      // K x K confusion comparison stays on the aggregate output
      ops.Similarity.sourceSeparation(t(s, dir, "embeddings"),
        "label", "embedding")
        .select(col("key").cast("int").as("label"), col("n"),
          (round(col("centroid_norm"), 6) + 0.0).as("centroid_norm"),
          (round(col("intra_cos"), 6) + 0.0).as("intra_cos"),
          col("nearest_key").cast("int").as("nearest_label"),
          (round(col("nearest_cos"), 6) + 0.0).as("nearest_cos"),
          (round(col("separation"), 6) + 0.0).as("separation"))
    }),

    "q257_leakage_safe_split" -> ((s, dir) => {
      // near-duplicates must not straddle train/val/test (a test doc
      // whose near-copy sits in train leaks the answer): planted dup
      // chains (a~a+100 for a<50, a+100~a+200 for a<25) collapse into
      // components whose min id is the split key for every member —
      // the oracle replays the component map in closed form and the
      // same md5-52-bit cutoffs as q77
      val docs = t(s, dir, "documents")
      val p1 = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("id_a"),
          (col("doc_id") + 100).as("id_b"))
      val p2 = docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 100).as("id_a"),
          (col("doc_id") + 200).as("id_b"))
      graft.ops.Sampling.leakageSafeSplit(docs, "doc_id",
        p1.unionAll(p2),
        Map("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    }),

    "q251_categorical_profile" -> ((s, dir) => {
      // exact distribution shape of event_type: entropy / impurity /
      // majority share from one count aggregate
      ops.Stats.categoricalProfile(t(s, dir, "events"), "event_type")
        .select(col("n"), col("cardinality"),
          (round(col("entropy"), 6) + 0.0).as("entropy"),
          (round(col("normalized_entropy"), 6) + 0.0)
            .as("normalized_entropy"),
          (round(col("gini_impurity"), 6) + 0.0).as("gini_impurity"),
          (round(col("top_share"), 6) + 0.0).as("top_share"))
    }),

    "q249_change_point" -> ((s, dir) => {
      // WHEN did the level shift: planted +25 step at bucket 500 over
      // per-bucket mean quantities — all n-1 splits scored from one
      // prefix-sum pass, argmax is a 1-row min_by
      val series = t(s, dir, "lineitem")
        .groupBy((col("l_orderkey") % 1000).as("t"))
        .agg(avg(col("l_quantity")).as("base"))
        .withColumn("v", col("base") +
          when(col("t") >= 500, 25.0).otherwise(0.0))
      ops.EventStats.changePoint(series, "t", "v")
        .select(col("n"), col("split_t"), col("n_left"),
          (round(col("mean_left"), 6) + 0.0).as("mean_left"),
          (round(col("mean_right"), 6) + 0.0).as("mean_right"),
          (round(col("sse_global"), 6) + 0.0).as("sse_global"),
          (round(col("sse_split"), 6) + 0.0).as("sse_split"),
          (round(col("reduction"), 6) + 0.0).as("reduction"))
    }),

    "q247_welch_by_segment" -> ((s, dir) => {
      // the experiment-readout table: one t-test per event-type
      // segment, all segments from ONE aggregate
      val ev = t(s, dir, "events")
        .withColumn("grp",
          when(col("user_id") % 2 === 0, "a").otherwise("b"))
      ops.Stats.welchTTestBy(ev, Seq("event_type"), "grp", "value",
        "a", "b")
        .select(col("event_type"), col("n_a"), col("n_b"),
          (round(col("mean_a"), 6) + 0.0).as("mean_a"),
          (round(col("mean_b"), 6) + 0.0).as("mean_b"),
          (round(col("diff"), 6) + 0.0).as("diff"),
          (round(col("se"), 6) + 0.0).as("se"),
          (round(col("t_stat"), 6) + 0.0).as("t_stat"),
          (round(col("df"), 6) + 0.0).as("df"))
    }),

    "q248_seasonal_anomalies" -> ((s, dir) => {
      // alert on departures FROM the daily shape, not on the shape:
      // decompose the hourly series, flag |residual z| > 2
      val series = ops.EventStats.eventSeries(t(s, dir, "events"),
        "ts", bucketSeconds = 3600L)
      ops.EventStats.seasonalAnomalies(series, "t", "n", period = 24,
        trendWindow = 12, zThreshold = 2.0)
        .select(col("t"), col("v"),
          (round(col("trend"), 6) + 0.0).as("trend"),
          (round(col("seasonal"), 6) + 0.0).as("seasonal"),
          (round(col("residual"), 6) + 0.0).as("residual"),
          (round(col("z"), 6) + 0.0).as("z"))
    }),

    "q246_quantile_effects" -> ((s, dir) => {
      // distributional A/B: per-quantile account-balance gap between
      // the q223 cohorts — what the mean test nets away
      val sup = t(s, dir, "supplier").withColumn("cohort",
        when(col("s_nationkey") < 12, "old").otherwise("new"))
      ops.Stats.quantileTreatmentEffects(sup, "cohort", "s_acctbal",
        Seq(0.1, 0.25, 0.5, 0.75, 0.9), "old", "new")
        .select((round(col("q"), 6) + 0.0).as("q"), col("n_a"),
          col("n_b"), (round(col("value_a"), 6) + 0.0).as("value_a"),
          (round(col("value_b"), 6) + 0.0).as("value_b"),
          (round(col("qte"), 6) + 0.0).as("qte"))
    }),

    "q245_weighted_quantiles" -> ((s, dir) => {
      // token-budget cut: what doc-length ceiling keeps 50/90/99% of
      // the CHARS (not of the documents) — weighted order statistics
      ops.FeatureScale.weightedQuantiles(t(s, dir, "documents"),
        "n_chars", col("n_chars"), Seq(0.5, 0.9, 0.99))
        .select((round(col("q"), 6) + 0.0).as("q"), col("n"),
          col("value"))
    }),

    "q244_table_checksum" -> ((s, dir) => {
      // migration parity: order-insensitive md5-mod-sum digests of the
      // orders table, full-row + per-column — one aggregate
      ops.Diagnostics.tableChecksum(t(s, dir, "orders"),
        Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
    }),

    "q241_simpson_check" -> ((s, dir) => {
      // confounding screen: even/odd-user value gap, pooled vs
      // stratified by event type — one (stratum, arm) aggregate
      val ev = t(s, dir, "events")
        .withColumn("treat", col("user_id") % 2 === 0)
      ops.Stats.simpsonCheck(ev, "treat", "value", "event_type")
        .select(col("n"), col("n_strata"),
          (round(col("pooled_diff"), 6) + 0.0).as("pooled_diff"),
          (round(col("stratified_diff"), 6) + 0.0)
            .as("stratified_diff"),
          col("n_disagreeing_strata"), col("flipped"))
    }),

    "q242_trimmed_mean" -> ((s, dir) => {
      // robust location: mean inside the exact 1-99% quantile cuts —
      // cuts from the distributed order statistics, one filtered agg
      ops.Stats.trimmedMean(t(s, dir, "lineitem"), "l_extendedprice",
        loQ = 0.01, hiQ = 0.99)
        .select(col("n"), col("n_kept"),
          (round(col("lo_cut"), 6) + 0.0).as("lo_cut"),
          (round(col("hi_cut"), 6) + 0.0).as("hi_cut"),
          (round(col("trimmed_mean"), 6) + 0.0).as("trimmed_mean"))
    }),

    "q243_ratio_test" -> ((s, dir) => {
      // ratio-metric A/B (purchases per event, per user): delta-method
      // variance — sum/sum ratio, never the mean of per-unit ratios
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1.0)
          .otherwise(0.0)).as("x"),
          count(lit(1)).cast("double").as("y"))
        .withColumn("grp",
          when(col("user_id") % 2 === 0, "a").otherwise("b"))
      ops.Stats.ratioTest(units, "grp", "x", "y", "a", "b")
        .select(col("n_a"), col("n_b"),
          (round(col("ratio_a"), 6) + 0.0).as("ratio_a"),
          (round(col("ratio_b"), 6) + 0.0).as("ratio_b"),
          (round(col("diff"), 6) + 0.0).as("diff"),
          (round(col("se"), 6) + 0.0).as("se"),
          (round(col("z"), 6) + 0.0).as("z"))
    }),

    "q240_name_match_blocked" -> ((s, dir) => {
      // Fellegi-Sunter linkage: block on an external high-entropy key
      // (id mod 50 standing in for a zip), fuzzy-match the name inside
      // the block only — low-entropy names never explode the blocks
      val base = t(s, dir, "part").select(col("p_partkey").as("id"),
        concat(col("p_name"), lit(" #"), col("p_partkey") % 100)
          .as("key"), pmod(col("p_partkey"), lit(50)).as("blk"))
      val typod = base.select((col("id") + 100000).as("id"),
        concat(substring(col("key"), 1, 2), substring(col("key"), 4,
          1000000)).as("key"), col("blk"))
      ops.Joins.nameMatchPairsBlocked(base, typod, "id", "key", "blk",
        minSim = 0.95)
        .select(col("left_id"), col("right_id"),
          (round(col("sim"), 6) + 0.0).as("sim"))
    }),

    "q237_proportion_test" -> ((s, dir) => {
      // conversion-rate A/B: purchase rate between even/odd user
      // cohorts — pooled two-sample z, one aggregate
      val ev = t(s, dir, "events")
        .withColumn("grp",
          when(col("user_id") % 2 === 0, "a").otherwise("b"))
        .withColumn("conv", col("event_type") === "purchase")
      ops.Stats.proportionTest(ev, "grp", "conv", "a", "b")
        .select(col("n_a"), col("n_b"),
          (round(col("p_a"), 6) + 0.0).as("p_a"),
          (round(col("p_b"), 6) + 0.0).as("p_b"),
          (round(col("diff"), 6) + 0.0).as("diff"),
          (round(col("z"), 6) + 0.0).as("z"))
    }),

    "q238_cuped" -> ((s, dir) => {
      // CUPED adjustment of account balance by the nation covariate:
      // theta from one moment aggregate, row-local projection
      ops.Stats.cuped(t(s, dir, "supplier"), "s_acctbal",
        "s_nationkey")
        .select(col("s_suppkey"),
          (round(col("adjusted"), 6) + 0.0).as("adjusted"))
    }),

    "q239_srm_check" -> ((s, dir) => {
      // sample-ratio mismatch vs a designed 1:1:1:1 split with one
      // event type deliberately unlisted — n_unlisted IS the bug
      ops.Stats.srmCheck(t(s, dir, "events"), "event_type",
        Seq("signup" -> 1.0, "click" -> 1.0, "view" -> 1.0,
          "purchase" -> 1.0))
        .select(col("group").as("grp"), col("n_obs"),
          (round(col("n_expected"), 6) + 0.0).as("n_expected"),
          (round(col("contrib"), 6) + 0.0).as("contrib"),
          col("n"), col("n_unlisted"),
          (round(col("chi2"), 6) + 0.0).as("chi2"))
    }),

    "q233_welch_ttest" -> ((s, dir) => {
      // A/B read on the q223 cohorts: does the account-balance MEAN
      // differ — unequal-variance t, one map-side-combined aggregate
      val sup = t(s, dir, "supplier").withColumn("cohort",
        when(col("s_nationkey") < 12, "old").otherwise("new"))
      ops.Stats.welchTTest(sup, "cohort", "s_acctbal", "old", "new")
        .select(col("n_a"), col("n_b"),
          (round(col("mean_a"), 6) + 0.0).as("mean_a"),
          (round(col("mean_b"), 6) + 0.0).as("mean_b"),
          (round(col("diff"), 6) + 0.0).as("diff"),
          (round(col("se"), 6) + 0.0).as("se"),
          (round(col("t_stat"), 6) + 0.0).as("t_stat"),
          (round(col("df"), 6) + 0.0).as("df"))
    }),

    "q234_mann_whitney" -> ((s, dir) => {
      // the rank-based twin on the same cohorts: tie-corrected U/z via
      // the distinct-value counts prefix sum (the AUC plan)
      val sup = t(s, dir, "supplier").withColumn("cohort",
        when(col("s_nationkey") < 12, "old").otherwise("new"))
      ops.Stats.mannWhitney(sup, "cohort", "s_acctbal", "old", "new")
        .select(col("n_a"), col("n_b"),
          (round(col("u"), 6) + 0.0).as("u"),
          (round(col("z"), 6) + 0.0).as("z"))
    }),

    "q235_rater_agreement" -> ((s, dir) => {
      // label-QA screen: a second rater that disagrees on every 7th
      // doc — po/pe/kappa from one contingency aggregate
      val d = t(s, dir, "documents").select(col("lang").as("rater_a"),
        when(col("doc_id") % 7 === 0, lit("xx"))
          .otherwise(col("lang")).as("rater_b"))
      ops.Stats.agreementReport(d, "rater_a", "rater_b")
        .select(col("n"), (round(col("po"), 6) + 0.0).as("po"),
          (round(col("pe"), 6) + 0.0).as("pe"),
          (round(col("kappa"), 6) + 0.0).as("kappa"))
    }),

    "q236_decompose" -> ((s, dir) => {
      // trend + daily-shape + residual of the hourly event series:
      // the moving average via offsets explode (never a global-sort
      // window), seasonal as a 24-row broadcast
      val series = ops.EventStats.eventSeries(t(s, dir, "events"),
        "ts", bucketSeconds = 3600L)
      ops.EventStats.decompose(series, "t", "n", period = 24,
        trendWindow = 12)
        .select(col("t"), col("v"),
          (round(col("trend"), 6) + 0.0).as("trend"),
          (round(col("seasonal"), 6) + 0.0).as("seasonal"),
          (round(col("residual"), 6) + 0.0).as("residual"))
    }),

    "q232_name_match" -> ((s, dir) => {
      // blocked Jaro-Winkler record linkage: clean part names vs a
      // deterministically typo'd copy (3rd char dropped) — planted
      // matches recover through the (prefix, length-band) blocks; the
      // scorer is the codegen'd native expression
      val base = t(s, dir, "part").select(col("p_partkey").as("id"),
        concat(col("p_name"), lit(" #"), col("p_partkey") % 100)
          .as("key"))
      val typod = base.select((col("id") + 100000).as("id"),
        concat(substring(col("key"), 1, 2), substring(col("key"), 4,
          1000000)).as("key"))
      ops.Joins.nameMatchPairs(base, typod, "id", "key",
        minSim = 0.95)
        .select(col("left_id"), col("right_id"),
          (round(col("sim"), 6) + 0.0).as("sim"))
    }),

    "q224_categorical_tvd" -> ((s, dir) => {
      // categorical total-variation drift from the q114 sketches:
      // the plain fraction of shifted mass, next to PSI's log-ratio
      // weighting — sketch-exact regime, scalar expression
      val ev = t(s, dir, "events").select(col("event_type"),
        (col("user_id") % 2 === 0).as("is_a"))
      ev.agg(
        graft.functions.freq_items_agg(
          when(col("is_a"), col("event_type"))).as("sk_a"),
        graft.functions.freq_items_agg(
          when(!col("is_a"), col("event_type"))).as("sk_b"))
        .select(
          ops.Drift.categoricalTotal(col("sk_a")).as("n_a"),
          ops.Drift.categoricalTotal(col("sk_b")).as("n_b"),
          (round(ops.Drift.categoricalTvd(col("sk_a"), col("sk_b")), 6)
            + 0.0).as("tvd"))
    }),

    "q223_emd_drift" -> ((s, dir) => {
      // Wasserstein-1 drift between the q128 cohorts from their KLL
      // sketches alone: how far (in account-balance units) did the
      // mass move — the magnitude companion to the KS max gap
      val sup = t(s, dir, "supplier")
      val edges = Seq(0.0, 2500.0, 5000.0, 7500.0)
      val sketches = sup
        .withColumn("cohort",
          when(col("s_nationkey") < 12, "old").otherwise("new"))
        .groupBy(col("cohort"))
        .agg(kll_agg(col("s_acctbal")).as("sk"), count(lit(1)).as("n"))
      val a = sketches.filter(col("cohort") === "old")
        .select(col("sk").as("sk_a"), col("n").as("n_a"))
      val b = sketches.filter(col("cohort") === "new")
        .select(col("sk").as("sk_b"), col("n").as("n_b"))
      a.crossJoin(b).select(col("n_a"), col("n_b"),
        round(graft.ops.Drift.emd(col("sk_a"), col("sk_b"), edges), 6)
          .as("emd"))
    }),

    "q221_strip_markup" -> ((s, dir) => {
      // crawl-text cleanup: inject tags + entities around every doc,
      // strip tag-level markup, decode entities (&amp; last), collapse
      // runs — every branch crosses the DuckDB compare
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("<p class=\"x\">"), col("text"),
          lit("</p>\t<br/>fish &amp;lt; chips &quot;q&#39;s&quot; "),
          lit("&nbsp;&gt;end&lt;")).as("text"))
      d.select(col("doc_id"),
        ops.TextOps.markupTagCount(col("text")).as("n_tags"),
        ops.TextOps.stripMarkup(col("text")).as("text"))
    }),

    "q222_url_dedup" -> ((s, dir) => {
      // crawl-frontier dedup: host case, tracking query, fragment,
      // and trailing slash all collapse to one canonical fetch
      val urls = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("https://Site"), col("doc_id") % 7,
          lit(".Example/Page"), col("doc_id") % 3,
          when(col("doc_id") % 2 === 0,
            lit("/?utm_source=x#frag")).otherwise(lit("")))
          .as("url"))
      ops.TextOps.urlDedup(urls, "doc_id", "url")
    }),

    "q220_phash_stored" -> ((s, dir) => {
      // the stored pHash screen (q194's frequency-domain twin): PPM
      // fixtures persist as pHash band buckets, exact copies probe,
      // every copy recovers its original at hamming 0
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val ref = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.writePHashReference(ref, "doc_id", "blob",
        "graft_q220_ref", numBuckets = 4)
      val batch = ids.filter(_ < 40)
        .map(id => (id + 100000L, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.pHashNearDupsStored(batch, "graft_q220_ref",
        "doc_id", "blob", maxHamming = 0)
        .filter(col("ref_id") === col("new_id") - 100000L)
        .select(col("ref_id").as("doc_id"), col("new_id").as("dup_id"),
          col("hamming").cast("long").as("hamming"))
    }),

    "q219_feature_relevance" -> ((s, dir) => {
      // which columns predict the order status? priority (weak
      // signal) vs custkey (near-unique key — the case the scaladoc
      // warns about, included to exercise the cardinality columns)
      ops.Stats.featureRelevance(t(s, dir, "orders"),
        Seq("o_orderpriority", "o_custkey"), "o_orderstatus")
        .select(col("feature"),
          (round(col("mi"), 6) + 0.0).as("mi"),
          (round(col("chi2"), 6) + 0.0).as("chi2"),
          (round(col("cramers_v"), 6) + 0.0).as("cramers_v"),
          col("n"), col("card_feature"), col("card_label"))
    }),

    "q218_hard_negatives" -> ((s, dir) => {
      // contrastive data prep: top-3 most-similar DIFFERENT-label
      // vector per anchor; the limit(500) bounds the broadcast side
      // in-plan (the labeled-seed-set contract made visible)
      ops.Similarity.hardNegatives(
        t(s, dir, "embeddings").limit(500), "vec_id", "embedding",
        "label", k = 3)
        .select(col("anchor_id"), col("negative_id"),
          (round(col("cosine"), 6) + 0.0).as("cosine"), col("rank"))
    }),

    "q217_video_dups" -> ((s, dir) => {
      // fourth dedup modality: planted exact video copies at +100000
      // share every sampled-frame aHash, so the bucketed pair join
      // must recover each planted pair (q126 pattern; the shared-frame
      // count semantics are spec-pinned where SQL cannot hash frames)
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id")).as[Long]
      val vids = ids.map(id => (id,
        graft.ops.Media.synthesizeGvid(id, 3 + (id % 3).toInt)))
        .toDF("doc_id", "blob")
      val planted = ids.map(id => (id + 100000L,
        graft.ops.Media.synthesizeGvid(id, 3 + (id % 3).toInt)))
        .toDF("doc_id", "blob")
      graft.ops.Media.videoNearDups(vids.unionAll(planted),
        "doc_id", "blob", everyN = 1, minSharedFrames = 1)
        .filter(col("id_b") === col("id_a") + 100000 &&
          col("id_a") < 40)
        .select(col("id_a").as("doc_id"), col("id_b").as("dup_id"))
    }),

    "q216_semantic_contamination" -> ((s, dir) => {
      // embedding-space decontamination: vectors 450+ play the eval
      // benchmark while remaining in the train corpus, so every eval
      // doc must flag its own train twin at cosine 1.0 (plus any true
      // near-neighbors the n-gram screens would miss)
      val emb = t(s, dir, "embeddings")
      ops.Similarity.semanticContamination(emb,
        emb.filter(col("vec_id") >= 450), "vec_id", "embedding",
        threshold = 0.99)
    }),

    "q215_trigram_perplexity" -> ((s, dir) => {
      // stupid-backoff trigram LM at minCount=2: the floor prunes
      // singleton tri/bigrams, so all three backoff branches score
      // real positions (at minCount=1 every observed trigram is
      // "seen" and the backoff never fires)
      graft.ops.TextOps.trigramPerplexity(t(s, dir, "documents"),
        "doc_id", "text", alpha = 0.4, minCount = 2L)
        .select(col("id").as("doc_id"), col("n_trigrams"),
          round(col("perplexity"), 6).as("perplexity"))
    }),

    "q214_phash_dups" -> ((s, dir) => {
      // HASH-CHECKED invariant for the DCT perceptual hash: an exact
      // image copy has the identical pHash, so every band collides and
      // the banded join must recover the planted pair at Hamming 0.
      // Copies of the doc_id<60 synthetic PPMs plant at +100000; the
      // oracle replays the planting rule (q126 pattern). Perturbation
      // robustness (brightness/contrast invariants) is spec-pinned in
      // MediaSpec where SQL cannot follow the DCT.
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
      val blobs = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      val planted = blobs.select((col("doc_id") + 100000).as("doc_id"),
        col("blob"))
      graft.ops.Media.pHashNearDups(blobs.unionAll(planted),
        "doc_id", "blob", maxHamming = 0)
        .filter(col("id_b") === col("id_a") + 100000 &&
          col("id_a") < 60)
        .select(col("id_a").as("doc_id"), col("id_b").as("dup_id"),
          col("hamming"))
    }),

    "q213_embedding_outliers" -> ((s, dir) => {
      // out-of-distribution vector screen: diagonal-Mahalanobis energy
      // against the corpus's own per-dim moments, top 20
      ops.Similarity.embeddingOutliers(t(s, dir, "embeddings"),
        "vec_id", "embedding", topK = 20)
    }),

    "q211_benford" -> ((s, dir) => {
      // numeric-quality screen: leading-digit distribution of order
      // totals vs the Benford expectation (TPC-H's uniform prices
      // fail loudly — exactly what the screen is for)
      ops.Diagnostics.benford(t(s, dir, "orders"), "o_totalprice")
    }),

    "q212_functional_deps" -> ((s, dir) => {
      // does the corpus respect the dependencies a schema implies?
      // orderkey->custkey holds (orderkey unique), custkey->priority
      // does not (customers order at many priorities); price->custkey
      // probes whether a near-unique double column is a safe key
      ops.Diagnostics.functionalDependencies(t(s, dir, "orders"),
        Seq("o_orderkey" -> "o_custkey",
          "o_custkey" -> "o_orderpriority",
          "o_totalprice" -> "o_custkey"))
    }),

    "q207_seasonality" -> ((s, dir) => {
      // hour-of-week traffic profile: 168-cell aggregate with
      // integer-exact bucketing (epoch-micros div, no calendar
      // functions — engines disagree on week starts)
      ops.EventStats.seasonality(t(s, dir, "events"), "ts")
        .select(col("dow"), col("hour"), col("n"),
          (round(col("share"), 6) + 0.0).as("share"),
          (round(col("lift"), 6) + 0.0).as("lift"))
    }),

    "q206_orc_sink" -> ((s, dir) => {
      // ORC source/sink round trip (the second columnar format beside
      // parquet, q66): grouped profiles written as typed ORC structs —
      // sketch bytes ride as binary — read back, metrics re-derived
      // from the stored rows. Profiles survive any columnar store
      // Spark can write; the engine is not parquet-bound.
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q206").toString
      t(s, dir, "lineitem").newProfilingSession()
        .groupBy("l_returnflag")
        .aggProfiles().write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).select(col("l_returnflag"),
        col("l_quantity.count").as("n"),
        col("l_quantity.numbers.min").as("qty_min"),
        col("l_quantity.numbers.max").as("qty_max"),
        round(col("l_quantity.numbers.sum"), 2).as("qty_sum"))
    }),

    "q205_audio_stored" -> ((s, dir) => {
      // incremental AUDIO dedup against a stored fingerprint index
      // (q194's audio twin, completing the stored-screen family):
      // white-noise clips for doc_id < 60 persist as (block, fp)
      // buckets, a batch of 4x-amplified copies (+1000) probes them,
      // and every copy recovers its original on ALL blocks (power-of-
      // two scaling keeps the Goertzel recursion bit-exact). Oracle
      // from the planting rule + closed-form block count.
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
      val ref = ids.map(id =>
        (id, graft.ops.Media.synthesizeWavNoise(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.writeAudioFpReference(ref, "doc_id", "blob",
        "graft_q205_ref", windowFrames = 16, numBuckets = 4)
      val batch = ids.filter(col("doc_id") < 20).map { id =>
        val base = graft.ops.Media.synthesizeWavNoise(id)
        val buf = java.nio.ByteBuffer.wrap(base.clone())
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 44
        while (i + 1 < base.length) {
          buf.putShort(i, (buf.getShort(i) * 4).toShort); i += 2
        }
        (id + 1000L, buf.array())
      }.toDF("doc_id", "blob")
      graft.ops.Media.audioNearDupsStored(batch, "graft_q205_ref",
        "doc_id", "blob", windowFrames = 16, minSharedBlocks = 2)
        .filter(col("ref_id") === col("new_id") - 1000L)
        .select(col("ref_id").as("doc_id"),
          col("new_id").as("dup_id"), col("n_shared"))
    }),

    "q200_curation_funnel" -> ((s, dir) => {
      // the curation funnel: per source, attrition through an ordered
      // screen chain (token range -> length cap -> readability floor),
      // all prefix-counted in ONE corpus scan; every condition is
      // SQL-exact so the oracle replays the whole funnel
      val toks = ops.TextOps.tokenCount(col("text"))
      val r = ops.TextOps.readability(col("text"))
      ops.Curation.funnelReport(t(s, dir, "documents"), "source", Seq(
        "token_range" -> (toks >= 40 && toks <= 100),
        "length_cap" -> (col("n_chars") <= 450),
        "readable" -> (r.getField("flesch") >= 0)))
        .select(col("group"), col("stage"), col("stage_name"),
          col("n_in"), col("n_out"),
          (round(col("keep_rate"), 6) + 0.0).as("keep_rate"))
    }),

    "q199_survival_grouped" -> ((s, dir) => {
      // per-cohort KM curves in one pass: the windows partition on the
      // cohort, so no single-partition global sort exists at all — the
      // scale-correct form of q195 for many simultaneous cohorts
      val tte = ops.EventStats.timeToEvent(t(s, dir, "events"),
        "user_id", "ts", "event_type", "purchase")
        .select(pmod(col("key"), lit(2)).cast("string").as("g"),
          expr("duration div 3600000000").as("dh"), col("observed"))
      ops.EventStats.kaplanMeierGrouped(tte, "dh", "observed", "g")
        .select(col("group"), col("t"), col("n_risk"), col("n_events"),
          col("n_censored"),
          (round(col("survival"), 6) + 0.0).as("survival"))
    }),

    "q198_ltv_curve" -> ((s, dir) => {
      // cohort LTV: cumulative revenue per acquired user by cohort
      // age; cohort size reads back from the offset-0 cell via a
      // window, so the events aggregate exactly once
      ops.Retention.ltvCurve(t(s, dir, "events"), "user_id", "ts",
        "value")
        .select(col("cohort_day"), col("day_offset"), col("n_active"),
          col("cohort_users"),
          (round(col("revenue"), 6) + 0.0).as("revenue"),
          (round(col("cum_revenue"), 6) + 0.0).as("cum_revenue"),
          (round(col("ltv"), 6) + 0.0).as("ltv"))
    }),

    "q197_rfm" -> ((s, dir) => {
      // RFM segmentation per user: recency anchored on the corpus max
      // event time (replay-exact), ntile scores with key tie-breaks so
      // both engines cut identically, monetary ranked on its ROUNDED
      // value (reduction-order independence)
      ops.EventStats.rfm(t(s, dir, "events"), "user_id", "ts", "value")
        .select(col("key"), col("recency_s"), col("frequency"),
          (round(col("monetary"), 6) + 0.0).as("monetary"),
          col("r_score"), col("f_score"), col("m_score"),
          col("rfm").cast("long").as("rfm"))
    }),

    "q196_log_rank" -> ((s, dir) => {
      // two-sample log-rank: do even and odd user cohorts share a
      // time-to-purchase curve? One (time, group) cell aggregate + one
      // bounded distinct-time window; observed/expected/variance and
      // the chi2 all replay exactly in SQL
      val tte = ops.EventStats.timeToEvent(t(s, dir, "events"),
        "user_id", "ts", "event_type", "purchase")
        .select(pmod(col("key"), lit(2)).cast("string").as("g"),
          expr("duration div 3600000000").as("dh"), col("observed"))
      ops.EventStats.logRank(tte, "dh", "observed", "g")
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          col("observed_a"),
          (round(col("expected_a"), 6) + 0.0).as("expected_a"),
          (round(col("chi2"), 6) + 0.0).as("chi2"))
    }),

    "q193_dedup_stored" -> ((s, dir) => {
      // the EXACT half of incremental ingest dedup: normalized-text
      // fingerprints of the doc_id >= 250 half persist as a bucketed
      // store; screening the full corpus keeps exactly the docs whose
      // text is not in the store. Stateless anti join (stream-capable,
      // spec'd streamed==batch); the oracle recomputes membership from
      // the same md5 fingerprint in SQL.
      val docs = t(s, dir, "documents")
      ops.Dedup.writeFingerprintReference(
        docs.filter(col("doc_id") >= 250), "text", "graft_q193_ref",
        numBuckets = 4)
      ops.Dedup.filterUnseenAgainstStore(docs, "graft_q193_ref", "text")
        .select(col("doc_id"), col("n_chars"))
    }),

    "q194_image_hash_stored" -> ((s, dir) => {
      // incremental IMAGE dedup against a stored perceptual-hash index
      // (q189's multimodal twin): the analytic PPM fixtures for
      // doc_id < 100 persist as band buckets, a batch of exact copies
      // (+100000) probes them, and every copy must recover its original
      // at hamming exactly 0 — identical pixels, identical dHash, all
      // four bands collide. Oracle from the planting rule alone.
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val ref = ids.map(id => (id, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.writeImageHashReference(ref, "doc_id", "blob",
        "graft_q194_ref", numBuckets = 4)
      val batch = ids.filter(_ < 40)
        .map(id => (id + 100000L, graft.ops.Media.synthesizePpm(id)))
        .toDF("doc_id", "blob")
      graft.ops.Media.imageHashNearDupsStored(batch, "graft_q194_ref",
        "doc_id", "blob", maxHamming = 0)
        .filter(col("ref_id") === col("new_id") - 100000L)
        .select(col("ref_id").as("doc_id"), col("new_id").as("dup_id"),
          col("hamming").cast("long").as("hamming"))
    }),

    "q186_embed_cov" -> ((s, dir) => {
      // upper-triangular sample covariance of the embedding dimensions:
      // ONE map-side-combined aggregate (d + d^2 + 1 doubles of state),
      // then a row-local explode of the single result row — no vector
      // ever shuffles
      ops.Pca.covMatrix(t(s, dir, "embeddings"), "embedding")
        .select(col("i"), col("j"),
          (round(col("cov"), 6) + 0.0).as("cov"))
    }),

    "q187_pca_variance" -> ((s, dir) => {
      // PCA eigen-spectrum of the embedding covariance (driver-side
      // Jacobi on the collected d x d matrix — constant-bounded, the IVF
      // codebook pattern). No SQL eigensolver exists, so the PER-
      // COMPONENT spectrum is pinned by PcaSpec (orthonormal basis,
      // descending eigenvalues, Av=lambda*v residual, projected
      // variance == eigenvalue); the ORACLE-checkable invariant is the
      // trace identity — the eigenvalues of the sample covariance sum
      // to its trace, i.e. the sum of per-dimension var_samp, which
      // DuckDB computes independently of any eigensolve. A Jacobi bug
      // that loses or distorts mass hash-mismatches here.
      // rounding sits at 4 decimals on BOTH sides (ADVICE r16): the
      // trace identity holds to ~1e-12 relative (~1e-10 absolute at
      // this ~64 magnitude), and cum_ratio sums to 1 within float dust
      // — 4 decimals keeps the independent check binding with a 100x
      // margin against fixture-scale changes, where 6 sat exactly at
      // the boundary (0.9999994 rounds away from 1.0).
      val m = ops.Pca.fit(t(s, dir, "embeddings"), "embedding")
      ops.Pca.explainedVariance(s, m)
        .agg(count(lit(1)).as("n_components"),
          (round(sum(col("eigenvalue")), 4) + 0.0).as("total_variance"),
          (round(max(col("cum_ratio")), 4) + 0.0).as("final_cum_ratio"))
    }),

    "q139_shard_layout" -> ((s, dir) => {
      // training-shard sink: deterministic md5 sharding written as a
      // shard=N partitioned parquet layout, then aggregated FROM THE
      // FILES — the oracle recomputes the assignment analytically, so
      // a wrong shard function, a lost row, or a partition-column type
      // slip all hash-mismatch
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q139_shards").toString
      io.ShardWriter.writeShards(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", nShards = 8, tmp)
      io.ShardWriter.readShards(s, tmp)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    }),

    "q123_random_projection" -> ((s, dir) => {
      // deterministic JL projection to 8 dims (hash-derived +-1 signs,
      // ascending-j summation on both engines -> bit-identical); one
      // row per (vector, output dim)
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("e"))
      emb.select(col("vec_id"),
        posexplode(Similarity.randomProject(col("e"), 8))
          .as(Seq("k", "v")))
        .select(col("vec_id"), col("k").cast("long").as("k"),
          (round(col("v"), 6) + 0.0).as("v"))
    }),

    "q124_corpus_diversity" -> ((s, dir) => {
      // per-source lexical diversity: corpus-distinct 8-grams (theta
      // sketch, exact at the fixture's cardinality) over total
      // doc-deduped gram instances — cross-document repetition shows up
      // as a LOW ratio. The sketch path is the 100 TB shape (bounded
      // state per group); the oracle recomputes exactly.
      val grams = t(s, dir, "documents")
        .select(col("source"),
          explode(ops.TextOps.ngrams(col("text"), 8)).as("g"))
      grams.groupBy(col("source"))
        .agg(round(theta_estimate(theta_agg(col("g")))).cast("long")
          .as("n_distinct"),
          count(lit(1)).as("n_grams"))
        .select(col("source"), col("n_distinct"), col("n_grams"),
          round(col("n_distinct").cast("double") / col("n_grams"), 6)
            .as("diversity"))
    }),

    "q125_trained_classifier" -> ((s, dir) => {
      // TRAINED quality classifier: one full-batch logistic-regression
      // epoch over hashing-trick features (label: lang == 'en'), then a
      // row-local scoring pass with the learned weights. From zero
      // init, epoch 1 is closed-form (sigmoid(0) = 1/2), so the whole
      // train->score loop is SQL-oracle-able; multi-epoch convergence
      // is spec-pinned instead.
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"),
          (col("lang") === "en").cast("double").as("y"))
      val w = ops.TextOps.trainHashedLogReg(d, "text", "y",
        nBuckets = 4096, epochs = 1, lr = 1.0)
      val bc = s.sparkContext.broadcast(w)
      TextOps.linearQualityScore(d, "doc_id", "text", 4096, Some(bc))
        .select(col("doc_id"), (round(col("logit"), 6) + 0.0).as("logit"),
          round(col("score"), 6).as("score"))
    }),

    "q126_minhash_invariant" -> ((s, dir) => {
      // HASH-CHECKED invariant for the MinHash-LSH family (q90 covers
      // near-dup recall + exact-Jaccard values): an exact duplicate has the identical shingle set,
      // hence identical signature, hence identical band hashes — EVERY
      // band collides, so LSH must recover the planted pair with
      // est_jaccard exactly 1.0 (64/64 minhashes agree). Plant copies
      // of doc_id<50 at +100000; the oracle recomputes the recovered
      // pairs from the planting rule alone. (All fixture docs have >=1
      // shingle, so no null-signature drop can hide a miss.)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      Dedup.minHashLshPairs(docs.unionAll(planted), "doc_id", "text",
        numHashes = 64, bands = 16, shingleK = 2)
        .filter(col("id_b") === col("id_a") + 100000 && col("id_a") < 50)
        .select(col("id_a").as("doc_id"), col("id_b").as("dup_id"),
          col("est_jaccard"))
    }),

    "q127_simhash_invariant" -> ((s, dir) => {
      // HASH-CHECKED invariant for SimHash (q91 covers multiset
      // semantics + the screen path; this row pins raw-sig purity): the
      // 64-bit fingerprint is a pure function of the text, so a planted
      // exact copy MUST fingerprint identically — identical-signature
      // count over the planted pairs equals the pair count, which the
      // oracle recomputes from the planting rule alone.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val sigs = docs.unionAll(
          docs.filter(col("doc_id") < 50)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      val a = sigs.filter(col("doc_id") < 50)
        .select(col("doc_id"), col("sig").as("sig_a"))
      val b = sigs.filter(col("doc_id") >= 100000)
        .select((col("doc_id") - 100000).as("doc_id"), col("sig").as("sig_b"))
      a.join(b, Seq("doc_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L))
            .as("n_identical"))
    }),

    "q99_feature_scale" -> ((s, dir) => {
      // per-language standardization + min-max scaling of a numeric
      // feature: stats reduce map-side, broadcast back, transforms are
      // pure projections (FeatureScale)
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        col("n_chars").cast("double").as("n_chars"))
      val z = ops.FeatureScale.zscore(d, Seq("n_chars"), Seq("lang"))
        .select(col("doc_id"), col("lang"),
          round(col("n_chars"), 6).as("z"))
      val mm = ops.FeatureScale.minMax(d, Seq("n_chars"), Seq("lang"))
        .select(col("doc_id"), round(col("n_chars"), 6).as("mm"))
      z.join(mm, Seq("doc_id"))
    }),

    "q145_zorder_key" -> ((s, dir) => {
      // z-order layout key over (l_extendedprice, l_quantity): the
      // engine-reproducible Morton construction behind
      // io.ZOrderLayout.writeZOrdered — one stats aggregate, map-only
      // bucketing + bit interleave; the oracle replays the exact
      // min/max-linear bucket and every interleave term
      io.ZOrderLayout.withZKey(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_quantity")),
        Seq("l_extendedprice", "l_quantity"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
    }),

    "q142_percentile_rank" -> ((s, dir) => {
      // EXACT per-group empirical CDF at corpus scale: cume_dist()
      // semantics without the single-task global window — one counts
      // aggregate + the Packing-style distributed prefix sum over
      // distinct values. The ratio is exact-integer division on both
      // engines; rounding only pins the hash representation.
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      ops.FeatureScale.percentileRanks(li, "v", Seq("g"))
        .select(col("g"), col("v"),
          (round(col("pct_rank"), 9) + 0.0).as("pct_rank"))
    }),

    "q107_metric_anomalies" -> ((s, dir) => {
      // profile-store anomaly screen: every daily window's mean z-scored
      // against the metric's distribution across all windows — "which
      // day looks wrong" answered from stored profiles, no raw re-scan
      val prof = t(s, dir, "lineitem").newProfilingSession()
        .withTimeColumn("l_shipdate", "1 day").aggProfiles()
      ops.Drift.metricAnomalies(prof,
        Seq("l_quantity", "l_extendedprice"),
        keep = Seq("window"), threshold = 2.5)
        // the raw mean is NOT emitted: the profile's Welford mean and
        // the oracle's naive avg agree only to ~1e-8 on 5-digit
        // magnitudes, so with 4800 rows some values always sit on a
        // rounding boundary AND their sort order flips row alignment.
        // z normalizes that noise away (~1e-8/sd), so 2dp is six orders
        // from the noise floor and rows align on exact (wk, col_name)
        .select(col("window.start").cast("date").as("wk"),
          col("column").as("col_name"),
          round(col("z"), 2).as("z"),
          col("is_anomaly").cast("int").as("anom"))
    }),

    "q106_weighted_bottomk" -> ((s, dir) => {
      // Efraimidis-Spirakis weighted sampling WITHOUT replacement: 10
      // docs per language, selection probability proportional to
      // n_chars, deterministic draws from the md5-52 id hash — the
      // oracle replays the exponential-draw ranking exactly
      ops.Sampling.weightedBottomK(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        Seq("lang"), "doc_id", "n_chars", k = 10)
    }),

    "q105_remove_spans" -> ((s, dir) => {
      // exact-substring REMOVAL (the action to q85's detection): the
      // planted boilerplate tail vanishes from every 20th doc, unique
      // text survives; n_removed counts excised tokens. Trimmed on both
      // sides (q85's tokenization-parity lesson)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        trim(when(col("doc_id") % 20 === 0,
          concat(col("text"), lit(" this boilerplate sentence repeats" +
            " verbatim across many documents here")))
          .otherwise(col("text"))).as("text"))
      Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
        windowTokens = 8, minDocs = 3)
    }),

    "q104_linear_score" -> ((s, dir) => {
      // hashing-trick linear classifier scoring (untrained formula
      // weights — the oracle replicates hash, bucket, weight and sigmoid
      // exactly); with a trained broadcast table this is fastText-style
      // model-based quality filtering, one row-local pass
      ops.TextOps.linearQualityScore(t(s, dir, "documents"),
        "doc_id", "text", nBuckets = 4096)
        .select(col("doc_id"), round(col("logit"), 6).as("logit"),
          round(col("score"), 6).as("score"))
    }),

    "q102_drift_autoedges" -> ((s, dir) => {
      // PSI over bins auto-derived from the reference sketch's quartiles
      // (equal-mass bins — no hand-picked constants); exact under the
      // q13/q61 sketch-exact regime, so the oracle re-derives the same
      // REAL-valued edges by the rank rule
      val sup = t(s, dir, "supplier")
      val cohorts = sup
        .withColumn("cohort",
          when(col("s_nationkey") < 12, "old").otherwise("new"))
        .groupBy(col("cohort"))
        .agg(kll_agg(col("s_acctbal")).as("sk"), count(lit(1)).as("n"))
      val ref = cohorts.filter(col("cohort") === "old")
      val edges = ops.Drift.autoEdges(ref, "sk")
      val a = ref.select(col("sk").as("sk_a"), col("n").as("n_a"))
      val b = cohorts.filter(col("cohort") === "new")
        .select(col("sk").as("sk_b"), col("n").as("n_b"))
      a.crossJoin(b).select(col("n_a"), col("n_b"),
        round(ops.Drift.psi(col("sk_a"), col("sk_b"), edges), 6).as("psi"))
    }),

    "q103_robust_scale" -> ((s, dir) => {
      // median/IQR scaling from one KLL aggregate per nation — the
      // outlier-insensitive zscore; exact under the sketch-exact regime
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      ops.FeatureScale.robustScale(sup, "s_acctbal", Seq("s_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"),
          round(col("s_acctbal"), 6).as("acctbal_r"))
    }),

    "q101_validate" -> ((s, dir) => {
      // profile-driven expectation suite: six checks per group evaluated
      // purely from the profile row's sketch state (no raw re-scan) —
      // min/max/mean bounds, null fraction, Theta distinct range (exact
      // at this cardinality), inferred-type assertion
      val prof = t(s, dir, "lineitem").newProfilingSession()
        .groupBy("l_returnflag").aggProfiles()
      ops.Validation.report(prof, Seq(
        ops.Validation.MinAtLeast("l_quantity", 1.0),
        ops.Validation.MaxAtMost("l_quantity", 50.0),
        ops.Validation.MeanBetween("l_quantity", 20.0, 30.0),
        ops.Validation.NullFractionAtMost("l_quantity", 0.0),
        ops.Validation.DistinctBetween("l_quantity", 40.0, 60.0),
        ops.Validation.TypeIs("l_quantity", "FRACTIONAL"),
        ops.Validation.StddevBetween("l_quantity", 10.0, 20.0),
        ops.Validation.UniqueRatioBetween("l_quantity", 0.0, 0.1)),
        keep = Seq("l_returnflag"))
        .select(col("l_returnflag"), col("check_name"), col("col_name"),
          round(col("observed"), 6).as("observed"), col("passed"))
    }),

    "q100_winsorize" -> ((s, dir) => {
      // robust clipping at per-nation KLL [0.1, 0.9] fences — exact
      // under the q13 sketch-exact regime, so the oracle's rank-based
      // quantiles reproduce the sketch bit-for-bit
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      ops.FeatureScale.winsorize(sup, "s_acctbal", 0.1, 0.9,
        Seq("s_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"),
          round(col("s_acctbal"), 2).as("acctbal_w"))
    }),

    "q94_kll_grid_large" -> ((s, dir) => {
      // full 9-point quantile grid, exploded to scalar rows (the driver's
      // hasher can't factorize array columns). The 1/293 orderkey filter
      // keeps each group under KLL's exact capacity so the grid is
      // oracle-exact; q13/q14 cover the approximate regime.
      val li = t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(293)) === 0)
      li.groupBy(col("l_returnflag"))
        .agg(kll_quantiles(kll_agg(col("l_extendedprice")),
          array(graft.profile.ProfileSchema.QuantileGrid.toIndexedSeq.map(lit): _*))
          .as("qs"))
        .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("pos", "q")))
        .select(col("l_returnflag"), col("pos"),
          round(col("q"), 2).as("quantile"))
    }),

    "q95_rolling_hash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.rollingHash(col("text")).as("rh"))
    }),

    "q96_corpus_store" -> ((s, dir) => {
      // bucketed corpus store: documents + a per-doc stats table written
      // as co-bucketed catalog tables (8 buckets on doc_id, in-bucket
      // sorted), read back through the catalog, and joined — the bucketed
      // scans report their hash partitioning so the join plans with ZERO
      // exchanges below it (CorpusStoreSpec pins the exchange-free plan;
      // this query puts the store->join loop on the correctness board)
      val docs = t(s, dir, "documents")
      graft.io.CorpusStore.writeBucketed(
        docs.select(col("doc_id"), col("source")),
        "graft_q96_docs", "doc_id", 8, Seq("doc_id"))
      graft.io.CorpusStore.writeBucketed(
        docs.select(col("doc_id"), length(col("text")).as("n_chars")),
        "graft_q96_stats", "doc_id", 8, Seq("doc_id"))
      graft.io.CorpusStore.readBucketed(s, "graft_q96_docs")
        .join(graft.io.CorpusStore.readBucketed(s, "graft_q96_stats"), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    }))

  /** DuckDB-runnable oracle SQL per query (same result, same column names). */
  /** One q150-shaped association block for [[oracleSql]]'s
    * q219_feature_relevance UNION (feature vs o_orderstatus on orders).
    */
  private def relevanceOracleBlock(feature: String): String =
    s"""SELECT '$feature' AS feature, round(mi, 6) + 0.0 AS mi,
       |  round(chi2, 6) + 0.0 AS chi2,
       |  round(CASE WHEN least(ka, kb) > 1
       |    THEN sqrt(chi2 / (n * (least(ka, kb) - 1))) END, 6) + 0.0
       |    AS cramers_v,
       |  n::BIGINT AS n, ka::BIGINT AS card_feature,
       |  kb::BIGINT AS card_label
       |FROM (
       |  WITH c AS (SELECT $feature AS a, o_orderstatus AS b,
       |      count(*)::DOUBLE AS c
       |    FROM orders
       |    WHERE $feature IS NOT NULL AND o_orderstatus IS NOT NULL
       |    GROUP BY 1, 2),
       |  ra AS (SELECT a, sum(c) AS ra FROM c GROUP BY 1),
       |  rb AS (SELECT b, sum(c) AS rb FROM c GROUP BY 1),
       |  t AS (SELECT sum(c) AS n, count(DISTINCT a)::DOUBLE AS ka,
       |               count(DISTINCT b)::DOUBLE AS kb FROM c),
       |  j AS (SELECT c.c, ra.ra, rb.rb, t.n, t.ka, t.kb
       |        FROM c JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN t)
       |  SELECT sum(c / n * ln(c * n / (ra * rb))) AS mi,
       |    sum(pow(c - ra * rb / n, 2) / (ra * rb / n))
       |      + any_value(n) - sum(ra * rb / n) AS chi2,
       |    any_value(n) AS n, any_value(ka) AS ka, any_value(kb) AS kb
       |  FROM j)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q219_feature_relevance" ->
      Seq("o_orderpriority", "o_custkey").map(relevanceOracleBlock)
        .mkString("\nUNION ALL\n"),
    "q01_profile_counts" ->
      """SELECT l_returnflag,
        |  count(*) AS n_rows,
        |  sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |  sum(CASE WHEN l_quantity > 45 THEN 0 ELSE 1 END)::BIGINT AS n_vals
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q02_profile_numbers" ->
      """SELECT l_returnflag,
        |  count(l_quantity) AS qty_n,
        |  min(l_quantity) AS qty_min,
        |  max(l_quantity) AS qty_max,
        |  round(sum(l_quantity), 2) AS qty_sum,
        |  round(avg(l_quantity), 6) AS qty_mean,
        |  round(var_samp(l_quantity), 6) AS qty_var,
        |  round(sum(l_extendedprice), 2) AS price_sum,
        |  round(avg(l_extendedprice), 4) AS price_mean
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q03_profile_merge" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  min(l_quantity) AS qty_min,
        |  max(l_quantity) AS qty_max,
        |  round(sum(l_quantity), 2) AS qty_sum,
        |  0 AS n_null
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q04_profile_strings" ->
      """SELECT lang,
        |  count(text) AS n_text,
        |  min(length(text)) AS len_min,
        |  max(length(text)) AS len_max,
        |  sum(length(text))::BIGINT AS len_sum,
        |  round(avg(length(text)), 6) AS len_mean,
        |  max(len(string_split(text, ' '))) AS tok_max,
        |  round(avg(len(string_split(text, ' '))), 6) AS tok_mean,
        |  'STRING' AS inferred_type
        |FROM documents GROUP BY 1""".stripMargin,

    "q05_schema_inference" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    sum(CASE WHEN l_linenumber % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_fractional,
        |    sum(CASE WHEN l_linenumber % 3 = 2 THEN 1 ELSE 0 END)::BIGINT AS n_integral,
        |    sum(CASE WHEN l_linenumber % 3 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_string,
        |    count(*) AS total
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n_fractional, n_integral, n_string,
        |  CASE
        |    WHEN greatest(n_fractional, n_integral, n_string) > 0.7 * total THEN
        |      CASE WHEN n_fractional >= n_integral AND n_fractional >= n_string
        |             THEN 'FRACTIONAL'
        |           WHEN n_integral >= n_string THEN 'INTEGRAL'
        |           ELSE 'STRING' END
        |    WHEN n_string >= greatest(n_fractional, n_integral)
        |         AND n_string > n_fractional + n_integral THEN 'STRING'
        |    WHEN greatest(n_fractional, n_integral, n_string) > 0.5 * total THEN
        |      CASE WHEN n_fractional >= n_integral AND n_fractional >= n_string
        |             THEN 'FRACTIONAL'
        |           WHEN n_integral >= n_string THEN 'INTEGRAL'
        |           ELSE 'STRING' END
        |    WHEN n_fractional + n_integral > 0.5 * total THEN 'FRACTIONAL'
        |    ELSE 'UNKNOWN' END AS inferred_type
        |FROM c""".stripMargin,

    "q06_charpos" ->
      """WITH chars AS (
        |  SELECT substr(lower(n_name), i, 1) AS raw_ch, i - 1 AS pos
        |  FROM nation, range(1, 64) t(i)
        |  WHERE i <= length(n_name)),
        |mapped AS (
        |  SELECT CASE WHEN strpos('abcdefghijklmnopqrstuvwzyz0123456789-@!#$%^&*()[]{}', raw_ch) > 0
        |              THEN raw_ch ELSE 'NITL' END AS ch, pos
        |  FROM chars)
        |SELECT ch, count(*) AS n, min(pos) AS pos_min, max(pos) AS pos_max,
        |       sum(pos)::BIGINT AS pos_sum
        |FROM mapped GROUP BY 1""".stripMargin,

    "q07_profile_global" ->
      """SELECT count(*) AS n,
        |  round(sum(o_totalprice), 2) AS price_sum,
        |  round(var_samp(o_totalprice), -2) AS price_var,
        |  count(o_orderstatus) AS n_status,
        |  min(o_custkey) AS cust_min,
        |  max(o_custkey) AS cust_max,
        |  sum(o_custkey)::BIGINT AS cust_sum
        |FROM orders""".stripMargin,

    "q08_profile_timewindow" ->
      """SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
        |  count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q10_theta_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q11_hll_distinct" ->
      """SELECT lang, count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY 1""".stripMargin,

    "q12_freq_items" ->
      """SELECT o_orderstatus, item, estimate FROM (
        |  SELECT o_orderstatus, o_orderpriority AS item,
        |    count(*) AS estimate,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY 1, 2) WHERE rn = 1""".stripMargin,

    "q13_kll_quantiles" ->
      """WITH r AS (
        |  SELECT s_nationkey, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS rn,
        |    count(*) OVER (PARTITION BY s_nationkey) AS cnt
        |  FROM supplier)
        |SELECT s_nationkey,
        |  round(min(s_acctbal) FILTER (WHERE rn >= ceil(0.25 * cnt)), 2) AS q25,
        |  round(min(s_acctbal) FILTER (WHERE rn >= ceil(0.5 * cnt)), 2) AS q50,
        |  round(min(s_acctbal) FILTER (WHERE rn >= ceil(0.75 * cnt)), 2) AS q75,
        |  max(cnt) AS n
        |FROM r GROUP BY 1""".stripMargin,

    "q14_kll_merge" ->
      """WITH r AS (
        |  SELECT s_nationkey, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS rn,
        |    count(*) OVER (PARTITION BY s_nationkey) AS cnt
        |  FROM supplier)
        |SELECT s_nationkey,
        |  round(min(s_acctbal) FILTER (WHERE rn >= ceil(0.5 * cnt)), 2) AS q50,
        |  max(cnt) AS n
        |FROM r GROUP BY 1""".stripMargin,

    "q15_theta_merge" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q17_kll_rank" ->
      """SELECT s_nationkey, count(*) AS n,
        |  round(count(*) FILTER (WHERE CAST(s_acctbal AS REAL) <= 5000.0)
        |    / count(*)::DOUBLE, 6) AS rank_5000
        |FROM supplier GROUP BY 1""".stripMargin,

    "q18_theta_set_algebra" ->
      """WITH a AS (SELECT DISTINCT l_partkey FROM lineitem
        |           WHERE l_returnflag = 'A'),
        |r AS (SELECT DISTINCT l_partkey FROM lineitem
        |      WHERE l_returnflag = 'R')
        |SELECT
        |  (SELECT count(*) FROM a WHERE l_partkey IN (SELECT * FROM r))
        |    AS n_both,
        |  (SELECT count(*) FROM a WHERE l_partkey NOT IN (SELECT * FROM r))
        |    AS n_only_a""".stripMargin,

    "q16_strings_summary" ->
      """WITH pc AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS c
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus,
        |  count(*) AS n_unique_prio,
        |  count(*)::INT AS prio_freq_n,
        |  max(c) AS prio_top_estimate,
        |  -1 AS key_freq_n
        |FROM pc GROUP BY 1""".stripMargin,

    "q20_csv_roundtrip" ->
      """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        |FROM nation GROUP BY 1""".stripMargin,

    "q21_join_agg" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "q22_window_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 AND o_custkey < 50""".stripMargin,

    "q23_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1""".stripMargin,

    "q36_cube_profile" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty_sum,
        |  min(l_quantity) AS qty_min
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q33_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q34_range_join" ->
      """WITH bands(band_id, lo, hi) AS (VALUES
        |  (1, 900.0, 1100.0), (2, 5000.0, 5500.0), (3, 90000.0, 95000.0))
        |SELECT band_id, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS price_sum
        |FROM lineitem JOIN bands
        |  ON l_extendedprice >= lo AND l_extendedprice <= hi
        |GROUP BY 1""".stripMargin,

    "q35_asof_join" ->
      """SELECT count(*) AS n_clicks, count(r.value) AS n_matched,
        |  round(sum(r.value), 2) AS value_sum
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts AS vts, value FROM events
        |      WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.vts""".stripMargin,

    "q70_asof_bucketed" ->
      """SELECT count(*) AS n_clicks, count(r.value) AS n_matched,
        |  round(sum(r.value), 2) AS value_sum
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts AS vts, value FROM events
        |      WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.vts""".stripMargin,

    "q32_inmemory_scan" ->
      """WITH d(id, k, v) AS (VALUES
        |  (1, 'a', 1.5), (2, 'b', 2.5), (3, 'a', 3.5),
        |  (4, NULL, 4.5), (5, 'b', 5.5), (6, 'a', 6.5))
        |SELECT count(*) AS n,
        |  count(*) FILTER (k IS NULL) AS k_nulls,
        |  count(k) AS k_strings,
        |  round(sum(v), 2) AS v_sum,
        |  min(v) AS v_min,
        |  sum(id)::BIGINT AS id_sum
        |FROM d""".stripMargin,

    "q25_regression_metrics" ->
      """SELECT count(*) AS n,
        |  round(sum(abs(l_extendedprice - l_quantity)), 2) AS sum_abs,
        |  round(sum(abs(l_extendedprice - l_quantity)) / count(*), 4) AS mae,
        |  round(sqrt(sum((l_extendedprice - l_quantity) *
        |    (l_extendedprice - l_quantity)) / count(*)), 4) AS rmse
        |FROM lineitem""".stripMargin,

    "q26_confusion_matrix" ->
      """SELECT l_returnflag AS prediction, l_linestatus AS target,
        |  count(*) AS n, round(sum(l_discount), 4) AS score_sum
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q27_entropy_segmentation" ->
      """WITH counts AS (
        |  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM counts)
        |SELECT 'event_type' AS column_name,
        |  round(-1.0 * sum((cnt / total) * log2(cnt / total)), 6) + 0.0 AS entropy,
        |  count(*) AS n_unique
        |FROM counts, tot""".stripMargin,

    "q31_autosegmentation" ->
      """WITH base AS (
        |  SELECT event_type AS etype,
        |    CAST(CAST(floor(value / 100) AS INT) AS VARCHAR) AS vb,
        |    CAST(user_id % 4 AS VARCHAR) AS ub
        |  FROM events),
        |tot AS (SELECT count(*)::DOUBLE AS n FROM base),
        |card AS (SELECT count(DISTINCT vb)::DOUBLE AS nu_vb,
        |                count(DISTINCT ub)::DOUBLE AS nu_ub FROM base),
        |e0 AS (SELECT -sum(p * log2(p)) AS e FROM (
        |  SELECT count(*)::DOUBLE / (SELECT n FROM tot) AS p
        |  FROM base GROUP BY etype)),
        |evb AS (SELECT sum(ent * w) AS e FROM (
        |  SELECT vb, -sum(p * log2(p)) AS ent,
        |         sum(gc) / (SELECT n FROM tot) AS w FROM (
        |    SELECT vb, etype, count(*)::DOUBLE AS gc,
        |      count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY vb) AS p
        |    FROM base GROUP BY vb, etype) GROUP BY vb)),
        |eub AS (SELECT sum(ent * w) AS e FROM (
        |  SELECT ub, -sum(p * log2(p)) AS ent,
        |         sum(gc) / (SELECT n FROM tot) AS w FROM (
        |    SELECT ub, etype, count(*)::DOUBLE AS gc,
        |      count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY ub) AS p
        |    FROM base GROUP BY ub, etype) GROUP BY ub)),
        |eboth AS (SELECT sum(ent * w) AS e FROM (
        |  SELECT vb, ub, -sum(p * log2(p)) AS ent,
        |         sum(gc) / (SELECT n FROM tot) AS w FROM (
        |    SELECT vb, ub, etype, count(*)::DOUBLE AS gc,
        |      count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY vb, ub) AS p
        |    FROM base GROUP BY vb, ub, etype) GROUP BY vb, ub)),
        |g AS (SELECT
        |  ((SELECT e FROM e0) - (SELECT e FROM evb)) /
        |    ln((SELECT nu_vb FROM card)) AS g_vb,
        |  ((SELECT e FROM e0) - (SELECT e FROM eub)) /
        |    ln((SELECT nu_ub FROM card)) AS g_ub,
        |  (SELECT e FROM evb) AS e_vb, (SELECT e FROM eub) AS e_ub,
        |  (SELECT e FROM eboth) AS e_both,
        |  (SELECT nu_vb FROM card) AS nu_vb,
        |  (SELECT nu_ub FROM card) AS nu_ub),
        |pick AS (SELECT *,
        |  CASE WHEN g_vb <= 0 AND g_ub <= 0 THEN NULL
        |       WHEN g_ub >= g_vb THEN 'ub' ELSE 'vb' END AS w1 FROM g),
        |step2 AS (SELECT *,
        |  CASE WHEN w1 = 'vb' THEN nu_vb ELSE nu_ub END AS used,
        |  CASE WHEN w1 = 'vb' THEN 'ub' ELSE 'vb' END AS other,
        |  CASE WHEN w1 = 'vb' THEN nu_ub ELSE nu_vb END AS nu_other,
        |  CASE WHEN w1 = 'vb' THEN e_vb ELSE e_ub END AS e_w1
        |  FROM pick),
        |fin AS (SELECT w1, other,
        |  (nu_other * used <= 30 - used)
        |    AND ((e_w1 - e_both) / ln(nu_other) > 0) AS take2
        |  FROM step2)
        |SELECT 1 AS pos, w1 AS column_name FROM fin WHERE w1 IS NOT NULL
        |UNION ALL
        |SELECT 2, other FROM fin WHERE take2""".stripMargin,

    "q30_csv_date_profile" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_date,
        |  count(*) AS n,
        |  round(sum(o_totalprice), 2) AS price_sum,
        |  min(o_totalprice) AS price_min,
        |  'FRACTIONAL' AS price_type,
        |  'INTEGRAL' AS key_type
        |FROM orders GROUP BY 1""".stripMargin,

    "q28_json_summary" ->
      """SELECT l_returnflag, count(*) AS n,
        |  min(l_quantity) AS qty_min,
        |  max(l_quantity) AS qty_max,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q68_sql_surface" ->
      """SELECT s_nationkey, count(s_acctbal) AS n,
        |  count(DISTINCT s_suppkey) AS n_distinct
        |FROM supplier GROUP BY 1""".stripMargin,

    "q67_streaming_profile" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(*) AS n, round(sum(value), 2) AS val_sum
        |FROM events WHERE user_id < 50 GROUP BY 1""".stripMargin,

    "q87_streaming_dedup" ->
      """SELECT DISTINCT user_id, event_type
        |FROM events WHERE user_id < 50""".stripMargin,

    "q72_streaming_drift" ->
      """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(value AS REAL) AS v
        |  FROM events WHERE user_id < 50),
        |c AS (SELECT day, count(*) AS n,
        |  count(*) FILTER (WHERE v <= 10.0) AS r0,
        |  count(*) FILTER (WHERE v <= 25.0) AS r1,
        |  count(*) FILTER (WHERE v <= 45.0) AS r2,
        |  count(*) FILTER (WHERE v <= 90.0) AS r3
        |  FROM e GROUP BY 1),
        |g AS (SELECT count(*) AS n,
        |  count(*) FILTER (WHERE v <= 10.0) AS r0,
        |  count(*) FILTER (WHERE v <= 25.0) AS r1,
        |  count(*) FILTER (WHERE v <= 45.0) AS r2,
        |  count(*) FILTER (WHERE v <= 90.0) AS r3
        |  FROM e WHERE day = DATE '2024-01-01'),
        |p AS (SELECT day,
        |  greatest(r0 / n::DOUBLE, 1e-6) AS p0,
        |  greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS p1,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS p2,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS p3,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS p4
        |  FROM c),
        |q AS (SELECT
        |  greatest(r0 / n::DOUBLE, 1e-6) AS q0,
        |  greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS q1,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS q2,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS q3,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS q4
        |  FROM g)
        |SELECT day,
        |  round((p0 - q0) * ln(p0 / q0) + (p1 - q1) * ln(p1 / q1)
        |    + (p2 - q2) * ln(p2 / q2) + (p3 - q3) * ln(p3 / q3)
        |    + (p4 - q4) * ln(p4 / q4), 6) + 0.0 AS psi
        |FROM p CROSS JOIN q""".stripMargin,

    "q66_parquet_sink" ->
      """SELECT l_returnflag, count(*) AS n,
        |  min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q65_histogram" ->
      """WITH f AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS REAL) AS v
        |  FROM lineitem WHERE l_orderkey % 293 = 0),
        |agg AS (SELECT l_returnflag, min(v) AS mn, max(v) AS mx,
        |    count(*) AS n FROM f GROUP BY 1),
        |w AS (SELECT *,
        |    CAST((mx - mn) / CAST(30 AS REAL) AS REAL) AS width FROM agg),
        |sp AS (SELECT l_returnflag, i,
        |    CAST(mn + CAST(width * CAST(i AS REAL) AS REAL) AS REAL) AS s,
        |    mn, mx FROM w
        |  CROSS JOIN (SELECT unnest(range(1, 30)) AS i)),
        |bounds AS (
        |  SELECT l_returnflag, 0 AS ord, mn AS b FROM w
        |  UNION ALL
        |  SELECT l_returnflag, i, s FROM sp WHERE s > mn AND s < mx
        |  UNION ALL
        |  SELECT l_returnflag, 1000, mx FROM w),
        |pairs AS (
        |  SELECT l_returnflag, ord, b AS lo,
        |    LEAD(b) OVER (PARTITION BY l_returnflag ORDER BY ord) AS hi,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY ord) - 1
        |      AS bin
        |  FROM bounds)
        |SELECT p.l_returnflag, CAST(p.bin AS INT) AS bin,
        |  round(p.lo::DOUBLE, 2) AS lo, round(p.hi::DOUBLE, 2) AS hi,
        |  (SELECT count(*) FROM f
        |   WHERE f.l_returnflag = p.l_returnflag AND f.v <= p.hi)
        |  - CASE WHEN p.bin = 0 THEN 0 ELSE
        |      (SELECT count(*) FROM f
        |       WHERE f.l_returnflag = p.l_returnflag AND f.v <= p.lo) END
        |    AS cnt
        |FROM pairs p WHERE p.hi IS NOT NULL""".stripMargin,

    "q71_histogram_splits" ->
      """WITH f AS (SELECT l_returnflag, CAST(l_extendedprice AS REAL) AS v
        |           FROM lineitem WHERE l_orderkey % 293 = 0),
        |agg AS (SELECT l_returnflag,
        |    min(v)::DOUBLE AS mn, max(v)::DOUBLE AS mx, count(*) AS n,
        |    count(*) FILTER (v <= 10000) AS c1,
        |    count(*) FILTER (v <= 30000) AS c2,
        |    count(*) FILTER (v <= 60000) AS c3
        |  FROM f GROUP BY 1)
        |SELECT l_returnflag, bin, round(lo, 2) AS lo, round(hi, 2) AS hi,
        |  cnt FROM (
        |  SELECT l_returnflag, 0 AS bin, mn AS lo, 10000.0 AS hi,
        |    c1 AS cnt FROM agg
        |  UNION ALL SELECT l_returnflag, 1, 10000.0, 30000.0, c2 - c1 FROM agg
        |  UNION ALL SELECT l_returnflag, 2, 30000.0, 60000.0, c3 - c2 FROM agg
        |  UNION ALL SELECT l_returnflag, 3, 60000.0, mx, n - c3 FROM agg)""".stripMargin,

    "q64_viewer_counts" ->
      """SELECT c.column_name,
        |  (SELECT count(*) FROM lineitem) AS n,
        |  (SELECT count(DISTINCT l_returnflag) FROM lineitem) AS n_profiles
        |FROM (VALUES ('l_orderkey'), ('l_partkey'), ('l_suppkey'),
        |  ('l_linenumber'), ('l_quantity'), ('l_extendedprice'),
        |  ('l_discount'), ('l_tax'), ('l_linestatus'),
        |  ('l_shipdate')) c(column_name)""".stripMargin,

    "q63_profile_tags" ->
      """SELECT l_returnflag, tag_key, tag_value
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem)
        |CROSS JOIN (VALUES ('whylogs.tag.env', 'prod'),
        |  ('whylogs.tag.source', 'lineitem')) t(tag_key, tag_value)
        |UNION ALL
        |SELECT l_returnflag, 'whylogs.tag.l_returnflag', l_returnflag
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem)""".stripMargin,

    "q29_proto_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, 0 AS n_null,
        |  min(l_quantity) AS qty_min,
        |  max(l_quantity) AS qty_max,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q40_lang_id" ->
      """WITH scores AS (
        |  SELECT lang,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['the','and','of','to','in','is','that','it'], t))) AS s_en,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['der','die','das','und','nicht','ist','ich','zu'], t))) AS s_de,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['el','los','que','es','una','por','con','para'], t))) AS s_es,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['le','les','et','des','est','dans','une','pour'], t))) AS s_fr,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['的','是','不','了','在','人','有','我'], t))) AS s_zh
        |  FROM documents),
        |pred AS (
        |  SELECT lang,
        |    CASE
        |      WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
        |      WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
        |      WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
        |      WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
        |      WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
        |      ELSE 'und' END AS pred_lang
        |  FROM scores)
        |SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2""".stripMargin,

    "q41_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(text)::DOUBLE AS n_chars,
        |    len(list_filter(string_split(text, ' '), t -> len(t) > 0))::DOUBLE AS n_tok,
        |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS n_punct,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))::DOUBLE AS n_stop
        |  FROM documents)
        |SELECT doc_id, round(
        |  0.25 * (CASE WHEN n_chars >= 100 AND n_chars <= 10000 THEN 1.0
        |               WHEN n_chars >= 20 THEN 0.5 ELSE 0.0 END)
        |  + 0.25 * (CASE WHEN n_tok > 0 AND n_chars / n_tok >= 3
        |                  AND n_chars / n_tok <= 12 THEN 1.0 ELSE 0.0 END)
        |  + 0.25 * (1.0 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 1.0 END))
        |  + 0.25 * (CASE WHEN n_tok > 0 AND n_stop / n_tok >= 0.05 THEN 1.0
        |            ELSE 0.0 END), 4) AS score
        |FROM f""".stripMargin,

    "q42_token_stats" ->
      """WITH f AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS n_tok
        |  FROM documents)
        |SELECT lang, sum(n_tok)::BIGINT AS tokens, round(avg(n_tok), 4) AS avg_tokens,
        |  max(n_tok) AS max_tokens
        |FROM f GROUP BY 1""".stripMargin,

    "q48_dedup_clusters" ->
      """WITH RECURSIVE docs0 AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 30),
        |all_docs AS (
        |  SELECT id, text FROM docs0
        |  UNION ALL
        |  SELECT id + 100000, text || ' mutation suffix' FROM docs0
        |  UNION ALL
        |  SELECT id + 200000, text || ' mutation suffix mutation suffix'
        |  FROM docs0),
        |toks AS (
        |  SELECT id, list_filter(string_split(lower(text), ' '),
        |    t -> len(t) > 0) AS w
        |  FROM all_docs),
        |sh AS (
        |  SELECT id,
        |    CASE WHEN len(w) >= 2 THEN
        |      list_distinct(list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i + 1]))
        |    ELSE [array_to_string(w, ' ')] END AS s
        |  FROM toks),
        |jedges AS (
        |  SELECT a.id AS src, b.id AS dst
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(a.s || b.s)) >= 0.5),
        |cedges AS (
        |  SELECT id AS src, id + 100000 AS dst FROM docs0
        |  UNION ALL
        |  SELECT id + 100000, id + 200000 FROM docs0),
        |edges AS (SELECT DISTINCT * FROM (
        |  SELECT * FROM jedges UNION ALL SELECT * FROM cedges)),
        |sym AS (
        |  SELECT src, dst FROM edges
        |  UNION SELECT dst, src FROM edges),
        |nodes AS (SELECT DISTINCT src AS id FROM sym),
        |reach AS (
        |  SELECT id AS a, id AS b FROM nodes
        |  UNION
        |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
        |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a)
        |SELECT comp, count(*) AS sz FROM comp GROUP BY 1""".stripMargin,

    "q50_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
        |m AS (SELECT user_id, tu,
        |  CASE WHEN lag(tu) OVER w IS NULL
        |         OR tu - lag(tu) OVER w > 14400000000 THEN 1
        |       ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        |s AS (SELECT user_id, tu,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY tu
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(tu) AS start_t, max(tu) AS end_t,
        |  max(tu) - min(tu) AS duration_t
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q51_sample_bottomk" ->
      """WITH h AS (SELECT event_type, event_id,
        |  CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 13))
        |    AS BIGINT) AS hv
        |  FROM events),
        |r AS (SELECT event_type, event_id,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY hv ASC, event_id ASC) AS rank
        |  FROM h)
        |SELECT event_type, event_id, rank FROM r WHERE rank <= 5""".stripMargin,

    "q52_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |  AS BIGINT) < 450359962737049""".stripMargin,

    "q80_cap_per_key" ->
      """WITH h AS (SELECT doc_id, source, lang,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT) AS hv
        |  FROM documents),
        |r AS (SELECT doc_id, source, lang,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY hv ASC, doc_id ASC) AS rn
        |  FROM h)
        |SELECT doc_id, source, lang FROM r WHERE rn <= 10""".stripMargin,

    "q79_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ls
        |  FROM documents),
        |lines AS (SELECT doc_id, unnest(ls) AS line,
        |    unnest(range(1, len(ls) + 1)) AS ord
        |  FROM d),
        |freq AS (SELECT line
        |  FROM (SELECT DISTINCT doc_id, line FROM lines)
        |  GROUP BY line HAVING count(*) >= 400),
        |kept AS (SELECT doc_id, line, ord FROM lines
        |  WHERE line NOT IN (SELECT line FROM freq)),
        |rebuilt AS (SELECT doc_id,
        |    array_to_string(list(line ORDER BY ord), ' ') AS text,
        |    count(*) AS kept_n
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.text, '') AS text,
        |  CAST(len(d.ls) - coalesce(r.kept_n, 0) AS BIGINT) AS n_removed
        |FROM d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id""".stripMargin,

    "q78_top_ngram" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text
        |         ELSE text END AS text
        |  FROM documents),
        |grams AS (SELECT doc_id, array_to_string(l[i:i+1], ' ') AS gram
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l), 1))) AS i
        |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM d))),
        |c AS (SELECT doc_id, gram, count(*) AS cnt
        |  FROM grams GROUP BY 1, 2),
        |r AS (SELECT doc_id, gram, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT)
        |      AS n_windows,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cnt DESC, gram DESC) AS rn
        |  FROM c)
        |SELECT doc_id, gram AS top_gram, cnt AS top_count, n_windows,
        |  round(cnt / CAST(n_windows AS DOUBLE), 6) AS top_frac
        |FROM r WHERE rn = 1""".stripMargin,

    "q77_hash_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN CAST(('0x' ||
        |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |      < 450359962737049 THEN 'test'
        |    WHEN CAST(('0x' ||
        |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |      < 4053239664633446 THEN 'train'
        |    ELSE 'val' END AS split
        |FROM documents""".stripMargin,

    "q76_repetition_filter" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text
        |         ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM d),
        |g AS (SELECT doc_id, count(DISTINCT gram) AS dist FROM (
        |  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram FROM (
        |    SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l) - 1, 1))) AS i
        |    FROM tok))
        |  GROUP BY doc_id)
        |SELECT t.doc_id,
        |  round(CASE WHEN len(t.l) - 2 <= 0 THEN 0.0
        |    ELSE 1.0 - g.dist / CAST(len(t.l) - 2 AS DOUBLE) END, 6)
        |    AS dup_3gram_ratio,
        |  round(1.0 - len(list_distinct(t.l)) / CAST(len(t.l) AS DOUBLE), 6)
        |    AS dup_line_ratio
        |FROM tok t JOIN g ON t.doc_id = g.doc_id""".stripMargin,

    "q83_bigram_perplexity" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |toks AS (SELECT doc_id, t AS term FROM d, unnest(d.toks) AS u(t)),
        |bi AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM (SELECT doc_id, toks,
        |      unnest(generate_series(1, len(toks) - 1)) AS i FROM d)),
        |uni AS (SELECT term, count(*) AS ucnt FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(ucnt) AS DOUBLE) AS total FROM uni),
        |big AS (SELECT w1, w2, count(*) AS bcnt FROM bi GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(exp(avg(-ln(
        |    0.75 * coalesce(CAST(bcnt AS DOUBLE) / u1.ucnt, 0.0)
        |    + 0.25 * CAST(u2.ucnt AS DOUBLE) / total))), 6) AS perplexity
        |FROM bi
        |LEFT JOIN big USING (w1, w2)
        |LEFT JOIN uni u1 ON bi.w1 = u1.term
        |LEFT JOIN uni u2 ON bi.w2 = u2.term
        |CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    "q81_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
        |    FROM documents GROUP BY 1),
        |w AS (SELECT source, n, pow(n, 0.5) AS wgt FROM c),
        |t AS (SELECT sum(n) AS total, sum(wgt) AS wsum FROM w),
        |cut AS (SELECT source,
        |    CAST(floor(least(1.0, 0.5 * total * wgt / (wsum * n))
        |      * 4503599627370496.0) AS BIGINT) AS cutoff
        |  FROM w CROSS JOIN t)
        |SELECT doc_id, lang, source
        |FROM documents JOIN cut USING (source)
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT) < cutoff""".stripMargin,

    "q82_token_budget" ->
      """WITH h AS (SELECT doc_id, lang, source, n_chars,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM documents),
        |c AS (SELECT doc_id, lang, source,
        |    sum(n_chars) OVER (ORDER BY hv, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h)
        |SELECT doc_id, lang, source FROM c WHERE cum <= 100000""".stripMargin,

    "q75_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT)
        |  < CASE lang WHEN 'en' THEN 3602879701896397
        |              WHEN 'de' THEN 1351079888211148
        |              ELSE 0 END""".stripMargin,

    "q53_pii_scan" ->
      """WITH d AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' contact alice@example.com or bob.smith@mail.org'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' see https://example.org/data?id=1 or http://foo.bar/x'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0
        |         THEN ' call 555-123-4567 or 555.987.6543'
        |         ELSE '' END AS text
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text,
        |    'https?://[^ \t\n\x0B\f\r]+')) AS n_urls,
        |  len(regexp_extract_all(text,
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS n_phones
        |  FROM d)
        |SELECT * FROM c WHERE n_emails + n_urls + n_phones > 0""".stripMargin,

    "q62_unigram_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term
        |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS u(t)
        |  WHERE t <> ''),
        |c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT sum(cnt)::DOUBLE AS total FROM c)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(exp(avg(-ln(cnt::DOUBLE / total))), 6) AS perplexity
        |FROM toks JOIN c USING (term) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    "q69_drift_monitor" ->
      """WITH s AS (SELECT s_nationkey, CAST(s_acctbal AS REAL) AS v
        |  FROM supplier),
        |c AS (SELECT s_nationkey, count(*) AS n,
        |  count(*) FILTER (WHERE v <= 0.0) AS r0,
        |  count(*) FILTER (WHERE v <= 2500.0) AS r1,
        |  count(*) FILTER (WHERE v <= 5000.0) AS r2,
        |  count(*) FILTER (WHERE v <= 7500.0) AS r3
        |  FROM s GROUP BY 1),
        |g AS (SELECT count(*) AS n,
        |  count(*) FILTER (WHERE v <= 0.0) AS r0,
        |  count(*) FILTER (WHERE v <= 2500.0) AS r1,
        |  count(*) FILTER (WHERE v <= 5000.0) AS r2,
        |  count(*) FILTER (WHERE v <= 7500.0) AS r3
        |  FROM s),
        |p AS (SELECT s_nationkey,
        |  greatest(r0 / n::DOUBLE, 1e-6) AS p0,
        |  greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS p1,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS p2,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS p3,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS p4
        |  FROM c),
        |q AS (SELECT
        |  greatest(r0 / n::DOUBLE, 1e-6) AS q0,
        |  greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS q1,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS q2,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS q3,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS q4
        |  FROM g)
        |SELECT s_nationkey,
        |  round((p0 - q0) * ln(p0 / q0) + (p1 - q1) * ln(p1 / q1)
        |    + (p2 - q2) * ln(p2 / q2) + (p3 - q3) * ln(p3 / q3)
        |    + (p4 - q4) * ln(p4 / q4), 6) + 0.0 AS psi
        |FROM p CROSS JOIN q""".stripMargin,

    "q61_psi_drift" ->
      """WITH s AS (SELECT CASE WHEN s_nationkey < 12 THEN 'old'
        |    ELSE 'new' END AS cohort, CAST(s_acctbal AS REAL) AS v
        |  FROM supplier),
        |c AS (SELECT cohort, count(*) AS n,
        |  count(*) FILTER (WHERE v <= 0.0) AS r0,
        |  count(*) FILTER (WHERE v <= 2500.0) AS r1,
        |  count(*) FILTER (WHERE v <= 5000.0) AS r2,
        |  count(*) FILTER (WHERE v <= 7500.0) AS r3
        |  FROM s GROUP BY 1),
        |p AS (SELECT cohort, n,
        |  greatest(r0 / n::DOUBLE, 1e-6) AS p0,
        |  greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS p1,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS p2,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS p3,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS p4
        |  FROM c)
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round((a.p0 - b.p0) * ln(a.p0 / b.p0)
        |      + (a.p1 - b.p1) * ln(a.p1 / b.p1)
        |      + (a.p2 - b.p2) * ln(a.p2 / b.p2)
        |      + (a.p3 - b.p3) * ln(a.p3 / b.p3)
        |      + (a.p4 - b.p4) * ln(a.p4 / b.p4), 6) + 0.0 AS psi,
        |  round(a.p0 * ln(a.p0 / b.p0) + a.p1 * ln(a.p1 / b.p1)
        |      + a.p2 * ln(a.p2 / b.p2) + a.p3 * ln(a.p3 / b.p3)
        |      + a.p4 * ln(a.p4 / b.p4), 6) + 0.0 AS kl
        |FROM p a, p b WHERE a.cohort = 'old' AND b.cohort = 'new'""".stripMargin,

    "q128_ks_drift" ->
      """WITH s AS (SELECT CASE WHEN s_nationkey < 12 THEN 'old'
        |    ELSE 'new' END AS cohort, CAST(s_acctbal AS REAL) AS v
        |  FROM supplier),
        |c AS (SELECT cohort, count(*) AS n,
        |  count(*) FILTER (WHERE v <= 0.0) AS r0,
        |  count(*) FILTER (WHERE v <= 2500.0) AS r1,
        |  count(*) FILTER (WHERE v <= 5000.0) AS r2,
        |  count(*) FILTER (WHERE v <= 7500.0) AS r3
        |  FROM s GROUP BY 1)
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round(greatest(
        |    abs(a.r0 / a.n::DOUBLE - b.r0 / b.n::DOUBLE),
        |    abs(a.r1 / a.n::DOUBLE - b.r1 / b.n::DOUBLE),
        |    abs(a.r2 / a.n::DOUBLE - b.r2 / b.n::DOUBLE),
        |    abs(a.r3 / a.n::DOUBLE - b.r3 / b.n::DOUBLE)), 6) + 0.0 AS ks
        |FROM c a, c b WHERE a.cohort = 'old' AND b.cohort = 'new'""".stripMargin,

    "q129_lang_id_trained" ->
      """WITH d AS (SELECT doc_id, text, lang FROM documents
        |  WHERE doc_id < 500),
        |tok AS (SELECT doc_id, lang, unnest(list_filter(
        |    string_split(lower(text), ' '), t -> len(t) > 0)) AS t
        |  FROM d),
        |nt AS (SELECT doc_id, count(*)::DOUBLE AS nt FROM tok
        |  GROUP BY 1),
        |h AS (SELECT tok.doc_id AS doc_id, lang, nt, list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(regexp_split_to_array(t, ''),
        |        c -> unicode(c)::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 4096 AS b
        |  FROM tok JOIN nt ON tok.doc_id = nt.doc_id),
        |ls AS (SELECT unnest(['de', 'en', 'es', 'fr', 'zh']) AS lng),
        |w AS (SELECT lng, b,
        |    -(1.0 / (SELECT count(*) FROM d)) * sum(
        |      (0.5 - CASE WHEN h.lang = lng THEN 1.0 ELSE 0.0 END) / nt)
        |      AS w
        |  FROM h CROSS JOIN ls GROUP BY 1, 2),
        |s AS (SELECT h.doc_id AS doc_id, w.lng AS lng,
        |    sum(w.w) / count(*) AS logit
        |  FROM h JOIN w ON h.b = w.b GROUP BY 1, 2),
        |p AS (SELECT doc_id, lng, logit, round(logit, 6) + 0.0 AS rl,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(logit, 6) + 0.0 DESC, lng ASC) AS rn
        |  FROM s)
        |SELECT doc_id,
        |  max(CASE WHEN rn = 1 THEN lng END) AS pred_lang,
        |  max(rl) + 0.0 AS best_logit,
        |  round(max(CASE WHEN lng = 'de' THEN logit END), 6) + 0.0 AS logit_de,
        |  round(max(CASE WHEN lng = 'en' THEN logit END), 6) + 0.0 AS logit_en,
        |  round(max(CASE WHEN lng = 'es' THEN logit END), 6) + 0.0 AS logit_es,
        |  round(max(CASE WHEN lng = 'fr' THEN logit END), 6) + 0.0 AS logit_fr,
        |  round(max(CASE WHEN lng = 'zh' THEN logit END), 6) + 0.0 AS logit_zh
        |FROM p GROUP BY 1""".stripMargin,

    "q74_sequence_packing" ->
      """WITH d AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS start_offset
        |  FROM d)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(start_offset AS BIGINT) AS start_offset,
        |  CAST(start_offset // 512 AS BIGINT) AS pack_id,
        |  CAST(start_offset % 512 AS BIGINT) AS pack_offset
        |FROM c""".stripMargin,

    "q73_ngram_contamination" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |probe AS (
        |  SELECT doc_id, 'eval header : ' || text AS text
        |  FROM docs WHERE doc_id < 40
        |  UNION ALL
        |  SELECT doc_id, reverse(text) FROM docs
        |  WHERE doc_id BETWEEN 200 AND 219),
        |tg AS (SELECT DISTINCT train_id, gram FROM (
        |  SELECT train_id, array_to_string(l[i:i+7], ' ') AS gram FROM (
        |    SELECT doc_id AS train_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i
        |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM docs)))),
        |pg AS (SELECT DISTINCT probe_id, gram FROM (
        |  SELECT probe_id, array_to_string(l[i:i+7], ' ') AS gram FROM (
        |    SELECT doc_id AS probe_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i
        |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM probe))))
        |SELECT train_id, probe_id, count(*) AS shared_ngrams
        |FROM tg JOIN pg USING (gram)
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    "q85_substring_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    trim(CASE WHEN doc_id % 20 = 0 THEN text ||
        |      ' this boilerplate sentence repeats verbatim across many documents here'
        |    ELSE text END) AS text
        |  FROM documents),
        |w AS (SELECT DISTINCT doc_id, span FROM (
        |  SELECT doc_id, array_to_string(l[i:i+7], ' ') AS span FROM (
        |    SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i
        |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM d))))
        |SELECT span, count(*) AS n_docs
        |FROM w GROUP BY 1 HAVING count(*) >= 3""".stripMargin,

    "q97_char_entropy" ->
      """WITH ch AS (SELECT doc_id, substring(text, i, 1) AS c FROM (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents WHERE length(text) > 0)),
        |f AS (SELECT doc_id, c, count(*)::DOUBLE AS n
        |  FROM ch GROUP BY 1, 2),
        |t AS (SELECT doc_id, sum(n) AS tot FROM f GROUP BY 1),
        |e AS (SELECT f.doc_id AS doc_id,
        |    sum(-(n / tot) * ln(n / tot)) AS h
        |  FROM f JOIN t ON f.doc_id = t.doc_id GROUP BY 1)
        |SELECT doc_id, round(h, 6) + 0.0 AS entropy,
        |  CASE WHEN h < 2.0 THEN 'low' WHEN h > 4.5 THEN 'high'
        |    ELSE 'natural' END AS band
        |FROM e""".stripMargin,

    "q09_weighted_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT)
        |  < CAST(trunc(least(1.0, greatest(0.0, n_chars / 400.0))
        |      * 4503599627370496.0) AS BIGINT)""".stripMargin,

    "q19_collapse_repeats" ->
      """WITH d AS (SELECT doc_id,
        |    string_split(regexp_replace(text, ' ', chr(10), 'g') ||
        |      chr(10) || 'tail' || chr(10) || 'tail' || chr(10) || 'tail',
        |      chr(10)) AS l
        |  FROM documents),
        |u AS (SELECT doc_id, l[i] AS t, i FROM (
        |  SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM d)),
        |k AS (SELECT doc_id, t, i,
        |    lag(t) OVER (PARTITION BY doc_id ORDER BY i) AS p FROM u)
        |SELECT doc_id,
        |  string_agg(t, chr(10) ORDER BY i) AS text,
        |  count(*) AS n_lines
        |FROM k WHERE p IS NULL OR t <> p GROUP BY doc_id""".stripMargin,

    "q39_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 200),
        |mm AS (SELECT vec_id, v, list_min(v) AS qmin,
        |    (list_max(v) - list_min(v)) / 255.0 AS s FROM e),
        |q AS (SELECT vec_id, v, qmin, s,
        |    list_transform(v, x -> CASE WHEN s = 0 THEN 0
        |      ELSE least(255, greatest(0,
        |        floor((x - qmin) / s + 0.5)::INT)) END) AS codes
        |  FROM mm)
        |SELECT vec_id, round(qmin, 6) AS qmin, round(s, 6) AS qscale,
        |  len(codes) AS n_codes,
        |  list_sum(codes)::BIGINT AS code_sum,
        |  list_min(codes) AS code_min, list_max(codes) AS code_max,
        |  round(list_max(list_transform(range(1, len(v) + 1),
        |    i -> abs(v[i] - (qmin + codes[i] * s)))), 6) AS max_err
        |FROM q""".stripMargin,

    "q49_best_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, lang, source,
        |    length(text)::DOUBLE AS n_chars,
        |    len(list_filter(string_split(text, ' '), t -> len(t) > 0))::DOUBLE AS n_tok,
        |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS n_punct,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))::DOUBLE AS n_stop
        |  FROM documents),
        |s AS (SELECT doc_id, lang, source, round(
        |  0.25 * (CASE WHEN n_chars >= 100 AND n_chars <= 10000 THEN 1.0
        |               WHEN n_chars >= 20 THEN 0.5 ELSE 0.0 END)
        |  + 0.25 * (CASE WHEN n_tok > 0 AND n_chars / n_tok >= 3
        |                  AND n_chars / n_tok <= 12 THEN 1.0 ELSE 0.0 END)
        |  + 0.25 * (1.0 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 1.0 END))
        |  + 0.25 * (CASE WHEN n_tok > 0 AND n_stop / n_tok >= 0.05 THEN 1.0
        |            ELSE 0.0 END), 4) AS score
        |  FROM f),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang, source
        |    ORDER BY score DESC, doc_id DESC) AS rn FROM s)
        |SELECT lang, source, doc_id, score FROM r WHERE rn = 1""".stripMargin,

    "q38_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT count(*)::DOUBLE AS total FROM events)
        |SELECT user_id, n, round(n / total, 6) AS share
        |FROM c, t ORDER BY n DESC, user_id LIMIT 10""".stripMargin,

    "q37_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS k_sum,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
        |    AS k_avg
        |FROM events GROUP BY 1""".stripMargin,

    "q89_text_normalize" ->
      """WITH noisy AS (SELECT doc_id,
        |    text || '  cafe' || chr(769) || ' ' || chr(7) || ' nai' ||
        |      chr(776) || 've' || chr(9) || 'x  ' AS text
        |  FROM documents),
        |n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |      '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
        |  FROM noisy)
        |SELECT doc_id, norm_text, length(norm_text) AS n_chars_norm
        |FROM n""".stripMargin,

    "q88_bm25" ->
      """WITH tokd AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> len(t) > 0) AS toks FROM documents),
        |q AS (SELECT doc_id AS query_id, toks[1:6] AS qt
        |  FROM tokd WHERE doc_id < 3),
        |qt AS (SELECT DISTINCT query_id, t AS term
        |  FROM q, unnest(qt) AS u(t)),
        |dt AS (SELECT doc_id, len(toks)::DOUBLE AS dl, t AS term
        |  FROM tokd, unnest(toks) AS u(t)),
        |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf, max(dl) AS dl
        |  FROM dt WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
        |stats AS (SELECT count(*)::DOUBLE AS n_docs,
        |    avg(len(toks)) AS avgdl FROM tokd),
        |dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        |contrib AS (SELECT query_id, tf.doc_id AS doc_id,
        |    ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS c
        |  FROM tf JOIN dfq USING (term) JOIN qt USING (term)
        |  CROSS JOIN stats),
        |s AS (SELECT query_id, doc_id, round(sum(c), 6) AS score
        |  FROM contrib GROUP BY 1, 2),
        |top AS (SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        |  FROM s)
        |SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
        |FROM top WHERE rank <= 10""".stripMargin,

    "q86_bloom_decontaminate" ->
      """SELECT doc_id, lang FROM documents
        |WHERE text IN (SELECT text FROM documents WHERE doc_id % 13 = 0)
        |""".stripMargin,

    "q60_contamination" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |probe AS (SELECT doc_id, text || ' contamination tail' AS text
        |  FROM documents WHERE doc_id < 40),
        |ct AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |    t -> len(t) > 0) AS w FROM corpus),
        |pt AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |    t -> len(t) > 0) AS w FROM probe),
        |cs AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 2 THEN
        |    list_distinct(list_transform(range(1, len(w)),
        |      i -> w[i] || ' ' || w[i + 1]))
        |  ELSE [array_to_string(w, ' ')] END AS s FROM ct),
        |ps AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 2 THEN
        |    list_distinct(list_transform(range(1, len(w)),
        |      i -> w[i] || ' ' || w[i + 1]))
        |  ELSE [array_to_string(w, ' ')] END AS s FROM pt),
        |j AS (SELECT c.doc_id AS corpus_id, p.doc_id AS probe_id,
        |  len(list_intersect(c.s, p.s))::DOUBLE /
        |    len(list_distinct(c.s || p.s)) AS jaccard
        |  FROM cs c CROSS JOIN ps p)
        |SELECT corpus_id, probe_id, round(jaccard, 6) AS jaccard
        |FROM j WHERE jaccard >= 0.8""".stripMargin,

    "q59_corpus_heavy_hitters" ->
      """SELECT term, estimate FROM (
        |  SELECT t AS term, count(*) AS estimate
        |  FROM documents,
        |    unnest(string_split_regex(lower(text), '\s+')) AS u(t)
        |  WHERE t <> '' GROUP BY 1)
        |ORDER BY estimate DESC, term LIMIT 10""".stripMargin,

    "q58_embedding_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 200),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nb FROM e),
        |nn AS (SELECT vec_id, v, nb,
        |  CASE WHEN nb > 0 THEN list_transform(v, x -> x / nb) ELSE v END AS u
        |  FROM n),
        |m AS (SELECT vec_id, v, nb, u,
        |  sqrt(list_dot_product(u, u)) AS na FROM nn)
        |SELECT vec_id, round(nb, 6) AS norm_before,
        |  round(na, 6) AS norm_after,
        |  round(CASE WHEN nb > 0 AND na > 0
        |    THEN list_dot_product(v, u) / (nb * na) ELSE 0 END, 6)
        |    AS direction_cos
        |FROM m""".stripMargin,

    "q56_ppm_decode" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d),
        |xy AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px)
        |SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
        |  3 AS channels,
        |  round(avg((doc_id + 7 * x + 13 * y) % 256), 6) AS mean_r,
        |  round(avg((doc_id * 3 + 5 * x + 11 * y) % 256), 6) AS mean_g,
        |  round(avg((doc_id * 7 + 3 * x + 17 * y) % 256), 6) AS mean_b
        |FROM xy GROUP BY doc_id""".stripMargin,

    "q57_wav_stats" ->
      """WITH d AS (SELECT doc_id, 800 + doc_id % 100 AS n
        |  FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |v AS (SELECT doc_id, n,
        |  ((doc_id * 31 + i * 17) % 2003) - 1001 AS smp FROM s)
        |SELECT doc_id, 1 AS channels, 8000 AS sample_rate,
        |  any_value(n) AS n_frames, any_value(n) * 125 AS duration_us,
        |  round(sqrt(avg(smp * smp)), 6) AS rms
        |FROM v GROUP BY doc_id""".stripMargin,

    "q55_iqr_outliers" ->
      """WITH f AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS REAL) AS v,
        |    l_extendedprice AS orig
        |  FROM lineitem WHERE l_orderkey % 293 = 0),
        |r AS (
        |  SELECT l_returnflag, v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM f),
        |q AS (
        |  SELECT l_returnflag,
        |    min(v) FILTER (WHERE rn >= ceil(0.25 * cnt))::DOUBLE AS q1,
        |    min(v) FILTER (WHERE rn >= ceil(0.75 * cnt))::DOUBLE AS q3
        |  FROM r GROUP BY 1),
        |fe AS (SELECT l_returnflag, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM q)
        |SELECT fe.l_returnflag, round(q1, 2) AS q1, round(q3, 2) AS q3,
        |  round(lo, 2) AS lo, round(hi, 2) AS hi,
        |  sum(CASE WHEN f.orig < lo OR f.orig > hi
        |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        |  count(*) AS n
        |FROM f JOIN fe ON f.l_returnflag = fe.l_returnflag
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,

    "q54_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term
        |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS u(t)
        |  WHERE t <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |  tf.cnt * ln(n.n_docs / dfq.df) AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |top AS (SELECT doc_id, term, score,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term ASC) AS rank
        |  FROM scored)
        |SELECT doc_id, term, round(score, 6) AS score, rank
        |FROM top WHERE rank <= 3""".stripMargin,

    "q47_bpeish_tokens" ->
      """WITH f AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe,
        |    len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS n_ws
        |  FROM documents)
        |SELECT lang, sum(n_bpe)::BIGINT AS bpe_tokens,
        |  sum(n_ws)::BIGINT AS ws_tokens,
        |  round(avg(n_bpe), 4) AS avg_bpe
        |FROM f GROUP BY 1""".stripMargin,

    "q43_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q44_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) >= 2 THEN
        |      list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]))
        |    ELSE [array_to_string(w, ' ')] END AS s
        |  FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(a.s || b.s)), 4) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "q45_embedding_top1" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS iid, embedding::DOUBLE[] AS ie FROM embeddings),
        |sims AS (
        |  SELECT qid, iid,
        |    list_dot_product(qe, ie) /
        |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ie, ie))) AS s
        |  FROM q, c WHERE iid <> qid),
        |top AS (
        |  SELECT qid, iid, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, iid) AS rn
        |  FROM sims)
        |SELECT qid AS query_id, iid AS item_id, round(s, 6) + 0.0 AS cosine
        |FROM top WHERE rn = 1""".stripMargin,

    "q108_ivf_recall" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS iid, embedding::DOUBLE[] AS ie FROM embeddings),
        |sims AS (
        |  SELECT qid, iid,
        |    list_dot_product(qe, ie) /
        |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ie, ie))) AS s
        |  FROM q, c WHERE iid <> qid),
        |top AS (
        |  SELECT qid, iid, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, iid) AS rn
        |  FROM sims),
        |sel AS (SELECT qid, iid, s FROM top WHERE rn <= 10)
        |SELECT qid AS query_id, iid AS item_id,
        |  round(s, 6) + 0.0 AS cosine,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY round(s, 6) DESC, iid) AS rank
        |FROM sel""".stripMargin,

    "q109_ivfpq_recall" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS iid, embedding::DOUBLE[] AS ie FROM embeddings),
        |sims AS (
        |  SELECT qid, iid,
        |    list_dot_product(qe, ie) /
        |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ie, ie))) AS s
        |  FROM q, c WHERE iid <> qid),
        |top AS (
        |  SELECT qid, iid,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, iid) AS rn
        |  FROM sims)
        |SELECT qid AS query_id, count(*) AS n_exact, count(*) AS n_hit,
        |  1.0 AS recall
        |FROM top WHERE rn <= 10 GROUP BY 1""".stripMargin,

    "q110_auto_join" ->
      """WITH ev AS (SELECT CASE WHEN user_id % 2 = 0 THEN 0
        |      ELSE user_id END AS k, value
        |  FROM events),
        |dim AS (SELECT DISTINCT k FROM ev),
        |d2 AS (SELECT k, 'g' || (k % 7) AS label FROM dim)
        |SELECT label, count(*) AS n,
        |  round(sum(value), 2) + 0.0 AS value_sum
        |FROM ev JOIN d2 USING (k)
        |GROUP BY 1""".stripMargin,

    "q111_gopher_quality" ->
      """WITH d AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' of and that' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' ## ## ## ##' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |      '- a bullet line here' || chr(10) ||
        |      'more trailing thought...' ELSE '' END AS text
        |  FROM documents WHERE doc_id < 500),
        |m AS (SELECT doc_id, text,
        |    string_split(text, ' ') AS toks,
        |    string_split(lower(text), ' ') AS ltoks,
        |    string_split(text, chr(10)) AS lines
        |  FROM d),
        |r AS (SELECT doc_id,
        |    len(toks)::BIGINT AS n_words,
        |    CASE WHEN len(toks) > 0 THEN
        |      (length(text) - (len(toks) - 1))::DOUBLE / len(toks)
        |      ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN len(toks) > 0 THEN
        |      (length(text) - length(replace(text, '#', '')))::DOUBLE
        |      / len(toks) ELSE 0.0 END AS hash_ratio,
        |    CASE WHEN len(toks) > 0 THEN
        |      ((length(text) - length(replace(text, '...', ''))) / 3
        |      )::DOUBLE / len(toks) ELSE 0.0 END AS ellipsis_ratio,
        |    len(list_filter(lines, l -> starts_with(l, '- ')
        |      OR starts_with(l, '* ')))::DOUBLE / len(lines) AS bullet_frac,
        |    len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
        |      / len(lines) AS ellipsis_frac,
        |    CASE WHEN len(toks) > 0 THEN
        |      len(list_filter(toks, tk ->
        |        regexp_matches(tk, '[a-zA-Z]')))::DOUBLE / len(toks)
        |      ELSE 0.0 END AS alpha_frac,
        |    (CASE WHEN list_contains(ltoks, 'the') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'be') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'to') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'of') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'and') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'that') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'have') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(ltoks, 'with') THEN 1 ELSE 0 END
        |    )::BIGINT AS stop_hits
        |  FROM m)
        |SELECT doc_id, n_words, round(mean_word_len, 4) AS mean_word_len,
        |  round(hash_ratio, 6) AS hash_ratio,
        |  round(ellipsis_ratio, 6) AS ellipsis_ratio,
        |  round(bullet_frac, 6) AS bullet_frac,
        |  round(ellipsis_frac, 6) AS ellipsis_frac,
        |  round(alpha_frac, 6) AS alpha_frac, stop_hits,
        |  CAST(n_words >= 50 AND n_words <= 100000
        |    AND round(mean_word_len, 4) >= 3.0
        |    AND round(mean_word_len, 4) <= 10.0
        |    AND round(hash_ratio, 6) <= 0.1
        |    AND round(ellipsis_ratio, 6) <= 0.1
        |    AND round(bullet_frac, 6) <= 0.9
        |    AND round(ellipsis_frac, 6) <= 0.3
        |    AND round(alpha_frac, 6) >= 0.8
        |    AND stop_hits >= 2 AS INT) AS passed
        |FROM r""".stripMargin,

    "q112_c4_clean" ->
      """WITH l AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents WHERE doc_id < 400),
        |w AS (SELECT doc_id, (i - 1) // 8 AS li,
        |    array_to_string(l[i:i+7], ' ') AS base
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, len(l) + 1, 8)) AS i FROM l)),
        |w2 AS (SELECT doc_id, li, base ||
        |    CASE WHEN (doc_id + li) % 7 = 0 THEN ' javascript.'
        |      WHEN (doc_id + li) % 3 = 0 THEN '' ELSE '.' END AS line
        |  FROM w),
        |agg AS (SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY li) AS t
        |  FROM w2 GROUP BY 1),
        |d AS (SELECT doc_id, t ||
        |    CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
        |      'brace { line with enough words here.' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
        |      'lorem ipsum dolor sit amet line.' ELSE '' END AS text
        |  FROM agg),
        |c AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
        |    list_filter(string_split(text, chr(10)), x ->
        |      regexp_matches(trim(x), '[.!?"]$')
        |      AND len(list_filter(string_split(trim(x), ' '),
        |        w -> len(w) > 0)) >= 5
        |      AND NOT contains(lower(trim(x)), 'javascript')) AS kept,
        |    (NOT contains(lower(text), 'lorem ipsum')
        |     AND NOT contains(text, '{')) AS page_markers_ok
        |  FROM d)
        |SELECT doc_id,
        |  coalesce(array_to_string(kept, chr(10)), '') AS text,
        |  len(lines)::BIGINT AS n_lines_in,
        |  len(kept)::BIGINT AS n_lines_kept,
        |  CAST(len(kept) >= 3 AND page_markers_ok AS INT) AS kept
        |FROM c""".stripMargin,

    "q113_context_chunks" ->
      """WITH l AS (SELECT doc_id, list_filter(string_split(text, ' '),
        |      t -> len(t) > 0) AS l
        |  FROM documents WHERE doc_id < 300),
        |s AS (SELECT doc_id, (i - 1) // 24 AS chunk_idx,
        |    l[i:i+31] AS c
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, len(l) + 1, 24)) AS i FROM l))
        |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
        |  array_to_string(c, ' ') AS chunk, len(c)::BIGINT AS n_tokens
        |FROM s""".stripMargin,

    "q114_categorical_drift" ->
      """WITH e AS (SELECT event_type, (user_id % 2 = 0) AS is_a
        |  FROM events),
        |c AS (SELECT event_type,
        |    count(*) FILTER (WHERE is_a) AS ca,
        |    count(*) FILTER (WHERE NOT is_a) AS cb
        |  FROM e GROUP BY 1),
        |t AS (SELECT sum(ca)::DOUBLE AS ta, sum(cb)::DOUBLE AS tb
        |  FROM c),
        |terms AS (SELECT event_type,
        |    (greatest(ca / ta, 1e-6) - greatest(cb / tb, 1e-6)) *
        |      ln(greatest(ca / ta, 1e-6) / greatest(cb / tb, 1e-6))
        |      AS term
        |  FROM c, t),
        |p AS (SELECT list_sum(list(term ORDER BY event_type)) AS psi
        |  FROM terms)
        |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
        |  round(psi, 6) + 0.0 AS psi
        |FROM t, p""".stripMargin,

    "q115_dsir_weights" ->
      """WITH raw AS (SELECT doc_id, text, lang FROM documents
        |  WHERE doc_id < 500),
        |tok AS (SELECT doc_id, unnest(list_filter(
        |    string_split(lower(text), ' '), t -> len(t) > 0)) AS t
        |  FROM raw),
        |h AS (SELECT doc_id, list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(regexp_split_to_array(t, ''),
        |        c -> unicode(c)::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 4096 AS b
        |  FROM tok),
        |en AS (SELECT doc_id FROM raw WHERE lang = 'en'),
        |tc AS (SELECT b, count(*) AS n FROM h JOIN en USING (doc_id)
        |  GROUP BY 1),
        |rc AS (SELECT b, count(*) AS n FROM h GROUP BY 1),
        |tots AS (SELECT (SELECT sum(n) FROM tc) AS tt,
        |  (SELECT sum(n) FROM rc) AS rt),
        |w AS (SELECT h.doc_id AS doc_id,
        |    ln((coalesce(tc.n, 0) + 1) / (tt + 4096.0)) -
        |      ln((rc.n + 1) / (rt + 4096.0)) AS wt
        |  FROM h LEFT JOIN tc ON h.b = tc.b
        |  JOIN rc ON h.b = rc.b, tots),
        |s AS (SELECT doc_id, sum(wt) / count(*) AS lr FROM w GROUP BY 1)
        |SELECT raw.doc_id AS doc_id,
        |  round(coalesce(s.lr, 0.0), 6) + 0.0 AS logratio
        |FROM raw LEFT JOIN s ON raw.doc_id = s.doc_id""".stripMargin,

    "q116_pii_redact" ->
      """WITH d AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' contact alice@example.com or bob.smith@mail.org'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' see https://example.org/data?id=1 or http://foo.bar/x'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0
        |         THEN ' call 555-123-4567 or 555.987.6543'
        |         ELSE '' END AS text
        |  FROM documents
        |  WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 13 = 0)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '[EMAIL]', 'g'),
        |    'https?://[^ \t\n\x0B\f\r]+', '[URL]', 'g'),
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '[PHONE]', 'g')
        |    AS text,
        |  (len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |   + len(regexp_extract_all(text, 'https?://[^ \t\n\x0B\f\r]+'))
        |   + len(regexp_extract_all(text,
        |     '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')))::BIGINT
        |    AS n_redacted
        |FROM d""".stripMargin,

    "q117_schema_drift" ->
      """WITH a AS (
        |  SELECT 'l_quantity' AS c, 'FRACTIONAL' AS type_a,
        |    0.0 AS null_frac_a,
        |    (SELECT count(DISTINCT l_quantity) FROM lineitem)::BIGINT
        |      AS card_a
        |  UNION ALL SELECT 'l_linestatus', 'STRING', 0.0,
        |    (SELECT count(DISTINCT l_linestatus) FROM lineitem)
        |  UNION ALL SELECT 'l_linenumber', 'INTEGRAL', 0.0,
        |    (SELECT count(DISTINCT l_linenumber) FROM lineitem)),
        |b AS (
        |  SELECT 'l_quantity' AS c, 'STRING' AS type_b,
        |    0.0 AS null_frac_b,
        |    (SELECT count(DISTINCT CAST(l_quantity AS VARCHAR))
        |      FROM lineitem)::BIGINT AS card_b
        |  UNION ALL SELECT 'l_linestatus', 'STRING',
        |    (SELECT (count(*) FILTER (WHERE l_linenumber % 5 = 0))::DOUBLE
        |      / count(*) FROM lineitem),
        |    (SELECT count(DISTINCT l_linestatus) FROM lineitem
        |      WHERE l_linenumber % 5 <> 0)
        |  UNION ALL SELECT 'l_tax', 'FRACTIONAL', 0.0,
        |    (SELECT count(DISTINCT l_tax) FROM lineitem))
        |SELECT coalesce(a.c, b.c) AS col_name,
        |  CAST(a.c IS NOT NULL AS INT) AS present_a,
        |  CAST(b.c IS NOT NULL AS INT) AS present_b,
        |  type_a, type_b,
        |  CAST(type_a IS NOT NULL AND type_b IS NOT NULL
        |    AND type_a <> type_b AS INT) AS type_changed,
        |  round(null_frac_a, 6) AS null_frac_a,
        |  round(null_frac_b, 6) AS null_frac_b,
        |  round(null_frac_b - null_frac_a, 6) AS null_frac_delta,
        |  card_a, card_b
        |FROM a FULL OUTER JOIN b ON a.c = b.c""".stripMargin,

    "q143_embedding_drift" ->
      """WITH cur AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
        |    WHERE label >= 5),
        |ref AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
        |    WHERE label < 5),
        |cu AS (SELECT unnest(e) AS x, unnest(range(len(e))) AS i FROM cur),
        |ru AS (SELECT unnest(e) AS x, unnest(range(len(e))) AS i FROM ref),
        |cm AS (SELECT i, avg(x) AS m FROM cu GROUP BY i),
        |rm AS (SELECT i, avg(x) AS m FROM ru GROUP BY i),
        |j AS (SELECT cm.m AS ma, rm.m AS mb FROM cm JOIN rm
        |    ON cm.i = rm.i),
        |s AS (SELECT sum(ma * mb) AS dotab, sum(ma * ma) AS da,
        |    sum(mb * mb) AS db, sum((ma - mb) * (ma - mb)) AS dd FROM j),
        |nc AS (SELECT count(*) AS n_cur,
        |    avg(sqrt(list_sum(list_transform(e, x -> x * x)))) AS nm
        |  FROM cur),
        |nr AS (SELECT count(*) AS n_ref,
        |    avg(sqrt(list_sum(list_transform(e, x -> x * x)))) AS nm
        |  FROM ref)
        |SELECT n_cur, n_ref,
        |  round(dotab / (sqrt(da) * sqrt(db)), 6) + 0.0 AS mean_cosine,
        |  round(sqrt(dd), 6) + 0.0 AS mean_l2_shift,
        |  round(nc.nm, 6) + 0.0 AS norm_mean_cur,
        |  round(nr.nm, 6) + 0.0 AS norm_mean_ref
        |FROM s, nc, nr""".stripMargin,

    "q144_embedding_drift_dim" ->
      """WITH cur AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
        |    WHERE label >= 5),
        |ref AS (SELECT embedding::DOUBLE[] AS e FROM embeddings
        |    WHERE label < 5),
        |cu AS (SELECT unnest(e) AS x, unnest(range(len(e))) AS i FROM cur),
        |ru AS (SELECT unnest(e) AS x, unnest(range(len(e))) AS i FROM ref),
        |cm AS (SELECT i, avg(x) AS m FROM cu GROUP BY i),
        |rm AS (SELECT i, avg(x) AS m FROM ru GROUP BY i)
        |SELECT cm.i::BIGINT AS dim,
        |  round(cm.m, 6) + 0.0 AS mean_cur,
        |  round(rm.m, 6) + 0.0 AS mean_ref,
        |  round(abs(cm.m - rm.m), 6) + 0.0 AS shift
        |FROM cm JOIN rm ON cm.i = rm.i""".stripMargin,

    "q118_jsd_drift" ->
      """WITH s AS (SELECT CASE WHEN s_nationkey < 12 THEN 'old'
        |    ELSE 'new' END AS cohort, CAST(s_acctbal AS REAL) AS v
        |  FROM supplier),
        |c AS (SELECT cohort, count(*) AS n,
        |  count(*) FILTER (WHERE v <= 0.0) AS r0,
        |  count(*) FILTER (WHERE v <= 2500.0) AS r1,
        |  count(*) FILTER (WHERE v <= 5000.0) AS r2,
        |  count(*) FILTER (WHERE v <= 7500.0) AS r3
        |  FROM s GROUP BY 1),
        |p AS (SELECT cohort,
        |  greatest(r0 / n::DOUBLE, 1e-6) AS p0,
        |  greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS p1,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS p2,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS p3,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS p4
        |  FROM c),
        |num AS (SELECT
        |    (a.p0 * ln(a.p0 / ((a.p0 + b.p0) / 2))
        |      + b.p0 * ln(b.p0 / ((a.p0 + b.p0) / 2))) * 0.5
        |  + (a.p1 * ln(a.p1 / ((a.p1 + b.p1) / 2))
        |      + b.p1 * ln(b.p1 / ((a.p1 + b.p1) / 2))) * 0.5
        |  + (a.p2 * ln(a.p2 / ((a.p2 + b.p2) / 2))
        |      + b.p2 * ln(b.p2 / ((a.p2 + b.p2) / 2))) * 0.5
        |  + (a.p3 * ln(a.p3 / ((a.p3 + b.p3) / 2))
        |      + b.p3 * ln(b.p3 / ((a.p3 + b.p3) / 2))) * 0.5
        |  + (a.p4 * ln(a.p4 / ((a.p4 + b.p4) / 2))
        |      + b.p4 * ln(b.p4 / ((a.p4 + b.p4) / 2))) * 0.5 AS jn
        |  FROM p a, p b WHERE a.cohort = 'old' AND b.cohort = 'new'),
        |e AS (SELECT event_type, (user_id % 2 = 0) AS is_a FROM events),
        |cc AS (SELECT event_type,
        |    count(*) FILTER (WHERE is_a) AS ca,
        |    count(*) FILTER (WHERE NOT is_a) AS cb
        |  FROM e GROUP BY 1),
        |tt AS (SELECT sum(ca)::DOUBLE AS ta, sum(cb)::DOUBLE AS tb
        |  FROM cc),
        |terms AS (SELECT event_type,
        |    (greatest(ca / ta, 1e-6) *
        |       ln(greatest(ca / ta, 1e-6) /
        |          ((greatest(ca / ta, 1e-6) + greatest(cb / tb, 1e-6)) / 2))
        |     + greatest(cb / tb, 1e-6) *
        |       ln(greatest(cb / tb, 1e-6) /
        |          ((greatest(ca / ta, 1e-6) + greatest(cb / tb, 1e-6)) / 2)))
        |      * 0.5 AS term
        |  FROM cc, tt),
        |cat AS (SELECT list_sum(list(term ORDER BY event_type)) AS jc
        |  FROM terms)
        |SELECT round(jn, 6) + 0.0 AS jsd_num,
        |  round(jc, 6) + 0.0 AS jsd_cat
        |FROM num, cat""".stripMargin,

    "q119_ppm_resize" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT doc_id, w, h, unnest(range(32)) AS p FROM d),
        |xy AS (SELECT doc_id, w, h, p % 8 AS x, p // 8 AS y FROM px),
        |src AS (SELECT doc_id,
        |    (x * w) // 8 AS sx, (y * h) // 4 AS sy FROM xy)
        |SELECT doc_id, 8 AS width, 4 AS height,
        |  round(avg((doc_id + 7 * sx + 13 * sy) % 256), 6) AS mean_r,
        |  round(avg((doc_id * 3 + 5 * sx + 11 * sy) % 256), 6) AS mean_g,
        |  round(avg((doc_id * 7 + 3 * sx + 17 * sy) % 256), 6) AS mean_b,
        |  107::BIGINT AS n_bytes
        |FROM src GROUP BY 1""".stripMargin,

    "q120_wav_windows" ->
      """WITH d AS (SELECT doc_id, (800 + doc_id % 100)::INT AS n
        |  FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, i // 200 AS w,
        |    ((doc_id * 31 + i * 17) % 2003) - 1001 AS v
        |  FROM (SELECT doc_id, unnest(range(n)) AS i FROM d))
        |SELECT doc_id, w::BIGINT AS window_idx,
        |  count(*)::BIGINT AS n_frames,
        |  round(sqrt(avg((v * v)::DOUBLE)), 6) AS rms
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q131_image_hash" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |ag AS (SELECT doc_id, p,
        |    ((doc_id + 7 * sx + 13 * sy) % 256)
        |      + ((doc_id * 3 + 5 * sx + 11 * sy) % 256)
        |      + ((doc_id * 7 + 3 * sx + 17 * sy) % 256) AS g3
        |  FROM (SELECT doc_id, p, ((p % 8) * w) // 8 AS sx,
        |      ((p // 8) * h) // 8 AS sy
        |    FROM (SELECT doc_id, w, h, unnest(range(64)) AS p FROM d))),
        |asum AS (SELECT doc_id, sum(g3) AS s3 FROM ag GROUP BY 1),
        |abits AS (SELECT ag.doc_id AS doc_id, p,
        |    CASE WHEN 64 * g3 > s3 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM ag JOIN asum ON ag.doc_id = asum.doc_id),
        |ah AS (SELECT doc_id,
        |    sum(CASE WHEN p >= 32 THEN bit << (p - 32) ELSE 0 END)::BIGINT
        |      AS ahash_hi,
        |    sum(CASE WHEN p < 32 THEN bit << p ELSE 0 END)::BIGINT
        |      AS ahash_lo
        |  FROM abits GROUP BY 1),
        |dg AS (SELECT doc_id, x, y,
        |    ((doc_id + 7 * sx + 13 * sy) % 256)
        |      + ((doc_id * 3 + 5 * sx + 11 * sy) % 256)
        |      + ((doc_id * 7 + 3 * sx + 17 * sy) % 256) AS g3
        |  FROM (SELECT doc_id, p % 9 AS x, p // 9 AS y,
        |      ((p % 9) * w) // 9 AS sx, ((p // 9) * h) // 8 AS sy
        |    FROM (SELECT doc_id, w, h, unnest(range(72)) AS p FROM d))),
        |dbits AS (SELECT l.doc_id AS doc_id, l.y * 8 + l.x AS p,
        |    CASE WHEN r.g3 > l.g3 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM dg l JOIN dg r ON l.doc_id = r.doc_id AND l.y = r.y
        |    AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |dh AS (SELECT doc_id,
        |    sum(CASE WHEN p >= 32 THEN bit << (p - 32) ELSE 0 END)::BIGINT
        |      AS dhash_hi,
        |    sum(CASE WHEN p < 32 THEN bit << p ELSE 0 END)::BIGINT
        |      AS dhash_lo
        |  FROM dbits GROUP BY 1)
        |SELECT ah.doc_id AS doc_id, ahash_hi, ahash_lo, dhash_hi, dhash_lo
        |FROM ah JOIN dh ON ah.doc_id = dh.doc_id""".stripMargin,

    "q130_wav_zcr_peak" ->
      """WITH d AS (SELECT doc_id, (800 + doc_id % 100)::INT AS n
        |  FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, i, i // 200 AS w,
        |    ((doc_id * 31 + i * 17) % 2003) - 1001 AS v
        |  FROM (SELECT doc_id, unnest(range(n)) AS i FROM d)),
        |x AS (SELECT doc_id, w, v,
        |    lag(v) OVER (PARTITION BY doc_id, w ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id, w::BIGINT AS window_idx,
        |  count(*)::BIGINT AS n_frames,
        |  round(sqrt(avg((v * v)::DOUBLE)), 6) AS rms,
        |  coalesce(sum(CASE WHEN pv IS NOT NULL
        |    AND ((pv >= 0) != (v >= 0)) THEN 1 END), 0)::BIGINT AS zcr,
        |  max(abs(v))::BIGINT AS peak
        |FROM x GROUP BY 1, 2""".stripMargin,

    "q121_matryoshka" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM embeddings WHERE vec_id < 200),
        |z AS (SELECT e AS e0 FROM e WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_dot_product(e[1:16], e0[1:16]) /
        |    (sqrt(list_dot_product(e[1:16], e[1:16])) *
        |     sqrt(list_dot_product(e0[1:16], e0[1:16]))), 6) + 0.0
        |    AS cos16,
        |  round(list_dot_product(e, e0) /
        |    (sqrt(list_dot_product(e, e)) *
        |     sqrt(list_dot_product(e0, e0))), 6) + 0.0 AS cos_full
        |FROM e, z""".stripMargin,

    "q122_ngram_novelty" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id < 400),
        |sfx AS (SELECT ' shared boilerplate sentence repeats verbatim' ||
        |  ' across many documents here okay' AS s),
        |ref AS (SELECT doc_id, text || (SELECT s FROM sfx) AS text
        |  FROM base WHERE doc_id % 10 = 0),
        |probe AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN (SELECT s FROM sfx)
        |      ELSE '' END AS text
        |  FROM base WHERE doc_id % 10 <> 0),
        |rl AS (SELECT string_split(text, ' ') AS l FROM ref),
        |rg AS (SELECT DISTINCT array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT l, unnest(range(1, greatest(len(l) - 6, 1))) AS i
        |    FROM rl)),
        |pl AS (SELECT doc_id, string_split(text, ' ') AS l FROM probe),
        |pg AS (SELECT DISTINCT doc_id,
        |    array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i FROM pl)),
        |j AS (SELECT pg.doc_id AS doc_id,
        |    CASE WHEN rg.g IS NULL THEN 1 ELSE 0 END AS novel
        |  FROM pg LEFT JOIN rg ON pg.g = rg.g)
        |SELECT doc_id, count(*)::BIGINT AS n_grams,
        |  sum(novel)::BIGINT AS n_novel,
        |  round(sum(novel)::DOUBLE / count(*), 6) AS novelty
        |FROM j GROUP BY 1""".stripMargin,

    "q132_novelty_stored" ->
      """WITH ref AS (SELECT text FROM documents WHERE doc_id >= 250),
        |probe AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id < 250),
        |rl AS (SELECT string_split(text, ' ') AS l FROM ref),
        |rg AS (SELECT DISTINCT array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT l, unnest(range(1, greatest(len(l) - 6, 1))) AS i
        |    FROM rl)),
        |pl AS (SELECT doc_id, string_split(text, ' ') AS l FROM probe),
        |pg AS (SELECT DISTINCT doc_id,
        |    array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i FROM pl)),
        |j AS (SELECT pg.doc_id AS doc_id,
        |    CASE WHEN rg.g IS NULL THEN 1 ELSE 0 END AS novel
        |  FROM pg LEFT JOIN rg ON pg.g = rg.g)
        |SELECT doc_id, count(*)::BIGINT AS n_grams,
        |  sum(novel)::BIGINT AS n_novel,
        |  round(sum(novel)::DOUBLE / count(*), 6) AS novelty
        |FROM j GROUP BY 1""".stripMargin,

    "q133_novelty_stream" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id < 300),
        |sfx AS (SELECT ' planted shared sentence for the streaming' ||
        |  ' novelty row okay yes' AS s),
        |ref AS (SELECT text || (SELECT s FROM sfx) AS text
        |  FROM base WHERE doc_id % 7 = 0),
        |probe AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN (SELECT s FROM sfx)
        |      ELSE '' END AS text
        |  FROM base WHERE doc_id % 7 <> 0),
        |rl AS (SELECT string_split(text, ' ') AS l FROM ref),
        |rg AS (SELECT DISTINCT array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT l, unnest(range(1, greatest(len(l) - 6, 1))) AS i
        |    FROM rl)),
        |pl AS (SELECT doc_id, string_split(text, ' ') AS l FROM probe),
        |pg AS (SELECT DISTINCT doc_id,
        |    array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i FROM pl)),
        |j AS (SELECT pg.doc_id AS doc_id,
        |    CASE WHEN rg.g IS NULL THEN 1 ELSE 0 END AS novel
        |  FROM pg LEFT JOIN rg ON pg.g = rg.g)
        |SELECT doc_id, count(*)::BIGINT AS n_grams,
        |  sum(novel)::BIGINT AS n_novel,
        |  round(sum(novel)::DOUBLE / count(*), 6) AS novelty
        |FROM j GROUP BY 1""".stripMargin,

    // the 10-step multiplicative-weights iteration is unrolled (w0..w10):
    // each step renormalizes across the K domains and remixes with
    // uniform, exactly the Scala driver loop's arithmetic
    "q134_doremi_weights" ->
      ("""WITH e AS (SELECT source AS domain,
        |    avg(greatest(ln(1 + length(text))
        |      - ln(1 + len(string_split(text, ' '))), 0)) AS excess
        |  FROM documents GROUP BY 1),
        |w0 AS (SELECT domain, excess,
        |    1.0 / (count(*) OVER ()) AS w FROM e),
        |""".stripMargin +
        (1 to 10).map(i =>
          s"""w$i AS (SELECT domain, excess,
            |    (1 - 0.1) * (w * exp(excess))
            |      / (sum(w * exp(excess)) OVER ())
            |      + 0.1 / (count(*) OVER ()) AS w FROM w${i - 1}),
            |""".stripMargin).mkString +
        """sel AS (SELECT * FROM w10)
        |SELECT domain AS source, round(excess, 6) AS excess,
        |  round(w, 6) AS weight
        |FROM sel""".stripMargin),

    // q134's solver CTE chain, then the mixture resampler's per-domain
    // hash cutoffs — rate_k = min(1, f * total * w_k / n_k)
    "q135_mixture_apply" ->
      ("""WITH e AS (SELECT source AS domain,
        |    avg(greatest(ln(1 + length(text))
        |      - ln(1 + len(string_split(text, ' '))), 0)) AS excess
        |  FROM documents GROUP BY 1),
        |w0 AS (SELECT domain, excess,
        |    1.0 / (count(*) OVER ()) AS w FROM e),
        |""".stripMargin +
        (1 to 10).map(i =>
          s"""w$i AS (SELECT domain, excess,
            |    (1 - 0.1) * (w * exp(excess))
            |      / (sum(w * exp(excess)) OVER ())
            |      + 0.1 / (count(*) OVER ()) AS w FROM w${i - 1}),
            |""".stripMargin).mkString +
        """c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
        |    FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM c),
        |cut AS (SELECT c.source,
        |    CAST(floor(least(1.0, 0.3 * total * w10.w / n)
        |      * 4503599627370496.0) AS BIGINT) AS cutoff
        |  FROM c JOIN w10 ON c.source = w10.domain CROSS JOIN t)
        |SELECT doc_id, source, lang
        |FROM documents JOIN cut USING (source)
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |    AS BIGINT) < cutoff""".stripMargin),

    // q50's batch sessionization minus the seq number: streaming
    // session_window closes to the same per-session stats
    "q136_streaming_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
        |m AS (SELECT user_id, tu,
        |  CASE WHEN lag(tu) OVER w IS NULL
        |         OR tu - lag(tu) OVER w > 14400000000 THEN 1
        |       ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        |s AS (SELECT user_id, tu,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY tu
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
        |  FROM m)
        |SELECT user_id, count(*) AS n_events,
        |  min(tu) AS start_t, max(tu) AS end_t,
        |  max(tu) - min(tu) AS duration_t
        |FROM s GROUP BY user_id, session_seq""".stripMargin,

    // the K-step flag chain as K chained CTEs: step i fires on its event
    // type when a strictly earlier row (ts, event_id order) reached i-1
    "q137_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_type,
        |    event_id FROM events),
        |c1 AS (SELECT user_id, tu, event_type, event_id,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS f1
        |  FROM e),
        |c2 AS (SELECT *, CASE WHEN event_type = 'click' AND
        |      coalesce(max(f1) OVER (PARTITION BY user_id
        |        ORDER BY tu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |    THEN 1 ELSE 0 END AS f2 FROM c1),
        |c3 AS (SELECT *, CASE WHEN event_type = 'purchase' AND
        |      coalesce(max(f2) OVER (PARTITION BY user_id
        |        ORDER BY tu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |    THEN 1 ELSE 0 END AS f3 FROM c2),
        |a AS (SELECT user_id,
        |    min(CASE WHEN f1 = 1 THEN tu END) AS t1,
        |    min(CASE WHEN f2 = 1 THEN tu END) AS t2,
        |    min(CASE WHEN f3 = 1 THEN tu END) AS t3
        |  FROM c3 GROUP BY 1)
        |SELECT user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |  coalesce(t1, -1) AS t_step1, coalesce(t2, -1) AS t_step2,
        |  coalesce(t3, -1) AS t_step3
        |FROM a""".stripMargin,

    "q138_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS first FROM a)
        |SELECT first AS cohort_day, day - first AS day_offset,
        |  count(*) AS n_users
        |FROM f GROUP BY 1, 2""".stripMargin,

    // identical to q137's oracle: a time-ordered streaming replay with
    // custom per-user state must land on the batch funnel exactly
    "q140_streaming_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_type,
        |    event_id FROM events),
        |c1 AS (SELECT user_id, tu, event_type, event_id,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS f1
        |  FROM e),
        |c2 AS (SELECT *, CASE WHEN event_type = 'click' AND
        |      coalesce(max(f1) OVER (PARTITION BY user_id
        |        ORDER BY tu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |    THEN 1 ELSE 0 END AS f2 FROM c1),
        |c3 AS (SELECT *, CASE WHEN event_type = 'purchase' AND
        |      coalesce(max(f2) OVER (PARTITION BY user_id
        |        ORDER BY tu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |    THEN 1 ELSE 0 END AS f3 FROM c2),
        |a AS (SELECT user_id,
        |    min(CASE WHEN f1 = 1 THEN tu END) AS t1,
        |    min(CASE WHEN f2 = 1 THEN tu END) AS t2,
        |    min(CASE WHEN f3 = 1 THEN tu END) AS t3
        |  FROM c3 GROUP BY 1)
        |SELECT user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |  coalesce(t1, -1) AS t_step1, coalesce(t2, -1) AS t_step2,
        |  coalesce(t3, -1) AS t_step3
        |FROM a""".stripMargin,

    "q141_event_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next
        |  FROM events)
        |SELECT event_type AS from_type,
        |  coalesce(next, '<end>') AS to_type, count(*) AS n
        |FROM o GROUP BY 1, 2""".stripMargin,

    "q146_layout_manifest" ->
      """SELECT CAST(hv % 8 AS INT) AS shard, count(*) AS n_rows,
        |  min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars
        |FROM (SELECT n_chars,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM documents)
        |GROUP BY 1""".stripMargin,

    // the batch transition matrix (q141) minus its batch-only terminal
    // rows: a stream never knows an event was a user's last
    "q147_streaming_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next
        |  FROM events)
        |SELECT event_type AS from_type, next AS to_type,
        |  count(*) AS n
        |FROM o WHERE next IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "q148_decayed_score" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        |m AS (SELECT user_id, max(t) AS mt FROM e GROUP BY 1)
        |SELECT e.user_id,
        |  round(sum(coalesce(value, 0)
        |    * power(2.0, (t - mt) / 3600000000.0)), 6) + 0.0
        |    AS ewma_score,
        |  count(*) AS n_events, max(t) AS last_t
        |FROM e JOIN m ON e.user_id = m.user_id
        |GROUP BY e.user_id, mt""".stripMargin,

    "q149_corr_matrix" ->
      """SELECT * FROM (
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |  round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS pearson,
        |  count(*) AS n FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', 'l_discount',
        |  round(corr(l_quantity, l_discount), 6) + 0.0, count(*)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', 'l_tax',
        |  round(corr(l_quantity, l_tax), 6) + 0.0, count(*) FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_discount',
        |  round(corr(l_extendedprice, l_discount), 6) + 0.0, count(*)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', 'l_tax',
        |  round(corr(l_extendedprice, l_tax), 6) + 0.0, count(*)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', 'l_tax',
        |  round(corr(l_discount, l_tax), 6) + 0.0, count(*)
        |FROM lineitem)""".stripMargin,

    "q150_cat_association" ->
      """WITH c AS (
        |  SELECT o_orderstatus AS a, o_orderpriority AS b,
        |    count(*)::DOUBLE AS c
        |  FROM orders
        |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, sum(c) AS ra FROM c GROUP BY 1),
        |rb AS (SELECT b, sum(c) AS rb FROM c GROUP BY 1),
        |t AS (SELECT sum(c) AS n, count(DISTINCT a)::DOUBLE AS ka,
        |             count(DISTINCT b)::DOUBLE AS kb FROM c),
        |j AS (SELECT c.c, ra.ra, rb.rb, t.n, t.ka, t.kb
        |      FROM c JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN t),
        |agg AS (
        |  SELECT sum(c / n * ln(c * n / (ra * rb))) AS mi,
        |    sum(pow(c - ra * rb / n, 2) / (ra * rb / n))
        |      + any_value(n) - sum(ra * rb / n) AS chi2,
        |    any_value(n) AS n, any_value(ka) AS ka, any_value(kb) AS kb
        |  FROM j)
        |SELECT round(mi, 6) + 0.0 AS mi, round(chi2, 6) + 0.0 AS chi2,
        |  round(CASE WHEN least(ka, kb) > 1
        |    THEN sqrt(chi2 / (n * (least(ka, kb) - 1))) END, 6) + 0.0
        |    AS cramers_v,
        |  n::BIGINT AS n, ka::BIGINT AS card_a, kb::BIGINT AS card_b
        |FROM agg""".stripMargin,

    "q151_pagerank" ->
      """WITH e0 AS (
        |  SELECT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst,
        |    count(*)::DOUBLE AS w
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS ow FROM e0 GROUP BY 1),
        |e AS (SELECT e0.src, e0.dst, e0.w / ow.ow AS p
        |      FROM e0 JOIN ow USING (src)),
        |nodes AS (SELECT src AS node FROM e
        |          UNION SELECT dst AS node FROM e),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        |dang AS (SELECT node FROM nodes
        |         WHERE node NOT IN (SELECT src FROM e)),
        |r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
        |d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
        |       WHERE node IN (SELECT node FROM dang)),
        |c1 AS (SELECT e.dst AS node, sum(r0.r * e.p) AS inflow
        |       FROM e JOIN r0 ON r0.node = e.src GROUP BY 1),
        |r1 AS (SELECT nodes.node,
        |  0.15 / nn.n + 0.85 * (coalesce(c1.inflow, 0) + d1.dm / nn.n) AS r
        |  FROM nodes CROSS JOIN nn CROSS JOIN d1
        |  LEFT JOIN c1 ON c1.node = nodes.node),
        |d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
        |       WHERE node IN (SELECT node FROM dang)),
        |c2 AS (SELECT e.dst AS node, sum(r1.r * e.p) AS inflow
        |       FROM e JOIN r1 ON r1.node = e.src GROUP BY 1),
        |r2 AS (SELECT nodes.node,
        |  0.15 / nn.n + 0.85 * (coalesce(c2.inflow, 0) + d2.dm / nn.n) AS r
        |  FROM nodes CROSS JOIN nn CROSS JOIN d2
        |  LEFT JOIN c2 ON c2.node = nodes.node),
        |d3 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
        |       WHERE node IN (SELECT node FROM dang)),
        |c3 AS (SELECT e.dst AS node, sum(r2.r * e.p) AS inflow
        |       FROM e JOIN r2 ON r2.node = e.src GROUP BY 1),
        |r3 AS (SELECT nodes.node,
        |  0.15 / nn.n + 0.85 * (coalesce(c3.inflow, 0) + d3.dm / nn.n) AS r
        |  FROM nodes CROSS JOIN nn CROSS JOIN d3
        |  LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT node, round(r * nn.n, 6) + 0.0 AS scaled_rank
        |FROM r3 CROSS JOIN nn""".stripMargin,

    "q152_knn_label_noise" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, label
        |           FROM embeddings),
        |s AS (SELECT a.vec_id AS qid, b.vec_id AS iid,
        |  a.label AS ol, b.label AS nl,
        |  list_dot_product(a.e, b.e) /
        |    (sqrt(list_dot_product(a.e, a.e)) *
        |     sqrt(list_dot_product(b.e, b.e))) AS c
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        |top AS (SELECT qid, iid, ol, nl,
        |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, iid) AS rn
        |  FROM s),
        |nb AS (SELECT qid, ol, nl FROM top WHERE rn <= 10),
        |pl AS (SELECT qid, ol, nl, count(*) AS cnt FROM nb GROUP BY 1, 2, 3),
        |mj AS (SELECT qid, nl AS maj FROM (
        |  SELECT qid, nl,
        |    row_number() OVER (PARTITION BY qid ORDER BY cnt DESC, nl ASC)
        |      AS rn
        |  FROM pl) WHERE rn = 1),
        |ag AS (SELECT qid, any_value(ol) AS label,
        |  count(*) AS n_neighbors,
        |  sum(CASE WHEN nl <> ol THEN 1 ELSE 0 END)::DOUBLE / count(*)
        |    AS df
        |  FROM nb GROUP BY 1)
        |SELECT ag.qid AS vec_id, ag.label, mj.maj AS majority_label,
        |  ag.n_neighbors, round(ag.df, 6) + 0.0 AS disagree_frac,
        |  mj.maj <> ag.label AS suspect
        |FROM ag JOIN mj ON ag.qid = mj.qid""".stripMargin,

    "q153_source_overlap" ->
      """WITH l AS (SELECT source, string_split(text, ' ') AS l
        |  FROM documents WHERE source IS NOT NULL),
        |g AS (SELECT DISTINCT source, array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT source, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i FROM l)),
        |sz AS (SELECT source, count(*) AS n FROM g GROUP BY 1),
        |inter AS (SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_common
        |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2),
        |pairs AS (SELECT a.source AS source_a, a.n AS n_a,
        |    b.source AS source_b, b.n AS n_b
        |  FROM sz a JOIN sz b ON a.source < b.source)
        |SELECT source_a, source_b, n_a::BIGINT AS n_a,
        |  n_b::BIGINT AS n_b,
        |  coalesce(n_common, 0)::BIGINT AS n_common,
        |  round(coalesce(n_common, 0)::DOUBLE /
        |    (n_a + n_b - coalesce(n_common, 0)), 6) + 0.0 AS jaccard
        |FROM pairs LEFT JOIN inter USING (source_a, source_b)"""
        .stripMargin,

    "q160_kmeans" ->
      // cosine k-means replay: init = first 4 by vec_id; assignment
      // score = dot / centroid_norm (item norm is rank-invariant —
      // matching the engine's TopCentroids arithmetic shape exactly),
      // ties to the smaller cluster id; update = per-dim mean; empty
      // clusters keep their previous centroid
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |           FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |         e AS ce
        |       FROM (SELECT * FROM v ORDER BY vec_id LIMIT 4)),
        |a0 AS (SELECT vec_id, cid FROM (
        |  SELECT v.vec_id, c0.cid, row_number() OVER (
        |    PARTITION BY v.vec_id
        |    ORDER BY list_dot_product(v.e, c0.ce) /
        |      sqrt(list_dot_product(c0.ce, c0.ce)) DESC, c0.cid ASC)
        |    AS rn
        |  FROM v CROSS JOIN c0) WHERE rn = 1),
        |m AS (SELECT cid, i, avg(x) AS mx FROM (
        |  SELECT a0.cid, unnest(v.e) AS x,
        |    generate_subscripts(v.e, 1) AS i
        |  FROM a0 JOIN v USING (vec_id)) GROUP BY 1, 2),
        |c1 AS (SELECT cid, list(mx ORDER BY i) AS ce FROM m GROUP BY 1),
        |c1f AS (SELECT c0.cid, coalesce(c1.ce, c0.ce) AS ce
        |        FROM c0 LEFT JOIN c1 USING (cid))
        |SELECT vec_id, cid::BIGINT AS cluster FROM (
        |  SELECT v.vec_id, c1f.cid, row_number() OVER (
        |    PARTITION BY v.vec_id
        |    ORDER BY list_dot_product(v.e, c1f.ce) /
        |      sqrt(list_dot_product(c1f.ce, c1f.ce)) DESC, c1f.cid ASC)
        |    AS rn
        |  FROM v CROSS JOIN c1f) WHERE rn = 1""".stripMargin,

    "q161_interarrival" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |g AS (SELECT user_id,
        |    (t - lag(t) OVER (PARTITION BY user_id ORDER BY t))
        |      / 1e6 AS gap
        |  FROM e)
        |SELECT user_id, count(gap) AS n_gaps,
        |  round(avg(gap), 6) + 0.0 AS mean_gap_s,
        |  round(min(gap), 6) + 0.0 AS min_gap_s,
        |  round(max(gap), 6) + 0.0 AS max_gap_s,
        |  round(stddev_samp(gap), 6) + 0.0 AS std_gap_s,
        |  round(CASE WHEN avg(gap) > 0
        |    THEN stddev_samp(gap) / avg(gap) END, 6) + 0.0 AS cv
        |FROM g GROUP BY 1""".stripMargin,

    "q162_concentration" ->
      """WITH pk AS (SELECT user_id AS key, count(*)::DOUBLE AS x
        |  FROM events GROUP BY 1),
        |r AS (SELECT key, x,
        |    row_number() OVER (ORDER BY x ASC, key ASC) AS i,
        |    count(*) OVER () AS n
        |  FROM pk)
        |SELECT count(*) AS n_keys, sum(x)::BIGINT AS total,
        |  round(2.0 * sum(i * x) / (any_value(n) * sum(x)) -
        |    (any_value(n) + 1.0) / any_value(n), 6) + 0.0 AS gini,
        |  round(coalesce(sum(CASE WHEN i > n - (n // 10) THEN x END),
        |    0) / sum(x), 6) + 0.0 AS top_decile_share
        |FROM r""".stripMargin,

    "q163_zipf" ->
      """WITH toks AS (SELECT unnest(string_split(lower(text), ' '))
        |    AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM toks
        |  WHERE length(tok) > 0 GROUP BY 1
        |  ORDER BY c DESC, tok ASC LIMIT 200),
        |rk AS (SELECT ln(row_number() OVER (ORDER BY c DESC, tok ASC))
        |    AS lx, ln(c) AS ly FROM cnt)
        |SELECT
        |  round(covar_samp(lx, ly) / var_samp(lx), 6) + 0.0 AS slope,
        |  round(avg(ly) - covar_samp(lx, ly) / var_samp(lx) * avg(lx),
        |    6) + 0.0 AS intercept,
        |  round(corr(lx, ly) * corr(lx, ly), 6) + 0.0 AS r2,
        |  count(*) AS n_ranks
        |FROM rk""".stripMargin,

    "q167_cusum" ->
      """WITH cells AS (SELECT event_type,
        |    (epoch_us(ts) // 14400000000) * 14400000000 AS b,
        |    count(*)::DOUBLE AS v
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT event_type, b, v,
        |    avg(v) OVER (PARTITION BY event_type) AS mu,
        |    stddev_samp(v) OVER (PARTITION BY event_type) AS sd
        |  FROM cells),
        |z AS (SELECT event_type, b, v,
        |    CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
        |         ELSE (v - mu) / sd END AS z
        |  FROM st),
        |s AS (SELECT event_type, b, v, z,
        |    sum(z - 0.5) OVER w AS sp, sum(-z - 0.5) OVER w AS sn
        |  FROM z
        |  WINDOW w AS (PARTITION BY event_type ORDER BY b
        |    ROWS UNBOUNDED PRECEDING)),
        |c AS (SELECT event_type, b, v, z,
        |    sp - least(0, min(sp) OVER w) AS cp,
        |    sn - least(0, min(sn) OVER w) AS cn
        |  FROM s
        |  WINDOW w AS (PARTITION BY event_type ORDER BY b
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, b AS bucket_start, v AS value,
        |  round(z, 6) + 0.0 AS z,
        |  round(cp, 6) + 0.0 AS cusum_pos,
        |  round(cn, 6) + 0.0 AS cusum_neg,
        |  (cp > 4.0 OR cn > 4.0) AS alarm
        |FROM c""".stripMargin,

    "q168_corpus_diff" ->
      """WITH o AS (SELECT doc_id, text, source FROM documents),
        |n AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || '!' ELSE text END
        |      AS text, source
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text, source FROM documents
        |  WHERE doc_id < 30),
        |j AS (SELECT o.doc_id AS oid, n.doc_id AS nid,
        |    (o.text IS DISTINCT FROM n.text OR
        |     o.source IS DISTINCT FROM n.source) AS diff
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT
        |  sum(CASE WHEN oid IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_added,
        |  sum(CASE WHEN nid IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_removed,
        |  sum(CASE WHEN oid IS NOT NULL AND nid IS NOT NULL AND diff
        |    THEN 1 ELSE 0 END)::BIGINT AS n_changed,
        |  sum(CASE WHEN oid IS NOT NULL AND nid IS NOT NULL
        |    AND NOT diff THEN 1 ELSE 0 END)::BIGINT AS n_unchanged,
        |  sum(CASE WHEN oid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_old,
        |  sum(CASE WHEN nid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_new
        |FROM j""".stripMargin,

    "q180_personalized_pr" ->
      """WITH e0 AS (
        |  SELECT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst,
        |    count(*)::DOUBLE AS w
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS ow FROM e0 GROUP BY 1),
        |e AS (SELECT e0.src, e0.dst, e0.w / ow.ow AS p
        |      FROM e0 JOIN ow USING (src)),
        |nodes AS (SELECT src AS node FROM e
        |          UNION SELECT dst AS node FROM e),
        |sx AS (SELECT DISTINCT 'c:' || c_custkey AS node
        |       FROM customer WHERE c_nationkey = 0),
        |sg AS (SELECT nodes.node FROM nodes JOIN sx USING (node)),
        |ns AS (SELECT count(*)::DOUBLE AS k FROM sg),
        |t AS (SELECT nodes.node,
        |    CASE WHEN sg.node IS NOT NULL THEN 1.0 / ns.k
        |         ELSE 0.0 END AS tv
        |  FROM nodes CROSS JOIN ns
        |  LEFT JOIN sg ON sg.node = nodes.node),
        |dang AS (SELECT node FROM nodes
        |         WHERE node NOT IN (SELECT src FROM e)),
        |r0 AS (SELECT node, tv AS r FROM t),
        |d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
        |       WHERE node IN (SELECT node FROM dang)),
        |c1 AS (SELECT e.dst AS node, sum(r0.r * e.p) AS inflow
        |       FROM e JOIN r0 ON r0.node = e.src GROUP BY 1),
        |r1 AS (SELECT t.node,
        |  (0.15 + 0.85 * d1.dm) * t.tv +
        |    0.85 * coalesce(c1.inflow, 0) AS r
        |  FROM t CROSS JOIN d1 LEFT JOIN c1 ON c1.node = t.node),
        |d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
        |       WHERE node IN (SELECT node FROM dang)),
        |c2 AS (SELECT e.dst AS node, sum(r1.r * e.p) AS inflow
        |       FROM e JOIN r1 ON r1.node = e.src GROUP BY 1),
        |r2 AS (SELECT t.node,
        |  (0.15 + 0.85 * d2.dm) * t.tv +
        |    0.85 * coalesce(c2.inflow, 0) AS r
        |  FROM t CROSS JOIN d2 LEFT JOIN c2 ON c2.node = t.node),
        |d3 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
        |       WHERE node IN (SELECT node FROM dang)),
        |c3 AS (SELECT e.dst AS node, sum(r2.r * e.p) AS inflow
        |       FROM e JOIN r2 ON r2.node = e.src GROUP BY 1),
        |r3 AS (SELECT t.node,
        |  (0.15 + 0.85 * d3.dm) * t.tv +
        |    0.85 * coalesce(c3.inflow, 0) AS r
        |  FROM t CROSS JOIN d3 LEFT JOIN c3 ON c3.node = t.node)
        |SELECT node, round(r, 6) + 0.0 AS rank FROM r3""".stripMargin,

    "q181_hits" ->
      """WITH e AS (SELECT DISTINCT 'c:' || o_custkey AS src,
        |    's:' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM e
        |          UNION SELECT dst AS node FROM e),
        |h0 AS (SELECT node, 1.0 AS h FROM nodes),
        |a1r AS (SELECT e.dst AS node, sum(h0.h) AS a FROM e
        |        JOIN h0 ON h0.node = e.src GROUP BY 1),
        |a1 AS (SELECT nodes.node,
        |    coalesce(a1r.a, 0) / (SELECT sum(a) FROM a1r) AS a
        |  FROM nodes LEFT JOIN a1r ON a1r.node = nodes.node),
        |h1r AS (SELECT e.src AS node, sum(a1.a) AS h FROM e
        |        JOIN a1 ON a1.node = e.dst GROUP BY 1),
        |h1 AS (SELECT nodes.node,
        |    coalesce(h1r.h, 0) / (SELECT sum(h) FROM h1r) AS h
        |  FROM nodes LEFT JOIN h1r ON h1r.node = nodes.node),
        |a2r AS (SELECT e.dst AS node, sum(h1.h) AS a FROM e
        |        JOIN h1 ON h1.node = e.src GROUP BY 1),
        |a2 AS (SELECT nodes.node,
        |    coalesce(a2r.a, 0) / (SELECT sum(a) FROM a2r) AS a
        |  FROM nodes LEFT JOIN a2r ON a2r.node = nodes.node),
        |h2r AS (SELECT e.src AS node, sum(a2.a) AS h FROM e
        |        JOIN a2 ON a2.node = e.dst GROUP BY 1),
        |h2 AS (SELECT nodes.node,
        |    coalesce(h2r.h, 0) / (SELECT sum(h) FROM h2r) AS h
        |  FROM nodes LEFT JOIN h2r ON h2r.node = nodes.node)
        |SELECT h2.node, round(h2.h, 6) + 0.0 AS hub,
        |  round(a2.a, 6) + 0.0 AS authority
        |FROM h2 JOIN a2 ON a2.node = h2.node""".stripMargin,

    "q182_readability" ->
      """WITH d AS (SELECT doc_id, text,
        |    list_filter(string_split(lower(text), ' '),
        |      t -> len(t) > 0) AS toks
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    len(toks)::BIGINT AS n_words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
        |      AS n_sentences,
        |    coalesce(list_sum(list_transform(toks, t ->
        |      greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1))),
        |      0)::BIGINT AS n_syllables,
        |    len(regexp_extract_all(text, '[A-Za-z0-9]'))::BIGINT AS n_alnum
        |  FROM d)
        |SELECT doc_id, n_words, n_sentences, n_syllables, n_alnum,
        |  CASE WHEN n_words = 0 THEN NULL ELSE
        |    floor((206835 * n_words * n_sentences - 1015 * n_words * n_words
        |      - 84600 * n_syllables * n_sentences)::DOUBLE
        |      / (1000 * n_words * n_sentences)::DOUBLE * 1e6 + 0.5) / 1e6
        |      + 0.0
        |  END AS flesch,
        |  CASE WHEN n_words = 0 THEN NULL ELSE
        |    floor((39 * n_words * n_words + 1180 * n_syllables * n_sentences
        |      - 1559 * n_words * n_sentences)::DOUBLE
        |      / (100 * n_words * n_sentences)::DOUBLE * 1e6 + 0.5) / 1e6
        |      + 0.0
        |  END AS fk_grade,
        |  CASE WHEN n_words = 0 THEN NULL ELSE
        |    floor((471 * n_alnum * n_sentences + 50 * n_words * n_words
        |      - 2143 * n_words * n_sentences)::DOUBLE
        |      / (100 * n_words * n_sentences)::DOUBLE * 1e6 + 0.5) / 1e6
        |      + 0.0
        |  END AS ari
        |FROM r""".stripMargin,

    "q183_pmi_collocations" ->
      """WITH d AS (SELECT list_filter(string_split(lower(text), ' '),
        |      t -> len(t) > 0) AS t FROM documents),
        |uni AS (SELECT w, count(*)::BIGINT AS c1
        |  FROM (SELECT unnest(t) AS w FROM d) GROUP BY 1),
        |bi AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM
        |    (SELECT t[i] AS w1, t[i + 1] AS w2
        |     FROM (SELECT t, unnest(range(1, greatest(len(t), 1))) AS i
        |           FROM d))
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |tot AS (SELECT sum(c1)::DOUBLE AS nu FROM uni),
        |nb AS (SELECT sum(c12)::DOUBLE AS nbi FROM bi)
        |SELECT w1, w2, c12 AS cnt,
        |  round(ln((c12 / nbi) / ((u1.c1 / nu) * (u2.c1 / nu))), 6) + 0.0
        |    AS pmi
        |FROM bi JOIN uni u1 ON bi.w1 = u1.w
        |  JOIN uni u2 ON bi.w2 = u2.w, tot, nb
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    "q184_bpe_pairs" ->
      """WITH wf AS (SELECT t AS word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
        |        FROM documents)
        |  WHERE regexp_matches(t, '^[a-z]+$') GROUP BY 1)
        |SELECT substr(word, i, 1) AS left, substr(word, i + 1, 1) AS right,
        |  sum(freq)::BIGINT AS cnt
        |FROM (SELECT word, freq,
        |      unnest(range(1, greatest(len(word), 1))) AS i FROM wf)
        |GROUP BY 1, 2""".stripMargin,

    "q185_bpe_merges" ->
      ops.Tokenizer.bpeTrainOracleSql("documents", "text", merges = 6),

    "q188_bpe_encode" ->
      ops.Tokenizer.bpeEncodeOracleSql("documents", "doc_id", "text",
        merges = 6),

    "q189_minhash_stored" ->
      """SELECT doc_id, doc_id + 100000 AS dup_id, 1.0 AS est_jaccard
        |FROM documents WHERE doc_id < 50 AND text IS NOT NULL""".stripMargin,

    "q190_source_psi_matrix" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE n_chars <= 150) AS r0,
        |    count(*) FILTER (WHERE n_chars <= 250) AS r1,
        |    count(*) FILTER (WHERE n_chars <= 350) AS r2,
        |    count(*) FILTER (WHERE n_chars <= 450) AS r3
        |  FROM documents GROUP BY 1),
        |p AS (SELECT source, n,
        |    greatest(r0 / n::DOUBLE, 1e-6) AS p0,
        |    greatest(r1 / n::DOUBLE - r0 / n::DOUBLE, 1e-6) AS p1,
        |    greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS p2,
        |    greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS p3,
        |    greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS p4,
        |    r0 / n::DOUBLE AS f0, r1 / n::DOUBLE AS f1,
        |    r2 / n::DOUBLE AS f2, r3 / n::DOUBLE AS f3
        |  FROM c)
        |SELECT a.source AS group_a, b.source AS group_b,
        |  a.n AS n_a, b.n AS n_b,
        |  round((a.p0 - b.p0) * ln(a.p0 / b.p0)
        |      + (a.p1 - b.p1) * ln(a.p1 / b.p1)
        |      + (a.p2 - b.p2) * ln(a.p2 / b.p2)
        |      + (a.p3 - b.p3) * ln(a.p3 / b.p3)
        |      + (a.p4 - b.p4) * ln(a.p4 / b.p4), 6) + 0.0 AS psi,
        |  round((a.p0 * ln(a.p0 / ((a.p0 + b.p0) / 2))
        |       + b.p0 * ln(b.p0 / ((a.p0 + b.p0) / 2))) * 0.5
        |      + (a.p1 * ln(a.p1 / ((a.p1 + b.p1) / 2))
        |       + b.p1 * ln(b.p1 / ((a.p1 + b.p1) / 2))) * 0.5
        |      + (a.p2 * ln(a.p2 / ((a.p2 + b.p2) / 2))
        |       + b.p2 * ln(b.p2 / ((a.p2 + b.p2) / 2))) * 0.5
        |      + (a.p3 * ln(a.p3 / ((a.p3 + b.p3) / 2))
        |       + b.p3 * ln(b.p3 / ((a.p3 + b.p3) / 2))) * 0.5
        |      + (a.p4 * ln(a.p4 / ((a.p4 + b.p4) / 2))
        |       + b.p4 * ln(b.p4 / ((a.p4 + b.p4) / 2))) * 0.5, 6) + 0.0
        |    AS jsd,
        |  round(greatest(abs(a.f0 - b.f0), abs(a.f1 - b.f1),
        |    abs(a.f2 - b.f2), abs(a.f3 - b.f3)), 6) + 0.0 AS ks
        |FROM p a JOIN p b ON a.source < b.source""".stripMargin,

    "q194_image_hash_stored" ->
      """SELECT doc_id, doc_id + 100000 AS dup_id, 0::BIGINT AS hamming
        |FROM documents WHERE doc_id < 40""".stripMargin,

    "q220_phash_stored" ->
      """SELECT doc_id, doc_id + 100000 AS dup_id, 0::BIGINT AS hamming
        |FROM documents WHERE doc_id < 40""".stripMargin,

    "q225_brier" ->
      """WITH s AS (SELECT (vec_id % 97)::DOUBLE / 96.0 AS sc,
        |    CASE WHEN label >= 5 THEN 1.0 ELSE 0.0 END AS y
        |  FROM embeddings)
        |SELECT count(*)::BIGINT AS n,
        |  round(avg((sc - y) * (sc - y)), 6) + 0.0 AS brier,
        |  round(avg(y), 6) + 0.0 AS base_rate
        |FROM s""".stripMargin,

    "q226_lift_table" ->
      """WITH s AS (SELECT (vec_id % 97)::DOUBLE / 96.0 AS sc,
        |    label >= 5 AS y FROM embeddings),
        |c AS (SELECT sc, count(*)::BIGINT AS t,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p
        |  FROM s GROUP BY 1),
        |r AS (SELECT sc, t, p,
        |    sum(t) OVER (ORDER BY sc DESC) AS cum,
        |    sum(t) OVER () AS n FROM c),
        |b AS (SELECT least(10, CAST(floor((cum * 10 + n - 1)
        |      / n::DOUBLE) AS BIGINT)) AS bin, t, p FROM r),
        |g AS (SELECT bin, sum(t)::BIGINT AS n,
        |    sum(p)::BIGINT AS n_pos FROM b GROUP BY 1),
        |f AS (SELECT bin, n, n_pos,
        |    sum(n_pos) OVER (ORDER BY bin) AS cp,
        |    sum(n_pos) OVER () AS tp,
        |    sum(n) OVER () AS tn FROM g)
        |SELECT bin, n, n_pos,
        |  round(n_pos::DOUBLE / n, 6) + 0.0 AS pos_rate,
        |  round(cp::DOUBLE / tp, 6) + 0.0 AS cum_capture,
        |  round((n_pos::DOUBLE / n) / (tp::DOUBLE / tn), 6) + 0.0
        |    AS lift
        |FROM f""".stripMargin,

    "q227_average_precision" ->
      """WITH s AS (SELECT (vec_id % 97)::DOUBLE / 96.0 AS sc,
        |    label >= 5 AS y FROM embeddings),
        |c AS (SELECT sc, count(*)::BIGINT AS t,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p
        |  FROM s GROUP BY 1),
        |r AS (SELECT sc, t, p,
        |    sum(t) OVER (ORDER BY sc DESC) AS ct,
        |    sum(p) OVER (ORDER BY sc DESC) AS cp FROM c)
        |SELECT sum(p)::BIGINT AS n_pos,
        |  (sum(t) - sum(p))::BIGINT AS n_neg,
        |  round(sum(p * (cp::DOUBLE / ct)) / sum(p), 6) + 0.0 AS ap
        |FROM r""".stripMargin,

    "q228_threshold_report" ->
      """WITH s AS (SELECT (vec_id % 97)::DOUBLE / 96.0 AS sc,
        |    label >= 5 AS y FROM embeddings),
        |th AS (SELECT unnest([0.2, 0.35, 0.5, 0.65, 0.8]) AS threshold),
        |c AS (SELECT threshold,
        |    count(*) FILTER (WHERE sc >= threshold AND y)::BIGINT AS tp,
        |    count(*) FILTER (WHERE sc >= threshold AND NOT y)::BIGINT AS fp,
        |    count(*) FILTER (WHERE sc < threshold AND y)::BIGINT AS fn,
        |    count(*) FILTER (WHERE sc < threshold AND NOT y)::BIGINT AS tn
        |  FROM s, th GROUP BY 1),
        |d AS (SELECT *, (tp + fp + fn + tn)::DOUBLE AS n,
        |    CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) END AS prec,
        |    CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn) END AS rec,
        |    ((tp + fp)::DOUBLE * (tp + fn) + (fn + tn)::DOUBLE * (fp + tn))
        |      / ((tp + fp + fn + tn)::DOUBLE * (tp + fp + fn + tn)) AS pe
        |  FROM c)
        |SELECT round(threshold, 6) + 0.0 AS threshold, tp, fp, fn, tn,
        |  round((tp + tn) / n, 6) + 0.0 AS accuracy,
        |  round(prec, 6) + 0.0 AS precision,
        |  round(rec, 6) + 0.0 AS recall,
        |  round(CASE WHEN prec IS NOT NULL AND rec IS NOT NULL
        |      AND prec + rec > 0
        |    THEN 2.0 * prec * rec / (prec + rec) END, 6) + 0.0 AS f1,
        |  round(CASE WHEN sqrt((tp + fp)::DOUBLE * (tp + fn)
        |        * (tn + fp) * (tn + fn)) > 0
        |    THEN (tp::DOUBLE * tn - fp::DOUBLE * fn)
        |      / sqrt((tp + fp)::DOUBLE * (tp + fn) * (tn + fp)
        |        * (tn + fn)) END, 6) + 0.0 AS mcc,
        |  round(CASE WHEN pe < 1.0
        |    THEN ((tp + tn) / n - pe) / (1.0 - pe) END, 6) + 0.0 AS kappa
        |FROM d""".stripMargin,

    "q229_ranking_metrics" ->
      """WITH runs AS (SELECT vec_id % 25 AS query, vec_id AS item,
        |    ((vec_id * 37) % 101)::DOUBLE / 100.0 AS score,
        |    greatest(0, label - 6)::DOUBLE AS rel FROM embeddings),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY query
        |      ORDER BY score DESC, item ASC) AS rnk,
        |    row_number() OVER (PARTITION BY query
        |      ORDER BY rel DESC, item ASC) AS irnk FROM runs),
        |g AS (SELECT query, count(*)::BIGINT AS n_items,
        |    count(*) FILTER (WHERE rel > 0)::BIGINT AS n_rel,
        |    sum(CASE WHEN rnk <= 10
        |      THEN rel / log2(rnk + 1.0) ELSE 0.0 END) AS dcg,
        |    sum(CASE WHEN irnk <= 10
        |      THEN rel / log2(irnk + 1.0) ELSE 0.0 END) AS idcg,
        |    min(CASE WHEN rel > 0 THEN rnk END) AS first_rel,
        |    count(*) FILTER (WHERE rel > 0 AND rnk <= 10)::BIGINT
        |      AS hits
        |  FROM r GROUP BY 1)
        |SELECT query, n_items, n_rel,
        |  round(dcg, 6) + 0.0 AS dcg,
        |  round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) + 0.0
        |    AS ndcg,
        |  round(coalesce(1.0 / first_rel, 0.0), 6) + 0.0 AS rr,
        |  round(hits / 10.0, 6) + 0.0 AS precision_at_k,
        |  round(CASE WHEN n_rel > 0 THEN hits::DOUBLE / n_rel END, 6)
        |    + 0.0 AS recall_at_k
        |FROM g""".stripMargin,

    "q230_event_acf" ->
      """WITH b AS (SELECT (epoch_us(ts) // 3600000000)::BIGINT AS t,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |r AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
        |idx AS (SELECT unnest(generate_series(lo, hi)) AS t FROM r),
        |d AS (SELECT idx.t, coalesce(b.n, 0)::DOUBLE AS v
        |  FROM idx LEFT JOIN b ON b.t = idx.t),
        |s AS (SELECT avg(v) AS mu FROM d),
        |den AS (SELECT sum((v - mu) * (v - mu)) AS den FROM d, s),
        |lags AS (SELECT unnest(generate_series(1, 30)) AS lag),
        |p AS (SELECT l.lag, count(*)::BIGINT AS n_pairs,
        |    sum((a.v - s.mu) * (b.v - s.mu)) AS num
        |  FROM lags l JOIN d a ON true
        |    JOIN d b ON b.t = a.t + l.lag, s
        |  GROUP BY 1)
        |SELECT l.lag::INT AS lag,
        |  coalesce(p.n_pairs, 0)::BIGINT AS n_pairs,
        |  round(CASE WHEN den.den > 0 THEN p.num / den.den END, 6) + 0.0
        |    AS acf
        |FROM lags l LEFT JOIN p ON p.lag = l.lag, den""".stripMargin,

    // quantile_disc needs CONSTANT parameters, so one arm per q —
    // DuckDB's own quantile implementation stays the independent oracle
    "q231_exact_quantiles" ->
      Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).map { q =>
        s"""SELECT $q + 0.0 AS q,
           |  (SELECT count(l_extendedprice) FROM lineitem)::BIGINT AS n,
           |  round((SELECT quantile_disc(l_extendedprice, $q)
           |    FROM lineitem), 6) + 0.0 AS value""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "q250_trend_slope" ->
      """WITH b AS (SELECT (epoch_us(ts) // 3600000000)::BIGINT AS t,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |r AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
        |idx AS (SELECT unnest(generate_series(lo, hi)) AS t FROM r),
        |d0 AS (SELECT idx.t::DOUBLE AS t0, coalesce(b.n, 0)::DOUBLE
        |    AS v FROM idx LEFT JOIN b ON b.t = idx.t),
        |m AS (SELECT min(t0) AS tmin FROM d0),
        |d AS (SELECT t0 - m.tmin AS t, v FROM d0, m),
        |p AS (SELECT (b2.v - a.v) / (b2.t - a.t) AS slope
        |  FROM d a JOIN d b2 ON a.t < b2.t),
        |o AS (SELECT count(*) AS n, sum(t) AS st, sum(v) AS sv,
        |    sum(t * v) AS stv, sum(t * t) AS st2 FROM d)
        |SELECT o.n::BIGINT AS n,
        |  (SELECT count(*) FROM p)::BIGINT AS n_pairs,
        |  round((SELECT quantile_disc(slope, 0.5) FROM p), 6) + 0.0
        |    AS theil_sen,
        |  round(CASE WHEN o.n * o.st2 - o.st * o.st > 0
        |    THEN (o.n * o.stv - o.st * o.sv)
        |      / (o.n * o.st2 - o.st * o.st) END, 6) + 0.0 AS ols
        |FROM o""".stripMargin,

    "q252_png_decode" ->
      // identical to the q56 oracle: PNG is lossless, so the analytic
      // pixel formula survives the container round-trip bit-exactly
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d),
        |xy AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px)
        |SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
        |  3 AS channels,
        |  round(avg((doc_id + 7 * x + 13 * y) % 256), 6) AS mean_r,
        |  round(avg((doc_id * 3 + 5 * x + 11 * y) % 256), 6) AS mean_g,
        |  round(avg((doc_id * 7 + 3 * x + 17 * y) % 256), 6) AS mean_b
        |FROM xy GROUP BY doc_id""".stripMargin,

    "q253_png_image_hash" ->
      // identical to the q131 oracle: every aHash/dHash bit rebuilt
      // from the pixel formula — ImageIO's PNG decode must agree
      // bit-exactly
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |ag AS (SELECT doc_id, p,
        |    ((doc_id + 7 * sx + 13 * sy) % 256)
        |      + ((doc_id * 3 + 5 * sx + 11 * sy) % 256)
        |      + ((doc_id * 7 + 3 * sx + 17 * sy) % 256) AS g3
        |  FROM (SELECT doc_id, p, ((p % 8) * w) // 8 AS sx,
        |      ((p // 8) * h) // 8 AS sy
        |    FROM (SELECT doc_id, w, h, unnest(range(64)) AS p FROM d))),
        |asum AS (SELECT doc_id, sum(g3) AS s3 FROM ag GROUP BY 1),
        |abits AS (SELECT ag.doc_id AS doc_id, p,
        |    CASE WHEN 64 * g3 > s3 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM ag JOIN asum ON ag.doc_id = asum.doc_id),
        |ah AS (SELECT doc_id,
        |    sum(CASE WHEN p >= 32 THEN bit << (p - 32) ELSE 0 END)::BIGINT
        |      AS ahash_hi,
        |    sum(CASE WHEN p < 32 THEN bit << p ELSE 0 END)::BIGINT
        |      AS ahash_lo
        |  FROM abits GROUP BY 1),
        |dg AS (SELECT doc_id, x, y,
        |    ((doc_id + 7 * sx + 13 * sy) % 256)
        |      + ((doc_id * 3 + 5 * sx + 11 * sy) % 256)
        |      + ((doc_id * 7 + 3 * sx + 17 * sy) % 256) AS g3
        |  FROM (SELECT doc_id, p % 9 AS x, p // 9 AS y,
        |      ((p % 9) * w) // 9 AS sx, ((p // 9) * h) // 8 AS sy
        |    FROM (SELECT doc_id, w, h, unnest(range(72)) AS p FROM d))),
        |dbits AS (SELECT l.doc_id AS doc_id, l.y * 8 + l.x AS p,
        |    CASE WHEN r.g3 > l.g3 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM dg l JOIN dg r ON l.doc_id = r.doc_id AND l.y = r.y
        |    AND r.x = l.x + 1
        |  WHERE l.x < 8),
        |dh AS (SELECT doc_id,
        |    sum(CASE WHEN p >= 32 THEN bit << (p - 32) ELSE 0 END)::BIGINT
        |      AS dhash_hi,
        |    sum(CASE WHEN p < 32 THEN bit << p ELSE 0 END)::BIGINT
        |      AS dhash_lo
        |  FROM dbits GROUP BY 1)
        |SELECT ah.doc_id AS doc_id, ahash_hi, ahash_lo, dhash_hi, dhash_lo
        |FROM ah JOIN dh ON ah.doc_id = dh.doc_id""".stripMargin,

    "q254_aiff_stats" ->
      // identical to the q57 oracle: PCM16 samples survive the AIFF
      // container bit-exactly
      """WITH d AS (SELECT doc_id, 800 + doc_id % 100 AS n
        |  FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |v AS (SELECT doc_id, n,
        |  ((doc_id * 31 + i * 17) % 2003) - 1001 AS smp FROM s)
        |SELECT doc_id, 1 AS channels, 8000 AS sample_rate,
        |  any_value(n) AS n_frames, any_value(n) * 125 AS duration_us,
        |  round(sqrt(avg(smp * smp)), 6) AS rms
        |FROM v GROUP BY doc_id""".stripMargin,

    "q262_lenient_decode" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100 AND doc_id % 9 <> 0),
        |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d),
        |xy AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px)
        |SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
        |  round(avg((doc_id + 7 * x + 13 * y) % 256), 6) AS mean_r,
        |  round(avg((doc_id * 3 + 5 * x + 11 * y) % 256), 6) AS mean_g,
        |  round(avg((doc_id * 7 + 3 * x + 17 * y) % 256), 6) AS mean_b
        |FROM xy GROUP BY doc_id""".stripMargin,

    "q261_simhash_neardups" ->
      """SELECT count(*)::BIGINT AS n_recovered
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "q263_mih_neardups" ->
      """SELECT count(*)::BIGINT AS n_recovered
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "q267_audio_shifted" ->
      """SELECT count(*)::BIGINT AS n_recovered
        |FROM documents WHERE doc_id < 20""".stripMargin,

    "q268_video_fuzzy" ->
      """SELECT count(*)::BIGINT AS n_recovered
        |FROM documents WHERE doc_id < 20""".stripMargin,

    "q273_profile_state" ->
      """SELECT count(*)::BIGINT AS cnt, 0::BIGINT AS null_cnt,
        |  round(min(l_quantity), 6) + 0.0 AS q_min,
        |  round(max(l_quantity), 6) + 0.0 AS q_max,
        |  round(sum(l_quantity), 4) + 0.0 AS q_sum
        |FROM lineitem""".stripMargin,

    "q274_wide_merge" ->
      """SELECT count(*)::BIGINT AS cnt0,
        |  round(sum(l_quantity), 4) + 0.0 AS sum0,
        |  round(min(l_extendedprice) + 1, 6) + 0.0 AS min1,
        |  round(max(l_discount) + 2, 6) + 0.0 AS max2,
        |  (min(l_orderkey) + 3)::BIGINT AS lmin3,
        |  0::BIGINT AS nulls63
        |FROM lineitem""".stripMargin,

    // store lifecycle is pure plumbing around one profile monoid —
    // the merged counters are plain SQL per group
    "q275_store_lifecycle" ->
      """SELECT event_type, count(*)::BIGINT AS cnt,
        |  round(min(value), 6) + 0.0 AS v_min,
        |  round(max(value), 6) + 0.0 AS v_max,
        |  round(sum(value), 4) + 0.0 AS v_sum
        |FROM events GROUP BY 1""".stripMargin,

    "q272_dedup_yield" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
        |SELECT n_docs, 125::BIGINT AS n_in_pairs,
        |  50::BIGINT AS n_clusters, 3::BIGINT AS max_cluster_size,
        |  75::BIGINT AS n_dropped,
        |  round(75.0 / n_docs, 6) + 0.0 AS drop_frac,
        |  (n_docs - 75)::BIGINT AS n_survivors
        |FROM n""".stripMargin,

    "q271_compression" ->
      """SELECT
        |  (SELECT count(*) + 50 FROM documents)::BIGINT AS n_docs,
        |  (SELECT count(*) FROM documents WHERE doc_id < 50)::BIGINT
        |    AS n_flagged_planted""".stripMargin,

    "q270_audio_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'aiff'
        |    ELSE 'au' END AS format,
        |  1::INT AS channels,
        |  8000::INT AS sample_rate,
        |  16::INT AS bits_per_sample,
        |  (200 + (doc_id % 50) * 4)::BIGINT AS n_frames,
        |  ((200 + (doc_id % 50) * 4) * 125)::BIGINT AS duration_us
        |FROM documents WHERE doc_id < 100""".stripMargin,

    "q269_image_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
        |    ELSE 'jpeg' END AS format,
        |  (4 + doc_id % 8)::INT AS width,
        |  (3 + doc_id % 5)::INT AS height,
        |  8::INT AS bit_depth
        |FROM documents WHERE doc_id < 100""".stripMargin,

    "q266_simhash_stored" ->
      """SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id < 25)::BIGINT
        |    AS n_exact,
        |  (SELECT count(*) FROM documents
        |   WHERE doc_id >= 25 AND doc_id < 50)::BIGINT AS n_edit""".stripMargin,

    "q265_streaming_media" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT doc_id, w, h, p % w AS x, p // w AS y
        |  FROM (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d)),
        |g AS (SELECT doc_id,
        |    ((doc_id + 7 * x + 13 * y) % 256)
        |      + ((doc_id * 3 + 5 * x + 11 * y) % 256)
        |      + ((doc_id * 7 + 3 * x + 17 * y) % 256) AS g3
        |  FROM px),
        |a AS (SELECT doc_id, min(g3) AS gmin, max(g3) AS gmax
        |  FROM g GROUP BY 1),
        |pd AS (SELECT CASE WHEN doc_id < 50 THEN '2024-03-01'
        |    ELSE '2024-03-02' END AS day, gmin, gmax,
        |    (gmax - gmin < 100) AS lc FROM a)
        |SELECT day,
        |  count(*)::BIGINT
        |    + (CASE WHEN day = '2024-03-01' THEN 2 ELSE 0 END) AS n,
        |  (CASE WHEN day = '2024-03-01' THEN 2 ELSE 0 END)::BIGINT
        |    AS n_corrupt,
        |  sum(CASE WHEN lc THEN 1 ELSE 0 END)::BIGINT AS n_low_contrast,
        |  min(gmin)::INT AS gray_min, max(gmax)::INT AS gray_max
        |FROM pd GROUP BY day""".stripMargin,

    "q264_nested_profile" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |sz AS (
        |  SELECT len(string_split(text, ' ')) AS n_words FROM documents)
        |SELECT
        |  (SELECT count(n_chars) FROM documents)::BIGINT AS len_n,
        |  (SELECT min(n_chars) FROM documents)::BIGINT AS len_min,
        |  (SELECT max(n_chars) FROM documents)::BIGINT AS len_max,
        |  (SELECT round(avg(n_chars), 6) FROM documents) AS len_mean,
        |  (SELECT count(lang) FROM documents)::BIGINT AS lg_n,
        |  (SELECT min(length(lang)) FROM documents)::BIGINT AS lg_len_min,
        |  (SELECT count(*) FROM w)::BIGINT AS w_n,
        |  (SELECT sum(length(word)) FROM w)::BIGINT AS w_len_sum,
        |  (SELECT round(avg(length(word)), 6) FROM w) AS w_len_mean,
        |  (SELECT min(n_words) FROM sz)::BIGINT AS wsz_min,
        |  (SELECT max(n_words) FROM sz)::BIGINT AS wsz_max,
        |  (SELECT round(avg(n_words), 6) FROM sz) AS wsz_mean,
        |  (SELECT count(n_chars) FROM documents)::BIGINT AS sv_n,
        |  (SELECT sum(n_chars) FROM documents)::BIGINT AS sv_sum,
        |  (SELECT count(source) FROM documents)::BIGINT AS sk_n,
        |  1::BIGINT AS msz_max""".stripMargin,

    "q260_video_diversity" ->
      """WITH d AS (SELECT doc_id, (2 + doc_id % 3)::INT AS n
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, n::BIGINT AS n_sampled,
        |  (CASE WHEN doc_id % 6 = 0 THEN 1 ELSE n END)::BIGINT
        |    AS n_distinct,
        |  round(CASE WHEN doc_id % 6 = 0 THEN 1.0 / n ELSE 1.0 END, 6)
        |    AS diversity,
        |  (doc_id % 6 = 0) AS static
        |FROM d""".stripMargin,

    "q259_audio_quality" ->
      """WITH d AS (SELECT doc_id, (800 + doc_id % 100)::INT AS n
        |  FROM documents WHERE doc_id < 100),
        |s AS (SELECT doc_id, n, i,
        |    ((doc_id * 31 + i * 17) % 2003) - 1001 AS base
        |  FROM (SELECT doc_id, n, unnest(range(n)) AS i FROM d)),
        |v AS (SELECT doc_id, n, i,
        |    CASE WHEN doc_id % 7 = 0
        |        THEN least(greatest(base * 40, -32768), 32767)
        |      WHEN doc_id % 5 = 0 THEN base % 50
        |      ELSE base END AS v
        |  FROM s),
        |x AS (SELECT doc_id, n, i, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM v)
        |SELECT doc_id, 1 AS channels, 8000 AS sample_rate,
        |  max(n)::BIGINT AS n_samples,
        |  round(sqrt(avg((v * v)::DOUBLE)), 6) AS rms,
        |  max(abs(v))::INT AS peak,
        |  round(sum(CASE WHEN abs(v) >= 32000 THEN 1 ELSE 0 END)::DOUBLE
        |    / max(n), 6) AS clip_frac,
        |  round(sum(CASE WHEN abs(v) < 100 THEN 1 ELSE 0 END)::DOUBLE
        |    / max(n), 6) AS silence_frac,
        |  coalesce(sum(CASE WHEN pv IS NOT NULL
        |    AND ((pv >= 0) != (v >= 0)) THEN 1 END), 0)::BIGINT
        |    AS zero_crossings,
        |  (sum(CASE WHEN abs(v) >= 32000 THEN 1 ELSE 0 END) * 100
        |    > max(n)) AS clipped,
        |  (sum((v * v)::BIGINT) < max(n)::BIGINT * 2500) AS near_silent
        |FROM x GROUP BY doc_id""".stripMargin,

    "q258_source_separation" ->
      """WITH r AS (SELECT vec_id, label AS key, embedding::DOUBLE[] AS e
        |  FROM embeddings
        |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
        |u AS (SELECT vec_id, key, unnest(e) AS x,
        |    unnest(range(len(e))) AS i FROM r),
        |cent AS (SELECT key, i, avg(x) AS m FROM u GROUP BY 1, 2),
        |nn AS (SELECT key, count(*) AS n FROM r GROUP BY 1),
        |cn AS (SELECT key, sqrt(sum(m * m)) AS cnorm FROM cent
        |  GROUP BY 1),
        |mem AS (SELECT u.vec_id, u.key, sum(u.x * c.m) AS dot,
        |    sqrt(sum(u.x * u.x)) AS enorm
        |  FROM u JOIN cent c ON u.key = c.key AND u.i = c.i
        |  GROUP BY 1, 2),
        |ic AS (SELECT mem.key,
        |    avg(CASE WHEN enorm > 0 AND cnorm > 0
        |      THEN dot / (enorm * cnorm) ELSE 0 END) AS intra
        |  FROM mem JOIN cn ON mem.key = cn.key GROUP BY 1),
        |cr AS (SELECT a.key AS ka, b.key AS kb, sum(a.m * b.m) AS dab
        |  FROM cent a JOIN cent b ON a.i = b.i AND a.key <> b.key
        |  GROUP BY 1, 2),
        |cc AS (SELECT ka, kb,
        |    CASE WHEN x.cnorm > 0 AND y.cnorm > 0
        |      THEN dab / (x.cnorm * y.cnorm) ELSE 0 END AS c
        |  FROM cr JOIN cn x ON ka = x.key JOIN cn y ON kb = y.key),
        |best AS (SELECT ka, kb, c, row_number() OVER
        |    (PARTITION BY ka ORDER BY c DESC, kb DESC) AS rn FROM cc)
        |SELECT nn.key AS label, nn.n,
        |  round(cn.cnorm, 6) + 0.0 AS centroid_norm,
        |  round(ic.intra, 6) + 0.0 AS intra_cos,
        |  best.kb AS nearest_label,
        |  round(best.c, 6) + 0.0 AS nearest_cos,
        |  round(ic.intra - best.c, 6) + 0.0 AS separation
        |FROM nn JOIN cn ON nn.key = cn.key JOIN ic ON nn.key = ic.key
        |LEFT JOIN best ON nn.key = best.ka AND best.rn = 1""".stripMargin,

    "q257_leakage_safe_split" ->
      """WITH rep AS (SELECT doc_id,
        |    CASE WHEN doc_id < 50 THEN doc_id
        |      WHEN doc_id >= 100 AND doc_id < 150 THEN doc_id - 100
        |      WHEN doc_id >= 200 AND doc_id < 225 THEN doc_id - 200
        |      ELSE doc_id END AS r
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN CAST(('0x' ||
        |      substring(md5(CAST(r AS VARCHAR)), 1, 13)) AS BIGINT)
        |      < 450359962737049 THEN 'test'
        |    WHEN CAST(('0x' ||
        |      substring(md5(CAST(r AS VARCHAR)), 1, 13)) AS BIGINT)
        |      < 4053239664633446 THEN 'train'
        |    ELSE 'val' END AS split
        |FROM rep""".stripMargin,

    "q256_image_resize" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT doc_id, w, h, unnest(range(32)) AS p FROM d),
        |xy AS (SELECT doc_id, w, h, p % 8 AS x, p // 8 AS y FROM px),
        |src AS (SELECT doc_id,
        |    (x * w) // 8 AS sx, (y * h) // 4 AS sy FROM xy)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'png' END AS format,
        |  8 AS width, 4 AS height,
        |  round(avg((doc_id + 7 * sx + 13 * sy) % 256), 6) AS mean_r,
        |  round(avg((doc_id * 3 + 5 * sx + 11 * sy) % 256), 6) AS mean_g,
        |  round(avg((doc_id * 7 + 3 * sx + 17 * sy) % 256), 6) AS mean_b
        |FROM src GROUP BY 1, 2""".stripMargin,

    "q255_image_quality" ->
      """WITH d AS (SELECT doc_id, (4 + doc_id % 8)::INT AS w,
        |    (3 + doc_id % 5)::INT AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT doc_id, w, h, p % w AS x, p // w AS y
        |  FROM (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d)),
        |g AS (SELECT doc_id, w, h,
        |    ((doc_id + 7 * x + 13 * y) % 256)
        |      + ((doc_id * 3 + 5 * x + 11 * y) % 256)
        |      + ((doc_id * 7 + 3 * x + 17 * y) % 256) AS g3
        |  FROM px),
        |a AS (SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
        |    min(g3)::INT AS gray_min, max(g3)::INT AS gray_max,
        |    count(*)::BIGINT AS n, sum(g3)::BIGINT AS s,
        |    sum(g3 * g3)::BIGINT AS s2,
        |    sum(CASE WHEN g3 < 77 THEN 1 ELSE 0 END)::BIGINT AS nd,
        |    sum(CASE WHEN g3 > 688 THEN 1 ELSE 0 END)::BIGINT AS nb
        |  FROM g GROUP BY doc_id),
        |hb AS (SELECT doc_id, g3 * 16 // 766 AS b, count(*)::BIGINT AS c
        |  FROM g GROUP BY 1, 2),
        |he AS (SELECT doc_id, sum(c * ln(c::DOUBLE)) AS clogc
        |  FROM hb GROUP BY 1)
        |SELECT a.doc_id AS doc_id, width, height, gray_min, gray_max,
        |  round(s::DOUBLE / n, 6) + 0.0 AS gray_mean,
        |  round(sqrt((n * s2 - s * s)::DOUBLE) / n, 6) + 0.0 AS gray_std,
        |  round(nd::DOUBLE / n, 6) + 0.0 AS frac_dark,
        |  round(nb::DOUBLE / n, 6) + 0.0 AS frac_bright,
        |  round(ln(n::DOUBLE) - clogc / n, 6) + 0.0 AS entropy,
        |  (gray_max - gray_min < 100) AS low_contrast
        |FROM a JOIN he ON a.doc_id = he.doc_id""".stripMargin,

    "q251_categorical_profile" ->
      """WITH c AS (SELECT event_type AS v, count(*)::BIGINT AS c
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(c)::BIGINT AS n FROM c),
        |p AS (SELECT c.c, t.n, c.c::DOUBLE / t.n AS p FROM c, t)
        |SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS cardinality,
        |  round(-sum(p * ln(p)), 6) + 0.0 AS entropy,
        |  round(CASE WHEN count(*) > 1
        |    THEN -sum(p * ln(p)) / ln(count(*)::DOUBLE)
        |    ELSE 0.0 END, 6) + 0.0 AS normalized_entropy,
        |  round(1.0 - sum(p * p), 6) + 0.0 AS gini_impurity,
        |  round(max(c)::DOUBLE / max(n), 6) + 0.0 AS top_share
        |FROM p""".stripMargin,

    "q249_change_point" ->
      """WITH base AS (SELECT l_orderkey % 1000 AS t,
        |    avg(l_quantity) AS b FROM lineitem GROUP BY 1),
        |s AS (SELECT t, b + CASE WHEN t >= 500 THEN 25.0 ELSE 0 END
        |    AS v FROM base),
        |c AS (SELECT t, count(*) OVER w AS k, sum(v) OVER w AS cv,
        |    sum(v * v) OVER w AS cv2, count(*) OVER () AS n,
        |    sum(v) OVER () AS sv, sum(v * v) OVER () AS sv2
        |  FROM s WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |sc AS (SELECT t, k, cv, n, sv, sv2,
        |    (cv2 - cv * cv / k) + ((sv2 - cv2)
        |      - (sv - cv) * (sv - cv) / (n - k)) AS sse
        |  FROM c WHERE k < n),
        |best AS (SELECT * FROM sc ORDER BY sse, t LIMIT 1)
        |SELECT n::BIGINT AS n, t AS split_t, k::BIGINT AS n_left,
        |  round(cv / k, 6) + 0.0 AS mean_left,
        |  round((sv - cv) / (n - k), 6) + 0.0 AS mean_right,
        |  round(sv2 - sv * sv / n, 6) + 0.0 AS sse_global,
        |  round(sse, 6) + 0.0 AS sse_split,
        |  round(sv2 - sv * sv / n - sse, 6) + 0.0 AS reduction
        |FROM best""".stripMargin,

    "q247_welch_by_segment" ->
      """WITH s AS (SELECT event_type, CASE WHEN user_id % 2 = 0
        |    THEN 'a' ELSE 'b' END AS g, value AS v FROM events
        |  WHERE value IS NOT NULL),
        |a AS (SELECT event_type,
        |    count(*) FILTER (WHERE g = 'a')::BIGINT AS n_a,
        |    count(*) FILTER (WHERE g = 'b')::BIGINT AS n_b,
        |    avg(v) FILTER (WHERE g = 'a') AS mean_a,
        |    avg(v) FILTER (WHERE g = 'b') AS mean_b,
        |    var_samp(v) FILTER (WHERE g = 'a') AS va,
        |    var_samp(v) FILTER (WHERE g = 'b') AS vb
        |  FROM s GROUP BY 1),
        |d AS (SELECT *, va / n_a AS sa, vb / n_b AS sb FROM a)
        |SELECT event_type, n_a, n_b,
        |  round(mean_a, 6) + 0.0 AS mean_a,
        |  round(mean_b, 6) + 0.0 AS mean_b,
        |  round(mean_a - mean_b, 6) + 0.0 AS diff,
        |  round(sqrt(sa + sb), 6) + 0.0 AS se,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND sqrt(sa + sb) > 0
        |    THEN (mean_a - mean_b) / sqrt(sa + sb) END, 6) + 0.0
        |    AS t_stat,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND sqrt(sa + sb) > 0
        |    THEN pow(sa + sb, 2.0) / (pow(sa, 2.0) / (n_a - 1)
        |      + pow(sb, 2.0) / (n_b - 1)) END, 6) + 0.0 AS df
        |FROM d""".stripMargin,

    "q248_seasonal_anomalies" ->
      """WITH b AS (SELECT (epoch_us(ts) // 3600000000)::BIGINT AS t,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |r AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
        |idx AS (SELECT unnest(generate_series(lo, hi)) AS t FROM r),
        |d AS (SELECT idx.t, coalesce(b.n, 0)::DOUBLE AS v
        |  FROM idx LEFT JOIN b ON b.t = idx.t),
        |tr AS (SELECT t, v,
        |    CASE WHEN count(*) OVER w = 25 THEN avg(v) OVER w END
        |      AS trend FROM d
        |  WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |se AS (SELECT t % 24 AS ph, avg(v - trend) AS seasonal
        |  FROM tr WHERE trend IS NOT NULL GROUP BY 1),
        |f AS (SELECT tr.t, tr.v, trend, seasonal,
        |    v - trend - seasonal AS resid
        |  FROM tr LEFT JOIN se ON tr.t % 24 = se.ph),
        |st AS (SELECT avg(resid) AS mr, stddev_samp(resid) AS sr
        |  FROM f)
        |SELECT t, v, round(trend, 6) + 0.0 AS trend,
        |  round(seasonal, 6) + 0.0 AS seasonal,
        |  round(resid, 6) + 0.0 AS residual,
        |  round((resid - mr) / sr, 6) + 0.0 AS z
        |FROM f, st
        |WHERE resid IS NOT NULL AND sr > 0
        |  AND abs((resid - mr) / sr) > 2.0""".stripMargin,

    // quantile_disc needs CONSTANT parameters: one UNION arm per q
    "q246_quantile_effects" ->
      Seq(0.1, 0.25, 0.5, 0.75, 0.9).map { q =>
        s"""SELECT $q + 0.0 AS q,
           |  count(*) FILTER (WHERE s_nationkey < 12)::BIGINT AS n_a,
           |  count(*) FILTER (WHERE s_nationkey >= 12)::BIGINT AS n_b,
           |  round(quantile_disc(s_acctbal, $q)
           |    FILTER (WHERE s_nationkey < 12), 6) + 0.0 AS value_a,
           |  round(quantile_disc(s_acctbal, $q)
           |    FILTER (WHERE s_nationkey >= 12), 6) + 0.0 AS value_b,
           |  round(quantile_disc(s_acctbal, $q)
           |      FILTER (WHERE s_nationkey < 12)
           |    - quantile_disc(s_acctbal, $q)
           |      FILTER (WHERE s_nationkey >= 12), 6) + 0.0 AS qte
           |FROM supplier WHERE s_acctbal IS NOT NULL""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "q245_weighted_quantiles" ->
      """WITH c AS (SELECT n_chars AS v, sum(n_chars)::BIGINT AS c
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |  GROUP BY 1),
        |r AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
        |    sum(c) OVER () AS w FROM c),
        |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        |SELECT round(q, 6) + 0.0 AS q, max(w)::BIGINT AS n,
        |  min(v) AS value
        |FROM r, qs
        |WHERE cum >= greatest(1, ceil(q * w))
        |GROUP BY 1""".stripMargin,

    "q244_table_checksum" ->
      """WITH d AS (SELECT
        |    coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>') AS c1,
        |    coalesce(o_orderstatus, '<NULL>') AS c2,
        |    coalesce(o_orderpriority, '<NULL>') AS c3
        |  FROM orders),
        |s AS (SELECT count(*)::BIGINT AS n,
        |    (sum(CAST(('0x' || substr(md5(c1 || '|' || c2 || '|' || c3),
        |      1, 15)) AS BIGINT) % 1000000007)
        |      % 1000000007)::BIGINT AS rck,
        |    (sum(CAST(('0x' || substr(md5(c1), 1, 15)) AS BIGINT)
        |      % 1000000007) % 1000000007)::BIGINT AS k1,
        |    (sum(CAST(('0x' || substr(md5(c2), 1, 15)) AS BIGINT)
        |      % 1000000007) % 1000000007)::BIGINT AS k2,
        |    (sum(CAST(('0x' || substr(md5(c3), 1, 15)) AS BIGINT)
        |      % 1000000007) % 1000000007)::BIGINT AS k3
        |  FROM d)
        |SELECT '__rows' AS component, n, rck AS checksum FROM s
        |UNION ALL SELECT 'o_orderkey', n, k1 FROM s
        |UNION ALL SELECT 'o_orderstatus', n, k2 FROM s
        |UNION ALL SELECT 'o_orderpriority', n, k3 FROM s""".stripMargin,

    "q241_simpson_check" ->
      """WITH s AS (SELECT (user_id % 2 = 0) AS tr, value AS y,
        |    event_type AS st FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT st,
        |    count(*) FILTER (WHERE tr)::BIGINT AS nt,
        |    count(*) FILTER (WHERE NOT tr)::BIGINT AS nc,
        |    sum(CASE WHEN tr THEN y ELSE 0 END) AS stt,
        |    sum(CASE WHEN NOT tr THEN y ELSE 0 END) AS sc
        |  FROM s GROUP BY 1),
        |t AS (SELECT sum(stt) AS sta, sum(nt) AS nta,
        |    sum(sc) AS sca, sum(nc) AS nca FROM c),
        |p AS (SELECT CASE WHEN nta > 0 AND nca > 0
        |    THEN sta / nta - sca / nca END AS pooled FROM t),
        |g AS (SELECT sum(nt + nc)::BIGINT AS n,
        |    sum(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_strata,
        |    sum(CASE WHEN nt > 0 AND nc > 0
        |      THEN (nt + nc) * (stt / nt - sc / nc) END) AS wd,
        |    sum(CASE WHEN nt > 0 AND nc > 0
        |      THEN (nt + nc)::DOUBLE END) AS wsum,
        |    sum(CASE WHEN nt > 0 AND nc > 0 AND p.pooled IS NOT NULL
        |      AND sign(stt / nt - sc / nc) <> sign(p.pooled)
        |      THEN 1 ELSE 0 END)::BIGINT AS nd
        |  FROM c, p)
        |SELECT n, n_strata, round(p.pooled, 6) + 0.0 AS pooled_diff,
        |  round(wd / wsum, 6) + 0.0 AS stratified_diff,
        |  nd AS n_disagreeing_strata,
        |  (p.pooled IS NOT NULL AND wd / wsum IS NOT NULL
        |    AND sign(p.pooled) <> sign(wd / wsum)) AS flipped
        |FROM g, p""".stripMargin,

    "q242_trimmed_mean" ->
      """WITH c AS (SELECT
        |    (SELECT quantile_disc(l_extendedprice, 0.01)
        |      FROM lineitem) AS lo,
        |    (SELECT quantile_disc(l_extendedprice, 0.99)
        |      FROM lineitem) AS hi)
        |SELECT
        |  (SELECT count(l_extendedprice) FROM lineitem)::BIGINT AS n,
        |  (SELECT count(*) FROM lineitem, c
        |    WHERE l_extendedprice BETWEEN c.lo AND c.hi)::BIGINT
        |    AS n_kept,
        |  round(lo, 6) + 0.0 AS lo_cut, round(hi, 6) + 0.0 AS hi_cut,
        |  round((SELECT avg(l_extendedprice) FROM lineitem, c
        |    WHERE l_extendedprice BETWEEN c.lo AND c.hi), 6) + 0.0
        |    AS trimmed_mean
        |FROM c""".stripMargin,

    "q243_ratio_test" ->
      """WITH u AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1.0
        |      ELSE 0 END) AS x,
        |    count(*)::DOUBLE AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    count(*) FILTER (WHERE g = 'a')::BIGINT AS n_a,
        |    count(*) FILTER (WHERE g = 'b')::BIGINT AS n_b,
        |    sum(x) FILTER (WHERE g = 'a') AS sxa,
        |    sum(y) FILTER (WHERE g = 'a') AS sya,
        |    sum(x) FILTER (WHERE g = 'b') AS sxb,
        |    sum(y) FILTER (WHERE g = 'b') AS syb,
        |    var_samp(x) FILTER (WHERE g = 'a') AS vxa,
        |    var_samp(y) FILTER (WHERE g = 'a') AS vya,
        |    covar_samp(x, y) FILTER (WHERE g = 'a') AS ca,
        |    var_samp(x) FILTER (WHERE g = 'b') AS vxb,
        |    var_samp(y) FILTER (WHERE g = 'b') AS vyb,
        |    covar_samp(x, y) FILTER (WHERE g = 'b') AS cb
        |  FROM u),
        |d AS (SELECT *,
        |    CASE WHEN sya <> 0 THEN sxa / sya END AS ra,
        |    CASE WHEN syb <> 0 THEN sxb / syb END AS rb FROM a),
        |f AS (SELECT *, ra - rb AS diff,
        |    CASE WHEN n_a > 1 AND n_b > 1 THEN sqrt(
        |      (vxa - 2.0 * ra * ca + ra * ra * vya)
        |        / (n_a * (sya / n_a) * (sya / n_a)) +
        |      (vxb - 2.0 * rb * cb + rb * rb * vyb)
        |        / (n_b * (syb / n_b) * (syb / n_b))) END AS se
        |  FROM d)
        |SELECT n_a, n_b, round(ra, 6) + 0.0 AS ratio_a,
        |  round(rb, 6) + 0.0 AS ratio_b,
        |  round(diff, 6) + 0.0 AS diff, round(se, 6) + 0.0 AS se,
        |  round(CASE WHEN se > 0 THEN diff / se END, 6) + 0.0 AS z
        |FROM f""".stripMargin,

    "q240_name_match_blocked" ->
      """WITH base AS (SELECT p_partkey AS id,
        |    p_name || ' #' || (p_partkey % 100) AS key,
        |    p_partkey % 50 AS blk FROM part),
        |typo AS (SELECT id + 100000 AS id,
        |    substr(key, 1, 2) || substr(key, 4) AS key, blk FROM base),
        |p AS (SELECT l.id AS left_id, r.id AS right_id,
        |    jaro_winkler_similarity(l.key, r.key) AS sim
        |  FROM base l JOIN typo r ON l.blk = r.blk)
        |SELECT left_id, right_id, round(sim, 6) + 0.0 AS sim
        |FROM p WHERE sim >= 0.95""".stripMargin,

    "q237_proportion_test" ->
      """WITH s AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'a'
        |    ELSE 'b' END AS g, (event_type = 'purchase') AS y
        |  FROM events WHERE event_type IS NOT NULL),
        |a AS (SELECT
        |    count(*) FILTER (WHERE g = 'a')::BIGINT AS n_a,
        |    count(*) FILTER (WHERE g = 'b')::BIGINT AS n_b,
        |    count(*) FILTER (WHERE g = 'a' AND y)::BIGINT AS sa,
        |    count(*) FILTER (WHERE g = 'b' AND y)::BIGINT AS sb
        |  FROM s),
        |d AS (SELECT *, sa::DOUBLE / n_a AS pa, sb::DOUBLE / n_b AS pb,
        |    (sa + sb)::DOUBLE / (n_a + n_b) AS pp FROM a),
        |f AS (SELECT *, sqrt(pp * (1.0 - pp)
        |    * (1.0 / n_a + 1.0 / n_b)) AS se FROM d)
        |SELECT n_a, n_b, round(pa, 6) + 0.0 AS p_a,
        |  round(pb, 6) + 0.0 AS p_b,
        |  round(pa - pb, 6) + 0.0 AS diff,
        |  round(CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN (pa - pb) / se END, 6) + 0.0 AS z
        |FROM f""".stripMargin,

    "q238_cuped" ->
      """WITH st AS (SELECT covar_samp(s_nationkey, s_acctbal) AS c,
        |    var_samp(s_nationkey) AS v, avg(s_nationkey) AS m
        |  FROM supplier)
        |SELECT s_suppkey,
        |  round(CASE WHEN v > 0
        |    THEN s_acctbal - c / v * (s_nationkey - m)
        |    ELSE s_acctbal END, 6) + 0.0 AS adjusted
        |FROM supplier, st""".stripMargin,

    "q239_srm_check" ->
      """WITH obs AS (SELECT event_type AS g, count(*)::BIGINT AS o
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(CASE WHEN g IN ('signup', 'click', 'view',
        |      'purchase') THEN o ELSE 0 END)::BIGINT AS n,
        |    sum(CASE WHEN g IN ('signup', 'click', 'view', 'purchase')
        |      THEN 0 ELSE o END)::BIGINT AS n_unlisted FROM obs),
        |e AS (SELECT unnest(['signup', 'click', 'view', 'purchase'])
        |    AS grp),
        |c AS (SELECT e.grp, coalesce(obs.o, 0)::BIGINT AS n_obs,
        |    0.25 * t.n AS n_expected, t.n, t.n_unlisted
        |  FROM e LEFT JOIN obs ON obs.g = e.grp, t),
        |w AS (SELECT *, CASE WHEN n_expected > 0
        |    THEN pow(n_obs - n_expected, 2) / n_expected END AS contrib
        |  FROM c),
        |x AS (SELECT sum(contrib) AS chi2 FROM w)
        |SELECT grp, n_obs, round(n_expected, 6) + 0.0 AS n_expected,
        |  round(contrib, 6) + 0.0 AS contrib, n, n_unlisted,
        |  round(x.chi2, 6) + 0.0 AS chi2
        |FROM w, x""".stripMargin,

    "q233_welch_ttest" ->
      """WITH s AS (SELECT CASE WHEN s_nationkey < 12 THEN 'old'
        |    ELSE 'new' END AS g, s_acctbal AS v FROM supplier
        |  WHERE s_acctbal IS NOT NULL),
        |a AS (SELECT
        |    count(*) FILTER (WHERE g = 'old')::BIGINT AS n_a,
        |    count(*) FILTER (WHERE g = 'new')::BIGINT AS n_b,
        |    avg(v) FILTER (WHERE g = 'old') AS mean_a,
        |    avg(v) FILTER (WHERE g = 'new') AS mean_b,
        |    var_samp(v) FILTER (WHERE g = 'old') AS va,
        |    var_samp(v) FILTER (WHERE g = 'new') AS vb
        |  FROM s),
        |d AS (SELECT *, va / n_a AS sa, vb / n_b AS sb FROM a)
        |SELECT n_a, n_b,
        |  round(mean_a, 6) + 0.0 AS mean_a,
        |  round(mean_b, 6) + 0.0 AS mean_b,
        |  round(mean_a - mean_b, 6) + 0.0 AS diff,
        |  round(sqrt(sa + sb), 6) + 0.0 AS se,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND sqrt(sa + sb) > 0
        |    THEN (mean_a - mean_b) / sqrt(sa + sb) END, 6) + 0.0
        |    AS t_stat,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND sqrt(sa + sb) > 0
        |    THEN pow(sa + sb, 2.0) / (pow(sa, 2.0) / (n_a - 1)
        |      + pow(sb, 2.0) / (n_b - 1)) END, 6) + 0.0 AS df
        |FROM d""".stripMargin,

    "q234_mann_whitney" ->
      """WITH s AS (SELECT CAST(s_acctbal AS DOUBLE) AS v,
        |    (s_nationkey < 12) AS a FROM supplier
        |  WHERE s_acctbal IS NOT NULL),
        |c AS (SELECT v, count(*)::BIGINT AS t,
        |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS p
        |  FROM s GROUP BY 1),
        |r AS (SELECT t, p, sum(t) OVER (ORDER BY v) AS cum FROM c),
        |g AS (SELECT sum(p)::BIGINT AS na,
        |    (sum(t) - sum(p))::BIGINT AS nb,
        |    sum(p * ((cum - t) + (t + 1) / 2.0)) AS ra,
        |    sum(t::DOUBLE * t * t - t) AS ties FROM r),
        |f AS (SELECT na, nb, ra - na::DOUBLE * (na + 1) / 2 AS u,
        |    sqrt(na::DOUBLE * nb / 12.0 * ((na + nb + 1)
        |      - ties / ((na + nb)::DOUBLE * (na + nb - 1)))) AS sig
        |  FROM g)
        |SELECT na AS n_a, nb AS n_b, round(u, 6) + 0.0 AS u,
        |  round(CASE WHEN na > 0 AND nb > 0 AND sig > 0
        |    THEN (u - na::DOUBLE * nb / 2) / sig END, 6) + 0.0 AS z
        |FROM f""".stripMargin,

    "q235_rater_agreement" ->
      """WITH r AS (SELECT lang AS a,
        |    CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS b
        |  FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT a, b, count(*)::DOUBLE AS c FROM r GROUP BY 1, 2),
        |n AS (SELECT sum(c) AS n,
        |    sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM c),
        |ma AS (SELECT a AS k, sum(c) AS ra FROM c GROUP BY 1),
        |mb AS (SELECT b AS k, sum(c) AS rb FROM c GROUP BY 1),
        |pe AS (SELECT sum(ra * rb / (n.n * n.n)) AS pe
        |  FROM ma JOIN mb USING (k), n)
        |SELECT n.n::BIGINT AS n, round(agree / n.n, 6) + 0.0 AS po,
        |  round(pe.pe, 6) + 0.0 AS pe,
        |  round(CASE WHEN pe.pe < 1.0
        |    THEN (agree / n.n - pe.pe) / (1.0 - pe.pe) END, 6) + 0.0
        |    AS kappa
        |FROM n, pe""".stripMargin,

    "q236_decompose" ->
      """WITH b AS (SELECT (epoch_us(ts) // 3600000000)::BIGINT AS t,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |r AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
        |idx AS (SELECT unnest(generate_series(lo, hi)) AS t FROM r),
        |d AS (SELECT idx.t, coalesce(b.n, 0)::DOUBLE AS v
        |  FROM idx LEFT JOIN b ON b.t = idx.t),
        |tr AS (SELECT t, v,
        |    CASE WHEN count(*) OVER w = 25 THEN avg(v) OVER w END
        |      AS trend FROM d
        |  WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |se AS (SELECT t % 24 AS ph, avg(v - trend) AS seasonal
        |  FROM tr WHERE trend IS NOT NULL GROUP BY 1)
        |SELECT tr.t, tr.v, round(trend, 6) + 0.0 AS trend,
        |  round(seasonal, 6) + 0.0 AS seasonal,
        |  round(v - trend - seasonal, 6) + 0.0 AS residual
        |FROM tr LEFT JOIN se ON tr.t % 24 = se.ph""".stripMargin,

    "q232_name_match" ->
      """WITH base AS (SELECT p_partkey AS id,
        |    p_name || ' #' || (p_partkey % 100) AS key FROM part),
        |typo AS (SELECT id + 100000 AS id,
        |    substr(key, 1, 2) || substr(key, 4) AS key FROM base),
        |p AS (SELECT l.id AS left_id, r.id AS right_id,
        |    jaro_winkler_similarity(l.key, r.key) AS sim
        |  FROM base l JOIN typo r
        |    ON substr(l.key, 1, 2) = substr(r.key, 1, 2)
        |   AND abs(floor(len(l.key) / 4) - floor(len(r.key) / 4)) <= 1
        |  WHERE len(l.key) >= 2 AND len(r.key) >= 2)
        |SELECT left_id, right_id, round(sim, 6) + 0.0 AS sim
        |FROM p WHERE sim >= 0.95""".stripMargin,

    "q224_categorical_tvd" ->
      """WITH e AS (SELECT event_type, (user_id % 2 = 0) AS is_a
        |  FROM events),
        |c AS (SELECT event_type,
        |    count(*) FILTER (WHERE is_a) AS ca,
        |    count(*) FILTER (WHERE NOT is_a) AS cb
        |  FROM e GROUP BY 1),
        |t AS (SELECT sum(ca)::DOUBLE AS ta, sum(cb)::DOUBLE AS tb
        |  FROM c),
        |terms AS (SELECT event_type,
        |    abs(greatest(ca / ta, 1e-6) - greatest(cb / tb, 1e-6)) / 2
        |      AS term
        |  FROM c, t),
        |p AS (SELECT list_sum(list(term ORDER BY event_type)) AS tvd
        |  FROM terms)
        |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
        |  round(tvd, 6) + 0.0 AS tvd
        |FROM t, p""".stripMargin,

    "q223_emd_drift" ->
      """WITH s AS (SELECT CASE WHEN s_nationkey < 12 THEN 'old'
        |    ELSE 'new' END AS cohort, CAST(s_acctbal AS REAL) AS v
        |  FROM supplier),
        |c AS (SELECT cohort, count(*) AS n,
        |  count(*) FILTER (WHERE v <= 0.0) AS r0,
        |  count(*) FILTER (WHERE v <= 2500.0) AS r1,
        |  count(*) FILTER (WHERE v <= 5000.0) AS r2
        |  FROM s GROUP BY 1)
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round(
        |    abs(a.r0 / a.n::DOUBLE - b.r0 / b.n::DOUBLE) * 2500.0 +
        |    abs(a.r1 / a.n::DOUBLE - b.r1 / b.n::DOUBLE) * 2500.0 +
        |    abs(a.r2 / a.n::DOUBLE - b.r2 / b.n::DOUBLE) * 2500.0,
        |    6) + 0.0 AS emd
        |FROM c a, c b WHERE a.cohort = 'old' AND b.cohort = 'new'""".stripMargin,

    "q221_strip_markup" ->
      """WITH d AS (SELECT doc_id,
        |    '<p class="x">' || text ||
        |    '</p>' || chr(9) ||
        |    '<br/>fish &amp;lt; chips &quot;q&#39;s&quot; ' ||
        |    '&nbsp;&gt;end&lt;' AS text
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    len(regexp_extract_all(text, '<[^>]*>'))::INT AS n_tags,
        |    regexp_replace(text, '<[^>]*>', ' ', 'g') AS t1
        |  FROM d),
        |u AS (SELECT doc_id, n_tags,
        |    replace(replace(replace(replace(replace(replace(t1,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS t2
        |  FROM s)
        |SELECT doc_id, n_tags,
        |  trim(regexp_replace(t2, '[ ' || chr(9) || ']+', ' ', 'g'))
        |    AS text
        |FROM u""".stripMargin,

    "q222_url_dedup" ->
      """WITH urls AS (SELECT doc_id,
        |    'https://Site' || (doc_id % 7) || '.Example/Page' ||
        |    (doc_id % 3) ||
        |    CASE WHEN doc_id % 2 = 0 THEN '/?utm_source=x#frag'
        |      ELSE '' END AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    lower(regexp_extract(url, '^(?i)(https?)://', 1)) || '://' ||
        |    lower(regexp_extract(url, '^(?i)https?://([^/?#]+)', 1)) ||
        |    rtrim(regexp_extract(url,
        |      '^(?i)https?://[^/?#]+([^?#]*)', 1), '/') AS canonical_url
        |  FROM urls
        |  WHERE regexp_extract(url, '^(?i)(https?)://', 1) <> ''
        |    AND regexp_extract(url,
        |      '^(?i)https?://([^/?#]+)', 1) <> '')
        |SELECT canonical_url, min(doc_id)::BIGINT AS survivor_id,
        |  count(*)::BIGINT AS n_dupes
        |FROM c GROUP BY 1""".stripMargin,

    "q201_video_frames" ->
      """WITH ids AS (SELECT doc_id AS id, 3 + doc_id % 3 AS nf
        |  FROM documents WHERE doc_id < 24),
        |fr AS (SELECT id, unnest(range(0, nf, 2)) AS f FROM ids),
        |d AS (SELECT id, f, (id * 31 + f)::BIGINT AS fid FROM fr),
        |dims AS (SELECT id, f, fid, (4 + fid % 8)::BIGINT AS w,
        |    (3 + fid % 5)::BIGINT AS h FROM d),
        |px AS (SELECT id, f, w, h, fid, unnest(range(0, w)) AS x
        |  FROM dims),
        |pxy AS (SELECT id, f, w, h, fid, x, unnest(range(0, h)) AS y
        |  FROM px),
        |m AS (SELECT id, f, w, h,
        |    avg(((fid + 7 * x + 13 * y) % 256)::DOUBLE) AS mr,
        |    avg(((fid * 3 + 5 * x + 11 * y) % 256)::DOUBLE) AS mg,
        |    avg(((fid * 7 + 3 * x + 17 * y) % 256)::DOUBLE) AS mb
        |  FROM pxy GROUP BY 1, 2, 3, 4)
        |SELECT id AS doc_id, f::BIGINT AS frame_idx, w AS width,
        |  h AS height,
        |  round(mr, 6) + 0.0 AS mean_r,
        |  round(mg, 6) + 0.0 AS mean_g,
        |  round(mb, 6) + 0.0 AS mean_b
        |FROM m""".stripMargin,

    "q202_video_stats" ->
      """SELECT doc_id, (4 + doc_id % 5)::BIGINT AS n_frames,
        |  4000::BIGINT AS fps_milli,
        |  ((4 + doc_id % 5) * 1000000000 // 4000)::BIGINT
        |    AS duration_us
        |FROM documents WHERE doc_id < 60""".stripMargin,

    "q208_k_anonymity" ->
      """WITH g AS (SELECT o_orderstatus, o_orderpriority, o_custkey,
        |    count(*)::BIGINT AS n
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT coalesce(sum(n), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_groups,
        |  min(n)::BIGINT AS min_group_size,
        |  coalesce(sum(CASE WHEN n < 3 THEN 1 ELSE 0 END), 0)::BIGINT
        |    AS n_violating_groups,
        |  coalesce(sum(CASE WHEN n < 3 THEN n ELSE 0 END), 0)::BIGINT
        |    AS n_rows_at_risk,
        |  coalesce(sum(CASE WHEN n < 3 THEN 1 ELSE 0 END), 0) = 0
        |    AS k_anonymous
        |FROM g""".stripMargin,

    "q209_l_diversity" ->
      """WITH g AS (SELECT o_orderpriority, o_custkey,
        |    count(*)::BIGINT AS n,
        |    count(DISTINCT o_orderstatus)::BIGINT AS d
        |  FROM orders GROUP BY 1, 2)
        |SELECT count(*)::BIGINT AS n_groups,
        |  min(d)::BIGINT AS min_distinct_sensitive,
        |  coalesce(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END), 0)::BIGINT
        |    AS n_violating_groups,
        |  coalesce(sum(CASE WHEN d < 2 THEN n ELSE 0 END), 0)::BIGINT
        |    AS n_rows_at_risk,
        |  coalesce(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END), 0) = 0
        |    AS l_diverse
        |FROM g""".stripMargin,

    "q214_phash_dups" ->
      """SELECT doc_id, doc_id + 100000 AS dup_id, 0 AS hamming
        |FROM documents WHERE doc_id < 60""".stripMargin,

    "q217_video_dups" ->
      """SELECT doc_id, doc_id + 100000 AS dup_id
        |FROM documents WHERE doc_id < 40""".stripMargin,

    "q218_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
        |  FROM embeddings),
        |sims AS (SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
        |    list_dot_product(a.emb, b.emb) /
        |      (sqrt(list_dot_product(a.emb, a.emb)) *
        |       sqrt(list_dot_product(b.emb, b.emb))) AS s
        |  FROM e a JOIN e b
        |    ON a.vec_id <> b.vec_id AND a.label <> b.label),
        |top AS (SELECT anchor_id, negative_id, s,
        |    row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY s DESC, negative_id) AS rn
        |  FROM sims)
        |SELECT anchor_id, negative_id, round(s, 6) + 0.0 AS cosine,
        |  rn::INT AS rank
        |FROM top WHERE rn <= 3""".stripMargin,

    "q216_semantic_contamination" ->
      """WITH tr AS (SELECT vec_id AS train_id,
        |    embedding::DOUBLE[] AS te FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |ev AS (SELECT vec_id AS eval_id,
        |    embedding::DOUBLE[] AS ee FROM embeddings
        |  WHERE vec_id >= 450 AND embedding IS NOT NULL),
        |p AS (SELECT train_id, eval_id,
        |    round(list_dot_product(te, ee) /
        |      (sqrt(list_dot_product(te, te)) *
        |       sqrt(list_dot_product(ee, ee))), 6) + 0.0 AS cosine
        |  FROM tr, ev
        |  WHERE list_dot_product(te, te) > 0
        |    AND list_dot_product(ee, ee) > 0)
        |SELECT train_id, eval_id, cosine FROM p
        |WHERE cosine >= 0.99""".stripMargin,

    "q215_trigram_perplexity" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |toks AS (SELECT doc_id, t AS term FROM d, unnest(d.toks) AS u(t)),
        |bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM (SELECT toks,
        |      unnest(generate_series(1, len(toks) - 1)) AS i FROM d)),
        |tri AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
        |    toks[i + 2] AS w3
        |  FROM (SELECT doc_id, toks,
        |      unnest(generate_series(1, len(toks) - 2)) AS i FROM d)),
        |uni AS (SELECT term, count(*) AS ucnt FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(ucnt) AS DOUBLE) AS total FROM uni),
        |bic AS (SELECT w1, w2, count(*) AS bcnt FROM bi GROUP BY 1, 2
        |  HAVING count(*) >= 2),
        |tric AS (SELECT w1, w2, w3, count(*) AS tcnt FROM tri
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  round(exp(avg(-ln(CASE
        |    WHEN tc.tcnt IS NOT NULL
        |      THEN CAST(tc.tcnt AS DOUBLE) / b12.bcnt
        |    WHEN b23.bcnt IS NOT NULL
        |      THEN 0.4 * CAST(b23.bcnt AS DOUBLE) / u2.ucnt
        |    ELSE 0.4 * 0.4 * CAST(u3.ucnt AS DOUBLE) / total
        |    END))), 6) AS perplexity
        |FROM tri
        |LEFT JOIN tric tc USING (w1, w2, w3)
        |LEFT JOIN bic b12 ON tri.w1 = b12.w1 AND tri.w2 = b12.w2
        |LEFT JOIN bic b23 ON tri.w2 = b23.w1 AND tri.w3 = b23.w2
        |LEFT JOIN uni u2 ON tri.w2 = u2.term
        |LEFT JOIN uni u3 ON tri.w3 = u3.term
        |CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    "q213_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |u AS (SELECT vec_id, unnest(e) AS x,
        |    unnest(range(len(e))) AS i FROM e),
        |st AS (SELECT i, sum(x) AS s, sum(x * x) AS s2,
        |    count(*)::DOUBLE AS n FROM u GROUP BY i),
        |d AS (SELECT i, s / n AS m,
        |    s2 / n - (s / n) * (s / n) AS v FROM st),
        |sc AS (SELECT u.vec_id,
        |    round(sum(CASE WHEN d.v > 1e-12
        |      THEN (u.x - d.m) * (u.x - d.m) / d.v
        |      ELSE 0.0 END), 6) + 0.0 AS score
        |  FROM u JOIN d ON u.i = d.i GROUP BY u.vec_id)
        |SELECT vec_id, score FROM sc
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,

    "q211_benford" ->
      """WITH v AS (SELECT o_totalprice::DOUBLE AS x FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1),
        |d AS (SELECT CAST(substring(CAST(CAST(floor(x) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*)::BIGINT AS n0
        |  FROM v GROUP BY 1),
        |alld AS (SELECT t.d::BIGINT AS digit,
        |    coalesce(d.n0, 0)::BIGINT AS n,
        |    ln(1 + 1.0 / t.d) / ln(10) AS e
        |  FROM range(1, 10) t(d) LEFT JOIN d ON d.digit = t.d),
        |tot AS (SELECT sum(n)::DOUBLE AS nn FROM alld),
        |fit AS (SELECT
        |    sum((n - nn * e) * (n - nn * e) / (nn * e)) AS chi2,
        |    avg(abs(n / nn - e)) AS mad
        |  FROM alld CROSS JOIN tot)
        |SELECT digit, n, round(n / nn, 6) + 0.0 AS share,
        |  round(e, 6) + 0.0 AS expected, round(chi2, 6) + 0.0 AS chi2,
        |  round(mad, 6) + 0.0 AS mad
        |FROM alld CROSS JOIN tot CROSS JOIN fit""".stripMargin,

    "q212_functional_deps" ->
      """WITH g1 AS (SELECT o_orderkey AS k, count(*)::BIGINT AS n,
        |    (count(DISTINCT o_custkey) + max(CASE WHEN o_custkey
        |      IS NULL THEN 1 ELSE 0 END))::BIGINT AS d
        |  FROM orders GROUP BY 1),
        |g2 AS (SELECT o_custkey AS k, count(*)::BIGINT AS n,
        |    (count(DISTINCT o_orderpriority) + max(CASE WHEN
        |      o_orderpriority IS NULL THEN 1 ELSE 0 END))::BIGINT AS d
        |  FROM orders GROUP BY 1),
        |g3 AS (SELECT o_totalprice AS k, count(*)::BIGINT AS n,
        |    (count(DISTINCT o_custkey) + max(CASE WHEN
        |      o_custkey IS NULL THEN 1 ELSE 0 END))::BIGINT AS d
        |  FROM orders GROUP BY 1)
        |SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
        |  count(*)::BIGINT AS n_groups,
        |  coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0)::BIGINT
        |    AS n_violating_groups,
        |  coalesce(sum(CASE WHEN d > 1 THEN n ELSE 0 END), 0)::BIGINT
        |    AS n_rows_at_risk,
        |  coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0) = 0
        |    AS holds
        |FROM g1
        |UNION ALL
        |SELECT 'o_custkey', 'o_orderpriority', count(*)::BIGINT,
        |  coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0)::BIGINT,
        |  coalesce(sum(CASE WHEN d > 1 THEN n ELSE 0 END), 0)::BIGINT,
        |  coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0) = 0
        |FROM g2
        |UNION ALL
        |SELECT 'o_totalprice', 'o_custkey', count(*)::BIGINT,
        |  coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0)::BIGINT,
        |  coalesce(sum(CASE WHEN d > 1 THEN n ELSE 0 END), 0)::BIGINT,
        |  coalesce(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END), 0) = 0
        |FROM g3""".stripMargin,

    "q210_t_closeness" ->
      """WITH cell AS (SELECT o_orderpriority AS p, o_custkey AS c,
        |    o_orderstatus AS s, count(*)::BIGINT AS nc
        |  FROM orders GROUP BY 1, 2, 3),
        |gd AS (SELECT s, sum(nc)::BIGINT AS ns FROM cell GROUP BY 1),
        |tot AS (SELECT sum(nc)::BIGINT AS n FROM cell),
        |grp AS (SELECT p, c, sum(nc)::BIGINT AS ng
        |  FROM cell GROUP BY 1, 2),
        |per AS (SELECT cell.p, cell.c, any_value(grp.ng) AS ng,
        |    (sum(abs(cell.nc * 1.0 / grp.ng - gd.ns * 1.0 / tot.n))
        |      + 1.0 - sum(gd.ns * 1.0 / tot.n)) / 2.0 AS tvd
        |  FROM cell
        |  JOIN grp ON cell.p IS NOT DISTINCT FROM grp.p
        |    AND cell.c IS NOT DISTINCT FROM grp.c
        |  JOIN gd ON cell.s IS NOT DISTINCT FROM gd.s
        |  CROSS JOIN tot
        |  GROUP BY cell.p, cell.c)
        |SELECT coalesce(sum(ng), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_groups,
        |  coalesce(round(max(tvd), 6) + 0.0, 0.0) AS max_tvd,
        |  coalesce(sum(CASE WHEN round(tvd, 6) + 0.0 > 0.2
        |    THEN 1 ELSE 0 END), 0)::BIGINT AS n_violating_groups,
        |  coalesce(sum(CASE WHEN round(tvd, 6) + 0.0 > 0.2
        |    THEN ng ELSE 0 END), 0)::BIGINT AS n_rows_at_risk,
        |  coalesce(sum(CASE WHEN round(tvd, 6) + 0.0 > 0.2
        |    THEN 1 ELSE 0 END), 0) = 0 AS t_close
        |FROM per""".stripMargin,

    "q207_seasonality" ->
      """WITH b AS (SELECT
        |    ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour
        |  FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT dow, hour, count(*)::BIGINT AS n FROM b
        |  GROUP BY 1, 2)
        |SELECT dow, hour, n,
        |  round(n::DOUBLE / (SELECT sum(n) FROM c), 6) + 0.0 AS share,
        |  round(n * 168.0 / (SELECT sum(n) FROM c), 6) + 0.0 AS lift
        |FROM c""".stripMargin,

    "q206_orc_sink" ->
      """SELECT l_returnflag, count(*) AS n,
        |  min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q205_audio_stored" ->
      """SELECT doc_id, (doc_id + 1000)::BIGINT AS dup_id,
        |  ((((1600 + (doc_id % 3) * 160) // 16) - 1) // 8)::BIGINT
        |    AS n_shared
        |FROM documents WHERE doc_id < 20""".stripMargin,

    "q204_audio_dups" ->
      """SELECT doc_id::BIGINT AS id_a, (doc_id + 1000)::BIGINT AS id_b,
        |  ((((1600 + (doc_id % 3) * 160) // 16) - 1) // 8)::BIGINT
        |    AS n_shared
        |FROM documents WHERE doc_id < 25""".stripMargin,

    "q203_encoding_profile" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || chr(65533)
        |         WHEN doc_id % 7 = 1 THEN text || chr(3) || chr(7)
        |         WHEN doc_id % 7 = 2 THEN text || repeat(chr(8), 20)
        |         ELSE text END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    length(t)::BIGINT AS n_chars,
        |    len(regexp_extract_all(t, '[\x00-\x7f]'))::BIGINT
        |      AS n_ascii,
        |    len(regexp_extract_all(t, '[A-Za-z]'))::BIGINT AS n_letter,
        |    len(regexp_extract_all(t, '[0-9]'))::BIGINT AS n_digit,
        |    len(regexp_extract_all(t, '[ \t\n\r]'))::BIGINT AS n_ws,
        |    len(regexp_extract_all(t,
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]'))::BIGINT AS n_control,
        |    len(regexp_extract_all(t, chr(65533)))::BIGINT
        |      AS n_replacement
        |  FROM m)
        |SELECT doc_id, n_chars, n_ascii, n_letter, n_digit, n_ws,
        |  n_control, n_replacement,
        |  round(CASE WHEN n_chars > 0
        |      THEN (n_chars - n_ascii)::DOUBLE / n_chars
        |      WHEN n_chars = 0 THEN 0.0 END, 6) + 0.0
        |    AS non_ascii_ratio,
        |  (n_replacement > 0 OR n_control * 100 > n_chars) AS mojibake
        |FROM c""".stripMargin,

    "q200_curation_funnel" ->
      """WITH m AS (SELECT source,
        |    len(list_filter(string_split(lower(text), ' '),
        |      t -> len(t) > 0))::BIGINT AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      ::BIGINT AS s,
        |    coalesce(list_sum(list_transform(
        |      list_filter(string_split(lower(text), ' '),
        |        t -> len(t) > 0),
        |      t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')),
        |        1))), 0)::BIGINT AS syl,
        |    n_chars
        |  FROM documents),
        |c AS (SELECT source,
        |    (w >= 40 AND w <= 100) AS c1,
        |    (n_chars <= 450) AS c2,
        |    (206835 * w * s - 1015 * w * w - 84600 * syl * s >= 0)
        |      AS c3
        |  FROM m),
        |a AS (SELECT source AS grp, count(*)::BIGINT AS n_total,
        |    sum(CASE WHEN c1 THEN 1 ELSE 0 END)::BIGINT AS s1,
        |    sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END)::BIGINT AS s2,
        |    sum(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END)::BIGINT
        |      AS s3
        |  FROM c GROUP BY 1)
        |SELECT grp AS "group", 1::INT AS stage,
        |  'token_range' AS stage_name, n_total AS n_in, s1 AS n_out,
        |  round(s1::DOUBLE / n_total, 6) + 0.0 AS keep_rate FROM a
        |UNION ALL SELECT grp, 2::INT, 'length_cap', s1, s2,
        |  CASE WHEN s1 > 0 THEN round(s2::DOUBLE / s1, 6) + 0.0 END
        |  FROM a
        |UNION ALL SELECT grp, 3::INT, 'readable', s2, s3,
        |  CASE WHEN s2 > 0 THEN round(s3::DOUBLE / s2, 6) + 0.0 END
        |  FROM a""".stripMargin,

    "q199_survival_grouped" ->
      """WITH tt AS (SELECT user_id, min(epoch_us(ts)) AS t0,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
        |      AS tp,
        |    max(epoch_us(ts)) AS tmax
        |  FROM events GROUP BY 1),
        |d AS (SELECT (user_id % 2)::VARCHAR AS g,
        |    ((CASE WHEN tp IS NOT NULL THEN tp - t0
        |      ELSE tmax - t0 END) // 3600000000)::BIGINT AS t,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs FROM tt),
        |grp AS (SELECT g, t,
        |    sum(CASE WHEN obs = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_events,
        |    sum(CASE WHEN obs = 1 THEN 0 ELSE 1 END)::BIGINT
        |      AS n_censored,
        |    count(*)::BIGINT AS n_at FROM d GROUP BY 1, 2),
        |r AS (SELECT *, (sum(n_at) OVER (PARTITION BY g)
        |    - coalesce(sum(n_at) OVER (PARTITION BY g ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |    ::BIGINT AS n_risk FROM grp),
        |s AS (SELECT *,
        |    CASE WHEN sum(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY g ORDER BY t
        |          ROWS UNBOUNDED PRECEDING) > 0 THEN 0.0
        |    ELSE exp(sum(CASE WHEN n_events < n_risk
        |        THEN ln(1 - n_events::DOUBLE / n_risk) ELSE 0.0 END)
        |      OVER (PARTITION BY g ORDER BY t
        |        ROWS UNBOUNDED PRECEDING)) END AS survival
        |  FROM r)
        |SELECT g AS "group", t, n_risk, n_events, n_censored,
        |  round(survival, 6) + 0.0 AS survival
        |FROM s WHERE n_events > 0""".stripMargin,

    "q198_ltv_curve" ->
      """WITH e AS (SELECT user_id AS u,
        |    floor(epoch_us(ts) / 86400000000.0)::BIGINT AS day,
        |    value AS v FROM events),
        |f AS (SELECT u, day, v,
        |    min(day) OVER (PARTITION BY u) AS firstd FROM e),
        |c AS (SELECT firstd AS cohort_day,
        |    (day - firstd)::BIGINT AS day_offset,
        |    count(DISTINCT u)::BIGINT AS n_active,
        |    sum(v) AS revenue
        |  FROM f GROUP BY 1, 2),
        |x AS (SELECT *,
        |    max(CASE WHEN day_offset = 0 THEN n_active END)
        |      OVER (PARTITION BY cohort_day) AS cohort_users,
        |    sum(revenue) OVER (PARTITION BY cohort_day
        |      ORDER BY day_offset ROWS UNBOUNDED PRECEDING)
        |      AS cum_revenue
        |  FROM c)
        |SELECT cohort_day, day_offset, n_active, cohort_users,
        |  round(revenue, 6) + 0.0 AS revenue,
        |  round(cum_revenue, 6) + 0.0 AS cum_revenue,
        |  round(cum_revenue / cohort_users, 6) + 0.0 AS ltv
        |FROM x""".stripMargin,

    "q197_rfm" ->
      """WITH a AS (SELECT user_id AS key, max(epoch_us(ts)) AS lastt,
        |    count(*)::BIGINT AS frequency, sum(value) AS monetary
        |  FROM events GROUP BY 1),
        |r AS (SELECT key,
        |    (((SELECT max(lastt) FROM a) - lastt) // 1000000)::BIGINT
        |      AS recency_s,
        |    frequency, monetary FROM a),
        |s AS (SELECT *,
        |    (6 - ntile(5) OVER (ORDER BY recency_s ASC, key ASC))
        |      ::BIGINT AS r_score,
        |    (6 - ntile(5) OVER (ORDER BY frequency DESC, key ASC))
        |      ::BIGINT AS f_score,
        |    (6 - ntile(5) OVER (ORDER BY round(monetary, 6) DESC,
        |      key ASC))::BIGINT AS m_score
        |  FROM r)
        |SELECT key, recency_s, frequency,
        |  round(monetary, 6) + 0.0 AS monetary,
        |  r_score, f_score, m_score,
        |  (r_score * 100 + f_score * 10 + m_score)::BIGINT AS rfm
        |FROM s""".stripMargin,

    "q196_log_rank" ->
      """WITH tt AS (SELECT user_id, min(epoch_us(ts)) AS t0,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
        |      AS tp,
        |    max(epoch_us(ts)) AS tmax
        |  FROM events GROUP BY 1),
        |d AS (SELECT (user_id % 2)::VARCHAR AS g,
        |    ((CASE WHEN tp IS NOT NULL THEN tp - t0
        |      ELSE tmax - t0 END) // 3600000000)::BIGINT AS t,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs FROM tt),
        |cells AS (SELECT t, g,
        |    sum(CASE WHEN obs = 1 THEN 1 ELSE 0 END)::BIGINT AS d,
        |    count(*)::BIGINT AS m FROM d GROUP BY 1, 2),
        |wide AS (SELECT t,
        |    sum(CASE WHEN g = '0' THEN d ELSE 0 END)::BIGINT AS d1,
        |    sum(CASE WHEN g = '0' THEN m ELSE 0 END)::BIGINT AS m1,
        |    sum(CASE WHEN g <> '0' THEN d ELSE 0 END)::BIGINT AS d2,
        |    sum(CASE WHEN g <> '0' THEN m ELSE 0 END)::BIGINT AS m2
        |  FROM cells GROUP BY 1),
        |risks AS (SELECT *,
        |    ((SELECT sum(m1) FROM wide) - coalesce(sum(m1)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), 0))::BIGINT AS n1,
        |    ((SELECT sum(m2) FROM wide) - coalesce(sum(m2)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), 0))::BIGINT AS n2
        |  FROM wide),
        |terms AS (SELECT d1, (d1 + d2) AS dd, (n1 + n2) AS n, n1, n2
        |  FROM risks WHERE d1 + d2 > 0),
        |acc AS (SELECT sum(d1)::BIGINT AS oa,
        |    sum(dd::DOUBLE * n1 / n) AS ea,
        |    sum(CASE WHEN n > 1 THEN dd::DOUBLE * (n1::DOUBLE / n)
        |      * (n2::DOUBLE / n) * (n - dd)::DOUBLE / (n - 1)
        |      ELSE 0.0 END) AS v
        |  FROM terms)
        |SELECT '0' AS group_a, '1' AS group_b,
        |  (SELECT count(*) FROM d WHERE g = '0')::BIGINT AS n_a,
        |  (SELECT count(*) FROM d WHERE g <> '0')::BIGINT AS n_b,
        |  oa AS observed_a, round(ea, 6) + 0.0 AS expected_a,
        |  round(CASE WHEN v > 0 THEN (oa - ea) * (oa - ea) / v
        |    ELSE 0.0 END, 6) + 0.0 AS chi2
        |FROM acc""".stripMargin,

    "q195_survival" ->
      """WITH tt AS (SELECT user_id, min(epoch_us(ts)) AS t0,
        |    min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
        |      AS tp,
        |    max(epoch_us(ts)) AS tmax
        |  FROM events GROUP BY 1),
        |d AS (SELECT CASE WHEN tp IS NOT NULL THEN tp - t0
        |      ELSE tmax - t0 END AS dur,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs FROM tt),
        |b AS (SELECT (dur // 3600000000)::BIGINT AS t, obs FROM d
        |      WHERE dur >= 0),
        |g AS (SELECT t,
        |    sum(CASE WHEN obs = 1 THEN 1 ELSE 0 END)::BIGINT AS n_events,
        |    sum(CASE WHEN obs = 1 THEN 0 ELSE 1 END)::BIGINT
        |      AS n_censored,
        |    count(*)::BIGINT AS n_at FROM b GROUP BY 1),
        |r AS (SELECT *, ((SELECT sum(n_at) FROM g)
        |    - coalesce(sum(n_at) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |    ::BIGINT AS n_risk FROM g),
        |s AS (SELECT *,
        |    CASE WHEN sum(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
        |        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) > 0 THEN 0.0
        |    ELSE exp(sum(CASE WHEN n_events < n_risk
        |        THEN ln(1 - n_events::DOUBLE / n_risk) ELSE 0.0 END)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END
        |      AS survival,
        |    sum(n_events::DOUBLE / n_risk)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_hazard,
        |    sum(CASE WHEN n_events < n_risk THEN n_events::DOUBLE
        |        / (n_risk::DOUBLE * (n_risk - n_events)) ELSE 0.0 END)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS gw
        |  FROM r)
        |SELECT t, n_risk, n_events, n_censored,
        |  round(survival, 6) + 0.0 AS survival,
        |  round(n_events::DOUBLE / n_risk, 6) + 0.0 AS hazard,
        |  round(cum_hazard, 6) + 0.0 AS cum_hazard,
        |  round(greatest(survival - 1.96 * survival * sqrt(gw), 0.0), 6)
        |    + 0.0 AS survival_lo,
        |  round(least(survival + 1.96 * survival * sqrt(gw), 1.0), 6)
        |    + 0.0 AS survival_hi
        |FROM s WHERE n_events > 0""".stripMargin,

    "q193_dedup_stored" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) NOT IN
        |  (SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |   FROM documents WHERE doc_id >= 250)""".stripMargin,

    "q192_negative_sampling" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
        |a AS (SELECT vec_id AS anchor_id FROM embeddings
        |      WHERE vec_id < 100),
        |js AS (SELECT unnest(range(0, 4)) AS j),
        |d AS (SELECT anchor_id, j::BIGINT AS j,
        |    CAST(('0x' || substring(md5(anchor_id::VARCHAR || ':' ||
        |      j::VARCHAR), 1, 13)) AS BIGINT) % n.n AS raw, n.n AS n
        |  FROM a, js, n)
        |SELECT anchor_id, j,
        |  CASE WHEN raw = anchor_id THEN (raw + 1) % n ELSE raw END
        |    AS neg_id
        |FROM d""".stripMargin,

    "q191_ivf_stored" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS iid, embedding::DOUBLE[] AS ie FROM embeddings),
        |sims AS (
        |  SELECT qid, iid,
        |    list_dot_product(qe, ie) /
        |      (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ie, ie))) AS s
        |  FROM q, c WHERE iid <> qid),
        |top AS (
        |  SELECT qid, iid, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, iid) AS rn
        |  FROM sims),
        |sel AS (SELECT qid, iid, s FROM top WHERE rn <= 10)
        |SELECT qid AS query_id, iid AS item_id,
        |  round(s, 6) + 0.0 AS cosine,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY round(s, 6) DESC, iid) AS rank
        |FROM sel""".stripMargin,

    "q186_embed_cov" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM embeddings),
        |u AS (SELECT vec_id, unnest(e) AS x, unnest(range(len(e))) AS i
        |  FROM e)
        |SELECT a.i::BIGINT AS i, b.i::BIGINT AS j,
        |  round(covar_samp(a.x, b.x), 6) + 0.0 AS cov
        |FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2""".stripMargin,

    // trace identity: sum(eigenvalues of sample cov) == sum of
    // per-dimension var_samp — the eigensolve-free twin of q187
    "q187_pca_variance" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM embeddings),
        |u AS (SELECT vec_id, unnest(e) AS x, unnest(range(len(e))) AS i
        |  FROM e),
        |v AS (SELECT i, var_samp(x) AS vv FROM u GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_components,
        |  round(sum(vv), 4) + 0.0 AS total_variance,
        |  1.0 AS final_cum_ratio
        |FROM v""".stripMargin,

    "q178_blocklist" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '),
        |      x -> length(x) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
        |  len(list_filter(toks,
        |    x -> x IN ('spark', 'window')))::BIGINT AS n_flagged,
        |  round(CASE WHEN len(toks) > 0
        |    THEN len(list_filter(toks,
        |      x -> x IN ('spark', 'window')))::DOUBLE / len(toks)
        |    ELSE 0.0 END, 6) + 0.0 AS flagged_ratio,
        |  (CASE WHEN len(toks) > 0
        |    THEN len(list_filter(toks,
        |      x -> x IN ('spark', 'window')))::DOUBLE / len(toks)
        |    ELSE 0.0 END) <= 0.02 AS passed
        |FROM t""".stripMargin,

    "q179_domain_stats" ->
      """WITH d AS (SELECT doc_id,
        |    text || ' see http://site' || (doc_id % 7) ||
        |    '.example/page' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' and https://Mirror' || (doc_id % 7) ||
        |           '.example/x'
        |      ELSE '' END AS text
        |  FROM documents),
        |h AS (SELECT doc_id, lower(unnest(regexp_extract_all(
        |    text, 'https?://([^/\s]+)', 1))) AS domain FROM d)
        |SELECT domain, count(*)::BIGINT AS n_urls,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM h GROUP BY 1""".stripMargin,

    "q176_length_buckets" ->
      """WITH b AS (SELECT
        |    CASE WHEN n_chars <= 128 THEN 128
        |         WHEN n_chars <= 256 THEN 256
        |         ELSE 512 END AS bucket_len,
        |    least(n_chars, 512) AS l
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT bucket_len, count(*)::BIGINT AS n_seqs,
        |  sum(l)::BIGINT AS sum_len,
        |  (count(*) * bucket_len)::BIGINT AS padded_tokens,
        |  round((count(*) * bucket_len - sum(l))::DOUBLE /
        |    (count(*) * bucket_len), 6) + 0.0 AS waste_frac
        |FROM b GROUP BY 1""".stripMargin,

    "q177_interleave" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
        |        1, 13)) AS BIGINT) ASC, doc_id ASC) AS interleave_rank
        |  FROM documents WHERE source IS NOT NULL)
        |SELECT doc_id, source, interleave_rank FROM r
        |ORDER BY interleave_rank, source, doc_id LIMIT 100"""
        .stripMargin,

    "q173_join_estimate" ->
      """WITH lc AS (SELECT o_orderkey AS k, count(*) AS nl
        |  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |rc AS (SELECT l_orderkey AS k, count(*) AS nr
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
        |j AS (SELECT lc.nl, rc.nr FROM lc FULL OUTER JOIN rc
        |  ON lc.k = rc.k)
        |SELECT coalesce(sum(nl), 0)::BIGINT AS n_left,
        |  coalesce(sum(nr), 0)::BIGINT AS n_right,
        |  count(CASE WHEN nl IS NOT NULL THEN 1 END)::BIGINT
        |    AS n_left_keys,
        |  count(CASE WHEN nr IS NOT NULL THEN 1 END)::BIGINT
        |    AS n_right_keys,
        |  count(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL THEN 1
        |    END)::BIGINT AS n_matched_keys,
        |  coalesce(sum(nl * nr), 0)::BIGINT AS join_rows
        |FROM j""".stripMargin,

    "q174_ref_integrity" ->
      """WITH p AS (SELECT DISTINCT s_suppkey FROM supplier
        |  WHERE s_suppkey % 5 <> 0 AND s_suppkey IS NOT NULL),
        |c AS (SELECT l_suppkey FROM lineitem
        |  WHERE l_suppkey IS NOT NULL)
        |SELECT count(*)::BIGINT AS n_child,
        |  sum(CASE WHEN p.s_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_orphans,
        |  (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL)
        |    ::BIGINT AS n_null_keys,
        |  round(sum(CASE WHEN p.s_suppkey IS NULL THEN 1 ELSE 0
        |    END)::DOUBLE / count(*), 6) + 0.0 AS orphan_frac
        |FROM c LEFT JOIN p ON c.l_suppkey = p.s_suppkey"""
        .stripMargin,

    "q175_uniqueness" ->
      """WITH k AS (SELECT l_orderkey, count(*) AS c FROM lineitem
        |  WHERE l_orderkey IS NOT NULL GROUP BY 1)
        |SELECT coalesce(sum(c), 0)::BIGINT AS n_rows,
        |  count(*)::BIGINT AS n_keys,
        |  sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dupe_keys,
        |  coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
        |    ::BIGINT AS n_dupe_rows,
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
        |    ::BIGINT AS n_null_rows,
        |  round(coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END),
        |    0)::DOUBLE / sum(c), 6) + 0.0 AS dupe_frac
        |FROM k""".stripMargin,

    "q170_basket_pairs" ->
      """WITH p AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i
        |  FROM lineitem),
        |nb AS (SELECT count(DISTINCT b)::DOUBLE AS n FROM p),
        |ic AS (SELECT i, count(*) AS ni FROM p GROUP BY 1),
        |pr AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
        |  FROM p a JOIN p b ON a.b = b.b AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pr.item_a, pr.item_b, pr.n_ab,
        |  ia.ni AS n_a, ib.ni AS n_b,
        |  round(pr.n_ab / nb.n, 6) + 0.0 AS support,
        |  round(pr.n_ab::DOUBLE / ia.ni, 6) + 0.0 AS confidence,
        |  round(pr.n_ab * nb.n / (ia.ni * ib.ni), 6) + 0.0 AS lift
        |FROM pr JOIN ic ia ON ia.i = pr.item_a
        |JOIN ic ib ON ib.i = pr.item_b CROSS JOIN nb""".stripMargin,

    "q171_calibration" ->
      """WITH s AS (SELECT (vec_id % 97)::DOUBLE / 96.0 AS sc,
        |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
        |  FROM embeddings),
        |b AS (SELECT least(floor(least(greatest(sc, 0), 1) * 10),
        |    9)::BIGINT AS bin,
        |    least(greatest(sc, 0), 1) AS sc, y FROM s)
        |SELECT bin, count(*) AS n,
        |  round(avg(sc), 6) + 0.0 AS mean_score,
        |  round(avg(y), 6) + 0.0 AS frac_pos,
        |  round(abs(avg(sc) - avg(y)), 6) + 0.0 AS gap
        |FROM b GROUP BY 1""".stripMargin,

    "q172_auc" ->
      """WITH s AS (SELECT (vec_id % 97)::DOUBLE / 96.0 AS sc,
        |    label >= 5 AS y FROM embeddings),
        |r AS (SELECT sc, y, rank() OVER (ORDER BY sc) AS rk,
        |    count(*) OVER (PARTITION BY sc) AS t FROM s),
        |a AS (SELECT y, (2 * rk + t - 1)::DOUBLE / 2 AS ar FROM r)
        |SELECT
        |  sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |  sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n_neg,
        |  round((sum(CASE WHEN y THEN ar END) -
        |    sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE *
        |    (sum(CASE WHEN y THEN 1 ELSE 0 END) + 1) / 2) /
        |    (sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE *
        |     sum(CASE WHEN y THEN 0 ELSE 1 END)), 6) + 0.0 AS auc
        |FROM a""".stripMargin,

    "q169_bloom_lookup" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey = 1988""".stripMargin,

    "q164_triangles" ->
      """WITH e AS (SELECT a.n_nationkey AS x, b.n_nationkey AS y
        |  FROM nation a JOIN nation b
        |    ON a.n_regionkey = b.n_regionkey
        |   AND a.n_nationkey < b.n_nationkey),
        |deg AS (SELECT node, count(*) AS d FROM (
        |  SELECT x AS node FROM e UNION ALL SELECT y AS node FROM e)
        |  GROUP BY 1),
        |tri AS (SELECT count(*) AS t FROM e e1
        |  JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
        |  JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT sum(d * (d - 1) / 2)::BIGINT FROM deg) AS n_wedges,
        |  (SELECT t FROM tri)::BIGINT AS n_triangles,
        |  round(3.0 * (SELECT t FROM tri) /
        |    (SELECT sum(d * (d - 1) / 2) FROM deg), 6) + 0.0
        |    AS global_clustering""".stripMargin,

    "q165_degrees" ->
      """WITH e AS (SELECT DISTINCT 'c:' || o_custkey AS src,
        |    's:' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |outd AS (SELECT src AS node, count(*) AS out_deg
        |  FROM e GROUP BY 1),
        |ind AS (SELECT dst AS node, count(*) AS in_deg
        |  FROM e GROUP BY 1),
        |und AS (SELECT node, count(*) AS deg FROM (
        |  SELECT DISTINCT src AS node, dst AS nbr FROM e
        |  UNION SELECT DISTINCT dst AS node, src AS nbr FROM e)
        |  GROUP BY 1)
        |SELECT und.node, coalesce(outd.out_deg, 0) AS out_deg,
        |  coalesce(ind.in_deg, 0) AS in_deg, und.deg
        |FROM und LEFT JOIN outd USING (node)
        |LEFT JOIN ind USING (node)""".stripMargin,

    "q166_streaming_trending" ->
      """WITH e AS (SELECT
        |    (epoch_us(ts) // 14400000000) * 14400000000 AS bucket_start,
        |    event_type AS item
        |  FROM events WHERE event_type IS NOT NULL),
        |cells AS (SELECT bucket_start, item, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT bucket_start, item, n,
        |    row_number() OVER (PARTITION BY bucket_start
        |      ORDER BY n DESC, item) AS rank
        |  FROM cells)
        |SELECT bucket_start, item, n, rank FROM r WHERE rank <= 3"""
        .stripMargin,

    "q156_fuzzy_join" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name
        |  FROM customer WHERE c_custkey <= 400),
        |p AS (SELECT id + 100000 AS id,
        |  CASE WHEN id % 3 = 0
        |    THEN substr(name, 1, length(name) - 1) || 'X'
        |    ELSE name END AS name FROM c)
        |SELECT c.id AS left_id, c.name AS left_key,
        |  p.id AS right_id, p.name AS right_key,
        |  levenshtein(c.name, p.name)::BIGINT AS dist
        |FROM c, p WHERE levenshtein(c.name, p.name) <= 1"""
        .stripMargin,

    "q157_trending" ->
      """WITH e AS (SELECT
        |    (epoch_us(ts) // 14400000000) * 14400000000 AS bucket_start,
        |    event_type AS item
        |  FROM events WHERE event_type IS NOT NULL),
        |cells AS (SELECT bucket_start, item, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT bucket_start, item, n,
        |    row_number() OVER (PARTITION BY bucket_start
        |      ORDER BY n DESC, item) AS rank
        |  FROM cells)
        |SELECT bucket_start, item, n, rank FROM r WHERE rank <= 3"""
        .stripMargin,

    "q158_attribution" ->
      // the events fixture has no (user_id, ts) duplicates (verified),
      // so plain-t min_by/max_by is total here; the engine's tie
      // column is exercised by the sbt spec instead
      """WITH e AS (SELECT user_id AS key, epoch_us(ts) AS t,
        |    event_type AS ty, event_id AS tie FROM events),
        |tagged AS (SELECT key, t, ty, tie,
        |  min(CASE WHEN ty IN ('view', 'click') THEN t END) OVER w
        |    AS first_touch_t,
        |  min_by(CASE WHEN ty IN ('view', 'click') THEN ty END,
        |    CASE WHEN ty IN ('view', 'click') THEN t END) OVER w
        |    AS first_touch_type,
        |  max(CASE WHEN ty IN ('view', 'click') THEN t END) OVER w
        |    AS last_touch_t,
        |  max_by(CASE WHEN ty IN ('view', 'click') THEN ty END,
        |    CASE WHEN ty IN ('view', 'click') THEN t END) OVER w
        |    AS last_touch_type
        |  FROM e
        |  WINDOW w AS (PARTITION BY key ORDER BY t
        |    RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING))
        |SELECT key, t AS conv_t, tie AS conv_tie,
        |  first_touch_type, first_touch_t,
        |  last_touch_type, last_touch_t
        |FROM tagged WHERE ty = 'purchase'""".stripMargin,

    "q159_label_prop" ->
      // disjoint per-region cliques: the self-vote LPA fixed point is
      // each clique's minimum member (reached at iteration 1; the
      // Spark side runs 3 to prove stability)
      """SELECT n_nationkey::BIGINT AS node,
        |  min(n_nationkey) OVER (PARTITION BY n_regionkey)::BIGINT
        |    AS label
        |FROM nation""".stripMargin,

    "q154_rolling_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS t,
        |  count(*) OVER w AS n_window,
        |  round(sum(coalesce(value, 0)) OVER w, 6) + 0.0 AS sum_window,
        |  round((sum(coalesce(value, 0)) OVER w) /
        |    (count(*) OVER w), 6) + 0.0 AS mean_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        .stripMargin,

    "q155_streaming_scores" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        |m AS (SELECT user_id, max(t) AS mt FROM e GROUP BY 1)
        |SELECT e.user_id,
        |  round(sum(coalesce(value, 0)
        |    * power(2.0, (t - mt) / 3600000000.0)), 6) + 0.0
        |    AS ewma_score,
        |  count(*) AS n_events, max(t) AS last_t
        |FROM e JOIN m ON e.user_id = m.user_id
        |GROUP BY e.user_id, mt""".stripMargin,

    "q139_shard_layout" ->
      """SELECT CAST(hv % 8 AS INT) AS shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM (SELECT n_chars,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM documents)
        |GROUP BY 1""".stripMargin,

    "q123_random_projection" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM embeddings WHERE vec_id < 100),
        |k AS (SELECT unnest(range(8)) AS k)
        |SELECT vec_id, k::BIGINT AS k,
        |  round(list_sum(list_transform(range(len(e)),
        |    j -> e[j + 1] * CASE WHEN
        |      ((((j * 1000003 + k) % 1000000007) * 2654435761)
        |        % 1000000007) % 2 = 0 THEN 1 ELSE -1 END))
        |    / sqrt(8.0), 6) + 0.0 AS v
        |FROM e, k""".stripMargin,

    "q124_corpus_diversity" ->
      """WITH l AS (SELECT doc_id, source, string_split(text, ' ') AS l
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, source,
        |    array_to_string(l[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, source, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i FROM l))
        |SELECT source,
        |  count(DISTINCT g)::BIGINT AS n_distinct,
        |  count(*)::BIGINT AS n_grams,
        |  round(count(DISTINCT g)::DOUBLE / count(*), 6) AS diversity
        |FROM g GROUP BY 1""".stripMargin,

    "q125_trained_classifier" ->
      """WITH d AS (SELECT doc_id, text,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents WHERE doc_id < 500),
        |tok AS (SELECT doc_id, y, unnest(list_filter(
        |    string_split(lower(text), ' '), t -> len(t) > 0)) AS t
        |  FROM d),
        |nt AS (SELECT doc_id, count(*)::DOUBLE AS nt FROM tok
        |  GROUP BY 1),
        |h AS (SELECT tok.doc_id AS doc_id, y, nt, list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(regexp_split_to_array(t, ''),
        |        c -> unicode(c)::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 4096 AS b
        |  FROM tok JOIN nt ON tok.doc_id = nt.doc_id),
        |w AS (SELECT b,
        |    -(1.0 / (SELECT count(*) FROM d)) * sum((0.5 - y) / nt) AS w
        |  FROM h GROUP BY 1),
        |s AS (SELECT h.doc_id AS doc_id, sum(w.w) / count(*) AS logit
        |  FROM h JOIN w ON h.b = w.b GROUP BY 1)
        |SELECT doc_id, round(logit, 6) + 0.0 AS logit,
        |  round(1.0 / (1.0 + exp(-logit)), 6) AS score
        |FROM s""".stripMargin,

    "q126_minhash_invariant" ->
      """SELECT doc_id, doc_id + 100000 AS dup_id, 1.0 AS est_jaccard
        |FROM documents WHERE doc_id < 50 AND text IS NOT NULL""".stripMargin,

    "q127_simhash_invariant" ->
      """SELECT count(*) AS n_pairs, count(*) AS n_identical
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "q84_semdedup" ->
      """SELECT vec_id, label FROM embeddings""",

    "q92_embedding_neardups" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |dup AS (SELECT vec_id + 10000 AS vec_id,
        |  list_transform(e, (x, i) -> CASE WHEN i = 1 THEN x + 0.1 ELSE x END) AS e
        |  FROM base WHERE vec_id < 50),
        |v AS (SELECT * FROM base UNION ALL SELECT * FROM dup),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.e, b.e) /
        |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c, 6) AS cosine FROM p WHERE c >= 0.95""".stripMargin,

    "q90_minhash_lsh" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 200 AND text IS NOT NULL),
        |tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '),
        |      t -> len(t) > 0) AS wa,
        |    list_filter(string_split(
        |        lower(text || ' graftnoisea graftnoiseb'), ' '),
        |      t -> len(t) > 0) AS wb
        |  FROM base),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(wa) >= 2 THEN
        |      list_distinct(list_transform(range(1, len(wa)),
        |        i -> wa[i] || ' ' || wa[i + 1]))
        |    ELSE [array_to_string(wa, ' ')] END AS sa,
        |    CASE WHEN len(wb) >= 2 THEN
        |      list_distinct(list_transform(range(1, len(wb)),
        |        i -> wb[i] || ' ' || wb[i + 1]))
        |    ELSE [array_to_string(wb, ' ')] END AS sb
        |  FROM tok)
        |SELECT doc_id AS id_a, doc_id + 200000 AS id_b,
        |  round(len(list_intersect(sa, sb))::DOUBLE /
        |        len(list_distinct(sa || sb)), 4) AS jaccard
        |FROM sh WHERE len(sa) >= 30""".stripMargin,

    "q91_simhash" ->
      """SELECT doc_id, doc_id + 300000 AS dup_id, 0 AS hamming
        |FROM documents WHERE doc_id < 60 AND text IS NOT NULL""".stripMargin,

    "q93_ivf_ann" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |              FROM embeddings),
        |cop AS (
        |  SELECT vec_id + 10000 * g AS vec_id,
        |    list_transform(e, (x, i) ->
        |      CASE WHEN i = 1 THEN x + 0.01 * g ELSE x END) AS e
        |  FROM base, (SELECT unnest([1, 2, 3]) AS g) WHERE vec_id < 10),
        |v AS (SELECT * FROM base UNION ALL SELECT * FROM cop),
        |q AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < 10),
        |sims AS (
        |  SELECT qid, v.vec_id AS iid,
        |    list_dot_product(qe, e) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(e, e))) AS s
        |  FROM q, v WHERE v.vec_id <> qid),
        |top AS (
        |  SELECT qid, iid, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, iid) AS rn
        |  FROM sims),
        |sel AS (SELECT qid, iid, s FROM top WHERE rn <= 3)
        |SELECT qid AS query_id, iid AS item_id,
        |  round(s, 6) + 0.0 AS cosine,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY round(s, 6) DESC, iid) AS rank
        |FROM sel""".stripMargin,

    "q98_ivfpq_ann" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e
        |              FROM embeddings),
        |cop AS (
        |  SELECT vec_id + 10000 * g AS vec_id,
        |    list_transform(e, (x, i) ->
        |      CASE WHEN i = 1 THEN x + 0.01 * g ELSE x END) AS e
        |  FROM base, (SELECT unnest([1, 2, 3]) AS g) WHERE vec_id < 10),
        |v AS (SELECT * FROM base UNION ALL SELECT * FROM cop),
        |q AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < 10),
        |sims AS (
        |  SELECT qid, v.vec_id AS iid,
        |    list_dot_product(qe, e) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(e, e))) AS s
        |  FROM q, v WHERE v.vec_id <> qid),
        |top AS (
        |  SELECT qid, iid, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, iid) AS rn
        |  FROM sims),
        |sel AS (SELECT qid, iid, s FROM top WHERE rn <= 3)
        |SELECT qid AS query_id, iid AS item_id,
        |  round(s, 6) + 0.0 AS cosine,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY round(s, 6) DESC, iid) AS rank
        |FROM sel""".stripMargin,

    "q94_kll_grid_large" ->
      """WITH f AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS REAL) AS v
        |  FROM lineitem WHERE l_orderkey % 293 = 0),
        |r AS (
        |  SELECT l_returnflag, v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM f),
        |g AS (SELECT * FROM (VALUES (0, 0.0), (1, 0.01), (2, 0.05), (3, 0.25),
        |  (4, 0.5), (5, 0.75), (6, 0.95), (7, 0.99), (8, 1.0)) t(pos, p))
        |SELECT l_returnflag, pos,
        |  round(min(v) FILTER (WHERE rn >= ceil(p * cnt))::DOUBLE, 2) AS quantile
        |FROM r, g GROUP BY 1, 2""".stripMargin,

    "q95_rolling_hash" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(0::BIGINT,
        |    list_transform(
        |      regexp_split_to_array(
        |        regexp_replace(lower(text), '\s+', ' ', 'g'), ''),
        |      c -> unicode(c)::BIGINT)),
        |  (acc, c) -> (acc * 31 + c) % 1000000007) AS rh
        |FROM documents""".stripMargin,

    "q99_feature_scale" ->
      """WITH d AS (SELECT doc_id, lang, n_chars::DOUBLE AS x FROM documents),
        |s AS (SELECT lang, avg(x) AS mu, stddev_samp(x) AS sd,
        |         min(x) AS lo, max(x) AS hi
        |       FROM d GROUP BY 1)
        |SELECT doc_id, d.lang AS lang,
        |  round(CASE WHEN sd IS NOT NULL AND sd > 0 THEN (x - mu) / sd
        |        ELSE 0.0 END, 6) + 0.0 AS z,
        |  round(CASE WHEN hi > lo THEN (x - lo) / (hi - lo)
        |        ELSE 0.0 END, 6) AS mm
        |FROM d JOIN s ON d.lang = s.lang""".stripMargin,

    "q145_zorder_key" -> {
      // bit b of column j lands at position b*2+j -> multiplier 4^b
      // for column 1, 2*4^b for column 2 (unrolled, bits=8)
      val terms = (0 until 8).flatMap { b =>
        val m = 1L << (2 * b)
        Seq(s"((b1 >> $b) & 1) * $m", s"((b2 >> $b) & 1) * ${2 * m}")
      }.mkString(" + ")
      s"""WITH s AS (SELECT min(l_extendedprice) AS lo1,
         |    max(l_extendedprice) AS hi1,
         |    min(l_quantity) AS lo2, max(l_quantity) AS hi2
         |  FROM lineitem),
         |b AS (SELECT l_orderkey, l_linenumber,
         |    least(255, CAST(floor((l_extendedprice - lo1) * 256.0
         |      / (hi1 - lo1)) AS BIGINT)) AS b1,
         |    least(255, CAST(floor((l_quantity - lo2) * 256.0
         |      / (hi2 - lo2)) AS BIGINT)) AS b2
         |  FROM lineitem, s)
         |SELECT l_orderkey, l_linenumber, $terms AS zkey
         |FROM b""".stripMargin
    },

    "q142_percentile_rank" ->
      """SELECT g, v, round(pr, 9) + 0.0 AS pct_rank FROM (
        |  SELECT DISTINCT l_returnflag AS g, l_extendedprice AS v,
        |    cume_dist() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS pr
        |  FROM lineitem)""".stripMargin,

    "q107_metric_anomalies" ->
      """WITH m AS (SELECT CAST(date_trunc('day', l_shipdate) AS DATE)
        |      AS wk,
        |    avg(l_quantity) AS mq, avg(l_extendedprice) AS mp
        |  FROM lineitem GROUP BY 1),
        |e AS (SELECT wk, 'l_quantity' AS col_name, mq AS m FROM m
        |  UNION ALL SELECT wk, 'l_extendedprice', mp FROM m),
        |s AS (SELECT col_name, avg(m) AS mu, stddev_samp(m) AS sd
        |  FROM e GROUP BY 1),
        |z AS (SELECT e.wk, e.col_name, e.m,
        |    CASE WHEN sd IS NOT NULL AND sd > 0 THEN (e.m - mu) / sd
        |      ELSE 0.0 END AS zv
        |  FROM e JOIN s ON e.col_name = s.col_name)
        |SELECT wk, col_name, round(zv, 2) + 0.0 AS z,
        |  CAST(abs(zv) >= 2.5 AS INT) AS anom
        |FROM z""".stripMargin,

    "q106_weighted_bottomk" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS hv
        |  FROM documents),
        |s AS (SELECT doc_id, lang, n_chars,
        |    ln((hv + 1) / 4503599627370496.0) / n_chars AS score
        |  FROM h WHERE n_chars > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY score DESC, doc_id ASC) AS rn FROM s)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 10""".stripMargin,

    "q105_remove_spans" ->
      """WITH d AS (SELECT doc_id,
        |    trim(CASE WHEN doc_id % 20 = 0 THEN text ||
        |      ' this boilerplate sentence repeats verbatim across many documents here'
        |    ELSE text END) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM d),
        |w AS (SELECT doc_id, i - 1 AS pos,
        |    array_to_string(l[i:i+7], ' ') AS span
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, greatest(len(l) - 6, 1))) AS i FROM l)),
        |dup AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM w)
        |  GROUP BY span HAVING count(*) >= 3),
        |u AS (SELECT doc_id, l[i] AS t, i - 1 AS idx
        |  FROM (SELECT doc_id, l,
        |      unnest(range(1, len(l) + 1)) AS i FROM l)),
        |cov AS (SELECT DISTINCT w.doc_id, u.idx
        |  FROM w JOIN dup USING (span)
        |  JOIN u ON u.doc_id = w.doc_id
        |    AND u.idx BETWEEN w.pos AND w.pos + 7),
        |kept AS (SELECT u.doc_id, u.t, u.idx FROM u LEFT JOIN cov
        |  ON u.doc_id = cov.doc_id AND u.idx = cov.idx
        |  WHERE cov.idx IS NULL),
        |k AS (SELECT doc_id, string_agg(t, ' ' ORDER BY idx) AS text,
        |    count(*) AS n FROM kept GROUP BY 1)
        |SELECT d.doc_id, coalesce(k.text, '') AS text,
        |  CAST(len(l.l) - coalesce(k.n, 0) AS INT) AS n_removed
        |FROM d JOIN l ON d.doc_id = l.doc_id
        |LEFT JOIN k ON d.doc_id = k.doc_id""".stripMargin,

    "q104_linear_score" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '),
        |    t -> len(t) > 0)) AS t
        |  FROM documents),
        |h AS (SELECT doc_id, list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(regexp_split_to_array(t, ''),
        |        c -> unicode(c)::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS th
        |  FROM toks),
        |w AS (SELECT doc_id,
        |    ((th % 4096) * 2654435761) % 1000000007 / 1000000007.0 - 0.5
        |      AS wt
        |  FROM h),
        |s AS (SELECT doc_id, sum(wt) / count(*) AS logit FROM w GROUP BY 1)
        |SELECT doc_id, round(logit, 6) + 0.0 AS logit,
        |  round(1.0 / (1.0 + exp(-logit)), 6) AS score
        |FROM s""".stripMargin,

    "q102_drift_autoedges" ->
      """WITH s AS (SELECT CASE WHEN s_nationkey < 12 THEN 'old'
        |    ELSE 'new' END AS cohort, CAST(s_acctbal AS REAL) AS v
        |  FROM supplier),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
        |    count(*) OVER () AS cnt FROM s WHERE cohort = 'old'),
        |q AS (SELECT
        |    min(v) FILTER (WHERE rn >= ceil(0.25 * cnt)) AS e1,
        |    min(v) FILTER (WHERE rn >= ceil(0.5 * cnt)) AS e2,
        |    min(v) FILTER (WHERE rn >= ceil(0.75 * cnt)) AS e3 FROM o),
        |c AS (SELECT cohort, count(*) AS n,
        |    count(*) FILTER (WHERE v <= e1) AS r1,
        |    count(*) FILTER (WHERE v <= e2) AS r2,
        |    count(*) FILTER (WHERE v <= e3) AS r3
        |  FROM s, q GROUP BY 1),
        |p AS (SELECT cohort, n,
        |  greatest(r1 / n::DOUBLE, 1e-6) AS p0,
        |  greatest(r2 / n::DOUBLE - r1 / n::DOUBLE, 1e-6) AS p1,
        |  greatest(r3 / n::DOUBLE - r2 / n::DOUBLE, 1e-6) AS p2,
        |  greatest(1.0 - r3 / n::DOUBLE, 1e-6) AS p3
        |  FROM c)
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round((a.p0 - b.p0) * ln(a.p0 / b.p0)
        |      + (a.p1 - b.p1) * ln(a.p1 / b.p1)
        |      + (a.p2 - b.p2) * ln(a.p2 / b.p2)
        |      + (a.p3 - b.p3) * ln(a.p3 / b.p3), 6) + 0.0 AS psi
        |FROM p a, p b WHERE a.cohort = 'old' AND b.cohort = 'new'""".stripMargin,

    "q103_robust_scale" ->
      """WITH r AS (SELECT s_suppkey, s_nationkey,
        |    CAST(s_acctbal AS REAL) AS v, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY CAST(s_acctbal AS REAL)) AS rn,
        |    count(*) OVER (PARTITION BY s_nationkey) AS cnt
        |  FROM supplier),
        |f AS (SELECT s_nationkey,
        |    min(v) FILTER (WHERE rn >= ceil(0.25 * cnt)) AS q1,
        |    min(v) FILTER (WHERE rn >= ceil(0.5 * cnt)) AS q2,
        |    min(v) FILTER (WHERE rn >= ceil(0.75 * cnt)) AS q3
        |  FROM r GROUP BY 1)
        |SELECT s_suppkey, r.s_nationkey AS s_nationkey,
        |  round(CASE WHEN q3 > q1
        |    THEN (s_acctbal - q2) / (q3::DOUBLE - q1::DOUBLE)
        |    ELSE 0.0 END, 6) + 0.0 AS acctbal_r
        |FROM r JOIN f ON r.s_nationkey = f.s_nationkey""".stripMargin,

    "q101_validate" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS n,
        |    min(l_quantity) AS mn, max(l_quantity) AS mx,
        |    avg(l_quantity) AS mean, stddev_samp(l_quantity) AS sd,
        |    count(DISTINCT l_quantity) AS nd
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'min_at_least' AS check_name,
        |  'l_quantity' AS col_name, round(mn, 6) AS observed,
        |  CAST(mn >= 1.0 AS INT) AS passed FROM g
        |UNION ALL SELECT l_returnflag, 'max_at_most', 'l_quantity',
        |  round(mx, 6), CAST(mx <= 50.0 AS INT) FROM g
        |UNION ALL SELECT l_returnflag, 'mean_between', 'l_quantity',
        |  round(mean, 6), CAST(mean BETWEEN 20.0 AND 30.0 AS INT) FROM g
        |UNION ALL SELECT l_returnflag, 'null_fraction_at_most',
        |  'l_quantity', 0.0, 1 FROM g
        |UNION ALL SELECT l_returnflag, 'distinct_between', 'l_quantity',
        |  round(nd, 6), CAST(nd BETWEEN 40 AND 60 AS INT) FROM g
        |UNION ALL SELECT l_returnflag, 'type_is', 'l_quantity',
        |  1.0, 1 FROM g
        |UNION ALL SELECT l_returnflag, 'stddev_between', 'l_quantity',
        |  round(sd, 6), CAST(sd BETWEEN 10.0 AND 20.0 AS INT) FROM g
        |UNION ALL SELECT l_returnflag, 'unique_ratio_between',
        |  'l_quantity', round(nd / n::DOUBLE, 6),
        |  CAST(nd / n::DOUBLE BETWEEN 0.0 AND 0.1 AS INT) FROM g""".stripMargin,

    "q100_winsorize" ->
      """WITH r AS (SELECT s_suppkey, s_nationkey, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS rn,
        |    count(*) OVER (PARTITION BY s_nationkey) AS cnt
        |  FROM supplier),
        |f AS (SELECT s_nationkey,
        |    min(s_acctbal) FILTER (WHERE rn >= ceil(0.1 * cnt)) AS lo,
        |    min(s_acctbal) FILTER (WHERE rn >= ceil(0.9 * cnt)) AS hi
        |  FROM r GROUP BY 1)
        |SELECT s_suppkey, r.s_nationkey AS s_nationkey,
        |  round(least(greatest(s_acctbal, lo), hi), 2) AS acctbal_w
        |FROM r JOIN f ON r.s_nationkey = f.s_nationkey""".stripMargin,

    "q96_corpus_store" ->
      """WITH st AS (SELECT doc_id, length(text) AS n_chars FROM documents)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(st.n_chars) AS BIGINT) AS n_chars
        |FROM documents d JOIN st ON d.doc_id = st.doc_id
        |GROUP BY 1""".stripMargin,

    "q46_multimodal_stub" ->
      """WITH dec AS (
        |  SELECT doc_id,
        |    strlen(text)::BIGINT AS blob_bytes,
        |    64 + (strlen(text) % 512) AS w0,
        |    64 + ((strlen(text) * 7) % 512) AS h0,
        |    sha256(text) AS content_id
        |  FROM documents),
        |scaled AS (
        |  SELECT *, CASE WHEN greatest(w0, h0) > 256
        |                 THEN 256.0::DOUBLE / greatest(w0, h0)
        |                 ELSE 1.0::DOUBLE END AS sc
        |  FROM dec)
        |SELECT doc_id, blob_bytes,
        |  floor(w0 * sc)::INT AS width,
        |  floor(h0 * sc)::INT AS height,
        |  3::INT AS channels,
        |  content_id
        |FROM scaled""".stripMargin)
}
