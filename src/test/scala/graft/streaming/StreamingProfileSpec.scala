package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.profile.ProfileSession.ProfilingOps

/** Streaming smoke: the profile aggregate under Structured Streaming with
  * windows + watermark must converge to the same profile as a batch run
  * over the same rows, both through the in-flight state-store merge
  * (complete mode) and through the store-and-merge parquet sink.
  */
class StreamingProfileSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val batch1 = Seq(
    (ts(1, 1), "a", 10.0), (ts(1, 2), "a", 20.0), (ts(1, 3), "b", 5.0),
    (ts(2, 1), "a", 30.0), (ts(2, 2), "b", 7.0))
  private val batch2 = Seq(
    (ts(1, 4), "a", 40.0), (ts(2, 3), "b", 9.0), (ts(2, 4), "b", 11.0))

  test("streamed windowed profile equals the batch profile") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "key", "value")

    val profiles = StreamingProfile.windowedProfiles(
      streamDf, "ts", "1 day", "2 days", keys = Seq("key"))

    val q = profiles.writeStream
      .format("memory").queryName("prof_stream").outputMode("complete").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql(
      """SELECT key, CAST(window.start AS DATE) AS day,
        |  value.count AS n, value.numbers.sum AS s,
        |  value.numbers.min AS mn, value.numbers.max AS mx
        |FROM prof_stream""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    val batchDf = (batch1 ++ batch2).toDF("ts", "key", "value")
    val expected = batchDf.newProfilingSession()
      .groupBy("key").withTimeColumn("ts", "1 day").aggProfiles()
      .select(col("key"), col("window.start").cast("date").cast("string"),
        col("value.count"), col("value.numbers.sum"),
        col("value.numbers.min"), col("value.numbers.max"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    streamed shouldBe expected
    streamed.size shouldBe 4 // 2 keys x 2 days
  }

  test("validation report runs unchanged on a streaming profile frame") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "key", "value")
    val profiles = StreamingProfile.windowedProfiles(
      streamDf, "ts", "1 day", "2 days", keys = Seq("key"))

    // expectations evaluate per (key, window) as windows update — the
    // report is a pure projection + explode, so it composes with the
    // streaming aggregate with no extra stateful operator
    val rep = graft.ops.Validation.report(profiles, Seq(
      graft.ops.Validation.MinAtLeast("value", 0.0), // all fixture values > 0
      graft.ops.Validation.MaxAtMost("value", 15.0)), // fails for key a
      keep = Seq("key"))
    val q = rep.writeStream.format("memory").queryName("prof_checks")
      .outputMode("complete").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.sql(
      "SELECT key, check_name, passed FROM prof_checks").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    rows.length shouldBe 8 // 2 keys x 2 windows x 2 checks
    rows.filter(_._2 == "min_at_least").forall(_._3 == 1) shouldBe true
    // key a has values up to 40 -> max check fails on a's windows
    rows.filter(r => r._1 == "a" && r._2 == "max_at_most")
      .forall(_._3 == 0) shouldBe true
    rows.filter(r => r._1 == "b" && r._2 == "max_at_most")
      .forall(_._3 == 1) shouldBe true
  }

  test("store-and-merge sink: merged micro-batch profiles equal batch profile") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_store").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "key", "value")

    val q = StreamingProfile.perBatchProfileSink(
      streamDf, store, keys = Seq("key")).start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // the store holds one partial profile per (key x micro-batch); they
    // must merge to exactly the all-data batch answer
    val merged = StreamingProfile.mergeStored(spark, store, Seq("key"))
      .select(col("key"), col("value.count"), col("value.numbers.sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val expected = (batch1 ++ batch2).toDF("ts", "key", "value")
      .newProfilingSession().groupBy("key").aggProfiles()
      .select(col("key"), col("value.count"), col("value.numbers.sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    merged shouldBe expected
  }

  test("anomaly screen sink: per-trigger screen equals the batch op " +
    "over the accumulated store and flags a planted anomalous window") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val store = java.nio.file.Files
      .createTempDirectory("graft_screen_store").toString
    val screen = java.nio.file.Files
      .createTempDirectory("graft_screen_out").toString

    // six daily windows of tame means plus one wild day (day 7): the
    // wild window must flag once enough history has accumulated
    def day(d: Int, vs: Seq[Double]) = vs.map(v => (ts(d, 1), v))
    val early = (1 to 4).flatMap(d => day(d, Seq(9.0, 10.0, 11.0)))
    val late = (5 to 6).flatMap(d => day(d, Seq(10.0, 10.5, 9.5))) ++
      day(7, Seq(500.0, 510.0, 490.0))

    val input = MemoryStream[(Timestamp, Double)]
    val streamDf = input.toDF().toDF("ts", "value")
    val q = StreamingProfile.anomalyScreenSink(streamDf, store, screen,
      cols = Seq("value"), timeColumn = ("ts", "1 day"), threshold = 2.0)
      .start()
    try {
      input.addData(early)
      q.processAllAvailable()
      // the screen exists and covers the early windows after trigger 1
      spark.read.parquet(screen).count() shouldBe 4L
      input.addData(late)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(screen)
      .select(col("window.start").cast("date").cast("string").as("day"),
        col("column"), col("metric_mean"), col("z"), col("is_anomaly"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).sortBy(_._1)

    // the intended pattern: the in-flight screen is EXACTLY the batch
    // metricAnomalies over the merged accumulated store
    val merged = StreamingProfile.mergeStored(spark, store, Seq("window"))
    val expected = graft.ops.Drift.metricAnomalies(merged, Seq("value"),
      keep = Seq("window"), threshold = 2.0)
      .select(col("window.start").cast("date").cast("string").as("day"),
        col("column"), col("metric_mean"), col("z"), col("is_anomaly"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
    got shouldBe expected

    got.length shouldBe 7 // one row per day window
    // only the wild day flags; its z dominates
    got.filter(_._5).map(_._1) shouldBe Array("2024-01-07")
  }

  test("anomaly screen sink is idempotent under at-least-once batch " +
    "replay: re-invoking the foreachBatch body with the same batchId " +
    "leaves the store and screen unchanged") {
    import spark.implicits._

    val store = java.nio.file.Files
      .createTempDirectory("graft_replay_store").toString
    val screen = java.nio.file.Files
      .createTempDirectory("graft_replay_out").toString

    def day(d: Int, vs: Seq[Double]) = vs.map(v => (ts(d, 1), v))
    val b0 = ((1 to 4).flatMap(d => day(d, Seq(9.0, 10.0, 11.0))))
      .toDF("ts", "value")
    val b1 = (day(5, Seq(10.0, 10.5)) ++ day(6, Seq(9.5, 10.0)) ++
      day(7, Seq(500.0, 510.0, 490.0))).toDF("ts", "value")

    def snapshot(): (Map[String, Long], Vector[(String, Double, Boolean)]) = {
      val st = StreamingProfile.mergeStored(spark, store, Seq("window"))
        .select(col("window.start").cast("date").cast("string"),
          col("value.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sc = spark.read.parquet(screen)
        .select(col("window.start").cast("date").cast("string"),
          col("z"), col("is_anomaly"))
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getBoolean(2))).sortBy(_._1).toVector
      (st, sc)
    }

    StreamingProfile.screenBatch(b0, 0L, store, screen,
      cols = Seq("value"), timeColumn = ("ts", "1 day"), threshold = 2.0)
    StreamingProfile.screenBatch(b1, 1L, store, screen,
      cols = Seq("value"), timeColumn = ("ts", "1 day"), threshold = 2.0)
    val clean = snapshot()
    clean._1("2024-01-01") shouldBe 3L
    clean._2.length shouldBe 7
    clean._2.filter(_._3).map(_._1) shouldBe Vector("2024-01-07")

    // at-least-once replay: batch 1 fires again with the SAME batchId
    StreamingProfile.screenBatch(b1, 1L, store, screen,
      cols = Seq("value"), timeColumn = ("ts", "1 day"), threshold = 2.0)
    snapshot() shouldBe clean

    // ...and a store-only sink replay is equally idempotent
    val store2 = java.nio.file.Files
      .createTempDirectory("graft_replay_store2").toString
    StreamingProfile.storeBatchProfiles(b0, 0L, store2)
    StreamingProfile.storeBatchProfiles(b0, 0L, store2)
    StreamingProfile.mergeStored(spark, store2, Nil)
      .select(col("value.count")).as[Long].head() shouldBe 12L
  }

  test("store compaction: checkpoint-aware merge is invariant across " +
    "compact and vacuum, and a crashed compaction is invisible") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_compact_store").toString
    def batch(vals: Seq[(Timestamp, String, Double)]) =
      vals.toDF("ts", "key", "value")
    // 4 triggers, keyed store (one partial per key per batch)
    StreamingProfile.storeBatchProfiles(batch(batch1), 0L, store,
      keys = Seq("key"))
    StreamingProfile.storeBatchProfiles(batch(batch2), 1L, store,
      keys = Seq("key"))
    StreamingProfile.storeBatchProfiles(batch(batch1), 2L, store,
      keys = Seq("key"))
    StreamingProfile.storeBatchProfiles(batch(batch2), 3L, store,
      keys = Seq("key"))
    def snapshot() = StreamingProfile.mergeStored(spark, store, Seq("key"))
      .select(col("key"), col("value.count"), col("value.numbers.sum"),
        col("value.numbers.min"), col("value.numbers.max"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toVector
    val before = snapshot()
    before.map(_._2).sum shouldBe 2L * (batch1.size + batch2.size)

    // a CRASHED compaction (no _SUCCESS) must be invisible to readers
    val crashed = new java.io.File(s"$store/batch=compact_9")
    crashed.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(crashed.getPath, "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    snapshot() shouldBe before

    // real compaction of batches <= 1: merge result unchanged, the
    // consumed per-trigger dirs still on disk (vacuum not yet run)
    crashed.listFiles().foreach(_.delete()); crashed.delete()
    StreamingProfile.compactStore(spark, store, upToBatchId = 1L)
    snapshot() shouldBe before
    new java.io.File(s"$store/batch=0").exists() shouldBe true

    // vacuum deletes ONLY the dirs covered by the complete checkpoint
    StreamingProfile.vacuumStore(store)
    snapshot() shouldBe before
    new java.io.File(s"$store/batch=0").exists() shouldBe false
    new java.io.File(s"$store/batch=1").exists() shouldBe false
    new java.io.File(s"$store/batch=2").exists() shouldBe true

    // re-compaction folds the previous checkpoint + later batches;
    // the older checkpoint vacuums away
    StreamingProfile.compactStore(spark, store, upToBatchId = 3L)
    StreamingProfile.vacuumStore(store)
    snapshot() shouldBe before
    new java.io.File(s"$store/batch=compact_1").exists() shouldBe false
    new java.io.File(s"$store/batch=compact_3").exists() shouldBe true
    new java.io.File(s"$store/batch=3").exists() shouldBe false

    // NON-ADVANCING compaction (r18, the ADVICE-r17 footgun): calling
    // compact at the current checkpoint id with no newer trigger dirs
    // must be a NO-OP — the old code mode(overwrite)-wrote the very
    // checkpoint directory it was reading, and post-vacuum that
    // checkpoint is the only copy. The checkpoint's files must be
    // untouched (same names+sizes) and the merge unchanged.
    val ckptDir = new java.io.File(s"$store/batch=compact_3")
    def ckptState() = ckptDir.listFiles().map(f =>
      (f.getName, f.length())).sortBy(_._1).toVector
    val filesBefore = ckptState()
    StreamingProfile.compactStore(spark, store, upToBatchId = 3L)
    ckptState() shouldBe filesBefore
    snapshot() shouldBe before
  }

  test("row-local curation filters run unchanged on a stream") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import graft.ops.TextOps

    val input = MemoryStream[(Long, String)]
    val streamDf = input.toDF().toDF("id", "text")
    // gopher + c4 + redaction + chunking compose on the streaming frame
    // with no extra stateful operator (pure projections/explodes)
    val screened = TextOps.gopherReport(streamDf, "id", "text",
      minWords = 3)
    val cleaned = streamDf.select(col("id"),
      TextOps.redactPii(col("text")).as("text"))
    val chunks = TextOps.contextChunks(cleaned, "id", "text", 4, 4)

    val q1 = screened.writeStream.format("memory").queryName("s_gopher")
      .outputMode("append").start()
    val q2 = chunks.writeStream.format("memory").queryName("s_chunks")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (1L, "the quick brown fox jumps with the usual words here"),
        (2L, "mail me at alice@example.com about the offer")))
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    spark.sql("SELECT count(*) FROM s_gopher").head().getLong(0) shouldBe 2L
    val redactedChunks = spark.sql("SELECT chunk FROM s_chunks")
      .collect().map(_.getString(0))
    redactedChunks.exists(_.contains("[EMAIL]")) shouldBe true
    redactedChunks.exists(_.contains("@")) shouldBe false
  }

  test("batch-trained DSIR scorer and static-reference novelty run on " +
    "a stream") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import graft.ops.TextOps

    // train on static corpora; the returned Column is row-local
    val raw = Seq((1L, "aa bb aa bb"), (2L, "zz yy zz yy"))
      .toDF("id", "text")
    val target = Seq((3L, "aa bb")).toDF("id", "text")
    val scorer = TextOps.dsirScorer(raw, target, "text")

    val input = MemoryStream[(Long, String)]
    val streamDf = input.toDF().toDF("id", "text")
    val scored = streamDf.select(col("id"), scorer.as("logratio"))
    // static-reference novelty: stream-static left join + per-doc agg
    // (update mode: each doc's aggregate finalizes as it arrives)
    val nov = TextOps.ngramNovelty(streamDf, target
      .select(col("id"), lit("aa bb cc dd ee ff gg hh ii").as("text")),
      "id", "text", n = 4)

    val q1 = scored.writeStream.format("memory").queryName("s_dsir")
      .outputMode("append").start()
    val q2 = nov.writeStream.format("memory").queryName("s_nov")
      .outputMode("complete").start()
    try {
      input.addData(Seq(
        (10L, "aa bb aa bb"), // target-like
        (11L, "zz yy zz yy"), // off-target
        (12L, "aa bb cc dd unseen words here follow on"))) // overlaps ref
      q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val w = spark.sql("SELECT id, logratio FROM s_dsir").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w(10L) should be > w(11L)
    // the streamed scores equal the batch dsirWeights on the same rows
    val batch = TextOps.dsirWeights(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w(10L) shouldBe batch(1L) // same text as raw doc 1
    w(11L) shouldBe batch(2L)

    val nv = spark.sql("SELECT id, novelty FROM s_nov").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nv(12L) should be < 1.0 // "aa bb cc dd" seen in the reference
    nv(10L) shouldBe 1.0 // 4-gram "aa bb aa bb" is NOT in the reference
  }

  test("upload sink: every micro-batch's profiles land on the server") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/up", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val in = ex.getRequestBody
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        bodies.add(buf.toByteArray)
        ex.sendResponseHeaders(200, -1)
      } finally ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/up"

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "key", "value")
    val q = StreamingProfile.uploadSink(streamDf, url, "key123",
      keys = Seq("key"),
      retry = graft.io.ProfileUpload.RetryConfig(3, 5L)).start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally { q.stop(); server.stop(0) }

    // one upload per (key) group per micro-batch, each a parseable wire
    // profile whose value counts sum to the full stream
    val profiles = bodies.toArray(Array.empty[Array[Byte]])
      .map(graft.io.ProfileProto.fromBytes)
    profiles.length should be >= 2
    profiles.map(_.columns("value").numbers.count).sum shouldBe
      (batch1.length + batch2.length).toLong
  }
}
