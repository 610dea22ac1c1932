package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible receipt for the streaming wide-profile STATE SIZE — the
  * last un-receipted SURVEY §7 risk ("streaming state size" for windowed
  * profile aggregation). The claim under test is the scaladoc of
  * [[graft.streaming.StreamingProfile.windowedProfiles]]: state per group
  * is the compact sketch buffer, so the state store holds
  * `open_windows x groups x columns x (bytes/column)` bytes INDEPENDENT of
  * how many rows have streamed through.
  *
  * The receipt runs the `profile_wide150` shape as a real streaming query:
  * a MemoryStream expanded to `nCols` numeric columns, profiled by
  * `windowedProfiles(ts, "1 hour", watermark)` under the RocksDB state
  * store provider, fed `nRows` rows spread uniformly over `nWindows`
  * hourly event-time windows across several triggers. It reports, as one
  * JSON line:
  *
  *  - `state_rows` — state-store rows (must equal `nWindows`: one
  *    aggregation-state row per open window, NOT per input row),
  *  - `state_memory_bytes` / `rocksdb_sst_bytes` — the provider's own
  *    meters (includes fixed per-instance overhead across the 32 shuffle
  *    partitions, so it is an upper bound),
  *  - `wire_bytes_per_window` / `wire_bytes_per_column` — the serialized
  *    profile size of each emitted window row (the logical state payload;
  *    this is the number the sizing formula uses),
  *  - `rows_per_sec` — ingest throughput over the whole run.
  *
  * Sizing knob (documented in SURVEY §8-r16): state bytes ~=
  * open_windows(watermark/cadence) x groups x nCols x wire_bytes_per_column;
  * bound it by shortening the watermark (fewer open windows) or shrinking
  * the sketch config (ProfileConfig's KLL k / HLL lgK / frequent-items k
  * shrink bytes/column).
  *
  *   sbt -batch "runMain graft.tools.StreamingStateScale [nRows] [nCols] [nWindows] [nBatches]"
  *
  * WIDTH WALL (measured r17): the windowed-stateful shape holds to 150
  * columns (the canonical receipt) but OOMs a 16 GB driver at 300 and
  * 608 columns REGARDLESS of windows (tried 24/6/2), rows (100k/20k),
  * or trigger count — a mid-run heap histogram shows ~185M live
  * Catalyst expression nodes (~12 GB of Invoke/GetExternalRowField/
  * ValidateExternalType/TreeNode lambdas): IncrementalExecution
  * re-analyzes the ultra-wide nested profile plan EVERY trigger and
  * the complete-mode collect builds row (de)serializer trees over the
  * 608 x ~60-field schema — planning cost, NOT state (state stays
  * open_windows x groups rows at any width). Guidance at reference-
  * parity width: run wide profiles through the foreachBatch
  * store-and-merge sink (one batch-planned aggregate per trigger,
  * profile_merge roll-up), or cap continuous windowed profiles near
  * the receipted 150 columns.
  */
object StreamingStateScale {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(200000)
    val nCols = args.lift(1).map(_.toInt).getOrElse(150)
    val nWindows = args.lift(2).map(_.toInt).getOrElse(24)
    // trigger count: complete mode re-emits EVERY open window's full
    // profile row per trigger (24 x nCols summarize+convert calls), so
    // at reference-parity width (608) the output cost dominates long
    // before state does — the state claim needs >= 2 triggers (state
    // must survive a trigger boundary), not 10
    val nBatches = args.lift(3).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("streaming-state-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Double)]
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // expand the 2-tuple stream to the wide numeric shape row-locally —
    // the profile aggregate sees nCols independent columns, exactly the
    // profile_wide150 bench shape
    val wide = input.toDF().toDF("ts", "v").select(
      col("ts") +: (0 until nCols).map(i =>
        (col("v") + lit(i)).as(s"c$i")): _*)
    val profiles = graft.streaming.StreamingProfile.windowedProfiles(
      wide, "ts", "1 hour", s"${nWindows * 2} hours")

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_scale_ckpt").toString
    // complete mode: the memory sink holds exactly the CURRENT state (one
    // row per open window) after every trigger, so the wire-size meter
    // below reads final states, not a per-trigger update history
    val q = profiles.writeStream
      .format("memory").queryName("state_scale")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()
    val t0 = System.nanoTime()
    try {
      val perBatch = nRows / nBatches
      var b = 0
      while (b < nBatches) {
        val rows = (0 until perBatch).map { j =>
          val i = b.toLong * perBatch + j
          // uniform spread over nWindows hourly windows; value varies so
          // every sketch (kll/theta/freq) sees real cardinality
          (new Timestamp(base + (i % nWindows) * 3600000L +
            (i % 3600) * 1000L), (i % 100000).toDouble)
        }
        input.addData(rows)
        q.processAllAvailable()
        b += 1
      }
    } finally {
      val wallSec = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators.head)
      val stateRows = prog.map(_.numRowsTotal).getOrElse(-1L)
      val stateMem = prog.map(_.memoryUsedBytes).getOrElse(-1L)
      val sstBytes = prog.flatMap { p =>
        Option(p.customMetrics.get("rocksdbSstFileSize"))
          .map(_.longValue())
      }.getOrElse(-1L)
      q.stop()
      // logical state payload: serialized wire profile of each emitted
      // window row (the same meter as the bench's bytes/column gate)
      val sink = spark.table("state_scale")
      val r = graft.io.ProfileIO.withProtoColumn(sink)
        .agg(sum(length(col("why_profile"))), count(lit(1))).first()
      val wireTotal = r.getLong(0)
      val nWindowRows = r.getLong(1)
      val wirePerWindow = wireTotal.toDouble / math.max(nWindowRows, 1L)
      val wirePerColumn = wirePerWindow / nCols
      println(
        s"""{"metric":"streaming_state_scale","n_rows":$nRows,""" +
        s""""n_cols":$nCols,"n_windows":$nWindows,""" +
        s""""state_rows":$stateRows,"state_memory_bytes":$stateMem,""" +
        s""""rocksdb_sst_bytes":$sstBytes,""" +
        f""""wire_bytes_per_window":$wirePerWindow%.0f,""" +
        f""""wire_bytes_per_column":$wirePerColumn%.0f,""" +
        f""""wall_sec":$wallSec%.1f,""" +
        f""""rows_per_sec":${nRows / wallSec}%.0f}""")
    }
    spark.stop()
  }
}
