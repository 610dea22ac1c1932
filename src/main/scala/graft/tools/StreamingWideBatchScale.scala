package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible receipt for the WIDE-width streaming route — the
  * documented guidance where [[StreamingStateScale]] measured the wall:
  * continuous windowed-stateful profiles OOM a 16 GB driver at 300/608
  * columns because IncrementalExecution re-analyzes the ultra-wide plan
  * every trigger (planning cost, not state). The prescribed route at
  * reference-parity width (608 columns, WhyLogsTest.scala:107-128) is the
  * foreachBatch store-and-merge sink
  * ([[graft.streaming.StreamingProfile.perBatchProfileSink]]): each
  * trigger runs ONE batch-planned wide aggregate (fresh plan, garbage
  * after the trigger — nothing accumulates), writes the partial profile
  * row to a batchId-keyed parquet subdirectory, and
  * [[graft.streaming.StreamingProfile.mergeStored]] re-aggregates the
  * store on demand (the q03-oracled profile-merge monoid).
  *
  * The receipt streams `nRows` rows expanded to `nCols` numeric columns
  * through that sink over `nBatches` triggers and reports one JSON line:
  *
  *  - `merged_count` — row count in the merged all-data profile
  *    (must equal `nRows`: the store re-aggregates to exactly the
  *    all-data profile),
  *  - `store_bytes` / `store_files` — the parquet store footprint
  *    (grows with TRIGGERS, not rows — each batch contributes one
  *    sketch-bounded partial row),
  *  - `peak_heap_mb` — max JVM used-heap sampled after every trigger
  *    (the meter that blew up in the windowed-stateful shape),
  *  - `rows_per_sec` — ingest throughput over the whole run.
  *
  *   sbt -batch "runMain graft.tools.StreamingWideBatchScale [nRows] [nCols] [nBatches]"
  */
object StreamingWideBatchScale {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(100000)
    val nCols = args.lift(1).map(_.toInt).getOrElse(608)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("streaming-wide-batch-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Double)]
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val wide = input.toDF().toDF("ts", "v").select(
      (0 until nCols).map(i => (col("v") + lit(i)).as(s"c$i")): _*)

    val store = java.nio.file.Files
      .createTempDirectory("graft_wide_batch_store").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_wide_batch_ckpt").toString
    val q = graft.streaming.StreamingProfile
      .perBatchProfileSink(wide, store)
      .option("checkpointLocation", ckpt)
      .start()

    val rt = Runtime.getRuntime
    var peakHeap = 0L
    val t0 = System.nanoTime()
    try {
      val perBatch = nRows / nBatches
      var b = 0
      while (b < nBatches) {
        val rows = (0 until perBatch).map { j =>
          val i = b.toLong * perBatch + j
          (new Timestamp(base + i * 1000L), (i % 100000).toDouble)
        }
        input.addData(rows)
        q.processAllAvailable()
        peakHeap = math.max(peakHeap, rt.totalMemory() - rt.freeMemory())
        b += 1
      }
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val merged = graft.streaming.StreamingProfile
      .mergeStored(spark, store, Nil)
    val mergedCount = merged.select(col("c0.count")).first().getLong(0)
    val storeFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(store)).filter(_.getName.endsWith(".parquet"))
    }
    println(
      s"""{"metric":"streaming_wide_batch_scale","n_rows":$nRows,""" +
      s""""n_cols":$nCols,"n_batches":$nBatches,""" +
      s""""merged_count":$mergedCount,""" +
      s""""store_bytes":${storeFiles.map(_.length).sum},""" +
      s""""store_files":${storeFiles.size},""" +
      s""""peak_heap_mb":${peakHeap / (1024 * 1024)},""" +
      f""""wall_sec":$wallSec%.1f,""" +
      f""""rows_per_sec":${nRows / wallSec}%.0f}""")
    spark.stop()
  }
}
