package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level statistics manifest over a parquet layout — the data-
  * skipping index pattern (Delta/Iceberg-style) for the layouts this
  * library writes ([[ShardWriter]], [[ZOrderLayout]]): one row per
  * data file with row count and per-column min/max, so a reader can
  * prune FILES from the driver before Spark ever lists a split.
  * Parquet row-group stats prune within a scan; the manifest prunes
  * the scan itself — at 100 TB the difference is whether a million
  * file footers get opened.
  *
  * `collectStats` is ONE column-pruned scan of the layout (only the
  * indexed columns are read) with a map-side-combined aggregate keyed
  * by file name — no shuffle wider than (#files × stats). A
  * production writer would fold this into the write (parquet footers
  * already hold the numbers); the explicit pass keeps the manifest an
  * ordinary DataFrame any engine can audit.
  *
  * `prunedRead` filters the manifest (driver-side, manifest-sized —
  * the same driver-resident file-list step every table format does)
  * and reads only intersecting files with the predicate still pushed
  * down for row-group pruning inside them.
  */
object LayoutManifest {

  val FileCol = "file"

  /** Per-file stats for `cols` over the layout at `path`: one row per
    * parquet data file — (file, n_rows, min_c / max_c per column).
    */
  def collectStats(
      spark: SparkSession,
      path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one indexed column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .select((input_file_name().as(FileCol) +: cols.map(col)): _*)
      .groupBy(col(FileCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Write the stats manifest for the layout at `layoutPath` to
    * `manifestPath` (a tiny parquet table: #files rows).
    */
  def writeManifest(
      spark: SparkSession,
      layoutPath: String,
      cols: Seq[String],
      manifestPath: String): Unit =
    collectStats(spark, layoutPath, cols)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)

  /** Manifest-pruned range read: only files whose [min, max] envelope
    * on `valueCol` intersects [lo, hi] are scanned; the predicate is
    * re-applied so straddling files still filter row-exactly, and it
    * reaches the parquet scan for row-group pruning within them.
    * `basePath` = `layoutPath` keeps partition-directory columns
    * (e.g. [[ShardWriter]]'s `shard=N`) intact on the direct file
    * read.
    */
  def prunedRead(
      spark: SparkSession,
      layoutPath: String,
      manifestPath: String,
      valueCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    val files = spark.read.parquet(manifestPath)
      .filter(col(s"max_$valueCol") >= lit(lo) &&
        col(s"min_$valueCol") <= lit(hi))
      .select(col(FileCol)).collect().map(_.getString(0))
    val base = spark.read.option("basePath", layoutPath)
    val scanned =
      if (files.isEmpty)
        base.parquet(layoutPath).filter(lit(false))
      else base.parquet(files.toIndexedSeq: _*)
    scanned.filter(col(valueCol).between(lit(lo), lit(hi)))
  }

  /** How many of the layout's files the manifest would keep for the
    * range — the pruning-effectiveness probe (files_kept, files_total).
    */
  def pruningStats(
      spark: SparkSession,
      manifestPath: String,
      valueCol: String,
      lo: Any,
      hi: Any): (Long, Long) = {
    val m = spark.read.parquet(manifestPath)
    val total = m.count()
    val kept = m.filter(col(s"max_$valueCol") >= lit(lo) &&
      col(s"min_$valueCol") <= lit(hi)).count()
    (kept, total)
  }
}
