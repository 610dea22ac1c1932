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

  /** Per-file BLOOM manifest on a high-cardinality column — the
    * point-lookup complement to the min/max envelope: range stats
    * can't prune equality probes on a column the layout isn't sorted
    * by, a per-file bloom can. One row per data file with the filter
    * bytes over `xxhash64(colName)`; `numBits` sizes the false-
    * positive rate (a false positive only costs an extra file scan —
    * correctness never depends on the filter).
    *
    * Built like [[collectStats]]: one column-pruned scan, map-side
    * combined bloom aggregate keyed by file name.
    */
  def writeBloomManifest(
      spark: SparkSession,
      layoutPath: String,
      colName: String,
      manifestPath: String,
      numBits: Long = 1L << 20,
      numHashFns: Int = 5): Unit =
    spark.read.parquet(layoutPath)
      .select(input_file_name().as(FileCol), col(colName))
      .groupBy(col(FileCol))
      .agg(graft.functions.bloom_agg(xxhash64(col(colName)), numBits,
        numHashFns).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)

  /** Bloom-pruned equality read: only files whose bloom might contain
    * `value` are scanned, and the equality predicate re-applies
    * row-exactly (false positives scan and filter away; misses are
    * impossible — blooms have no false negatives). `value` must be
    * the column's own type (the lookup hash must equal the build
    * hash).
    */
  def lookupRead(
      spark: SparkSession,
      layoutPath: String,
      bloomManifestPath: String,
      colName: String,
      value: Any): DataFrame = {
    val files = spark.read.parquet(bloomManifestPath)
      .filter(graft.functions.bloom_might_contain(col("bloom"),
        xxhash64(lit(value))))
      .select(col(FileCol)).collect().map(_.getString(0))
    val base = spark.read.option("basePath", layoutPath)
    val scanned =
      if (files.isEmpty) base.parquet(layoutPath).filter(lit(false))
      else base.parquet(files.toIndexedSeq: _*)
    scanned.filter(col(colName) === lit(value))
  }

  /** Bloom-pruning effectiveness for a probe value:
    * (files_kept, files_total).
    */
  def lookupStats(
      spark: SparkSession,
      bloomManifestPath: String,
      value: Any): (Long, Long) = {
    val m = spark.read.parquet(bloomManifestPath)
    val total = m.count()
    val kept = m.filter(graft.functions.bloom_might_contain(
      col("bloom"), xxhash64(lit(value)))).count()
    (kept, total)
  }
}
