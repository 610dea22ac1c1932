package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, sorted storage layout for curated corpora — the
  * write-side half of the co-located-join story: two tables bucketed
  * into the same number of buckets on the same key join WITHOUT a
  * shuffle (Spark's bucketed scan reports the hash partitioning to the
  * planner, so the exchange disappears), and repeated pipeline stages
  * (dedup key joins, split materialization, per-shard training reads)
  * pay the partitioning cost exactly once, at write time.
  *
  * At 100 TB the difference is structural: an unbucketed join of two
  * corpus-sized tables shuffles both sides on every run; a bucketed
  * store shuffles each side once ever. Sort columns additionally give
  * in-file ordering (range-pruned scans, merge-friendly reads).
  */
object CorpusStore {

  /** Write `df` as a bucketed (optionally in-bucket-sorted) table.
    * Bucketed writes go through the session catalog (`saveAsTable`) —
    * Spark does not support bucketing on bare-path writes.
    */
  /** Drop `table` from the catalog AND clear an orphaned DEFAULT
    * warehouse location: a fresh session's in-memory catalog doesn't
    * know a previous run's table, but the directory survives —
    * saveAsTable would then fail LOCATION_ALREADY_EXISTS. Only the
    * default path is touched; an externally-located table never is.
    */
  private def dropWithDefaultLocation(
      spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val spark = df.sparkSession
    // Staged overwrite: write the new data to a staging table FIRST and
    // swap only on success, so a failed write leaves the previous table
    // intact (a drop-then-write overwrite of a shared table name would
    // destroy the old data before the new data exists). The swap window
    // is a catalog drop + rename of fully-written data, not a recompute.
    val staging = s"${table}__staging"
    dropWithDefaultLocation(spark, staging)
    val w = df.write.format(format).mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(staging)
    dropWithDefaultLocation(spark, table)
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }

  /** Append rows to an EXISTING bucketed table with the same bucket
    * spec — the grow-the-store half of incremental ingest: each append
    * job writes its own per-bucket files (hash partitioning stays
    * valid for exchange-free reads; multiple files per bucket are
    * fine), so the history is never rewritten. The caller owns
    * dedup-before-append semantics; Spark rejects a mismatched bucket
    * spec.
    */
  def appendBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    val w = df.write.format(format).mode("append")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog — a
    * bare `spark.read.parquet(path)` would lose it and re-shuffle).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Rewrite a store table in place (staged swap, same bucket/sort
    * spec from the catalog): appends accumulate one file set per
    * ingest batch, and a compaction folds them back to one file per
    * bucket — run it when [[storeStats]] shows files-per-bucket
    * creeping up. Readers are never broken: the swap is the same
    * staging + rename as [[writeBucketed]], so a failed compaction
    * leaves the store untouched.
    */
  def compactBucketed(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed — not a CorpusStore table"))
    require(spec.bucketColumnNames.length == 1,
      s"CorpusStore tables bucket on one column, $table has ${spec.bucketColumnNames}")
    // repartition on the bucket column with numBuckets tasks: bucket id
    // and exchange partition use the same murmur hash, so each task
    // holds exactly one bucket's rows -> ONE file per non-empty bucket
    val compacted = spark.table(table).repartition(spec.numBuckets,
      org.apache.spark.sql.functions.col(spec.bucketColumnNames.head))
    writeBucketed(compacted, table,
      spec.bucketColumnNames.head, spec.numBuckets,
      spec.sortColumnNames.toSeq)
  }

  /** Operational report for a store table: one row with row count,
    * bucket count, file count, and files-per-bucket — the compaction
    * trigger metric. File census via `input_file_name` over a
    * column-pruned scan.
    */
  def storeStats(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions.{count_distinct, count, lit,
      input_file_name, round => sround, col}
    val n = storedNumBuckets(spark, table)
    spark.table(table)
      .select(input_file_name().as("__f"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("__f")).as("n_files"))
      .select(lit(table).as("table"), col("n_rows"),
        lit(n).as("n_buckets"), col("n_files"),
        sround(col("n_files").cast("double") / n, 2)
          .as("files_per_bucket"))
  }

  /** The stored bucket count of `table` — appenders read it from the
    * catalog instead of trusting a caller-passed number, so an append
    * can never silently mismatch the write-time spec.
    */
  def storedNumBuckets(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
      .map(_.numBuckets)
      .getOrElse(throw new IllegalArgumentException(
        s"table $table is not bucketed — not a CorpusStore table"))
}
