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
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val spark = df.sparkSession
    // true overwrite ACROSS sessions: a fresh session's in-memory catalog
    // doesn't know a previous run's table, but the warehouse DIRECTORY
    // survives — saveAsTable would then fail LOCATION_ALREADY_EXISTS.
    // Drop the catalog entry if present and clear an orphaned default
    // location (only the default path — an externally-located table is
    // never touched here).
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.format(format).mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog — a
    * bare `spark.read.parquet(path)` would lose it and re-shuffle).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
