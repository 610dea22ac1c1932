package graft.io

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.metrics.ProfileConfig
import graft.profile.ProfileSession

/** CSV profiling entry point — the engine's equivalent of the reference's
  * CLI profiler (EP3, /root/reference/cli/src/main/java/com/whylogs/cli/Profiler.java:37-241):
  * header CSV, custom delimiter, ""->null, optional row limit, every column
  * tracked as a string with numeric-string classification enabled
  * (the reference relies on WHYLOGS_ENABLE_STRING_MATCHING), and an
  * optional date column parsed with [[EasyDateTime]] routing rows into
  * per-date profiles (Profiler.java:222-241).
  *
  * Spark-first shape: one `groupBy(parsed_ts).agg(profiles)` pass instead
  * of the CLI's driver-side Map[Instant, DatasetProfile] — the same single
  * shuffle as every other profile plan, so a 100 TB CSV lake profiles the
  * same way a 1 GB file does.
  */
object CsvProfiler {

  def easyDateTime(c: Column, format: String): Column =
    GraftBridge.column(EasyDateTime(GraftBridge.expression(c), format))

  /** Profile a CSV path. Returns one row per parsed date (or a single row
    * when no date column is given) with a profile struct per CSV column;
    * the date key column is `profile_ts`.
    */
  def profile(
      spark: SparkSession,
      path: String,
      dateColumn: Option[(String, String)] = None,
      delimiter: String = ",",
      limit: Option[Int] = None,
      cfg: ProfileConfig = ProfileConfig(stringMatching = true)): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("nullValue", "")
      .csv(path)
    val limited = limit.map(raw.limit).getOrElse(raw)

    dateColumn match {
      case Some((dateCol, format)) =>
        val keyed = limited.withColumn("profile_ts",
          easyDateTime(col(dateCol), format))
        ProfileSession(keyed).withConfig(cfg).groupBy("profile_ts").aggProfiles()
      case None =>
        ProfileSession(limited).withConfig(cfg).aggProfiles()
    }
  }
}
