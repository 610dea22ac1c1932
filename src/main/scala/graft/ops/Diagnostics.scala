package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-shuffle diagnostics: measure a prospective join/aggregation key
  * BEFORE committing a 100 TB job to it. A key whose top entry owns
  * double-digit share needs [[Joins.saltedJoin]] (or AQE skew-join
  * splitting); this report is the cheap way to know in advance.
  */
object Diagnostics {

  /** Heaviest `topK` values of a prospective shuffle key with exact
    * counts and corpus share. Deterministic total order (count desc,
    * then key columns asc).
    *
    * Scale shape: ONE count aggregation with map-side combine (shuffle
    * carries distinct keys), the total rides a 1-row broadcast, and the
    * top-k is `TakeOrderedAndProject` — each partition contributes at
    * most k rows, no full sort.
    */
  def keySkew(df: DataFrame, keyCols: Seq[String], topK: Int): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    // total = sum over the already-aggregated counts, NOT a second
    // df.count() scan: both consumers share counts' exchange (the
    // unigramPerplexity `tot` pattern), so the input is read once
    val total = counts.agg(sum(col("n")).cast("double").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(keyCols.map(col) ++ Seq(col("n"),
        round(col("n") / col("__total"), 6).as("share")): _*)
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
  }
}
