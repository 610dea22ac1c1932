package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: how deep into a fixed
  * step sequence each user got, where step i counts as reached only by
  * an event on a strictly later row (in (event-time, tie) order) than
  * the event that reached step i-1 — the standard product-analytics
  * funnel with greedy first-occurrence semantics. The behavioral
  * complement to [[Sessionize]] on the same events table.
  *
  * Plan shape: ONE shuffle on the user key; the K step flags chain
  * through K window passes over the SAME sorted partition (consecutive
  * WindowExecs share the exchange and the sort — no re-shuffle), and
  * the final per-user aggregate hash-partitions on the key the window
  * pass already used. Scale cost is one events shuffle regardless of K.
  */
object Funnel {

  /** Per-user funnel stats: `depth` (0..K steps reached in order) and
    * `t_step1..t_stepK` — the event time (exact micros for timestamp
    * columns, native units for numerics) of the event that FIRST
    * extended the user's funnel to that step; NULL where unreached.
    *
    * `tieCols` break event-time ties deterministically (pass the event
    * id); with no tie columns, rows at an identical time order
    * arbitrarily and either may count as "earlier".
    */
  def depth(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct")
    val units = EventTime.micros(df, tsCol)
    val w = Window.partitionBy(col(userCol))
      .orderBy((col("__t") +: tieCols.map(col)).map(_.asc): _*)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = steps.zipWithIndex.foldLeft(df.withColumn("__t", units)) {
      case (cur, (s, 0)) =>
        cur.withColumn("__f0",
          when(col(typeCol) === lit(s), 1).otherwise(0))
      case (cur, (s, i)) =>
        // this event extends the funnel to step i iff it is step i's
        // type and some strictly earlier row already reached step i-1
        cur.withColumn(s"__f$i",
          when(col(typeCol) === lit(s) &&
            coalesce(max(col(s"__f${i - 1}")).over(wPrev), lit(0)) === 1,
            1).otherwise(0))
    }
    val aggs = steps.indices.map(i =>
      min(when(col(s"__f$i") === 1, col("__t"))).as(s"t_step${i + 1}"))
    // deepest reached step; t_stepK non-null implies all shallower are
    val depthCol = steps.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"t_step${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    flagged.groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("depth", depthCol)
      .select(col(userCol) +: col("depth") +:
        steps.indices.map(i => col(s"t_step${i + 1}")): _*)
  }

  /** Event-flow transition matrix: for each (from_type, to_type) pair,
    * how many times a user's event of `from_type` was IMMEDIATELY
    * followed (in (time, tie) order) by one of `to_type` — the path
    * structure behind the funnel, with a terminal `to_type = NULL` row
    * per user's last event so outgoing counts per type sum to the type's
    * event count.
    *
    * Same plan shape as [[depth]]: one events shuffle for the per-user
    * lead window, then a bounded (types x types) aggregate.
    */
  def transitions(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val units = EventTime.micros(df, tsCol)
    val w = Window.partitionBy(col(userCol))
      .orderBy((col("__t") +: tieCols.map(col)).map(_.asc): _*)
    df.withColumn("__t", units)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
