package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.ops.Funnel]]: per-user funnel progress
  * tracked as CUSTOM state via `mapGroupsWithState` — the state is K
  * longs per user (first completion time of each step, sentinel where
  * unreached), so state size is users x K x 8 bytes regardless of
  * stream length, and each trigger emits the user's current depth row.
  *
  * Each micro-batch's events fold in (time, tie) order; across batches
  * the state only ever EXTENDS (a set step time never moves — first
  * completion is final). Results equal the batch operator whenever
  * batches arrive respecting the (time, tie) order, the same contract
  * the other streaming twins (dedup, novelty) document; an
  * out-of-order late event can under-count depth but never corrupts
  * already-reached steps.
  *
  * Built on mapGroupsWithState rather than a windowed aggregate
  * because the funnel recurrence (step i needs step i-1's FIRST time)
  * is not expressible as an algebraic merge — it needs ordered custom
  * state, exactly what the API exists for.
  */
object StreamingFunnel {

  private val Unset = Long.MinValue

  final case class FunnelEvent(
      user: String, t: Long, etype: String, tie: Long)
  final case class FunnelState(times: Array[Long])
  final case class FunnelRow(
      user: String, depth: Int, times: Seq[Long])

  /** Per-user funnel rows (update semantics — the latest row per user
    * is the user's current funnel). Output: user (string form of the
    * key), depth, t_step1..t_stepK (-1 where unreached).
    */
  def depth(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      tieCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val src = df.select(
      col(userCol).cast("string").as("user"),
      graft.ops.EventTime.micros(df, tsCol).as("t"),
      col(typeCol).as("etype"),
      col(tieCol).cast("long").as("tie")).as[FunnelEvent]
    val updated = src.groupByKey(_.user)
      .mapGroupsWithState[FunnelState, FunnelRow](
        GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times.clone())
            .getOrElse(Array.fill(k)(Unset))
          val ordered = events.toArray.sortBy(e => (e.t, e.tie))
          ordered.foreach { e =>
            stepIdx.get(e.etype).foreach { i =>
              val prevOk = i == 0 ||
                (times(i - 1) != Unset && e.t >= times(i - 1))
              if (prevOk && times(i) == Unset) times(i) = e.t
            }
          }
          state.update(FunnelState(times))
          FunnelRow(user, times.segmentLength(_ != Unset, 0),
            times.toSeq.map(t => if (t == Unset) -1L else t))
      }
    updated.toDF().select(
      col("user") +: col("depth") +:
        steps.indices.map(i => col("times")(i).as(s"t_step${i + 1}")): _*)
  }
}
