package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Funnel.transitions]]: the event-flow
  * transition matrix maintained as the stream runs. Per-user custom
  * state is (last event, per-pair counts) via `flatMapGroupsWithState`
  * — counts are bounded by the event-type alphabet squared, so state
  * per user is types² longs regardless of stream length.
  *
  * Each trigger emits the user's CUMULATIVE (from, to, n) rows (update
  * semantics; counts are monotone, so the latest row per (user, from,
  * to) is the truth and `max(n)` recovers it from an update-mode
  * sink). Summing those over users equals the batch operator's
  * non-terminal rows whenever batches respect (time, tie) order —
  * terminal `<end>` rows are a batch-only notion: a stream never
  * knows an event was a user's last.
  *
  * Same API choice as [[StreamingFunnel]]: the transition recurrence
  * needs the previous event, which is ordered custom state, not an
  * algebraic merge.
  */
object StreamingTransitions {

  final case class TransEvent(
      user: String, t: Long, etype: String, tie: Long)
  final case class TransState(
      lastType: Option[String], lastT: Long, lastTie: Long,
      counts: Map[(String, String), Long])
  final case class TransRow(
      user: String, fromType: String, toType: String, n: Long)

  /** Cumulative per-user transition rows (update semantics). Output:
    * user, from_type, to_type, n.
    */
  def matrix(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(
      col(userCol).cast("string").as("user"),
      graft.ops.EventTime.micros(df, tsCol).as("t"),
      col(typeCol).as("etype"),
      col(tieCol).cast("long").as("tie")).as[TransEvent]
    val updated = src.groupByKey(_.user)
      .flatMapGroupsWithState[TransState, TransRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[TransEvent],
         state: GroupState[TransState]) =>
          val st = state.getOption
            .getOrElse(TransState(None, 0L, 0L, Map.empty))
          var last = st.lastType.map(lt => (lt, st.lastT, st.lastTie))
          var counts = st.counts
          val ordered = events.toArray.sortBy(e => (e.t, e.tie))
          ordered.foreach { e =>
            last.foreach { case (lt, _, _) =>
              val k = (lt, e.etype)
              counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
            }
            last = Some((e.etype, e.t, e.tie))
          }
          state.update(TransState(last.map(_._1),
            last.map(_._2).getOrElse(0L), last.map(_._3).getOrElse(0L),
            counts))
          counts.iterator.map { case ((f, t2), n) =>
            TransRow(user, f, t2, n)
          }
      }
    updated.toDF().select(col("user"), col("fromType").as("from_type"),
      col("toType").as("to_type"), col("n"))
  }

  /** Collapse an update-mode sink of [[matrix]] rows to the global
    * matrix: latest (= max, counts are monotone) per (user, from, to),
    * summed over users. A convenience for tests and batch replays.
    */
  def collapse(sink: DataFrame): DataFrame =
    sink.groupBy(col("user"), col("from_type"), col("to_type"))
      .agg(max(col("n")).as("__n"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("__n")).as("n"))
}
