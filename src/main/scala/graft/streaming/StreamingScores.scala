package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.ops.EventStats.decayedScore]]: the per-key
  * time-decayed activity score maintained incrementally as custom
  * `mapGroupsWithState` state — three numbers per key (score at the
  * anchor, anchor time, event count), so state is O(keys) regardless
  * of stream length.
  *
  * The decay anchor is the key's own latest event (as in batch), and
  * the update is EXACT under any arrival order: for an event at time t
  * against state (s, maxT),
  *   t >  maxT: s' = s * 2^((maxT - t)/hl) + v, anchor moves to t
  *   t <= maxT: s' = s + v * 2^((t - maxT)/hl), anchor stays
  * — both are the algebraic re-anchoring of the batch closed form
  * `sum_i v_i * 2^((t_i - max_t)/hl)`, so streamed == batch in exact
  * arithmetic under ANY arrival order, late data included; in floating
  * point the re-anchoring multiplies accumulate ~1 ulp per anchor
  * move, so comparisons round (the specs pin 1e-9 agreement). The
  * anchor's dependence on the running max is why this is custom state
  * and not a windowed aggregate.
  */
object StreamingScores {

  final case class ScoreEvent(key: String, t: Long, v: Double)
  final case class ScoreState(score: Double, maxT: Long, n: Long)
  final case class ScoreRow(
      key: String, ewma_score: Double, n_events: Long, last_t: Long)

  /** Per-key decayed-score rows (update semantics — the latest row per
    * key is its current score). NULL values contribute nothing but
    * still anchor recency, matching batch.
    */
  def decayedScores(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0,
      s"halfLifeSeconds must be > 0, got $halfLifeSeconds")
    val spark = df.sparkSession
    import spark.implicits._
    val hlMicros = halfLifeSeconds * 1e6
    val src = df.select(
      col(keyCol).cast("string").as("key"),
      graft.ops.EventTime.micros(df, tsCol).as("t"),
      coalesce(col(valueCol).cast("double"), lit(0.0)).as("v"))
      .as[ScoreEvent]
    src.groupByKey(_.key)
      .mapGroupsWithState[ScoreState, ScoreRow](
        GroupStateTimeout.NoTimeout) {
        (key: String, events: Iterator[ScoreEvent],
         state: GroupState[ScoreState]) =>
          var st = state.getOption.getOrElse(
            ScoreState(0.0, Long.MinValue, 0L))
          // fold in (t, v) order so replays of the same batch are
          // bit-identical; cross-batch order doesn't matter (exact
          // re-anchoring), in-batch order pins the fp summation shape
          events.toArray.sortBy(e => (e.t, e.v)).foreach { e =>
            st =
              if (st.n == 0L)
                ScoreState(e.v, e.t, 1L)
              else if (e.t > st.maxT)
                ScoreState(
                  st.score * math.pow(2.0, (st.maxT - e.t) / hlMicros)
                    + e.v,
                  e.t, st.n + 1)
              else
                ScoreState(
                  st.score + e.v *
                    math.pow(2.0, (e.t - st.maxT) / hlMicros),
                  st.maxT, st.n + 1)
          }
          state.update(st)
          ScoreRow(key, st.score, st.n, st.maxT)
      }
      .toDF()
  }
}
