package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-funnel reporting: where does a filter chain lose data?
  * Every real pipeline composes screens (quality gates, dedup flags,
  * length caps) and then needs the per-stage attrition BY GROUP to
  * debug why a source vanished — this op computes the whole funnel in
  * ONE scan (conditional prefix sums inside a single aggregate; the
  * per-stage rows then explode from a groups×stages-sized frame, never
  * re-reading the corpus).
  */
object Curation {

  /** Per `groupCol` value and per stage (applied IN ORDER, each stage
    * conditioned on all previous passing): rows entering the stage,
    * rows surviving it, and the keep rate. Stage conditions are plain
    * boolean Columns, so anything row-local composes directly and
    * join-derived flags (e.g. a stored-dedup "fresh" column) compose
    * by materializing the flag first. NULL conditions count as
    * failures. Output: group, stage (1-based), stage_name, n_in,
    * n_out, keep_rate.
    */
  def funnelReport(
      df: DataFrame,
      groupCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnelReport needs at least one stage")
    val prefixes = stages.map(_._2)
      .scanLeft(lit(true))((acc, c) => acc && coalesce(c, lit(false)))
      .tail
    val aggCols = count(lit(1)).as("__n_total") +:
      prefixes.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__s$i")
      }
    val agg = df.groupBy(col(groupCol).as("group"))
      .agg(aggCols.head, aggCols.tail: _*)
    val stageStructs = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage"), lit(name).as("stage_name"),
        (if (i == 0) col("__n_total") else col(s"__s${i - 1}"))
          .as("n_in"),
        col(s"__s$i").as("n_out"))
    }
    agg
      .select(col("group"),
        explode(array(stageStructs: _*)).as("__st"))
      .select(col("group"), col("__st.stage").as("stage"),
        col("__st.stage_name").as("stage_name"),
        col("__st.n_in").as("n_in"), col("__st.n_out").as("n_out"))
      .withColumn("keep_rate",
        when(col("n_in") > 0,
          col("n_out").cast("double") / col("n_in")))
  }
}
