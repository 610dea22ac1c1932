package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Entropy-based automatic segmentation: pick the categorical columns that
  * best explain a target column, greedily, by weighted-entropy gain — the
  * reference's `estimate_segments`
  * (/root/reference/spark/python/whyspark/preprocessing/autosegmentation.py:77-173)
  * re-planned Spark-first:
  *
  *  - cardinality + null stats for ALL candidate columns come from ONE
  *    aggregation pass (the reference runs one Spark job per column);
  *    distinct counts are exact (`count_distinct`) rather than
  *    `approx_count_distinct` — deterministic, oracle-checkable, and the
  *    counts are per-column scalars either way;
  *  - the grouped count table is built once and cached; every candidate
  *    evaluation is an aggregation over it (it has at most
  *    prod(cardinalities) rows — tiny next to the input);
  *  - candidate iteration order is lexicographic (the reference iterates a
  *    Python set — nondeterministic); gains must be strictly positive.
  */
object AutoSegmentation {

  /** One greedy step's scoring table: weighted entropy of `target` under
    * `split ++ [candidate]`.
    */
  private def weightedEntropy(
      countDf: DataFrame,
      totalCount: Long,
      splitCols: Seq[String],
      target: String): Double = {
    val keys = (splitCols :+ target).map(col)
    val grouped = countDf.groupBy(keys: _*)
      .agg(sum(col("count")).as("group_count"))
    val result =
      if (splitCols.isEmpty) {
        // single partition: p over the whole table, weight 1
        grouped
          .select((col("group_count") /
            sum(col("group_count")).over(Window.partitionBy())).as("p"))
          .agg((-sum(col("p") * log2(col("p")))).as("entropy"))
          .first().getDouble(0)
      } else {
        val w = Window.partitionBy(splitCols.map(col): _*)
        grouped
          .withColumn("p", col("group_count") / sum(col("group_count")).over(w))
          .groupBy(splitCols.map(col): _*)
          .agg((-sum(col("p") * log2(col("p")))).as("entropy"),
            (sum(col("group_count")) / totalCount.toDouble).as("weight"))
          .agg(sum(col("entropy") * col("weight")))
          .first().getDouble(0)
      }
    if (result.isNaN) 0.0 else result
  }

  /** Normalized entropy of one column (used to substitute a missing target:
    * highest-entropy column wins). autosegmentation.py:9-22.
    */
  def simpleEntropy(df: DataFrame, column: String): Double = {
    val n = df.count().toDouble
    val r = df.groupBy(col(column))
      .agg((count(col(column)) / n).as("p"))
      .agg(-sum(col("p") * log2(col("p"))))
      .first()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Greedy segment-column selection. Returns the chosen columns in pick
    * order. Mirrors estimate_segments(df, target, maxSegments, bounds).
    */
  def estimateSegments(
      df: DataFrame,
      targetField: Option[String] = None,
      maxSegments: Int = 30,
      includeColumns: Seq[String] = Nil,
      uniquePercUpper: Double = 0.8,
      nullPercUpper: Double = 0.2): Seq[String] = {
    val candidates = df.schema.fields.collect {
      case f if f.dataType == StringType || includeColumns.contains(f.name) =>
        f.name
    }.toSeq.sorted
    if (candidates.isEmpty) return Nil

    // ONE pass: total count + per-column exact distinct + null counts
    val statAggs = count(lit(1)).as("__n") +:
      candidates.flatMap(c => Seq(
        count_distinct(col(c)).as(s"__u_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__z_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*).first()
    val total = stats.getAs[Long]("__n")
    if (total == 0) return Nil
    val nUniques = candidates.map(c => c -> stats.getAs[Long](s"__u_$c")).toMap
    val nNulls = candidates.map(c => c -> stats.getAs[Long](s"__z_$c")).toMap

    var valid = candidates.filter { c =>
      val uniquePerc = nUniques(c).toDouble / total
      val nullPerc = nNulls(c).toDouble / total
      nUniques(c) > 1 && nullPerc < nullPercUpper && uniquePerc < uniquePercUpper
    }
    if (valid.isEmpty) return Nil

    val target = targetField.getOrElse {
      valid.map { c =>
        val e = simpleEntropy(df, c) /
          (if (nUniques(c) > 1) math.log(nUniques(c).toDouble) else 1.0)
        (e, c)
      }.maxBy(t => (t._1, t._2))._2
    }

    val groupCols = (valid :+ target).distinct
    val countDf = df.select(groupCols.map(col): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("count"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val countTotal = total

    val segments = scala.collection.mutable.ArrayBuffer.empty[String]
    var segmentsUsed = 1L
    var done = false
    while (!done && segmentsUsed < maxSegments) {
      val eligible = valid.filter(c => !segments.contains(c) &&
        c != target &&
        nUniques(c) * segmentsUsed <= (maxSegments - segmentsUsed))
      val preEntropy =
        weightedEntropy(countDf, countTotal, segments.toSeq, target)
      val best = eligible.map { c =>
        val post =
          weightedEntropy(countDf, countTotal, segments.toSeq :+ c, target)
        val raw = preEntropy - post
        val gain =
          if (nUniques(c) > 0) raw / math.log(nUniques(c).toDouble) else raw
        (gain, c)
      }.filter(_._1 > 0.0).sortBy(t => (-t._1, t._2)).headOption
      best match {
        case Some((_, c)) =>
          segments += c
          segmentsUsed *= nUniques(c)
        case None => done = true
      }
    }
    countDf.unpersist()
    segments.toSeq
  }

  /** The per-step scoring surface as a DataFrame (for SQL-oracle checks):
    * one row per candidate with its entropy gain for the FIRST split.
    */
  def firstSplitGains(
      df: DataFrame,
      target: String,
      candidates: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count()
    val groupCols = (candidates :+ target).distinct
    val countDf = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("count"))
    val pre = weightedEntropy(countDf, total, Nil, target)
    candidates.sorted.map { c =>
      val post = weightedEntropy(countDf, total, Seq(c), target)
      val nu = df.agg(count_distinct(col(c))).first().getLong(0)
      (c, pre - post, (pre - post) / math.log(nu.toDouble))
    }.toDF("column_name", "gain", "normalized_gain")
  }
}
