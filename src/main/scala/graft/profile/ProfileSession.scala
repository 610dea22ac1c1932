package graft.profile

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.{profile => profileAgg, profile_merge}
import graft.metrics.ProfileConfig
import graft.model.ConfusionMatrixAgg

/** Builder API for dataset profiling — the engine's equivalent of the
  * reference's WhyProfileSession
  * (/root/reference/spark/src/main/scala/com/whylogs/spark/WhyLogs.scala:40-177),
  * re-planned Spark-first:
  *
  *   - ONE pass, ONE shuffle: `groupBy(keys ++ window).agg(one profile
  *     aggregate per column)` planned by Catalyst as ObjectHashAggregate
  *     with map-side partial aggregation. No 100-column chunking, no
  *     union + re-merge second shuffle (the reference needed both because
  *     its buffer was a single Java-serialized object graph,
  *     WhyLogs.scala:146-176); our buffers are compact sketch bytes.
  *   - Output is a typed struct per column (queryable with plain SQL),
  *     `state` binary inside each struct re-aggregates via
  *     [[graft.functions.profile_merge]].
  *   - Time bucketing generalizes the reference's pre-truncated time column
  *     to `window(ts, cadence)`.
  *
  * At 100 TB: shuffle volume is (groups x columns x KBs of sketch),
  * independent of input rows; no collect, no driver-side state.
  */
case class ProfileSession(
    df: DataFrame,
    name: String = "profile",
    groupKeys: Seq[String] = Nil,
    timeColumn: Option[(String, String)] = None,
    classificationModel: Option[(String, String, Option[String])] = None,
    regressionModel: Option[(String, String)] = None,
    cfg: ProfileConfig = ProfileConfig.default,
    tags: Map[String, String] = Map.empty,
    metadata: Map[String, String] = Map.empty,
    parallelism: Option[Int] = None) {

  def groupBy(cols: String*): ProfileSession = copy(groupKeys = cols)

  /** Pin the update-pass parallelism: repartition the input to `n` before
    * aggregating. See the auto rule in [[aggProfiles]] for when this
    * matters; the explicit knob exists for inputs whose width makes the
    * round-robin shuffle worth sizing by hand.
    */
  def withParallelism(n: Int): ProfileSession = {
    require(n > 0, s"parallelism must be positive, got $n")
    copy(parallelism = Some(n))
  }

  /** Session tags, namespaced `whylogs.tag.` like the reference's
    * DatasetProfile.withTag (DatasetProfile.java:43,107-110). Tags ride
    * the exported wire profiles ([[exportProto]]) and intersect on merge.
    */
  def withTag(key: String, value: String): ProfileSession =
    copy(tags = tags + (graft.io.ProfileProto.TagPrefix + key -> value))

  /** Add every entry of `m` as a namespaced session tag. */
  def withTags(m: Map[String, String]): ProfileSession =
    m.foldLeft(this) { case (s, (k, v)) => s.withTag(k, v) }

  def withMetadata(key: String, value: String): ProfileSession =
    copy(metadata = metadata + (key -> value))

  /** Bucket profiles by a tumbling window over `col` (default 1 day). */
  def withTimeColumn(col: String, cadence: String = "1 day"): ProfileSession =
    copy(timeColumn = Some((col, cadence)))

  def withClassificationModel(predictionField: String, targetField: String,
      scoreField: Option[String] = None): ProfileSession =
    copy(classificationModel = Some((predictionField, targetField, scoreField)))

  def withRegressionModel(predictionField: String, targetField: String): ProfileSession =
    copy(regressionModel = Some((predictionField, targetField)))

  def withConfig(c: ProfileConfig): ProfileSession = copy(cfg = c)

  /** Columns that will be profiled (everything not a key/time/model field). */
  def profiledColumns: Seq[String] = {
    val excluded = reservedColumns
    df.columns.toSeq.filterNot(excluded)
  }

  private def reservedColumns: Set[String] =
    groupKeys.toSet ++ timeColumn.map(_._1).toSet ++
      classificationModel.toSeq.flatMap(m => Seq(m._1, m._2) ++ m._3).toSet ++
      regressionModel.toSeq.flatMap(m => Seq(m._1, m._2)).toSet

  /** Backtick-quote a profiled column name for resolution: flattened
    * nested leaves carry dots ("addr.city", "tags.size").
    */
  private def q(name: String): Column =
    if (name.contains(".")) col(s"`$name`") else col(name)

  /** Expand nested columns into profile-able LEAVES before aggregation —
    * the reference degrades every non-primitive value to UNKNOWN
    * (DatasetProfileAggregator.scala:92-97, TypedDataConverter.java:32-60);
    * a Spark-native engine sees inside:
    *
    *   - struct fields recurse STATICALLY to dotted paths
    *     (`addr.city`) — column pruning still reaches the parquet scan
    *     (nested-field pruning keeps unprofiled siblings unread);
    *   - an array column contributes a `<name>.size` length profile
    *     plus an ELEMENT profile under its own name (the aggregate
    *     walks elements in-row — no explode, no extra shuffle); an
    *     array of structs contributes `<name>.size` plus one element
    *     profile per FIELD (`tags.key` — extracting a field from
    *     array<struct> is a Spark projection);
    *   - a map column contributes `<name>.size`, a `<name>.keys`
    *     element profile, and a map-VALUE element profile under its
    *     own name.
    *
    * Group/time/model columns are kept untouched. Idempotent on flat
    * frames. The one-shuffle plan shape of [[aggProfiles]] is
    * unchanged — flattening is a projection.
    */
  def flattenNested(): ProfileSession = {
    import org.apache.spark.sql.types._
    def expand(c: Column, name: String, dt: DataType): Seq[(Column, String)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f =>
            expand(c.getField(f.name), s"$name.${f.name}", f.dataType))
        case ArrayType(et, _) =>
          val sizeCol = (size(c).as(s"$name.size"), s"$name.size")
          // element expansion for array<struct>: each field extraction
          // is itself an array (`arr.f`: array<fieldType>) and profiles
          // as an ELEMENT profile — but NO inner size column:
          // size(arr.f) == size(arr) for every field, and `$name.size`
          // already profiles it once
          def expandElem(ec: Column, ename: String,
              edt: DataType): Seq[(Column, String)] = edt match {
            case est: StructType =>
              est.fields.toSeq.flatMap(f =>
                expandElem(ec.getField(f.name), s"$ename.${f.name}",
                  f.dataType))
            case _ => Seq((ec.as(ename), ename))
          }
          et match {
            case est: StructType =>
              sizeCol +: est.fields.toSeq.flatMap(f =>
                expandElem(c.getField(f.name), s"$name.${f.name}",
                  f.dataType))
            case _ => Seq((c.as(name), name), sizeCol)
          }
        case MapType(kt, _, _) =>
          Seq((c.as(name), name),
            (size(c).as(s"$name.size"), s"$name.size"),
            (map_keys(c).as(s"$name.keys"), s"$name.keys"))
        case _ => Seq((c.as(name), name))
      }
    val keep = reservedColumns
    val named = df.schema.fields.toSeq.flatMap { f =>
      if (keep(f.name)) Seq((col(f.name), f.name))
      else expand(col(f.name), f.name, f.dataType)
    }
    // a leaf path can collide with a literal input column ("arr.size"
    // next to an array "arr") — fail loudly; a silent duplicate would
    // make every downstream by-name resolution ambiguous
    val dupes = named.map(_._2).groupBy(identity).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"flattenNested would produce duplicate column names: " +
        s"${dupes.mkString(", ")} — rename the colliding input columns")
    copy(df = df.select(named.map(_._1): _*))
  }

  /** The profile DataFrame: one row per (group keys x time window), one
    * profile struct column per profiled input column, plus model metrics.
    *
    * UPDATE-PASS PARALLELISM: the sketch updates are CPU-bound per cell
    * (~0.5-1 us: String.valueOf + HLL + frequent-items + KLL + theta per
    * value, the reference's exact per-value semantics,
    * ColumnProfile.java:80-122), and they run in the PARTIAL aggregate —
    * i.e. on the input's own partitions. An under-split input (one 70 MB
    * parquet file = 1-3 splits) therefore serializes the whole update
    * pass through a few cores while the cluster idles: measured at sf0.1,
    * a 150-column profile took 22.5 s on the scan's 3 splits vs 7 s
    * repartitioned to 32. When the input has at most HALF the session's
    * shuffle parallelism and no explicit [[withParallelism]] is set, the
    * input is round-robin repartitioned to `spark.sql.shuffle.partitions`
    * first — one extra data shuffle, bought exactly when cores would
    * otherwise idle. At 100 TB the rule self-disables: a real corpus scan
    * has thousands of splits, so profiles stay single-shuffle
    * (states-only). Streaming inputs skip the rule (partitioning is the
    * stream's own concern); `spark.graft.profile.autoParallelize=false`
    * opts out.
    *
    * DETERMINISM: sketch-derived fields (HLL/theta/KLL/frequent-items
    * bytes and their estimates) are merge-order-insensitive as
    * SUMMARIES but not byte-identical across independent recomputations
    * once the input is repartitioned (partial-merge arrival order is
    * scheduler-dependent — this includes the auto-parallelize
    * round-robin above on previously single-partition inputs). Exact
    * counters (counts, min/max/sum, type counts) are always exact.
    * Self-joins of a profile frame with itself should persist() the
    * frame first so both sides read one materialization.
    *
    * Building the plan also installs [[graft.plans.NarrowRepartitionRule]]
    * into the session's extra optimizations (session-wide, idempotent,
    * a no-op on non-profile plans) unless GraftExtensions already
    * provides it.
    */
  def aggProfiles(): DataFrame = {
    val keyCols: Seq[Column] = groupKeys.map(col) ++
      timeColumn.map { case (c, cadence) => window(col(c), cadence).as("window") }

    val profileCols: Seq[Column] =
      profiledColumns.map(c => profileAgg(q(c), cfg).as(c))

    val modelCols: Seq[Column] =
      classificationModel.map { case (p, t, s) =>
        GraftBridge.column(ConfusionMatrixAgg(
          GraftBridge.expression(col(p)),
          GraftBridge.expression(col(t)),
          GraftBridge.expression(s.map(col).getOrElse(lit(1.0)))
        ).toAggregateExpression()).as("classification_metrics")
      }.toSeq ++
      regressionModel.map { case (p, t) =>
        val d = col(p) - col(t)
        struct(
          count(d).as("count"),
          sum(abs(d)).as("sum_abs_diff"),
          sum(d).as("sum_diff"),
          sum(d * d).as("sum2_diff"),
          (sum(abs(d)) / count(d)).as("mae"),
          (sum(d * d) / count(d)).as("mse"),
          sqrt(sum(d * d) / count(d)).as("rmse")
        ).as("regression_metrics")
      }.toSeq

    val aggCols = profileCols ++ modelCols
    // when the repartition below fires on a WIDENING projection, the
    // exchange must ship the narrow source rows, not the projected ones
    // (graft.plans.NarrowRepartitionRule); install the rewrite for
    // sessions not configured with graft.GraftExtensions
    ProfileSession.ensureNarrowShuffleRule(df.sparkSession)
    val base = parallelism match {
      case Some(n) => df.repartition(n)
      case None if !df.isStreaming &&
          df.sparkSession.conf
            .get("spark.graft.profile.autoParallelize", "true").toBoolean =>
        val target = df.sparkSession.conf
          .get("spark.sql.shuffle.partitions", "200").toInt
        // Only MAP-ONLY lineages are probed: under AQE, Dataset.rdd on a
        // plan containing ANY exchange EXECUTES those stages eagerly
        // (getFinalPhysicalPlan), breaking laziness and running the
        // upstream shuffles a second un-reused time when the profile
        // materializes. An input with an exchange already gets
        // shuffle-partition parallelism from it — under-splitting only
        // afflicts exchange-free shapes (file scans, in-memory frames),
        // and on those Dataset.rdd is genuinely plan-only (no stages to
        // run). Exotic sources that fail to plan fall back to as-is.
        val mapOnly =
          try df.queryExecution.sparkPlan.collectFirst {
            case e: org.apache.spark.sql.execution.exchange.Exchange => e
          }.isEmpty
          catch { case _: Throwable => false }
        val inParts =
          if (!mapOnly) target
          else try df.rdd.getNumPartitions catch { case _: Throwable => target }
        if (inParts * 2 <= target) df.repartition(target) else df
      case None => df
    }
    // WIDE GLOBAL profiles (no keys, no model metrics, >= 64 columns)
    // merge PER COLUMN: the single-group plan funnels every partition's
    // partial states into ONE reducer task, and at 608 columns that
    // final merge measured 7.8 s single-threaded (32 partials x 608
    // sketch merges + deserialize) of a ~21 s row. The r17 two-level
    // fan-in (pid%8 intermediate aggregate, then one 8-way
    // profile_merge) cut it to 3.2 s but still ran level 1 on only 8
    // threads and level 2 on one. Column merges are INDEPENDENT, so the
    // tail parallelizes fully: materialize one partial row per
    // shuffle-partition group (reduce-side merges are trivial),
    // posexplode the row's profile structs to (column-index, state)
    // rows, merge each column's partials in its own group via
    // profile_merge (the q03-oracled re-aggregation path — 608 groups
    // saturate every core; the explicit repartition stops AQE from
    // coalescing the ~10 MB-per-task state shuffle down to a handful of
    // tasks), and reassemble the single profile row through a keyed map
    // (608 entries, trivial). Shuffle volume is IDENTICAL to the
    // two-level plan — partitions x columns x sketch-KBs, independent
    // of input rows — only the merge parallelism changes. Narrow
    // profiles keep the historical single-exchange plan — their merge
    // tail is negligible and the oracle-pinned sketch VALUES stay on
    // the exact plan that pinned them.
    if (keyCols.isEmpty && modelCols.isEmpty && profiledColumns.size >= 64 &&
        df.sparkSession.conf
          .get("spark.graft.profile.twoLevelMerge", "true").toBoolean) {
      val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
      // the intermediate level finishes to RAW state binaries
      // (profile_state): its only consumer is profile_merge, and
      // summarizing partitions x columns intermediate structs was
      // stage-metered at ~half the wide608 row (summaries cost ~ms per
      // state; the struct is also ~2x the state bytes on the wire)
      val stateCols: Seq[Column] = profiledColumns.map(c =>
        graft.functions.profile_state(q(c), cfg).as(c))
      val partials = base
        .groupBy(pmod(spark_partition_id(), lit(p)).as("__mg"))
        .agg(stateCols.head, stateCols.tail: _*)
        .drop("__mg")
      val kv = partials
        .select(posexplode(array(profiledColumns.map(q): _*))
          .as(Seq("__i", "__st")))
        .repartition(p, col("__i"))
      val merged = kv.groupBy("__i")
        .agg(graft.functions.profile_merge(col("__st")).as("__m"))
      val assembled = merged
        .agg(map_from_entries(collect_list(struct(col("__i"), col("__m"))))
          .as("__all"))
      // Zero-row inputs: the first level's groupBy produces no groups, so
      // the map is empty and every getItem misses. The narrow single-level
      // plan returns count=0 profile structs there (the aggregate's finish
      // on initial state); preserve that contract by coalescing each column
      // with that same finish value, built DRIVER-SIDE as one literal.
      // The empty finish is column-type-independent (the buffer is
      // `new ColumnProfileState(cfg)` before any update; eval summarizes
      // it), so one literal serves all columns — the r18 shape (a
      // per-pass limit(0) N-column aggregate subplan + broadcast
      // crossJoin) re-analyzed, re-optimized and re-codegenned a second
      // N-wide aggregate every pass, measured at ~2x the wide608 row
      // (~12 -> ~21 s; see OPTIMIZATION_r19.md).
      val emptyFinish = {
        val st = new graft.metrics.ColumnProfileState(cfg)
        st.flush()
        GraftBridge.column(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            ProfileSchema.summarize(st), ProfileSchema.schema))
      }
      assembled
        .select(profiledColumns.zipWithIndex.map { case (c, i) =>
          coalesce(col("__all").getItem(i), emptyFinish).as(c)
        }: _*)
    }
    else if (keyCols.isEmpty) base.agg(aggCols.head, aggCols.tail: _*)
    else base.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** [[aggProfiles]] plus a `why_profile` wire-format binary column whose
    * DatasetProfileMessage carries this session's name, tags, metadata,
    * and — when a model is configured — the ModelProfileMessage
    * (classification score matrix / regression errors at field 10,
    * ModelProfile.java:36-41).
    */
  def exportProto(sessionTimestamp: Long = 0L): DataFrame = {
    val model: Option[(String, graft.io.DatasetProfileProtoExpr.ModelSpec)] =
      classificationModel.map { case (p, t, s) =>
        "classification_metrics" -> graft.io.DatasetProfileProtoExpr
          .ClassificationSpec(p, t, s.getOrElse(""))
      }.orElse(regressionModel.map { case (p, t) =>
        "regression_metrics" -> graft.io.DatasetProfileProtoExpr
          .RegressionSpec(p, t)
      })
    // group keys ride each row's wire profile as whylogs.tag.* entries —
    // the reference's SegmentTag semantics (WhyLogs.scala:205-212), so an
    // uploaded profile self-describes its segment
    graft.io.ProfileIO.withProtoColumn(aggProfiles(), name, sessionTimestamp,
      tags = tags, metadata = metadata, model = model,
      segmentTagCols = groupKeys)
  }
}

object ProfileSession {
  /** Install [[graft.plans.NarrowRepartitionRule]] into the session's
    * extra optimizations once (idempotent) — sessions configured with
    * `spark.sql.extensions=graft.GraftExtensions` get it there instead;
    * applying both is harmless (the rule is idempotent). NOTE: this
    * mutates SESSION-GLOBAL optimizer state as a side effect of plan
    * building (the rule is a no-op on plans without the profile
    * aggregate, but it does run on every query of the session
    * afterwards). The append is synchronized on the session's
    * `experimental` holder so a concurrent user append of their own
    * rule is never lost to a read-modify-write race.
    */
  private[profile] def ensureNarrowShuffleRule(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val ex = spark.experimental
    ex.synchronized {
      if (!ex.extraOptimizations.contains(graft.plans.NarrowRepartitionRule))
        ex.extraOptimizations =
          ex.extraOptimizations :+ graft.plans.NarrowRepartitionRule
    }
  }

  /** Merge stored profile rows (from [[ProfileSession.aggProfiles]]) down to
    * a coarser grouping: re-aggregation of profiles, no raw data needed.
    * `profileCols` default: every struct column carrying a profile state.
    */
  def mergeProfiles(profiles: DataFrame, keys: Seq[String]): DataFrame = {
    val profileCols = profiles.schema.fields.collect {
      case f if ProfileSchema.isProfileType(f.dataType) => f.name
    }.toSeq
    // flattened nested leaves carry dots ("arr.size") — quote so the
    // reference resolves the COLUMN, not a field path into a sibling
    val aggCols = profileCols.map(c =>
      profile_merge(if (c.contains(".")) col(s"`$c`") else col(c)).as(c))
    if (keys.isEmpty) profiles.agg(aggCols.head, aggCols.tail: _*)
    else profiles.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  implicit class ProfilingOps(val df: DataFrame) extends AnyVal {
    def newProfilingSession(name: String = "profile"): ProfileSession =
      ProfileSession(df, name)
  }
}
