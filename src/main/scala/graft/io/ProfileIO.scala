package graft.io

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.metrics.ColumnProfileState
import graft.profile.ProfileSchema

/** Builds a whylogs `DatasetProfileMessage` binary from the per-column
  * profile `state` binaries of one profile row — the export edge runs as a
  * per-row expression on executors (no driver collect).
  */
case class DatasetProfileProtoExpr(
    names: Seq[String],
    children: Seq[Expression],
    sessionId: String,
    sessionTimestamp: Long,
    tags: Map[String, String] = Map.empty,
    metadata: Map[String, String] = Map.empty,
    modelSpec: Option[DatasetProfileProtoExpr.ModelSpec] = None,
    segmentTagNames: Seq[String] = Nil)
    extends Expression with CodegenFallback {

  // child layout: names.length column states, then segmentTagNames.length
  // group-key columns (their per-row values become whylogs.tag.* entries,
  // the reference's SegmentTag semantics — WhyLogs.scala:205-212), then
  // the optional model-metrics struct LAST
  require(children.length ==
    names.length + segmentTagNames.length + modelSpec.size)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dataset_profile_proto"

  @transient private lazy val modelConverter =
    CatalystTypeConverters.createToScalaConverter(children.last.dataType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cols = names.zip(children.take(names.length)).flatMap { case (n, c) =>
      Option(c.eval(input)).map { v =>
        n -> ColumnProfileState.deserialize(v.asInstanceOf[Array[Byte]])
      }
    }.toMap
    val segmentTags = segmentTagNames.zip(
      children.slice(names.length, names.length + segmentTagNames.length))
      .flatMap { case (k, c) =>
        Option(c.eval(input)).map { v =>
          (ProfileProto.TagPrefix + k) -> String.valueOf(v)
        }
      }.toMap
    val model = modelSpec.flatMap { spec =>
      Option(children.last.eval(input)).map { v =>
        val row = modelConverter(v).asInstanceOf[Row]
        spec match {
          case DatasetProfileProtoExpr.ClassificationSpec(p, t, s) =>
            val labels = row.getSeq[String](row.fieldIndex("labels"))
            val cells = row.getSeq[Row](row.fieldIndex("cells")).map { c =>
              val m = new graft.metrics.Moments
              m.count = c.getAs[Long]("count")
              m.sum = c.getAs[Double]("score_sum")
              m.mean = c.getAs[Double]("score_mean")
              m.min = c.getAs[Double]("score_min")
              m.max = c.getAs[Double]("score_max")
              m.m2 = c.getAs[Double]("score_m2")
              (c.getAs[String]("prediction"), c.getAs[String]("target")) -> m
            }.toMap
            ProfileProto.ClassificationProto(labels, p, t, s, cells)
          case DatasetProfileProtoExpr.RegressionSpec(p, t) =>
            ProfileProto.RegressionProto(p, t,
              row.getAs[Double]("sum_abs_diff"),
              row.getAs[Double]("sum_diff"),
              row.getAs[Double]("sum2_diff"),
              row.getAs[Long]("count"))
        }
      }
    }
    ProfileProto.toBytes(ProfileProto.DatasetProfile(
      sessionId, sessionTimestamp, None, tags ++ segmentTags, metadata,
      cols), model)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(children = c)
}

object DatasetProfileProtoExpr {
  /** Which model-metrics struct rides the export and its field names
    * (ModelMetricsMessage — ModelMetrics.java:44-54).
    */
  sealed trait ModelSpec
  final case class ClassificationSpec(
      prediction: String, target: String, score: String) extends ModelSpec
  final case class RegressionSpec(
      prediction: String, target: String) extends ModelSpec
}

/** Parses exact per-column statistics back out of a `DatasetProfileMessage`
  * binary — the reader half of the codec, usable in a plan for round-trip
  * verification and for merging profiles produced by other writers.
  */
case class ProtoColumnStats(child: Expression, colName: String)
    extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = ProtoColumnStats.schema
  override def prettyName: String = "proto_column_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected binary, got $t")
  }

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(ProtoColumnStats.schema)

  override def nullSafeEval(input: Any): Any = {
    val profile = ProfileProto.fromBytes(input.asInstanceOf[Array[Byte]])
    profile.columns.get(colName).map { st =>
      val n = st.numbers
      toCatalyst(Row(
        st.count, st.nullCount, st.trueCount, n.count,
        if (n.count > 0) n.finalMin else null,
        if (n.count > 0) n.finalMax else null,
        if (n.count > 0) n.finalSum else null,
        if (n.count > 0) n.variance.mean else null,
        st.strings.count,
        if (st.hll != null) st.hll.getEstimate else null))
    }.orNull
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ProtoColumnStats {
  val schema: StructType = StructType(Seq(
    StructField("count", LongType),
    StructField("null_count", LongType),
    StructField("true_count", LongType),
    StructField("num_count", LongType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("sum", DoubleType),
    StructField("mean", DoubleType),
    StructField("string_count", LongType),
    StructField("cardinality", DoubleType)))
}

/** Session tags parsed back out of a `DatasetProfileMessage` binary —
  * map<string,string> from the DatasetProperties tag entries
  * (DatasetProfile.java:43, tags written by [[DatasetProfileProtoExpr]]).
  */
case class ProtoTags(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = MapType(StringType, StringType)
  override def prettyName: String = "proto_tags"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected binary, got $t")
  }

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(dataType)

  override def nullSafeEval(input: Any): Any =
    toCatalyst(ProfileProto.fromBytes(input.asInstanceOf[Array[Byte]]).tags)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Profile export sinks: whylogs protobuf wire format and JSON summaries —
  * the engine's equivalents of the reference's delimited-protobuf and JSON
  * outputs (DatasetProfile.java:316-325, cli/Profiler.java:150-168).
  */
object ProfileIO {

  private def profileStructCols(profiles: DataFrame): Seq[String] =
    profiles.schema.fields.collect {
      case f if ProfileSchema.isProfileType(f.dataType) => f.name
    }.toSeq

  /** Resolve a profile COLUMN whose name may carry dots (flattened
    * nested leaves like "arr.size") — unquoted, col() would walk it as
    * a field path into a sibling struct.
    */
  private def qcol(name: String): Column =
    if (name.contains(".")) col(s"`$name`") else col(name)

  /** Append a `why_profile` binary column carrying the full
    * DatasetProfileMessage of each profile row (built on executors).
    */
  def withProtoColumn(
      profiles: DataFrame,
      sessionId: String = "graft",
      sessionTimestamp: Long = 0L,
      outputCol: String = "why_profile",
      tags: Map[String, String] = Map.empty,
      metadata: Map[String, String] = Map.empty,
      model: Option[(String, DatasetProfileProtoExpr.ModelSpec)] = None,
      segmentTagCols: Seq[String] = Nil): DataFrame = {
    val cols = profileStructCols(profiles)
    val expr = DatasetProfileProtoExpr(
      cols,
      cols.map(c => GraftBridge.expression(qcol(c).getField("state"))) ++
        segmentTagCols.map(c => GraftBridge.expression(col(c))) ++
        model.map { case (cn, _) => GraftBridge.expression(col(cn)) },
      sessionId, sessionTimestamp, tags, metadata, model.map(_._2),
      segmentTagCols)
    profiles.withColumn(outputCol, GraftBridge.column(expr))
  }

  /** Exact stats parsed back from a proto binary column (round-trip read). */
  def protoColumnStats(proto: Column, colName: String): Column =
    GraftBridge.column(ProtoColumnStats(GraftBridge.expression(proto), colName))

  /** Session tags parsed back from a proto binary column. */
  def protoTags(proto: Column): Column =
    GraftBridge.column(ProtoTags(GraftBridge.expression(proto)))

  /** JSON summary per profile row: every metric of every profiled column as
    * one JSON document (sketch/state binaries dropped — summaries are for
    * humans and downstream JSON consumers).
    */
  def jsonSummary(profiles: DataFrame): DataFrame = {
    val structCols = profileStructCols(profiles)
    val keep = profiles.schema.fields.collect {
      case f if !structCols.contains(f.name) => col(f.name)
    }.toSeq
    val summaries = structCols.map { c =>
      qcol(c).dropFields("state", "numbers.kll", "numbers.theta",
        "strings.theta", "cardinality.hll").as(c)
    }
    profiles.select(keep ++ Seq(
      to_json(struct(summaries: _*)).as("summary_json")): _*)
  }

  /** [[jsonSummary]] with CALLER-SUPPLIED histogram split points for the
    * named columns (reference SummaryConverters.java:164-221: edges become
    * [sketch min] ++ splits ++ [sketch max]); unnamed columns keep the
    * default equal-width histogram.
    */
  def jsonSummary(profiles: DataFrame,
      splitpoints: Map[String, Seq[Double]]): DataFrame = {
    val structCols = profileStructCols(profiles)
    val keep = profiles.schema.fields.collect {
      case f if !structCols.contains(f.name) => col(f.name)
    }.toSeq
    val summaries = structCols.map { c =>
      val base =
        if (splitpoints.contains(c))
          qcol(c).withField("numbers.histogram",
            graft.functions.kll_histogram_splits(
              qcol(c).getField("numbers").getField("kll"), splitpoints(c)))
        else qcol(c)
      base.dropFields("state", "numbers.kll", "numbers.theta",
        "strings.theta", "cardinality.hll").as(c)
    }
    profiles.select(keep ++ Seq(
      to_json(struct(summaries: _*)).as("summary_json")): _*)
  }

  /** Write each profile row as a delimited DatasetProfileMessage, one
    * `.bin` file per partition under `dir` (local/NFS path; executors
    * write their own partitions — no driver collect).
    */
  def writeDelimitedBinaries(profiles: DataFrame, dir: String,
      sessionId: String = "graft"): Unit = {
    val withProto = withProtoColumn(profiles, sessionId).select(col("why_profile"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    withProto.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val name = f"profiles-part-${java.util.UUID.randomUUID()}.bin"
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(s"$dir/$name"))
        try it.foreach { r =>
          val b = r.getAs[Array[Byte]](0)
          val w = new Wire.Writer
          w.varint(b.length.toLong)
          out.write(w.toByteArray)
          out.write(b)
        } finally out.close()
      }
    }
  }
}
