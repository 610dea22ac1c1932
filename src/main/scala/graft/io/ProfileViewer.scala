package graft.io

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.profile.ProfileSchema

/** Viewer over stored `why_profile` delimited binaries — the engine's
  * equivalent of the reference's profile-binary-to-JSON CLI
  * (cli/src/main/java/com/whylogs/cli/ProfileViewer.java): point it at a
  * directory written by [[ProfileIO.writeDelimitedBinaries]] and get the
  * same per-column summaries [[ProfileIO.jsonSummary]] produces from live
  * profile frames.
  *
  * Spark-first shape: files load through the `binaryFile` source, each
  * file's delimited stream splits into per-profile blobs that parse ON
  * EXECUTORS after a repartition (the reference CLI is single-threaded
  * driver-style; here even ONE big file fans out), and summaries render
  * through the SAME [[ProfileSchema.summarize]] → drop-sketch-fields →
  * `to_json` pipeline as the live JSON sink, so stored and live summaries
  * are field-for-field identical.
  */
object ProfileViewer {

  val OutputSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    // position of the profile inside its file's delimited stream —
    // distinct stored profiles often share identity fields (one sink call
    // writes many group profiles under one sessionId), so (file, index)
    // is the only safe profile key
    StructField("profile_index", IntegerType),
    StructField("session_id", StringType),
    StructField("session_timestamp", LongType),
    StructField("data_timestamp", LongType),
    StructField("column_name", StringType),
    StructField("profile", ProfileSchema.schema)))

  /** One row per (stored profile, column): identity fields + the full
    * profile struct (queryable with plain SQL, same schema as live
    * profile frames).
    *
    * Two stages so throughput scales with stored PROFILES, not with how
    * they were packed into files: stage 1 (one task per file) only walks
    * the varint boundaries of the delimited stream and emits raw message
    * blobs (memcpy, no protobuf work); the expensive parse + summarize
    * runs after a round-robin repartition, so a directory of a few large
    * multi-profile streams no longer serializes on a few tasks.
    */
  def view(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val blobs = bin.rdd.flatMap { r =>
      val file = r.getString(0)
      val in = new ByteArrayInputStream(r.getAs[Array[Byte]](1))
      Iterator.continually(Wire.readDelimited(in))
        .takeWhile(_.isDefined)
        .zipWithIndex
        .map { case (b, idx) => (file, idx, b.get) }
    }
    val rows = blobs
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (file, idx, bytes) =>
        val prof = ProfileProto.fromBytes(bytes)
        prof.columns.toSeq.sortBy(_._1).map { case (name, st) =>
          Row(file, idx, prof.sessionId, prof.sessionTimestamp,
            prof.dataTimestamp.getOrElse(-1L), name,
            ProfileSchema.summarize(st))
        }
      }
    spark.createDataFrame(rows, OutputSchema)
  }

  /** [[view]] over chunked MessageSegment streams
    * ([[ProfileSegments]]): same output schema, profiles reassembled by
    * marker per file on executors.
    */
  def viewSegments(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val rows = bin.rdd.flatMap { r =>
      val file = r.getString(0)
      val profiles = ProfileSegments.readDelimited(
        new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      profiles.zipWithIndex.flatMap { case (prof, idx) =>
        prof.columns.toSeq.sortBy(_._1).map { case (name, st) =>
          Row(file, idx, prof.sessionId, prof.sessionTimestamp,
            prof.dataTimestamp.getOrElse(-1L), name,
            ProfileSchema.summarize(st))
        }
      }
    }
    spark.createDataFrame(rows, OutputSchema)
  }

  /** [[view]] rendered as JSON summaries: one row per stored profile,
    * `summary_json` = {"col": {metrics...}, ...} with sketch binaries
    * dropped — the shape [[ProfileIO.jsonSummary]] emits for live frames.
    */
  def viewJson(spark: SparkSession, path: String): DataFrame = {
    val perColumn = view(spark, path)
      .withColumn("profile",
        col("profile").dropFields("state", "numbers.kll", "numbers.theta",
          "strings.theta", "cardinality.hll"))
    perColumn
      .groupBy(col("file"), col("profile_index"), col("session_id"),
        col("session_timestamp"), col("data_timestamp"))
      .agg(map_from_entries(
        collect_list(struct(col("column_name"), col("profile"))))
        .as("columns"))
      .select(col("file"), col("profile_index"), col("session_id"),
        col("session_timestamp"), col("data_timestamp"),
        to_json(col("columns")).as("summary_json"))
  }
}
