package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.profile.ProfileSession.ProfilingOps

/** Stored-binary viewer: write delimited why_profile binaries with the
  * existing sink, read them back with [[ProfileViewer]], and the
  * summaries must equal the live [[ProfileIO.jsonSummary]] path —
  * metrics AND rendered JSON (the reference CLI's binary→JSON contract,
  * cli/ProfileViewer.java).
  */
class ProfileViewerSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def profiles = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .newProfilingSession().groupBy("l_returnflag").aggProfiles()

  test("viewed binaries reproduce the live JSON summary per group") {
    val dir = Files.createTempDirectory("viewer-spec").toString
    // persist: the sink and the live-summary paths must consume the SAME
    // materialized profile rows — KLL compaction above sketch capacity is
    // randomized, so two executions yield equal-accuracy but not
    // bit-identical histograms
    val prof = profiles.persist()
    ProfileIO.writeDelimitedBinaries(prof, dir)

    // live path (q28's): summary JSON straight from the profile frame
    val live = ProfileIO.jsonSummary(prof)
      .select(get_json_object(col("summary_json"), "$.l_quantity").as("lq"))
      .collect().map(_.getString(0)).toSet

    // stored path: binaries -> viewer -> same JSON rendering
    val stored = ProfileViewer.viewJson(spark, s"$dir/*.bin")
      .select(get_json_object(col("summary_json"), "$.l_quantity").as("lq"))
      .collect().map(_.getString(0)).toSet

    stored shouldBe live
    stored.size shouldBe 3 // one distinct summary per return flag
    // spot-check a metric is really in there
    stored.foreach { js =>
      js should include ("\"count\":")
      js should include ("\"numbers\":")
    }
    prof.unpersist()
  }

  test("viewer parallelism scales with profiles, not files") {
    val dir = Files.createTempDirectory("viewer-par").toString
    // pack ALL group profiles into ONE delimited file
    val prof = profiles.coalesce(1).persist()
    ProfileIO.writeDelimitedBinaries(prof, dir)
    Files.list(java.nio.file.Paths.get(dir)).count() shouldBe 1
    val viewed = ProfileViewer.view(spark, s"$dir/*.bin")
    // the parse stage must fan out past the single input file
    viewed.rdd.getNumPartitions shouldBe
      spark.sparkContext.defaultParallelism
    viewed.select(col("profile_index")).distinct().count() shouldBe 3
    prof.unpersist()
  }

  test("segmented files view to the same rows as whole-message files") {
    val prof = profiles.persist()
    val plainDir = Files.createTempDirectory("viewer-plain").toString
    ProfileIO.writeDelimitedBinaries(prof, plainDir)

    // re-write the same profiles as chunked MessageSegments (driver-side
    // is fine: the segment writer is the export edge, fixture scale)
    val segDir = Files.createTempDirectory("viewer-seg").toString
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(s"$segDir/profiles.seg"))
    try {
      val bins = ProfileViewer.view(spark, s"$plainDir/*.bin")
      val byProfile = bins.collect()
        .groupBy(r => (r.getString(0), r.getInt(1)))
      // rebuild DatasetProfiles from EVERY stored binary via the codec
      var i = 0
      new java.io.File(plainDir).listFiles()
        .filter(_.getName.endsWith(".bin")).foreach { f =>
          val ins = new java.io.FileInputStream(f)
          try {
            var next = ProfileProto.readDelimited(ins)
            while (next.isDefined) {
              ProfileSegments.writeDelimited(out, next.get, s"marker-$i",
                maxChunkContentBytes = 4096)
              next = ProfileProto.readDelimited(ins)
              i += 1
            }
          } finally ins.close()
        }
      byProfile.size should be >= 1
    } finally out.close()

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("column_name"), col("profile.count"),
        col("profile.numbers.sum"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.toString).getOrElse(""))).toSeq.sorted
    key(ProfileViewer.viewSegments(spark, s"$segDir/*.seg")) shouldBe
      key(ProfileViewer.view(spark, s"$plainDir/*.bin"))
    prof.unpersist()
  }

  test("view returns one row per (profile, column) with full structs") {
    val dir = Files.createTempDirectory("viewer-spec2").toString
    val prof = profiles
    ProfileIO.writeDelimitedBinaries(prof, dir)
    val v = ProfileViewer.view(spark, s"$dir/*.bin")
    val nProfiledCols = prof.columns.count(_ != "l_returnflag")
    v.count() shouldBe 3L * nProfiledCols
    v.schema.fieldNames should contain allOf ("session_id", "column_name",
      "profile")
    // per-column stats are queryable with plain SQL on the struct
    val qty = v.filter(col("column_name") === "l_quantity")
      .select(sum(col("profile.count")).as("n"))
      .collect().head.getLong(0)
    qty shouldBe spark.read.parquet(s"$sfDir/lineitem.parquet").count()
  }
}
