package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.profile.ProfileSession.ProfilingOps

/** Reproducible scale receipt for the FLAGSHIP surface — wide grouped
  * profiling — at row counts the sf0.1 bench can't show (600k rows):
  * `nRows` synthetic rows x `nNum` numeric + `nStr` string columns,
  * profiled in ONE pass grouped by `nGroups` keys, exactly the
  * single-ObjectHashAggregate plan of the bench's profile rows.
  *
  * Column synthesis is row-local (hash-derived — no shuffle before the
  * aggregate) and exercises every sketch for real: numeric columns draw
  * from ~1M distinct values (KLL/theta/HLL saturate), string columns
  * cycle cardinalities 10 / 1k / 100k (frequent-items both below and
  * above its k, plus a heavy-hitter regime).
  *
  * Prints ONE JSON line: wall seconds (min of `passes`, first pass
  * separately — JIT visible, the bench convention), rows/s, profile
  * rows (must equal nGroups), and serialized wire bytes per
  * (profile x column) — the reference's headline invariant, which must
  * stay flat no matter how many rows streamed through.
  *
  *   sbt -batch "runMain graft.tools.ProfileScale [nRows] [nNum] [nStr] [nGroups]"
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nNum = args.lift(1).map(_.toInt).getOrElse(40)
    val nStr = args.lift(2).map(_.toInt).getOrElse(10)
    val nGroups = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("profile-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val strCards = Array(10L, 1000L, 100000L)
    val wide = spark.range(nRows).select(
      (pmod(col("id"), lit(nGroups))).cast("string").as("g") +:
      ((0 until nNum).map { i =>
        // ~1M distinct doubles per column, column-specific stream
        (pmod(xxhash64(col("id") + lit(i.toLong * 1000003L)), lit(1000000L))
          .cast("double") / 997.0).as(s"n$i")
      } ++
      (0 until nStr).map { i =>
        val card = strCards(i % strCards.length)
        concat(lit(s"v${i}_"),
          pmod(xxhash64(col("id") * 31L + lit(i.toLong)), lit(card))
            .cast("string")).as(s"s$i")
      }): _*)

    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "3").toInt
    var firstSec = -1.0
    var minSec = Double.MaxValue
    var profRows = -1L
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      // count() would let Catalyst prune every profile UDAF (the r16
      // bench finding); counting the plan's own output forces them all
      profRows = wide.newProfilingSession().groupBy("g").aggProfiles()
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (p == 1) firstSec = sec
      minSec = math.min(minSec, sec)
      System.err.println(f"[profile-scale] pass $p: $sec%.1f s")
    }
    require(profRows == nGroups, s"expected $nGroups profiles, got $profRows")

    // the headline invariant: serialized profile bytes per column must be
    // sketch-bounded (flat in nRows)
    val prof = wide.newProfilingSession().groupBy("g").aggProfiles()
    val r = graft.io.ProfileIO.withProtoColumn(prof)
      .agg(sum(length(col("why_profile"))), count(lit(1))).first()
    val bytesPerColumn =
      r.getLong(0).toDouble / (r.getLong(1) * (nNum + nStr))

    println(
      s"""{"metric":"profile_scale","n_rows":$nRows,""" +
      s""""n_cols":${nNum + nStr},"n_groups":$nGroups,""" +
      f""""wall_sec":$minSec%.1f,"first_pass_sec":$firstSec%.1f,""" +
      f""""rows_per_sec":${nRows / minSec}%.0f,""" +
      f""""bytes_per_column":$bytesPerColumn%.0f}""")
    spark.stop()
  }
}
