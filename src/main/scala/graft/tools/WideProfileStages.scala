package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.profile.ProfileSession.ProfilingOps

/** Stage-level meter for the wide-profile bench shape: runs profile_wideN
  * passes and prints each stage's wall time, task time, GC time, input
  * and shuffle volumes — the attribution tool for the wide608 gap
  * (map-stage update cost vs merge tail vs GC).
  *
  *   sbt -batch "runMain graft.tools.WideProfileStages [nCols] [passes] [sfDir]"
  */
object WideProfileStages {
  def main(args: Array[String]): Unit = {
    val nCols = args.headOption.map(_.toInt).getOrElse(608)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .appName("wide-profile-stages")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var stages =
      List.empty[(Int, Long, Long, Long, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages = (i.stageId, wall, m.executorRunTime, m.jvmGCTime,
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, i.numTasks) :: stages
      }
    })

    val numeric = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def run(): Double = {
      val wide = li.select((0 until nCols).map(i =>
        (col(numeric(i % numeric.length)) + lit(i)).as(s"c$i")): _*)
      val plan = wide.newProfilingSession().aggProfiles()
      val t0 = System.nanoTime()
      plan.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to passes).foreach { p =>
      stages = Nil
      val sec = run()
      println(f"=== pass $p: $sec%.2f s")
      val gcTotal = stages.map(_._4).sum
      stages.sortBy(_._1).foreach {
        case (id, wall, cpu, gc, in, sr, sw, nt) =>
          println(f"  stage $id%3d  wall=${wall / 1e3}%7.2fs  " +
            f"taskTime=${cpu / 1e3}%8.2fs  gc=${gc / 1e3}%6.2fs  " +
            f"input=${in / 1e6}%8.1fMB  shufR=${sr / 1e6}%8.1fMB  " +
            f"shufW=${sw / 1e6}%8.1fMB  tasks=$nt%3d")
      }
      println(f"  total task GC: ${gcTotal / 1e3}%.2f s")
    }
    spark.stop()
  }
}
