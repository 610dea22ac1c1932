package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase attribution for the graph bench rows (dev aid, not a receipt):
  * meters the edge-build join, the one-time normalize/node setup, and
  * the marginal cost per power iteration by diffing pageRank calls at
  * increasing iteration counts — run twice, the second (warm) block is
  * the one to read. Usage:
  *   GraphPhase <sfDir>
  */
object GraphPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-graph-phase").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    def t(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")
    def edges: DataFrame = {
      val o = t("orders"); val li = t("lineitem")
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst"))
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      time("edges_build_count")(edges.count())
      // mirror pageRank's setup steps (the window-normalize shape)
      // with separate actions
      time("setup_total") {
        val w = lit(1.0)
        val e0 = edges
          .filter(col("src").isNotNull && col("dst").isNotNull && w > 0)
          .groupBy(col("src"), col("dst")).agg(sum(w).as("w"))
        val norm = time("  norm_persist") {
          val f = e0.select(col("src"), col("dst"),
            (col("w") / sum(col("w")).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("src")))).as("p"))
            .persist()
          f.count(); f
        }
        val nodes = time("  nodes_persist") {
          val f = norm.select(col("src").as("node"))
            .union(norm.select(col("dst").as("node")))
            .distinct().persist()
          f.count(); f
        }
        val dangling = time("  dangling_persist") {
          val f = nodes.join(
            norm.select(col("src").as("node")).distinct(),
            Seq("node"), "left_anti").persist()
          f.count(); f
        }
        val n = nodes.count().toDouble
        val ranks = time("  ranks_init") {
          val f = nodes.select(col("node"), lit(1.0 / n).as("rank")).persist()
          f.count(); f
        }
        Seq(norm, nodes, dangling, ranks).foreach(_.unpersist(blocking = false))
      }
      Seq(1, 2, 3).foreach { it =>
        time(s"pagerank_it$it") {
          val (r, rel) = graft.ops.Graph.pageRankReleasable(
            edges, "src", "dst", None, iterations = it)
          try r.queryExecution.toRdd.count() finally rel()
        }
      }
      time("hits_it1") {
        val (r, rel) = graft.ops.Graph.hitsReleasable(
          edges, "src", "dst", iterations = 1)
        try r.queryExecution.toRdd.count() finally rel()
      }
      time("hits_it2") {
        val (r, rel) = graft.ops.Graph.hitsReleasable(
          edges, "src", "dst", iterations = 2)
        try r.queryExecution.toRdd.count() finally rel()
      }
      time("lpa_it3") {
        val (r, rel) = graft.ops.Graph.labelPropagationReleasable(
          edges, "src", "dst", iterations = 3)
        try r.queryExecution.toRdd.count() finally rel()
      }
    }
    spark.stop()
  }
}
