package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan/profile dump for individual bench rows: builds the EXACT bench
  * frame for the named row, prints `explain("formatted")` before and
  * after execution (AQE final plan), the executed stage task counts, and
  * wall seconds for one forced pass. An optimization-round instrument
  * (guide section 1: measure first), never a query path.
  *
  *   sbt -batch "runMain graft.tools.RowPlan <row> [sfDir]"
  */
object RowPlan {
  def main(args: Array[String]): Unit = {
    val row = args.headOption.getOrElse("fuzzy_join")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // before/after lever for the r18 spread plans:
      // SPARK_GRAFT_SPREAD=false dumps the pre-r18 plan shape
      .config("spark.graft.spreadNarrow",
        sys.env.getOrElse("SPARK_GRAFT_SPREAD", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")

    // the frames mirror Bench.scala's rows verbatim
    val frames: Map[String, () => (DataFrame, () => Unit)] = Map(
      "fuzzy_join" -> (() => {
        val c = t("customer").filter(col("c_custkey") <= 1200)
          .select(col("c_custkey").as("id"), col("c_name").as("name"))
        (graft.ops.Joins.fuzzyJoin(c, c, "id", "name", maxDist = 1),
          () => ())
      }),
      "knn_label_noise" -> (() =>
        (graft.ops.Similarity.knnLabelNoise(t("embeddings"),
          "vec_id", "embedding", "label", k = 10), () => ())),
      "substring_dedup" -> (() =>
        (graft.ops.Dedup.duplicatedSpans(t("documents"), "doc_id", "text",
          windowTokens = 8, minDocs = 2), () => ())),
      "table_checksum" -> (() =>
        (graft.ops.Diagnostics.tableChecksum(t("lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_returnflag")), () => ())),
      "trigram_perplexity" -> (() =>
        (graft.ops.TextOps.trigramPerplexity(t("documents"), "doc_id",
          "text", minCount = 2L), () => ())),
      "label_prop" -> (() => {
        val o = t("orders"); val li = t("lineitem")
        val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("s:"), col("l_suppkey")).as("dst"))
        val (lbl, rel) = graft.ops.Graph.labelPropagationReleasable(
          edges, "src", "dst", iterations = 3)
        (lbl, rel)
      }),
      "triangles" -> (() => {
        val li = t("lineitem").filter(col("l_orderkey") <= 40000)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val edges = li.join(li.withColumnRenamed("p", "p2"), Seq("o"))
          .filter(col("p") < col("p2"))
          .select(col("p").as("src"), col("p2").as("dst"))
        (graft.ops.Graph.triangleStats(edges, "src", "dst"), () => ())
      })
    )
    val (df, rel) = frames(row)()
    try {
      println(s"==== $row: initial plan ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"==== $row: rows=$n wall=$sec%.3f s ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    } finally rel()
    spark.stop()
  }
}
