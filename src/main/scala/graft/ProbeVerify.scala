package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.profile.ProfileSession
import graft.profile.ProfileSession.ProfilingOps

/** Runtime probe harness (verification aid, not shipped API). */
object ProbeVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    // P1: direct profile grouped by returnflag
    val direct = li.newProfilingSession()
      .groupBy("l_returnflag").aggProfiles()
      .select(col("l_returnflag"), col("l_quantity.count").as("cnt"),
        col("l_quantity.numbers.min").as("mn"), col("l_quantity.numbers.max").as("mx"),
        col("l_quantity.numbers.sum").as("sm"))
      .orderBy("l_returnflag").collect()

    // P2: fine profiles (flag x status) merged back to flag must equal direct
    val fine = li.newProfilingSession()
      .groupBy("l_returnflag", "l_linestatus").aggProfiles()
    val merged = ProfileSession.mergeProfiles(fine, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("l_quantity.count").as("cnt"),
        col("l_quantity.numbers.min").as("mn"), col("l_quantity.numbers.max").as("mx"),
        col("l_quantity.numbers.sum").as("sm"))
      .orderBy("l_returnflag").collect()
    println(s"P2 merge==direct: ${direct.sameElements(merged)} | direct=${direct.mkString(";")} merged=${merged.mkString(";")}")

    // P3: partition invariance on exact metrics
    val repart = li.repartition(7).newProfilingSession()
      .groupBy("l_returnflag").aggProfiles()
      .select(col("l_returnflag"), col("l_quantity.count").as("cnt"),
        col("l_quantity.numbers.min").as("mn"), col("l_quantity.numbers.max").as("mx"),
        col("l_quantity.numbers.sum").as("sm"))
      .orderBy("l_returnflag").collect()
    println(s"P3 repartition(7)==direct: ${direct.sameElements(repart)}")

    // P4: nulls + NaN -> NULL semantics
    import spark.implicits._
    val withNulls = Seq[java.lang.Double](1.0, null, Double.NaN,
      Double.PositiveInfinity, 2.0).toDF("x")
    val p4 = withNulls.agg(functions.profile($"x").as("p"))
      .select($"p.count", $"p.null_count", $"p.numbers.count",
        $"p.numbers.min", $"p.numbers.max").collect()(0)
    println(s"P4 null semantics (expect 5,3,2,1.0,2.0): $p4")

    // P5: SQL registration end-to-end
    functions.registerAll(spark)
    li.createOrReplaceTempView("lineitem")
    val p5 = spark.sql(
      """SELECT l_returnflag,
        |       kll_quantile(kll_agg(l_quantity), 0.5d) AS median,
        |       cast(theta_estimate(theta_agg(l_partkey)) as long) AS parts,
        |       freq_items_topk(freq_items_agg(l_linestatus), 1)[0].item AS top
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    println(s"P5 sql: ${p5.mkString(" | ")}")

    // P6: string profile on a string col incl token/length stats
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p6 = docs.agg(functions.profile($"text").as("p"))
      .select($"p.strings.count", $"p.strings.length.mean",
        $"p.strings.token_length.max", $"p.strings.unique.estimate",
        $"p.inferred_type").collect()(0)
    println(s"P6 text profile: $p6")

    // P7: empty input -> zero-state profile row (global agg)
    val p7 = li.filter($"l_quantity" < -1).agg(functions.profile($"l_quantity").as("p"))
      .select($"p.count", $"p.numbers", $"p.inferred_type").collect()(0)
    println(s"P7 empty input: $p7")

    // P8: classification + regression model metrics
    val p8 = li.newProfilingSession()
      .withClassificationModel("l_returnflag", "l_linestatus")
      .withRegressionModel("l_extendedprice", "l_quantity")
      .aggProfiles()
      .select($"classification_metrics.labels",
        size($"classification_metrics.cells").as("ncells"),
        $"regression_metrics.count").collect()(0)
    println(s"P8 model metrics: $p8")

    spark.stop()
  }
}
