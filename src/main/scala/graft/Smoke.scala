package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.profile.ProfileSession.ProfilingOps

object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val prof = li.newProfilingSession("smoke")
      .groupBy("l_returnflag")
      .aggProfiles()
    prof.select(col("l_returnflag"),
      col("l_quantity.count"), col("l_quantity.numbers.min"),
      col("l_quantity.numbers.max"), col("l_quantity.numbers.sum"),
      col("l_quantity.numbers.quantiles"),
      col("l_quantity.cardinality.estimate"),
      col("l_linestatus.frequent_items")
    ).show(10, truncate = 120)

    li.groupBy("l_returnflag")
      .agg(functions.profile(col("l_quantity")).as("p"))
      .explain("formatted")
    spark.stop()
  }
}
