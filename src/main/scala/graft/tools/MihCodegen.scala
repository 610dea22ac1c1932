package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codegen audit for the bench's mih_hamming row (the one bimodal bench
  * row, r17 verdict #1): builds the EXACT bench plan (documents + planted
  * one-word edits, simHash near-dups at radius 12) and prints
  *
  *   - `explain("formatted")` — the physical plan,
  *   - the whole-stage-codegen subtree headers with `maxMethodCodeSize`
  *     (the compiled bytecode size of the largest generated method —
  *     HotSpot refuses to JIT-compile any method past
  *     `-XX:HugeMethodLimit=8000` bytecode bytes, and methods near the
  *     limit sit longest in the C2 compile queue, which is exactly the
  *     tiering lottery the bench row rides).
  *
  *   sbt -batch "runMain graft.tools.MihCodegen [sfDir]"
  */
object MihCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edits = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("edited "), expr("substring(text, 8)")).as("text"))
    val (dups, rel) = graft.ops.Dedup.simHashNearDupsReleasable(
      docs.unionAll(edits), "doc_id", "text", maxHamming = 12)
    val res = dups
      .filter(col("id_b") === col("id_a") + 10000000L)
      .agg(count(lit(1)))
    try {
      println("==== formatted plan (initial) ====")
      println(res.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("==== run + final (AQE) plan ====")
      // force THIS queryExecution (first() would plan a separate
      // CollectLimit query, leaving res's adaptive plan unmaterialized)
      val n = res.queryExecution.toRdd.count()
      println(s"result rows: $n")
      println("==== codegen subtrees (final plan) ====")
      org.apache.spark.sql.GraftCodegenAudit
        .methodSizes(res.queryExecution.executedPlan)
        .sortBy(-_._3)
        .foreach { case (id, head, size) =>
          println(f"maxMethodCodeSize=$size%6d stage=*($id%d) $head")
        }
      println(res.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    } finally rel()
    spark.stop()
  }
}
