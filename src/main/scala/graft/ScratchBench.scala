package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch: stage-by-stage LSH timing (dev aid). */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup
    docs.limit(100).count()

    time("shingles_only") {
      docs.select(explode(Dedup.wordShingles(col("text"), 2))).count()
    }
    time("hash_only") {
      docs.select(col("doc_id"),
        explode(Dedup.wordShingles(col("text"), 2)).as("sh"))
        .select(xxhash64(col("sh"))).count()
    }
    time("signatures") {
      Dedup.minHashSignatures(docs, "doc_id", "text", 64, 2).count()
    }
    val sig = time("signatures_cached") {
      val s = Dedup.minHashSignatures(docs, "doc_id", "text", 64, 2).cache()
      s.count(); s
    }
    time("full_pairs") {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 64, 16, 2).count()
    }
    spark.stop()
  }
}
