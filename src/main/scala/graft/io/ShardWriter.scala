package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic training-shard layout: the final step of a curation
  * pipeline, laying the corpus out as `shard=N/part-*.parquet` files a
  * training dataloader can stream shard-by-shard.
  *
  *  - Shard assignment is a pure function of the row id (52-bit md5
  *    prefix mod shard count — [[Sampling.md5Hash52]], the repo-wide
  *    reproducible hash, recomputable in any engine with md5), so the
  *    layout is stable across runs, engines and partitionings, and any
  *    row's shard is derivable without reading the output.
  *  - Rows WITHIN a shard are written in (id-hash, id) order — a
  *    deterministic unbiased shuffle, so sequential readers see an
  *    order-decorrelated stream without a separate shuffle step.
  *  - One exchange total: the repartition on the shard id. At 100 TB,
  *    pick `nShards` so a shard (corpus / nShards) fits the downstream
  *    reader; the write itself never concentrates more than one shard
  *    per task.
  */
object ShardWriter {

  val ShardCol = "shard"

  /** Adds the deterministic shard-id column (0 until nShards). */
  def withShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn(ShardCol,
      pmod(Sampling.md5Hash52(col(idCol)), lit(nShards.toLong)).cast("int"))
  }

  /** Write `df` as a hash-sharded parquet layout at `path`
    * (`shard=N/...` partition dirs, in-shard rows in (id-hash, id)
    * order).
    */
  def writeShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      path: String): Unit = {
    val hash = Sampling.md5Hash52(col(idCol))
    withShard(df, idCol, nShards)
      .repartition(nShards, col(ShardCol))
      .sortWithinPartitions(col(ShardCol), hash, col(idCol))
      .write.mode("overwrite").partitionBy(ShardCol).parquet(path)
  }

  /** Read the full sharded layout back (the shard id rides the
    * partition directory, so shard-pruned reads stay file-pruned).
    */
  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read one shard — partition pruning keeps this a single-directory
    * scan.
    */
  def readShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    readShards(spark, path).filter(col(ShardCol) === shard)
}
