package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: multi-column clustering so that
  * parquet min/max statistics prune files for predicates on ANY of the
  * clustered columns — the multi-dimensional complement to
  * [[ShardWriter]]'s hash layout. A single-column sort gives perfect
  * pruning on that column and none on the others; interleaving the
  * columns' bucket bits gives every clustered column locality
  * proportional to 2^(-bits_allocated), which is what a scan planner
  * needs at 100 TB where touching every file is the failure mode.
  *
  * Key construction is deliberately ENGINE-REPRODUCIBLE: per-column
  * min/max reduce in one aggregate, each value linearly buckets to
  * `bits` bits (`least(2^bits - 1, floor((v - lo) * 2^bits / (hi -
  * lo)))` — plain IEEE double ops any SQL engine replays exactly), and
  * the z-key is the bitwise interleave of the bucket bits, built from
  * codegen'd shift/and primitives. NULL or degenerate (constant)
  * columns bucket to 0 and simply stop contributing to the ordering.
  *
  * Scale shape: ONE stats aggregate (d×2 doubles, broadcast back), a
  * map-only key projection, and ONE range exchange to lay files out in
  * key order. Nothing else shuffles.
  */
object ZOrderLayout {

  val KeyCol = "zkey"

  /** The Morton interleave of `cols`' bucket bits as a Column, given
    * the per-column (lo, hi) stat columns already attached. Bit b of
    * column j lands at position b * d + j, LSB-first — low bits vary
    * fastest, giving the recursive Z tiling.
    */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val d = buckets.length
    val terms = for {
      b <- 0 until bits
      j <- 0 until d
    } yield shiftleft(
      shiftrightunsigned(buckets(j), b).bitwiseAND(lit(1L)), b * d + j)
    terms.reduce(_ + _) // disjoint bit positions: + is |
  }

  /** Attach the z-order key over `cols` (numeric) as `zkey`. `bits`
    * buckets per column (d * bits total key bits, d * bits <= 62).
    */
  def withZKey(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"need 1 <= bits and bits * ${cols.length} <= 62, got $bits")
    val nb = 1L << bits
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__lo_$c"),
      max(col(c).cast("double")).as(s"__hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val buckets = cols.map { c =>
      val lo = col(s"__lo_$c")
      val hi = col(s"__hi_$c")
      val v = col(c).cast("double")
      when(v.isNotNull && hi > lo,
        least(lit(nb - 1),
          floor((v - lo) * lit(nb.toDouble) / (hi - lo)).cast("long")))
        .otherwise(lit(0L))
    }
    df.crossJoin(broadcast(stats))
      .withColumn(KeyCol, interleave(buckets, bits))
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Write `df` z-ordered on `cols`: key, range-repartition into
    * `numFiles` key ranges, sort within each, write parquet. Each
    * output file covers one compact Z-curve segment, so its parquet
    * column stats span ~2^(-bits/d) of every clustered column's range
    * — the reader's min/max pruning works on all of them. The key
    * column is persisted (`zkey`) so readers can also range-filter the
    * curve directly.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      bits: Int = 16,
      numFiles: Int = 0): Unit = {
    val keyed = withZKey(df, cols, bits)
    val arranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col(KeyCol))
      else keyed.repartitionByRange(col(KeyCol))
    arranged.sortWithinPartitions(col(KeyCol))
      .write.mode("overwrite").parquet(path)
  }

  /** Read a z-ordered layout back. Predicates on the clustered columns
    * prune via ordinary parquet min/max stats; no special reader path.
    */
  def readZOrdered(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
