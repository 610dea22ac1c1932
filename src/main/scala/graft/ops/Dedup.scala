package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale posture (100 TB): every op is expressed as native column
  * expressions + a single keyed shuffle (groupBy on dedup key / LSH bucket).
  * Candidate generation is always bucketed — no all-pairs cross joins; the
  * quadratic step only runs inside a bucket, whose size is bounded by the
  * banding parameters.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeps the row with the smallest
    * `idCol` per key (deterministic winner). One hash-shuffle on the key.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-key duplicate statistics (survivor id + group size). */
  def exactStats(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_dupes"))

  /** Word k-shingles of the lowercased text (distinct, order-free set).
    * Monolithic expression ([[graft.functions.WordShingles]]) — single
    * scan per document.
    */
  def wordShingles(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftBridge.expression(text), k))

  /** Character k-shingles (distinct). */
  def charShingles(text: Column, k: Int): Column = {
    val n = length(text)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(1), n - k + 1), i => substring(text, i, lit(k))))
        .otherwise(array(text)))
  }

  /** Deterministic Carter-Wegman rehash family over a base 64-bit hash:
    * h_i(x) = (a_i * (x mod p) + b_i) mod p with p = 2^31-1. Products stay
    * under 2^62 (no ANSI overflow), one xxhash64 per shingle, then
    * numHashes multiply-add-mods — everything stays inside whole-stage
    * codegen.
    */
  private val MersennePrime = 2147483647L // 2^31 - 1

  private def affineParams(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eedL)
    Array.fill(numHashes)((
      1L + math.floorMod(rnd.nextLong(), MersennePrime - 1),
      math.floorMod(rnd.nextLong(), MersennePrime)))
  }

  /** MinHash signatures: (id, sig array<long>) via explode + numHashes
    * min-aggregates. One shuffle on id; the aggregation is a codegen'd
    * HashAggregate with map-side partial min (shuffle volume = ids x
    * numHashes longs, independent of document size).
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      shingleK: Int): DataFrame = {
    val params = affineParams(numHashes)
    val hashed = df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleK)).as("sh"))
      .select(col("id"), pmod(xxhash64(col("sh")), lit(MersennePrime)).as("h"))
    val mins = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersennePrime))).as(s"m$i")
    }
    hashed.groupBy(col("id"))
      .agg(mins.head, mins.tail.toIndexedSeq: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash+LSH candidate pairs: signature -> bands -> bucket-join.
    *
    * Returns (id_a, id_b, est_jaccard) for pairs sharing >=1 LSH band,
    * id_a < id_b, est_jaccard = fraction of matching minhashes. Shuffles:
    * signature groupBy, band-bucket join, final distinct; bucket sizes are
    * bounded by banding, so the pairwise step never goes quadratic in the
    * corpus.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val sig = minHashSignatures(df, idCol, textCol, numHashes, shingleK)

    // band hash: xxhash64 over the band's signature slice
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(lit(b), array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
            x => x.cast("string")), ","))
      }: _*)).as(Seq("band", "bucket")))

    val left = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val right = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, v) => acc + v)
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** 64-bit SimHash over word tokens: per-bit majority of token hashes.
    * Native expression composition — for each bit b, sum +-1 contributions
    * across tokens, bit set when the sum is positive.
    */
  def simHash(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard similarity between two texts (set semantics over
    * word k-shingles): |A n B| / |A u B|.
    */
  def ngramJaccard(textA: Column, textB: Column, k: Int): Column = {
    val a = wordShingles(textA, k)
    val b = wordShingles(textB, k)
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(0.0)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, candidates
    * generated by random-hyperplane LSH bucketing (signBits sign bits ->
    * bucket). Exact cosine is verified inside buckets only.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      signBits: Int = 8): DataFrame = {
    val dims = Similarity.dim(df, embCol)
    val planes = Similarity.randomPlanes(signBits, dims)
    val withBucket = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      Similarity.hyperplaneBucket(col(embCol), planes).as("bucket"))
    val l = withBucket.select(col("bucket"), col("id").as("id_a"), col("emb").as("emb_a"))
    val r = withBucket.select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
