package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Dedup, Similarity}

/** Equivalence checks for the scale-rewritten operators: each new plan
  * (bounded top-k aggregate, single-pass simhash, ids-only LSH join) must
  * produce the same rows as the straightforward formulation it replaced.
  */
class OpsEquivalenceSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
  private def emb: DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("simhash64 expression equals the per-bit HOF composition") {
    val toks = filter(split(lower(col("text")), "\\s+"),
      t => org.apache.spark.sql.functions.length(t) > 0)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    val reference = bits.reduce(_.bitwiseOR(_))
    val mismatches = docs
      .select(Dedup.simHash(col("text")).as("fast"), reference.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    mismatches shouldBe 0L
  }

  test("minhash_sig expression equals the explode + vec_min composition") {
    val params = Dedup.affineParams(64)
    val fast = Dedup.minHashSignatures(docs, "doc_id", "text", 64, 2)
    val slow = docs
      .select(col("doc_id").as("id"),
        explode(Dedup.wordShingles(col("text"), 2)).as("sh"))
      .select(col("id"),
        pmod(xxhash64(col("sh")), lit(Dedup.MersennePrime)).as("h"))
      .select(col("id"),
        graft.functions.carter_wegman_hashes(col("h"), params).as("hs"))
      .groupBy(col("id"))
      .agg(graft.functions.vec_min(col("hs")).as("sig"))
    val mismatches = fast.as("f").join(slow.as("s"), Seq("id"))
      .filter(col("f.sig") =!= col("s.sig")).count()
    mismatches shouldBe 0L
    fast.count() shouldBe docs.count()
  }

  test("bounded top-k aggregate equals window row_number top-k") {
    val queries = emb.filter(col("vec_id") < 15)
    val fast = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("item_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val c = emb.select(col("vec_id").as("item_id"), col("embedding").as("item_emb"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("query_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    val slow = c.crossJoin(q)
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        Similarity.cosine(col("query_emb"), col("item_emb")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("item_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    fast shouldBe slow
  }

  test("top-k aggregate handles string ids natively") {
    val named = emb.withColumn("name", concat(lit("vec-"),
      format_string("%05d", col("vec_id"))))
    val queries = named.filter(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(named, queries, "name", "embedding", k = 2)
    got.schema("item_id").dataType shouldBe
      org.apache.spark.sql.types.StringType
    val rows = got.collect()
    rows.length shouldBe 10 // 5 queries x k=2
    all(rows.map(_.getString(1))) should startWith("vec-")
    // per-query ranks are 1..k and items are distinct
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.map(_.getInt(3)).sorted.toSeq shouldBe Seq(1, 2)
      rs.map(_.getString(1)).distinct.length shouldBe 2
    }
  }

  test("minhash LSH pairs: est_jaccard in [0,1], symmetric ids, stable count") {
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleK = 2).cache()
    val rows = pairs.collect()
    rows should not be empty
    all(rows.map(_.getDouble(2))) should (be >= 0.0 and be <= 1.0)
    all(rows.map(r => r.getLong(0) < r.getLong(1))) shouldBe true
    // unique pairs only — the band dedupe must not emit a pair twice
    rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length shouldBe rows.length
    pairs.unpersist()
  }

  test("LSH skew robustness: boilerplate mega-bucket drops, true pairs survive") {
    import spark.implicits._
    // 30% of the corpus is ONE identical boilerplate document — at web
    // scale a shared footer/template does exactly this, and an uncapped
    // bucket would make the in-bucket pairwise step quadratic in corpus
    // size. maxBucketSize must drop that bucket while the planted true
    // pairs (distinct vocab, tiny mutation) still collide in their own
    // small buckets.
    val boiler = (0L until 60L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val distinct = (60L until 100L).map(i =>
      (i, s"unique${i}a word${i}b token${i}c item${i}d part${i}e " +
        s"bit${i}f chunk${i}g piece${i}h"))
    val planted = (0 until 5).flatMap { p =>
      val base = s"planted${p}a carrot${p}b window${p}c stone${p}d " +
        s"river${p}e cloud${p}f meadow${p}g forest${p}h lantern${p}i"
      Seq((1000L + 2 * p, base), (1001L + 2 * p, base + s" mutated${p}"))
    }
    val corpus = (boiler ++ distinct ++ planted).toDF("doc_id", "text")

    val pairs = Dedup.minHashLshPairs(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, shingleK = 3, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // every planted pair surfaces (other bands, small buckets)
    (0 until 5).foreach { p =>
      pairs should contain ((1000L + 2 * p, 1001L + 2 * p))
    }
    // no pair is boilerplate-x-boilerplate: its only shared buckets are
    // the 60-doc mega-buckets, all above the cap and dropped
    pairs.filter { case (a, b) => a < 60L && b < 60L } shouldBe empty
  }

  test("cross-corpus contamination recovers planted probes, cross-side only") {
    val corpus = docs.limit(100).select(col("doc_id"), col("text"))
    val probe = corpus.filter(col("doc_id") < 15)
      .select(col("doc_id"), concat(col("text"), lit(" tiny tail")).as("text"))
    val hits = Dedup.crossCorpusNearDups(corpus, probe, "doc_id", "text",
      threshold = 0.8, shingleK = 2).collect()
    // every planted probe is found against its source doc
    val selfHits = hits.filter(r => r.getLong(0) == r.getLong(1))
    selfHits.map(_.getLong(1)).sorted.toSeq shouldBe (0L until 15L)
    all(hits.map(_.getDouble(2))) should be >= 0.8
    // probe ids only ever appear on the probe side (no within-corpus pairs)
    all(hits.map(_.getLong(1))) should be < 15L
  }

  test("contamination pipeline caches only pair ids + candidate texts") {
    val corpus = docs.limit(100).select(col("doc_id"), col("text"))
    val probe = corpus.filter(col("doc_id") < 15)
      .select(col("doc_id"), concat(col("text"), lit(" tiny tail")).as("text"))
    val (result, release) = Dedup.crossCorpusNearDupsReleasable(
      corpus, probe, "doc_id", "text", threshold = 0.8, shingleK = 2)
    result.collect() should not be empty
    val plan = result.queryExecution.executedPlan.toString
    // the LSH stage's product (pair ids) and the candidate texts are both
    // multi-consumer — all downstream reads must hit the caches instead of
    // re-running the bucket shuffle / the source scan
    val cacheReads = "InMemoryTableScan".r.findAllIn(plan).length
    cacheReads should be >= 3
    // nothing corpus-sized is persisted: every cached relation either
    // carries no text at all (pair ids) or is the candidate-filtered text
    // fetch — whose cached plan must contain the broadcast LeftSemi that
    // filtered it down from the source scan
    val cachedSchemas = "InMemoryRelation \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    cachedSchemas should not be empty
    assert(cachedSchemas.exists(s => !s.contains("__text")),
      "expected an ids-only cached relation (candidate pairs)")
    if (cachedSchemas.exists(_.contains("__text")))
      plan should include ("LeftSemi")
    release()
  }

  test("minhash est_jaccard tracks exact shingle jaccard on near-dup docs") {
    // duplicate a doc with a tiny suffix change: est_jaccard must be high
    val d = docs.limit(20).select(col("doc_id"), col("text"))
    val mutated = d.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" tiny suffix")).as("text"))
    val pairs = Dedup.minHashLshPairs(d.unionAll(mutated), "doc_id", "text",
      numHashes = 64, bands = 16, shingleK = 2)
      .filter(col("id_b") === col("id_a") + 100000)
    pairs.count() shouldBe 20L
    all(pairs.collect().map(_.getDouble(2))) should be >= 0.5
  }

  test("embedding near-dups recover planted perturbed copies exactly") {
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val dups = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.1)).otherwise(x)).as("embedding"))
    val found = Dedup.embeddingNearDups(base.unionAll(dups), "vec_id", "embedding",
      threshold = 0.95, signBits = 8, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    found shouldBe (0 until 50).map(i => (i.toLong, (i + 10000).toLong)).toSet
  }

  test("semdedup with one cluster equals brute-force pairs at threshold") {
    val base = emb.filter(col("vec_id") < 100).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val got = Dedup.semDedupPairs(base, "vec_id", "embedding",
      threshold = 0.3, nCentroids = 1, iterations = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = base.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = base.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("ea"), col("eb")) >= 0.3)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe brute
    brute should not be empty // the threshold actually exercises pairing
  }

  test("semdedup recovers planted semantic copies; survivors drop exactly " +
    "the higher-id members") {
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // exact copies: identical embeddings get the identical (deterministic)
    // centroid assignment, so recovery is guaranteed — a PERTURBED copy of
    // a vector near a cell boundary can land in the neighboring cell and
    // be missed, which is SemDeDup's documented approximation (the scan of
    // this fixture at +0.01 perturbation splits exactly 1 of 50 pairs)
    val dups = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val all = base.unionAll(dups)
    val pairs = Dedup.semDedupPairs(all, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 50).map(i => (i.toLong, (i + 10000).toLong)).toSet
    pairs.intersect(planted) shouldBe planted
    // survivors == every id minus the higher-id member of each found pair
    val survivors = Dedup.semDedupSurvivors(all, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 8)
      .collect().map(_.getLong(0)).toSet
    val dropped = pairs.map(_._2)
    survivors shouldBe all.collect().map(_.getLong(0)).toSet -- dropped
    survivors.intersect((10000L until 10050L).toSet) shouldBe empty
  }

  test("ivf ann returns k well-ordered neighbors per query") {
    val res = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 3)
      .collect()
    res.length shouldBe 15
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      sorted.map(_.getDouble(2)).toSeq shouldBe
        sorted.map(_.getDouble(2)).sortBy(-_).toSeq
    }
  }

  test("ivf ann: broadcast-centroid path equals the literal path, and " +
      "its serialized expression stays small") {
    val literal = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val bcast = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, nCentroids = 8, nProbe = 3,
      centroidBroadcastThreshold = 0) // force the broadcast path
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    bcast shouldBe literal

    // the point of the broadcast variant: a 2000 x 64 codebook is ~1 MB
    // inside the literal expression but only a handle in the broadcast one
    def serializedSize(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close(); bos.size()
    }
    val codebook = Array.fill(2000)(Array.fill(64)(1.0))
    val child = org.apache.spark.sql.GraftBridge.expression(col("x"))
    val litSize = serializedSize(
      graft.functions.TopCentroids(child, codebook, 1))
    val bcSize = serializedSize(graft.functions.TopCentroidsBroadcast(
      child, spark.sparkContext.broadcast(codebook), 1))
    litSize should be > 1000000
    bcSize should be < 10000
  }

  test("ivf-pq is exact on a pattern corpus (lossless quantization regime)") {
    import spark.implicits._
    // 64-dim vectors assembled from 4 sign patterns per 8-dim subspace:
    // subspace j of doc i carries pattern (i+j)%4, so the first ksub=4
    // docs cover every pattern in every subspace — Lloyd's init IS the
    // exact codebook, quantization is lossless, ADC equals the exact dot,
    // and with nProbe == nCentroids the whole pipeline must reproduce
    // brute force exactly (ties break id-asc in both paths)
    val patterns = Array(
      Array(1.0, 1, 1, 1, -1, -1, -1, -1),
      Array(1.0, -1, 1, -1, 1, -1, 1, -1),
      Array(-1.0, 1, -1, 1, 1, -1, -1, 1),
      Array(-1.0, -1, 1, 1, -1, 1, -1, 1))
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until 8).flatMap(j => patterns((i + j) % 4)).toArray)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5)
    val pq = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      k = 5, nCentroids = 4, nProbe = 4, m = 8, ksub = 4, rerank = 20)
    key(pq) shouldBe key(brute)
    // re-ranked scores are exact cosines, not ADC estimates
    val bruteScores = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.collect().foreach { r =>
      r.getDouble(2) shouldBe (bruteScores((r.getLong(0), r.getLong(1))) +- 1e-9)
    }
  }

  test("residual ivf-pq is exact with one cell on the pattern corpus") {
    import spark.implicits._
    // nCentroids=1: residual = x - global centroid, a constant shift —
    // each subspace still holds <= ksub distinct residual patterns, so
    // residual quantization is lossless and the pipeline must reproduce
    // brute force exactly (the residual-mode ADC adds dot(q, centroid)
    // back, which this pins)
    val patterns = Array(
      Array(1.0, 1, 1, 1, -1, -1, -1, -1),
      Array(1.0, -1, 1, -1, 1, -1, 1, -1),
      Array(-1.0, 1, -1, 1, 1, -1, -1, 1),
      Array(-1.0, -1, 1, 1, -1, 1, -1, 1))
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until 8).flatMap(j => patterns((i + j) % 4)).toArray)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5)
    val pq = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      k = 5, nCentroids = 1, nProbe = 1, m = 8, ksub = 4, rerank = 20,
      residual = true)
    key(pq) shouldBe key(brute)
  }

  test("ivf-pq recall on fixture embeddings stays above the pinned floor") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCentroids = 8, nProbe = 4, m = 8, ksub = 16, rerank = 50)
      .collect()
    // well-ordered within each query
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      sorted.map(_.getDouble(2)).toSeq shouldBe
        sorted.map(_.getDouble(2)).sortBy(-_).toSeq
    }
    val hits = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = hits.intersect(brute).size.toDouble / brute.size
    recall should be >= 0.5 // measured ~0.7+ on the fixture; floor padded

    // the recallAtK helper must agree with the hand computation
    val bruteDf = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 10)
    val pqDf = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCentroids = 8, nProbe = 4, m = 8, ksub = 16, rerank = 50)
    val rep = Similarity.recallAtK(pqDf, bruteDf)
    val overall = rep.agg(sum(col("n_hit")).cast("double") /
      sum(col("n_exact"))).head().getDouble(0)
    overall shouldBe (recall +- 1e-9)
    rep.collect().foreach { r =>
      r.getAs[Double]("recall") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("randomProject: deterministic, seed-sensitive, distance-preserving") {
    import graft.ops.Similarity
    val e = emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val proj = e.select(col("vec_id"),
      Similarity.randomProject(col("e"), 16).as("p"))
    // deterministic across evaluations
    val a = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    a shouldBe b
    // a different seed gives a different projection
    val seeded = e.select(Similarity.randomProject(col("e"), 16, seed = 7L))
      .head().getSeq[Double](0)
    seeded should not be a(0L)
    // JL guarantee (loose): squared distances preserved within a broad
    // band at dOut=16 for 50 points
    val full = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val ratios = for {
      i <- 0L until 10L; j <- (i + 1) until 10L
    } yield d2(a(i), a(j)) / d2(full(i), full(j))
    ratios.foreach(_ should (be > 0.1 and be < 4.0))
    // the mean ratio concentrates near 1
    (ratios.sum / ratios.size) shouldBe (1.0 +- 0.35)
  }

  test("recallAtK is exact-side-driven and immune to duplicate approx pairs") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2))
      .toDF("query_id", "item_id", "cosine", "rank")
    // duplicated (1,10) pairs would row-multiply the left join and
    // inflate n_exact without the distinct; query 99 has no ground truth
    val approx = Seq((1L, 10L, 0.9, 1), (1L, 10L, 0.9, 2),
      (99L, 50L, 0.7, 1)).toDF("query_id", "item_id", "cosine", "rank")
    val rep = graft.ops.Similarity.recallAtK(approx, exact).collect()
    rep.length shouldBe 1 // exact-side queries only
    rep.head.getAs[Long]("n_exact") shouldBe 2L
    rep.head.getAs[Long]("n_hit") shouldBe 1L
    rep.head.getAs[Double]("recall") shouldBe 0.5
  }

  test("rolling_hash64 equals the HOF composition it replaced") {
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val codes = transform(split(norm, ""), c => ascii(c).cast("long"))
    val reference = aggregate(codes, lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, lit(1000000007L)))
    val mismatches = docs
      .select(graft.ops.TextOps.rollingHash(col("text")).as("fast"),
        reference.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    mismatches shouldBe 0L
    // edge cases: empty, all-whitespace, leading/trailing/interior runs
    val edge = spark.sql(
      """SELECT * FROM VALUES ('', 1), ('   ', 2), ('  a  b  ', 3),
        |('Mixed CASE  text', 4), ('tab\there', 5) AS t(text, id)""".stripMargin)
    val edgeMismatch = edge
      .select(graft.ops.TextOps.rollingHash(col("text")).as("fast"),
        aggregate(transform(split(lower(regexp_replace(col("text"), "\\s+", " ")), ""),
          c => ascii(c).cast("long")), lit(0L),
          (acc, c) => pmod(acc * lit(31L) + c, lit(1000000007L))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    edgeMismatch shouldBe 0L
  }

  test("connected components: chains, isolated pairs, min-label roots") {
    import spark.implicits._
    // one 5-node chain (1-2-3-4-5), one pair (10,11), one triangle (20,21,22)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val comps = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 5L).foreach(i => comps(i) shouldBe 1L)
    comps(10L) shouldBe 10L
    comps(11L) shouldBe 10L
    Seq(20L, 21L, 22L).foreach(i => comps(i) shouldBe 20L)
    comps.size shouldBe 10
  }

  test("connected components: 200-node path converges in O(log n) rounds") {
    import spark.implicits._
    // adversarial depth: a pure path graph 0-1-2-...-199 (diameter 199).
    // Plain min-label propagation needs ~200 rounds; large-star/small-star
    // contraction must close it in ~log2(200) ~ 8 — well under the default
    // maxIter=20 that used to silently return non-converged labels on
    // graphs like this.
    val path = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // shuffled ids so the min does not ride the same direction as edges
    val scrambled = path.select(
      (col("id_a") * 7919 % 1000).as("id_a"),
      (col("id_b") * 7919 % 1000).as("id_b"))
    val (labels, release, rounds) =
      graft.ops.Dedup.connectedComponentsStats(scrambled)
    val comps = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comps.size shouldBe 200
    // one component: every node carries the global min label
    val minId = comps.keys.min
    comps.values.toSet shouldBe Set(minId)
    rounds should be <= 10
    release()
  }

  test("vec_match_count counts agreeing positions") {
    val df = spark.sql(
      "SELECT array(1L, 2L, 3L, 4L) AS a, array(1L, 9L, 3L, 8L) AS b")
    df.select(graft.functions.vec_match_count(col("a"), col("b")))
      .first().getInt(0) shouldBe 2
  }

  test("simHashNearDups: routed pair set equals brute force at " +
    "radius 12; exact copies pair at Hamming 0; one-word edits on " +
    "long docs pair within the radius") {
    import spark.implicits._
    def doc(id: Long, edit: Boolean): String = {
      val words = (0 until 60).map(w => s"token${(id * 7 + w * 3) % 40}")
      val base = words.mkString(" ")
      if (edit) base.replace("token1 ", "edited ") else base
    }
    val rows = (0L until 20L).map(i => (i, doc(i, edit = false))) ++
      Seq((100L, doc(3, edit = false))) ++ // exact copy of 3
      Seq((101L, doc(5, edit = true))) // near copy of 5
    val df = rows.toDF("id", "text")
    val found = graft.ops.Dedup
      .simHashNearDups(df, "id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    // brute-force oracle over collected fingerprints
    val sigs = df.select(col("id"),
      graft.ops.Dedup.simHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 12
    } yield (ia, ib) -> d).toMap
    found shouldBe brute
    found((3L, 100L)) shouldBe 0
    assert(found.contains((5L, 101L)),
      s"one-word edit not recovered: $found")
    found((5L, 101L)) should be > 0
  }
}
