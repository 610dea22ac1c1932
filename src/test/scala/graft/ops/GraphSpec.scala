package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** PageRank: closed-form fixtures (symmetric cycle, star, dangling
  * redistribution), mass conservation, weight sensitivity, and
  * partitioning-invariance.
  */
class GraphSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric cycle converges to uniform 1/N from any damping") {
    import spark.implicits._
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("s", "d")
    val r = ranks(Graph.pageRank(e, "s", "d", iterations = 4))
    r.values.foreach(_ shouldBe (1.0 / 3 +- 1e-12))
  }

  test("star graph: hand-computed two-iteration ranks with dangling " +
    "redistribution") {
    import spark.implicits._
    // a->c, b->c; c dangling. N=3, d=0.85.
    // iter1: D = 1/3 (c's mass). base = 0.05 + 0.85*(1/9)
    //   r(a) = r(b) = 0.05 + 0.85/9
    //   r(c) = 0.05 + 0.85*(1/3 + 1/3 + 1/9)
    val e = Seq("a" -> "c", "b" -> "c").toDF("s", "d")
    val r1 = ranks(Graph.pageRank(e, "s", "d", iterations = 1))
    val base1 = 0.05 + 0.85 / 9
    r1("a") shouldBe (base1 +- 1e-12)
    r1("b") shouldBe (base1 +- 1e-12)
    r1("c") shouldBe (0.05 + 0.85 * (2.0 / 3 + 1.0 / 9) +- 1e-12)
    // mass conserved exactly each iteration
    val r2 = ranks(Graph.pageRank(e, "s", "d", iterations = 2))
    r2.values.sum shouldBe (1.0 +- 1e-9)
  }

  test("edge weights steer rank: heavier edge, larger share") {
    import spark.implicits._
    val e = Seq(("a", "b", 3.0), ("a", "c", 1.0),
      ("b", "a", 1.0), ("c", "a", 1.0)).toDF("s", "d", "w")
    val r = ranks(Graph.pageRank(e, "s", "d", weightCol = Some("w"),
      iterations = 6))
    r("b") should be > r("c")
    r.values.sum shouldBe (1.0 +- 1e-9)
  }

  test("parallel edges merge by summed weight (same as one fat edge)") {
    import spark.implicits._
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("a", "c"),
      ("b", "a"), ("c", "a")).toDF("s", "d")
    val fat = Seq(("a", "b", 3.0), ("a", "c", 1.0),
      ("b", "a", 1.0), ("c", "a", 1.0)).toDF("s", "d", "w")
    val r1 = ranks(Graph.pageRank(dup, "s", "d", iterations = 3))
    val r2 = ranks(Graph.pageRank(fat, "s", "d", weightCol = Some("w"),
      iterations = 3))
    r1.keySet.foreach(k => r1(k) shouldBe (r2(k) +- 1e-12))
  }

  test("partitioning-invariant: 1 vs 32 input partitions, same ranks") {
    import spark.implicits._
    val edges = (1 to 200).map { i =>
      (s"n${i % 23}", s"n${(i * 7) % 23}")
    }.toDF("s", "d")
    val a = ranks(Graph.pageRank(edges.repartition(1), "s", "d",
      iterations = 3))
    val b = ranks(Graph.pageRank(edges.repartition(32), "s", "d",
      iterations = 3))
    a.keySet.foreach(k => a(k) shouldBe (b(k) +- 1e-12))
  }

  test("labelPropagation: two cliques joined by one bridge edge " +
    "resolve to two communities labeled by their smallest member") {
    import spark.implicits._
    // clique {1,2,3}, clique {7,8,9}, bridge 3-7
    val cl = for {
      s <- Seq(Seq(1L, 2L, 3L), Seq(7L, 8L, 9L))
      a <- s; b <- s if a < b
    } yield (a, b)
    val e = (cl :+ (3L -> 7L) :+ (3L, 7L)).map(identity).toDF("s", "d")
    val out = Graph.labelPropagation(e, "s", "d", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced fixed point under self-vote: each clique converges
    // to its minimum member's label, the bridge notwithstanding
    Seq(1L, 2L, 3L).map(out) shouldBe Seq(1L, 1L, 1L)
    Seq(7L, 8L, 9L).map(out) shouldBe Seq(7L, 7L, 7L)
    out.values.toSet.size shouldBe 2
  }

  test("labelPropagation: a star whose hub carries the smallest id " +
    "converges to the hub's label in ONE iteration (the LpaScale " +
    "receipt's planted invariant)") {
    import spark.implicits._
    // each member's cells tie {hub-label: 1, self-vote: 1} -> smallest
    // label (the hub's); the hub's cells all tie at count 1 -> its own
    // smallest label. One iteration suffices and further rounds are a
    // fixed point.
    val e = (1L to 6L).map(i => (0L, i)).toDF("s", "d")
    val one = Graph.labelPropagation(e, "s", "d", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    one.values.toSet shouldBe Set(0L)
    val three = Graph.labelPropagation(e, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    three shouldBe one
  }

  test("labelPropagation: isolated self-loop node keeps its own " +
    "label; deterministic across partitionings") {
    import spark.implicits._
    val e = Seq((1L, 2L), (5L, 5L)).toDF("s", "d")
    val out = Graph.labelPropagation(e, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(5L) shouldBe 5L
    out(1L) shouldBe 1L
    out(2L) shouldBe 1L
    val edges = (1 to 150).map(i => (i.toLong % 31, (i * 7L) % 31))
      .toDF("s", "d")
    val a = Graph.labelPropagation(edges.repartition(1), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(edges.repartition(32), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a shouldBe b
  }

  test("personalizedPageRank: mass conserved at 1, unreachable nodes " +
    "score exactly 0, seeds dominate their neighborhood") {
    import spark.implicits._
    // chain a->b->c plus an isolated pair x->y unreachable from seed a
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"),
      ("y", "x")).toDF("s", "d")
    val seeds = Seq("a").toDF("seed")
    val r = Graph.personalizedPageRank(e, "s", "d", seeds, "seed",
      iterations = 6).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.values.sum shouldBe (1.0 +- 1e-9)
    r("x") shouldBe (0.0 +- 1e-15)
    r("y") shouldBe (0.0 +- 1e-15)
    r("a") should be > r("b")
    r("b") should be > r("c") * 0.0 // b reachable in 1 hop
    // dangling mass returns to seeds: pure sink graph keeps sum 1
    val sink = Seq(("a", "z")).toDF("s", "d")
    val rs = Graph.personalizedPageRank(sink, "s", "d", seeds, "seed",
      iterations = 4).collect().map(x => x.getDouble(1)).sum
    rs shouldBe (1.0 +- 1e-9)
  }

  test("personalizedPageRank: seed absent from the graph is rejected") {
    import spark.implicits._
    val e = Seq(("a", "b")).toDF("s", "d")
    val seeds = Seq("zzz").toDF("seed")
    an[IllegalArgumentException] should be thrownBy
      Graph.personalizedPageRank(e, "s", "d", seeds, "seed")
  }

  test("hits: star authority concentrates all authority mass; " +
    "hand-checked two-node case") {
    import spark.implicits._
    // a, b, c all point at z: z is the only authority, a/b/c equal hubs
    val star = Seq(("a", "z"), ("b", "z"), ("c", "z")).toDF("s", "d")
    val r = Graph.hits(star, "s", "d", iterations = 3).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    r("z")._2 shouldBe (1.0 +- 1e-12)
    r("z")._1 shouldBe (0.0 +- 1e-12)
    Seq("a", "b", "c").foreach { n =>
      r(n)._1 shouldBe (1.0 / 3 +- 1e-12)
      r(n)._2 shouldBe (0.0 +- 1e-12)
    }
    // normalization: both scores sum to 1 every time
    val e2 = (1 to 60).map(i => (s"u${i % 7}", s"v${i % 11}"))
      .toDF("s", "d")
    val out = Graph.hits(e2, "s", "d", iterations = 2).collect()
    out.map(_.getDouble(1)).sum shouldBe (1.0 +- 1e-9)
    out.map(_.getDouble(2)).sum shouldBe (1.0 +- 1e-9)
  }

  test("degreeStats: parallel edges collapse, self-loops drop, " +
    "degrees are distinct-neighbor counts") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "c")).toDF("s", "d")
    val got = Graph.degreeStats(e, "s", "d")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got("a") shouldBe ((2L, 1L, 2L)) // out: b,c; in: b; nbrs: b,c
    got("b") shouldBe ((1L, 1L, 1L))
    got("c") shouldBe ((0L, 1L, 1L))
  }

  test("triangleStats: K4 has 4 triangles and clustering 1; adding a " +
    "pendant vertex lowers clustering") {
    import spark.implicits._
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b }
      yield (a.toLong, b.toLong)).toDF("s", "d")
    val r = Graph.triangleStats(k4, "s", "d").collect().head
    r.getLong(0) shouldBe 4L   // nodes
    r.getLong(1) shouldBe 6L   // edges
    r.getLong(2) shouldBe 12L  // wedges: 4 * C(3,2)
    r.getLong(3) shouldBe 4L   // triangles
    r.getDouble(4) shouldBe (1.0 +- 1e-12)
    val withPendant = ((for { a <- 1 to 4; b <- 1 to 4 if a < b }
      yield (a.toLong, b.toLong)) :+ (4L, 9L)).toDF("s", "d")
    val p = Graph.triangleStats(withPendant, "s", "d").collect().head
    p.getLong(3) shouldBe 4L
    p.getDouble(4) should be < 1.0
  }

  test("triangleStats: direction and duplication never change the " +
    "census; triangle-free graphs report 0 with NULL-safe clustering") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val triRev = Seq((2L, 1L), (3L, 2L), (3L, 1L), (1L, 2L))
      .toDF("s", "d")
    val a = Graph.triangleStats(tri, "s", "d").collect().head
    val b = Graph.triangleStats(triRev, "s", "d").collect().head
    a.toSeq shouldBe b.toSeq
    a.getLong(3) shouldBe 1L
    // path graph: 1 wedge, 0 triangles
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val p = Graph.triangleStats(path, "s", "d").collect().head
    p.getLong(2) shouldBe 1L
    p.getLong(3) shouldBe 0L
    p.getDouble(4) shouldBe (0.0 +- 1e-12)
    // single edge: no wedges -> clustering NULL
    val edge = Seq((1L, 2L)).toDF("s", "d")
    Graph.triangleStats(edge, "s", "d").collect().head
      .isNullAt(4) shouldBe true
  }

  test("scaled_rank = rank * N; invalid rows dropped") {
    import spark.implicits._
    val e = Seq((Some("a"), Some("b"), 1.0), (Some("b"), Some("a"), 1.0),
      (Option.empty[String], Some("a"), 1.0),
      (Some("a"), Option.empty[String], 1.0),
      (Some("a"), Some("b"), -5.0)).toDF("s", "d", "w")
    val out = Graph.pageRank(e, "s", "d", weightCol = Some("w"),
      iterations = 2).collect()
    out.map(_.getString(0)).toSet shouldBe Set("a", "b")
    out.foreach(r => r.getDouble(2) shouldBe (r.getDouble(1) * 2 +- 1e-12))
  }

  test("Releasable contract (r17): each graph op's release() drops its " +
    "final persisted iterate from the session cache — results consumed " +
    "first stay correct, and repeated calls stop accumulating entries") {
    import spark.implicits._
    // persisted-RDD registry: persist() registers on materialization,
    // unpersist(blocking = false) deregisters synchronously (only the
    // block deletion is async) — so the count is a deterministic meter
    // for cache-entry accumulation
    def cacheEntries(): Int = spark.sparkContext.getPersistentRDDs.size
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val before = cacheEntries()
    val (pr, relPr) = Graph.pageRankReleasable(edges, "src", "dst",
      None, iterations = 2)
    val prRows = pr.collect()
    prRows.map(_.getDouble(1)).sum shouldBe (1.0 +- 1e-9)
    val (ha, relHits) = Graph.hitsReleasable(edges, "src", "dst",
      iterations = 2)
    ha.count() shouldBe 3
    val (lbl, relLpa) = Graph.labelPropagationReleasable(edges, "src",
      "dst", iterations = 2)
    lbl.count() shouldBe 3
    val seeds = Seq("a").toDF("seed")
    val (ppr, relPpr) = Graph.personalizedPageRankReleasable(edges,
      "src", "dst", seeds, "seed", None, iterations = 2)
    ppr.count() shouldBe 3
    cacheEntries() should be > before // the live results hold caches
    relPr(); relHits(); relLpa(); relPpr()
    cacheEntries() shouldBe before // every final iterate released
  }
}
