package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profile.ProfileSession.ProfilingOps

/** Physical-plan audits: pin the plan shapes the 100 TB design depends
  * on, so an optimizer change or refactor that silently degrades them
  * fails a test instead of a production run.
  */
class PlanAuditSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))

  /** The executed AQE plan prints "== Final Plan ==" then "== Initial
    * Plan ==" — audit only what actually ran.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  test("grouped profile: ONE shuffle, map-side partial aggregation") {
    val prof = li.newProfilingSession().groupBy("l_returnflag").aggProfiles()
    prof.collect()
    val plan = finalPlan(prof)
    // partial + final ObjectHashAggregate around a single exchange:
    // shuffle volume is groups x columns x sketch-KBs, not rows
    "ObjectHashAggregate".r.findAllIn(plan).length should be >= 2
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }

  test("tf-idf adaptive default: corpus shuffle reused, vocab join " +
    "broadcast-converted by AQE from runtime size") {
    val res = graft.ops.TextOps.tfIdfTopTerms(docs, "doc_id", "text", 3)
    res.collect()
    val plan = finalPlan(res)
    // the tf aggregate feeds both the docFreq branch and the scoring
    // join; subplan canonicalization must reuse its exchange instead of
    // re-scanning + re-shuffling the corpus. If an identical subplan is
    // already persisted elsewhere in the session, the cache manager may
    // serve an InMemoryTableScan instead — equally reused, also accepted.
    assert(plan.contains("ReusedExchange")
      || plan.contains("InMemoryTableScan"),
      "corpus subplan neither exchange-reused nor cache-served:\n" + plan)
    // no broadcast HINT in the adaptive default — a BroadcastHashJoin in
    // the FINAL plan proves AQE converted from the measured exchange size
    plan should include ("BroadcastHashJoin")
  }

  test("contamination verify: corpus scanned not shuffled, texts fetched " +
    "via broadcast semi-join on candidate ids") {
    val corpus = docs.limit(200)
    val probe = corpus.filter(col("doc_id") < 20)
      .select(col("doc_id"), concat(col("text"), lit(" tail")).as("text"))
    val (result, release) = graft.ops.Dedup.crossCorpusNearDupsReleasable(
      corpus, probe, "doc_id", "text", threshold = 0.8, shingleK = 2)
    result.collect()
    val plan = result.queryExecution.executedPlan.toString
    // candidate ids broadcast against the source scan: the corpus text
    // column reaches the verify without crossing an exchange
    plan should include ("LeftSemi")
    plan should include ("BroadcastExchange")
    // no corpus-sized cache: every InMemoryRelation is either ids-only
    // (candidate pairs) or the LeftSemi-filtered candidate texts
    val cachedSchemas = "InMemoryRelation \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val textCaches = cachedSchemas.filter(_.contains("__text"))
    textCaches.foreach { _ => plan should include ("LeftSemi") }
    assert(cachedSchemas.nonEmpty && cachedSchemas.exists(!_.contains("__text")))
    release()
  }

  test("IQR outliers: quartile table broadcast, corpus never re-shuffled") {
    val res = graft.ops.Outliers.iqrStats(li, "l_extendedprice",
      Seq("l_returnflag"))
    res.collect()
    val plan = finalPlan(res)
    plan should include ("BroadcastHashJoin")
    plan.toLowerCase should not include "percentile"
  }

  test("boilerplate-line removal: anti-join broadcast-converted by AQE " +
    "from measured size, no hint") {
    val lined = docs.select(col("doc_id"),
      regexp_replace(col("text"), " ", "\n").as("text"))
    val res = graft.ops.Dedup.removeFrequentLines(lined, "doc_id", "text",
      minDocFreq = 400L)
    res.collect()
    val plan = finalPlan(res)
    // the frequent-line set is measured small at runtime -> AQE turns the
    // unhinted LeftAnti into a broadcast join; a pathological threshold
    // would instead degrade to a shuffle join rather than OOM
    plan should include ("BroadcastHashJoin")
    plan should include ("LeftAnti")
  }

  test("bm25: the corpus token stream reaches the tf aggregate through " +
    "a BROADCAST semi-join — no exchange below it") {
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 40).as("qtext"))
    val (res, release) = graft.ops.TextOps.bm25TopKReleasable(docs,
      "doc_id", "text", queries, "query_id", "qtext", k = 5)
    try {
      res.collect()
      // the matched-tf frame is the persisted single execution; inside
      // its cached plan the semi-join must be broadcast (the corpus
      // side streams map-side) with the ONLY exchange being the
      // (doc, term) aggregation above it
      val imr = res.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      // tfq is consumed twice (doc-frequency branch + scoring stream),
      // so the SAME cache appears at two tree positions — that sharing
      // is the point; there must be exactly one distinct cached plan
      imr.map(_.cachedPlan.toString).distinct should have size 1
      // the cached plan prints final + initial AQE sections — audit
      // only what ran
      val cached = imr.head.cachedPlan.toString
        .split("== Initial Plan ==")(0)
      cached should include ("BroadcastHashJoin")
      cached should include ("LeftSemi")
      // the CORPUS contributes exactly one exchange — the (id, term)
      // aggregation above the semi-join; the only other exchange is the
      // query-term distinct under the broadcast build side (query-sized)
      "Exchange hashpartitioning\\(id#".r
        .findAllIn(cached).length shouldBe 1
      "Exchange hashpartitioning\\(term#".r
        .findAllIn(cached).length shouldBe 1
      "Exchange hashpartitioning".r.findAllIn(cached).length shouldBe 2
    } finally release()
  }

  test("ivf-pq: corpus reaches both scoring stages through broadcast " +
    "joins — the only exchanges are the two bounded per-query top-k aggs") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val res = graft.ops.Similarity.ivfPqTopK(emb,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, nCentroids = 4, nProbe = 2, m = 8, ksub = 8, rerank = 10)
    res.collect()
    val plan = finalPlan(res)
    // probes and candidate ids are broadcast; the corpus scan itself
    // never hash-partitions — candidate ADC top-rerank and the exact
    // re-rank top-k are the only shuffles, both keyed by query_id and
    // bounded by |queries| x k-ish rows after map-side partials
    val exchanges = "Exchange hashpartitioning\\(query_id".r
      .findAllIn(plan).length
    exchanges shouldBe 2
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    "BroadcastExchange".r.findAllIn(plan).length should be >= 2
  }

  test("substring removal: the counting shuffle is keyed by the two " +
    "64-bit window hashes with a map-side partial") {
    val res = graft.ops.Dedup.removeDuplicatedSpans(
      docs, "doc_id", "text", windowTokens = 8, minDocs = 2)
    res.collect()
    val plan = finalPlan(res)
    // frequency counting shuffles on (__h1, __h2) — 16 bytes per
    // distinct (window, doc) — never on the span text, with partial
    // aggregation reducing before the exchange
    plan should include ("Exchange hashpartitioning(__h1")
    plan should include ("partial_count")
  }

  test("keySkew: single count aggregation (total reuses it — no second " +
    "corpus scan) and a bounded TakeOrdered top-k, no global sort") {
    val skew = graft.ops.Diagnostics.keySkew(
      spark.read.parquet(s"$sfDir/events.parquet"), Seq("user_id"), 10)
    skew.collect()
    val plan = finalPlan(skew)
    plan should include ("TakeOrderedAndProject")
    plan should not include "GlobalSort"
    // ONE scan: the grand-total branch must reuse the count aggregate's
    // exchange instead of re-reading the events source
    "Scan parquet".r.findAllIn(plan).length shouldBe 1
    assert(plan.contains("ReusedExchange"),
      "total branch did not reuse the counts exchange:\n" + plan)
  }

  test("ngram novelty: every exchange carries hashed gram keys, never " +
    "gram text") {
    val base = docs.limit(2000)
    val reference = docs.limit(200)
    val rep = graft.ops.TextOps.ngramNovelty(base, reference,
      "doc_id", "text", n = 8)
    rep.collect()
    val plan = finalPlan(rep)
    // both sides reduce grams to xxhash64 BEFORE the join: no exchange
    // output may contain the raw gram column `g` (only `gh` keys and
    // the per-doc aggregate)
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    exchanges should not be empty
    exchanges.foreach { line =>
      line should not include "g#"
    }
    plan should include ("xxhash64")
  }

  test("608-column profile in ONE pass (the reference's widest scenario)") {
    // the reference's wide-schema test profiles 608 columns in one
    // aggregation (WhyLogsTest.scala:107-128); pin the same shape here:
    // one job, one exchange, 608 profile structs out
    val base = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val wide = li.select((0 until 608).map(i =>
      (col(base(i % base.length)) + lit(i)).as(s"c$i")): _*)
      .limit(20000)
    val prof = wide.newProfilingSession().aggProfiles()
    val row = prof.collect()
    row.length shouldBe 1
    prof.schema.fields.count(_.name.startsWith("c")) shouldBe 608
    val plan = finalPlan(prof)
    // r17 per-column merge shape for WIDE (>= 64 col) global profiles:
    // partials fan into spark_partition_id groups (one states-only hash
    // exchange), posexplode turns the partial rows into (column-index,
    // state) rows that an explicit REPARTITION_BY_NUM exchange spreads
    // over every core (pinned: AQE must NOT coalesce it — a coalesced
    // merge re-serializes the tail), profile_merge reduces each column
    // in its own group reusing that partitioning (no third hash
    // exchange), and a single-partition collect_list map reassembles
    // the row. The limit fixture contributes its own exchange, and the
    // 1-split input legitimately gains the documented
    // update-parallelize round-robin (AutoParallelizeSpec) — pin that
    // no OTHER shuffle appears and all three aggregates are
    // ObjectHashAggregate pairs.
    "ObjectHashAggregate".r.findAllIn(plan).length should be >= 6
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    plan should include ("REPARTITION_BY_NUM")
    plan should include ("posexplode")
    "roundrobinpartitioning".r
      .findAllIn(plan.toLowerCase).length should be <= 1
  }

  test("mixture resampler: cutoffs broadcast, corpus filter map-only " +
    "(no corpus-side exchange)") {
    import spark.implicits._
    val w = Seq(("s0", 0.5), ("s1", 0.5)).toDF("domain", "weight")
    val res = graft.ops.Sampling.applyMixtureWeights(
      docs.withColumn("source", concat(lit("s"), col("doc_id") % 2)),
      "source", "doc_id", w, targetFraction = 0.3)
    res.collect()
    val plan = finalPlan(res)
    // the K-row cutoff table is the BUILD side of the survivor join
    // (explicit broadcast — AQE must never flip a 100 TB corpus onto
    // the build side), and the only real hash exchange in the plan is
    // the bounded per-domain count aggregate (K rows cross it); the
    // ReusedExchange reference to it is not a second shuffle
    plan should include ("BroadcastHashJoin")
    plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") &&
        !l.contains("ReusedExchange")) should be <= 1
  }

  test("funnel: one events shuffle, one sort — the chained step windows " +
    "and the final aggregate reuse both") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val res = graft.ops.Funnel.depth(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), tieCols = Seq("event_id"))
    res.collect()
    val plan = finalPlan(res)
    // K chained window passes + per-user aggregate: exactly one hash
    // exchange and one sort — a second of either means a step flag or
    // the aggregate stopped reusing the user partitioning
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    "\\bSort \\[".r.findAllIn(plan).length shouldBe 1
    "Window".r.findAllIn(plan).length should be >= 2
  }

  test("attribution: both touch-window passes share one exchange and " +
    "one sort, no self-join of the event table") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val res = graft.ops.EventStats.touchAttribution(ev, "user_id",
      "ts", "event_type", "event_id", Seq("view", "click"),
      "purchase", 3600L)
    res.collect()
    val plan = finalPlan(res)
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    "\\bSort \\[".r.findAllIn(plan).length shouldBe 1
    plan shouldNot include("Join")
  }

  test("basket co-occurrence: per-item totals reach the pair table " +
    "via broadcast joins — only baskets and pairs hash-exchange") {
    val res = graft.ops.Baskets.coOccurrence(li, "l_orderkey",
      "l_suppkey", minCount = 2L)
    res.collect()
    val plan = finalPlan(res)
    "BroadcastHashJoin".r.findAllIn(plan).length should be >= 2
    plan shouldNot include("SortMergeJoin")
    plan shouldNot include("CartesianProduct")
  }

  test("auc: rank statistic on the distinct-score counts — corpus " +
    "collapses through one partial aggregate, no pairwise join, no " +
    "unpartitioned corpus-scale window") {
    val scored = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("(vec_id % 7) / 6.0 AS s", "label >= 5 AS y")
    val (res, release) = graft.ops.ModelEval.aucReleasable(scored, "s", "y")
    try {
      res.collect()
      val plan = finalPlan(res)
      // the scored rows reduce map-side before any exchange; ranks come
      // from the prefix sum, so every window in the plan is keyed on
      // __pid (bounded offsets / per-partition running sum) — never a
      // single-partition sort of the score table
      plan should include ("partial_count")
      plan.linesIterator.filter(_.contains("Window "))
        .filterNot(_.contains("__pid")).toSeq shouldBe empty
      plan shouldNot include ("SortMergeJoin")
      unpartitionedWindows(res.queryExecution.executedPlan) shouldBe empty
    } finally release()
  }

  // ---- board-wide single-partition-window canary ----------------------

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.window.WindowExec
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

  /** Every node of the physical plan, descending through the AQE
    * wrapper, query stages, cached relations, and subqueries (all of
    * which hide their subtree from a plain TreeNode traversal).
    */
  private def walkPlans(plan: SparkPlan): Seq[SparkPlan] = {
    val nested = plan match {
      case a: AdaptiveSparkPlanExec => walkPlans(a.executedPlan)
      case q: QueryStageExec => walkPlans(q.plan)
      case s: InMemoryTableScanExec => walkPlans(s.relation.cachedPlan)
      case _ => Nil
    }
    plan +: (nested ++ plan.children.flatMap(walkPlans) ++
      plan.subqueries.flatMap(walkPlans))
  }

  /** Every WindowExec with an EMPTY partition spec whose ordering is
    * not the `__pid` offsets convention. An unpartitioned window
    * funnels its whole input through ONE task — the defect class that
    * made auc/rfm/concentration correct-but-unscalable; windows
    * ordered by `__pid` are the distributed-prefix-sum offsets frames
    * (#partitions rows, bounded by construction) and are allowed.
    */
  private def unpartitionedWindows(plan: SparkPlan): Seq[WindowExec] =
    walkPlans(plan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
          !(w.orderSpec.nonEmpty &&
            w.orderSpec.forall(_.child.references.exists(_.name == "__pid"))) =>
        w
    }

  test("board-wide: no driver query plans an unpartitioned WindowExec " +
    "outside the documented bounded-by-construction allowlist") {
    // Queries whose unpartitioned windows run over frames that are
    // BOUNDED BY CONSTRUCTION (never corpus- or key-cardinality):
    //  - q195/q196: Kaplan-Meier / log-rank curves window over
    //    DISTINCT bucketed event times — both queries floor durations
    //    to hours exactly so this window is bounded (the
    //    kaplanMeierImpl scaladoc documents the bucketing obligation)
    //  - q163: zipfFit's rank window reads the `orderBy().limit(topN)`
    //    TakeOrdered output — at most topN (200) rows by construction
    //  - q226: liftTable's cumulative windows run over the <= nBins
    //    (10) bin-aggregate output; the corpus-scale ranking beneath
    //    is the runningTotalsReleasable prefix sum, not a window
    val bounded: Set[String] = Set(
      "q163_zipf", "q195_survival", "q196_log_rank", "q226_lift_table")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val wins = unpartitionedWindows(fn(spark, sfDir)
            .queryExecution.sparkPlan)
          if (wins.isEmpty || bounded(name)) Nil
          else Seq(s"$name: ${wins.size} unpartitioned WindowExec " +
            wins.map(w => w.orderSpec.map(_.child.toString)
              .mkString("orderBy(", ",", ")")).mkString("; "))
        } catch {
          // a query that fails to PLAN is a canary failure too —
          // silently skipping it would blind this audit to exactly
          // the queries most likely to be broken (QueryBoardSpec pins
          // construction, but this spec must not self-blind)
          case e: Throwable =>
            Seq(s"$name: failed to plan (${e.getClass.getSimpleName})")
        }
    }
    assert(offenders.isEmpty,
      s"\n${offenders.size} queries plan a single-partition window " +
        s"(fix with FeatureScale.runningTotalsReleasable or allowlist " +
        s"with a boundedness argument):\n  ${offenders.mkString("\n  ")}")
  }

  test("board-wide: no query plans an UNBOUNDED cartesian / " +
    "nested-loop join (1-row-aggregate and tiny-literal builds allowed)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

    // the standard bounded shapes: an aggregate bounds the build to
    // its group cardinality (1 row when ungrouped — the
    // crossJoin(broadcast(stats)) pattern; K rows for the per-group
    // stats / quantile-edge / sketch tables the ops broadcast by
    // design); a literal LocalTableScan is caller-supplied config
    // (splits, edges, weights) and bounded by its row count.
    //
    // The bounding node must DOMINATE the side's output — reached by
    // walking only unary nodes down from the side's root, so every
    // row the join sees has passed through it. The r13 version
    // accepted an aggregate ANYWHERE in the side's subtree, which let
    // trendSlope's corpus self-cross-join through: both its sides
    // carried the broadcast 1-row tmin aggregate deep in their
    // lineage (as one input of an inner join), while the join OUTPUT
    // was the full corpus. A join is not pass-through (either input
    // can dominate cardinality), so the walk stops there.
    @annotation.tailrec
    def bounded(side: SparkPlan): Boolean = side match {
      case _: BaseAggregateExec => true
      case l: LocalTableScanExec => l.rows.lengthCompare(1000) <= 0
      case g: org.apache.spark.sql.execution.GlobalLimitExec
          if g.limit <= 10000 => true
      case c: org.apache.spark.sql.execution.CollectLimitExec
          if c.limit <= 10000 => true
      // AQE / cache / reuse wrappers are leaf nodes whose real plan
      // hangs off a field, not `children` — unwrap, don't stop
      case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case q: QueryStageExec => bounded(q.plan)
      case s: InMemoryTableScanExec => bounded(s.relation.cachedPlan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        bounded(r.child)
      case u if u.children.size == 1 => bounded(u.children.head)
      case _ => false
    }

    // Queries with a DOCUMENTED bounded all-pairs step:
    //  - q48: connected components demo builds its edge set by
    //    similarity over a fixture-bounded doc slice
    //    (SparkEntry q48 comment: fixture-only, never the scale path)
    //  - q45/q109/q152: bruteForceTopK broadcasts the QUERY side
    //    whole — the eval-set regime by contract (Similarity
    //    scaladoc); q109's brute pass is the recall ORACLE over 20
    //    eval queries, and q152's knnLabelNoise probes the count and
    //    re-routes through ivfTopK above the threshold
    //    (LabelNoiseSpec pins the boundary)
    //  - q216: semanticContamination broadcasts the EVAL side whole —
    //    an eval benchmark is bounded by construction (Similarity
    //    scaladoc names ivfTopK as the too-big-to-broadcast route)
    //  - q250: trendSlope routes on a MEASURED 1-row count probe —
    //    the exact all-pairs plan (the self-cross this canary sees)
    //    is only ever constructed when the probe reads
    //    n <= maxExactPoints (20k points = 200M pairs); above it the
    //    op plans the hash-bucketed equi-join sampler instead
    //    (TrendSlopeRouteSpec pins both sides of the boundary)
    val allowed: Set[String] =
      Set("q48_dedup_clusters", "q45_embedding_top1",
        "q109_ivfpq_recall", "q152_knn_label_noise",
        "q216_semantic_contamination", "q250_trend_slope")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val bad = walkPlans(fn(spark, sfDir).queryExecution.sparkPlan)
            .flatMap {
              case c: CartesianProductExec
                  if !bounded(c.left) && !bounded(c.right) =>
                Seq("cartesian")
              case b: BroadcastNestedLoopJoinExec =>
                val build = b.buildSide match {
                  case BuildLeft => b.left
                  case BuildRight => b.right
                }
                if (bounded(build)) Nil else Seq("nested-loop")
              case _ => Nil
            }
          if (bad.isEmpty || allowed(name)) Nil
          else Seq(s"$name: ${bad.mkString(",")}")
        } catch {
          // planning failures surface as offenders, not silent skips
          case e: Throwable =>
            Seq(s"$name: failed to plan (${e.getClass.getSimpleName})")
        }
    }
    assert(offenders.isEmpty,
      s"\n${offenders.size} queries plan an unbounded cross join " +
        s"(broadcast a measured-small side or allowlist with a " +
        s"boundedness argument):\n  ${offenders.mkString("\n  ")}")
  }
}
