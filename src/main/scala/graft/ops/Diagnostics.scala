package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-shuffle diagnostics: measure a prospective join/aggregation key
  * BEFORE committing a 100 TB job to it. A key whose top entry owns
  * double-digit share needs [[Joins.saltedJoin]] (or AQE skew-join
  * splitting); this report is the cheap way to know in advance.
  */
object Diagnostics {

  /** Order-insensitive cross-engine table checksum: one row per
    * component — `__rows` (the full row digest over `cols` in the
    * given order) and each column individually — with the shared
    * row count. Two tables match iff every checksum and `n` match,
    * regardless of row order, partitioning, or engine: the digest is
    * `sum(conv(md5(canonical string)[0..15], 16, 10) % 1e9+7) % 1e9+7`
    * carried as a two-level modular LONG sum (per-partition partials
    * folded mod P — a flat LONG sum wraps past ~9.2e9 rows, the
    * regime this check exists for; modular addition makes the
    * grouping invisible in the result), all pieces (md5, hex parse,
    * modulo, sum) arithmetic both Spark and the DuckDB oracle
    * implement identically. The migration /
    * replication parity check: run on both sides of a copy, diff two
    * tiny frames instead of 100 TB.
    *
    * Canonicalization: values cast to string with NULL as the
    * sentinel `<NULL>` (a real value equal to the sentinel would
    * collide — acceptable for a checksum, documented); floating
    * formats differ across engines, so cast/round doubles to strings
    * YOURSELF before trusting a cross-engine match on them.
    *
    * Scale shape: ONE map-side-combined aggregate; nothing shuffles
    * but the k+1 partial sums.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val P = 1000000007L
    def canon(name: String) =
      coalesce(col(name).cast("string"), lit("<NULL>"))
    def digest(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10)
        .cast("long") % P
    // per-row digests are < P ~ 1e9, so a flat LONG sum wraps (ANSI:
    // throws) past ~9.2e9 rows — exactly the 100 TB regime this check
    // exists for. A decimal(38,0) sum is safe but ~2x slower in the
    // per-row hot loop (measured on the bench row), so sum in two
    // modular levels instead: LONG partials per input partition
    // (overflow would need >9.2e9 rows in ONE partition — orders of
    // magnitude past any sane partitioning), fold each partial mod P,
    // then LONG-sum the per-partition residues (#partitions x P fits
    // comfortably) and fold again. (a%P + b%P) % P == (a+b) % P, so
    // the result is bit-identical to the oracle's flat HUGEINT sum
    // mod P at any grouping.
    // the per-row md5 digests are the whole cost and run map-side on
    // the scan's split count: spread an under-split input (no-op at
    // scale, Parallelism.spreadIfNarrow) — the exchange carries only
    // the checksummed columns, and the partials stay per-partition
    val spread = Parallelism.spreadIfNarrow(df.select(cols.map(col): _*))
    val rowStr = concat_ws("|", cols.map(canon): _*)
    val partialAggs =
      (count(lit(1)).as("n") +:
        sum(digest(rowStr)).as("__ck___rows") +:
        cols.map(c => sum(digest(canon(c))).as(s"__ck_$c")))
    val partials = spread.groupBy(spark_partition_id().as("__pid"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    // an EMPTY table has zero per-partition partials, so the outer
    // sums are NULL — coalesce to the old df.agg(count) semantics
    // (n = 0, checksum 0): an empty-to-empty copy must MATCH, not
    // report NULL != 0 against the oracle's count(*)
    val finalAggs =
      (coalesce(sum(col("n")), lit(0L)).as("n") +:
        ("__rows" +: cols).map(name =>
          coalesce(pmod(sum(pmod(col(s"__ck_$name"), lit(P))), lit(P)),
            lit(0L)).as(s"__ck_$name")))
    val one = partials.agg(finalAggs.head, finalAggs.tail: _*)
    val components = ("__rows" +: cols).map { name =>
      struct(lit(name).as("component"),
        col(s"__ck_$name").as("checksum"))
    }
    one.select(col("n"),
      explode(array(components: _*)).as("c"))
      .select(col("c.component"), col("n"), col("c.checksum"))
  }

  /** Heaviest `topK` values of a prospective shuffle key with exact
    * counts and corpus share. Deterministic total order (count desc,
    * then key columns asc).
    *
    * Scale shape: ONE count aggregation with map-side combine (shuffle
    * carries distinct keys), the total rides a 1-row broadcast, and the
    * top-k is `TakeOrderedAndProject` — each partition contributes at
    * most k rows, no full sort.
    */
  def keySkew(df: DataFrame, keyCols: Seq[String], topK: Int): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    // total = sum over the already-aggregated counts, NOT a second
    // df.count() scan: both consumers share counts' exchange (the
    // unigramPerplexity `tot` pattern), so the input is read once
    val total = counts.agg(sum(col("n")).cast("double").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(keyCols.map(col) ++ Seq(col("n"),
        round(col("n") / col("__total"), 6).as("share")): _*)
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
  }

  /** Snapshot diff between two versions of a keyed corpus: one row
    * with `n_added` (id only in `newer`), `n_removed` (only in
    * `older`), `n_changed` (both, any `compareCols` value differs),
    * `n_unchanged`, and both totals — the pre-flight check before
    * re-running an expensive pipeline on a "refreshed" corpus (a 2%
    * delta wants incremental processing; an 80% delta wants a full
    * rerun and an alarm).
    *
    * Scale shape: each side reduces to (id, 64-bit content hash)
    * map-side — payload columns never shuffle; the full outer join on
    * id and the final 1-row count aggregate are the only exchanges.
    * NULL values hash distinctly from empty strings (type-tagged
    * hash input).
    */
  /** Exact output-size forecast for a prospective equi-join: one row
    * with both sides' row/key counts and `join_rows` = sum over
    * matching keys of cnt_left * cnt_right — the number the optimizer
    * only estimates, computed exactly BEFORE committing the join.
    * A forecast orders of magnitude above either input is the skew /
    * many-to-many explosion warning.
    *
    * Scale shape: each side reduces to (key, count) map-side; the
    * count tables join on the key (key-cardinality-sized, not
    * row-sized) and one 1-row aggregate finishes. NULL keys never
    * match (SQL join semantics) and are excluded.
    */
  def joinSizeEstimate(
      left: DataFrame,
      right: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String]): DataFrame = {
    require(leftKeyCols.nonEmpty &&
      leftKeyCols.size == rightKeyCols.size,
      "key column lists must be non-empty and same-length")
    def counts(df: DataFrame, cols0: Seq[String], out: String) =
      df.filter(cols0.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(cols0.map(col): _*)
        .agg(count(lit(1)).as(out))
        .select(cols0.zipWithIndex
          .map { case (c, i) => col(c).as(s"__k$i") } :+ col(out): _*)
    val lc = counts(left, leftKeyCols, "__nl")
    val rc = counts(right, rightKeyCols, "__nr")
    val keyCols0 = leftKeyCols.indices.map(i => s"__k$i")
    lc.join(rc, keyCols0, "full_outer")
      .agg(
        coalesce(sum(col("__nl")), lit(0L)).as("n_left"),
        coalesce(sum(col("__nr")), lit(0L)).as("n_right"),
        count(when(col("__nl").isNotNull, 1)).as("n_left_keys"),
        count(when(col("__nr").isNotNull, 1)).as("n_right_keys"),
        count(when(col("__nl").isNotNull && col("__nr").isNotNull, 1))
          .as("n_matched_keys"),
        coalesce(sum(col("__nl") * col("__nr")), lit(0L))
          .as("join_rows"))
  }

  def corpusDiff(
      older: DataFrame,
      newer: DataFrame,
      idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def h(df: DataFrame, side: String): DataFrame =
      df.filter(col(idCol).isNotNull)
        .select(col(idCol).as("__id"),
          xxhash64(compareCols.map(col): _*).as(s"__h_$side"))
    h(older, "old").join(h(newer, "new"), Seq("__id"), "full_outer")
      .agg(
        sum(when(col("__h_old").isNull, 1).otherwise(0))
          .cast("long").as("n_added"),
        sum(when(col("__h_new").isNull, 1).otherwise(0))
          .cast("long").as("n_removed"),
        sum(when(col("__h_old").isNotNull && col("__h_new").isNotNull &&
          col("__h_old") =!= col("__h_new"), 1).otherwise(0))
          .cast("long").as("n_changed"),
        sum(when(col("__h_old") === col("__h_new"), 1).otherwise(0))
          .cast("long").as("n_unchanged"),
        sum(when(col("__h_old").isNotNull, 1).otherwise(0))
          .cast("long").as("n_old"),
        sum(when(col("__h_new").isNotNull, 1).otherwise(0))
          .cast("long").as("n_new"))
  }

  /** Benford's-law conformance screen over a numeric column — the
    * classic fabricated-/truncated-data tell for amounts that span
    * orders of magnitude (prices, populations, file sizes). One row
    * per leading digit 1-9 (zero-count digits included): n, observed
    * share, the Benford expectation log10(1 + 1/d), plus the overall
    * chi-squared statistic vs the expectation and the mean absolute
    * deviation repeated on every row (the single-query report shape).
    * Values below 1, NULL, and NaN are excluded (a sub-1 value's
    * leading significant digit is scale-dependent; integer-exact
    * extraction needs the integer part). The digit comes from the
    * decimal string of floor(x) — identical across engines, no
    * floating log10 at a power-of-10 boundary.
    *
    * Scale shape: the corpus collapses to at most 9 digit counts in
    * one map-side-combined aggregate; everything after is 9-row
    * arithmetic on broadcast 1-row totals.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")) &&
        col("__v") >= 1.0)
      .select(substring(floor(col("__v")).cast("long").cast("string"),
        1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("__n0"))
    val all = df.sparkSession.range(1, 10).toDF("digit")
      .join(digits, Seq("digit"), "left")
      .select(col("digit"),
        coalesce(col("__n0"), lit(0L)).as("n"),
        (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
          .as("__e"))
    // NULL (not 0) when no values survive the filter: ANSI mode makes
    // x/0 an error, x/NULL the wanted NULL report
    val totals = all.agg(nullif(sum(col("n")).cast("double"), lit(0.0))
      .as("__nn"))
    val withTot = all.crossJoin(broadcast(totals))
    val fit = withTot.agg(
      sum((col("n") - col("__nn") * col("__e")) *
        (col("n") - col("__nn") * col("__e")) /
        (col("__nn") * col("__e"))).as("__chi2"),
      avg(abs(col("n") / col("__nn") - col("__e"))).as("__mad"))
    withTot.crossJoin(broadcast(fit))
      .select(col("digit"), col("n"),
        (round(col("n") / col("__nn"), 6) + lit(0.0)).as("share"),
        (round(col("__e"), 6) + lit(0.0)).as("expected"),
        (round(col("__chi2"), 6) + lit(0.0)).as("chi2"),
        (round(col("__mad"), 6) + lit(0.0)).as("mad"))
  }

  /** Functional-dependency screen: for each candidate (determinant →
    * dependent) column pair, does every determinant value map to ONE
    * dependent value? One row per pair: n_groups, n_violating_groups
    * (determinant values with >1 distinct dependent — NULL counts as
    * a distinct value when present alongside non-NULLs), n_rows_at_risk
    * (rows under violating determinants), and `holds`. The
    * data-quality pre-flight before trusting a column as a lookup key,
    * a denormalization, or a join dimension.
    *
    * Scale shape: one map-side-combined aggregate per candidate pair
    * (the pair list is user-bounded), each collapsing the corpus to
    * its determinant cardinality, then a 1-row summary; pairs union.
    */
  def functionalDependencies(
      df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "pairs must be non-empty")
    pairs.map { case (det, dep) =>
      df.groupBy(col(det).as("__k"))
        .agg(count(lit(1)).as("__n"),
          (count_distinct(col(dep)) +
            max(when(col(dep).isNull, 1L).otherwise(0L))).as("__d"))
        .agg(
          count(lit(1)).as("n_groups"),
          coalesce(sum(when(col("__d") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_violating_groups"),
          coalesce(sum(when(col("__d") > 1, col("__n")).otherwise(0L)),
            lit(0L)).as("n_rows_at_risk"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_groups"), col("n_violating_groups"),
          col("n_rows_at_risk"),
          (col("n_violating_groups") === 0).as("holds"))
    }.reduce(_ unionAll _)
  }
}
