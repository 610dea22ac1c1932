package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: association statistics between
  * item pairs that share a basket (order, session, document) — the
  * classic support / confidence / lift screen, used in pipelines to
  * surface redundant sources and correlated labels as much as for
  * recommendations.
  *
  * Scale shape: items dedupe per basket in one exchange; pair
  * generation is a self-join WITHIN each basket key (output bounded by
  * sum C(basket_size, 2) — cap outliers upstream with
  * [[Sampling.capPerKey]]); per-pair and per-item counts are bounded
  * aggregations of the pair/item streams, and per-item totals ride a
  * broadcast join onto the pair table. Basket contents never leave
  * their basket's partition until reduced to counts.
  */
object Baskets {

  /** Item-pair association over baskets: one row per unordered pair
    * (item_a < item_b) that co-occurs in >= `minCount` baskets, with
    * `n_ab` / `n_a` / `n_b` (basket counts), `support` (= n_ab /
    * n_baskets), `confidence` (P(b in basket | a in basket) = n_ab /
    * n_a), and `lift` (= n_ab * n / (n_a * n_b)). Presence is
    * per-basket DISTINCT: duplicates of an item inside one basket
    * count once.
    */
  def coOccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val present = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = present.groupBy(col("__b")).agg(lit(1))
      .count().toDouble
    val itemCounts = present.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ni"))
    val a = present.select(col("__b"), col("__i").as("item_a"))
    val b = present.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__ni", "n_a")), Seq("item_a"))
      .join(broadcast(itemCounts.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__ni", "n_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        (col("n_ab") / nBaskets).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        (col("n_ab") * nBaskets / (col("n_a") * col("n_b")))
          .as("lift"))
  }
}
