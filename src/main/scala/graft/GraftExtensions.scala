package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.io.EasyDateTime

/** Session extension (SURVEY §4: `spark.sql.extensions` +
  * `injectFunction`): registers every engine function permanently in the
  * session catalog, so `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the whole surface SQL-callable with no Scala code — including on
  * clusters where jobs are submitted as pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
    // narrow-rows-through-the-shuffle rewrite for the profile
    // update-parallelize repartition (see NarrowRepartitionRule)
    ext.injectOptimizerRule(_ => graft.plans.NarrowRepartitionRule)
  }
}

object GraftExtensions {
  /** name -> builder for every SQL-exposed function. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_profile" -> (es => ColumnProfileAgg(es.head).toAggregateExpression()),
    "graft_profile_merge" -> (es => ProfileMergeAgg(es.head).toAggregateExpression()),
    "graft_profile_state" -> (es => ColumnProfileStateAgg(es.head).toAggregateExpression()),
    "kll_agg" -> (es => KllAgg(es.head).toAggregateExpression()),
    "kll_merge" -> (es => KllMergeAgg(es.head).toAggregateExpression()),
    "kll_quantile" -> (es => KllQuantile(es(0), es(1))),
    "kll_quantiles" -> (es => KllQuantiles(es(0), es(1))),
    "kll_n" -> (es => KllN(es.head)),
    "kll_histogram" -> (es => KllHistogram(es(0), es(1))),
    "kll_histogram_splits" -> (es => KllHistogramSplits(es(0), es(1))),
    "theta_agg" -> (es => ThetaAgg(es.head).toAggregateExpression()),
    "theta_merge" -> (es => ThetaMergeAgg(es.head).toAggregateExpression()),
    "theta_estimate" -> (es => ThetaEstimate(es.head)),
    "theta_summary" -> (es => ThetaSummary(es.head)),
    "theta_intersect" -> (es => ThetaIntersect(es(0), es(1))),
    "theta_a_not_b" -> (es => ThetaAnotB(es(0), es(1))),
    "kll_rank" -> (es => KllRank(es(0), es(1))),
    "hll_agg" -> (es => HllAgg(es.head).toAggregateExpression()),
    "hll_merge" -> (es => HllMergeAgg(es.head).toAggregateExpression()),
    "hll_estimate" -> (es => HllEstimate(es.head)),
    "hll_summary" -> (es => HllSummary(es.head)),
    "freq_items_agg" -> (es => FreqItemsAgg(es.head).toAggregateExpression()),
    "freq_items_merge" -> (es => FreqItemsMergeAgg(es.head).toAggregateExpression()),
    "freq_items_topk" -> (es => FreqItemsTopK(es(0), es(1))),
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_match_count" -> (es => VecMatchCount(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "rolling_hash64" -> (es => RollingHash64(es.head)),
    "word_shingles" -> (es => WordShingles(es(0),
      es(1).eval().asInstanceOf[Int])),
    "band_hashes" -> (es => BandHashes(es(0),
      es(1).eval().asInstanceOf[Int])),
    "easy_datetime" -> (es => EasyDateTime(es(0),
      es(1).eval().toString)),
    "topk_agg" -> (es => TopKAgg(es(0), es(1),
      es(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    "vec_sum" -> (es => VecSumAgg(es.head).toAggregateExpression()),
    "vec_min" -> (es => VecMinAgg(es.head).toAggregateExpression()),
    "nfc_normalize" -> (es => NfcNormalize(es.head)),
    "jaro_winkler" -> (es => JaroWinkler(es(0), es(1))),
    "char_entropy" -> (es => CharEntropy(es.head)),
    "normalize_text" -> (es => org.apache.spark.sql.GraftBridge.expression(
      graft.ops.TextOps.normalizeText(
        org.apache.spark.sql.GraftBridge.column(es.head)))),
    "collapse_repeated_lines" -> (es =>
      org.apache.spark.sql.GraftBridge.expression(
        graft.ops.TextOps.collapseRepeatedLines(
          org.apache.spark.sql.GraftBridge.column(es.head)))),
    "bloom_agg" -> (es => BloomAgg(es(0),
      if (es.length > 1) es(1).eval().asInstanceOf[Number].longValue
      else 1L << 23,
      if (es.length > 2) es(2).eval().asInstanceOf[Number].intValue
      else 5).toAggregateExpression()),
    "bloom_might_contain" -> (es => BloomMightContain(es(0), es(1))),
    "proto_column_stats" -> (es => graft.io.ProtoColumnStats(es(0),
      es(1).eval().toString)),
    "proto_tags" -> (es => graft.io.ProtoTags(es.head)),
    // hashed_token_score(text, nBuckets): formula-weight linear scoring
    // (the broadcast-weights form is API-only — a broadcast can't ride
    // a SQL literal)
    "hashed_token_score" -> (es => HashedTokenScore(es(0),
      es(1).eval().asInstanceOf[Number].intValue, None)))
}
