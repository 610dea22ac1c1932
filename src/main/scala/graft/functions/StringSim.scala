package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static runtime for [[JaroWinkler]] — one call site shared by the
  * interpreted and generated paths.
  *
  * Semantics pinned to the DuckDB oracle's `jaro_winkler_similarity`
  * (probed, not assumed): the comparison runs over UTF-8 BYTES (a
  * 2-byte codepoint is two units — 'héllo' vs 'hello' scores 0.84,
  * not the 0.867 a codepoint comparison gives), both-empty scores 0.0
  * (not the 1.0 some libraries return), the Winkler prefix bonus caps
  * at 4 units with scaling 0.1, and the bonus applies only when the
  * Jaro score exceeds the standard 0.7 boost threshold.
  */
object StringSimRuntime {

  /** Jaro similarity on UTF-8 bytes: m matches inside the
    * floor(max(|a|,|b|)/2) - 1 window, t = out-of-order matched pairs
    * over 2, jaro = (m/|a| + m/|b| + (m-t)/m) / 3; 0.0 when either
    * side is empty or nothing matches.
    */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Jaro-Winkler: [[jaro]] plus the common-prefix bonus
    * `min(prefix, 4) * 0.1 * (1 - jaro)`, applied only above the 0.7
    * boost threshold.
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.getBytes
    val b = ub.getBytes
    val max = math.min(4, math.min(a.length, b.length))
    var p = 0
    while (p < max && a(p) == b(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}

/** Jaro-Winkler string similarity as a native Catalyst expression: the
  * edit-distance-free name/title matcher under
  * [[graft.ops.Joins.nameMatchPairs]] record linkage — where
  * `levenshtein` charges typos by count, Jaro-Winkler weights the
  * shared-prefix structure real-world name variants have. Codegen'd:
  * the generated code is one static call, so scoring runs inside
  * whole-stage codegen on the blocked candidate pairs.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimRuntime.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimRuntime.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
