package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared word-shingling core: the single definition of tokenization and
  * k-shingle enumeration that [[WordShingles]] and [[MinHashSig]] both
  * build on — one tokenizer to keep LSH signatures and exact-Jaccard
  * shingles byte-identical by construction.
  *
  * Semantics: tokens are maximal runs of non-whitespace in `lower(text)`;
  * shingles are k consecutive tokens joined by a single space; fewer than
  * k tokens yields one shingle of all tokens joined (the whole text);
  * DISTINCT shingles only, first-occurrence order.
  */
private[functions] object Shingling {

  def tokenize(text: String): mutable.ArrayBuffer[String] = {
    val tokens = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) tokens += text.substring(start, i)
    }
    tokens
  }

  /** Invoke `f` once per DISTINCT k-shingle, in first-occurrence order. */
  def foreachDistinctShingle(tokens: mutable.ArrayBuffer[String], k: Int)(
      f: String => Unit): Unit = {
    if (tokens.length < k) {
      f(tokens.mkString(" "))
    } else {
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s <= tokens.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(s + j))
          j += 1
        }
        val shingle = sb.toString
        if (seen.add(shingle)) f(shingle)
        s += 1
      }
    }
  }
}

/** Distinct word k-shingles of lowercased text, as one monolithic
  * expression: single scan, no intermediate token/slice arrays.
  *
  * Replaces the split + filter + transform(slice) + array_distinct
  * composition: higher-order functions evaluate interpreted with
  * per-element lambda dispatch and slice() array copies — ~1ms per
  * document; this is ~micros.
  *
  * Semantics: see [[Shingling]].
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val tokens = Shingling.tokenize(text)
    val out = mutable.ArrayBuffer.empty[UTF8String]
    Shingling.foreachDistinctShingle(tokens, k) { sh =>
      out += UTF8String.fromString(sh)
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
