package graft.types

import org.apache.spark.sql.types._

/** 6-value dynamic type lattice used by the profiling engine.
  *
  * Semantics follow the reference's inferred-type model
  * (/root/reference/core/src/main/java/com/whylogs/core/types/TypedData.java:11-58,
  * /root/reference/core/src/main/java/com/whylogs/core/statistics/SchemaTracker.java:41-105),
  * re-expressed as plain Scala. Values ingested from dynamically-typed
  * sources (strings, CSV) are classified into one of these types; typed
  * Spark columns map statically from their [[DataType]].
  */
object InferredType extends Enumeration {
  type InferredType = Value
  // Stable ordinals used in the serialized profile state.
  val Unknown: Value = Value(0, "UNKNOWN")
  val Null: Value = Value(1, "NULL")
  val Fractional: Value = Value(2, "FRACTIONAL")
  val Integral: Value = Value(3, "INTEGRAL")
  val Boolean: Value = Value(4, "BOOLEAN")
  val String: Value = Value(5, "STRING")

  /** Static mapping from a Spark DataType to the lattice (for typed columns
    * no per-row inference is needed — the scan schema decides).
    */
  def fromDataType(dt: DataType): InferredType = dt match {
    case ByteType | ShortType | IntegerType | LongType => Integral
    case FloatType | DoubleType                        => Fractional
    case _: DecimalType                                => Fractional
    case BooleanType                                   => Boolean
    case StringType                                    => String
    case NullType                                      => Null
    case _                                             => Unknown
  }

  private val IntRe = """^[-+]? ?\d+$""".r
  private val FracRe = """^[-+]? ?\d+\.\d+$""".r
  private val SciRe = """^[-+]? ?\d+(\.\d+)?[eE][-+]?\d+$""".r
  private val BoolRe = """(?i)^(true|false)$""".r

  /** Opt-in string-to-number classification (reference gates this behind
    * WHYLOGS_ENABLE_STRING_MATCHING,
    * /root/reference/core/src/main/java/com/whylogs/core/types/TypedDataConverter.java:62-84).
    */
  def classifyString(s: java.lang.String): InferredType = s match {
    case IntRe()     => Integral
    case FracRe()    => Fractional
    case SciRe(_)    => Fractional
    case BoolRe(_)   => Boolean
    case _           => String
  }
}
