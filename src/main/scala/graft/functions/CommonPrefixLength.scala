package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Character length of the longest common prefix of two strings.
  *
  * Native codegen'd Catalyst expression (no UDF/serialization cost in the
  * hot path) backing the sorted-neighbor min-unique-prefix algorithm: the
  * reference's product query (reference src/main.cpp:61-97) asks for the
  * smallest L making every line's L-prefix unique, which equals
  * `1 + max(lcp(adjacent sorted lines))`.
  *
  * Byte-wise scan on the UTF8String payloads, then a char count over the
  * matched slice, so multi-byte codepoints are counted correctly (UTF-8
  * guarantees a common byte prefix boundary never splits a codepoint both
  * sides share).
  */
case class CommonPrefixLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_length"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CommonPrefixLength.lcp(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixLength" +
        "$" + s".MODULE$$.lcp($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLength =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLength {
  /** Invoked from generated Java code — keep signature stable. */
  def lcp(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    UTF8String.fromBytes(ab, 0, i).numChars()
  }

  /** Plain-Scala mirror used inside mapPartitions closures. */
  def lcp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  /** Expose to SQL/expr() as `common_prefix_length(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "common_prefix_length",
      exprs => CommonPrefixLength(exprs.head, exprs(1)),
      "built-in")
}
