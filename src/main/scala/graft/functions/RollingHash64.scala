package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash (Rabin–Karp family, base 31, natural
  * 2^64 wraparound) over a string's UTF-8 bytes — the classic document
  * fingerprint primitive. Native codegen'd Catalyst expression: the hot
  * loop is a per-byte multiply-add over the UTF8String payload with no
  * object allocation, staying inside whole-stage codegen.
  *
  * Wraparound arithmetic is exempt from ANSI overflow checking because it
  * happens in JVM long math inside [[RollingHash64.hash]], not in SQL
  * arithmetic expressions.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String])

  // NB: the companion OBJECT compiles to class `RollingHash64$` — the
  // generated Java must reference that class's MODULE$ field (the case
  // class `RollingHash64` has none, and janino would fail to compile the
  // plan, silently dropping to interpreted eval).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "graft.functions.RollingHash64" + "$" + s".MODULE$$.hash($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHash64 = copy(child = newChild)
}

object RollingHash64 {
  /** Invoked from generated Java — keep the signature stable. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 31L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** Expose to SQL/expr() as `rolling_hash64(s)` (session-wide injection
    * lives in [[graft.GraftExtensions]]). Idempotent: sessions built with
    * the extensions already have the function, and re-registering would
    * log a replace-warning per call site. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash64")))
      reg.createOrReplaceTempFunction(
        "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
  }
}
