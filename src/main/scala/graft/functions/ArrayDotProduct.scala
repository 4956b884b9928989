package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Dot product of two equal-length numeric arrays (`array<double>` or
  * `array<long>`, both sides the same element type; result type follows
  * the elements).
  *
  * Native codegen'd Catalyst expression replacing the
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0, (acc, x) -> acc + x)`
  * idiom in the similarity hot paths: Spark's higher-order functions
  * are CodegenFallback — every pair evaluation leaves whole-stage
  * codegen, allocates the zipped intermediate array, and interprets two
  * lambas per element — while this is one fused primitive loop over the
  * ArrayData payloads. Same algebra, same values (Long adds wrap
  * identically, double adds associate identically in index order), so
  * swapping it under an oracle-pinned query cannot change a hash.
  *
  * Contract (matching every call site: fixed-dim embedding vectors):
  * both arrays non-null with non-null elements and equal length. The
  * loops read elements primitively, so the contract is ENFORCED, not
  * assumed — these are registered session-wide SQL functions, and an
  * ad-hoc caller with ragged or null-element arrays must get a loud
  * error, never a silently truncated/garbage number: lengths are
  * compared up front (O(1)) and null elements rejected by a scan that
  * is compiled out entirely when the array type says
  * `containsNull=false` (the audited internal call sites' shape, so
  * the hot paths pay only the length compare).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(t: DataType): DataType =
    t.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = elem(left.dataType)
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot needs two array<long> or two array<double>, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    ArrayDotProduct.check(a, b, ArrayPairGuard.nullableElems(this), prettyName)
    dataType match {
      case LongType => ArrayDotProduct.dotL(a, b)
      case _        => ArrayDotProduct.dotD(a, b)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (dataType == LongType) "dotL" else "dotD"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      ArrayPairGuard.guardCode(this, a, b) +
        s"${ev.value} = graft.functions.ArrayDotProduct" +
        "$" + s".MODULE$$.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Shared runtime contract guard for the fused array kernels: ragged
  * lengths always rejected (O(1)); element-null scan emitted only when
  * either child's ArrayType admits nulls, so `containsNull=false`
  * inputs (the internal hot paths) compile the scan out entirely. */
private[functions] object ArrayPairGuard {
  def nullableElems(e: BinaryExpression): Boolean =
    e.left.dataType.asInstanceOf[ArrayType].containsNull ||
      e.right.dataType.asInstanceOf[ArrayType].containsNull

  def guardCode(e: BinaryExpression, a: String, b: String): String = {
    val pretty = e.asInstanceOf[Expression].prettyName
    s"""graft.functions.ArrayDotProduct$$.MODULE$$.check($a, $b, """ +
      s"""${nullableElems(e)}, "$pretty");"""
  }
}

/** Squared L2 distance of two equal-length numeric arrays — the
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0, +)` idiom in
  * the PQ encode/LUT paths as one fused native loop. Same contract and
  * same index-order arithmetic as [[ArrayDotProduct]], so swapping it
  * under an oracle-pinned query cannot change a hash. */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(t: DataType): DataType =
    t.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = elem(left.dataType)
  override def prettyName: String = "array_l2sq"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_l2sq needs two array<long> or two array<double>, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    ArrayDotProduct.check(a, b, ArrayPairGuard.nullableElems(this), prettyName)
    dataType match {
      case LongType => ArrayDotProduct.l2sqL(a, b)
      case _        => ArrayDotProduct.l2sqD(a, b)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (dataType == LongType) "l2sqL" else "l2sqD"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      ArrayPairGuard.guardCode(this, a, b) +
        s"${ev.value} = graft.functions.ArrayDotProduct" +
        "$" + s".MODULE$$.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two equal-length `array<long>`s agree — the
  * MinHash matching-slot estimate's
  * `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))` as one fused
  * native loop (that idiom allocates TWO intermediate arrays per pair
  * and interprets both lambdas). Same contract as [[ArrayDotProduct]]. */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_eq_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_eq_count needs two array<long>, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    ArrayDotProduct.check(a, b, ArrayPairGuard.nullableElems(this), prettyName)
    ArrayDotProduct.eqCountL(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      ArrayPairGuard.guardCode(this, a, b) +
        s"${ev.value} = graft.functions.ArrayDotProduct" +
        "$" + s".MODULE$$.eqCountL($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Runtime contract guard, invoked from generated Java code — keep
    * signature stable. Length compare always; the element-null scan
    * runs only when `checkNulls` (a compile-time constant in generated
    * code, so `containsNull=false` call sites branch-eliminate it). */
  def check(a: ArrayData, b: ArrayData, checkNulls: Boolean,
      fn: String): Unit = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$fn: array lengths differ ($n vs ${b.numElements()}) — " +
          "both inputs must be same-dimension vectors")
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i))
          throw new IllegalArgumentException(
            s"$fn: null array element at index $i — " +
              "null elements are not valid vector components")
        i += 1
      }
    }
  }

  /** Invoked from generated Java code — keep signature stable. */
  def eqCountL(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Invoked from generated Java code — keep signature stable. */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Invoked from generated Java code — keep signature stable. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0d
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Invoked from generated Java code — keep signature stable. */
  def l2sqL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Invoked from generated Java code — keep signature stable. */
  def l2sqD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0d
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Expose to SQL/expr() as `array_dot(a, b)` / `array_l2sq(a, b)`
    * (session-wide injection lives in [[graft.GraftExtensions]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("array_dot")))
      reg.createOrReplaceTempFunction(
        "array_dot", exprs => ArrayDotProduct(exprs.head, exprs(1)),
        "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("array_l2sq")))
      reg.createOrReplaceTempFunction(
        "array_l2sq", exprs => ArrayL2Sq(exprs.head, exprs(1)),
        "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("array_eq_count")))
      reg.createOrReplaceTempFunction(
        "array_eq_count", exprs => ArrayEqCount(exprs.head, exprs(1)),
        "built-in")
  }
}
