package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd Catalyst expression — Spark has no normalization builtin,
  * and real corpora carry the same text in mixed encodings (precomposed
  * `é` U+00E9 vs `e` + combining U+0301), which every dedup pass must
  * canonicalize FIRST or the copies hash apart. Named `nfc_normalize`
  * to mirror DuckDB's function of the same name, so oracle SQL and
  * engine SQL read identically.
  *
  * Fast path: a pure-ASCII payload (every byte < 0x80) is NFC by
  * construction and is returned without materializing a Java String —
  * at web-corpus scale the overwhelmingly common case costs one byte
  * scan, and only genuinely non-ASCII rows pay the
  * `java.text.Normalizer` round trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize" + "$" + s".MODULE$$.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Invoked from generated Java code — keep signature stable. */
  def nfc(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) != 0) {
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str,
            java.text.Normalizer.Form.NFC)) s
          else UTF8String.fromString(java.text.Normalizer.normalize(str,
            java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }

  /** Expose to SQL/expr() as `nfc_normalize(s)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => NfcNormalize(exprs.head),
      "built-in")
}
