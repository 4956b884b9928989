package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runs the native expressions with codegen fallback DISABLED, so a
  * janino compile error in generated code fails the test instead of
  * silently dropping the plan to interpreted evaluation (which is exactly
  * what a wrong `MODULE$` reference did to rolling_hash64 in round 1 —
  * results stayed correct, the stated performance purpose was defeated).
  *
  * Inputs MUST come from files, not `Seq.toDF`: the optimizer's
  * `ConvertToLocalRelation` evaluates projections over local relations
  * interpreted at plan time, so a local-relation test never reaches
  * janino and proves nothing about codegen.
  */
class CodegenOnlySpec extends SparkSpec {

  private lazy val strict = {
    val s = spark.newSession()
    // Internal-but-settable SQL confs: any codegen failure now throws.
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    s
  }

  private def refHash(str: String): Long =
    str.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xff))

  test("rolling_hash64 compiles and evaluates under CODEGEN_ONLY " +
      "(parquet scan, real whole-stage codegen)") {
    val docs = Tables.load(strict, sfDir, "documents")
    val got = docs.select(col("doc_id"),
        expr("rolling_hash64(text) AS h"))
      .orderBy("doc_id").limit(20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = docs.select("doc_id", "text").orderBy("doc_id").limit(20)
      .collect().map(r => r.getLong(0) -> refHash(r.getString(1))).toMap
    assert(got == expect)
  }

  test("common_prefix_length compiles and evaluates under CODEGEN_ONLY") {
    val docs = Tables.load(strict, sfDir, "documents")
    val got = docs
      .select(expr("common_prefix_length(text, substr(text, 1, 8)) AS l"))
      .agg(sum("l")).head().getLong(0)
    val expect = docs.select("text").collect()
      .map(r => CommonPrefixLength.lcp(r.getString(0), r.getString(0).take(8)))
      .map(_.toLong).sum
    assert(got == expect && got > 0)
  }

  test("filter + aggregate over rolling_hash64 stays codegen-clean") {
    val docs = Tables.load(strict, sfDir, "documents")
    val n = docs.select(expr("rolling_hash64(text) AS h"))
      .where("h % 2 = 0").count()
    val expect = docs.select("text").collect()
      .count(r => refHash(r.getString(0)) % 2 == 0)
    assert(n == expect)
  }

  test("nfc_normalize compiles and evaluates under CODEGEN_ONLY " +
      "(parquet scan, real whole-stage codegen)") {
    val docs = Tables.load(strict, sfDir, "documents")
    // fixture text is pure ASCII -> fast-path identity; mix in a
    // non-ASCII suffix so the Normalizer branch also runs codegen'd
    val got = docs
      .select(col("doc_id"),
        expr("nfc_normalize(concat(substr(text, 1, 8), 'e\u0301')) AS c"))
      .orderBy("doc_id").limit(10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = docs.select("doc_id", "text").orderBy("doc_id").limit(10)
      .collect().map(r => r.getLong(0) ->
        java.text.Normalizer.normalize(
          r.getString(1).take(8) + "e\u0301",
          java.text.Normalizer.Form.NFC)).toMap
    assert(got == expect)
    assert(expect.values.forall(_.endsWith("\u00e9")))
  }
}
