package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native Catalyst expression: interpreted eval, codegen path (via a
  * DataFrame query), SQL registration, and multi-byte correctness.
  */
class CommonPrefixLengthSpec extends SparkSpec {
  import spark.implicits._

  test("plain-Scala lcp") {
    assert(CommonPrefixLength.lcp("hello", "help") == 3)
    assert(CommonPrefixLength.lcp("", "x") == 0)
    assert(CommonPrefixLength.lcp("same", "same") == 4)
  }

  test("UTF8String lcp counts characters, not bytes, on multi-byte input") {
    val a = UTF8String.fromString("héllo")   // é is 2 bytes
    val b = UTF8String.fromString("hélp")
    assert(CommonPrefixLength.lcp(a, b) == 3) // h, é, l
  }

  test("codegen path through a DataFrame query matches Scala impl") {
    CommonPrefixLength.register(spark)
    val pairs = Seq(("hello", "help"), ("héllo", "hélp"), ("", "abc"),
      ("same", "same"), ("ab", "cd"))
    val out = pairs.toDF("a", "b")
      .selectExpr("common_prefix_length(a, b) as l")
      .as[Int].collect().toSeq
    assert(out == pairs.map { case (x, y) => CommonPrefixLength.lcp(x, y) })
  }

  test("GraftExtensions injects the function session-wide (survives " +
      "newSession, unlike temp registration)") {
    // temp functions don't carry into a new session; extension-injected
    // built-ins do — this discriminates the injection path
    val fresh = spark.newSession()
    val r = fresh.sql("SELECT common_prefix_length('hello', 'help') AS l")
      .head().getInt(0)
    assert(r == 3)
  }

  test("rolling_hash64: codegen path matches the reference loop, " +
      "injected session-wide") {
    def refHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
    val inputs = Seq("", "a", "hello world", "héllo", "x" * 1000)
    val got = inputs.toDF("s")
      .selectExpr("rolling_hash64(s) as h") // via GraftExtensions
      .as[Long].collect().toSeq
    assert(got == inputs.map(refHash))
  }

  test("null-safe: null input yields null") {
    CommonPrefixLength.register(spark)
    val r = Seq(("a", Option.empty[String])).toDF("a", "b")
      .selectExpr("common_prefix_length(a, b) as l").head()
    assert(r.isNullAt(0))
  }
}
