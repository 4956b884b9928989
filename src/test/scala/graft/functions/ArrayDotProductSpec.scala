package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native dot-product / squared-L2 expressions behind the similarity
  * hot paths: bitwise equality with the zip_with+aggregate higher-order
  * idiom they replaced (same index-order arithmetic — any drift would
  * flip oracle hashes), on both element types, plus the CODEGEN_ONLY
  * compile gate (the CodegenOnlySpec discipline: a janino error must
  * fail loudly, not drop to interpreted eval and silently refute the
  * expressions' whole reason to exist).
  */
class ArrayDotProductSpec extends SparkSpec {

  private lazy val strict = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    s
  }

  test("array_dot / array_l2sq equal the higher-order fold bitwise on " +
      "real double vectors (parquet scan, CODEGEN_ONLY)") {
    val e = Tables.load(strict, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val rows = e.select(col("vec_id"),
        expr("array_dot(v, v)").as("native"),
        expr("aggregate(v, 0D, (a, x) -> a + x * x)").as("hof"),
        expr("array_l2sq(slice(v, 1, 32), slice(v, 33, 32))").as("l2_native"),
        expr("aggregate(zip_with(slice(v, 1, 32), slice(v, 33, 32), " +
          "(a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)").as("l2_hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: dot bit drift")
      assert(!r.isNullAt(3) && !r.isNullAt(4))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)))
    }
  }

  test("ragged lengths are rejected loudly, not silently truncated " +
      "(session-wide SQL surface safety)") {
    Seq("array_dot(array(1.0D, 2.0D), array(1.0D))",
      "array_l2sq(array(1.0D), array(1.0D, 2.0D))",
      "array_eq_count(array(1L), array(1L, 2L))").foreach { e =>
      val err = intercept[Exception] {
        spark.sql(s"SELECT $e").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(err).exists(_.contains("lengths differ")),
        s"$e: wanted a loud length error, got $err")
    }
  }

  test("null ELEMENTS are rejected loudly, not read as 0/garbage") {
    val err = intercept[Exception] {
      spark.sql("SELECT array_dot(array(1.0D, CAST(NULL AS DOUBLE)), " +
        "array(1.0D, 2.0D))").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("null array element")),
      s"wanted a loud null-element error, got $err")
  }

  test("the null-element guard is compiled out for containsNull=false " +
      "arrays: non-nullable inputs still evaluate (and correctly)") {
    // array(...) of non-nullable literals types as containsNull=false
    val got = spark.sql(
      "SELECT array_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d").head()
    assert(got.getDouble(0) == 23.0)
  }

  test("long-typed arrays: exact wraparound-safe equality with the fold " +
      "and a driver-side replay") {
    val e = Tables.load(strict, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> " +
        "cast(floor(cast(x as double) * 1000 + 0.5) as bigint))").as("q"))
    val rows = e.select(col("vec_id"),
        expr("array_dot(q, q)").as("native"),
        expr("aggregate(q, 0L, (a, x) -> a + x * x)").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    // independent replay on a few vectors
    val replay = Tables.load(strict, sfDir, "embeddings")
      .where(col("vec_id") < 5).collect().map { r =>
        val q = r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
        r.getLong(r.fieldIndex("vec_id")) -> q.map(x => x * x).sum
      }.toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    replay.foreach { case (id, v) => assert(got(id) == v) }
  }

  test("null propagation: a null ARRAY input nulls the result (element " +
      "nulls are outside the contract and never occur at call sites)") {
    val got = spark.sql(
      "SELECT array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a, " +
        "array_l2sq(array(1.0D), CAST(NULL AS ARRAY<DOUBLE>)) AS b")
      .head()
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("type checking rejects mixed or non-numeric element types") {
    val err = intercept[Exception] {
      spark.sql("SELECT array_dot(array(1.0D), array(1L))").collect()
    }
    assert(err.getMessage.contains("array_dot") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
