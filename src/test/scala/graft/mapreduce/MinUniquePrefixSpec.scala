package graft.mapreduce

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** Golden + property tests for the product query (reference
  * README.md:26, src/main.cpp:61-97) across all three implementations.
  *
  * The golden fixture reproduces the reference's `test.txt` spec
  * (README.md:50; 69 three-digit lines 111..801 step 10, 401 absent):
  * 1-char prefixes collide, 2-char prefixes are unique ⇒ L = 2.
  */
class MinUniquePrefixSpec extends SparkSpec {

  private def ds(lines: Seq[String]): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(lines)
  }

  /** The reference test.txt content, regenerated from its spec. */
  private val goldenLines: Seq[String] =
    (111 to 801 by 10).filter(_ != 401).map(_.toString)

  test("golden fixture has the documented shape") {
    assert(goldenLines.size == 69)
    assert(goldenLines.distinct.size == 69)
  }

  test("golden: iterative driver answers 2 (reference expected result)") {
    assert(MinUniquePrefix.find(ds(goldenLines), maxLen = 3) == 2)
  }

  test("golden: per-iteration results are (L=1 false, L=2 true)") {
    // find() returning 2 already implies L=1 failed; assert explicitly the
    // way the reference's out/iter<L>/result.txt records it.
    import org.apache.spark.sql.functions._
    val l1dups = ds(goldenLines).select(substring(col("value"), 1, 1).as("p"))
      .groupBy("p").count().filter(col("count") > 1)
    assert(!l1dups.isEmpty)
  }

  test("golden: one-shot variant agrees") {
    assert(MinUniquePrefix.findOneShot(ds(goldenLines), maxLen = 3) == 2)
  }

  test("golden: sorted-neighbor LCP variant agrees") {
    assert(MinUniquePrefix.minUniqueLen(ds(goldenLines), maxLen = 3) == 2)
  }

  test("golden: generic-MapReduce parity path agrees (M=3, R=2 defaults)") {
    assert(MinUniquePrefix.findViaMapReduce(spark, ds(goldenLines), 3) == 2)
  }

  test("golden: typed-Aggregator variant agrees (M4 UDAF surface)") {
    assert(MinUniquePrefix.findViaAggregator(ds(goldenLines), 3) == 2)
    assert(MinUniquePrefix.findViaAggregator(ds(Seq("abc", "abc")), 4) == -1)
  }

  test("duplicate full lines: no L works (reference quirk Q4 -> -1 here)") {
    val lines = Seq("abc", "abc", "xyz")
    assert(MinUniquePrefix.find(ds(lines), 5) == -1)
    assert(MinUniquePrefix.findOneShot(ds(lines), 5) == -1)
    assert(MinUniquePrefix.minUniqueLen(ds(lines), 5) == -1)
  }

  test("single line: L = 1") {
    assert(MinUniquePrefix.minUniqueLen(ds(Seq("hello")), 10) == 1)
    assert(MinUniquePrefix.find(ds(Seq("hello")), 10) == 1)
  }

  test("lines shorter than L: substring truncates like C++ substr (Q6)") {
    // "a" vs "ab": 1-prefixes collide ("a","a"); 2-prefixes are "a","ab".
    val lines = Seq("a", "ab")
    assert(MinUniquePrefix.find(ds(lines), 5) == 2)
    assert(MinUniquePrefix.minUniqueLen(ds(lines), 5) == 2)
  }

  /** Brute-force oracle: smallest L in [1, maxLen] with all-unique
    * L-prefixes, -1 if none. */
  private def bruteForce(lines: Seq[String], maxLen: Int): Int =
    (1 to maxLen).find { l =>
      val ps = lines.map(_.take(l))
      ps.distinct.size == ps.size
    }.getOrElse(-1)

  test("property: implementations agree with the brute-force oracle " +
      "(15 seeded random line sets)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 15) {
      val n = 1 + rnd.nextInt(40)
      val lines = List.fill(n)(rnd.nextInt(1000).toString)
      val expected = bruteForce(lines, 4)
      val d = ds(lines)
      assert(MinUniquePrefix.findOneShot(d, 4) == expected,
        s"one-shot disagrees on $lines")
      assert(MinUniquePrefix.minUniqueLen(d, 4) == expected,
        s"lcp variant disagrees on $lines")
    }
  }
}
