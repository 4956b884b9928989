package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, over
  * `documents`:
  *
  *   - exact dedup (hash-groupBy over a fixed-width digest — never shuffle
  *     raw document bodies at scale);
  *   - exact n-gram Jaccard (oracle-checkable; bounded candidate set);
  *   - MinHash + LSH banding (the 100 TB path: signatures are fixed-size,
  *     candidates come from band-bucket equijoins, never all-pairs);
  *   - SimHash with chunk-banding (hamming ≤ 3 ⇒ one of 4 16-bit chunks
  *     equal, so candidate generation is again an equijoin).
  *
  * All hash functions are Spark-native (`xxhash64`) and therefore
  * deterministic across runs and executors; the LSH/SimHash queries have
  * no SQL oracle (DuckDB has no xxhash64) and get rows-only checks.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Drop exact-duplicate rows by key columns (first winner arbitrary —
    * use [[exactKeepMin]] when a deterministic survivor is needed). */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic exact dedup: keep the row with the smallest `idCol`
    * per duplicate group. Aggregates on a digest of the key, so at scale
    * the shuffle carries 16-byte hashes, not document bodies. */
  def exactKeepMin(df: DataFrame, key: Column, idCol: Column): DataFrame = {
    val keyed = df.withColumn("__k", md5(key))
    val keep = keyed.groupBy(col("__k")).agg(min(idCol).as("__keep"))
    keyed.join(keep, keyed("__k") === keep("__k") && idCol === col("__keep"))
      .drop("__k", "__keep")
  }

  private def tokensCol: Column = split(col("text"), "\\s+")

  /** Word-bigram shingles, distinct, as one exploded (doc_id, gram) pair
    * per shingle. Documents with < 2 tokens contribute the whole text. */
  private def shingles(d: DataFrame): DataFrame =
    d.select(col("doc_id"), tokensCol.as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= 2,
          array_distinct(expr(
            "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")))
          .otherwise(array(concat_ws(" ", col("toks")))).as("grams"))
      .select(col("doc_id"), explode(col("grams")).as("g"))

  /** MinHash signatures (numHashes independent hash slots via seeded
    * xxhash64), then LSH banding: docs sharing any band bucket are
    * candidates; estimated Jaccard = fraction of equal signature slots. */
  def minhashPairs(d: DataFrame, numHashes: Int = 64, bands: Int = 16,
      minEst: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val aggs = (0 until numHashes).map(i => min(xxhash64(col("g"), lit(i))).as(s"m$i"))
    val sigs = shingles(d)
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val bandArr = array((0 until bands).map(b =>
      xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandArr).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard", expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) " +
          s"/ cast($numHashes as double)"))
      .where(col("est_jaccard") >= minEst)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash fingerprint per document (term-frequency-weighted
    * token hashes; bit i set iff the weighted sum of token-hash bit i is
    * positive). Returns (doc_id, fp: long). */
  def simhash64(d: DataFrame): DataFrame = {
    val weighted = d
      .select(col("doc_id"), explode(tokensCol).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"), col("w"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, col("w"))
        .otherwise(-col("w"))).as(s"b$i")
    }
    weighted.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp")) // disjoint bits: + is bitwise OR
  }

  /** SimHash near-dup candidate pairs via 4×16-bit chunk banding (exact
    * recall for hamming ≤ 3 by pigeonhole), verified with
    * `bit_count(xor)`. */
  def simhashPairs(d: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunks = simhash64(d).select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("fp"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("ci", "cv")))
    val a = chunks.select(col("ci"), col("cv"),
      col("doc_id").as("doc_a"), col("fp").as("fa"))
    val b = chunks.select(col("ci"), col("cv"),
      col("doc_id").as("doc_b"), col("fp").as("fb"))
    a.join(b, Seq("ci", "cv"))
      .where(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  val queries: Seq[Q] = Seq(

    Q("dedup_exact", Some(
      """SELECT COUNT(*) AS n_docs,
        |       COUNT(DISTINCT md5(text)) AS n_unique,
        |       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
        |FROM documents""".stripMargin)) { (s, dir) =>
      docs(s, dir).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))
    },

    // Exact token-set Jaccard over a bounded candidate set (doc_id < 300
    // both sides) — the oracle-checkable ground truth the approximate
    // methods are judged against in tests.
    Q("dedup_ngram_jaccard", Some(
      """SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        |      AS jaccard
        |  FROM (SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS toks
        |        FROM documents WHERE doc_id < 300) a
        |  JOIN (SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS toks
        |        FROM documents WHERE doc_id < 300) b
        |    ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.9 ORDER BY doc_a, doc_b""".stripMargin)) { (s, dir) =>
      val tk = docs(s, dir).where(col("doc_id") < 300)
        .select(col("doc_id"), array_distinct(tokensCol).as("toks"))
      val a = tk.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
      val b = tk.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
      a.join(b, col("doc_a") < col("doc_b"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("ta")) + size(col("tb")) - col("inter")))
        .where(col("jaccard") >= 0.9)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    },

    Q("dedup_minhash_lsh", None) { (s, dir) => minhashPairs(docs(s, dir)) },

    Q("dedup_simhash", None) { (s, dir) => simhashPairs(docs(s, dir)) })
}
