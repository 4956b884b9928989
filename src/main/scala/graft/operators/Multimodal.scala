package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling beside them. The Spark-side machinery —
  * schema, batching, partition-parallel decode, feature columns — is real
  * and tested; the actual image/audio codec is STUBBED (no media libraries
  * in this environment) behind [[stubDecodeFeatures]], a deterministic
  * byte-stripe featurizer with the exact signature a real decoder would
  * have (`Array[Byte] => Array[Float]`).
  *
  * Since the synthetic corpus has no real media, the `documents.text`
  * bytes stand in as payloads.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** STUB decoder: a real implementation would decode the media container
    * and pool pixel/sample values; this deterministic stand-in averages
    * each of `dim` byte stripes. Keeps plumbing, schema and tests honest
    * without a codec. */
  def stubDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes.isEmpty) return out
    val stripe = math.max(1, bytes.length / dim)
    var i = 0
    while (i < dim) {
      val from = math.min(i * stripe, bytes.length)
      val to = if (i == dim - 1) bytes.length else math.min(from + stripe, bytes.length)
      var s = 0L
      var j = from
      while (j < to) { s += (bytes(j) & 0xff); j += 1 }
      out(i) = if (to > from) s.toFloat / (to - from) else 0f
      i += 1
    }
    out
  }

  /** Partition-parallel "decode": binary payload column → fixed-width
    * feature vector column. This is where `mapInPandas`/a JNI codec would
    * slot in on a real cluster; the distribution shape (one decode per
    * row, batched per partition, no driver involvement) is identical. */
  def decodeToFeatures(media: DataFrame, payloadCol: String, dim: Int)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val withBytes = media.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
    withBytes.map { case (id, bytes) =>
      (id, stubDecodeFeatures(bytes, dim))
    }.toDF("doc_id", "features")
  }

  /** STUB frame sampler: a real implementation would demux the container
    * and decode every Nth video frame; this stand-in slices the payload
    * into `frameSize`-byte pseudo-frames and keeps every `stride`-th one.
    * The distribution shape is the real thing: one row in, `ceil(n/stride)`
    * typed frame rows out, partition-parallel, no driver involvement. */
  def sampleFrames(media: DataFrame, payloadCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col(payloadCol).as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val fs = math.max(1, frameSize)
        // ceiling division: the final partial frame is emitted (flooring
        // silently dropped up to frameSize-1 trailing bytes while keeping
        // sub-frame payloads whole — inconsistent)
        val nFrames = math.max(1, (bytes.length + fs - 1) / fs)
        (0 until nFrames by stride).map { f =>
          val from = f * fs
          val to = math.min(from + fs, bytes.length)
          (id, f, java.util.Arrays.copyOfRange(bytes, from, to))
        }
      }.toDF("doc_id", "frame_no", "frame")
  }

  /** Feature-vector resize (e.g. matching an encoder's expected dim):
    * average-pool down or zero-pad up. Pure column expression — stays in
    * codegen, no UDF. */
  def resizeFeatures(df: DataFrame, featuresCol: String, from: Int,
      to: Int): DataFrame = {
    require(from > 0 && to > 0)
    val c = col(featuresCol)
    val resized =
      if (to == from) c
      else if (to < from) {
        // average-pool contiguous groups
        val stride = from.toDouble / to
        expr(s"transform(sequence(0, ${to - 1}), i -> " +
          s"aggregate(slice($featuresCol, cast(i * $stride as int) + 1, " +
          s"cast((i + 1) * $stride as int) - cast(i * $stride as int)), " +
          s"cast(0.0 as float), (a, x) -> a + x, a -> a / " +
          s"(cast((i + 1) * $stride as int) - cast(i * $stride as int))))")
      } else {
        // zero-pad
        concat(c, array_repeat(lit(0f), to - from))
      }
    df.withColumn(featuresCol, resized)
  }

  val queries: Seq[Q] = Seq(

    // Binary-column metadata: byte length + content digest. The payload is
    // an opaque blob to the engine — exactly how image/audio columns are
    // carried at scale.
    Q("mm_binary_meta", Some(
      """SELECT doc_id,
        |  CAST(STRLEN(text) AS INTEGER) AS n_bytes,
        |  md5(text) AS digest,
        |  SUBSTR(md5(text), 1, 8) AS head8
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text")).as("digest"),
        substring(md5(col("text")), 1, 8).as("head8"))
        .orderBy("doc_id")
    },

    // Stubbed decode → feature extraction; deterministic, rows-only check.
    Q("mm_stub_features", None) { (s, dir) =>
      val media = docs(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      decodeToFeatures(media, "payload", 8)
        .select(col("doc_id"), size(col("features")).as("feat_dim"),
          round(element_at(col("features"), 1) * 1000, 0).cast("long")
            .as("f0_x1000"))
        .orderBy("doc_id")
    })
}
