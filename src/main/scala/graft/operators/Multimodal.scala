package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling beside them. The Spark-side machinery —
  * schema, batching, partition-parallel decode, feature columns — is real
  * and tested. IMAGE decode is real: [[decodeImageToFeatures]] decodes
  * PNG/BMP/GIF/JPEG payloads through the JDK's `javax.imageio` (no
  * external dependency) and pools per-pixel luminance into a fixed-width
  * feature vector. AUDIO decode is real: [[decodeWavToFeatures]] parses
  * WAV containers through `javax.sound.sampled.AudioSystem` and pools
  * 16-bit PCM amplitudes the same way. Only VIDEO stays STUBBED (no
  * demuxer in the JDK) behind [[stubDecodeFeatures]], a deterministic
  * byte-stripe featurizer with the exact signature a real decoder would
  * have (`Array[Byte] => Array[Float]`).
  *
  * Since the synthetic corpus has no real media, image/audio payloads are
  * synthesized per row from `documents.text` (pixels / PCM samples =
  * functions of ASCII codes, PNG-/WAVE-encoded), then decoded back
  * through the REAL ImageIO / AudioSystem paths — the decodes operate on
  * actual pixels and samples of actual containers.
  */
object Multimodal {

  /** Upper bound on decoded image area (width × height). */
  val MaxPixels: Long = 64L * 1024 * 1024

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // creates a temp file, and with 32 decode threads per executor the
  // temp-dir churn + synchronized cache bookkeeping dominates the actual
  // decode (measured 3× slower than single-threaded). Payloads here are
  // in-memory byte arrays — heap-backed streams need no cache at all.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image decode: parse the payload with `javax.imageio` (PNG/BMP/
    * GIF/JPEG — whatever the JDK's registered readers handle), compute
    * integer-exact per-pixel luminance, and average row-major pixel
    * stripes into `dim` features (same stripe geometry as
    * [[stubDecodeFeatures]], over decoded pixels instead of raw bytes).
    *
    * Single-band (grayscale) images read raw raster samples — NOT
    * `getRGB`, whose linear-gray → sRGB conversion would gamma-distort
    * the values; multi-band images use `getRGB` with lum = (r+g+b)/3.
    * Accumulation is in doubles; a 64-pixel 8-stripe layout divides by a
    * power of two, so features are bit-exact against an integer oracle. */
  def decodeImageToFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    // w*h is Int math and feeds two O(n) allocations — a corrupt/hostile
    // header advertising huge dimensions would overflow or OOM before a
    // single pixel is read. 64 Mpx ≈ 512 MB of doubles, already generous.
    require(w > 0 && h > 0 && w.toLong * h <= MaxPixels,
      s"image dimensions ${w}x$h out of bounds (max $MaxPixels pixels)")
    val n = w * h
    val raster = img.getRaster
    // True grayscale only: a 1-band raster with an INDEXED color model
    // (GIF, palette PNG/BMP) stores palette indices, not luminance —
    // those must resolve through the palette via getRGB.
    val gray = raster.getNumBands == 1 &&
      !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    val lum = new Array[Double](n)
    if (gray) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          lum(y * w + x) = raster.getSample(x, y, 0).toDouble
          x += 1
        }
        y += 1
      }
    } else {
      // one bulk fetch — per-pixel getRGB redoes color-model dispatch
      // and bounds checks per call
      val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < n) {
        val rgb = rgbs(i)
        lum(i) =
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        i += 1
      }
    }
    val out = new Array[Float](dim)
    val stripe = math.max(1, n / dim)
    var i = 0
    while (i < dim) {
      val from = math.min(i * stripe, n)
      val to = if (i == dim - 1) n else math.min(from + stripe, n)
      var s = 0d
      var j = from
      while (j < to) { s += lum(j); j += 1 }
      out(i) = if (to > from) (s / (to - from)).toFloat else 0f
      i += 1
    }
    out
  }

  /** 8-bit grayscale PNG encoder (JDK-only): `pixels(i)` in 0..255,
    * row-major w×h. Used to synthesize real image payloads from tabular
    * data — PNG gray is lossless, so [[decodeImageToFeatures]] sees the
    * exact samples written here. */
  def encodeGrayPng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"expected ${w * h} pixels")
    // setSample would silently keep only the low 8 bits of an
    // out-of-range value — fail loudly instead, like the length check
    require(pixels.forall(p => p >= 0 && p <= 255),
      "gray pixel values must be in 0..255")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y * w + x)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Upper bound on decoded PCM frame count (~32 MB of 16-bit mono). */
  val MaxSamples: Long = 16L * 1024 * 1024

  /** 16-bit signed PCM mono WAV encoder (JDK-only): samples are written
    * little-endian through `javax.sound.sampled.AudioSystem`'s own WAVE
    * writer, so [[decodeWavToFeatures]] exercises a genuine
    * header-parse + PCM-read round trip. Lossless: PCM is the samples. */
  def encodePcmWav(samples: Array[Int], sampleRate: Float = 8000f)
      : Array[Byte] = {
    require(samples.forall(v => v >= Short.MinValue && v <= Short.MaxValue),
      "samples must fit signed 16-bit PCM")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, 1, /* signed = */ true, /* bigEndian = */ false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: parse the WAV container with
    * `javax.sound.sampled.AudioSystem` (header, format, frame count all
    * come from the payload), read the PCM frames, and average sample
    * amplitudes into `dim` stripes — same pooling geometry as the image
    * path. Only 16-bit mono PCM is accepted; anything else fails loudly
    * rather than producing silently-wrong features. */
  def decodeWavToFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"expected 16-bit mono signed PCM, got $fmt")
    // frame count comes from an untrusted header and feeds an O(n)
    // allocation — bound it before reading (same discipline as MaxPixels)
    require(ais.getFrameLength >= 0 && ais.getFrameLength <= MaxSamples,
      s"frame count ${ais.getFrameLength} out of bounds (max $MaxSamples)")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    val amp = new Array[Double](n)
    var i = 0
    while (i < n) {
      val b0 = raw(2 * i) & 0xff
      val b1 = raw(2 * i + 1) & 0xff
      amp(i) = (if (fmt.isBigEndian) (b0 << 8) | b1
                else (b1 << 8) | b0).toShort.toDouble
      i += 1
    }
    val out = new Array[Float](dim)
    val stripe = math.max(1, n / dim)
    var j = 0
    while (j < dim) {
      val from = math.min(j * stripe, n)
      val to = if (j == dim - 1) n else math.min(from + stripe, n)
      var s = 0d
      var k = from
      while (k < to) { s += amp(k); k += 1 }
      out(j) = if (to > from) (s / (to - from)).toFloat else 0f
      j += 1
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
      // single-file parquet arrives as ONE scan partition; without a
      // spread every per-row decode below runs on a single core
      val media = Tables.spread(docs(s, dir))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      decodeToFeatures(media, "payload", 8)
        .select(col("doc_id"), size(col("features")).as("feat_dim"),
          round(element_at(col("features"), 1) * 1000, 0).cast("long")
            .as("f0_x1000"))
        .orderBy("doc_id")
    },

    // REAL image decode end-to-end: per row, the first 64 printable chars
    // of the text become an 8×8 grayscale PNG (ASCII code = pixel value),
    // which ImageIO then actually parses back to pixels; features are
    // 8-pixel stripe means. Features × 8 are integer pixel sums (÷8 is
    // exact in binary float), so DuckDB recomputes them exactly from the
    // characters — the oracle pins the whole encode → real-decode →
    // pool path, partition-parallel with no driver involvement.
    Q("mm_image_features", Some {
      val stripes = (0 until 8).map { j =>
        val terms = (1 to 8).map { i =>
          val p = j * 8 + i
          s"CASE WHEN len(s) >= $p THEN ord(substr(s, $p, 1)) ELSE 0 END"
        }.mkString(" + ")
        s"CAST($terms AS BIGINT) AS sum$j"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $stripes
         |FROM (SELECT doc_id,
         |        substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 64) AS s
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val spark = s
      import spark.implicits._
      // spread first: the PNG encode + ImageIO decode per row is the
      // expensive stage, and the single-file scan would pin it to 1 core
      val feats = Tables.spread(docs(s, dir))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val ascii = text.replaceAll("[^ -~]", "")
          val px = new Array[Int](64)
          var i = 0
          while (i < 64 && i < ascii.length) {
            px(i) = ascii.charAt(i).toInt; i += 1
          }
          (id, decodeImageToFeatures(encodeGrayPng(px, 8, 8), 8))
        }.toDF("doc_id", "features")
      feats.select(col("doc_id") +: (0 until 8).map(j =>
          round(element_at(col("features"), j + 1) * 8, 0).cast("long")
            .as(s"sum$j")): _*)
        .orderBy("doc_id")
    },

    // REAL audio decode end-to-end: per row, the first 64 printable chars
    // become 64 signed 16-bit PCM samples ((ascii - 80) * 256), written
    // through AudioSystem's WAVE encoder and parsed back through its
    // WAVE reader — a genuine container round trip. Features × 8 are
    // integer sample sums (÷8 exact in binary float), so DuckDB
    // recomputes them exactly from the characters. Same oracle discipline
    // as mm_image_features; with this, only VIDEO remains stubbed.
    Q("mm_audio_features", Some {
      val stripes = (0 until 8).map { j =>
        val terms = (1 to 8).map { i =>
          val p = j * 8 + i
          s"CASE WHEN len(s) >= $p THEN (ord(substr(s, $p, 1)) - 80) * 256 " +
            s"ELSE 0 END"
        }.mkString(" + ")
        s"CAST($terms AS BIGINT) AS sum$j"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $stripes
         |FROM (SELECT doc_id,
         |        substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 64) AS s
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val feats = Tables.spread(docs(s, dir))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val ascii = text.replaceAll("[^ -~]", "")
          val samples = new Array[Int](64)
          var i = 0
          while (i < 64 && i < ascii.length) {
            samples(i) = (ascii.charAt(i).toInt - 80) * 256; i += 1
          }
          (id, decodeWavToFeatures(encodePcmWav(samples), 8))
        }.toDF("doc_id", "features")
      feats.select(col("doc_id") +: (0 until 8).map(j =>
          round(element_at(col("features"), j + 1) * 8, 0).cast("long")
            .as(s"sum$j")): _*)
        .orderBy("doc_id")
    })
}
