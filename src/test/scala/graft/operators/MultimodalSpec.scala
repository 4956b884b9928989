package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the stub featurizer's contract (shape, determinism,
  * edge cases) and the distributed decode path's schema.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stubDecodeFeatures: fixed width, deterministic, full byte coverage") {
    val bytes = Array.tabulate(100)(i => i.toByte)
    val f1 = Multimodal.stubDecodeFeatures(bytes, 8)
    val f2 = Multimodal.stubDecodeFeatures(bytes, 8)
    assert(f1.length == 8)
    assert(f1.toSeq == f2.toSeq)
    // stripe means of 0..99 are increasing
    assert(f1.toSeq == f1.sorted.toSeq)
  }

  test("stubDecodeFeatures: empty payload -> zero vector, not a crash") {
    assert(Multimodal.stubDecodeFeatures(Array.emptyByteArray, 4).toSeq ==
      Seq(0f, 0f, 0f, 0f))
  }

  test("stubDecodeFeatures: payload shorter than dim still yields dim") {
    assert(Multimodal.stubDecodeFeatures(Array[Byte](1, 2), 8).length == 8)
  }

  test("sampleFrames: one row per sampled pseudo-frame, typed schema") {
    val media = Seq((1L, Array.tabulate(100)(_.toByte)))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(media, "payload",
      frameSize = 10, stride = 3).collect()
    // 10 frames, strides 0,3,6,9 -> 4 sampled
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 10))
  }

  test("sampleFrames: trailing partial frame is emitted (ceil division)") {
    val media = Seq((1L, Array.tabulate(25)(_.toByte)))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(media, "payload",
      frameSize = 10, stride = 1).collect().sortBy(_.getInt(1))
    // ceil(25/10) = 3 frames: 10 + 10 + 5 trailing bytes
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(frames.map(_.getAs[Array[Byte]](2).length).toSeq == Seq(10, 10, 5))
  }

  test("resizeFeatures: average-pool down and zero-pad up") {
    val df = Seq((1L, Seq(2f, 4f, 6f, 8f))).toDF("doc_id", "features")
    val down = Multimodal.resizeFeatures(df, "features", from = 4, to = 2)
      .head().getSeq[Float](1)
    assert(down == Seq(3f, 7f)) // avg(2,4), avg(6,8)
    val up = Multimodal.resizeFeatures(df, "features", from = 4, to = 6)
      .head().getSeq[Float](1)
    assert(up == Seq(2f, 4f, 6f, 8f, 0f, 0f))
  }

  test("decodeImageToFeatures: hand-computed stripe means from a real " +
      "PNG roundtrip (gray samples, no gamma distortion)") {
    // 8×8 gray PNG, pixel i = i: stripe j holds pixels 8j..8j+7, so its
    // mean is 8j + 3.5 — computed by hand, pinned exactly.
    val png = Multimodal.encodeGrayPng(Array.tabulate(64)(identity), 8, 8)
    assert(png.take(8).toSeq ==
      Seq[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "payload must be a real PNG container")
    val f = Multimodal.decodeImageToFeatures(png, 8)
    assert(f.toSeq == (0 until 8).map(j => 8 * j + 3.5f),
      s"stripe means: ${f.toSeq}")
  }

  test("decodeImageToFeatures: multi-band images pool (r+g+b)/3 luminance") {
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x604020) // (0x60+0x40+0x20)/3 = 64
    img.setRGB(1, 0, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.decodeImageToFeatures(bos.toByteArray, 2)
    assert(f.toSeq == Seq(64f, 0f), s"got ${f.toSeq}")
  }

  test("decodeImageToFeatures resolves palette-indexed images through " +
      "the palette, not raw indices") {
    // 2-entry palette: index 0 -> white, index 1 -> black. A 1-band
    // raster read would yield [0, 1]; correct luminance is [255, 0].
    val icm = new java.awt.image.IndexColorModel(1, 2,
      Array(0xFFFFFF, 0x000000), 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    img.getRaster.setSample(0, 0, 0, 0)
    img.getRaster.setSample(1, 0, 0, 1)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.decodeImageToFeatures(bos.toByteArray, 2)
    assert(f.toSeq == Seq(255f, 0f), s"got ${f.toSeq}")
  }

  test("encodeGrayPng rejects out-of-range pixel values loudly") {
    assertThrows[IllegalArgumentException] {
      Multimodal.encodeGrayPng(Array(256), 1, 1)
    }
  }

  test("decodeImageToFeatures rejects non-image payloads loudly") {
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeImageToFeatures("not a png".getBytes, 4)
    }
  }

  // ---- video: flat-JPEG exactness, AVI mux/demux, temporal pooling ----

  test("encodeFlatJpeg round-trips bit-exactly for ALL 256 gray values " +
      "(the invariant mm_video_features' oracle rests on)") {
    for (v <- 0 to 255) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeFlatJpeg(v, 8, 8)))
      for (y <- 0 until 8; x <- 0 until 8)
        assert(img.getRaster.getSample(x, y, 0) == v,
          s"value $v drifted at ($x,$y)")
    }
  }

  test("encodeMjpegAvi -> decodeAviFrames returns the exact frame bytes " +
      "in order (odd sizes exercise RIFF even-padding)") {
    val frames = Seq(
      Array.tabulate(101)(_.toByte), // odd -> pad byte after chunk
      Array.tabulate(64)(i => (i * 3).toByte),
      Array[Byte](7))
    val avi = Multimodal.encodeMjpegAvi(frames, 8, 8)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val back = Multimodal.decodeAviFrames(avi)
    assert(back.size == 3)
    for ((f, b) <- frames.zip(back)) assert(f.toSeq == b.toSeq)
  }

  test("decodeAviFrames walks 'rec ' groups inside movi") {
    // hand-build: RIFF(AVI  LIST(movi LIST(rec  00dc) 00dc))
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      id.foreach(c => b.write(c.toInt))
      val n = data.length
      b.write(n & 0xff); b.write((n >> 8) & 0xff)
      b.write((n >> 16) & 0xff); b.write((n >> 24) & 0xff)
      b.write(data); if ((n & 1) == 1) b.write(0)
      b.toByteArray
    }
    def list(typ: String, body: Array[Byte]*): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body.flatten)
    val f1 = Array[Byte](1, 2, 3)
    val f2 = Array[Byte](4, 5)
    val movi = list("movi", list("rec ", chunk("00dc", f1)), chunk("00dc", f2))
    val riff = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
    val back = Multimodal.decodeAviFrames(riff)
    assert(back.map(_.toSeq) == Seq(f1.toSeq, f2.toSeq))
  }

  test("decodeAviFrames rejects non-AVI payloads and header overruns loudly") {
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeAviFrames("not an avi container".getBytes)
    }
    // valid signature but a chunk whose size runs past the buffer
    val avi = Multimodal.encodeMjpegAvi(Seq(Array[Byte](1, 2, 3, 4)), 8, 8)
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeAviFrames(avi.take(avi.length - 2))
    }
  }

  test("decodeAviFrames caps hostile LIST nesting instead of blowing " +
      "the stack") {
    // 10k nested LISTs, 12 bytes each: RIFF(AVI  LIST(movi LIST(rec
    // LIST(rec ...)))) — must reject via the depth require, not
    // StackOverflowError
    val depth = 10000
    val innermost = Array.emptyByteArray
    def enc32(n: Int): Array[Byte] =
      Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    val nested = (1 to depth).foldLeft(innermost) { (body, i) =>
      val typ = if (i == depth) "movi" else "rec "
      "LIST".getBytes("US-ASCII") ++ enc32(body.length + 4) ++
        typ.getBytes("US-ASCII") ++ body
    }
    val riff = "RIFF".getBytes("US-ASCII") ++ enc32(nested.length + 4) ++
      "AVI ".getBytes("US-ASCII") ++ nested
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeAviFrames(riff)
    }
  }

  test("decodeAviFrames under seeded random corruption: throws or " +
      "returns, never hangs or crashes the JVM") {
    val frames = (0 until 6).map(k => Multimodal.encodeFlatJpeg(k, 8, 8))
    val good = Multimodal.encodeMjpegAvi(frames, 8, 8)
    val rnd = new scala.util.Random(99)
    var threw = 0
    for (_ <- 1 to 200) {
      val mutated = good.clone()
      for (_ <- 0 until 1 + rnd.nextInt(8))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { Multimodal.decodeAviFrames(mutated); () }
      catch { case _: IllegalArgumentException => threw += 1 }
    }
    // some mutations hit padding and survive; corrupted sizes must
    // surface as the demuxer's own bounds error, nothing else
    assert(threw > 0, "no mutation tripped the bounds checks (suspicious)")
  }

  test("decodeVideoToFeatures: per-frame means pooled across time match " +
      "hand math (frame k is a flat block of value 2k)") {
    val frames = (0 until 16).map(k => Multimodal.encodeFlatJpeg(2 * k, 8, 8))
    val avi = Multimodal.encodeMjpegAvi(frames, 8, 8)
    val f = Multimodal.decodeVideoToFeatures(avi, 4)
    // stripe j = frames 4j..4j+3, mean of (8j, 8j+2, 8j+4, 8j+6) = 8j+3
    assert(f.toSeq == (0 until 4).map(j => 8 * j + 3f), s"got ${f.toSeq}")
  }

  test("sampleAviFrames: one typed row per kept demuxed frame") {
    val frames = (0 until 10).map(k => Multimodal.encodeFlatJpeg(k, 8, 8))
    val media = Seq((7L, Multimodal.encodeMjpegAvi(frames, 8, 8)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.sampleAviFrames(media, "payload", stride = 3)
      .collect().sortBy(_.getInt(1))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    // each kept frame is itself a decodable JPEG of the right flat value
    for (r <- rows) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img.getRaster.getSample(0, 0, 0) == r.getInt(1))
    }
  }

  test("decodeToFeatures: distributed schema is (doc_id, features[dim])") {
    val media = Seq((1L, "hello".getBytes), (2L, "world!".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeToFeatures(media, "payload", 4)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "features"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getSeq[Float](1).length == 4))
    // matches the local stub exactly (no serialization drift)
    assert(rows(0).getSeq[Float](1) ==
      Multimodal.stubDecodeFeatures("hello".getBytes, 4).toSeq)
  }

  // ---- image near-dup dedup (dHash + banded Hamming join) ----

  private def png(px: Array[Int]): Array[Byte] =
    Multimodal.encodeGrayPng(px, 9, 8)

  private def basePx(seed: Int): Array[Int] =
    Array.tabulate(72)(i => (i * 37 + 11 * seed + seed * seed) % 256)

  test("dHash64: hand-computed bits — a descending row sets exactly its " +
      "8 gradient bits") {
    // row 0 strictly descending -> all 8 of its left>right bits set;
    // every other row constant -> no bits
    val px = Array.fill(72)(100)
    for (x <- 0 until 9) px(x) = 9 - x
    val (lo, hi) = Multimodal.dHash64(png(px))
    assert(lo == 0xffL && hi == 0L)
  }

  test("dHash64: single-pixel edit flips at most 2 bits, at EVERY " +
      "position (the locality theorem behind the Hamming radius)") {
    val base = basePx(1)
    val (blo, bhi) = Multimodal.dHash64(png(base))
    for (p <- 0 until 72; delta <- Seq(-60, 90)) {
      val mod = base.clone()
      mod(p) = ((mod(p) + delta) % 256 + 256) % 256
      val (mlo, mhi) = Multimodal.dHash64(png(mod))
      val flips = java.lang.Long.bitCount(blo ^ mlo) +
        java.lang.Long.bitCount(bhi ^ mhi)
      // a pixel participates in <= 2 horizontal comparisons
      assert(flips <= 2, s"pixel $p delta $delta flipped $flips bits")
    }
  }

  test("hammingDedupSurvivors recovers planted perturbed-pixel near-dups " +
      "and keeps unrelated images") {
    val base = basePx(1)
    val near1 = base.clone(); near1(31) = 0   // 1 edited pixel, <= 2 flips
    val near2 = base.clone(); near2(50) = 255 // another, <= 2 flips
    val imgs = Seq(10L -> base, 20L -> near1, 30L -> near2,
      40L -> basePx(5), 50L -> basePx(9))
    // sanity: the plants really are within radius, the strangers outside
    val sigs = imgs.map { case (id, px) =>
      val (lo, hi) = Multimodal.dHash64(png(px)); (id, lo, hi)
    }
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
    assert(ham(sigs(0), sigs(1)) > 0 && ham(sigs(0), sigs(1)) <= 3)
    assert(ham(sigs(0), sigs(2)) > 0 && ham(sigs(0), sigs(2)) <= 3)
    assert(ham(sigs(0), sigs(3)) > 3 && ham(sigs(0), sigs(4)) > 3)
    val out = Multimodal
      .hammingDedupSurvivors(sigs.toDF("doc_id", "lo", "hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.get(20L).contains(10L), s"near1 not recovered: $out")
    assert(out.get(30L).contains(10L), s"near2 not recovered: $out")
    assert(!out.contains(40L) && !out.contains(50L),
      s"unrelated image dropped: $out")
    assert(!out.contains(10L), "the keeper itself must survive")
  }

  test("hammingDedupSurvivors == brute-force all-pairs keep-min (banding " +
      "pigeonhole recall, end-to-end)") {
    // 20 distinct patterns; every third gets a 1-pixel-perturbed twin
    val imgs = (0 until 20).flatMap { k =>
      val b = basePx(k)
      val dup = if (k % 3 == 0) {
        val m = b.clone(); m(7 * k % 72) = (m(7 * k % 72) + 131) % 256
        Seq((100L + k) -> m)
      } else Nil
      Seq(k.toLong -> b) ++ dup
    }
    val sigs = imgs.map { case (id, px) =>
      val (lo, hi) = Multimodal.dHash64(png(px)); (id, lo, hi)
    }
    val brute = (for {
      a <- sigs; b <- sigs if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= 3
    } yield (b._1, (a._1, h)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).minBy(_._1)) }
    val got = Multimodal
      .hammingDedupSurvivors(sigs.toDF("doc_id", "lo", "hi"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .toMap
    assert(got == brute, s"banded=$got brute=$brute")
    assert(brute.nonEmpty, "fixture must plant at least one near-dup")
    // r16: the PRE-CHUNKED path (what the durable image-dedup stream
    // runs against its persisted chunk table) is report-identical —
    // chunking once at signing time changes nothing but the read cost
    val sigDf = sigs.toDF("doc_id", "lo", "hi")
    val viaChunks = Multimodal.hammingDedupSurvivorsFromChunks(
      Multimodal.hammingChunkRows(sigDf),
      Multimodal.hammingChunkRows(sigDf))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .toMap
    assert(viaChunks == brute,
      s"pre-chunked and inline-chunking paths diverged: $viaChunks")
  }

  test("dHash64Pooled == dHash64 on exact 9x8 inputs (the pooled form " +
      "strictly generalizes the strict form)") {
    for (seed <- 1 to 8) {
      val p = png(basePx(seed))
      assert(Multimodal.dHash64Pooled(p) == Multimodal.dHash64(p),
        s"seed $seed: pooled and strict dHash diverged on 9x8")
    }
  }

  test("dHash64Pooled: a 2x nearest-neighbor upscale pools back to " +
      "Hamming 0 from its original") {
    for (seed <- 1 to 8) {
      val base = basePx(seed)
      val up = new Array[Int](18 * 16)
      for (y <- 0 until 16; x <- 0 until 18)
        up(y * 18 + x) = base((y / 2) * 9 + (x / 2))
      assert(Multimodal.dHash64Pooled(Multimodal.encodeGrayPng(up, 18, 16))
        == Multimodal.dHash64Pooled(png(base)), s"seed $seed")
    }
  }

  test("dHash64Pooled: a noisy 2x upscaled duplicate lands within " +
      "Hamming <= 3 of its original (the production dedup radius)") {
    val rnd = new scala.util.Random(42)
    for (seed <- 1 to 8) {
      val base = basePx(seed)
      val (blo, bhi) = Multimodal.dHash64Pooled(png(base))
      val up = new Array[Int](18 * 16)
      for (y <- 0 until 16; x <- 0 until 18)
        up(y * 18 + x) = math.min(255, math.max(0,
          base((y / 2) * 9 + (x / 2)) + rnd.nextInt(3) - 1))
      val (ulo, uhi) =
        Multimodal.dHash64Pooled(Multimodal.encodeGrayPng(up, 18, 16))
      val d = java.lang.Long.bitCount(blo ^ ulo) +
        java.lang.Long.bitCount(bhi ^ uhi)
      assert(d <= 3, s"seed $seed: noisy 2x upscale drifted to Hamming $d")
    }
  }

  test("dHash64Pooled: non-multiple sizes pool through non-uniform " +
      "cells with exact integer area means (hand-computed column case)") {
    // 11 wide, 9 tall, value = column index c scaled so means strictly
    // ascend left->right in every pooled cell row: no gradient bit set
    val w = 11; val h = 9
    val px = Array.tabulate(w * h)(i => (i % w) * 20)
    val (lo, hi) = Multimodal.dHash64Pooled(Multimodal.encodeGrayPng(px, w, h))
    assert(lo == 0L && hi == 0L, "ascending columns must set no bits")
    // mirrored: strictly descending columns set ALL 64 bits
    val pxd = Array.tabulate(w * h)(i => (w - 1 - (i % w)) * 20)
    val (dlo, dhi) =
      Multimodal.dHash64Pooled(Multimodal.encodeGrayPng(pxd, w, h))
    assert(dlo == 0xffffffffL && dhi == 0xffffffffL,
      s"descending columns must set all bits, got $dlo/$dhi")
  }

  test("dHash64Pooled rejects sub-9x8 images loudly") {
    val tiny = Multimodal.encodeGrayPng(Array.fill(25)(7), 5, 5)
    val e = intercept[IllegalArgumentException](
      Multimodal.dHash64Pooled(tiny))
    assert(e.getMessage.contains("9x8"))
  }

  test("cross-modal joint dedup: image-dup/caption-different and " +
      "caption-dup/image-different pairs both SURVIVE; only the " +
      "both-planes pair drops") {
    import spark.implicits._
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val common = words("comm", 12)             // > 72 chars of prefix
    val d = Seq(
      (1L, words("a", 40)),                    // dup in BOTH planes
      (2L, words("a", 40)),
      (3L, s"$common ${words("x", 40)}"),      // image dup (same first
      (4L, s"$common ${words("y", 40)}"),      //  72 chars), caption no
      // caption near-dup (only trigram 0 differs, J = 57/59), image
      // no: word0's GRADIENT PATTERN flips (dHash is brightness-
      // invariant, so a constant-run change would be invisible)
      (5L, s"qaqaqaqaqa ${words("m", 59)}"),
      (6L, s"azazazazaz ${words("m", 59)}")
    ).toDF("doc_id", "text")
    def sig(t: String): (Long, Long) = {
      val px = new Array[Int](72)
      t.take(72).zipWithIndex.foreach { case (c, i) => px(i) = c.toInt }
      Multimodal.dHash64(Multimodal.encodeGrayPng(px, 9, 8))
    }
    val byId = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // fixture premises really hold
    assert(sig(byId(3L)) == sig(byId(4L)), "3/4 must be image dups")
    val (l5, h5) = sig(byId(5L)); val (l6, h6) = sig(byId(6L))
    assert(java.lang.Long.bitCount(l5 ^ l6) +
      java.lang.Long.bitCount(h5 ^ h6) > 3, "5/6 must differ as images")
    val jp = Dedup.prefixJaccardPairs(d, shingleWidth = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jp.contains((5L, 6L)), "5/6 must be caption near-dups")
    assert(!jp.contains((3L, 4L)), "3/4 must NOT be caption near-dups")
    // the conjunction
    val sigs = d.collect().map { r =>
      val (lo, hi) = sig(r.getString(1)); (r.getLong(0), lo, hi)
    }.toSeq.toDF("doc_id", "lo", "hi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_b").orderBy("doc_a")
    val joint = Multimodal.hammingDedupPairs(sigs, 3)
      .join(Dedup.prefixJaccardPairs(d, shingleWidth = 3),
        Seq("doc_a", "doc_b"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_b"), col("doc_a"), col("hamming"), col("jaccard"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(joint.toSeq == Seq((2L, 1L, 0, 1.0d)),
      s"only the both-planes duplicate may drop: ${joint.toSeq}")
  }

  test("dHash64 rejects non-dHash geometry loudly (resize first)") {
    val bad = Multimodal.encodeGrayPng(Array.fill(64)(7), 8, 8)
    val e = intercept[IllegalArgumentException](Multimodal.dHash64(bad))
    assert(e.getMessage.contains("9x8"))
  }

  // ---- audio / video near-dup fingerprints (shared survivor op) ----

  private def wavOf(samples: Array[Int]): Array[Byte] =
    Multimodal.encodePcmWav(samples)

  private def baseSamples(seed: Int): Array[Int] =
    Array.tabulate(65)(i => (((i * 53 + seed * 17) % 97) - 48) * 256)

  test("audioFingerprint64: single-sample edit flips at most 2 bits at " +
      "EVERY position (gradient-sign locality, audio plane)") {
    val base = baseSamples(1)
    val (blo, bhi) = Multimodal.audioFingerprint64(wavOf(base))
    for (p <- 0 until 65) {
      val mod = base.clone(); mod(p) = -mod(p) - 256
      val (mlo, mhi) = Multimodal.audioFingerprint64(wavOf(mod))
      val flips = java.lang.Long.bitCount(blo ^ mlo) +
        java.lang.Long.bitCount(bhi ^ mhi)
      assert(flips <= 2, s"sample $p flipped $flips bits")
    }
  }

  test("audio near-dups recover through the banded survivor op; video " +
      "frame-gradient fingerprints behave identically on frame edits") {
    // audio: doc 20 = doc 10 with one sample inverted -> Hamming <= 2
    val a0 = baseSamples(1)
    val a1 = a0.clone(); a1(30) = -a1(30) - 256
    val audioSigs = Seq(
      10L -> Multimodal.audioFingerprint64(wavOf(a0)),
      20L -> Multimodal.audioFingerprint64(wavOf(a1)),
      30L -> Multimodal.audioFingerprint64(wavOf(baseSamples(7))))
      .map { case (id, (lo, hi)) => (id, lo, hi) }
    val audioOut = Multimodal
      .hammingDedupSurvivors(audioSigs.toDF("doc_id", "lo", "hi"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audioOut == Map(20L -> 10L), s"audio survivors: $audioOut")

    // video: 65 flat frames; one frame's value perturbed -> <= 2 flips
    def avi(vals: Array[Int]): Array[Byte] =
      Multimodal.encodeMjpegAvi(
        vals.map(v => Multimodal.encodeFlatJpeg(v, 8, 8)).toSeq, 8, 8)
    val v0 = Array.tabulate(65)(i => (i * 37 + 11) % 256)
    val v1 = v0.clone(); v1(40) = 255 - v1(40)
    val (l0, h0) = Multimodal.videoFingerprint64(avi(v0))
    val (l1, h1) = Multimodal.videoFingerprint64(avi(v1))
    val flips = java.lang.Long.bitCount(l0 ^ l1) +
      java.lang.Long.bitCount(h0 ^ h1)
    assert(flips > 0 && flips <= 2, s"frame edit flipped $flips bits")
    val videoSigs = Seq((10L, l0, h0), (20L, l1, h1))
    val videoOut = Multimodal
      .hammingDedupSurvivors(videoSigs.toDF("doc_id", "lo", "hi"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(videoOut == Map(20L -> 10L), s"video survivors: $videoOut")
  }

  test("audioFingerprint64Pooled == audioFingerprint64 on exactly-65-" +
      "sample input, a 2x sample-repeat pools to Hamming 0, and " +
      "sub-65 input is rejected loudly") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val samples = Array.fill(65)(rnd.nextInt(24000) - 12000)
      val strict = Multimodal.audioFingerprint64(
        Multimodal.encodePcmWav(samples))
      assert(Multimodal.audioFingerprint64Pooled(
        Multimodal.encodePcmWav(samples)) == strict,
        "pooled and strict fingerprints diverged on 65 samples")
      // nearest-neighbor 2x: every pooled frame sums two copies of
      // one sample -> identical mean comparisons
      val doubled = samples.flatMap(v => Array(v, v))
      assert(Multimodal.audioFingerprint64Pooled(
        Multimodal.encodePcmWav(doubled)) == strict,
        "2x-repeated stream must pool back to its original")
    }
    val tiny = Multimodal.encodePcmWav(Array.fill(40)(5))
    val e = intercept[IllegalArgumentException](
      Multimodal.audioFingerprint64Pooled(tiny))
    assert(e.getMessage.contains("65"))
  }

  test("videoFingerprint64Pooled == videoFingerprint64 on exactly-65-" +
      "frame input, a 2x frame-rate doubling pools to Hamming 0, and " +
      "sub-65 input is rejected loudly") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 4) {
      val values = Array.fill(65)(rnd.nextInt(256))
      def avi(vs: Array[Int]) = Multimodal.encodeMjpegAvi(
        vs.toSeq.map(v => Multimodal.encodeFlatJpeg(v, 8, 8)), 8, 8)
      val strict = Multimodal.videoFingerprint64(avi(values))
      assert(Multimodal.videoFingerprint64Pooled(avi(values)) == strict,
        "pooled and strict fingerprints diverged on 65 frames")
      // frame-rate doubling: every pooled stripe sums two copies of
      // one frame mean -> identical cross-multiplied comparisons
      assert(Multimodal.videoFingerprint64Pooled(
        avi(values.flatMap(v => Array(v, v)))) == strict,
        "frame-rate-doubled video must pool back to its original")
    }
    val short = Multimodal.encodeMjpegAvi(
      (1 to 40).map(v => Multimodal.encodeFlatJpeg(v, 8, 8)), 8, 8)
    val e = intercept[IllegalArgumentException](
      Multimodal.videoFingerprint64Pooled(short))
    assert(e.getMessage.contains("65"))
  }

  test("audio/video fingerprints reject wrong payload shapes loudly") {
    val e1 = intercept[IllegalArgumentException](
      Multimodal.audioFingerprint64(wavOf(Array.fill(10)(0))))
    assert(e1.getMessage.contains("65 samples"))
    val shortAvi = Multimodal.encodeMjpegAvi(
      Seq(Multimodal.encodeFlatJpeg(5, 8, 8)), 8, 8)
    val e2 = intercept[IllegalArgumentException](
      Multimodal.videoFingerprint64(shortAvi))
    assert(e2.getMessage.contains("65 frames"))
  }

  test("CHUNK-JOIN SKEW GUARD (r18): on an engineered solid-fill " +
      "cluster — thousands of near-uniform images sharing every " +
      "16-bit chunk value — the guarded pair join produces EXACTLY " +
      "the unguarded pairs while the hot chunk's post-salt groups " +
      "shrink to ~hot/salts, and cold chunk values bypass the salted " +
      "path untouched") {
    import spark.implicits._
    // 2000 index docs with the all-zero signature (a solid fill —
    // every chunk is (ci, 0)), plus scattered cold signatures
    val hotOld = (0L until 2000L).map(i => (i, 0L, 0L))
    val coldOld = (3000L until 3200L).map(i =>
      (i, 0x1111L * (i % 37) + 1L, 0x0101L * (i % 53) + 1L))
    val oldSigs = (hotOld ++ coldOld).toDF("doc_id", "lo", "hi")
    // probe batch: 40 more solid fills (ids above the index — the
    // stream contract) + 40 cold ones, some near the cold index sigs
    val hotNew = (5000L until 5040L).map(i => (i, 0L, 0L))
    val coldNew = (5100L until 5140L).map(i =>
      (i, 0x1111L * (i % 37) + 1L, 0x0101L * (i % 53) + 1L))
    val newSigs = (hotNew ++ coldNew).toDF("doc_id", "lo", "hi")
    val refChunks = Multimodal.hammingChunkRows(
      oldSigs.unionAll(newSigs))
    val probeChunks = Multimodal.hammingChunkRows(newSigs)
    def pairs(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, Long, Int)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val threshold = 100
    val salts = 8
    val want = pairs(Multimodal.hammingDedupPairsFromChunks(
      refChunks, probeChunks))
    val got = pairs(Multimodal.hammingDedupPairsFromChunksGuarded(
      refChunks, probeChunks, maxHamming = 3,
      hotThreshold = threshold, salts = salts))
    assert(got == want,
      s"the guard must never change pair output: ${got.size} vs " +
        s"${want.size}")
    // the fixture is actually quadratic on the hot chunk values:
    // every solid-fill probe pairs with every earlier solid fill
    assert(want.size >= 2000 * 40,
      s"fixture not quadratic: ${want.size}")
    // THE skew pin: the hot chunk's post-salt groups are bounded by
    // ~hot/salts (2× slack for hash non-uniformity) vs the single
    // 2040-row group the unguarded shuffle would build
    val groupSizes = refChunks
      .where(col("ci") === 0 && col("cv") === 0L)
      .withColumn("__salt",
        pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    assert(groupSizes.size == salts,
      s"every salt must receive work: $groupSizes")
    assert(groupSizes.values.max <= 2L * 2040L / salts,
      s"max post-salt group must shrink to ~1/salts: $groupSizes")
    // default threshold (4096) classifies this fixture as cold —
    // pure passthrough, still equal
    assert(pairs(Multimodal.hammingDedupPairsFromChunksGuarded(
      refChunks, probeChunks)) == want)
    // and the survivor report through the guard equals the plain one
    def report(df: org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Int)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(report(Multimodal.hammingDedupSurvivorsFromChunksGuarded(
        refChunks, probeChunks, maxHamming = 3,
        hotThreshold = threshold, salts = salts)) ==
      report(Multimodal.hammingDedupSurvivorsFromChunks(
        refChunks, probeChunks)))
  }

  test("CHUNK-JOIN SKEW GUARD exchange budget (r19): the single-" +
      "equijoin guard plans at most 4 exchanges on an engaged hot " +
      "set — the r18 anti/anti + semi/semi union planned the index " +
      "side three reads and four join exchanges; the rewrite must " +
      "never regress back") {
    import spark.implicits._
    val oldSigs = ((0L until 300L).map(i => (i, 0L, 0L)) ++
      (3000L until 3100L).map(i =>
        (i, 0x1111L * (i % 37) + 1L, 0x0101L * (i % 53) + 1L)))
      .toDF("doc_id", "lo", "hi")
    val newSigs = (5000L until 5040L).map(i => (i, 0L, 0L))
      .toDF("doc_id", "lo", "hi")
    val refChunks = Multimodal.hammingChunkRows(
      oldSigs.unionAll(newSigs))
    val probeChunks = Multimodal.hammingChunkRows(newSigs)
    // threshold 100 < the 340-row hot chunk groups: the guard engages
    val df = Multimodal.hammingDedupPairsFromChunksGuarded(
      refChunks, probeChunks, maxHamming = 3,
      hotThreshold = 100, salts = 8)
    df.collect()
    val m = graft.Metrics.shuffleSummary(df)
    info(s"guarded pair join: $m")
    // hot-set count agg + the one (keys, salt) equijoin's two sides +
    // the pair dedup agg; broadcasts (the hot set, and AQE flips of
    // the join at spec scale) only ever LOWER the count
    assert(m.exchanges <= 4,
      s"guardedKeyJoin grew a shuffle: ${m.exchanges} exchanges > 4")
  }
}
