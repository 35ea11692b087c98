package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeDecoder, ImageIoDecoder, MediaGen, MediaRow}
import org.scalatest.funsuite.AnyFunSuite

/** The image path of the multimodal operator decodes REAL bytes: dims come
  * out of `javax.imageio` parsing the payload, not from any fingerprint of
  * it. FakeDecoder remains only behind non-image media types.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ImageIoDecoder decodes generated PNG and BMP to their true dimensions") {
    for (fmt <- Seq("png", "bmp"); (w, h) <- Seq((1, 1), (17, 5), (64, 48))) {
      val bytes = MediaGen.imageBytes(fmt, w, h, seed = 42L)
      assert(bytes.length > 0, s"$fmt encoder produced no bytes")
      val dims = ImageIoDecoder.decode(s"image/$fmt", bytes)
      assert(dims.width == w && dims.height == h && dims.nFrames == 1,
        s"$fmt ${w}x$h decoded as ${dims.width}x${dims.height}")
      // non-stub proof: the fake (md5-derived) dims disagree with the real ones
      val fake = FakeDecoder.decode(s"image/$fmt", bytes)
      assert(fake.width != dims.width || fake.height != dims.height,
        s"fake decoder accidentally matches real dims for $fmt ${w}x$h")
    }
  }

  test("ImageIoDecoder counts the true frames of a multi-frame animated GIF") {
    for (n <- Seq(1, 3, 5)) {
      val bytes = MediaGen.gifBytes(width = 32, height = 12, nFrames = n, seed = 7L)
      assert(bytes.length > 0, "gif encoder produced no bytes")
      val dims = ImageIoDecoder.decode("video/gif", bytes)
      assert(dims.width == 32 && dims.height == 12 && dims.nFrames == n,
        s"$n-frame gif decoded as ${dims.width}x${dims.height}x${dims.nFrames}")
      // non-stub proof: the fake (byte-length-derived) frame count disagrees
      val fake = FakeDecoder.decode("video/gif", bytes)
      assert(fake.nFrames != dims.nFrames || fake.width != dims.width ||
        fake.height != dims.height,
        s"fake decoder accidentally matches real dims for $n-frame gif")
    }
  }

  test("m3 thumbnail really resizes: re-decoded dims are the aspect-fit box, content preserved") {
    // 64×48 downscales to 16×12; 5×3 (inside the box) is untouched
    for (((w, h), (tw, th)) <- Seq((64, 48) -> (16, 12), (5, 3) -> (5, 3),
        (64, 2) -> (16, 1), (1, 48) -> (1, 16))) {
      val bytes = MediaGen.imageBytes("png", w, h, seed = 9L)
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val m = math.max(src.getWidth, src.getHeight)
      val (gw, gh) =
        if (m <= Multimodal.ThumbMax) (src.getWidth, src.getHeight)
        else (math.max(1, src.getWidth * Multimodal.ThumbMax / m),
          math.max(1, src.getHeight * Multimodal.ThumbMax / m))
      assert((gw, gh) == (tw, th), s"${w}x$h → ${gw}x$gh, want ${tw}x$th")
      val thumb = new java.awt.image.BufferedImage(gw, gh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = thumb.createGraphics()
      try g.drawImage(src, 0, 0, gw, gh, null) finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(thumb, "png", bos))
      val re = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(re.getWidth == tw && re.getHeight == th)
      // the raster scale carried real pixels: an untouched-size thumb is
      // pixel-identical to its source
      if ((w, h) == (tw, th))
        for (y <- 0 until h; x <- 0 until w)
          assert((re.getRGB(x, y) & 0xffffff) == (src.getRGB(x, y) & 0xffffff),
            s"pixel ($x,$y) changed in pass-through resize")
    }
  }

  test("media with no JDK reader falls back to FakeDecoder (documented stub)") {
    val payload = "not an image".getBytes("UTF-8")
    assert(ImageIoDecoder.decode("video/mp4", payload) ==
      FakeDecoder.decode("video/mp4", payload))
  }

  test("MediaGen fails loudly when no imageio writer exists for the format") {
    val e = intercept[IllegalArgumentException] {
      MediaGen.imageBytes("not-a-format", 4, 4, seed = 1L)
    }
    assert(e.getMessage.contains("no imageio writer"))
  }

  test("extractFeatures runs ImageIoDecoder distributed; dims match doc-id arithmetic") {
    import spark.implicits._
    val media = spark.range(0, 60).as[Long].map { id =>
      (id % 3) match {
        case 0 => MediaRow(id, "image/bmp",
          MediaGen.imageBytes("bmp", (1 + id % 64).toInt, (1 + id % 48).toInt, id))
        case 1 => MediaRow(id, "image/png",
          MediaGen.imageBytes("png", (1 + id % 64).toInt, (1 + id % 48).toInt, id))
        case _ => MediaRow(id, "video/gif",
          MediaGen.gifBytes((1 + id % 64).toInt, (1 + id % 48).toInt,
            (1 + id % 5).toInt, id))
      }
    }.repartition(4)
    val feats = Multimodal.extractFeatures(media, ImageIoDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 60)
    feats.values.foreach { f =>
      assert(f.width == 1 + f.doc_id % 64, s"doc ${f.doc_id} width ${f.width}")
      assert(f.height == 1 + f.doc_id % 48, s"doc ${f.doc_id} height ${f.height}")
      val expectFrames = if (f.media_type == "video/gif") 1 + f.doc_id % 5 else 1
      assert(f.n_frames == expectFrames,
        s"doc ${f.doc_id} (${f.media_type}) frames ${f.n_frames} != $expectFrames")
    }
  }

  test("WAV roundtrip: generated PCM parses back with exact rate, count, and energy") {
    val rate = 12000
    val n = 1234
    val seed = 42L
    val raw = Multimodal.WavDecoder.decode(
      Multimodal.AudioGen.wavBytes(rate, n, seed))
    assert(raw.sampleRate == rate)
    assert(raw.nSamples == n.toLong)
    // energy recomputed directly from the sample formula
    val expected = (0 until n).map { i =>
      val s = Multimodal.AudioGen.sample(seed, i).toLong; s * s
    }.sum
    assert(raw.sumSq == expected, s"sumSq ${raw.sumSq} != $expected")
    // sign-sensitive: at least one negative sample must exist, so a
    // decoder reading unsigned bytes would break the energy sum
    assert((0 until n).exists(Multimodal.AudioGen.sample(seed, _) < 0))
  }

  test("WAV decoder fails loudly on garbage bytes") {
    intercept[Exception] {
      Multimodal.WavDecoder.decode(Array.fill[Byte](64)(7))
    }
  }

  test("AVI roundtrip: RIFF walk recovers dims, counted frames, and exact byte sum") {
    val (w, h, nf, seed) = (5, 3, 4, 99L) // odd frame length (45) → padding
    val raw = Multimodal.AviParser.parse(
      Multimodal.VideoGen.aviBytes(w, h, nf, seed))
    assert(raw.width == w && raw.height == h)
    assert(raw.nFrames == nf.toLong)
    val expected = (for (f <- 0 until nf; j <- 0 until w * h * 3)
      yield (Multimodal.VideoGen.frameByte(seed, f, j) & 0xff).toLong).sum
    assert(raw.byteSum == expected, s"byteSum ${raw.byteSum} != $expected")
  }

  test("AVI parser rejects a container whose header lies about the frame count") {
    val good = Multimodal.VideoGen.aviBytes(4, 4, 3, 7L)
    // dwTotalFrames lives at avih body offset 16; avih body starts at
    // RIFF(12) + LIST hdr(12) + 'avih'+size(8) = byte 32
    val lying = good.clone()
    lying(32 + 16) = 9 // declare 9 frames, movi still carries 3
    intercept[IllegalArgumentException] {
      Multimodal.AviParser.parse(lying)
    }
  }

  test("m6 phash is a pure function of pixels: PNG and BMP encodings of one raster collide") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // docs 1 (png) and 2 (bmp) encode the SAME raster (same dims+seed):
    // the hash must depend only on decoded pixels, never the container.
    // doc 3 is a different raster; doc 4 (gif) must be excluded.
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png",
        Multimodal.MediaGen.imageBytes("png", 9, 7, 5L)),
      Multimodal.MediaRow(2L, "image/bmp",
        Multimodal.MediaGen.imageBytes("bmp", 9, 7, 5L)),
      Multimodal.MediaRow(3L, "image/png",
        Multimodal.MediaGen.imageBytes("png", 16, 12, 123L)),
      Multimodal.MediaRow(4L, "video/gif",
        Multimodal.MediaGen.gifBytes(4, 4, 2, 9L))).toDS()
    val got = Multimodal.imagePhashOf(media)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(!got.contains(4L), "non-image rows must not be hashed")
    assert(got(1L)._1.length == 64 && got(1L)._1.forall(c => c == '0' || c == '1'))
    assert(got(1L)._1 == got(2L)._1,
      s"container changed the hash: ${got(1L)} vs ${got(2L)}")
    // cluster stats are self-consistent: n_cluster counts the docs
    // sharing the hash, canonical is the min of them (docs 1+2 share
    // by construction; doc 3 joins only if its raster happens to
    // threshold identically)
    val sameAs1 = got.count(_._2._1 == got(1L)._1).toLong
    assert(sameAs1 >= 2L && got(1L)._2 == sameAs1 && got(1L)._3 == 1L)
  }

  test("AVI frame callback delivers every payload in stream order, byte-exact") {
    import graft.multimodal.Multimodal.{AviParser, VideoGen}
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val raw = AviParser.parse(VideoGen.aviBytes(2, 1, 3, 7L), frames += _)
    assert(raw.nFrames == 3L && frames.length == 3)
    for (f <- 0 until 3; j <- 0 until 6)
      assert(frames(f)(j) == VideoGen.frameByte(7L, f, j),
        s"frame $f byte $j")
  }

  test("m8 scene cuts match an independent formula twin over the harness corpus") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.multimodal.Multimodal.m8SceneCuts(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // twin: replay the generator's byte formula — shares nothing with
    // the container walk under test
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def b(id: Long, f: Int, j: Int): Long =
      ((id % 256L) * 31L + f.toLong * 7919L + j.toLong * 2654435761L) % 256L
    var cutsSeen = 0; var quietSeen = 0
    ids.foreach { id =>
      val (w, h, nf) = ((1 + id % 16).toInt, (1 + id % 12).toInt,
        (1 + id % 6).toInt)
      val flen = w * h * 3
      val deltas = (1 until nf).map(f =>
        (0 until flen).map(j => math.abs(b(id, f, j) - b(id, f - 1, j))).sum)
      val exp = (nf.toLong, deltas.count(_ > 32L * flen).toLong,
        deltas.sum, if (deltas.isEmpty) 0L else deltas.max)
      assert(got(id) == exp, s"doc $id: got ${got(id)} want $exp")
      if (exp._2 > 0) cutsSeen += 1
      if (deltas.nonEmpty && exp._2 < deltas.length) quietSeen += 1
    }
    assert(cutsSeen > 0 && quietSeen > 0,
      s"threshold must separate: cuts in $cutsSeen docs, quiet deltas in $quietSeen")
  }

  test("m9 audio segments match an independent formula twin (grid, quiet rule, runs)") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.multimodal.Multimodal.m9AudioSegments(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def v(id: Long, i: Int): Long =
      ((id % 65536L) * 2654435761L + i * 40503L) % 65536L - 32768L
    var quietSeen = 0; var loudSeen = 0
    ids.foreach { id =>
      val n = 1000 + (id % 500).toInt * 8
      val sq = (0 until n).map { i => val x = v(id, i); x * x }
      val wins = sq.grouped(500).toArray
      val tot = sq.sum
      val flags = wins.map(wn => wn.sum * n < tot * wn.length)
      var run = 0; var best = 0
      flags.foreach { f => if (f) { run += 1; best = math.max(best, run) } else run = 0 }
      val frac = BigDecimal(flags.count(identity).toDouble / wins.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val exp = (wins.length, flags.count(identity), best, frac)
      assert(got(id) == exp, s"doc $id: got ${got(id)} want $exp")
      if (flags.exists(identity)) quietSeen += 1
      if (flags.exists(!_)) loudSeen += 1
    }
    assert(quietSeen > 0 && loudSeen > 0,
      s"quiet rule must separate: quiet in $quietSeen docs, loud in $loudSeen")
  }

  test("m14 audio fingerprint matches a formula twin and groups envelope dups") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.multimodal.Multimodal.m14AudioFingerprint(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    def v(id: Long, i: Int): Long =
      ((id % 65536L) * 2654435761L + i * 40503L) % 65536L - 32768L
    // independent fold of the 2-bit envelope per doc
    val fps = ids.map { id =>
      val n = 1000 + (id % 500).toInt * 8
      val sq = (0 until n).map { i => val x = v(id, i); x * x }
      val wins = sq.grouped(500).map(_.toArray).toArray
      val tot = sq.sum
      var fp = 0L
      wins.indices.foreach { w =>
        val quiet = if (wins(w).sum * n < tot * wins(w).length) 1L else 0L
        val rise = if (w > 0 && wins(w).sum > wins(w - 1).sum) 1L else 0L
        fp = fp * 4 + quiet * 2 + rise
      }
      id -> ((wins.length, fp))
    }.toMap
    val groups = fps.toSeq.groupBy { case (_, k) => k }
      .map { case (k, ms) => k -> ((ms.size.toLong, ms.map(_._1).min)) }
    ids.take(2000).foreach { id =>
      val (nw, fp) = fps(id)
      val (nd, canon) = groups((nw, fp))
      assert(got(id) == ((nw, fp, nd, id == canon)),
        s"doc $id: got ${got(id)} want ${(nw, fp, nd, id == canon)}")
    }
    // the 20-bit envelope must actually separate AND collide on this corpus
    assert(fps.values.map(_._2).toSet.size > 1, "all fingerprints equal")
    assert(groups.values.exists(_._1 > 1), "no envelope dup group found")
  }

  test("m15 video fingerprint matches a formula twin over the real AVI walk") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.multimodal.Multimodal.m15VideoFingerprint(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    def byte(id: Long, f: Int, j: Int): Long =
      ((id % 256) * 31 + f.toLong * 7919 + j.toLong * 2654435761L) % 256
    val fps = ids.map { id =>
      val (w, h, nf) = ((1 + id % 16).toInt, (1 + id % 12).toInt,
        (1 + id % 6).toInt)
      val flen = w * h * 3
      var fp = 0L
      (1 until nf).foreach { f =>
        val d = (0 until flen).map(j => math.abs(byte(id, f, j) -
          byte(id, f - 1, j))).sum
        val sCur = (0 until flen).map(j => byte(id, f, j)).sum
        val sPrev = (0 until flen).map(j => byte(id, f - 1, j)).sum
        val cut = if (d > 32L * flen) 1L else 0L
        val rise = if (sCur > sPrev) 1L else 0L
        fp = fp * 4 + cut * 2 + rise
      }
      id -> ((w, h, nf.toLong, fp))
    }.toMap
    val groups = fps.toSeq.groupBy(_._2)
      .map { case (k, ms) => k -> ((ms.size.toLong, ms.map(_._1).min)) }
    ids.take(2000).foreach { id =>
      val k @ (w, h, nf, fp) = fps(id)
      val (nd, canon) = groups(k)
      assert(got(id) == ((w, h, nf, fp, nd, id == canon)),
        s"doc $id: got ${got(id)} want ${(w, h, nf, fp, nd, id == canon)}")
    }
    assert(groups.values.exists(_._1 > 1), "no video dup group found")
    assert(fps.values.map(_._4).toSet.size > 1, "all video envelopes equal")
  }
}
