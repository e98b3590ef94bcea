package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Ground-truth specs for the multimodal surface (q37/q38/q53/q185).
  * IMAGE decode is real (`javax.imageio`, pinned against hand-built
  * pixel rasters below); the audio/video sample decode remains the
  * documented stub. The plumbing pins cover id↔feature pairing through
  * the per-partition batch path, null payloads, frame/chunk boundary
  * arithmetic (substring is 1-indexed in SQL — a classic off-by-one
  * source), and the md5-of-slice oracle recomputed with java.security
  * directly.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def payloads: Seq[(Long, Array[Byte])] = Seq(
    1L -> Array[Byte](1, 2, 3, 4, 5, 6, 7),
    2L -> Array[Byte](-128, 0, 127),
    3L -> Array.emptyByteArray,
    4L -> Array.tabulate(1000)(i => (i * 31 + 7).toByte))

  test("decodeImageRgb: real JDK codec round-trip returns exact pixels") {
    // hand-built raster: every channel distinct per pixel so a channel
    // swap, row-stride error, or top/bottom flip changes some value
    val w = 3; val h = 2
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((10 + x * 40 + y * 100) << 16) | ((20 + x * 41 + y * 90) << 8) |
        (30 + x * 42 + y * 80)
    }
    val png = Multimodal.encodePng(w, h, px)
    val Some((dw, dh, dpx)) = Multimodal.decodeImageRgb(png)
    assert((dw, dh) == ((w, h)))
    assert(dpx.toSeq == px.toSeq) // PNG is lossless: bit-exact round-trip
    // JPEG decodes for real too (dims exact; samples lossy by design)
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jout))
    val Some((jw, jh, jpx)) = Multimodal.decodeImageRgb(jout.toByteArray)
    assert((jw, jh, jpx.length) == ((17, 9, 17 * 9)))
    // non-image bytes, truncated PNG, webp (no JDK codec), null → None
    assert(Multimodal.decodeImageRgb("just text bytes here".getBytes).isEmpty)
    assert(Multimodal.decodeImageRgb(png.take(20)).isEmpty)
    assert(Multimodal.decodeImageRgb(
      graft.plans.ImageHeaders.buildWebp(4, 4)).isEmpty)
    assert(Multimodal.decodeImageRgb(null).isEmpty)
  }

  test("imageFeaturesExact: decoded-pixel sums match a driver recompute; " +
      "non-images emit width=-1") {
    val w = 5; val h = 4
    val px = Array.tabulate(w * h)(i => ((i * 37) % 256 << 16) |
      ((i * 53) % 256 << 8) | ((i * 71) % 256))
    val png = Multimodal.encodePng(w, h, px)
    var sr = 0L; var sg = 0L; var sb = 0L; var nb = 0L
    px.foreach { p =>
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b; if (r + g + b >= 384) nb += 1
    }
    val df = Seq((1L, png), (2L, "not an image".getBytes))
      .toDF("doc_id", "payload")
    val got = Multimodal.imageFeaturesExact(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == ((w, h, sr, sg, sb, nb)))
    assert(got(2L) == ((-1, -1, 0L, 0L, 0L, 0L)))
  }

  test("extractFeatures routes decodable images to the REAL decode path") {
    val w = 4; val h = 3
    val px = Array.tabulate(w * h)(i => (i * 613) % 0x1000000)
    val png = Multimodal.encodePng(w, h, px)
    val got = Multimodal.extractFeatures(
      Seq((9L, png)).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(9L) == Multimodal.imageFeatureVector(w, h, px).toSeq)
    // real features, visibly not the stub's [0,1) byte-hash band
    assert(got(9L).head == w.toFloat && got(9L)(1) == h.toFloat)
  }

  test("extractFeatures pairs ids with the stub features; nulls decode empty") {
    val df = payloads.toDF("doc_id", "payload")
      .unionByName(Seq((5L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload"))
    val got = Multimodal.extractFeatures(df, "doc_id", "payload")
    // binary column is pruned from the output — features shuffle, bytes don't
    assert(got.columns.toSeq == Seq("id", "features"))
    val byId = got.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // independent recompute of the FNV-style stub, per slot
    def oracle(bytes: Array[Byte]): Seq[Float] = (0 until Multimodal.featureDim).map { k =>
      var acc = 1469598103934665603L ^ k
      bytes.foreach(b => acc = (acc ^ b) * 1099511628211L)
      math.abs(acc % 1000000L).toFloat / 1000000f
    }
    payloads.foreach { case (id, bytes) => assert(byId(id) == oracle(bytes), s"id=$id") }
    assert(byId(5L) == oracle(Array.emptyByteArray)) // null payload → empty decode
    assert(byId.values.forall(f => f.size == Multimodal.featureDim && f.forall(v => v >= 0f && v < 1f)))
  }

  test("frameSample offsets/lengths/md5 match a driver-side slicer") {
    val frameLen = 3
    val got = Multimodal.frameSample(payloads.toDF("doc_id", "payload"),
      "doc_id", "payload", frameLen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getAs[Number](2).longValue(), r.getAs[Number](3).longValue(),
          r.getString(4))).toMap
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    payloads.foreach { case (id, bytes) =>
      val nFrames = math.max((bytes.length - 1) / frameLen, 0) + 1
      assert(got.keys.count(_._1 == id) == nFrames, s"id=$id")
      (0 until nFrames).foreach { f =>
        val off = f * frameLen
        val len = math.min(bytes.length - off, frameLen)
        val slice = bytes.slice(off, off + len)
        assert(got((id, f)) == ((off.toLong, len.toLong, md5hex(slice))),
          s"id=$id frame=$f")
      }
    }
  }

  test("sampleChunks boundary arithmetic matches a driver loop") {
    val cs = 256
    val got = Multimodal.sampleChunks(payloads.toDF("doc_id", "payload"),
      "doc_id", "payload", cs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getInt(1), r.getInt(3), r.getInt(4)))
      .toMap
    payloads.foreach { case (id, bytes) =>
      val n = math.max((bytes.length - 1) / cs, 0) + 1
      assert(got.keys.count(_._1 == id) == n)
      (0 until n).foreach { c =>
        val off = c * cs
        assert(got((id, c)) == ((bytes.length, off, math.min(bytes.length - off, cs))))
      }
    }
  }

  test("imageMeta reads real codec output: javax.imageio PNG/JPEG round-trip") {
    // Non-circular check: the JDK's own encoders produce the bytes, the
    // header kernel reads the dims back — a parser that misreads IHDR or
    // walks JPEG markers wrong (APPn/quant tables precede SOF in real
    // encoder output) fails here.
    def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
      out.toByteArray
    }
    val cases = Seq(
      (1L, encoded("png", 640, 480), ("png", 640, 480)),
      (2L, encoded("png", 1, 1), ("png", 1, 1)),
      (3L, encoded("jpg", 123, 45), ("jpeg", 123, 45)),
      (4L, encoded("jpg", 2000, 1), ("jpeg", 2000, 1)),
      (5L, graft.plans.ImageHeaders.buildGif(321, 7), ("gif", 321, 7)),
      (6L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10), ("unknown", -1, -1)))
    val df = cases.map { case (id, b, _) => (id, b) }.toDF("id", "img")
    val got = df.select(col("id"), Multimodal.imageMeta(col("img")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    cases.foreach { case (id, _, want) => assert(got(id) == want, s"id=$id") }
    // asMediaWithMeta fills the typed metadata columns from the header
    val media = df.filter(col("id") === 1L)
      .select(Multimodal.asMediaWithMeta(col("img"), lit("image/png")).as("m"))
      .select(col("m.width"), col("m.height"), col("m.mime"))
      .head()
    assert((media.getInt(0), media.getInt(1), media.getString(2)) == ((640, 480, "image/png")))
    // unknown container → null dims in the media struct, not -1
    val unk = df.filter(col("id") === 6L)
      .select(Multimodal.asMediaWithMeta(col("img"), lit("application/octet-stream")).as("m"))
      .select(col("m.width")).head()
    assert(unk.isNullAt(0))
  }

  test("audioMeta: JDK WAV encoder round-trip, FLAC bit packing, unknowns") {
    // real WAV bytes from javax.sound (which also writes a fact-less
    // PCM layout but computes its own sizes) — a chunk walk that
    // assumes fixed offsets or misreads LE fields fails here
    def jdkWav(ch: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        rate.toFloat, bits, ch, true, false)
      val data = new Array[Byte](frames * ch * (bits / 8))
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val cases = Seq(
      (1L, jdkWav(2, 44100, 16, 1234), ("wav", 2, 44100, 16, 1234L)),
      (2L, jdkWav(1, 8000, 8, 99), ("wav", 1, 8000, 8, 99L)),
      (3L, graft.plans.AudioHeaders.buildFlac(8, 96000, 24, 0x123456789L),
        ("flac", 8, 96000, 24, 0x123456789L)),
      (4L, graft.plans.AudioHeaders.buildWav(2, 48000, 32, 500L),
        ("wav", 2, 48000, 32, 500L)),
      // RIFF that is WEBP, not WAVE → unknown here
      (5L, graft.plans.ImageHeaders.buildWebp(4, 4), ("unknown", -1, -1, -1, -1L)),
      (6L, "not audio at all, just text bytes".getBytes,
        ("unknown", -1, -1, -1, -1L)))
    val df = cases.map { case (id, b, _) => (id, b) }.toDF("id", "audio")
    val got = df.select(col("id"), Multimodal.audioMeta(col("audio")).as("m"))
      .select(col("id"), col("m.format"), col("m.channels"),
        col("m.sample_rate"), col("m.bits"), col("m.n_frames"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))))
      .toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id=$id got ${got(id)}") }
  }

  test("audioMeta: >= 2^31 RIFF chunk size terminates (no Int-wrap loop)") {
    // RIFF sizes are unsigned 32-bit: a chunk size of 0x80000010 made the
    // old Int-truncating walk advance by a NEGATIVE amount — an infinite
    // executor loop or a backwards index crash. The walk must terminate
    // and keep what parsed before the huge chunk.
    val b = graft.plans.AudioHeaders.buildWav(2, 48000, 16, 100L)
    // overwrite the data-chunk size (bytes 40..43 LE) with 0x80000010
    b(40) = 0x10.toByte; b(41) = 0; b(42) = 0; b(43) = 0x80.toByte
    val (f, ch, rate, bits, frames) = graft.plans.AudioHeaders.parse(b)
    assert((f, ch, rate, bits) == (("wav", 2, 48000, 16)), (f, ch, rate, bits))
    // the huge data size itself is legal metadata: frames derive from it
    assert(frames == 0x80000010L / (2L * 2L), frames)
    // a huge size on the FIRST chunk (fmt_ position) must also terminate
    val c = graft.plans.AudioHeaders.buildWav(1, 8000, 8, 1L)
    c(16) = 0xff.toByte; c(17) = 0xff.toByte
    c(18) = 0xff.toByte; c(19) = 0xff.toByte // fmt chunk size = 0xffffffff
    val r = graft.plans.AudioHeaders.parse(c) // must return, not hang
    assert(r._1 == "wav" || r._1 == "unknown")
  }

  test("videoMeta: mvhd v0/v1 layouts, audio-track 0x0 skip, malformed boxes") {
    // hand-patch the builder's tkhd to a 0x0 audio track: dims must
    // stay unknown rather than reporting the audio track's zeros
    val audioOnly = graft.plans.VideoHeaders.buildMp4(600, 1200L, 0, 0)
    val cases = Seq(
      (1L, graft.plans.VideoHeaders.buildMp4(90000, 123456789L, 1920, 1080),
        ("mp4", 90000, 123456789L, 1920, 1080)),
      // v1 mvhd: 64-bit duration past the 32-bit range
      (2L, graft.plans.VideoHeaders.buildMp4(600, 7000000000L, 640, 360,
        v1 = true), ("mp4", 600, 7000000000L, 640, 360)),
      (3L, audioOnly, ("mp4", 600, 1200L, -1, -1)),
      (4L, "ftypnope".getBytes, ("unknown", -1, -1L, -1, -1)),
      (5L, graft.plans.ImageHeaders.buildPng(4, 4), ("unknown", -1, -1L, -1, -1)))
    val df = cases.map { case (id, b, _) => (id, b) }.toDF("id", "video")
    val got = df.select(col("id"), Multimodal.videoMeta(col("video")).as("m"))
      .select(col("id"), col("m.format"), col("m.timescale"),
        col("m.duration"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5))))
      .toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id=$id got ${got(id)}") }
  }

  test("imageMeta: BMP (JDK encoder + top-down) and all three WEBP layouts") {
    def jdkBmp(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", out), "no bmp encoder")
      out.toByteArray
    }
    def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
      b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
    }
    // top-down BMP: negative stored height, magnitude reported
    val topDown = graft.plans.ImageHeaders.buildBmp(10, 7)
    putLe32(topDown, 22, -7)
    // VP8L (lossless): 0x2F signature then 14+14-bit packed (w-1, h-1)
    def vp8l(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](25)
      "RIFF".getBytes.copyToArray(b, 0)
      putLe32(b, 4, 17)
      "WEBPVP8L".getBytes.copyToArray(b, 8)
      putLe32(b, 16, 5)
      b(20) = 0x2f
      putLe32(b, 21, ((w - 1) & 0x3fff) | ((h - 1) << 14))
      b
    }
    // lossy VP8: frame tag then 9D 01 2A start code, 14-bit LE dims
    def vp8(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](30)
      "RIFF".getBytes.copyToArray(b, 0)
      putLe32(b, 4, 22)
      "WEBPVP8 ".getBytes.copyToArray(b, 8)
      putLe32(b, 16, 10)
      b(23) = 0x9d.toByte; b(24) = 0x01; b(25) = 0x2a
      b(26) = (w & 0xff).toByte; b(27) = ((w >> 8) & 0xff).toByte
      b(28) = (h & 0xff).toByte; b(29) = ((h >> 8) & 0xff).toByte
      b
    }
    val cases = Seq(
      (1L, jdkBmp(97, 33), ("bmp", 97, 33)),
      (2L, graft.plans.ImageHeaders.buildBmp(640, 480), ("bmp", 640, 480)),
      (3L, topDown, ("bmp", 10, 7)),
      (4L, graft.plans.ImageHeaders.buildWebp(16384, 1), ("webp", 16384, 1)),
      (5L, vp8l(123, 45), ("webp", 123, 45)),
      (6L, vp8(321, 7), ("webp", 321, 7)),
      // a RIFF that is not WEBP must stay unknown
      (7L, "RIFF    WAVEfmt ".getBytes, ("unknown", -1, -1)))
    val df = cases.map { case (id, b, _) => (id, b) }.toDF("id", "img")
    val got = df.select(col("id"), Multimodal.imageMeta(col("img")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    cases.foreach { case (id, _, want) => assert(got(id) == want, s"id=$id got ${got(id)}") }
  }
}
