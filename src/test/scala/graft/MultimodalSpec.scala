package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Ground-truth specs for the multimodal plumbing (q37/q38/q53 surface).
  * The codec itself is the documented stub; what these pin is everything
  * around it — id↔feature pairing through the per-partition batch path,
  * null payloads, frame/chunk boundary arithmetic (substring is 1-indexed
  * in SQL — a classic off-by-one source), and the md5-of-slice oracle
  * recomputed with java.security directly.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def payloads: Seq[(Long, Array[Byte])] = Seq(
    1L -> Array[Byte](1, 2, 3, 4, 5, 6, 7),
    2L -> Array[Byte](-128, 0, 127),
    3L -> Array.emptyByteArray,
    4L -> Array.tabulate(1000)(i => (i * 31 + 7).toByte))

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
}
