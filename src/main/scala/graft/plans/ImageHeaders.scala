package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image CONTAINER metadata: width/height as declared by the
  * header bytes — PNG IHDR, JPEG SOFn frame header, GIF logical screen,
  * BMP BITMAPINFOHEADER, WEBP VP8X/VP8L/VP8 chunk
  * descriptor. No codec is involved (the payload is never decoded), so
  * this runs anywhere the JVM runs and shrinks Multimodal's stub boundary
  * to feature extraction only: schema-level metadata (`width`, `height`,
  * `format`) is real.
  *
  * Reference shape: the reference stores media as opaque blobs with typed
  * metadata alongside (docs/mkdocs arbitrary-binary recipes); here the
  * metadata derives from the payload itself in one codegen'd pass.
  */
object ImageHeaders {

  final val Unknown = -1

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** (format, width, height); ("unknown", -1, -1) when not parseable. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return ("unknown", Unknown, Unknown)
    if (isPng(b)) ("png", be32(b, 16), be32(b, 20))
    else if (isJpeg(b)) {
      val (w, h) = jpegDims(b)
      if (w == Unknown) ("unknown", Unknown, Unknown) else ("jpeg", w, h)
    } else if (isGif(b)) ("gif", le16(b, 6), le16(b, 8))
    else if (isBmp(b)) {
      // BITMAPINFOHEADER (DIB size >= 40): signed LE32 dims at 18/22;
      // negative height = top-down row order, magnitude is the height
      val h = le32(b, 22)
      ("bmp", le32(b, 18), math.abs(h))
    } else if (isWebp(b)) webpDims(b)
    else ("unknown", Unknown, Unknown)
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40

  private def isWebp(b: Array[Byte]): Boolean =
    b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  /** WEBP container dims per the three chunk layouts (RIFF spec):
    * VP8X canvas = 24-bit LE (width-1, height-1) at payload+4/+7,
    * VP8L packs 14-bit (width-1, height-1) after the 0x2F signature,
    * lossy VP8 carries 14-bit dims after the 9D 01 2A start code.
    */
  private def webpDims(b: Array[Byte]): (String, Int, Int) = {
    def le24(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
    val tag = new String(b.slice(12, 16), "US-ASCII")
    tag match {
      case "VP8X" if b.length >= 30 =>
        ("webp", 1 + le24(24), 1 + le24(27))
      case "VP8L" if b.length >= 25 && b(20) == 0x2f =>
        val q = le32(b, 21)
        ("webp", 1 + (q & 0x3fff), 1 + ((q >> 14) & 0x3fff))
      case "VP8 " if b.length >= 30 &&
          b(23) == 0x9d.toByte && b(24) == 0x01 && b(25) == 0x2a =>
        ("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
      case _ => ("unknown", Unknown, Unknown)
    }
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Walk JPEG marker segments to the first SOFn frame header (the set of
    * start-of-frame markers per ITU T.81, excluding DHT/JPG/DAC C4/C8/CC).
    */
  private def jpegDims(b: Array[Byte]): (Int, Int) = {
    var i = 2
    while (i + 3 < b.length) {
      if (b(i) != 0xff.toByte) return (Unknown, Unknown)
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff } // fill bytes
      if (m >= 0xd0 && m <= 0xd9 || m == 0x01) i += 2 // standalone markers
      else {
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 >= b.length) return (Unknown, Unknown)
          return (be16(b, i + 7), be16(b, i + 5)) // width, height
        }
        if (i + 3 >= b.length) return (Unknown, Unknown)
        i += 2 + be16(b, i + 2)
      }
    }
    (Unknown, Unknown)
  }

  /** Codegen bridge: the struct row the expression returns. */
  def row(b: Array[Byte]): InternalRow = {
    val (f, w, h) = parse(b)
    InternalRow(UTF8String.fromString(f), w, h)
  }

  // ---- deterministic test/gate payload builders (header + minimal body).
  // These exist so header parsing can be exercised (and driver-gated)
  // without codec libraries; they are NOT encoders — bodies are filler.

  def buildPng(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = 6 // bit depth, RGBA
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def buildJpeg(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0/JFIF stub segment ahead of the SOF, so the marker walk is real
    val app0 = Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    writeSegment(out, 0xe0, app0)
    val sof = new Array[Byte](15)
    sof(0) = 8 // precision
    sof(1) = ((h >> 8) & 0xff).toByte; sof(2) = (h & 0xff).toByte
    sof(3) = ((w >> 8) & 0xff).toByte; sof(4) = (w & 0xff).toByte
    sof(5) = 3 // components
    writeSegment(out, 0xc0, sof)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  def buildGif(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](13)
    Array('G', 'I', 'F', '8', '9', 'a').zipWithIndex.foreach { case (c, i) => b(i) = c.toByte }
    b(6) = (w & 0xff).toByte; b(7) = ((w >> 8) & 0xff).toByte
    b(8) = (h & 0xff).toByte; b(9) = ((h >> 8) & 0xff).toByte
    b
  }

  def buildBmp(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](54) // 14-byte file header + 40-byte DIB
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, 54); putLe32(b, 10, 54) // size, pixel offset
    putLe32(b, 14, 40) // BITMAPINFOHEADER
    putLe32(b, 18, w); putLe32(b, 22, h)
    b(26) = 1; b(28) = 24 // planes, bpp
    b
  }

  /** VP8X (extended) container — the layout real encoders emit for any
    * webp with metadata; canvas dims are (value − 1) in 24-bit LE.
    */
  def buildWebp(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](30)
    Array('R', 'I', 'F', 'F').zipWithIndex.foreach { case (c, i) => b(i) = c.toByte }
    putLe32(b, 4, 22) // RIFF payload size
    Array('W', 'E', 'B', 'P', 'V', 'P', '8', 'X').zipWithIndex
      .foreach { case (c, i) => b(8 + i) = c.toByte }
    putLe32(b, 16, 10) // VP8X chunk size
    val (w1, h1) = (w - 1, h - 1)
    b(24) = (w1 & 0xff).toByte; b(25) = ((w1 >> 8) & 0xff).toByte
    b(26) = ((w1 >> 16) & 0xff).toByte
    b(27) = (h1 & 0xff).toByte; b(28) = ((h1 >> 8) & 0xff).toByte
    b(29) = ((h1 >> 16) & 0xff).toByte
    b
  }

  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, tag: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len); out.write(tag.getBytes("US-ASCII")); out.write(data)
    out.write(new Array[Byte](4)) // CRC filler — parsers here don't check it
  }

  private def writeSegment(out: java.io.ByteArrayOutputStream, marker: Int, data: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = data.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(data, 0, data.length)
  }
}

/** `image_meta(binary)` → struct(format string, width int, height int). */
final case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"image_meta expects binary, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ImageHeaders.row(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = graft.plans.ImageHeaders.row($b);")

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}

object ImageMeta {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def apply(bytes: Column): Column =
    CatalystBridge.column(ImageMeta(CatalystBridge.expression(bytes)))
}
