package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image CONTAINER metadata: width/height as declared by the
  * header bytes — PNG IHDR, JPEG SOFn frame header, GIF logical screen
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
