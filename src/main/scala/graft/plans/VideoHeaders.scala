package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real MP4/ISO-BMFF container metadata from header bytes — a box walk
  * to moov → mvhd (timescale, duration; v0 32-bit and v1 64-bit
  * layouts) and the first video tkhd (16.16 fixed-point presentation
  * dims) — the video member of the [[ImageHeaders]]/[[AudioHeaders]]
  * family. No codec, no frame decode; frame SAMPLING over the opaque
  * payload is Multimodal.frameSample.
  */
object VideoHeaders {

  val Unknown: Int = -1
  val UnknownL: Long = -1L

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b.slice(i + 4, i + 8), "US-ASCII")

  /** (format, timescale, duration, width, height) — duration in
    * timescale units; ("unknown", -1, -1, -1, -1) when not parseable.
    */
  def parse(b: Array[Byte]): (String, Int, Long, Int, Int) = {
    if (b == null || b.length < 16 || boxType(b, 0) != "ftyp")
      return ("unknown", Unknown, UnknownL, Unknown, Unknown)
    var timescale = Unknown
    var duration = UnknownL
    var w = Unknown
    var h = Unknown

    def walk(from: Long, until: Long, depth: Int): Unit = {
      var i = from
      while (i + 8 <= until && depth < 8) {
        val size = be32(b, i.toInt)
        if (size < 8) return // malformed; 64-bit largesize unsupported here
        val end = math.min(i + size, until)
        val t = boxType(b, i.toInt)
        t match {
          case "moov" | "trak" => walk(i + 8, end, depth + 1)
          case "mvhd" if i + 12 <= until =>
            val v = b(i.toInt + 8) & 0xff
            if (v == 1 && i + 40 <= end) {
              timescale = be32(b, i.toInt + 28).toInt
              duration = be64(b, i.toInt + 32)
            } else if (v == 0 && i + 32 <= end) {
              timescale = be32(b, i.toInt + 20).toInt
              duration = be32(b, i.toInt + 24)
            }
          case "tkhd" if w == Unknown =>
            val v = b(i.toInt + 8) & 0xff
            // width/height are the LAST two 32-bit 16.16 fields of the
            // box (v0: 84-byte payload, v1: 96) — read from the box end
            if (end - i >= (if (v == 1) 104 else 92)) {
              val wOff = (end - 8).toInt
              val tw = (be32(b, wOff) >> 16).toInt
              val th = (be32(b, wOff + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th } // audio tracks are 0×0
            }
          case _ => ()
        }
        i = end
      }
    }
    walk(0, b.length.toLong, 0)
    if (timescale == Unknown) ("unknown", Unknown, UnknownL, Unknown, Unknown)
    else ("mp4", timescale, duration, w, h)
  }

  def row(b: Array[Byte]): InternalRow = {
    val (f, ts, d, w, h) = parse(b)
    InternalRow(UTF8String.fromString(f), ts, d, w, h)
  }

  // ---- deterministic gate/test payload builder (ftyp + moov(mvhd,
  // trak(tkhd)) headers, no media body; NOT an encoder).

  def buildMp4(
      timescale: Int, duration: Long, w: Int, h: Int,
      v1: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    box(out, "ftyp") { o => o.write("isom".getBytes); putBe32(o, 512)
      o.write("isomiso2".getBytes) }
    val moov = new java.io.ByteArrayOutputStream()
    box(moov, "mvhd") { o =>
      if (v1) {
        o.write(1); o.write(0); o.write(0); o.write(0) // version 1, flags
        putBe64(o, 0L); putBe64(o, 0L) // creation, modification
        putBe32(o, timescale); putBe64(o, duration)
      } else {
        putBe32(o, 0) // version 0, flags
        putBe32(o, 0); putBe32(o, 0)
        putBe32(o, timescale); putBe32(o, duration.toInt)
      }
      putBe32(o, 0x00010000); o.write(Array[Byte](1, 0)) // rate, volume
      o.write(new Array[Byte](10)) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(putBe32(o, _)) // identity matrix
      o.write(new Array[Byte](24)) // predefined
      putBe32(o, 2) // next track id
    }
    val trak = new java.io.ByteArrayOutputStream()
    box(trak, "tkhd") { o =>
      putBe32(o, 7) // version 0, flags enabled
      putBe32(o, 0); putBe32(o, 0) // creation, modification
      putBe32(o, 1); putBe32(o, 0) // track id, reserved
      putBe32(o, duration.toInt)
      o.write(new Array[Byte](8)) // reserved
      o.write(new Array[Byte](8)) // layer, alt group, volume, reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(putBe32(o, _))
      putBe32(o, w << 16); putBe32(o, h << 16) // 16.16 fixed
    }
    box(moov, "trak")(_.write(trak.toByteArray))
    box(out, "moov")(_.write(moov.toByteArray))
    out.toByteArray
  }

  private def box(out: java.io.ByteArrayOutputStream, t: String)(
      body: java.io.ByteArrayOutputStream => Unit): Unit = {
    val payload = new java.io.ByteArrayOutputStream()
    body(payload)
    putBe32(out, 8 + payload.size())
    out.write(t.getBytes("US-ASCII"))
    payload.writeTo(out)
  }

  private def putBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 24) & 0xff); o.write((v >> 16) & 0xff)
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }

  private def putBe64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    putBe32(o, (v >> 32).toInt); putBe32(o, v.toInt)
  }
}

/** `video_meta(binary)` → struct(format string, timescale int,
  * duration long, width int, height int).
  */
final case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMeta.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_meta expects binary, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    VideoHeaders.row(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VideoHeaders.row($c);")

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)

  override def prettyName: String = "video_meta"
}

object VideoMeta {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("timescale", IntegerType),
    StructField("duration", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def apply(bytes: Column): Column =
    CatalystBridge.column(VideoMeta(CatalystBridge.expression(bytes)))
}
