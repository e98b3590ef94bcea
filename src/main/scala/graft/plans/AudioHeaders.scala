package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real audio container metadata from header bytes — WAV RIFF chunk
  * walk and FLAC STREAMINFO — the audio twin of [[ImageHeaders]]: the
  * payload is an opaque binary column, the metadata (format, channels,
  * sample rate, bit depth, total frames) is REAL parsing, no codec
  * needed. Everything codec-dependent (decode, resample, feature
  * extraction) stays behind the Multimodal stub boundary.
  */
object AudioHeaders {

  val Unknown: Int = -1
  val UnknownL: Long = -1L

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** (format, channels, sample_rate, bits, n_frames);
    * ("unknown", -1, -1, -1, -1) when not parseable.
    */
  def parse(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null) ("unknown", Unknown, Unknown, Unknown, UnknownL)
    else if (isWav(b)) wavMeta(b)
    else if (isFlac(b)) flacMeta(b)
    else ("unknown", Unknown, Unknown, Unknown, UnknownL)
  }

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 20 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def isFlac(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** RIFF chunk walk: fmt_ supplies channels/rate/bits, data size gives
    * the frame count (real WAV writers may put LIST/fact chunks before
    * either, so the walk is a loop, not fixed offsets).
    */
  private def wavMeta(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    var channels = Unknown
    var rate = Unknown
    var bits = Unknown
    var frames = UnknownL
    var i = 12
    while (i + 8 <= b.length) {
      val tag = new String(b.slice(i, i + 4), "US-ASCII")
      val size = le32(b, i + 4)
      if (tag == "fmt " && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        bits = le16(b, i + 22)
      } else if (tag == "data") {
        // frame = one sample across all channels; size may legitimately
        // describe bytes past the header slice we were handed
        if (channels > 0 && bits > 0)
          frames = size / (channels.toLong * (bits / 8))
      }
      // chunks are word-aligned: odd sizes carry a pad byte. Advance in
      // LONG space: RIFF sizes are unsigned 32-bit, so a size >= 2^31
      // truncated to Int goes negative and the walk would loop forever
      // (advance 0) or crash backwards — the VideoHeaders `size < 8`
      // class of guard. A next offset past Int.MaxValue cannot index an
      // Array[Byte] at all, so stop with what parsed so far.
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > Int.MaxValue.toLong) i = b.length
      else i = next.toInt
    }
    if (channels == Unknown) ("unknown", Unknown, Unknown, Unknown, UnknownL)
    else ("wav", channels, rate, bits, frames)
  }

  /** FLAC STREAMINFO (always the first metadata block): 20-bit sample
    * rate, 3-bit channels−1, 5-bit bits−1, 36-bit total samples packed
    * big-endian at bytes 18..25 of the file.
    */
  private def flacMeta(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if ((b(4) & 0x7f) != 0) return ("unknown", Unknown, Unknown, Unknown, UnknownL)
    val rate = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) | ((b(20) & 0xff) >> 4)
    val channels = (((b(20) & 0xff) >> 1) & 7) + 1
    val bits = ((((b(20) & 1) << 4) | ((b(21) & 0xff) >> 4)) & 0x1f) + 1
    val frames = ((b(21) & 0xfL) << 32) | ((b(22) & 0xffL) << 24) |
      ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
    ("flac", channels, rate, bits, frames)
  }

  def row(b: Array[Byte]): InternalRow = {
    val (f, c, r, bi, n) = parse(b)
    InternalRow(UTF8String.fromString(f), c, r, bi, n)
  }

  // ---- deterministic gate/test payload builders (headers + no body;
  // NOT encoders — see ImageHeaders' builders).

  def buildWav(channels: Int, rate: Int, bits: Int, frames: Long): Array[Byte] = {
    val dataBytes = frames * channels * (bits / 8)
    val b = new Array[Byte](44)
    "RIFF".getBytes.copyToArray(b, 0)
    putLe32(b, 4, 36 + dataBytes.toInt)
    "WAVEfmt ".getBytes.copyToArray(b, 8)
    putLe32(b, 16, 16) // PCM fmt chunk size
    b(20) = 1 // PCM
    b(22) = (channels & 0xff).toByte; b(23) = ((channels >> 8) & 0xff).toByte
    putLe32(b, 24, rate)
    putLe32(b, 28, rate * channels * (bits / 8)) // byte rate
    b(32) = ((channels * bits / 8) & 0xff).toByte // block align
    b(34) = (bits & 0xff).toByte
    "data".getBytes.copyToArray(b, 36)
    putLe32(b, 40, dataBytes.toInt)
    b
  }

  def buildFlac(channels: Int, rate: Int, bits: Int, frames: Long): Array[Byte] = {
    val b = new Array[Byte](26)
    "fLaC".getBytes.copyToArray(b, 0)
    b(4) = 0x80.toByte // last-block flag + type 0 (STREAMINFO)
    b(7) = 34 // STREAMINFO length
    b(18) = ((rate >> 12) & 0xff).toByte
    b(19) = ((rate >> 4) & 0xff).toByte
    b(20) = (((rate & 0xf) << 4) | (((channels - 1) & 7) << 1) |
      (((bits - 1) >> 4) & 1)).toByte
    b(21) = ((((bits - 1) & 0xf) << 4) | ((frames >> 32) & 0xf)).toByte
    b(22) = ((frames >> 24) & 0xff).toByte
    b(23) = ((frames >> 16) & 0xff).toByte
    b(24) = ((frames >> 8) & 0xff).toByte
    b(25) = (frames & 0xff).toByte
    b
  }

  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }
}

/** `audio_meta(binary)` → struct(format string, channels int,
  * sample_rate int, bits int, n_frames long).
  */
final case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_meta expects binary, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    AudioHeaders.row(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AudioHeaders.row($c);")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)

  override def prettyName: String = "audio_meta"
}

object AudioMeta {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType)))

  def apply(bytes: Column): Column =
    CatalystBridge.column(AudioMeta(CatalystBridge.expression(bytes)))
}
