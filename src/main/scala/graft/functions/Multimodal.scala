package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the Spark-side plumbing for batch decode /
  * feature-extraction.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces deterministic fake features from the
  * bytes. Everything around it — the schema contract, the mapPartitions
  * batching, partition sizing, and the column pruning that keeps huge
  * binary payloads out of shuffles — is the real production shape.
  *
  * Scale rules encoded here:
  *  - binary payloads NEVER pass through a shuffle: derive features first
  *    (narrow map), then join features by id.
  *  - decode runs per-partition so heavyweight codec state is initialized
  *    once per task, not once per row (the mapInPandas batch shape).
  */
object Multimodal {

  /** Canonical media struct: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column into the canonical media struct. */
  def asMedia(bytes: Column, mime: Column): Column =
    struct(
      bytes.as("bytes"),
      mime.as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))

  /** Cheap, codegen'd byte-level metadata — no decode needed. */
  def byteLength(bytes: Column): Column = length(bytes)
  def contentHash(bytes: Column): Column = md5(bytes)

  /** Container-header metadata (PNG IHDR / JPEG SOFn / GIF screen
    * descriptor) parsed in one codegen'd pass — real `width`/`height`
    * without any codec (graft.plans.ImageHeaders). Unknown containers
    * yield ("unknown", -1, -1).
    */
  def imageMeta(bytes: Column): Column = graft.plans.ImageMeta(bytes)

  /** Audio container metadata (WAV RIFF chunk walk, FLAC STREAMINFO) —
    * struct(format, channels, sample_rate, bits, n_frames) parsed in
    * one codegen'd pass, no codec (graft.plans.AudioHeaders). Unknown
    * containers yield ("unknown", -1, -1, -1, -1).
    */
  def audioMeta(bytes: Column): Column = graft.plans.AudioMeta(bytes)

  /** MP4/ISO-BMFF container metadata (moov→mvhd walk + first video
    * tkhd) — struct(format, timescale, duration, width, height), no
    * codec (graft.plans.VideoHeaders). Duration is in timescale units:
    * seconds = duration / timescale.
    */
  def videoMeta(bytes: Column): Column = graft.plans.VideoMeta(bytes)

  /** [[asMedia]] with width/height filled from the container header —
    * the stub boundary is now feature extraction only.
    */
  def asMediaWithMeta(bytes: Column, mime: Column): Column = {
    val m = imageMeta(bytes)
    struct(
      bytes.as("bytes"),
      mime.as("mime"),
      when(m.getField("width") >= 0, m.getField("width"))
        .cast(IntegerType).as("width"),
      when(m.getField("height") >= 0, m.getField("height"))
        .cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))
  }

  val featureDim = 8

  /** Deterministic fake "decode + feature extract": in production this is
    * the call into an image/audio codec (??? boundary). Features are a
    * stable function of the payload bytes so tests are reproducible.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // ??? — real implementation decodes the media and runs the extractor.
    // Deterministic fake: k polynomial byte-hashes, scaled to [0,1).
    val out = new Array[Float](featureDim)
    var k = 0
    while (k < featureDim) {
      var acc = 1469598103934665603L ^ k
      var i = 0
      while (i < bytes.length) { acc = (acc ^ bytes(i)) * 1099511628211L; i += 1 }
      out(k) = math.abs(acc % 1000000L).toFloat / 1000000f
      k += 1
    }
    out
  }

  private val featuresSchema = ArrayType(FloatType)

  /** Batch feature extraction: one decoder per partition, binary column
    * pruned from the output (features + id only), so downstream ops
    * shuffle floats, not payloads.
    */
  def extractFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(bytesCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init of heavyweight codec state happens here
        // (once per task, not once per row — the mapInPandas batch shape)
        rows.map { case (id, bytes) =>
          (id, decodeStub(Option(bytes).getOrElse(Array.emptyByteArray)))
        }
      }
      .toDF("id", "features")
  }

  /** Frame extraction over a binary payload: one row per `frameLen`-byte
    * frame with (offset, len, md5 of the frame bytes) — the codec-free
    * stand-in for keyframe extraction (in production the offsets come from
    * the container index, the hash from the decoded frame). substring/md5
    * are codegen'd; the payload is sliced in-task and never shuffles.
    */
  def frameSample(df: DataFrame, idCol: String, bytesCol: String, frameLen: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(bytesCol).as("__b"),
      posexplode(
        sequence(lit(0),
          greatest(floor((length(col(bytesCol)) - 1) / lit(frameLen)).cast("int"), lit(0)))))
      .toDF("id", "__b", "frame_idx", "__i")
      .select(col("id"), col("frame_idx"),
        (col("frame_idx") * frameLen).as("offset"),
        least(length(col("__b")) - col("frame_idx") * frameLen, lit(frameLen)).as("len"),
        md5(expr(s"substring(__b, frame_idx * $frameLen + 1, " +
          s"least(length(__b) - frame_idx * $frameLen, $frameLen))")).as("frame_md5"))

  /** Frame-sampling plumbing for video-like payloads: deterministic chunk
    * boundaries as (offset, length) pairs — in production the codec seeks
    * per keyframe; here every `chunkSize` bytes. Emits one row per sampled
    * chunk, demonstrating the explode-side batching.
    */
  def sampleChunks(df: DataFrame, idCol: String, bytesCol: String, chunkSize: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      length(col(bytesCol)).as("total_len"),
      posexplode(
        transform(
          // integer chunk count: `/` on Columns is double division and
          // sequence() rejects mixed INT/DOUBLE bounds
          sequence(lit(0),
            greatest(floor((length(col(bytesCol)) - 1) / lit(chunkSize)).cast("int"), lit(0))),
          i => struct(
            (i * chunkSize).as("offset"),
            least(length(col(bytesCol)) - i * chunkSize, lit(chunkSize)).as("len")))))
      .toDF("id", "total_len", "chunk_idx", "chunk")
      .select(col("id"), col("total_len"), col("chunk_idx"),
        col("chunk.offset").as("offset"), col("chunk.len").as("len"))
}
