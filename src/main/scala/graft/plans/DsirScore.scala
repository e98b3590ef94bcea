package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bucket-model holder for [[DsirScore]]: the per-bucket micro-nat
  * log-ratios as a flat array indexed by bucket id. MessageDigest is not
  * thread-safe and the reference object is shared across an executor's
  * tasks, so digests are per-thread.
  */
final class DsirModel(val lrf: Array[Long]) extends Serializable {
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Dedup.h60(tok) % buckets without materializing hex strings: the
    * first 15 hex digits of md5 are the digest's top 60 bits, i.e. the
    * big-endian first-8-bytes value >>> 4 (pinned against the
    * conv(substring(md5)) formulation by ImportanceSpec).
    */
  private def bucket(tok: String): Int = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    ((be >>> 4) % lrf.length).toInt
  }

  /** (n_toks, Σ lrf[bucket(tok)]) over the single-space token split —
    * integer sum, order-free.
    */
  def score(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    var n = 0L
    var ws = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        ws += lrf(bucket(s.substring(start, i)))
        n += 1
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, ws))
  }
}

/** `dsir_score(text)`: the DSIR scoring pass as ONE narrow kernel —
  * per document, hash each token into the bucket model and sum the
  * micro-nat log-ratios. Replaces explode → broadcast-join → groupBy
  * (a corpus-sized shuffle of (doc_id, bucket) longs) with a pure
  * map: at 100 TB the scoring pass becomes shuffle-free.
  */
final case class DsirScore(child: Expression, model: DsirModel)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("ws", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dsir_score expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("dsirModel", model, classOf[DsirModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $modelRef.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)

  override def prettyName: String = "dsir_score"
}

object DsirScore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(text: Column, model: DsirModel): Column =
    CatalystBridge.column(DsirScore(CatalystBridge.expression(text), model))
}
