package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `adc_score(codes, table)` → long: the asymmetric-distance sum of
  * product quantization, Σ_s table[s·ksub + codes[s]], as ONE codegen'd
  * expression.
  *
  * Why this exists: the Column formulation — posexplode(codes) → join
  * the (sub, code, qd) table → groupBy (query, corpus) sum — inflates
  * every corpus row m× before a keyed re-aggregate. This kernel does m
  * flat-array lookups per row inside whole-stage codegen: no explode,
  * no join on the code value, no re-aggregate — the scored rows feed
  * the partial top-k directly. The summed values are the identical
  * µ-long distances, so gate hashes are unchanged by construction.
  */
final case class AdcScore(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_score expects (array<int>, array<long>), got $other")
    }

  override def nullSafeEval(codes: Any, table: Any): Any =
    AdcScore.compute(codes.asInstanceOf[ArrayData],
      table.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"${ev.value} = graft.plans.AdcScore.compute($c, $t, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_score"
}

object AdcScore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** Σ_s table[s·ksub + codes[s]] with loud bounds checks — a silently
    * clamped out-of-range code would mis-rank without an error.
    */
  def compute(codes: ArrayData, table: ArrayData, ksub: Int): Long = {
    val m = codes.numElements()
    require(table.numElements() == m.toLong * ksub,
      s"ADC table has ${table.numElements()} entries, expected $m x $ksub")
    var acc = 0L
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      require(c >= 0 && c < ksub, s"code $c at sub $s outside [0, $ksub)")
      acc += table.getLong(s * ksub + c)
      s += 1
    }
    acc
  }

  def apply(codes: Column, table: Column, ksub: Int): Column =
    CatalystBridge.column(AdcScore(
      CatalystBridge.expression(codes), CatalystBridge.expression(table), ksub))
}
