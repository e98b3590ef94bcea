package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension affine int8 quantization model: code_d =
  * round((x_d − min_d) / ((max_d − min_d) / 255)), constant dims → 0.
  * The arithmetic shape is fixed (same expression the DuckDB oracle
  * replays over exact per-dim min/max), so codes are deterministic
  * integers on any engine.
  */
final class QuantModel(val mins: Array[Double], val maxs: Array[Double])
  extends Serializable {

  require(mins.length == maxs.length)

  def quantize(vec: ArrayData): ArrayData = {
    val d = mins.length
    require(vec.numElements() == d,
      s"embedding has ${vec.numElements()} dims, model has $d")
    val out = new Array[Any](d)
    var i = 0
    while (i < d) {
      // a silent getFloat on a null slot would read 0.0 and emit an
      // out-of-range code — reject loudly instead
      require(!vec.isNullAt(i), s"null embedding element at dim $i")
      val x = vec.getFloat(i).toDouble
      val mn = mins(i)
      val mx = maxs(i)
      out(i) =
        if (mx == mn) 0
        else {
          val q = (x - mn) / ((mx - mn) / 255.0)
          (if (q >= 0) Math.round(q) else -Math.round(-q)).toInt
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** x̂_d = min_d + code_d · scale_d — the reconstruction the asymmetric
    * search path scores against.
    */
  def dequantize(codes: ArrayData): ArrayData = {
    val d = mins.length
    require(codes.numElements() == d,
      s"code vector has ${codes.numElements()} dims, model has $d")
    val out = new Array[Any](d)
    var i = 0
    while (i < d) {
      require(!codes.isNullAt(i), s"null code element at dim $i")
      out(i) = mins(i) + codes.getInt(i) * ((maxs(i) - mins(i)) / 255.0)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `dequantize_vec(codes)`: int8 codes back to array<double> against the
  * broadcast model — the read half of the quantized index.
  */
final case class DequantizeVec(child: Expression, model: QuantModel)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dequantize_vec expects array<int>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    model.dequantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("quantModel", model, classOf[QuantModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $modelRef.dequantize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DequantizeVec =
    copy(child = newChild)

  override def prettyName: String = "dequantize_vec"
}

object DequantizeVec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(codes: Column, model: QuantModel): Column =
    CatalystBridge.column(DequantizeVec(CatalystBridge.expression(codes), model))
}

/** `quantize_vec(embedding)`: scalar int8 quantization of a float
  * embedding against broadcast per-dimension bounds — ONE narrow map,
  * no explode, no shuffle; the 4× (float→int8-range) compression step
  * a 100 TB embedding store runs before indexing.
  */
final case class QuantizeVec(child: Expression, model: QuantModel)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec expects array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    model.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("quantModel", model, classOf[QuantModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $modelRef.quantize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)

  override def prettyName: String = "quantize_vec"
}

object QuantizeVec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(vec: Column, model: QuantModel): Column =
    CatalystBridge.column(QuantizeVec(CatalystBridge.expression(vec), model))
}
