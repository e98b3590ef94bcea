package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd random-hyperplane LSH signature: bit i of the result is
  * sign(v · planes[i]). One expression computes ALL bits in a single
  * fused loop — the Column-composition alternative evaluates `bits`
  * separate interpreted `aggregate(zip_with(...))` folds per row.
  *
  * `planes` is a plan-time constant (deterministic seeded Gaussian),
  * shipped into generated code as a reference object.
  */
final case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "1..64 hyperplanes")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private def accessor: String = child.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"hyperplane signature expects array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane signature expects array<float|double>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isFloat = accessor == "getFloat"
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val plane = planes(b)
      val n = math.min(a.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = accessor
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      s"""
        long $sig = 0L;
        for (int $b = 0; $b < $planesRef.length; $b++) {
          double[] $plane = $planesRef[$b];
          int $n = java.lang.Math.min($a.numElements(), $plane.length);
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ((double) $a.$get($i)) * $plane[$i];
          }
          if ($dot > 0) $sig |= (1L << $b);
        }
        ${ev.value} = $sig;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_signature"
}

object HyperplaneSignature {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    CatalystBridge.column(
      HyperplaneSignature(CatalystBridge.expression(vec), planes))
}
