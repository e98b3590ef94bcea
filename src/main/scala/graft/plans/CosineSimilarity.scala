package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity between two float/double array columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), ...)`) evaluates INTERPRETED — one
  * closure dispatch per element per row — and sits in the innermost loop
  * of every ANN scoring join. This expression compiles to a tight scalar
  * loop inside whole-stage codegen.
  *
  * Semantics pinned to the HOF/oracle formulation it replaces:
  * accumulation in ascending index order, denominator
  * `sqrt(na) * sqrt(nb)` (NOT `sqrt(na*nb)` — different ulps), zero
  * denominator → 0.0. Arrays of differing length compare over the shorter
  * prefix.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemAccessor(e: Expression): (String, ArrayData => Int => Double) =
    e.dataType match {
      case ArrayType(FloatType, _) => ("getFloat", a => i => a.getFloat(i).toDouble)
      case ArrayType(DoubleType, _) => ("getDouble", a => i => a.getDouble(i))
      case other => throw new IllegalArgumentException(
        s"cosine expects array<float|double>, got $other")
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (_, accA) = elemAccessor(left)
    val (_, accB) = elemAccessor(right)
    val (ga, gb) = (accA(a), accB(b))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = ga(i); val y = gb(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (getA, _) = elemAccessor(left)
    val (getB, _) = elemAccessor(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.$getA($i);
          double $y = (double) $b.$getB($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(a: Column, b: Column): Column =
    CatalystBridge.column(
      CosineSimilarity(CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
