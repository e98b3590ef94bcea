package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Semantic no-op that BLOCKS filter pushdown through its projection.
  *
  * `PushPredicateThroughNonJoin` pushes any deterministic filter through
  * a Project by SUBSTITUTING the aliased expressions into the predicate.
  * For cheap aliases that is pure win (predicates reach the scan); for a
  * projection of expensive fused kernels it is a disaster: the filter
  * context has NO subexpression elimination (unlike Project), so a
  * predicate over a 15-marker langid CASE re-evaluates the marker_counts
  * kernel once per textual reference — measured 198 kernel occurrences
  * in the pushed q92 plan, ~4× the intended per-row text work.
  *
  * Wrapping ONE projected column makes the Project fail the rule's
  * `fields.forall(_.deterministic)` gate, so filters stay ABOVE the
  * projection and read its (CSE-shared, once-per-row) column outputs.
  * The expression itself evaluates its child unchanged — determinism is
  * under-declared, never violated, so a re-run still produces identical
  * results and the fence is safe under task retries.
  *
  * Trade-off, stated for the 100 TB design review: the fence also stops
  * the SAME predicates from reaching the parquet scan as data filters.
  * That is the correct trade exactly when every predicate references
  * compute-heavy derived columns (nothing to prune on) — which is the
  * only place this is used (Clean.cleanCorpus rule filters, PII density
  * totals).
  */
final case class OptimizerFence(child: Expression,
    forceNullable: Boolean = false) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  // forceNullable over-declares nullability (never violated — the value
  // passes through unchanged): count(fence(x)) over a non-null x would
  // otherwise be rewritten to count(1) by NullPropagation, pruning the
  // very column reference the fence exists to pin (Retrieval.topKeywords
  // shares the tf exchange through exactly that reference).
  override def nullable: Boolean = forceNullable || child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)

  override def prettyName: String = "optimizer_fence"
}

object OptimizerFence {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  def apply(c: Column): Column =
    CatalystBridge.column(OptimizerFence(CatalystBridge.expression(c)))

  /** Fence whose output is DECLARED nullable even over a non-null child
    * — for pinning a column reference inside `count(...)`, which
    * NullPropagation would otherwise rewrite to count(1).
    */
  def nullable(c: Column): Column =
    CatalystBridge.column(
      OptimizerFence(CatalystBridge.expression(c), forceNullable = true))
}
