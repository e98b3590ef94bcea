package graft.core

import org.apache.spark.sql.types._

import graft.query.Expr
import graft.query.Expr._

/** Three-valued per-file predicate analysis over min/max column stats —
  * the Spark-native port of the reference's column-stats filter, which
  * evaluates the full filter AST in Kleene logic against the stats segment
  * (reference: cpp/arcticdb/pipeline/column_stats_filter.cpp;
  * operation_types.hpp:25-72 StatsComparison).
  *
  * A file may be skipped iff the predicate can NEVER evaluate to true for
  * any of its rows. Each subexpression is abstracted to the pair
  * (canBeTrue, canBeFalse) over the file's rows. Comparisons follow the
  * engine's pandas missing-value semantics (Expr.compile): a missing row
  * yields FALSE for ==/</<=/>/>=/isin and TRUE for !=/isnotin — never
  * null. min/max stats bound only non-missing values and the sidecar has
  * no null counts, so every comparison leaf keeps canBeFalse = true (a
  * missing row may fail it) and Ne keeps canBeTrue = true (a missing row
  * satisfies it). NOT swaps the pair; AND/OR compose possibilities
  * conservatively (no row-alignment assumption is needed for soundness:
  * pruning only ever fires on IMpossibility, and AND is impossible
  * whenever either side is).
  *
  * Leaves the stats cannot bound — isnull (no null counts in the sidecar),
  * regex, ternary, arithmetic — evaluate to fully-unknown, which keeps the
  * file. Adding a predicate form here can only improve pruning, never
  * correctness.
  */
object StatsPruner {

  /** May some row evaluate to true / to false. */
  final case class Tri(canBeTrue: Boolean, canBeFalse: Boolean)
  private val Unknown = Tri(canBeTrue = true, canBeFalse = true)

  /** `stats`: column → (min, max) as rendered by the stats sidecar
    * (decimal text for numeric columns, raw text for strings — the same
    * convention Library.readColumnFooterStats writes).
    */
  def keepFile(
      e: Expr,
      stats: Map[String, (String, String)],
      schema: StructType): Boolean =
    eval(e, stats, schema).canBeTrue

  /** Column types whose stats the pruner may compare against an Expr
    * literal. Timestamp/date columns are deliberately EXCLUDED (unlike the
    * harvest's numericStats): their footer stats render in raw storage
    * units (µs / days) while Spark coerces a numeric literal compared to a
    * TimestampType column as SECONDS — the two disagree by 1e6 and the
    * pruner would drop files whose rows the residual filter matches.
    * Unknown ⇒ keep, always sound.
    */
  private def numeric(t: DataType): Boolean = t match {
    case _: DecimalType => false // excluded at harvest — never has stats
    case TimestampType | TimestampNTZType | DateType => false
    case _: NumericType => true
    case _ => false
  }

  private def comparable(t: DataType): Boolean = numeric(t) || t == StringType

  private val CmpOps: Set[BinOp.Value] =
    Set(BinOp.Eq, BinOp.Ne, BinOp.Lt, BinOp.Le, BinOp.Gt, BinOp.Ge)

  private def flip(op: BinOp.Value): BinOp.Value = op match {
    case BinOp.Lt => BinOp.Gt
    case BinOp.Le => BinOp.Ge
    case BinOp.Gt => BinOp.Lt
    case BinOp.Ge => BinOp.Le
    case other => other // Eq/Ne symmetric
  }

  private def eval(
      e: Expr,
      stats: Map[String, (String, String)],
      schema: StructType): Tri = e match {
    case Binary(BinOp.And, a, b) =>
      val (x, y) = (eval(a, stats, schema), eval(b, stats, schema))
      Tri(x.canBeTrue && y.canBeTrue, x.canBeFalse || y.canBeFalse)
    case Binary(BinOp.Or, a, b) =>
      val (x, y) = (eval(a, stats, schema), eval(b, stats, schema))
      Tri(x.canBeTrue || y.canBeTrue, x.canBeFalse && y.canBeFalse)
    case Unary(UnOp.Not, a) =>
      val x = eval(a, stats, schema)
      Tri(x.canBeFalse, x.canBeTrue)
    case Binary(op, Col(n), Lit(v)) if CmpOps(op) => cmp(op, n, v, stats, schema)
    case Binary(op, Lit(v), Col(n)) if CmpOps(op) => cmp(flip(op), n, v, stats, schema)
    case IsIn(Col(n), vs, negate) =>
      val base = isin(n, vs, stats, schema)
      if (negate) Tri(base.canBeFalse, base.canBeTrue) else base
    case _ => Unknown
  }

  /** Bounds of column `n` in a comparison-ready domain: Left = BigDecimal
    * for numeric columns, Right = String lexicographic. None when the file
    * has no usable stats for the column (⇒ unknown).
    */
  private def bounds(
      n: String,
      stats: Map[String, (String, String)],
      schema: StructType): Option[Either[(BigDecimal, BigDecimal), (String, String)]] =
    for {
      field <- schema.fields.find(_.name == n)
      if comparable(field.dataType)
      (mn, mx) <- stats.get(n)
      b <- if (numeric(field.dataType))
        scala.util.Try((BigDecimal(mn), BigDecimal(mx))).toOption.map(Left(_))
      else Some(Right((mn, mx)))
    } yield b

  private def litNum(v: Any): Option[BigDecimal] =
    scala.util.Try(BigDecimal(v.toString)).toOption.filter(_ => v != null)

  private def cmp(
      op: BinOp.Value,
      n: String,
      v: Any,
      stats: Map[String, (String, String)],
      schema: StructType): Tri =
    bounds(n, stats, schema) match {
      case None => Unknown
      case Some(Left((mn, mx))) =>
        litNum(v) match {
          case None => Unknown
          case Some(x) => rangeCmp(op, mn, mx, x)
        }
      case Some(Right((mn, mx))) =>
        if (v == null) Unknown
        else {
          // UTF-8 byte order, matching the harvest's combine and Spark's
          // own string comparison — Java's UTF-16 Ordering.String disagrees
          // above the BMP and would prune files with matching rows
          val x = v.toString
          rangeCmpOrd(op, mn, mx, x)(Library.strOrdering)
        }
    }

  private def rangeCmp(op: BinOp.Value, mn: BigDecimal, mx: BigDecimal, x: BigDecimal): Tri =
    rangeCmpOrd(op, mn, mx, x)(Ordering.BigDecimal)

  /** canBeTrue: some value in [mn,mx] satisfies (col op x);
    * canBeFalse: some value in [mn,mx] fails it.
    *
    * min/max stats describe only NON-MISSING values, and under the
    * engine's pandas comparison semantics a missing row (null/NaN) fails
    * ==/</<=/>/>= but SATISFIES != . The stats carry no null counts, so
    * every file may hold missing rows: != can therefore never rule a
    * file out (canBeTrue stays true), and the ordered/equality ops can
    * always be false on some row (canBeFalse stays true).
    * This costs completeness only on Ne and NOT(...) shapes; the
    * load-bearing prunes (ranges, equality) keep their power.
    */
  private def rangeCmpOrd[A](op: BinOp.Value, mn: A, mx: A, x: A)(
      implicit ord: Ordering[A]): Tri = {
    import ord._
    op match {
      case BinOp.Lt => Tri(mn < x, canBeFalse = true)
      case BinOp.Le => Tri(mn <= x, canBeFalse = true)
      case BinOp.Gt => Tri(mx > x, canBeFalse = true)
      case BinOp.Ge => Tri(mx >= x, canBeFalse = true)
      case BinOp.Eq => Tri(mn <= x && x <= mx, canBeFalse = true)
      case BinOp.Ne => Tri(canBeTrue = true, mn <= x && x <= mx)
      case _ => Unknown
    }
  }

  private def isin(
      n: String,
      vs: Seq[Any],
      stats: Map[String, (String, String)],
      schema: StructType): Tri =
    bounds(n, stats, schema) match {
      case None => Unknown
      case Some(Left((mn, mx))) =>
        val xs = vs.map(litNum)
        if (xs.exists(_.isEmpty)) Unknown // unparseable member — cannot bound
        else {
          val in = xs.flatten
          // canBeFalse is unconditionally true: a missing row fails isin
          // under pandas semantics, and the sidecar has no null counts
          // (negate swaps the pair, so this also keeps isnotin sound)
          Tri(
            canBeTrue = in.exists(x => mn <= x && x <= mx),
            canBeFalse = true)
        }
      case Some(Right((mn, mx))) =>
        if (vs.contains(null)) Unknown
        else {
          val in = vs.map(_.toString)
          Tri(
            canBeTrue = in.exists(x =>
              Library.strCmp(mn, x) <= 0 && Library.strCmp(x, mx) <= 0),
            canBeFalse = true)
        }
    }
}
