package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Ts

/** Expression AST mirroring the reference's `OperationType` enum
  * (reference: cpp/arcticdb/processing/operation_types.hpp:75-109) and the
  * Python-side AST builder (python/arcticdb/version_store/processing.py:64-285).
  *
  * The reference evaluates these column-at-a-time with hand-written
  * type-dispatched kernels; here each node compiles to a Catalyst `Column`
  * expression so whole-stage codegen does the vectorization.
  *
  * Type promotion follows the reference's rules
  * (operation_types.hpp:209-354), adapted to Spark's signed-only types:
  *   - div -> always double
  *   - int (+,-,*) int -> widen one step past the wider operand, capped at
  *     64-bit (u8+u8→u16 ... in the reference; Byte+Byte→Short here)
  *   - mixed int/float -> double; float32 op float32 -> float32
  *   - pow -> double (the reference promotes ^signed to double;
  *     we unify — documented deviation for unsigned bases)
  */
sealed trait Expr {
  import Expr._

  // --- builder sugar (mirrors QueryBuilder's Python operators) ---
  def +(o: Expr): Expr = Binary(BinOp.Add, this, o)
  def -(o: Expr): Expr = Binary(BinOp.Sub, this, o)
  def *(o: Expr): Expr = Binary(BinOp.Mul, this, o)
  def /(o: Expr): Expr = Binary(BinOp.Div, this, o)
  def pow(o: Expr): Expr = Binary(BinOp.Pow, this, o)
  def ===(o: Expr): Expr = Binary(BinOp.Eq, this, o)
  def =!=(o: Expr): Expr = Binary(BinOp.Ne, this, o)
  def <(o: Expr): Expr = Binary(BinOp.Lt, this, o)
  def <=(o: Expr): Expr = Binary(BinOp.Le, this, o)
  def >(o: Expr): Expr = Binary(BinOp.Gt, this, o)
  def >=(o: Expr): Expr = Binary(BinOp.Ge, this, o)
  def &&(o: Expr): Expr = Binary(BinOp.And, this, o)
  def ||(o: Expr): Expr = Binary(BinOp.Or, this, o)
  def ^(o: Expr): Expr = Binary(BinOp.Xor, this, o)
  def unary_! : Expr = Unary(UnOp.Not, this)
  def unary_- : Expr = Unary(UnOp.Neg, this)
  def abs: Expr = Unary(UnOp.Abs, this)
  def isNull: Expr = Unary(UnOp.IsNull, this)
  def notNull: Expr = Unary(UnOp.NotNull, this)
  def isin(vs: Any*): Expr = IsIn(this, vs, negate = false)
  def isNotIn(vs: Any*): Expr = IsIn(this, vs, negate = true)
  def regexMatch(pattern: String): Expr = RegexMatch(this, pattern)
}

object Expr {
  final case class Col(name: String) extends Expr
  final case class Lit(v: Any) extends Expr
  final case class Unary(op: UnOp.Value, child: Expr) extends Expr
  final case class Binary(op: BinOp.Value, left: Expr, right: Expr) extends Expr
  /** where(cond, a, b) — reference TERNARY (operation_dispatch_ternary.cpp). */
  final case class Ternary(cond: Expr, ifTrue: Expr, ifFalse: Expr) extends Expr
  final case class IsIn(child: Expr, values: Seq[Any], negate: Boolean) extends Expr
  /** re2 partial match in the reference (util/regex_filter.hpp) -> rlike. */
  final case class RegexMatch(child: Expr, pattern: String) extends Expr

  object UnOp extends Enumeration { val Abs, Neg, Not, IsNull, NotNull = Value }
  object BinOp extends Enumeration {
    val Add, Sub, Mul, Div, Pow, Eq, Ne, Lt, Le, Gt, Ge, And, Or, Xor = Value
  }

  def col(name: String): Expr = Col(name)
  def lit(v: Any): Expr = Lit(v)
  def where(cond: Expr, a: Expr, b: Expr): Expr = Ternary(cond, a, b)

  // ---------------------------------------------------------------- typing

  /** The uint64 carrier: Spark has no unsigned integers (and parquet
    * UINT64 is read as DECIMAL(20,0)), so uint64 columns ride in
    * Decimal(20,0) holding the TRUE mathematical value. That makes
    * mixed int64/uint64 comparison exact for free — Spark widens the
    * long side to Decimal(20,0) losslessly and compares values — which
    * is precisely the reference's rule set (reference:
    * cpp/arcticdb/processing/signed_unsigned_comparison.hpp: an msb-set
    * uint64 is greater than every int64, otherwise compare as signed;
    * i.e. compare true values). BigDecimal literals type as Uint64 so
    * `col("u") > lit(BigDecimal(...))` round-trips. Cross-sign
    * ARITHMETIC stays rejected (no common type) — the reference
    * special-cases it only inside set membership.
    */
  val Uint64: DataType = DecimalType(20, 0)

  private def isUint64(t: DataType): Boolean = t == Uint64

  private val intRank: Map[DataType, Int] =
    Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
  private val rankInt: Map[Int, DataType] =
    Map(1 -> ByteType, 2 -> ShortType, 3 -> IntegerType, 4 -> LongType)

  private def isIntegral(t: DataType): Boolean = intRank.contains(t)
  private def isFloating(t: DataType): Boolean = t == FloatType || t == DoubleType
  private def isNumeric(t: DataType): Boolean = isIntegral(t) || isFloating(t)

  /** Result type of int (+,-,*) per the reference's overflow-avoiding
    * widening (operation_types.hpp:209-308): one step wider than the wider
    * operand, capped at 64-bit.
    */
  private def widenInt(a: DataType, b: DataType): DataType =
    rankInt(math.min(4, math.max(intRank(a), intRank(b)) + 1))

  def arithmeticResultType(op: BinOp.Value, l: DataType, r: DataType): DataType = {
    if (isUint64(l) || isUint64(r))
      // uint64 participates in COMPARISONS (exact, see Uint64) but not in
      // the arithmetic lattice: there is no signed type wide enough, and
      // silently doubling would lose ulps above 2^53.
      throw new IllegalArgumentException(
        s"uint64 (Decimal(20,0)) does not combine arithmetically with $l/$r; " +
          "comparisons and isin are exact — cast explicitly for arithmetic")
    if (!isNumeric(l) || !isNumeric(r))
      // the reference raises for non-numeric arithmetic operands
      // (test_df_query_wrong_type: col + "1" is a UserInputException);
      // falling through would CAST a string to double and silently
      // numeric-parse it
      throw new IllegalArgumentException(
        s"non-numeric operand for arithmetic $op: $l vs $r")
    op match {
      case BinOp.Div | BinOp.Pow => DoubleType
      case _ =>
        if (isIntegral(l) && isIntegral(r)) widenInt(l, r)
        else if (l == FloatType && r == FloatType) FloatType
        else DoubleType
    }
  }

  /** Comparison family of a type: the reference rejects cross-family
    * comparisons and membership loudly (test_filter_bool_nonbool_comparison,
    * test_df_query_wrong_type: bool vs numeric, numeric vs string, ... are
    * UserInputExceptions, never coercions). Timestamp-vs-integral-ns-
    * literal is the one sanctioned crossing, rewritten exactly BEFORE this
    * check (tsVsNsLit).
    */
  private def cmpFamily(t: DataType): String = t match {
    case BooleanType => "bool"
    case StringType => "string"
    case TimestampType | TimestampNTZType | DateType => "time"
    case NullType => "null"
    case tt if isNumeric(tt) || isUint64(tt) => "numeric"
    case _ => "other"
  }

  private def familyOf(v: Any): String = v match {
    case null => "null"
    case _: Boolean => "bool"
    case _: String => "string"
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double => "numeric"
    case _: BigDecimal | _: java.math.BigDecimal => "numeric"
    case _: java.time.LocalDateTime | _: java.sql.Timestamp | _: java.time.Instant |
        _: java.time.LocalDate | _: java.sql.Date => "time"
    case _ => "other"
  }

  /** Common type for dynamic-schema concat/append — the port of the
    * reference's `has_valid_common_type` lattice
    * (cpp/arcticdb/entity/type_utils.hpp:17-43): int widens to the wider
    * int, int+float → double, float+float → wider float; no
    * string/numeric mixing.
    */
  def commonType(a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    // Dim1 array cells promote ELEMENT-wise like their scalar types
    // (reference: has_valid_common_type recurses into the dimension,
    // type_utils.hpp:17-43); array vs scalar stays a loud error — the
    // reference refuses to mix scalars and arrays in one column
    // (test_array_column_type.py::TestFailure).
    case (ArrayType(ae, an), ArrayType(be, bn)) =>
      ArrayType(commonType(ae, be), an || bn)
    case _ if isIntegral(a) && isIntegral(b) =>
      rankInt(math.max(intRank(a), intRank(b)))
    case _ if a == FloatType && b == FloatType => FloatType
    case _ if isNumeric(a) && isNumeric(b) => DoubleType
    case (NullType, _) => b
    case (_, NullType) => a
    case _ => throw new IllegalArgumentException(s"no common type for $a vs $b")
  }

  /** Infer the Spark type an expression evaluates to against a schema. */
  def inferType(e: Expr, schema: StructType): DataType = e match {
    case Col(n) =>
      schema.fields.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"unknown column $n"))
        .dataType
    case Lit(v) =>
      v match {
        case _: Int => IntegerType
        case _: Long => LongType
        case _: Double => DoubleType
        case _: Float => FloatType
        case _: Boolean => BooleanType
        case _: String => StringType
        case _: Short => ShortType
        case _: Byte => ByteType
        case _: java.math.BigDecimal | _: BigDecimal => Uint64
        case null => NullType
        case other => throw new IllegalArgumentException(s"unsupported literal $other")
      }
    case Unary(UnOp.Abs | UnOp.Neg, c) => inferType(c, schema)
    case Unary(_, _) => BooleanType
    case Binary(op, l, r)
        if op == BinOp.Add || op == BinOp.Sub || op == BinOp.Mul ||
          op == BinOp.Div || op == BinOp.Pow =>
      arithmeticResultType(op, inferType(l, schema), inferType(r, schema))
    case Binary(_, _, _) => BooleanType
    case Ternary(_, a, b) =>
      val (ta, tb) = (inferType(a, schema), inferType(b, schema))
      if (ta == tb) ta
      else if (isIntegral(ta) && isIntegral(tb)) rankInt(math.max(intRank(ta), intRank(tb)))
      else if (isNumeric(ta) && isNumeric(tb)) DoubleType
      else if (ta == NullType) tb
      else if (tb == NullType) ta
      else throw new IllegalArgumentException(s"ternary branches of $ta vs $tb")
    case IsIn(_, _, _) => BooleanType
    case RegexMatch(_, _) => BooleanType
  }

  // ------------------------------------------------------------- compiling

  /** Compile to a Catalyst Column against a concrete schema.
    *
    * Null semantics follow the reference / pandas: for floating columns,
    * NaN ≡ null in isnull/notnull (operation_types.hpp:377-406).
    */
  def compile(e: Expr, schema: StructType): Column = e match {
    case Col(n) => org.apache.spark.sql.functions.col(n)
    case Lit(null) => org.apache.spark.sql.functions.lit(null)
    case Lit(v) => org.apache.spark.sql.functions.lit(v)

    case Unary(UnOp.Abs, c) => org.apache.spark.sql.functions.abs(compile(c, schema))
    case Unary(UnOp.Neg, c) => negate(compile(c, schema))
    case Unary(UnOp.Not, c) => !compile(c, schema)
    case Unary(UnOp.IsNull, c) =>
      val cc = compile(c, schema)
      if (isFloating(inferType(c, schema))) cc.isNull || isnan(cc) else cc.isNull
    case Unary(UnOp.NotNull, c) =>
      val cc = compile(c, schema)
      if (isFloating(inferType(c, schema))) cc.isNotNull && !isnan(cc) else cc.isNotNull

    case Binary(op, l, r)
        if op == BinOp.Add || op == BinOp.Sub || op == BinOp.Mul ||
          op == BinOp.Div || op == BinOp.Pow =>
      val target = arithmeticResultType(op, inferType(l, schema), inferType(r, schema))
      val lc = compile(l, schema).cast(target)
      val rc = compile(r, schema).cast(target)
      op match {
        case BinOp.Add => lc + rc
        case BinOp.Sub => lc - rc
        case BinOp.Mul => lc * rc
        case BinOp.Div => lc / rc
        case BinOp.Pow => org.apache.spark.sql.functions.pow(lc, rc)
        case _ => throw new IllegalStateException
      }

    case Binary(op, l, r) =>
      // Timestamp column vs integer literal: the reference compares its
      // NANOSECONDS_UTC64 index against raw ints (processing.py accepts
      // both pd.Timestamp and int ns). Rewrite to an exact µs-domain
      // predicate with a foldable timestamp literal (Ts.cmpNs) so the
      // filter still pushes into the parquet scan.
      val cmpName = Map(BinOp.Eq -> "==", BinOp.Ne -> "!=", BinOp.Lt -> "<",
        BinOp.Le -> "<=", BinOp.Gt -> ">", BinOp.Ge -> ">=")
      val flipped = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=",
        "==" -> "==", "!=" -> "!=")
      (cmpName.get(op), tsVsNsLit(l, r, schema)) match {
        case (Some(o), Some((tsC, tsT, ns, tsOnLeft))) =>
          // Pandas missing-value comparison semantics (the reference's own
          // tests pin expected = pandas, test_query_builder_nat.py): a NaT
          // row fails ==/</<=/>/>= but SATISFIES != . Spark would
          // null-propagate (dropping NaT rows from != too), so wrap: the
          // base predicate still pushes to the scan as a conjunct.
          val base = Ts.cmpNs(compile(tsC, schema), tsT, if (tsOnLeft) o else flipped(o), ns)
          val tsNull = compile(tsC, schema).isNull
          if (op == BinOp.Ne) base || tsNull else base && !tsNull
        case (Some(_), None)
            if isTsVsNumeric(l, r, schema) =>
          // A numeric NON-literal against a timestamp would fall through to
          // Spark's cast, which coerces the numeric as SECONDS — silently
          // 1e9 off from the reference's ns semantics. Refuse instead of
          // being quietly wrong (fold literal arithmetic yourself, or
          // compare against a Lit ns value, which rewrites exactly above).
          throw new IllegalArgumentException(
            s"cannot compare a timestamp expression to a non-literal numeric " +
              s"expression ($l vs $r): the engine's integer-vs-timestamp " +
              "semantics are NANOSECONDS, but Spark would coerce as seconds; " +
              "use an integer ns literal or a timestamp-typed expression")
        case _ =>
          val lc = compile(l, schema)
          val rc = compile(r, schema)
          op match {
            case BinOp.Eq | BinOp.Ne | BinOp.Lt | BinOp.Le | BinOp.Gt | BinOp.Ge =>
              val (lf, rf) =
                (cmpFamily(inferType(l, schema)), cmpFamily(inferType(r, schema)))
              if (lf != "null" && rf != "null" && lf != rf)
                throw new IllegalArgumentException(
                  s"cannot compare ${inferType(l, schema)} to ${inferType(r, schema)}: " +
                    "cross-family comparisons are rejected (reference " +
                    "UserInputException semantics), not coerced")
              // Pandas/IEEE missing-value semantics (reference kernels are
              // C++ IEEE; its tests pin expected = pandas,
              // test_query_builder_nat.py): a missing operand (null, NaN,
              // NaT) makes ==/</<=/>/>= FALSE and != TRUE — never null.
              // Spark alone diverges twice: null comparisons propagate
              // null (dropping rows from != filters that pandas keeps),
              // and NaN sorts ABOVE every double (5.0 < NaN is true in
              // Spark, false in IEEE). The conjunct/disjunct form keeps
              // the raw predicate pushable to the scan, and with missing
              // rows peeled off, Spark's residual comparisons ARE IEEE.
              def miss(c: Column, t: DataType): Column =
                if (isFloating(t)) c.isNull || isnan(c) else c.isNull
              val anyMissing =
                miss(lc, inferType(l, schema)) || miss(rc, inferType(r, schema))
              val raw = op match {
                case BinOp.Eq => lc === rc
                case BinOp.Ne => lc =!= rc
                case BinOp.Lt => lc < rc
                case BinOp.Le => lc <= rc
                case BinOp.Gt => lc > rc
                case BinOp.Ge => lc >= rc
                case _ => throw new IllegalStateException
              }
              if (op == BinOp.Ne) raw || anyMissing else raw && !anyMissing
            case BinOp.And => lc && rc
            case BinOp.Or => lc || rc
            case BinOp.Xor => lc =!= rc // boolean xor
            case _ => throw new IllegalStateException
          }
      }

    case Ternary(cond, a, b) =>
      when(compile(cond, schema), compile(a, schema)).otherwise(compile(b, schema))

    case IsIn(c, vs, neg) =>
      // Small sets: codegen'd isin. At scale a huge value set should become
      // a broadcast semi/anti join instead — see QueryBuilder.isinLarge.
      // Missing semantics match the reference exactly (its
      // test_filter_isin_with_nan_in_set / _nat_in_set pin this,
      // deliberately diverging from pandas): a missing ROW (null/NaN) is
      // in NO set — isin → false, isnotin → TRUE — and missing VALUES in
      // the set are IGNORED (isin([NaN, 3.0]) matches only 3.0). The set
      // is cleaned at compile time: a null/NaN member left in place would
      // null-propagate through Spark's IN and silently drop non-missing
      // rows from isnotin.
      val cc = compile(c, schema)
      val missing =
        if (isFloating(inferType(c, schema))) cc.isNull || isnan(cc) else cc.isNull
      val clean = vs.filterNot {
        case null => true
        case d: Double => d.isNaN
        case f: Float => f.isNaN
        case _ => false
      }
      // membership is family-checked like comparisons (reference:
      // "Cannot check membership 'IS IN' of col1 (type=INT) in set of
      // (type=STRING)" is a UserInputException, not a coercion)
      val colFam = cmpFamily(inferType(c, schema))
      clean.foreach { v =>
        val vf = familyOf(v)
        if (colFam != "other" && vf != colFam)
          throw new IllegalArgumentException(
            s"cannot check membership of $colFam column in a set containing " +
              s"$vf value $v (reference UserInputException semantics)")
      }
      val base =
        if (clean.isEmpty) org.apache.spark.sql.functions.lit(false)
        else cc.isin(clean: _*)
      if (neg) !base || missing else base && !missing

    case RegexMatch(c, p) => compile(c, schema).rlike(p)
  }

  def compile(e: Expr, df: DataFrame): Column = compile(e, df.schema)

  /** Detect `<timestamp expr> cmp <integral ns literal>` (either side):
    * returns (tsExpr, tsType, nsValue, tsOnLeft).
    */
  private def tsVsNsLit(
      l: Expr, r: Expr, schema: StructType): Option[(Expr, DataType, Long, Boolean)] = {
    def nsOf(e: Expr): Option[Long] = e match {
      case Lit(v: Long) => Some(v)
      case Lit(v: Int) => Some(v.toLong)
      case Lit(v: Short) => Some(v.toLong)
      case Lit(v: Byte) => Some(v.toLong)
      case _ => None
    }
    def tsOf(e: Expr): Option[DataType] =
      inferType(e, schema) match {
        case t @ (TimestampType | TimestampNTZType) => Some(t)
        case _ => None
      }
    (tsOf(l), nsOf(r), tsOf(r), nsOf(l)) match {
      case (Some(t), Some(ns), _, _) => Some((l, t, ns, true))
      case (_, _, Some(t), Some(ns)) => Some((r, t, ns, false))
      case _ => None
    }
  }

  /** One side timestamp-typed, the other numeric (and, given tsVsNsLit
    * already failed, not a rewritable bare integral literal).
    */
  private def isTsVsNumeric(l: Expr, r: Expr, schema: StructType): Boolean = {
    def isTs(e: Expr) = inferType(e, schema) match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    def isNum(e: Expr) = inferType(e, schema) match {
      case _: NumericType => true
      case _ => false
    }
    (isTs(l) && isNum(r)) || (isNum(l) && isTs(r))
  }
}
