package graft

import org.apache.spark.sql.types._

import graft.query.Expr
import graft.query.Expr._

class ExprSpec extends SparkSuite {
  import spark.implicits._

  test("type promotion: int arithmetic widens one step, capped at long") {
    assert(arithmeticResultType(BinOp.Add, ByteType, ByteType) == ShortType)
    assert(arithmeticResultType(BinOp.Add, ShortType, ShortType) == IntegerType)
    assert(arithmeticResultType(BinOp.Mul, IntegerType, IntegerType) == LongType)
    assert(arithmeticResultType(BinOp.Add, LongType, LongType) == LongType)
    assert(arithmeticResultType(BinOp.Add, ByteType, LongType) == LongType)
  }

  test("type promotion: div always double; mixed int/float double") {
    assert(arithmeticResultType(BinOp.Div, IntegerType, IntegerType) == DoubleType)
    assert(arithmeticResultType(BinOp.Add, IntegerType, FloatType) == DoubleType)
    assert(arithmeticResultType(BinOp.Add, FloatType, FloatType) == FloatType)
    assert(arithmeticResultType(BinOp.Add, DoubleType, FloatType) == DoubleType)
  }

  test("common type lattice") {
    assert(commonType(IntegerType, LongType) == LongType)
    assert(commonType(IntegerType, DoubleType) == DoubleType)
    assert(commonType(FloatType, FloatType) == FloatType)
    intercept[IllegalArgumentException](commonType(StringType, LongType))
  }

  test("expression compile: arithmetic, comparison, ternary, isin, regex") {
    val df = Seq((1, 2.0, "ab"), (5, 3.0, "cd"), (10, -4.0, "ae")).toDF("i", "d", "s")
    val out = df
      .withColumn("sum", Expr.compile(col("i") + col("d"), df.schema))
      .withColumn("t", Expr.compile(where(col("i") > lit(4), lit("big"), lit("small")), df.schema))
      .withColumn("in", Expr.compile(col("i").isin(1, 10), df.schema))
      .withColumn("re", Expr.compile(col("s").regexMatch("^a"), df.schema))
      .withColumn("absneg", Expr.compile((-col("d")).abs, df.schema))
      .collect()
      .sortBy(_.getInt(0))
    assert(out(0).getDouble(3) == 3.0)
    assert(out(0).getString(4) == "small" && out(1).getString(4) == "big")
    assert(out(0).getBoolean(5) && !out(1).getBoolean(5) && out(2).getBoolean(5))
    assert(out(0).getBoolean(6) && !out(1).getBoolean(6) && out(2).getBoolean(6))
    assert(out(2).getDouble(7) == 4.0)
  }

  test("int mul widens to avoid overflow (i32*i32 -> long)") {
    val df = Seq(100000, 200000).toDF("i")
    val got = df.select(Expr.compile(Expr.col("i") * Expr.col("i"), df.schema).as("sq"))
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(10000000000L, 40000000000L)))
  }

  test("NaN-aware isnull/notnull on floating columns") {
    val df = Seq(1.0, Double.NaN, 3.0).toDF("d")
    val nNull = df.filter(Expr.compile(Expr.col("d").isNull, df.schema)).count()
    val nOk = df.filter(Expr.compile(Expr.col("d").notNull, df.schema)).count()
    assert(nNull == 1 && nOk == 2)
  }

  test("boolean XOR: true iff operands differ, null-propagating") {
    val df = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("a", "b")
    val got = df.select(Expr.compile(Expr.col("a") ^ Expr.col("b"), df.schema).as("x"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, true, true, false))
    val withNull = Seq((Some(true), None: Option[Boolean])).toDF("a", "b")
    assert(withNull
      .select(Expr.compile(Expr.col("a") ^ Expr.col("b"), withNull.schema))
      .collect()(0).isNullAt(0))
  }

  test("property: widening matches reference lattice over full int domain") {
    val all = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    val rank = Map[DataType, Int](ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    for (a <- all; b <- all; op <- Seq(BinOp.Add, BinOp.Sub, BinOp.Mul)) {
      val r = arithmeticResultType(op, a, b)
      assert(rank(r) == math.min(4, math.max(rank(a), rank(b)) + 1), s"$op($a,$b)")
    }
    for (a <- all; b <- all)
      assert(arithmeticResultType(BinOp.Div, a, b) == DoubleType)
  }
}
