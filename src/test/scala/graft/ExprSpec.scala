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

  test("pandas missing semantics: NaT comparisons (reference test_query_builder_nat.py)") {
    // pandas (= the reference's pinned expectation): NaT fails every
    // ordered/equality comparison but SATISFIES != — Spark's bare null
    // propagation would drop NaT rows from != filters too.
    val df = Seq(
      (1L, Some(java.time.LocalDateTime.of(2020, 1, 1, 0, 0))),
      (2L, None),
      (3L, Some(java.time.LocalDateTime.of(2025, 1, 1, 0, 0))))
      .toDF("id", "ts")
      .select($"id", $"ts".cast(TimestampNTZType).as("ts"))
    val s = df.schema
    def ids(e: Expr): Seq[Long] =
      df.filter(Expr.compile(e, s)).select("id").as[Long].collect().toSeq.sorted
    val ns2024 = 1704067200L * 1000000000L // 2024-01-01 in ns
    assert(ids(col("ts") > lit(ns2024)) == Seq(3L))
    assert(ids(col("ts") < lit(ns2024)) == Seq(1L))
    assert(ids(lit(ns2024) < col("ts")) == Seq(3L)) // reversed operands
    assert(ids(col("ts") === lit(ns2024)) == Seq())
    // != keeps the NaT row — the divergence this test exists for
    assert(ids(col("ts") =!= lit(ns2024)) == Seq(1L, 2L, 3L))
    // literal NaT (null): == matches nothing, != matches EVERYTHING
    assert(ids(col("ts") === lit(null)) == Seq())
    assert(ids(col("ts") =!= lit(null)) == Seq(1L, 2L, 3L))
  }

  test("pandas missing semantics: NaT col-vs-col and NaN floats (IEEE, not Spark ordering)") {
    // col-vs-col table straight from the reference test: eq keeps only
    // both-present equal rows; ne is its complement INCLUDING NaT rows
    val ts = Seq(
      (1L, Some("2024-01-01"), Some("2024-01-01")),
      (2L, Some("2024-01-02"), None),
      (3L, None, None),
      (4L, None, Some("2024-01-04")),
      (5L, Some("2024-01-05"), Some("2024-01-05")))
      .toDF("id", "a", "b")
      .select($"id", $"a".cast(TimestampNTZType).as("a"), $"b".cast(TimestampNTZType).as("b"))
    def tids(e: Expr): Seq[Long] =
      ts.filter(Expr.compile(e, ts.schema)).select("id").as[Long].collect().toSeq.sorted
    assert(tids(col("a") === col("b")) == Seq(1L, 5L))
    assert(tids(col("a") =!= col("b")) == Seq(2L, 3L, 4L))
    // floats: IEEE semantics — Spark alone sorts NaN above every double
    // (5.0 < NaN is true in Spark), pandas/C++ say false
    val fl = Seq((1L, 5.0), (2L, Double.NaN), (3L, 7.0)).toDF("id", "x")
    def fids(e: Expr): Seq[Long] =
      fl.filter(Expr.compile(e, fl.schema)).select("id").as[Long].collect().toSeq.sorted
    assert(fids(col("x") < lit(Double.NaN)) == Seq()) // Spark bare: Seq(1,3)
    assert(fids(col("x") > lit(6.0)) == Seq(3L)) // NaN row excluded
    assert(fids(col("x") === lit(Double.NaN)) == Seq()) // Spark bare: NaN==NaN true
    assert(fids(col("x") =!= lit(5.0)) == Seq(2L, 3L)) // NaN row KEPT
    // isin/isnotin: missing is in no set; isnotin keeps the missing row
    assert(fids(col("x").isin(5.0, 7.0)) == Seq(1L, 3L))
    assert(fids(col("x").isNotIn(5.0)) == Seq(2L, 3L))
    // missing VALUES in the set are ignored (reference
    // test_filter_isin_with_nan_in_set: isin([NaN, 3.0]) matches only
    // 3.0; isnotin([NaN, 3.0]) keeps the other rows INCLUDING NaN) —
    // a raw null member would null-propagate and drop rows
    assert(fids(col("x").isin(Double.NaN, 5.0)) == Seq(1L))
    assert(fids(col("x").isNotIn(Double.NaN, 5.0)) == Seq(2L, 3L))
    val tn = Seq(
      (1L, Some("2024-01-01")), (2L, None), (3L, Some("2024-01-03")))
      .toDF("id", "a").select($"id", $"a".cast(TimestampNTZType).as("a"))
    def nids(e: Expr): Seq[Long] =
      tn.filter(Expr.compile(e, tn.schema)).select("id").as[Long].collect().toSeq.sorted
    val ts3 = 1704240000L * 1000000000L // 2024-01-03 in ns — isin takes raw values
    assert(nids(col("a").isin(null, java.time.LocalDateTime.of(2024, 1, 3, 0, 0))) == Seq(3L))
    assert(nids(col("a").isNotIn(null, java.time.LocalDateTime.of(2024, 1, 3, 0, 0)))
      == Seq(1L, 2L))
    // empty-after-cleaning set: isin matches nothing, isnotin everything
    assert(nids(col("a").isin(null)) == Seq())
    assert(nids(col("a").isNotIn(null)) == Seq(1L, 2L, 3L))
  }

  test("cross-family comparisons and membership are rejected, not coerced") {
    // reference test_filter_bool_nonbool_comparison / test_df_query_wrong_type:
    // bool vs numeric/string, numeric vs string, int-in-string-set, and
    // string arithmetic are all UserInputExceptions there — never coercions
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("n", LongType),
      StructField("s", StringType)))
    def bad(e: Expr): Unit =
      intercept[IllegalArgumentException](Expr.compile(e, schema))
    bad(col("b") === col("n"))
    bad(col("b") === col("s"))
    bad(col("b") === lit(0))
    bad(col("s") === lit(true))
    bad(col("n") === lit(true))
    bad(col("n") < col("s"))
    bad(col("n").isin("2", "3"))
    bad(col("s").isin(1, 2))
    bad(col("n") + lit("1"))
    bad(col("s") / col("n"))
    // same-family still compiles (incl. ns-literal crossing for time)
    Expr.compile(col("n") === lit(3L), schema)
    Expr.compile(col("b") === lit(true), schema)
    Expr.compile(col("s") === lit("x"), schema)
    // null literal compares against anything (pandas: == null is false)
    Expr.compile(col("n") === lit(null), schema)
  }
}
