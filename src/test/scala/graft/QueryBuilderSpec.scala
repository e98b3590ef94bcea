package graft

import org.apache.spark.sql.functions._

import graft.query.{QueryBuilder, Resample}

class QueryBuilderSpec extends SparkSuite {
  import spark.implicits._

  test("flagship entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("groupByAgg drops null and NaN group keys by default (pandas parity)") {
    val df = Seq(
      (Option("a"), 1.0), (None, 2.0), (Option("a"), 3.0), (Option("b"), 4.0))
      .toDF("k", "v")
    val got = QueryBuilder()
      .groupByAgg(Seq("k"), Seq(("s", "v", "sum")))(df)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 4.0, "b" -> 4.0)) // no null group

    val sql = QueryBuilder()
      .groupByAgg(Seq("k"), Seq(("s", "v", "sum")), dropNullKeys = false)(df)
    assert(sql.count() == 3) // SQL semantics keeps the null group

    val fdf = Seq((1.0, 10.0), (Double.NaN, 20.0), (2.0, 30.0)).toDF("fk", "v")
    val fGot = QueryBuilder().groupByAgg(Seq("fk"), Seq(("s", "v", "sum")))(fdf)
    assert(fGot.count() == 2) // NaN key dropped like pandas
  }

  test("isinLarge compiles membership to a broadcast semi/anti join") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val vals = Seq(2L, 4L, 9L).toDF("k")
    val in = QueryBuilder().isinLarge("k", vals)(df)
    assert(in.select("k").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    val notIn = QueryBuilder().isinLarge("k", vals, negate = true)(df)
    assert(notIn.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(in.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("outer concat with typedDefaults backfills 0/NaN/null, not just null") {
    val a = Seq((1L, 1.5, 7)).toDF("id", "v", "n")
    val b = Seq((2L, "x")).toDF("id", "tag")
    val got = QueryBuilder().concat(Seq(b), "outer", typedDefaults = true)(a)
      .orderBy("id").collect()
    assert(got(0).isNullAt(3)) // a row: tag → null (string default)
    assert(got(1).getDouble(1).isNaN) // b row: v → NaN (float default)
    assert(got(1).getInt(2) == 0) // b row: n → 0 (int default)
    // default mode keeps SQL nulls
    val nulls = QueryBuilder().concat(Seq(b), "outer")(a).orderBy("id").collect()
    assert(nulls(1).isNullAt(1) && nulls(1).isNullAt(2))
  }

  test("rowRange negative indices wrap on arbitrary frames") {
    val df = (0 until 10).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    def ks(s: Long, e: Long): Seq[Long] =
      QueryBuilder().rowRange(Seq("k"), s, e)(df)
        .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(ks(-3, 10) == Seq(7L, 8L, 9L))
    assert(ks(-5, -2) == Seq(5L, 6L, 7L))
    assert(ks(2, 5) == Seq(2L, 3L, 4L))
  }

  test("rowRange on an unindexed frame rejects ends beyond the driver bound") {
    // the fallback funnels the retained prefix through one task — it must
    // fail loudly past MaxUnindexedEnd and point at Library.readRowRange
    val df = (0 until 10).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      QueryBuilder().rowRange(Seq("k"), 0, QueryBuilder.MaxUnindexedEnd + 1)(df).collect()
    }
    assert(e.getMessage.contains("readRowRange"))
    // frames carrying _row_id never hit the bound (pushed-down range filter)
    val withId = df.withColumnRenamed("k", graft.core.Library.RowIdCol)
    assert(QueryBuilder()
      .rowRange(Seq(graft.core.Library.RowIdCol), 0, QueryBuilder.MaxUnindexedEnd + 1)(withId)
      .count() == 10)
  }

  test("resample data-derived origins anchor buckets at frame bounds") {
    // 10 points at ns 5000, 6000, ..., 14000; rule 4000ns (max NOT aligned
    // to min + k*rule, so start/end origins really differ)
    val df = (0 until 10).map(i => (5000L + i * 1000L, 1.0)).toDF("ts", "v")
    def labels(o: Resample.Origin): Seq[Long] =
      QueryBuilder()
        .resample("ts", "4000ns", Seq(("n", "v", "count")), origin = o)(df)
        .orderBy("ts").collect().map(_.getLong(0)).toSeq
    // epoch: buckets at multiples of 4000 → first label 4000
    assert(labels(Resample.Epoch).head == 4000L)
    // start: anchored at min=5000
    assert(labels(Resample.Start) == Seq(5000L, 9000L, 13000L))
    // end: buckets walk back from max=14000
    assert(labels(Resample.End) == Seq(2000L, 6000L, 10000L, 14000L))
    // timestamp origin 4500: first bucket [4500, 8500)
    assert(labels(Resample.OriginTimestamp(4500L)).head == 4500L)
  }

  test("sub-µs resample: loud refusal on µs timestamp indexes, green on ns-long") {
    // SURVEY §1.2: the reference index is NANOSECONDS_UTC64; the repo's
    // µs TimestampType carrier cannot represent sub-µs buckets, so any
    // sub-µs rule/offset/origin must REFUSE — a silent truncation would
    // shift labels instead of failing. The same rules gate green on the
    // ns-long index, where sub-µs arithmetic is exact.
    val tsDf = spark.range(6)
      .select(timestamp_micros(col("id") * 1000000L).as("ts"),
        lit(1.0).as("v"))
    val nsDf = (0 until 6).map(i => (i * 1000L + 500L, 1.0)).toDF("ts", "v")
    val aggs = Seq(("n", "v", "count"))
    def run(df: org.apache.spark.sql.DataFrame)(qb: QueryBuilder) = qb(df).collect()
    // refusal table: (rule, offset, origin) with any sub-µs component
    val bad = Seq(
      ("500ns", 0L, Resample.Epoch: Resample.Origin),
      ("1us500ns", 0L, Resample.Epoch),
      ("2us", 500L, Resample.Epoch),
      ("2us", 0L, Resample.OriginTimestamp(1500L)))
    bad.foreach { case (rule, off, orig) =>
      val e = intercept[IllegalArgumentException] {
        run(tsDf)(QueryBuilder().resample("ts", rule, aggs,
          offsetNs = off, origin = orig))
      }
      assert(e.getMessage.contains("µs-aligned"), s"($rule,$off,$orig): $e")
    }
    // µs-aligned rules stay green on the timestamp index
    assert(run(tsDf)(QueryBuilder().resample("ts", "2us", aggs)).nonEmpty)
    // every refused combination is legal on the ns-long index
    bad.foreach { case (rule, off, orig) =>
      assert(run(nsDf)(QueryBuilder().resample("ts", rule, aggs,
        offsetNs = off, origin = orig)).nonEmpty, s"($rule,$off,$orig)")
    }
    // and sub-µs bucketing really buckets: 500ns rule over ns points at
    // x*1000+500 puts each point in its own [500-aligned) bucket
    val lbls = run(nsDf)(QueryBuilder().resample("ts", "500ns", aggs))
      .map(_.getLong(0)).sorted.toSeq
    assert(lbls == (0 until 6).map(i => i * 1000L + 500L))
  }

  test("then/prepend compose pipelines; filter prefixes merge only while intact") {
    import graft.query.Expr.{col => e, lit => l}
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val f = QueryBuilder().filter(e("k") > l(1L))
    val g = QueryBuilder().filter(e("v") < l(30.0))
    val agg = QueryBuilder().groupByAgg(Seq("k"), Seq(("s", "v", "sum")))

    // composition order: f then agg == agg prepend f
    val a = f.`then`(agg)(df).orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = agg.prepend(f)(df).orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == Seq((2L, 20.0), (3L, 30.0)) && b.toSeq == a.toSeq)

    // filter∘filter keeps BOTH in the pruning prefix…
    assert(f.`then`(g).prefixFilters.size == 2)
    // …but a post-barrier filter must NOT join the prefix (it sees
    // derived columns, not stored ones)
    assert(f.`then`(agg).`then`(g).prefixFilters.size == 1)
    assert(agg.`then`(f).prefixFilters.isEmpty)

    // optimisation hints are accepted no-ops (Spark has no column slicing)
    assert(f.optimiseForMemory() == f && f.optimiseForSpeed() == f)
  }

  test("aggregator type gates match the reference: strings and datetime sums reject") {
    import java.sql.Timestamp
    val df = Seq(("a", "x", 1.0, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "s", "v", "ts")
    def agg(in: String, op: String) =
      QueryBuilder().groupByAgg(Seq("k"), Seq(("o", in, op)))(df)
    // Spark alone would COERCE the string to double and return null sums —
    // the reference raises SchemaException (strings: count/first/last only)
    intercept[IllegalArgumentException](agg("s", "sum"))
    intercept[IllegalArgumentException](agg("s", "mean"))
    intercept[IllegalArgumentException](agg("s", "min"))
    intercept[IllegalArgumentException](agg("s", "max"))
    assert(agg("s", "count").collect().head.getLong(1) == 1L)
    // datetime: everything EXCEPT sum (library.py resample/groupby doc)
    intercept[IllegalArgumentException](agg("ts", "sum"))
    assert(agg("ts", "min").collect().head.getTimestamp(1) != null)
    // bool: all aggregators; sum counts trues, mean is the fraction
    val b = Seq(("a", true), ("a", true), ("a", false)).toDF("k", "b")
    val r = QueryBuilder().groupByAgg(Seq("k"), Seq(
      ("sb", "b", "sum"), ("mb", "b", "mean"),
      ("nb", "b", "min"), ("xb", "b", "max")))(b).collect().head
    assert(r.getLong(1) == 2L && math.abs(r.getDouble(2) - 2.0 / 3) < 1e-12)
    assert(!r.getBoolean(3) && r.getBoolean(4))
  }

  test("derived mean of integral columns is bit-identical to avg(), huge sums included") {
    // ADVICE r20: the derived (sum, count) mean accumulated integral
    // inputs in an exact Long — group sums past 2^53 silently diverged
    // from avg() (whose buffer is a double) and sums past Long.MaxValue
    // threw under ANSI where avg() succeeds. The double-accumulating
    // rewrite must equal avg() exactly on both shapes.
    val huge = 4000000000000000000L // 4e18: two of these overflow a Long sum
    val df = Seq(("a", huge), ("a", huge), ("a", 7L),
      ("b", (1L << 54) + 1L), ("b", 1L)).toDF("k", "v")
    val got = QueryBuilder()
      .groupByAgg(Seq("k"), Seq(("m", "v", "mean")))(df)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("k").agg(avg(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert( // bit-identical, not approximately equal
      got.view.mapValues(java.lang.Double.doubleToRawLongBits).toMap ==
        want.view.mapValues(java.lang.Double.doubleToRawLongBits).toMap,
      s"got=$got want=$want")
  }

  test("datetime mean floors exactly: decimal-division HALF_UP overshoot corrected") {
    // Engineer a group whose true ns-mean fraction is (c-1)/c with
    // c ≈ 2e6: Spark's decimal division rounds HALF_UP at scale 6, so
    // the raw floor(sum/n) would overshoot to the next integer — the
    // remainder correction must bring it back down.
    val c = 2000003L // coprime to 1000, so a µs-aligned residue exists
    val inv1000 = BigInt(1000).modInverse(BigInt(c))
    val xUs = ((BigInt(c) - 1) * inv1000 % BigInt(c)).toLong // 1000·x ≡ c−1 (mod c)
    val baseUs = 1704067200000000L // 2024-01-01 in epoch-µs
    val df = spark.range(c).select(
      lit("g").as("k"),
      org.apache.spark.sql.functions
        .timestamp_micros(lit(baseUs) + when(col("id") === 0, lit(xUs)).otherwise(lit(0L)))
        .as("ts"))
    val got = QueryBuilder()
      .groupByAgg(Seq("k"), Seq(("m", "ts", "mean")))(df)
      .select(org.apache.spark.sql.functions.unix_micros(col("m")).as("us"))
      .head.getLong(0)
    // exact integer floor of the true ns mean, then ns→µs floor
    val meanNsFloor = (BigInt(baseUs) * 1000 * c + BigInt(xUs) * 1000) / c
    assert(got == (meanNsFloor / 1000).toLong,
      s"got $got expected ${(meanNsFloor / 1000).toLong}")
  }
}
