package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), (1L, 200L, 20L), (1L, 350L, 30L), (2L, 150L, 40L))
    .toDF("k", "ts", "lv")
  private val right = Seq(
    (1L, 90L, 1.0), (1L, 190L, 2.0), (2L, 10L, 3.0), (3L, 50L, 4.0))
    .toDF("k", "ts", "rv")

  test("asof join attaches the most recent right value per key") {
    val got = AsOfJoin.asofJoin(left, right, "ts", Seq("k"), Seq("rv"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, 100L, Some(1.0)), // 90 <= 100
      (1L, 200L, Some(2.0)), // 190 <= 200
      (1L, 350L, Some(2.0)), // still 190
      (2L, 150L, Some(3.0)))) // key 2's only right row
  }

  test("tolerance nulls matches older than the lookback window") {
    val got = AsOfJoin.asofJoin(left, right, "ts", Seq("k"), Seq("rv"), toleranceNs = 50L)
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, 100L, Some(1.0)), // age 10 <= 50
      (1L, 200L, Some(2.0)), // age 10 <= 50
      (1L, 350L, None), // age 160 > 50
      (2L, 150L, None))) // age 140 > 50
  }

  test("equal timestamps: right row at exactly left.ts matches") {
    val l = Seq((1L, 100L, 0)).toDF("k", "ts", "x")
    val r = Seq((1L, 100L, 9.0)).toDF("k", "ts", "rv")
    val got = AsOfJoin.asofJoin(l, r, "ts", Seq("k"), Seq("rv")).collect()
    assert(got(0).getDouble(3) == 9.0)
  }

  test("chunked formulation: identical rows on the hand cases") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    for (chunks <- Seq(1, 2, 3, 64)) {
      assert(rows(AsOfJoin.asofJoinChunked(
          left, right, "ts", Seq("k"), Seq("rv"), chunks = chunks)) ==
        rows(AsOfJoin.asofJoin(left, right, "ts", Seq("k"), Seq("rv"))),
        s"chunks=$chunks")
      assert(rows(AsOfJoin.asofJoinChunked(
          left, right, "ts", Seq("k"), Seq("rv"), toleranceNs = 50L,
          chunks = chunks)) ==
        rows(AsOfJoin.asofJoin(
          left, right, "ts", Seq("k"), Seq("rv"), toleranceNs = 50L)),
        s"chunks=$chunks tolerance")
    }
  }

  test("chunked: null ts is a loud error, not a silent divergence") {
    // the window form sorts null ts FIRST (a null-ts right row would
    // back-fill everything); chunked refuses rather than diverging
    val l = Seq((1L, Some(100L), 0), (1L, Some(900L), 1)).toDF("k", "ts", "x")
    val r = Seq((1L, Option.empty[Long], 9.0)).toDF("k", "ts", "rv")
    val e = intercept[Exception] {
      AsOfJoin.asofJoinChunked(l, r, "ts", Seq("k"), Seq("rv"), chunks = 4)
        .collect()
    }
    assert(e.getMessage.contains("null ts"), e.getMessage)
    // the delegating single-chunk branch enforces the same contract
    val e2 = intercept[Exception] {
      AsOfJoin.asofJoinChunked(l, r, "ts", Seq("k"), Seq("rv"), chunks = 1)
        .collect()
    }
    assert(e2.getMessage.contains("null ts"), e2.getMessage)
  }

  test("chunked == window on a randomized corpus, incl. null right values") {
    // deterministic pseudo-random frames: unique (k, ts) right rows (the
    // documented tie condition), ~1/5 null right values so the
    // per-column ignoreNulls carry is exercised across chunk boundaries
    val rnd = new scala.util.Random(42)
    val ls = (1 to 2000).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(100000).toLong * 13L, i.toLong) }
    val rs = rnd.shuffle((1 to 1500).map { i =>
      (rnd.nextInt(9).toLong, i.toLong * 700L + rnd.nextInt(600),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble()),
        s"tag${rnd.nextInt(3)}") }.toVector)
    val l = ls.toDF("k", "ts", "lv")
    val r = rs.toDF("k", "ts", "rv", "rs")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "ts", "lv").collect().map(_.toSeq).toSeq
    for (tol <- Seq(-1L, 5000L); chunks <- Seq(2, 17, 64)) {
      val w = canon(AsOfJoin.asofJoin(
        l, r, "ts", Seq("k"), Seq("rv", "rs"), toleranceNs = tol))
      val c = canon(AsOfJoin.asofJoinChunked(
        l, r, "ts", Seq("k"), Seq("rv", "rs"), toleranceNs = tol,
        chunks = chunks))
      assert(w == c, s"tol=$tol chunks=$chunks")
    }
  }
}
