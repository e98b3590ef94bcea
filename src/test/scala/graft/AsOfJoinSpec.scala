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
}
