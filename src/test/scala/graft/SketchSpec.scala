package graft

import org.apache.spark.sql.functions._

import graft.core.Library
import graft.functions.Sketch

/** HyperLogLog sketches: registers vs a driver-side mirror, merge
  * algebra, estimator accuracy in both branches, and the persisted
  * lifecycle (increment folds equal the one-shot build; replays are
  * idempotent).
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  /** Driver mirror of the portable register function (md5-60 hash). */
  private def mirrorRegisters(values: Seq[String], p: Int): Map[Int, Int] = {
    val vbits = 60 - p
    values.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val b = (h >> vbits).toInt
      val v = h & ((1L << vbits) - 1)
      val rho = if (v == 0) vbits + 1 else vbits - (64 - java.lang.Long.numberOfLeadingZeros(v)) + 1
      (b, rho)
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
  }

  test("portable registers match the driver-side md5-60 mirror") {
    val vals = (1 to 5000).map(i => s"value_$i")
    val df = vals.toDF("v")
    val got = Sketch.hllRegisters(df, col("v"), p = 8, portable = true)
      .as[(Int, Int)].collect().toMap
    assert(got == mirrorRegisters(vals, 8))
  }

  test("merge == one-shot registers; idempotent under replay") {
    val a = (1 to 3000).map(i => s"a_$i").toDF("v")
    val b = (2000 to 6000).map(i => s"a_$i").toDF("v") // overlaps a
    val union = a.unionByName(b)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllRegisters(df, col("v"), 8, portable = true)
    val merged = Sketch.hllMerge(regs(a), regs(b))
      .as[(Int, Int)].collect().toMap
    assert(merged == regs(union).as[(Int, Int)].collect().toMap)
    // idempotent: folding b in twice changes nothing
    val twice = Sketch.hllMerge(Sketch.hllMerge(regs(a), regs(b)), regs(b))
      .as[(Int, Int)].collect().toMap
    assert(twice == merged)
  }

  test("estimator: raw branch within 5% at p=12; linear-counting exact-ish when sparse") {
    val n = 50000
    val big = (1 to n).map(i => s"item_$i").toDF("v")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(big, col("v"), 12), p = 12)
      .select("n_distinct_est").as[Double].head()
    assert(math.abs(est - n) / n < 0.05, s"est $est vs $n")
    // 100 distincts over 4096 registers: the small-range branch fires
    // and linear counting is near-exact
    val small = (1 to 100).map(i => s"item_$i").toDF("v")
    val estS = Sketch.hllEstimate(
      Sketch.hllRegisters(small, col("v"), 12), p = 12)
      .select("n_distinct_est").as[Double].head()
    assert(math.abs(estS - 100) <= 5, s"linear-counting est $estS vs 100")
    // duplicates are invisible: the sketch of 10 copies equals one copy
    val dup10 = (1 to 10).flatMap(_ => 1 to 100).map(i => s"item_$i").toDF("v")
    val estD = Sketch.hllEstimate(
      Sketch.hllRegisters(dup10, col("v"), 12), p = 12)
      .select("n_distinct_est").as[Double].head()
    assert(estD == estS)
  }

  test("grouped registers/estimates equal per-group global sketches") {
    val rows = (1 to 6000).map(i => (s"g${i % 3}", s"item_${i % 1500}_${i % 7}"))
    val df = rows.toDF("g", "v")
    val grouped = Sketch.hllRegistersBy(df, col("g"), col("v"), 8,
        portable = true)
      .as[(String, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toMap).toMap
    val expected = rows.map(_._1).distinct.map { g =>
      g -> Sketch.hllRegisters(df.filter(col("g") === g), col("v"), 8,
        portable = true).as[(Int, Int)].collect().toMap
    }.toMap
    assert(grouped == expected)
    val estBy = Sketch.hllEstimateBy(
      Sketch.hllRegistersBy(df, col("g"), col("v"), 8, portable = true), 8)
      .select("group", "n_distinct_est").as[(String, Double)].collect().toMap
    expected.keys.foreach { g =>
      val solo = Sketch.hllEstimate(
        Sketch.hllRegisters(df.filter(col("g") === g), col("v"), 8,
          portable = true), 8)
        .select("n_distinct_est").as[Double].head()
      assert(estBy(g) == solo, s"group $g")
    }
  }

  test("corpus ledger: two increments equal the one-shot build") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def freshLib() = new Library(
      java.nio.file.Files.createTempDirectory("graft-ledger-").toString, spark)
    val inc = freshLib()
    graft.functions.CorpusStats.buildLedger(
      inc, docs.filter(col("doc_id") % 2 === 0), "text", "lang", "led", p = 8,
      portable = true)
    graft.functions.CorpusStats.mergeIntoLedger(
      inc, docs.filter(col("doc_id") % 2 === 1), "text", "lang", "led")
    val one = freshLib()
    graft.functions.CorpusStats.buildLedger(
      one, docs, "text", "lang", "led", p = 8, portable = true)
    def rows(l: Library) = graft.functions.CorpusStats.readLedger(l, "led")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(rows(inc) == rows(one))
    // and the report is sane: every domain's distinct estimate is
    // positive and no larger than its token count
    rows(one).foreach { case (d, vs) =>
      assert(vs(1).asInstanceOf[Long] > 0, d)
      assert(vs.last.asInstanceOf[Double] > 0, d)
    }
  }

  test("ledgerDrift: increment deltas, new domains, zero-drift identity") {
    val lib = new Library(
      java.nio.file.Files.createTempDirectory("graft-drift-").toString, spark)
    val v1 = Seq((1L, "alpha beta gamma", "a"), (2L, "alpha alpha", "a"),
      (3L, "delta epsilon", "b")).toDF("doc_id", "text", "dom")
    val inc = Seq((4L, "zeta eta theta iota", "a"), // grows a
      (5L, "kappa lambda", "c")) // NEW domain
      .toDF("doc_id", "text", "dom")
    graft.functions.CorpusStats.buildLedger(lib, v1, "text", "dom", "led",
      p = 8, portable = true)
    graft.functions.CorpusStats.mergeIntoLedger(lib, inc, "text", "dom", "led")
    val first = lib.listVersions("led__stats").min
    val drift = graft.functions.CorpusStats.ledgerDrift(
      lib, "led", Library.AsOf.Version(first))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(drift("a") == ((2L, 3L, 1L, 4L))) // +1 doc, +4 tokens
    assert(drift("b") == ((1L, 1L, 0L, 0L))) // untouched
    assert(drift("c") == ((0L, 1L, 1L, 2L))) // born in the increment
    // self-drift is identically zero
    val zero = graft.functions.CorpusStats.ledgerDrift(
      lib, "led", Library.AsOf.Latest)
      .collect()
    assert(zero.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L &&
      r.getDouble(7) == 0.0))
  }

  test("persisted lifecycle: two increments equal the one-shot build") {
    val lib = new Library(
      java.nio.file.Files.createTempDirectory("graft-hll-").toString, spark)
    val all = (1 to 8000).map(i => s"u_$i").toDF("v")
    Sketch.buildHllSketch(lib, all.filter(expr("v like '%1' or v like '%3'")),
      "v", "inc", p = 10, portable = true)
    Sketch.mergeIntoHllSketch(lib,
      all.filter(!expr("v like '%1' or v like '%3'")), "v", "inc")
    Sketch.mergeIntoHllSketch(lib,
      all.filter(expr("v like '%3'")), "v", "inc") // replayed increment
    val fromSymbol = Sketch.estimateHllSketch(lib, "inc")
      .select("n_distinct_est").as[Double].head()
    val oneShot = Sketch.hllEstimate(
      Sketch.hllRegisters(all, col("v"), 10, portable = true), 10)
      .select("n_distinct_est").as[Double].head()
    assert(fromSymbol == oneShot)
    // versions accrued: build + 2 merges = 3 versions of the regs symbol
    assert(lib.listVersions("inc__regs").length == 3)
  }
}
