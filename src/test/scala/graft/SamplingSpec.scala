package graft

import org.apache.spark.sql.functions._

import graft.functions.Sampling

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val ids = spark.range(20000).toDF("id")

  test("hashSample keeps ~fraction, deterministically, nested fractions") {
    val n10 = Sampling.hashSample(ids, "id", 0.10).count()
    val n50 = Sampling.hashSample(ids, "id", 0.50).count()
    assert(math.abs(n10 / 20000.0 - 0.10) < 0.01, s"n10=$n10")
    assert(math.abs(n50 / 20000.0 - 0.50) < 0.01, s"n50=$n50")
    // determinism + monotone nesting: the 10% sample ⊂ the 50% sample
    val s10 = Sampling.hashSample(ids, "id", 0.10).as[Long].collect().toSet
    val s50 = Sampling.hashSample(ids, "id", 0.50).as[Long].collect().toSet
    assert(s10.subsetOf(s50))
    assert(s10 == Sampling.hashSample(ids.repartition(7), "id", 0.10)
      .as[Long].collect().toSet) // partitioning-independent
    // boundary fractions
    assert(Sampling.hashSample(ids, "id", 0.0).count() == 0)
    assert(Sampling.hashSample(ids, "id", 1.0).count() == 20000)
  }

  test("sampleTokenBudget hits per-domain token targets, deterministically") {
    // 3 domains x 2000 docs of 10 tokens each = 20k tokens per domain
    val docs = spark.range(6000).select(col("id"),
      concat(lit("dom"), (col("id") % 3).cast("string")).as("source"),
      lit("a b c d e f g h i j").as("text"))
    val out = Sampling.sampleTokenBudget(docs, "id", "text", "source", 5000L)
    val kept = out.groupBy("source")
      .agg(sum(graft.functions.Text.tokenCount(col("text"))).as("toks"))
      .as[(String, Long)].collect().toMap
    assert(kept.keySet == Set("dom0", "dom1", "dom2"))
    // expected 5000 of 20000 tokens per domain; hash variance is small
    kept.values.foreach(t => assert(math.abs(t - 5000.0) / 5000.0 < 0.10, kept))
    // deterministic + partitioning-independent
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.sampleTokenBudget(docs.repartition(7), "id", "text", "source", 5000L)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // budget >= total keeps everything
    assert(Sampling.sampleTokenBudget(docs, "id", "text", "source", 50000L)
      .count() == 6000)
    // a rate just under 1 rounds to 65536: must keep-all, not render a
    // 5-hex threshold that lexicographically undercuts every md5 prefix
    val nearOne = spark.range(10000).toDF("id")
      .filter(Sampling.hashSampleCondBy(col("id"), lit(65535.7 / 65536.0)))
      .count()
    assert(nearOne == 10000, s"near-1 rate must keep all rows, kept $nearOne")
  }

  test("leakageSafeSplits keeps duplicate components in one split") {
    val docs = spark.range(5000).toDF("id")
    // chain components {1,2,3}, {10,11}, plus a planted long-ish chain
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (100L, 101L), (101L, 102L),
      (102L, 103L)).toDF("id_a", "id_b")
    val out = graft.functions.Sampling.leakageSafeSplits(
      docs, "id", pairs, Seq(0.8, 0.1, 0.1))
    val bySplit = out.filter(col("id").isin(1L, 2L, 3L))
      .select("split").distinct().count()
    assert(bySplit == 1, "component {1,2,3} straddles splits")
    assert(out.filter(col("id").isin(100L, 101L, 102L, 103L))
      .select("split").distinct().count() == 1)
    // every doc assigned, splits cover ~80/10/10
    assert(out.count() == 5000)
    val frac = out.groupBy("split").count().as[(Int, Long)].collect().toMap
    assert(frac.keySet == Set(0, 1, 2), frac)
    assert(math.abs(frac(0) / 5000.0 - 0.8) < 0.03, frac)
    // deterministic across partitionings
    assert(out.select("id", "split").as[(Long, Int)].collect().toSet ==
      graft.functions.Sampling.leakageSafeSplits(
        docs.repartition(7), "id", pairs, Seq(0.8, 0.1, 0.1))
        .select("id", "split").as[(Long, Int)].collect().toSet)
  }

  test("splitIndex produces disjoint covering splits") {
    val withSplit = ids.withColumn("s", Sampling.splitIndex(col("id"), Seq(0.8, 0.1, 0.1)))
    val counts = withSplit.groupBy("s").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2)) // sums to 1.0 ⇒ no -1 bucket
    assert(math.abs(counts(0) / 20000.0 - 0.8) < 0.01)
    assert(math.abs(counts(1) / 20000.0 - 0.1) < 0.01)
    assert(math.abs(counts(2) / 20000.0 - 0.1) < 0.01)
    // train split == standalone 80% sample (same hash points)
    val train = withSplit.filter(col("s") === 0).select("id").as[Long].collect().toSet
    assert(train == Sampling.hashSample(ids, "id", 0.8).as[Long].collect().toSet)
  }

  test("hashSampleBy: per-stratum fractions, absent strata dropped") {
    val df = ids.withColumn("g", pmod(col("id"), lit(3)).cast("string"))
    val got = Sampling.hashSampleBy(df, "id", "g", Map("0" -> 1.0, "1" -> 0.2))
    val byG = got.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.keySet == Set("0", "1")) // stratum "2" has no fraction ⇒ dropped
    assert(byG("0") > 6600 && math.abs(byG("1") / 6667.0 - 0.2) < 0.02)
  }

  test("shuffleOrder: a deterministic permutation, seed-sensitive, partition-stable") {
    val df = ids.toDF()
    val p1 = Sampling.shuffleOrder(df, "id", 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation of 1..n
    assert(p1.values.toSeq.sorted == (1L to 20000L).toSeq)
    // identical under a different physical partitioning
    val p2 = Sampling.shuffleOrder(df.repartition(13), "id", 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == p2)
    // a different seed is a different permutation
    val p3 = Sampling.shuffleOrder(df, "id", 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p3 != p1 && p3.values.toSeq.sorted == (1L to 20000L).toSeq)
    // matches the single-window definition on a driver-side replay
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 20000L).sortBy(id => (md5hex(s"7:$id"), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(p1 == expected)
  }

  test("curriculumOrder: buckets strictly descend along positions; shuffled within") {
    val df = ids.withColumn("b", pmod(col("id"), lit(4)).cast("long"))
    val pos = Sampling.curriculumOrder(df, "id", "b", 7L)
      .join(df, "id").select("id", "pos", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pos.map(_._2).sorted.toSeq == (1L to 20000L).toSeq)
    // bucket is non-increasing along the position order
    val byPos = pos.sortBy(_._2).map(_._3)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a >= b })
    // within a bucket, order is the seed-7 shuffle order (not id order)
    val b3 = pos.filter(_._3 == 3L).sortBy(_._2).map(_._1).toSeq
    assert(b3 != b3.sorted)
  }

  test("temperatureMixture: alpha endpoints and exact driver replay") {
    // domain a: 4x the token mass of b — natural mix 80/20
    val docs = ((0 until 400).map(i => (i.toLong, "a", "w " * 19 + "w")) ++
      (400 until 500).map(i => (i.toLong, "b", "w " * 19 + "w")))
      .toDF("doc_id", "src", "text")
    def rates(alpha: Double, target: Long): Map[String, Double] = {
      val p = Map("a" -> 8000L, "b" -> 2000L)
      // mirror the operator's alpha special-casing exactly (sqrt, not pow)
      def powv(v: Double): Double = alpha match {
        case 0.0 => 1.0
        case 0.5 => math.sqrt(v)
        case 1.0 => v
        case a => math.pow(v, a)
      }
      val s = p.view.mapValues(v => Math.round(powv(v.toDouble) * 1e6)).toMap
      val tot = s.values.sum
      p.map { case (d, pd) =>
        d -> math.min(1.0, target.toDouble * s(d) / tot / pd)
      }
    }
    def replay(alpha: Double, target: Long): Set[Long] = {
      val r = rates(alpha, target)
      def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
      (0 until 500).filter { i =>
        val rate = r(if (i < 400) "a" else "b")
        val n = Math.round(rate * 65536).toInt
        n >= 65536 || md5hex(i.toString) < f"$n%04x"
      }.map(_.toLong).toSet
    }
    for (alpha <- Seq(0.0, 0.5, 1.0); target <- Seq(500L, 3000L, 50000L)) {
      val got = Sampling.temperatureMixture(
        docs, "doc_id", "text", "src", alpha, target)
        .select("doc_id").as[Long].collect().toSet
      assert(got == replay(alpha, target), s"alpha=$alpha target=$target")
    }
    // alpha=1 keeps natural proportions (equal rates); alpha=0 boosts
    // the tail domain toward equal token mass
    val r1 = rates(1.0, 3000L)
    assert(math.abs(r1("a") - r1("b")) < 1e-12)
    val r0 = rates(0.0, 3000L)
    assert(r0("b") == 4 * r0("a"), r0)
  }

  test("positionsBy: null ids and null buckets keep their rows and sort LAST") {
    // a null id yields a null shuffle key (nulls PROPAGATE per the
    // shuffleKey contract) — the row must still receive a position, and
    // it must be the last one
    val withNullId = Seq(Some("a"), Some("b"), Some("c"), None)
      .toDF("id")
    val p = Sampling.shuffleOrder(withNullId, "id", 7L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1))
    assert(p.length == 4 && p.map(_._2).sorted.toSeq == (1L to 4L))
    assert(p.find(_._1.isEmpty).map(_._2).contains(4L))
    // a null bucket value sorts after every real bucket (desc_nulls_last)
    // and its rows are not dropped
    val withNullBucket = Seq(
      (1L, Some(2L)), (2L, Some(1L)), (3L, None), (4L, Some(2L)), (5L, None)
    ).toDF("id", "b")
    val cp = Sampling.curriculumOrder(withNullBucket, "id", "b", 7L)
      .join(withNullBucket, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(cp.length == 5 && cp.map(_._2).sorted.toSeq == (1L to 5L))
    val nullPositions = cp.filter(_._3.isEmpty).map(_._2).sorted.toSeq
    assert(nullPositions == Seq(4L, 5L), nullPositions)
  }

  test("capPerDomain: k best per domain, score desc then id asc, no Window") {
    val docs = Seq(
      // domain x: scores force order (3, 1, 2) → ids 30, 10, 20; tie at
      // 0.5 between 10 and 20 breaks toward the LOWER id
      (10L, "x", 0.5), (20L, "x", 0.5), (30L, "x", 0.9), (40L, "x", 0.1),
      // domain y: fewer rows than k → all kept
      (50L, "y", 0.7)
    ).toDF("id", "dom", "sc")
    val out = Sampling.capPerDomain(docs, "id", "dom", col("sc"), 3)
    assert(out.columns.toSeq == Seq("dom", "id", "score", "rank"))
    val got = out.orderBy("dom", "rank")
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(got == Seq(
      ("x", 30L, 0.9, 1), ("x", 10L, 0.5, 2), ("x", 20L, 0.5, 3),
      ("y", 50L, 0.7, 1)), got)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("rankByScore: grouped ranks match driver sort; scale-invariant; nulls last") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 400L).map { id =>
      (id, s"g${id % 3}",
        if (id % 37 == 0) None else Some(rnd.nextDouble() * 10 - 5))
    }
    val df = rows.toDF("id", "g", "sc")
    def expected(desc: Boolean): Map[(String, Long), Long] =
      rows.groupBy(_._2).flatMap { case (g, rs) =>
        val sorted = rs.sortBy { case (id, _, sc) =>
          // nulls last in both directions, ties by id asc
          (sc.isEmpty, sc.map(v => if (desc) -v else v).getOrElse(0.0), id)
        }
        sorted.zipWithIndex.map { case ((id, _, _), i) => (g, id) -> (i + 1L) }
      }
    for (desc <- Seq(true, false); scale <- Seq(0.25, 16.0, 4096.0)) {
      val got = Sampling.rankByScore(df, "id", Some("g"), col("sc"),
          descending = desc, subBucketScale = scale)
        .as[(String, Long, Long)].collect()
        .map { case (g, id, r) => (g, id) -> r }.toMap
      assert(got == expected(desc), s"desc=$desc scale=$scale")
    }
    // ungrouped: one global permutation
    val global = Sampling.rankByScore(df, "id", None, col("sc"))
      .as[(Long, Long)].collect()
    assert(global.map(_._2).sorted.toSeq == (1L to 400L))
  }

  test("rankByScore: per-(group,sub-bucket) windows only — no whole-group task") {
    val df = (1L to 100L).map(i => (i, i.toDouble / 7.0)).toDF("id", "sc")
    val plan = Sampling.rankByScore(df, "id", None, col("sc"))
      .queryExecution.executedPlan.toString
    // the data-side window must partition by the sub-bucket; the only
    // unpartitioned window may run over the counter summary
    val windows = "(?m)^.*Window .*$".r.findAllIn(plan).toSeq
    assert(windows.exists(_.contains("__sb")), plan)
  }
}
