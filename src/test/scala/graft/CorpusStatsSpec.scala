package graft

import org.apache.spark.sql.functions._

import graft.functions.{CorpusStats, Text}

/** Corpus profiling: per-domain health counters and the token-count
  * histogram, checked against hand-computed values on a toy corpus (the
  * driver gate q79 replays the full formulas in DuckDB at sf scale).
  */
class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    ("a", "the cat sat"),        // 3 tokens
    ("a", "The  cat sat"),       // same fingerprint after normalization
    ("a", "dogs run fast here"), // 4 tokens
    ("b", "one two")             // 2 tokens
  ).toDF("source", "text")

  test("healthReport computes per-domain counters, dup mass via normalized fingerprint") {
    val got = CorpusStats.healthReport(corpus, "text", "source")
      .orderBy("source").collect()
    val a = got(0)
    assert(a.getAs[String]("source") == "a")
    assert(a.getAs[Long]("n_docs") == 3L)
    // "The  cat sat" double space → 4 ws-tokens (empty token), same as
    // string_split: 3 + 4 + 4
    assert(a.getAs[Long]("n_tokens") == 11L)
    assert(a.getAs[Double]("mean_tokens") == 3.666667)
    assert(a.getAs[Long]("max_tokens") == 4L)
    assert(a.getAs[Long]("dup_docs") == 1L) // case/whitespace variant collapses
    assert(a.getAs[Double]("dup_ratio") == 0.333333)
    val b = got(1)
    assert(b.getAs[Long]("n_docs") == 1L && b.getAs[Long]("dup_docs") == 0L)

    // mean_quality is the plain average of the per-doc quality kernel
    val perDoc = corpus.filter(col("source") === "a")
      .select(Text.qualityScoreOf(Text.textStats(col("text"))).as("q"))
      .as[Double].collect()
    val expected = BigDecimal(perDoc.sum / perDoc.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(a.getAs[Double]("mean_quality") - expected) < 1e-9)
  }

  test("healthReport token count disagrees with textStats nowhere (3 tokens means 3)") {
    // "The  cat sat" has a double space: the whitespace-token kernel must
    // count it the same way the oracle's string_split does (empty token)
    val n = corpus.select(Text.textStats(col("text")).getField("n_tokens"))
      .as[Int].collect().toSeq
    val o = corpus.select(size(split(col("text"), " "))).as[Int].collect().toSeq
    assert(n == o)
  }

  test("tokenHistogram buckets by fixed width with counter-only output") {
    val got = CorpusStats.tokenHistogram(corpus, "text", "source", bucketWidth = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // a: 3→bucket 2 (but the double-space doc has 4 ws-tokens → bucket 4),
    // recompute from the kernel to stay definition-stable
    val expect = corpus
      .select(col("source"), (floor(Text.tokenCount(col("text")).cast("long") / 2) * 2)
        .as("bucket_lo"))
      .groupBy("source", "bucket_lo").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.map(_._1) == Set("a", "b"))
  }

  test("domainDivergence: hand-computed JS, zero for identical distributions") {
    val docs = Seq(
      ("X", "a a b"), ("Y", "a b b"), ("Z", "a a b")
    ).toDF("source", "text").withColumnRenamed("source", "src")
    val got = CorpusStats.domainDivergence(docs, "text", "src")
      .orderBy("domain_a", "domain_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // mirror of the micro-nat pipeline
    def term(p: Double, q: Double): Long = {
      val t = (if (p > 0) (p / 2) * math.log((p * 2) / (p + q)) else 0.0) +
        (if (q > 0) (q / 2) * math.log((q * 2) / (p + q)) else 0.0)
      val y = t * 1e6
      if (y >= 0) Math.round(y) else -Math.round(-y)
    }
    val js = (term(2.0 / 3, 1.0 / 3) + term(1.0 / 3, 2.0 / 3)) / 1e6
    assert(got.toSeq == Seq(("X", "Y", js), ("X", "Z", 0.0), ("Y", "Z", js)), got.toSeq)
    // JS is bounded by ln 2
    assert(js > 0 && js < math.log(2.0))
    // quadratic fan-out is gated
    val many = (0 until 65).map(i => (s"d$i", "a b")).toDF("src", "text")
    intercept[IllegalArgumentException] {
      CorpusStats.domainDivergence(many, "text", "src").collect()
    }
    // a non-string domain column is a loud contract error, not a
    // ClassCastException from the driver-side collect
    val intDom = Seq((1, "a b"), (2, "a b")).toDF("src", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusStats.domainDivergence(intDom, "text", "src")
    }
    assert(e.getMessage.contains("string domain column"))
  }

  test("zipfFit matches the hand-worked 3-type regression") {
    // freqs a=4 b=2 c=1 → ranks 1,2,3; milli-nat floors:
    // x = [0, 693, 1098], y = [1386, 693, 0]
    val docs = Seq("a a a a b b c").toDF("text")
    val got = CorpusStats.zipfFit(docs, "text")
      .as[(Long, Long, Double, Double)].collect().head
    val x = Seq(0L, 693L, 1098L)
    val y = Seq(1386L, 693L, 0L)
    val n = 3.0
    val sx = x.sum.toDouble
    val sy = y.sum.toDouble
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum.toDouble
    val sxx = x.map(a => a * a).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got._1 == 3L && got._2 == 7L, got)
    assert(math.abs(got._3 - slope) < 1e-12, got)
    assert(math.abs(got._4 - (sy - slope * sx) / n / 1000.0) < 1e-12, got)
  }

  test("zipfFit: single-type corpus degenerates to slope 0") {
    val got = CorpusStats.zipfFit(Seq("a a").toDF("text"), "text")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((1L, 2L, 0.0, 0.693)), got)
  }
}
