package graft

import graft.functions.Unigram

/** Self-trained unigram LM operators, checked against hand-computed
  * values on a toy corpus (the driver gates q84/q85 replay the formulas
  * in DuckDB at sf scale).
  *
  * Toy corpus token counts: a=5, b=3, c=1, z=1 (total 10).
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  /** Mirror of tokenEntropy's fixed-point term quantization. */
  private def entropyOf(counts: Seq[Int]): Double = {
    val n = counts.sum.toDouble
    counts.map(c => math.round((c / n) * math.log(n / c) * 1e6)).sum / 1e6
  }

  test("tokenEntropy: uniform, degenerate and mixed bags match the replay") {
    val docs = Seq(
      (0L, "a b c d"), // uniform: H = ln 4
      (1L, "a a a a"), // single type: H = 0, ttr 0.25
      (2L, "a a b") // mixed
    ).toDF("doc_id", "text")
    val got = graft.functions.Unigram.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got(0) == ((0L, 4L, 4L, 1.0, entropyOf(Seq(1, 1, 1, 1)))))
    assert(got(1) == ((1L, 4L, 1L, 0.25, 0.0)))
    assert(got(2) == ((2L, 3L, 2L, 0.666667, entropyOf(Seq(2, 1)))))
    // uniform fixed-point entropy is within a micro-nat of ln(4)
    assert(math.abs(got(0)._5 - math.log(4)) < 4e-6)
  }

  private val corpus = Seq(
    (0L, "a a a b"),
    (1L, "a b b c"),
    (2L, "a z")
  ).toDF("doc_id", "text")

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bigramLogProb: kept-bigram, backoff and floor paths all hand-check") {
    // corpus: a=3 b=3 c=1 z=1 (total 8); bigrams (a,b)=3 (b,a)=1 (b,c)=1
    // (total 5). minShare .25 → kept unigrams {a,b}, kept bigram {(a,b)}.
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "z"))
      .toDF("doc_id", "text")
    def q(x: Double): Long = { val y = x * 1e6; if (y >= 0) Math.round(y) else -Math.round(-y) }
    val lpFirstA = q(math.log(3 / 8.0)) // first-token unigram path
    val lpBackA = q(math.log(0.4 * 3 / 8.0)) // backoff through kept 'a'
    val lpBigAB = q(math.log(3.0 / 3)) // ln c(a b)/c(a) = 0
    val ff = q(math.log(0.5 / 8)) // first-token OOV floor
    val fb = q(math.log(0.4 * 0.5 / 8)) // backoff OOV floor
    def mean(terms: Seq[Long]): Double = {
      // mirror of Unigram.microMean: integer half-away rounding of the
      // micro-nat quotient, then one exact /1e6
      val (s, n) = (terms.sum, terms.size.toLong)
      val q = (math.abs(s) * 2 + n) / (2 * n)
      (if (s < 0) -q else q) / 1e6
    }
    val got = graft.functions.Unigram
      .bigramLogProb(docs, "doc_id", "text", 0.25)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got(0) == ((0L, 4L,
      mean(Seq(lpFirstA, lpBigAB, lpBackA, lpBigAB))))) // a | ab | (b,a)→back a | ab
    assert(got(1) == ((1L, 3L, mean(Seq(lpFirstA, lpBigAB, fb))))) // (b,c)→c OOV
    assert(got(2) == ((2L, 1L, mean(Seq(ff))))) // single OOV token
  }

  test("logProbScore: vocab cutoff by relative share, OOV floor, per-doc mean") {
    // minShare 0.15 → threshold 1.5 tokens → vocab {a (p=.5), b (p=.3)};
    // c and z fall to the OOV floor ln(0.5/10).
    val got = Unigram.logProbScore(corpus, "doc_id", "text", 0.15)
      .orderBy("doc_id").as[(Long, Double)].collect()
    val lpA = math.log(0.5)
    val lpB = math.log(0.3)
    val floor = math.log(0.05)
    assert(got(0) == (0L -> r6((3 * lpA + lpB) / 4)))
    assert(got(1) == (1L -> r6((lpA + 2 * lpB + floor) / 4)))
    assert(got(2) == (2L -> r6((lpA + floor) / 2)))
    // the floor is strictly below every retained token's log-prob
    assert(floor < lpB && lpB < lpA)
  }

  test("logProbScore: minShare 0 keeps the whole vocab — no OOV path") {
    val got = Unigram.logProbScore(corpus, "doc_id", "text", 0.0)
      .orderBy("doc_id").as[(Long, Double)].collect()
    // doc 2: (ln .5 + ln .1) / 2 — z now scores as a real token
    assert(got(2) == (2L -> r6((math.log(0.5) + math.log(0.1)) / 2)))
  }

  test("coverageVocab: smallest (freq desc, tok) prefix crossing the target") {
    // coverage 0.7 → target mass 7: a (cum 5) and b (cum 8, crosses) kept;
    // c (before-mass 8 ≥ 7) dropped.
    val got = Unigram.coverageVocab(corpus, "doc_id", "text", 0.7)
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("a", 5L, 0.5), ("b", 3L, 0.8)))
  }

  test("coverageVocab: coverage 1.0 keeps every token, ties break on tok asc") {
    val got = Unigram.coverageVocab(corpus, "doc_id", "text", 1.0)
      .as[(String, Long, Double)].collect()
    assert(got.toSeq ==
      Seq(("a", 5L, 0.5), ("b", 3L, 0.8), ("c", 1L, 0.9), ("z", 1L, 1.0)))
  }

  test("logProbScore model collect is bounded by 1/minShare on a heavy-tail vocab") {
    // 5000 distinct singleton tokens + 2 frequent ones: the FULL vocab is
    // 5002 entries, but the driver may only ever see the kept set —
    // ≤ ceil(1/minShare) tokens by construction (each holds ≥ minShare of
    // the mass). A full-vocab collect here would return 5002.
    val heavy = spark.range(500).selectExpr("id AS doc_id",
      """concat('common1 common2 ',
         array_join(transform(sequence(0, 9), i -> concat('rare', id * 10 + i)), ' '))
         AS text""")
    val kept = Unigram.keptVocab(heavy, "doc_id", "text", 0.05)
    assert(kept.length <= 21, s"kept ${kept.length} — driver collect not bounded")
    assert(kept.map(_._1).toSet == Set("common1", "common2"))
    // and the scored output still covers every doc
    assert(Unigram.logProbScore(heavy, "doc_id", "text", 0.05).count() == 500)
  }

  test("coverageVocab prefix-sum is distributed: no unpartitioned window over the vocab") {
    // AQE wraps exchanges in query stages pre-execution; plan without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Unigram.coverageVocab(corpus, "doc_id", "text", 0.9)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the only global windows allowed run over the #partitions-row
      // summary (__psum), never over vocab rows (tok/c)
      val childCols = w.child.output.map(_.name)
      assert(childCols.contains("__psum") && !childCols.contains("tok"),
        s"unpartitioned window over vocab rows: $childCols")
    }
    // the vocab-sized running sum must be a PARTITIONED window
    assert(windows.exists(_.partitionSpec.nonEmpty))
  }

  test("bigramModel/bigramScore: ref-trained scoring differs from self-trained only via the model") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // self-trained split form == the fused bigramLogProb, row for row
    val fused = Unigram.bigramLogProb(docs, "doc_id", "text", 0.001)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val split = Unigram.bigramScore(docs, "doc_id", "text",
        Unigram.bigramModel(docs, "doc_id", "text", 0.001))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(fused == split)
    // a model trained on a narrow slice is a DIFFERENT model: same doc
    // coverage, but scores move (the direction is corpus-dependent — a
    // smaller training total raises both the kept shares and the floor,
    // so no inequality is guaranteed; only identity would be a bug)
    val ref = docs.filter($"doc_id" % 17 === 0)
    val refScored = Unigram.bigramScore(docs, "doc_id", "text",
        Unigram.bigramModel(ref, "doc_id", "text", 0.001))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(refScored.keySet == fused.keySet)
    assert(refScored.exists { case (id, (_, lp)) => lp != fused(id)._2 },
      "ref-trained scores identical to self-trained — model not applied")
  }

  test("nbQualityScore: Laplace llr hand-check on a two-class toy corpus") {
    // pos "a a a b" (tp=4), neg "b b b c" (tn=4), minShare .2 → kept
    // {a,b,c} (V=3, denominators 8): llr(a)=ln4, llr(b)=llr(c)=ln.5,
    // OOV floor ln(1/8)-ln(1/8)=0
    val pos = Seq((100L, "a a a b")).toDF("doc_id", "text")
    val neg = Seq((200L, "b b b c")).toDF("doc_id", "text")
    val docs = Seq((0L, "a b z"), (1L, "a a"), (2L, "c")).toDF("doc_id", "text")
    def q(x: Double): Long = { val y = x * 1e6; if (y >= 0) Math.round(y) else -Math.round(-y) }
    def mean(terms: Seq[Long]): Double = {
      // mirror of Unigram.microMean: integer half-away rounding of the
      // micro-nat quotient, then one exact /1e6
      val (s, n) = (terms.sum, terms.size.toLong)
      val q = (math.abs(s) * 2 + n) / (2 * n)
      (if (s < 0) -q else q) / 1e6
    }
    val llrA = q(math.log(4.0 / 8) - math.log(1.0 / 8))
    val llrB = q(math.log(2.0 / 8) - math.log(4.0 / 8))
    val llrC = q(math.log(1.0 / 8) - math.log(2.0 / 8))
    val got = Unigram.nbQualityScore(docs, "doc_id", "text", pos, neg, 0.2)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got(0) == ((0L, 3L, mean(Seq(llrA, llrB, 0L))))) // z = OOV floor
    assert(got(1) == ((1L, 2L, mean(Seq(llrA, llrA)))))
    assert(got(2) == ((2L, 1L, mean(Seq(llrC)))))
  }

  test("paretoAdmitCond: deterministic, tail admission near the analytic rate") {
    import org.apache.spark.sql.functions.{col, lit}
    val ids = spark.range(4096).toDF("id")
    def keptCount(score: Double, seed: Long): Long =
      ids.filter(Unigram.paretoAdmitCond(col("id"), lit(score), 2.0, seed)).count()
    // deterministic in (id, seed); seed changes the admitted set
    assert(keptCount(0.6, 7L) == keptCount(0.6, 7L))
    assert(keptCount(0.6, 7L) != keptCount(0.6, 8L))
    // analytic rate at alpha=2, score .6: P(u > 1 - 1/1.96) ≈ 0.51
    val f = keptCount(0.6, 7L) / 4096.0
    assert(f > 0.45 && f < 0.57, s"admit rate $f")
    // a score above the threshold's supremum (1.0) is always admitted
    assert(keptCount(1.5, 7L) == 4096L)
    // monotone: raising the score never drops an admitted doc
    val at06 = ids.filter(Unigram.paretoAdmitCond(col("id"), lit(0.6), 2.0, 7L))
      .as[Long].collect().toSet
    val at09 = ids.filter(Unigram.paretoAdmitCond(col("id"), lit(0.9), 2.0, 7L))
      .as[Long].collect().toSet
    assert(at06.subsetOf(at09))
  }

  test("perplexityBuckets: CCNet cut sizes, order and ppl hand-check") {
    // two langs: 'a' with 7 docs, 'b' with 2. Bucket sizes per lang:
    // n=7 → head ceil(7/3)=3, middle ceil(14/3)-3=2, tail 2;
    // n=2 → head ceil(2/3)=1, middle ceil(4/3)-1=1, tail 0.
    val docs = (1L to 7L).map { i =>
      // doc i repeats "x y" i times then i unique junk tokens: more junk
      // = more OOV floor terms = strictly lower lp_mean ⇒ rank == i
      val good = Seq.fill(8 - i.toInt)("x y").mkString(" ")
      val junk = (1 to i.toInt).map(j => s"junk${i}_$j").mkString(" ")
      (i, s"$good $junk", "a")
    } ++ Seq((8L, "x y x y", "b"), (9L, "zz qq ww", "b"))
    val df = docs.toDF("doc_id", "text", "lang")
    val out = Unigram.perplexityBuckets(df, "doc_id", "text", "lang", df,
        minShare = 0.05)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(3), r.getDouble(4), r.getString(5)))
      .toMap
    assert(out.size == 9)
    val aBuckets = (1L to 7L).map(out(_)._4)
    assert(aBuckets == Seq("head", "head", "head", "middle", "middle",
      "tail", "tail"), aBuckets)
    assert(out(8L)._4 == "head" && out(9L)._4 == "middle")
    // ppl really is round(exp(-lp_mean), 6)
    out.values.foreach { case (_, lp, ppl, _) =>
      val e = BigDecimal(math.exp(-lp))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ppl - e) < 1e-9)
    }
  }
}
