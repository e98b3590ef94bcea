package graft

import graft.functions.Bpe

/** BPE merge training against the canonical hand-worked example
  * (Sennrich-style "low / lower"): merge choice, deterministic
  * tie-breaks, greedy application, and the L==R run case.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("trainMerges reproduces the hand-computed merge sequence") {
    val docs = Seq("low low lower").toDF("text")
    val got = Bpe.trainMerges(docs, "text", 3)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // iter1: (l,o)=3 ties (o,w)=3 → left asc picks (l,o)
    // iter2: (lo,w)=3
    // iter3: (low,e)=1 ties (e,r)=1 → left asc picks (e,r)
    assert(got == Seq((1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "r", 1L)), got)
  }

  test("segmentWords applies ordered merges greedily") {
    val docs = Seq("low low lower").toDF("text")
    val seg = Bpe.segmentWords(docs, "text",
      Seq(("l", "o"), ("lo", "w"), ("e", "r")))
      .orderBy("word").as[(String, Long, Seq[String])].collect().toSeq
    assert(seg == Seq(("low", 2L, Seq("low")), ("lower", 1L, Seq("low", "e", "r").patch(1, Seq("er"), 2))), seg)
  }

  test("L==R runs merge greedily left-to-right (aaa -> [aa, a])") {
    val docs = Seq("aaa aaaa").toDF("text")
    val seg = Bpe.segmentWords(docs, "text", Seq(("a", "a")))
      .orderBy("word").as[(String, Long, Seq[String])].collect().toSeq
    assert(seg == Seq(("aaa", 1L, Seq("aa", "a")), ("aaaa", 1L, Seq("aa", "aa"))), seg)
  }

  test("exhausted corpora stop early; single-char words have no pairs") {
    val docs = Seq("a b a").toDF("text")
    val got = Bpe.trainMerges(docs, "text", 5).collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("encode tokenizes documents under the trained merges") {
    val docs = Seq((1L, "low low lower"), (2L, "lower low")).toDF("id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val got = Bpe.encode(docs, "id", "text", merges)
      .orderBy("id").as[(Long, Seq[String], Long)].collect().toSeq
    assert(got == Seq(
      (1L, Seq("low", "low", "low", "er"), 4L),
      (2L, Seq("low", "er", "low"), 3L)), got)
  }

  test("encode: leftmost-lowest-rank equals the segmentWords rank fold") {
    // Trained merge lists make the two application orders provably equal
    // (BpeRanks scaladoc); pin it on a corpus with L==R runs, nested
    // products, and rank ties resolved at training time.
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"aaa${"ab" * (i % 4)} banana bandana low lower aaaa"))
      .toDF("id", "text")
    val merges = Bpe.trainMerges(docs, "text", 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val byWord = Bpe.segmentWords(docs, "text", merges)
      .as[(String, Long, Seq[String])].collect()
      .map(w => w._1 -> w._3).toMap
    val enc = Bpe.encode(docs, "id", "text", merges)
      .as[(Long, Seq[String], Long)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    enc.foreach { case (id, toks, n) =>
      val expect = texts(id).split(" ", -1).filter(_.nonEmpty).toSeq.flatMap(byWord)
      assert(toks == expect, s"doc $id: $toks vs $expect")
      assert(n == toks.size.toLong)
    }
  }

  test("encode: word boundaries are hard, empty words vanish, null is null") {
    val docs = Seq((1L, "a b  a b"), (2L, " ab "), (3L, null))
      .toDF("id", "text")
    val got = Bpe.encode(docs, "id", "text", Seq(("a", "b")))
      .orderBy("id").as[(Long, Seq[String], Option[Long])].collect().toSeq
    // doc 1: the (a,b) merge never crosses the space between words; the
    // double space contributes nothing. doc 2: leading/trailing spaces
    // drop, "ab" chars merge. doc 3: null text → null tokens, null count.
    assert(got(0) == ((1L, Seq("a", "b", "a", "b"), Some(4L))), got(0))
    assert(got(1) == ((2L, Seq("ab"), Some(1L))), got(1))
    assert(got(2)._2 == null && got(2)._3.isEmpty, got(2))
  }

  test("encode is map-side: no keyed shuffle, no join in the plan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    val docs = Seq((1L, "low lower")).toDF("id", "text")
    val plan = Bpe.encode(docs, "id", "text", Seq(("l", "o")))
      .queryExecution.executedPlan
    // Kernels.spread may inject its bounded ROUND-ROBIN fan-out on a
    // single-split scan; anything keyed (a dictionary join's hash
    // exchange) would break the model-in-closure contract.
    val keyed = plan.collect {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.isInstanceOf[RoundRobinPartitioning] => e
    }
    assert(keyed.isEmpty, plan)
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, plan)
  }

  test("encode runs the kernel ONCE even composed with an explode") {
    // Without the OptimizerFence, CollapseProject inlines the kernel
    // into posexplode's Generate, whose null/empty generator condition
    // re-evaluates it (3 occurrences in the unfenced q122 plan).
    import org.apache.spark.sql.functions.posexplode
    val docs = Seq((1L, "low lower")).toDF("id", "text")
    val plan = Bpe.encode(docs, "id", "text", Seq(("l", "o")))
      .select($"id", posexplode($"tokens"))
      .queryExecution.executedPlan.toString
    val occurrences = "bpe_encode".r.findAllIn(plan).size
    assert(occurrences == 1, s"$occurrences kernel occurrences in:\n$plan")
  }

  test("encode gates: empty and oversized merge lists refuse") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Bpe.encode(docs, "id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Bpe.encode(docs, "id", "text",
        Seq.tabulate(65537)(i => (s"x$i", s"y$i")))
    }
  }

  test("fertility: per-domain subwords-per-word hand-check") {
    import spark.implicits._
    // merges (a,b) then (ab,c): "abc"→[abc] 1 subword, "ab"→[ab] 1,
    // "xy"→[x,y] 2, "abcabc"→[abc,abc] 2
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "abc ab", "d1"), // 2 words, 2 subwords
      (2L, "xy", "d1"), // 1 word, 2 subwords
      (3L, "abcabc xy xy", "d2") // 3 words, 2+2+2 = 6 subwords
    ).toDF("doc_id", "text", "dom")
    val got = Bpe.fertility(docs, "doc_id", "text", "dom", merges)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("d1", 2L, 3L, 4L, 1.333333),
      ("d2", 1L, 3L, 6L, 2.0)), got)
  }

  test("decodeIds inverts encodeIds up to the dropped spaces") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "  spaced  out "), // empty words contribute no ids
      (3L, "")).toDF("id", "text")
    val ids = Bpe.encodeIds(docs, "id", "text", merges)
    val got = Bpe.decodeIds(ids, "id", "ids", merges)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "lowlowlower"), (2L, "spacedout"), (3L, "")), got)
  }

  test("decodeIds resolves rank ids to products, offset ids to chars") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    // 1 -> "low" (rank-1 product), 2 -> "er", merges.size+'x' -> "x"
    val df = Seq((1L, Seq(1, 2, 3 + 'x'.toInt))).toDF("id", "ids")
    val got = Bpe.decodeIds(df, "id", "ids", merges)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "lowerx")), got)
  }

  test("decodeIds fails loudly on out-of-range ids") {
    val merges = Seq(("a", "b"))
    val bad = Seq((1L, Seq(merges.size + 65536))).toDF("id", "ids")
    val e = intercept[Exception] {
      Bpe.decodeIds(bad, "id", "ids", merges).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("token id")), chain(e).mkString(" | "))
  }
}
