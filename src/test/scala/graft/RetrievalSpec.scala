package graft

import org.apache.spark.sql.functions._

import graft.functions.Retrieval

/** Ground-truth and plan-shape tests for the lexical retrieval operators
  * (bm25 q115, topKeywords q116) — the oracle gates replay the pipelines
  * at corpus scale; these pin the semantics on hand-checkable inputs:
  * tie-breaks on EXACT quantized scores, empty/no-match inputs, require
  * gates, and the 100 TB plan shape (query-vocab filter below the
  * aggregation exchange; per-doc windows only).
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana"),
    (3L, "cherry cherry cherry durian"),
    (4L, "elderberry fig grape plum"),
    (5L, "apple banana apple cherry") // exact twin of doc 1
  ).toDF("doc_id", "text")

  // ---- bm25 ----

  test("bm25: only docs matching >= 1 query term appear; ranked desc, id-asc ties") {
    val got = Retrieval.bm25(corpus, "doc_id", "text", Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // doc 4 shares no query term -> absent
    assert(!got.map(_._1).contains(4L))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 5L))
    // ranks are 1..n dense in output order
    assert(got.map(_._3).toSeq == (1 to got.length))
    // docs 1 and 5 are identical texts -> identical quantized scores;
    // the tie MUST break id-ascending (1 before 5, adjacent ranks)
    val r1 = got.find(_._1 == 1L).get
    val r5 = got.find(_._1 == 5L).get
    assert(r1._2 == r5._2, s"twin docs must tie exactly: $r1 $r5")
    assert(r5._3 == r1._3 + 1, s"tie must break id-asc: $r1 $r5")
    // scores weakly decreasing in rank order
    assert(got.sortBy(_._3).sliding(2).forall {
      case Array(a, b) => a._2 >= b._2
      case _ => true
    })
  }

  test("bm25: driver-side replay of the exact formula (quantized longs)") {
    val n = 5.0
    val avgdl = (4 + 2 + 4 + 4 + 4) / 5.0
    val (k1, b) = (1.2, 0.75)
    // term "apple": df=3 (docs 1,2,5); doc 2: tf=1, dl=2
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def contrib(tf: Double, dl: Double, df: Double) =
      math.round(idf(df) * (tf * (k1 + 1)) /
        (tf + k1 * (1 - b + b * dl / avgdl)) * 1e9)
    val expected2 = contrib(1, 2, 3) / 1e9
    val got = Retrieval.bm25(corpus, "doc_id", "text", Seq("apple"), k = 10)
      .filter(col("doc_id") === 2L).select(round(col("score"), 6))
      .head.getDouble(0)
    assert(got == math.rint(expected2 * 1e6) / 1e6, s"$got vs $expected2")
  }

  test("bm25: k truncates AFTER global ranking; empty query/bad k refuse") {
    val top1 = Retrieval.bm25(corpus, "doc_id", "text", Seq("cherry"), k = 1)
      .collect()
    assert(top1.length == 1)
    // doc 3 has tf=3 of "cherry" -> highest score
    assert(top1.head.getLong(0) == 3L && top1.head.getInt(2) == 1)
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, "doc_id", "text", Seq("apple"), k = 0)
    }
  }

  test("bm25: no query term in corpus -> empty result, not an error") {
    val got = Retrieval.bm25(corpus, "doc_id", "text", Seq("zzz"), k = 5)
    assert(got.count() == 0)
  }

  test("bm25 plan: query-vocab filter sits below the aggregation exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Retrieval.bm25(corpus, "doc_id", "text", Seq("apple", "cherry"))
        .queryExecution.executedPlan
      // every shuffle exchange's input is already filtered to query
      // terms: the full posting stream must never ride an exchange.
      // Walk each exchange's subtree: if it contains the token Generate,
      // the isin filter must sit between them.
      val exchanges = p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        val hasGen = e.child.collect {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }.nonEmpty
        if (hasGen) {
          val filtered = e.child.collect {
            case f: org.apache.spark.sql.execution.FilterExec
              if f.condition.toString.contains("INSET") ||
                f.condition.toString.contains("IN (") ||
                f.condition.toString.contains("= apple") ||
                f.condition.toString.contains("IN(") => f
          }
          assert(filtered.nonEmpty,
            s"exploded tokens must be query-filtered pre-shuffle:\n${e.child}")
        }
      }
      // ranking is top-k over quantized longs — no corpus-wide window
      // before the final k-row rank assignment (the one Window runs on
      // an already-limited k-row input)
      val s = p.toString
      assert(s.contains("TakeOrderedAndProject") || s.contains("GlobalLimit"), s)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ---- topKeywords ----

  test("topKeywords: per-doc tf-idf ranking, term-asc ties, k truncation") {
    val got = Retrieval.topKeywords(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    val byDoc = got.groupBy(_._1)
    // every doc has keywords (corpus-universal terms score ln((N+1)/(N+1))=0
    // but still rank); each doc emits at most k rows with dense ranks
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L, 5L))
    byDoc.values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
    // doc 3: "cherry" tf=3 df=3 -> 3*ln(6/4); "durian" tf=1 df=1 -> ln(6/2)
    val d3 = byDoc(3L).sortBy(_._4)
    assert(d3.head._2 == "cherry")
    assert(d3.head._3 == math.rint(3 * math.log(6.0 / 4.0) * 1e6) / 1e6)
    assert(d3(1)._2 == "durian")
    // docs 1 and 5 are twins: identical keyword lists, weights, ranks
    assert(byDoc(1L).map(t => (t._2, t._3, t._4)).sortBy(_._3).toSeq ==
      byDoc(5L).map(t => (t._2, t._3, t._4)).sortBy(_._3).toSeq)
    // tie-break: doc 2 "apple"/"banana" both tf=1; apple df=3, banana
    // df=3 -> equal weights, term-ASC order decides rank
    val d2 = byDoc(2L).sortBy(_._4)
    assert(d2.map(_._2).toSeq == Seq("apple", "banana"))
    assert(d2.head._3 == d2(1)._3)
  }

  test("persisted BM25 index: identical to corpus rescan; term filter prunes files") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lib = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-bm25-").toString, spark)
    // sf0.001: ~27k postings rows; targetRows=1200 gives a multi-file
    // index so term pruning has something to skip
    Retrieval.buildBm25Index(lib, docs, "doc_id", "text", "lex",
      targetRows = 1200L)
    val q = Seq("dup", "vector", "merge")
    val rescan = Retrieval.bm25(docs, "doc_id", "text", q, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val indexed = Retrieval.bm25Indexed(lib, "lex", q, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    // bit-identical ranking AND scores (shared quantized-long tail)
    assert(indexed == rescan)
    // the term read really prunes: postings are sorted on the string
    // term index, so a 2-term query's file set is a strict subset
    // (bounds come from the manifest — no createColumnStats call)
    val all = lib.read("lex__postings").inputFiles.length
    val pruned = lib.read("lex__postings",
      exprFilter = Some(graft.query.Expr.col("term").isin("dup", "merge")))
      .inputFiles.length
    assert(all >= 8, s"expected multi-file index, got $all")
    assert(pruned < all / 2, s"pruned read touched $pruned of $all files")
    // index rebuild is just a new version: as-of 1 still serves v1
    assert(lib.read("lex__postings").count() > 0)
  }

  test("topKeywords ranks == independent driver reference (ties, multi-partition)") {
    // r21 regression net for the window→TopKTerms rewrite: a 200-doc
    // synthetic corpus with heavy planted score ties (shared tf=1 terms
    // from a 13-term pool), ranked independently on the driver with the
    // same quantized-long formula and (wq desc, term asc) order. The
    // corpus spans several partitions, so partial buffers really merge.
    import org.apache.spark.sql.functions._
    val docs = spark.range(200).repartition(7).select(
      col("id").as("doc_id"),
      expr("array_join(transform(sequence(0, cast(id % 40 as int))," +
        " i -> concat('t', pmod(i * 7 + id, 13))), ' ')").as("text"))
    val got = Retrieval.topKeywords(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val corpus = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val n = corpus.length
    val tf = corpus.flatMap { case (id, txt) =>
      txt.split(" ", -1).map(t => (id, t))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfT = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = tf.keys.groupBy(_._1).toSeq.flatMap { case (id, keys) =>
      keys.toSeq
        .map { case (_, t) =>
          // Spark round() is BigDecimal HALF_UP, not rint's half-even
          val wq = java.math.BigDecimal.valueOf(
            tf((id, t)) * math.log((n + 1.0) / (dfT(t) + 1.0)) * 1e9)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          (t, wq)
        }
        .sortBy { case (t, wq) => (-wq, t) }
        .take(3).zipWithIndex
        .map { case ((t, _), i) => (id, t, i + 1) }
    }.sortBy(t => (t._1, t._3))
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("topKeywords: bad k refuses; rank is a bounded partial aggregate, not a window") {
    intercept[IllegalArgumentException] {
      Retrieval.topKeywords(corpus, "doc_id", "text", k = 0)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Retrieval.topKeywords(corpus, "doc_id", "text", k = 3)
        .queryExecution.executedPlan
      // r21: the per-doc rank must be the TopKTerms TypedImperativeAggregate
      // (partial mode emits ≤ k terms per doc per map task BEFORE the rank
      // exchange), never a row_number window that shuffles every posting
      assert(p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "topKeywords must not plan a window")
      val aggs = p.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
            if a.aggregateExpressions.exists(
              _.aggregateFunction.isInstanceOf[graft.plans.TopKTerms]) => a
      }
      // partial + final pair: the bounded map-side emit is the point
      assert(aggs.size == 2, s"expected partial+final TopKTerms, got ${aggs.size}")
      assert(aggs.exists(_.aggregateExpressions.exists(_.mode ==
        org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
        "TopKTerms must run in partial mode before the exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("incremental index == one-shot: three folds, several query sets") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    def tmpLib() = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-bm25i-").toString, spark)
    val inc = tmpLib()
    Retrieval.buildBm25Index(inc, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", "lex", targetRows = 1200L)
    Retrieval.appendToBm25Index(inc, docs.filter(col("doc_id") % 3 === 1),
      "lex", "doc_id", "text", targetRows = 1200L)
    Retrieval.appendToBm25Index(inc, docs.filter(col("doc_id") % 3 === 2),
      "lex", "doc_id", "text", targetRows = 1200L)
    val one = tmpLib()
    Retrieval.buildBm25Index(one, docs, "doc_id", "text", "lex",
      targetRows = 1200L)
    // merged stats row is exact
    val sInc = inc.read("lex__stats").collect().head
    val sOne = one.read("lex__stats").collect().head
    assert((sInc.getLong(0), sInc.getLong(1)) == ((sOne.getLong(0), sOne.getLong(1))))
    for (q <- Seq(Seq("dup", "vector", "merge"), Seq("the"), Seq("table", "a"))) {
      val a = Retrieval.bm25Indexed(inc, "lex", q, k = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      val b = Retrieval.bm25Indexed(one, "lex", q, k = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      assert(a == b, s"query $q")
      assert(a.nonEmpty)
    }
  }

  test("phraseSearch: adjacency, overlaps, repeated words, pruning") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"), // "a a" overlaps: 2 matches; "a a a": 1
      (2L, "a b a b a"), // "a b a": 2 (overlapping at 0 and 2)
      (3L, "b a"), // no "a b"
      (4L, "x y z")).toDF("doc_id", "text")
    val lib = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-pos-").toString, spark)
    graft.functions.Retrieval.buildPositionalIndex(
      lib, docs, "p", "doc_id", "text", targetRows = 3L)
    def search(ph: String*) =
      graft.functions.Retrieval.phraseSearch(lib, "p", ph)
        .as[(Long, Long)].collect().toMap
    assert(search("a", "a") == Map(1L -> 2L), search("a", "a"))
    assert(search("a", "a", "a") == Map(1L -> 1L))
    assert(search("a", "b", "a") == Map(2L -> 2L))
    assert(search("a", "b") == Map(1L -> 1L, 2L -> 2L))
    assert(search("q", "r").isEmpty)
    // single term degenerates to term frequency
    assert(search("a") == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
    // term-sorted postings prune: a one-term read touches fewer files
    val all = lib.read("p__positions").inputFiles.length
    val one = lib.read("p__positions",
      exprFilter = Some(graft.query.Expr.col("term") ===
        graft.query.Expr.lit("z"))).inputFiles.length
    assert(all >= 3 && one < all, s"pruned $one of $all")
    intercept[IllegalArgumentException] {
      graft.functions.Retrieval.phraseSearch(lib, "p", Seq.empty)
    }
  }

  test("appendToPositionalIndex: split build+append equals the one-shot index") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"), (2L, "a b a b a"), (3L, "b a"),
      (4L, "x y z"), (5L, "a b")).toDF("doc_id", "text")
    val one = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-pos1-").toString, spark)
    graft.functions.Retrieval.buildPositionalIndex(
      one, docs, "p", "doc_id", "text", targetRows = 3L)
    val inc = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-pos2-").toString, spark)
    graft.functions.Retrieval.buildPositionalIndex(
      inc, docs.filter(col("doc_id") <= 2), "p", "doc_id", "text", targetRows = 3L)
    graft.functions.Retrieval.appendToPositionalIndex(
      inc, docs.filter(col("doc_id") === 3 || col("doc_id") === 4),
      "p", "doc_id", "text", targetRows = 3L)
    graft.functions.Retrieval.appendToPositionalIndex(
      inc, docs.filter(col("doc_id") === 5), "p", "doc_id", "text",
      targetRows = 3L)
    for (ph <- Seq(Seq("a", "b"), Seq("a"), Seq("a", "b", "a"), Seq("x", "y"))) {
      val a = graft.functions.Retrieval.phraseSearch(one, "p", ph)
        .as[(Long, Long)].collect().toMap
      val b = graft.functions.Retrieval.phraseSearch(inc, "p", ph)
        .as[(Long, Long)].collect().toMap
      assert(a == b, s"phrase $ph: one-shot $a vs incremental $b")
      assert(a.nonEmpty, s"vacuous phrase $ph")
    }
  }

  test("positional index compact: fewer files, pruning restored, results unchanged") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"t${i % 7} a t${i % 13} b c")).toDF("doc_id", "text")
    val lib = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-posc-").toString, spark)
    graft.functions.Retrieval.buildPositionalIndex(
      lib, docs.filter(col("doc_id") <= 20), "p", "doc_id", "text", targetRows = 40L)
    graft.functions.Retrieval.appendToPositionalIndex(
      lib, docs.filter(col("doc_id") > 20 && col("doc_id") <= 40),
      "p", "doc_id", "text", targetRows = 40L)
    graft.functions.Retrieval.appendToPositionalIndex(
      lib, docs.filter(col("doc_id") > 40), "p", "doc_id", "text", targetRows = 40L)
    val before = graft.functions.Retrieval.phraseSearch(lib, "p", Seq("a"))
      .as[(Long, Long)].collect().toMap
    val filesBefore = lib.read("p__positions").inputFiles.length
    lib.compact("p__positions", targetRows = 120L)
    val filesAfter = lib.read("p__positions").inputFiles.length
    assert(filesBefore >= 6 && filesAfter < filesBefore,
      s"compact $filesBefore -> $filesAfter")
    // globally term-sorted again: a one-term read prunes to fewer files
    val one = lib.read("p__positions",
      exprFilter = Some(graft.query.Expr.col("term") ===
        graft.query.Expr.lit("t1"))).inputFiles.length
    assert(one < filesAfter || filesAfter == 1, s"pruned $one of $filesAfter")
    val after = graft.functions.Retrieval.phraseSearch(lib, "p", Seq("a"))
      .as[(Long, Long)].collect().toMap
    assert(after == before)
  }

  test("bestSnippet: rolling window, ties to smallest start, short docs") {
    import spark.implicits._
    val docs = Seq(
      // best window [4..6]: x q q — 2 hits; earlier [3..5] has 2 too?
      // positions: 1:a 2:q 3:b 4:x 5:q 6:q — w=3: [1]=1 hit,
      // [2]=1, [3]=1, [4]=2 → start 4
      (1L, "a q b x q q"),
      // tie everywhere (no hits): smallest start 1, snippet = first 3
      (2L, "n o p r s"),
      // doc shorter than window: whole doc is the window
      (3L, "q z"),
      // empty text: single empty token, zero hits
      (4L, "")).toDF("id", "text")
    val got = Retrieval.bestSnippet(docs, "id", "text", Seq("q"), window = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, "x q q"),
      (2L, 1L, 0L, "n o p"),
      (3L, 1L, 1L, "q z"),
      (4L, 1L, 0L, "")), got)
  }

  test("bestSnippet is map-side and refuses an empty query") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    // Kernels.spread's round-robin repartition is the only legal
    // exchange (tiny-input parallelism); no KEYED shuffle, no join.
    val plan = Retrieval.bestSnippet(docs, "id", "text", Seq("a"), 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") &&
      !plan.contains("rangepartitioning") && !plan.contains("Join"), plan)
    intercept[IllegalArgumentException] {
      Retrieval.bestSnippet(docs, "id", "text", Seq.empty)
    }
  }

  test("hybridTopK: fused score is exactly the reported leg ranks' RRF") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Retrieval.hybridTopK(docs, "doc_id", "text",
      emb, "vec_id", "embedding",
      Seq("dup", "vector", "merge"), queryId = 3L, k = 15, legK = 50)
      .collect()
    assert(out.length == 15)
    out.foreach { r =>
      def rank(c: String): Option[Int] = {
        val i = r.fieldIndex(c)
        if (r.isNullAt(i)) None else Some(r.getInt(i))
      }
      val (lex, vec) = (rank("lex_rank"), rank("vec_rank"))
      assert(lex.isDefined || vec.isDefined, "doc surfaced by neither leg")
      // self-consistency: rrf_score is the nano-unit fusion of the
      // reported leg ranks — no hidden scoring path
      val nano = lex.map(x => math.round(1e9 / (60 + x))).getOrElse(0L) +
        vec.map(x => math.round(1e9 / (60 + x))).getOrElse(0L)
      assert(math.abs(r.getAs[Double]("rrf_score") - nano / 1e9) < 1e-12,
        s"score mismatch at $r")
    }
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 15),
      "fused ranks must be dense 1..k")
    val scores = out.map(_.getAs[Double]("rrf_score")).toSeq
    assert(scores == scores.sorted.reverse, "fused order must follow score")
    // a doc in both legs' top ranks must beat a doc one leg alone
    // surfaced at deep rank: 2/(60+legK) < 1/(60+1) + 1/(60+legK)
    val both = out.filter(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("vec_rank")))
    if (both.nonEmpty)
      assert(both.head.getAs[Double]("rrf_score") >= scores.last)

    // non-integral ids fail loudly — a silent string->long cast would
    // null the join keys and quietly unfuse the legs
    import spark.implicits._
    val strDocs = Seq(("a", "dup text")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.hybridTopK(strDocs, "doc_id", "text",
        emb, "vec_id", "embedding", Seq("dup"), queryId = 3L)
    }
  }
}
