package graft

import org.apache.spark.sql.functions._

import graft.functions.WordPiece

/** WordPiece tokenizer (q174/q175): the oracle gates replay training
  * and greedy encode at corpus scale; these pin the semantics on
  * hand-checkable fixtures — the likelihood score picking a DIFFERENT
  * merge than raw pair frequency would, greedy longest-match-first
  * walk, whole-word fallbacks (unknown position, >maxWordLen), and the
  * codepoint indexing discipline past the BMP.
  */
class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  test("train picks the likelihood argmax, not the most frequent pair") {
    // pair (a,b): c=10 but freq(a)=50 (padded by standalone 'a' words),
    // freq(b)=10 -> score 10/500 = 0.02
    // pair (x,y): c=5, freq(x)=freq(y)=5 -> score 5/25 = 0.2  <- winner
    val text = (Seq.fill(10)("ab") ++ Seq.fill(40)("a") ++ Seq.fill(5)("xy"))
      .mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val m = WordPiece.train(df, "text", 1).collect()
    assert(m.length == 1)
    val r = m.head
    assert((r.getString(1), r.getString(2)) == ("x", "y"),
      s"likelihood merge must win: got ${r.mkString(",")}")
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((5L, 5L, 5L)))
    // control: BPE's frequency rule picks (a, b) on the same corpus
    val bpe = graft.functions.Bpe.trainMerges(df, "text", 1).collect().head
    assert((bpe.getString(1), bpe.getString(2)) == ("a", "b"))
  }

  test("greedy longest-match encode with fallbacks; codepoints past the BMP") {
    val vocab = Seq("a", "b", "c", "ab", "abc", "😀", "😀😀").toDF("piece")
    val docs = Seq(
      (1L, "abcab"), // greedy: abc + ab (longest first, never a+b+c...)
      (2L, "abq"), // 'q' unknown -> whole-word fallback
      (3L, "a" * 17), // 17 codepoints > maxWordLen -> itself
      (4L, "😀😀 a😀"), // surrogate pairs: longest 😀😀; then a + 😀
      (5L, ""), // empty doc -> zero pieces
      (6L, "ab abc")) // word boundaries hard
      .toDF("doc_id", "text")
    val out = WordPiece.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getLong(2))).toMap
    assert(out(1L) == ((Seq("abc", "ab"), 2L)))
    assert(out(2L) == ((Seq("abq"), 1L)))
    assert(out(3L) == ((Seq("a" * 17), 1L)))
    assert(out(4L) == ((Seq("😀😀", "a", "😀"), 3L)))
    assert(out(5L) == ((Seq.empty[String], 0L)))
    assert(out(6L) == ((Seq("ab", "abc"), 2L)))
  }

  test("encode is map-side: no keyed shuffle, no join in the plan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val vocab = Seq("l", "o", "w", "e", "r", "lo").toDF("piece")
    val plan = WordPiece.encode(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan
    // the vocab rides the closure: a dictionary-join hash exchange
    // would break the model-in-closure contract (same pin as Bpe/
    // UnigramLm encode)
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

  test("vocab as a versioned symbol: retrain bumps, as-of pins the old tokenizer") {
    // The tokenizer-artifact story: a vocab is an ordinary DataFrame, so
    // the Library's versioning IS the model registry — retraining
    // commits a new version, and an as-of read reproduces last month's
    // tokenization bit-for-bit (the reproducibility a training pipeline
    // needs when a vocab refresh must not silently change old shards).
    val lib = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-wp-").toString, spark)
    val corpus = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    lib.write("wp_vocab",
      WordPiece.vocab(corpus, "text", WordPiece.train(corpus, "text", 1)))
    val encV0 = WordPiece.encode(corpus, "doc_id", "text",
      lib.read("wp_vocab")).select("doc_id", "n_pieces")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // retrain deeper -> v1; strictly more merge products, fewer pieces
    lib.write("wp_vocab",
      WordPiece.vocab(corpus, "text", WordPiece.train(corpus, "text", 3)))
    val encV1 = WordPiece.encode(corpus, "doc_id", "text",
      lib.read("wp_vocab")).select("doc_id", "n_pieces")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(encV1.values.sum < encV0.values.sum,
      "a deeper vocab must compress the corpus further")
    // the pinned version reproduces the ORIGINAL tokenization exactly
    val encOld = WordPiece.encode(corpus, "doc_id", "text",
      lib.read("wp_vocab", graft.core.Library.AsOf.Version(0)))
      .select("doc_id", "n_pieces")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(encOld == encV0)
  }

  test("vocab = corpus characters plus merge products") {
    val df = Seq((1L, "ab ab cd")).toDF("id", "text")
    val merges = WordPiece.train(df, "text", 1)
    val v = WordPiece.vocab(df, "text", merges)
      .collect().map(_.getString(0)).toSet
    // chars always present; exactly one product for one merge
    assert(Set("a", "b", "c", "d").subsetOf(v))
    assert(v.size == 5, s"expected 4 chars + 1 product, got $v")
  }
}
