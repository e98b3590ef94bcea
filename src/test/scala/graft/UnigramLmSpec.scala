package graft

import org.apache.spark.sql.functions._

import graft.functions.UnigramLm
import graft.plans.UnigramModel

/** Unigram-LM tokenizer ground truth: the closure kernel's Viterbi
  * against driver-side exhaustive enumeration, the determinism rules
  * (tie to the longest final piece, fallback totality), and the train
  * loop's invariants.
  */
class UnigramLmSpec extends SparkSuite {
  import spark.implicits._

  /** Exhaustive best segmentation: all segmentations with pieces in the
    * model, max total logp; ties first by... the kernel's rule is
    * "smallest predecessor at every DP position", which for a total tie
    * means the lexicographically-greedy-longest-last-piece path. For
    * fixtures we avoid score ties entirely (distinct logps), so argmax
    * is unique and rule-free.
    */
  private def bruteBest(word: String, m: Map[String, Long]): Option[(Long, List[String])] = {
    if (word.isEmpty) return Some((0L, Nil))
    val options = for {
      l <- 1 to word.length
      piece = word.take(l)
      lp <- m.get(piece).toSeq
      (s, rest) <- bruteBest(word.drop(l), m).toSeq
    } yield (lp + s, piece :: rest)
    if (options.isEmpty) None else Some(options.maxBy(_._1))
  }

  test("kernel Viterbi matches exhaustive enumeration on distinct-score fixtures") {
    val pieces = Array(
      "a" -> -5000000L, "b" -> -4000000L, "c" -> -3900000L,
      "ab" -> -2000000L, "bc" -> -1500000L, "abc" -> -1100000L,
      "cc" -> -2200000L)
    val m = new UnigramModel(pieces, maxWordLen = 16)
    val mm = pieces.toMap
    for (w <- Seq("abc", "abcc", "ccab", "babcc", "aabbcc", "cab", "abcabc")) {
      val got = {
        val seg = m.segmentWord(w)
        (0 until seg.size).map(seg.get).toList
      }
      val exp = bruteBest(w, mm).get._2
      assert(got == exp, s"word $w: $got vs $exp")
    }
  }

  test("ties resolve to the longest final piece; fallbacks are total") {
    // "ab" as one piece scores exactly a+b: tie → smallest predecessor
    // at the final position = the longer last piece wins
    val tied = new UnigramModel(Array(
      "a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L), 16)
    val seg = tied.segmentWord("ab")
    assert((0 until seg.size).map(seg.get) == Seq("ab"))
    // unknown char → whole word; over-length word → whole word
    val seg2 = tied.segmentWord("axb")
    assert((0 until seg2.size).map(seg2.get) == Seq("axb"))
    val longModel = new UnigramModel(Array("a" -> -1000000L), maxWordLen = 4)
    val seg3 = longModel.segmentWord("aaaaa")
    assert((0 until seg3.size).map(seg3.get) == Seq("aaaaa"))
    assert((0 until 4).forall { i =>
      val s = longModel.segmentWord("aaaa".take(i + 1)); s.size == i + 1
    })
  }

  test("train: chars always survive, vocab bounded, encode covers the corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "the the the quick quick fox")
    ).toDF("id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 60,
      maxPieceLen = 4, maxWordLen = 16, seedSize = 64, iters = 2)
      .localCheckpoint(true)
    val pieces = model.select("piece").as[String].collect().toSet
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= " ").distinct().as[String].collect().toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    assert(model.count() <= 60)
    // every logp is a negative micro-nat long; counts positive
    assert(model.filter(col("logp_mu") >= 0 || col("cnt") <= 0).isEmpty)
    val enc = UnigramLm.encode(docs, "id", "text", model)
    assert(enc.count() == 4)
    // concatenating pieces reproduces the text minus spaces (coverage:
    // every word segments, fallback or not)
    val glued = enc.join(docs, "id")
      .select(col("id"), concat_ws("", col("pieces")).as("g"),
        regexp_replace(col("text"), " ", "").as("t"))
    assert(glued.filter(col("g") =!= col("t")).isEmpty)
  }

  test("non-BMP: kernel DP runs over codepoints, matching SQL substr/length") {
    // supplementary-plane codepoints: 2 UTF-16 units each, 1 codepoint each
    val A = new String(Character.toChars(0x1D400)) // MATHEMATICAL BOLD CAPITAL A
    val B = new String(Character.toChars(0x1F600)) // GRINNING FACE
    val m = new UnigramModel(Array(
      A -> -1000000L, B -> -1200000L, (A + B) -> -1500000L), maxWordLen = 4)
    // the 2-codepoint piece beats the char path (-1.5M vs -2.2M)
    val seg = m.segmentWord(A + B + A)
    assert((0 until seg.size).map(seg.get) == Seq(A + B, A))
    // 4 codepoints = 8 UTF-16 units: inside the codepoint maxWordLen, segments
    val seg2 = m.segmentWord(A + B + A + B)
    assert((0 until seg2.size).map(seg2.get) == Seq(A + B, A + B))
    // 5 codepoints exceeds maxWordLen=4 -> whole-word fallback
    val seg3 = m.segmentWord(A + B + A + B + A)
    assert((0 until seg3.size).map(seg3.get) == Seq(A + B + A + B + A))
  }

  test("train + encode on a non-BMP (emoji) corpus glues back exactly") {
    val hi = new String(Character.toChars(0x1F600))
    val cat = new String(Character.toChars(0x1F431))
    val docs = Seq(
      (1L, s"$hi$cat $hi$hi word $cat"),
      (2L, s"word $hi$cat $hi$cat")
    ).toDF("id", "text")
    val model = UnigramLm.train(docs, "text", vocabSize = 30,
      maxPieceLen = 3, maxWordLen = 12, seedSize = 16, iters = 2)
      .localCheckpoint(true)
    val pieces = model.select("piece").as[String].collect().toSet
    assert(pieces.contains(hi) && pieces.contains(cat), s"chars missing from $pieces")
    // a learnable 2-codepoint (4 UTF-16 unit) piece survives training
    assert(pieces.exists(p => p.codePointCount(0, p.length) >= 2 && p.length >= 4),
      s"no supplementary multi-codepoint piece in $pieces")
    val enc = UnigramLm.encode(docs, "id", "text", model)
    val glued = enc.join(docs, "id")
      .select(concat_ws("", col("pieces")).as("g"),
        regexp_replace(col("text"), " ", "").as("t"))
    assert(glued.filter(col("g") =!= col("t")).isEmpty)
  }

  test("train is deterministic: two runs produce identical models") {
    val docs = Seq(
      (1L, "repeat repeat repeat words words here"),
      (2L, "other sentence with more words here")
    ).toDF("id", "text")
    def run() = UnigramLm.train(docs, "text", vocabSize = 40,
      maxPieceLen = 3, maxWordLen = 12, seedSize = 32, iters = 2)
      .orderBy("piece").as[(String, Long, Long)].collect().toSeq
    assert(run() == run())
  }
}
