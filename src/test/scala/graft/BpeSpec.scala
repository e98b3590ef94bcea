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
}
