package graft

import graft.functions.Clean

/** Composite rule-based cleanup: each rule individually cuts a planted
  * document while the control doc survives every rule (the driver gate
  * q92 replays the full rule set in DuckDB at sf scale).
  */
class CleanSpec extends SparkSuite {
  import spark.implicits._

  // One doc per rule violation + one control that passes everything.
  private val corpus = Seq(
    // 16 tokens, en markers, diverse 3-grams, no PII → survives
    (0L, "the cat sat on a mat and it is nice to see sun in the town"),
    // 2 tokens → cut by minTokens
    (1L, "tiny doc"),
    // Spanish markers dominate → cut by lang
    (2L, "el la que el la que uno dos tres cuatro cinco seis siete ocho"),
    // 4 distinct of 12 3-grams → rep_ratio 2/3 → cut by maxRepetition;
    // carries en markers so ONLY the repetition rule cuts it
    (3L, "the a is dup dup dup dup dup dup dup dup dup dup dup"),
    // en text with 2 PII hits → cut by maxPiiHits=1
    (4L, "the a is nice so contact bob@example.com and call 555-867-5309 now ok")
  ).toDF("doc_id", "text")

  private val rules = Clean.Rules(
    minTokens = 5, maxTokens = 50, minQuality = 0.0, maxRepetition = 0.5,
    repetitionN = 3, lang = Some("en"), maxPiiHits = 1)

  test("each rule cuts its planted doc; the control survives with signals") {
    val out = Clean.cleanCorpus(corpus, "doc_id", "text", rules)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L), out.mkString("\n"))
    val r = out.head
    assert(r.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_tokens", "quality", "rep_ratio", "lang_pred"))
    assert(r.getAs[Int]("n_tokens") == 16)
    assert(r.getAs[String]("lang_pred") == "en")
    assert(r.getAs[Double]("rep_ratio") == 0.0)
    assert(r.getAs[Double]("quality") > 0.5)
  }

  test("pluggable langId: a trained NB classifier drives the language rule") {
    import graft.functions.Unigram
    // labels disagree with the marker heuristic on purpose: the trained
    // model must win (xx-labeled docs carry 'el la que' marker text)
    val labeled = Seq(
      ("xx", "el la que el la que uno dos tres cuatro cinco seis siete"),
      ("xx", "el la que uno dos tres el la que cuatro cinco seis siete"),
      ("yy", "the cat sat on a mat and it is nice to see sun here"),
      ("yy", "the dog ran to a tree and it is good to see rain here")
    ).toDF("lang", "text")
    val m = Unigram.trainNbLang(labeled, "lang", "text", n = 3, minShare = 0.0005)
    // minTokens=5 additionally cuts doc 1 ("tiny doc"), whose all-OOV
    // text makes its NB prediction pure prior/floor noise
    val out = Clean.cleanCorpus(corpus, "doc_id", "text",
      Clean.Rules(minTokens = 5, lang = Some("xx")), Unigram.nbLangIdColumn(m))
    // doc 2 is the marker-Spanish doc: heuristic says 'es', the trained
    // model says 'xx' — only it survives the lang=xx rule
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L))
    assert(out.select("lang_pred").as[String].collect().toSet == Set("xx"))
  }

  test("dropBadBlocks: short and stopword-free blocks drop; stripped docs empty") {
    val docs = Seq(
      // block1 has stopwords, block2 (tail, 3 tokens) has none → drop b2
      (0L, "the cat sat on a mat and it is nice xx yy zz"),
      // every 10-token block stopword-free → fully stripped
      (1L, "one two three four five six seven eight nine ten"),
      // 2-token tail block with a stopword still drops on minBlockTokens
      (2L, "the aa bb cc dd ee ff gg hh ii the it")
    ).toDF("doc_id", "text")
    val got = Clean.dropBadBlocks(docs, "doc_id", "text", 10, 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, "the cat sat on a mat and it is nice"),
      (1L, ""),
      (2L, "the aa bb cc dd ee ff gg hh ii")), got)
  }

  test("defaults pass everything; single rules isolate") {
    val all = Clean.cleanCorpus(corpus, "doc_id", "text", Clean.Rules())
    assert(all.count() == 5)
    val noLang = Clean.cleanCorpus(corpus, "doc_id", "text",
      Clean.Rules(lang = Some("es")))
    assert(noLang.select("doc_id").as[Long].collect().toSet == Set(2L))
    val piiOnly = Clean.cleanCorpus(corpus, "doc_id", "text",
      Clean.Rules(maxPiiHits = 1))
    assert(!piiOnly.select("doc_id").as[Long].collect().contains(4L))
  }
  test("gopherRules: each rule isolates on a hand-crafted doc") {
    val base = "the quick brown fox jumps over the lazy dog again " * 5 // 50 words
    val docs = Seq(
      (0L, base.trim),                                   // keeper
      (1L, "the tiny doc"),                              // too few words
      (2L, base.trim + " aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 8), // long words
      (3L, base.trim + " # # # # # # # #"),              // symbols
      (4L, base.trim + "\n- one\n- two\n- three"),       // bullet lines
      (5L, base.trim + "\nto be continued..."),          // ellipsis line
      (6L, base.trim + (" 11 22 33" * 5)),               // numeric tokens
      (7L, ("zz yy xx ww vv " * 10).trim)                // no required stopword
    ).toDF("doc_id", "text")
    val got = graft.functions.Clean.gopherRules(docs, "doc_id", "text",
      graft.functions.Clean.GopherParams(
        minWords = 20, maxWords = 200, maxMeanWordLen = 6.0,
        maxSymbolRatio = 0.05, maxBulletLineFrac = 0.5,
        maxEllipsisLineFrac = 0.3, minAlphaWordFrac = 0.9,
        minRequiredStops = 1))
      .orderBy("doc_id").collect()
    val keep = got.map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    assert(keep == Map(0L -> true, 1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false, 7L -> false), keep)
    // signal sanity on the keeper
    val k = got.head
    assert(k.getInt(1) == 50)                      // n_words
    assert(k.getDouble(6) == 1.0)                  // alpha_word_frac
    assert(k.getInt(7) >= 1)                       // has 'the'
    // rule isolation: doc 4 fails ONLY the bullet rule
    val d4 = got(4)
    assert(d4.getDouble(4) == 0.75, d4)            // 3 bullet lines of 4
    assert(d4.getDouble(5) == 0.0)
  }

  test("extractHtmlText: comments, script traps, entities, whitespace") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script string containing tags must not end the block early
      (1L, "<p>a</p><script>var x = '<div>b</div>';</script><p>c</p>", "a c"),
      // style with newlines; multi-line comment
      (2L, "x<style>\np { a }\n</style><!-- y\nz -->w", "x w"),
      // entity decode order: &amp;lt; is the LITERAL &lt;
      (3L, "&amp;lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;b", "&lt;tag> \"q\" 'a' b"),
      // plain text passes through, whitespace collapsed
      (4L, "  hello\t\tworld \n", "hello world"),
      // attributes with > inside quotes are NOT handled (documented
      // simple-tag model) but ordinary attributes strip fine
      (5L, "<a href=\"u\" title='t'>link</a>", "link"),
      (6L, "<SCRIPT TYPE=\"text/javascript\">s</SCRIPT>done", "done"))
    val df = cases.map { case (id, h, _) => (id, h) }.toDF("id", "h")
    val got = df.select(col("id"),
        Clean.extractHtmlText(col("h")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id=$id got '${got(id)}'") }
  }

  test("canonicalUrl: case, ports, tracking params, fragments, slashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("HTTP://Site.Com:80/P/?utm_source=a&utm_medium=b&keep=1#f",
        Some("http://site.com/P/?keep=1")), // path case preserved
      ("https://a.com:443/p/", Some("https://a.com/p")),
      ("https://a.com:8443/p", Some("https://a.com:8443/p")), // non-default kept
      ("https://a.com/p?gclid=x", Some("https://a.com/p")),
      ("https://a.com/p?a=1&fbclid=z&b=2", Some("https://a.com/p?a=1&b=2")),
      ("https://a.com/", Some("https://a.com")), // root convention
      ("https://a.com/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4",
        Some("https://a.com/p")), // 4 adjacent tracked params, all gone
      ("/relative/x", None),
      ("mailto:a@b.c", None),
      ("ftp://a.com/x", None))
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), Clean.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"url=$u got ${got(u)}") }
  }
}
