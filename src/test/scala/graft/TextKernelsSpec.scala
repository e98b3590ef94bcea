package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Pins the codegen'd text-kernel fingerprints to concrete values so any
  * future refactor that changes them is a loud failure, not a silent
  * migration (nothing else gates rollingHash — no query or oracle uses it).
  */
class TextKernelsSpec extends SparkSuite {
  import spark.implicits._

  test("rollingHash: pinned values (base-31 mod 2^31-1 over normalized text)") {
    val rows = Seq(
      ("Hello, World!", 1835087470L), // normalizes to "hello world"
      ("  abc  ", 96354L), // trim
      ("!!!", 0L), // normalizes to empty → 0
      ("The   quick BROWN fox.", 2100222396L), // lowercase + collapse runs
      ("hello world", 1835087470L)) // already normal — same as punctuated form
    val got = rows.map(_._1).toDF("text")
      .select(Text.rollingHash(col("text")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map(_._2))
  }

  test("rollingHash agrees with a driver-side recomputation on real docs") {
    def driverHash(text: String): Long = {
      val norm = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
      norm.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 2147483647L)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Text.rollingHash(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    docs.foreach { case (id, text) => assert(got(id) == driverHash(text), s"doc $id") }
  }

  test("markerCounts matches wordCount's non-overlapping split semantics") {
    val rows = Seq(
      "the the the cat", // adjacent repeats: ' the the the ' → 2 windows
      "a a a a", // → 2
      "is", "", "no markers here at all",
      "la la le et der und 的")
    val markers = Text.LangMarkers.flatMap(_._2)
    val df = rows.toDF("text")
    val viaKernel = df.select(
      graft.plans.MarkerCounts(col("text"), markers).as("mc")).collect()
      .map(_.getSeq[Int](0).toSeq)
    val viaSplit = df.select(
      array(markers.map(m => Text.wordCount(col("text"), m)): _*).as("wc"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(viaKernel.toSeq == viaSplit.toSeq)
    // pinned: adjacent self-overlapping repeats count non-overlapping
    assert(viaKernel(0)(markers.indexOf("the")) == 2)
    assert(viaKernel(1)(markers.indexOf("a")) == 2)
  }

  test("SeqRedact equals the chained regexp_replace formulation") {
    val rows = Seq(
      "mail bob@x.com and carol@y.org call 555-123-4567 host 10.0.0.1",
      "user@10.0.0.7 is an IP hit", // no alpha TLD → EmailRe misses, Ipv4Re fires
      "<EMAIL> preexisting tag, no match",
      "nothing to redact", "")
    val df = rows.toDF("text")
    val k = graft.functions.Pii.piiKernel(col("text"))
    val got = df.select(k.getField("n_emails"), k.getField("n_phones"),
      k.getField("n_ips"), k.getField("clean")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val exp = df.select(
      size(split(regexp_replace(col("text"), graft.functions.Pii.EmailRe, graft.functions.Pii.EmailTag),
        java.util.regex.Pattern.quote(graft.functions.Pii.EmailTag))) - 1 -
        (size(split(col("text"), java.util.regex.Pattern.quote(graft.functions.Pii.EmailTag))) - 1),
      lit(0), lit(0), // counts checked via the email column + clean text
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        graft.functions.Pii.EmailRe, graft.functions.Pii.EmailTag), graft.functions.Pii.PhoneRe, graft.functions.Pii.PhoneTag),
        graft.functions.Pii.Ipv4Re, graft.functions.Pii.IpTag)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1, s"email count: $g vs $e")
      assert(g._4 == e._4, s"clean text: $g vs $e")
    }
    // pinned attribution: a dotted-quad "email host" has no alpha TLD, so
    // the IP category claims it; a pre-existing tag literal never counts
    assert(got(1) == ((0, 0, 1, "user@<IP> is an IP hit")))
    assert(got(2) == ((0, 0, 0, "<EMAIL> preexisting tag, no match")))
  }
  test("calibration hooks: custom stopword/marker/threshold tables") {
    val df = Seq(
      (1L, "foo bar the baz foo"),
      (2L, "le chat et la table et le livre")).toDF("id", "text")
    // custom stopwords flow through both the regex ratio and the fused
    // kernel struct, and the two formulations agree
    val custom = Seq("foo", "bar")
    val got = df.select(
      Text.stopwordRatio(col("text"), custom).as("r"),
      Text.stopwordRatioOf(Text.textStats(col("text"), custom)).as("rk"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got(0)._1 == 0.6 && got(0)._2 == 0.6, got(0)) // foo, bar, foo / 5
    assert(got(1)._1 == 0.0 && got(1)._2 == 0.0)
    // default tables unchanged: "the" counts, "foo" does not
    val dflt = df.select(Text.stopwordRatio(col("text"))).head.getDouble(0)
    assert(dflt == 0.2, dflt)
    // custom marker table: a French-only classifier sees fr, never en
    val frOnly = Seq("fr" -> Seq("le", "et"), "en" -> Seq("the"))
    val langs = df.select(Text.langId(col("text"), frOnly)).collect().map(_.getString(0))
    assert(langs.toSeq == Seq("en", "fr"), langs.toSeq) // doc 1 has "the"
    // custom thresholds move the score; defaults reproduce the old value
    val p = Text.QualityParams(targetTokens = 5.0, stopMultiplier = 1.0,
      mtlMin = 1.0, mtlMax = 100.0, stopwords = custom)
    val q = df.select(
      Text.qualityScore(col("text"), p).as("a"),
      Text.qualityScoreOf(Text.textStats(col("text"), custom), p).as("b"),
      Text.qualityScore(col("text")).as("d"))
      .head()
    assert(q.getDouble(0) == q.getDouble(1), q)
    // doc 1 with p: lengthScore 1.0 (5/5), stopScore 0.6, lenOk 1.0 -> 0.866667
    assert(q.getDouble(0) == 0.866667, q)
    assert(q.getDouble(2) != q.getDouble(0))
  }

  test("exciseSpans kernel: merge-sweep, empty tokens, boundary spans") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def run(text: String, starts: Seq[Long], span: Int): String =
      graft.plans.TextKernels.exciseSpans(UTF8String.fromString(text),
        new GenericArrayData(starts.toArray), span).toString
    // single span mid-string
    assert(run("a b c d e", Seq(2L), 2) == "a d e")
    // overlapping spans fold into one interval
    assert(run("a b c d e f", Seq(1L, 2L), 3) == "e f")
    // span touching the last token
    assert(run("a b c d", Seq(3L), 2) == "a b")
    // full coverage -> empty string
    assert(run("a b c", Seq(1L), 3) == "")
    // no starts -> identity, including consecutive-space empty tokens
    assert(run("a  b", Seq.empty, 2) == "a  b")
    // empty token at a covered position drops like any token: "a::b"
    // splits to [a, "", "", b]; covering positions 2..3 keeps "a b"
    assert(run("a   b", Seq(2L), 2) == "a b")
    // start past the end is inert
    assert(run("a b", Seq(9L), 2) == "a b")
  }

  test("gramHashes kernel == Column formulation (md5-h60 and xxhash64)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // tricky shapes: runs of spaces (empty tokens), leading/trailing
    // spaces, short docs, unicode multi-byte, exactly-spanWords docs
    val docs = Seq(
      "alpha beta gamma delta epsilon",
      "a  b   c d e",           // empty tokens are positions
      " leading and trailing ",
      "short doc",              // < spanWords -> no grams
      "",                       // single empty token
      "caf\u00e9 na\u00efve \u4e2d\u6587 tokens here",
      "x y z w"                 // exactly spanWords tokens -> 1 gram
    ).toDF("text")
    val span = 4
    def columnFormulation(portable: Boolean) = {
      val w = split(col("text"), " ", -1)
      val gh: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (portable) c => conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
        else c => xxhash64(c)
      when(size(w) >= span,
        transform(sequence(lit(1), size(w) - span + 1),
          start => gh(concat_ws(" ", slice(w, start, lit(span))))))
        .otherwise(array().cast("array<long>"))
    }
    for (portable <- Seq(true, false)) {
      val got = docs.select(
        graft.plans.GramHashes(col("text"), span, portable).as("k"),
        columnFormulation(portable).as("c"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"portable=$portable: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }

  test("normalizeUnicode: NFC composition, casing, explicit whitespace class") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "Cafe\u0301", "caf\u00e9"), // decomposed -> precomposed
      (2L, "caf\u00e9", "caf\u00e9"), // already NFC: unchanged
      (3L, "A\u0308  B\tC\n", "\u00e4 b c"), // diaeresis + ws collapse
      (4L, "plain ascii  text", "plain ascii text"))
    val df = cases.map { case (id, r, _) => (id, r) }.toDF("id", "raw")
    val got = df.select(col("id"),
        graft.functions.Text.normalizeUnicode(col("raw")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id=$id got ${got(id).codePoints().toArray.toSeq}") }
    // idempotent
    val twice = df.select(graft.functions.Text.normalizeUnicode(
      graft.functions.Text.normalizeUnicode(col("raw"))).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == cases.map(_._3).map(w => w))
  }

  test("scriptProfile: per-script counts, dominance, ties, non-BMP") {
    import org.apache.spark.sql.functions.col
    def profile(s: String): (Seq[Long], String) = {
      val r = Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.Text.scriptProfile(col("t")).as("p"))
        .select("p.*").collect().head
      ((0 to 8).map(r.getLong), r.getString(9))
    }
    // ab ×2 latin, é latin (0xC0-0x24F), 1 digit, αβ greek, бв cyrillic,
    // ا arabic, 한 hangul, 中 cjk, か kana→cjk, tab+spaces, € other
    val (c, dom) = profile("abé1 αβ бв ا 한 中か\t€")
    assert(c == Seq(3L, 1L, 2L, 2L, 1L, 1L, 2L, 6L, 1L), c)
    assert(dom == "latin")
    // tie at 2: cjk vs cyrillic vs greek → alphabetically first = cjk
    assert(profile("αβ бв 中か")._2 == "cjk")
    // all-zero scripts → none (digits/space/other don't count)
    assert(profile("123 .,;")._2 == "none")
    assert(profile("")._1.forall(_ == 0L))
    // non-BMP (U+20000, CJK ext B — outside the explicit ranges) steps
    // as ONE codepoint into other, not two broken surrogates
    val (c2, _) = profile(new String(Character.toChars(0x20000)))
    assert(c2 == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L), c2)
  }
}
