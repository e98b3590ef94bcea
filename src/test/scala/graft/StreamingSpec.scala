package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Library
import graft.query.QueryBuilder
import graft.streaming.StreamIngest

/** Structured Streaming: staged ingestion into the versioned store and
  * streaming resample/dedup agreeing with their batch counterparts.
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val H = 3600L * 1000000000L // 1h in ns

  test("stageSink micro-batches + finalize publish one sorted version") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "value")
    val lib = new Library(tmp("graft-stream-lib-"), spark)
    val ckpt = tmp("graft-stream-ckpt-")

    mem.addData((1L, 3L * H, 1.0), (2L, 1L * H, 2.0))
    val q1 = StreamIngest.stageSink(lib, "ev", df, ckpt, Trigger.AvailableNow()).start()
    q1.awaitTermination()
    // second incremental run on the same checkpoint only stages new data
    mem.addData((3L, 2L * H, 3.0))
    val q2 = StreamIngest.stageSink(lib, "ev", df, ckpt, Trigger.AvailableNow()).start()
    q2.awaitTermination()

    lib.sortAndFinalizeStaged("ev", Some("ts"))
    val back = lib.read("ev", withRowId = true).orderBy(Library.RowIdCol).collect()
    assert(back.map(_.getAs[Long]("event_id")).toSeq == Seq(2L, 3L, 1L)) // ts order
    assert(back.length == 3) // exactly-once: batch 1 not re-staged
  }

  test("time-ordered stream + splice finalize publishes with zero rewrite") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "value")
    val lib = new Library(tmp("graft-splice-lib-"), spark)
    val ckpt = tmp("graft-splice-ckpt-")

    // event time advances across batches (the common ingest shape); each
    // batch is range-sorted by the sink, so deltas are file-disjoint
    mem.addData((1L, 1L * H, 1.0), (2L, 2L * H, 2.0))
    StreamIngest.stageSink(lib, "ev", df, ckpt, Trigger.AvailableNow(),
      sortBatchesBy = Some("ts")).start().awaitTermination()
    mem.addData((3L, 3L * H, 3.0), (4L, 4L * H, 4.0))
    StreamIngest.stageSink(lib, "ev", df, ckpt, Trigger.AvailableNow(),
      sortBatchesBy = Some("ts")).start().awaitTermination()

    lib.finalizeStaged("ev", Some("ts")) // splice: rename + commit, no rewrite
    val m = lib.resolveVersion("ev")
    assert(m.sorted && m.rowCount == 4)
    assert(lib.read("ev").orderBy("ts").select("event_id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // a late out-of-order batch is rejected by append-mode finalize (both
    // paths validate start-after-stored-max, the reference's append rule;
    // late data goes through update) — staging stays intact for triage
    mem.addData((5L, 1L * H + 5L, 5.0))
    StreamIngest.stageSink(lib, "ev", df, ckpt, Trigger.AvailableNow(),
      sortBatchesBy = Some("ts")).start().awaitTermination()
    intercept[Exception](lib.finalizeStaged("ev", mode = "append"))
    assert(lib.read("ev").count() == 4)
    assert(lib.getStagedSymbols() == Seq("ev"))
  }

  test("mergeSink upserts micro-batches into a versioned symbol by key") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF.toDF("k", "v")
    val lib = new Library(tmp("graft-merge-lib-"), spark)
    lib.write("state", Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v"),
      Some("k"), targetRows = 10)
    val ckpt = tmp("graft-merge-ckpt-")

    mem.addData((2L, 20.0), (4L, 40.0)) // update k=2, insert k=4
    val q1 = StreamIngest.mergeSink(lib, "state", df, ckpt, Trigger.AvailableNow(), 10).start()
    q1.awaitTermination()
    mem.addData((1L, 10.0)) // second incremental batch updates k=1 only
    val q2 = StreamIngest.mergeSink(lib, "state", df, ckpt, Trigger.AvailableNow(), 10).start()
    q2.awaitTermination()

    val got = lib.read("state").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0, 3L -> 3.0, 4L -> 40.0))
    assert(lib.listVersions("state").size == 3) // write + one version per batch
  }

  test("mergeSink write-creates a missing symbol from the first batch when given indexCol") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF.toDF("k", "v")
    val lib = new Library(tmp("graft-merge-create-lib-"), spark)
    val ckpt = tmp("graft-merge-create-ckpt-")

    // fresh CDC stream against an empty store: first batch creates the
    // symbol, later batches merge into it
    mem.addData((1L, 1.0), (2L, 2.0))
    val q1 = StreamIngest.mergeSink(lib, "cdc", df, ckpt, Trigger.AvailableNow(), 10,
      indexCol = Some("k")).start()
    q1.awaitTermination()
    mem.addData((2L, 20.0), (3L, 30.0))
    val q2 = StreamIngest.mergeSink(lib, "cdc", df, ckpt, Trigger.AvailableNow(), 10,
      indexCol = Some("k")).start()
    q2.awaitTermination()
    val got = lib.read("cdc").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("resampleStream emits the same buckets as the batch resample") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF.toDF("ts", "value")

    val rows = Seq(
      (1L * H + 5L, 1.0), (1L * H + 7L, 2.0), // bucket 1h
      (2L * H + 1L, 10.0), // bucket 2h
      (3L * H + 9L, 5.0)) // bucket 3h
    val out = StreamIngest.resampleStream(stream, "ts", "1h",
      Seq(("v_sum", "value", "sum"), ("n", "value", "count")), "1 second")
    val q = out.writeStream.format("memory").queryName("res")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // push the watermark far past every real bucket so they all emit
    mem.addData((100L * H, 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("res")
      .filter(col("ts") < 50L * H)
      .select("ts", "v_sum", "n")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val batch = QueryBuilder()
      .resample("ts", "1h", Seq(("v_sum", "value", "sum"), ("n", "value", "count")))(
        rows.toDF("ts", "value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming sessionization matches the batch operator") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF.toDF("user_id", "ts", "value")
    val M = 60L * 1000000000L // 1 min in ns
    val rows = Seq(
      (1L, 0L * M, 1.0), (1L, 10L * M, 2.0), // session A (gap 10m < 30m)
      (1L, 50L * M, 3.0), // session B (gap 40m)
      (2L, 5L * M, 4.0)) // user 2, one session
    val out = StreamIngest.sessionsStream(stream, "ts", Seq("user_id"), "30 minutes",
      Seq(("n", "value", "count"), ("v_sum", "value", "sum")), "1 second")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    mem.addData((3L, 10000L * M, 0.0)) // watermark flush
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess").filter(col("user_id") < 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.operators.Sessionize.sessions(
      rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"), "30 minutes",
      Seq(("n", "value", "count"), ("v_sum", "value", "sum")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.map(t => (t._1, t._3)) == Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("dropDuplicatesStream keeps one row per fingerprint within watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF.toDF("id", "ts", "text")
    val out = StreamIngest.dropDuplicatesStream(stream, "text", "ts", "1 second")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData(
      (1L, 1L * H, "Hello, World!"),
      (2L, 1L * H + 5L, "hello world"), // same fingerprint (normalization)
      (3L, 1L * H + 9L, "something else"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("id").as[Long].collect().toSet
    assert(ids.contains(3L))
    assert(ids.intersect(Set(1L, 2L)).size == 1) // exactly one of the dup pair
  }

  test("tokenBudgetStream admits the per-domain prefix and carries state across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val stream = mem.toDF.toDF("source", "doc_id", "text")
    val out = StreamIngest.tokenBudgetStream(stream, "doc_id", "text", "source", 5L)
    val q = out.writeStream.format("memory").queryName("budget")
      .outputMode("append").start()
    // batch 1 — domain a: three 2-token docs fed OUT of id order; admission
    // is by id order, running total counts every seen doc (cum 2,4,6 → ids
    // 1,2 admitted, 3 over budget). domain b: one 4-token doc (cum 4).
    mem.addData(("a", 2L, "w w"), ("a", 1L, "w w"), ("a", 3L, "w w"),
      ("b", 10L, "x x x x"))
    q.processAllAvailable()
    // batch 2 — a's stream has already carried 6 tokens: even a 1-token doc
    // is rejected (state crossed the budget). b sits at 4: id 11 (1 token,
    // cum 5) fits exactly; id 12 (cum 7) does not.
    mem.addData(("a", 4L, "w"), ("b", 11L, "y"), ("b", 12L, "z z"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("budget").select("domain", "doc_id")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L)))
  }

  test("piiScrubStream output is row-identical to the batch Pii.scan") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "mail bob@example.com and 10.0.0.1"),
      (2L, "call +1-555-123-4567 twice +1-555-123-4567"),
      (3L, "clean document, no pii at all"),
      (4L, "pre-tagged [EMAIL] plus real a@b.co"))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    val out = StreamIngest.piiScrubStream(stream, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("piiscrub")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("piiscrub")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    val batch = graft.functions.Pii
      .scan(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(streamed == batch && streamed.size == rows.size)
    // the pre-tagged literal [EMAIL] is not counted; the real address is
    assert(streamed.find(_._1 == 4L).get._2 == 1)
  }

  test("cleanStream applies the full rule set identically to the batch operator") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (0L, "the cat sat on a mat and it is nice to see sun in the town"),
      (1L, "tiny doc"), // cut: minTokens
      (2L, "el la que el la que uno dos tres cuatro cinco seis"), // cut: lang
      (3L, "the a is so contact bob@x.com or carol@y.org right now ok")) // cut: pii
    val rules = graft.functions.Clean.Rules(
      minTokens = 5, maxRepetition = 0.9, lang = Some("en"), maxPiiHits = 1)
    val mem = MemoryStream[(Long, String)]
    val out = StreamIngest.cleanStream(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", rules)
    val q = out.writeStream.format("memory").queryName("cleanstream")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cleanstream")
      .as[(Long, Int, Double, Double, String)].collect().toSet
    val batch = graft.functions.Clean
      .cleanCorpus(rows.toDF("doc_id", "text"), "doc_id", "text", rules)
      .as[(Long, Int, Double, Double, String)].collect().toSet
    assert(streamed == batch && streamed.map(_._1) == Set(0L))
  }

  test("decontaminateSubstringStream equals the batch operator row-for-row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // shares 'beta gamma delta' → drop
      (1L, "one two three four five six"),
      (2L, "Beta, GAMMA delta!! unrelated tail here"), // normalized overlap → drop
      (3L, "zeta epsilon delta gamma beta alpha")) // reversed: no shared 3-gram
    val eval = Seq((100L, "xx beta gamma delta yy")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = StreamIngest.decontaminateSubstringStream(
      mem.toDF.toDF("doc_id", "text"), eval, "doc_id", "text", 3)
    val q = out.writeStream.format("memory").queryName("deconstream")
      .outputMode("append").start()
    mem.addData(corpus: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("deconstream")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.functions.Dedup
      .decontaminateSubstring(corpus.toDF("doc_id", "text"), eval, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && streamed == Set(1L, 3L), s"streamed=$streamed")
    // the bound is a hard gate, not advice
    intercept[IllegalArgumentException] {
      StreamIngest.decontaminateSubstringStream(
        mem.toDF.toDF("doc_id", "text"), eval, "doc_id", "text", 3, maxShingles = 1)
    }
  }

  test("ledgerSink: streamed increments equal the one-shot batch ledger") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val df = mem.toDF.toDF("doc_id", "text", "dom")
    val lib = new Library(tmp("graft-ledger-stream-"), spark)
    val ckpt = tmp("graft-ledger-ckpt-")
    val rows1 = Seq((1L, "alpha beta gamma", "a"), (2L, "delta", "b"))
    val rows2 = Seq((3L, "epsilon zeta alpha", "a"), (4L, "eta", "c"))
    mem.addData(rows1: _*)
    StreamIngest.ledgerSink(lib, df, "text", "dom", "led", ckpt, p = 8,
      portable = true).start().awaitTermination()
    mem.addData(rows2: _*)
    StreamIngest.ledgerSink(lib, df, "text", "dom", "led", ckpt, p = 8,
      portable = true).start().awaitTermination()
    val streamed = graft.functions.CorpusStats.readLedger(lib, "led")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val oneShotLib = new Library(tmp("graft-ledger-oneshot-"), spark)
    graft.functions.CorpusStats.buildLedger(oneShotLib,
      (rows1 ++ rows2).toDF("doc_id", "text", "dom"), "text", "dom", "led",
      p = 8, portable = true)
    val oneShot = graft.functions.CorpusStats.readLedger(oneShotLib, "led")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(streamed == oneShot)
    assert(streamed.keySet == Set("a", "b", "c"))
  }

  test("dedupAdmitSink: per-batch dedup against the growing corpus + index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF.toDF("doc_id", "text")
    val lib = new Library(tmp("graft-admit-lib-"), spark)
    val ckpt = tmp("graft-admit-ckpt-")
    val base = "the quick brown fox jumps over the lazy dog and then naps"
    def distinct(i: Long) =
      s"document number $i speaks entirely about topic_$i in its own terms " +
        s"word_${i}_a word_${i}_b word_${i}_c word_${i}_d word_${i}_e"
    // seed corpus + index with docs 1..3 (doc 1 is the near-dup magnet)
    val seed = Seq((1L, base), (2L, distinct(2)), (3L, distinct(3)))
      .toDF("doc_id", "text")
    lib.write("corpus", seed, Some("doc_id"))
    graft.functions.Dedup.buildMinhashIndex(
      lib, seed, "doc_id", "text", "mhidx")

    // batch 1: 10 = near-dup of seed doc 1 (drop), 11 = fresh (admit),
    // 12 ≈ 11 within-batch (drop), 2 = id already in corpus (replay guard)
    mem.addData((10L, base + " zzz"), (11L, distinct(11)),
      (12L, distinct(11) + " tail"), (2L, "replayed row, any text"))
    val q1 = StreamIngest.dedupAdmitSink(lib, df, "mhidx", "corpus",
      "doc_id", "text", threshold = 0.5, ckpt).start()
    q1.awaitTermination()
    val after1 = lib.read("corpus").select("doc_id").as[Long].collect().toSet
    assert(after1 == Set(1L, 2L, 3L, 11L), s"after1=$after1")

    // batch 2: 20 = near-dup of doc 11 ADMITTED IN BATCH 1 — only caught
    // if batch 1 advanced the index; 21 = fresh
    mem.addData((20L, distinct(11) + " coda"), (21L, distinct(21)))
    val q2 = StreamIngest.dedupAdmitSink(lib, df, "mhidx", "corpus",
      "doc_id", "text", threshold = 0.5, ckpt).start()
    q2.awaitTermination()
    val after2 = lib.read("corpus").select("doc_id").as[Long].collect().toSet
    assert(after2 == Set(1L, 2L, 3L, 11L, 21L), s"after2=$after2")
    // the index grew in lockstep: band rows exist for every admitted doc
    val indexed = lib.read("mhidx__bands").select("id").as[Long]
      .collect().toSet
    assert(indexed == Set(1L, 2L, 3L, 11L, 21L), s"indexed=$indexed")
  }

  test("dedupAdmitSink heals a crash between the corpus append and the index fold") {
    // r20 review seam: pre-fix, a batch whose corpus append landed but
    // whose index fold crashed left its documents signature-less FOREVER
    // (the replay anti-joined them away as already-seen) — every later
    // near-duplicate of them admitted. The guard+heal must fold the
    // stranded signatures on replay, and nothing else (the crashed run
    // already made this batch's admission decisions).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF.toDF("doc_id", "text")
    val lib = new Library(tmp("graft-heal-lib-"), spark)
    val ckpt = tmp("graft-heal-ckpt-")
    def distinct(i: Long) =
      s"document number $i speaks entirely about topic_$i in its own terms " +
        s"word_${i}_a word_${i}_b word_${i}_c word_${i}_d word_${i}_e"
    val seed = Seq((1L, distinct(1)), (2L, distinct(2))).toDF("doc_id", "text")
    lib.write("corpus", seed, Some("doc_id"))
    graft.functions.Dedup.buildMinhashIndex(lib, seed, "doc_id", "text", "mh2")

    // SIMULATED CRASH STATE of batch 0 over rows (40, 41, 42≈40): the
    // run admitted {40, 41} (42 dropped as a within-batch near-dup),
    // appended them to the corpus WITH the batch-0 stamp, then died
    // before appendToMinhashIndex.
    val g0 = Library.ReplayGuard.forCheckpoint(ckpt, 0,
      Some(spark.sparkContext.hadoopConfiguration))
    lib.append("corpus",
      Seq((40L, distinct(40)), (41L, distinct(41))).toDF("doc_id", "text"),
      validateIndex = false,
      extraMetadata = Map(Library.ReplayGuardKey -> g0.stampValue))
    assert(lib.read("mh2__bands").filter(col("id") >= 40L).isEmpty,
      "premise: the index fold never happened")

    // REPLAY batch 0 (fresh checkpoint => batchId 0, same rows)
    mem.addData((40L, distinct(40)), (41L, distinct(41)),
      (42L, distinct(40) + " tail"))
    val q = StreamIngest.dedupAdmitSink(lib, df, "mh2", "corpus",
      "doc_id", "text", threshold = 0.5, ckpt).start()
    q.awaitTermination()
    val corpusIds = lib.read("corpus").select("doc_id").as[Long].collect().toSet
    assert(corpusIds == Set(1L, 2L, 40L, 41L),
      s"heal must not re-admit or double-append: $corpusIds")
    val indexed = lib.read("mh2__bands").select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 40L, 41L), s"stranded signatures folded: $indexed")

    // batch 1: a near-dup of the previously-STRANDED doc 40 must now
    // drop — the recall the pre-fix pipeline silently lost
    mem.addData((50L, distinct(40) + " coda"), (51L, distinct(51)))
    val q2 = StreamIngest.dedupAdmitSink(lib, df, "mh2", "corpus",
      "doc_id", "text", threshold = 0.5, ckpt).start()
    q2.awaitTermination()
    val after = lib.read("corpus").select("doc_id").as[Long].collect().toSet
    assert(after == Set(1L, 2L, 40L, 41L, 51L), s"after=$after")
  }

  test("dedupAdmitSink heal survives a maintenance commit between crash and restart") {
    // ADVICE r20: the heal probe read only the LATEST corpus manifest's
    // stamp — any commit between the crash and the restart (compact,
    // writeMetadata, a second writer) erased it, the replay took the
    // normal branch, anti-joined the stranded docs away as already-seen,
    // and the signatures were lost forever. foldStamps' version lookback
    // must see through the maintenance commit.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF.toDF("doc_id", "text")
    val lib = new Library(tmp("graft-healm-lib-"), spark)
    val ckpt = tmp("graft-healm-ckpt-")
    def distinct(i: Long) =
      s"document number $i speaks entirely about topic_$i in its own terms " +
        s"word_${i}_a word_${i}_b word_${i}_c word_${i}_d word_${i}_e"
    val seed = Seq((1L, distinct(1)), (2L, distinct(2))).toDF("doc_id", "text")
    lib.write("corpus", seed, Some("doc_id"))
    graft.functions.Dedup.buildMinhashIndex(lib, seed, "doc_id", "text", "mh3")
    val g0 = Library.ReplayGuard.forCheckpoint(ckpt, 0,
      Some(spark.sparkContext.hadoopConfiguration))
    lib.append("corpus",
      Seq((40L, distinct(40)), (41L, distinct(41))).toDF("doc_id", "text"),
      validateIndex = false,
      extraMetadata = Map(Library.ReplayGuardKey -> g0.stampValue))
    // the maintenance window: a metadata-only commit lands AFTER the
    // stamped append, so the latest manifest no longer carries the stamp
    lib.writeMetadata("corpus", Map("maintenance" -> "census"))
    assert(lib.lastFoldStamp("corpus").isEmpty,
      "premise: the latest manifest's stamp is erased")
    assert(lib.foldStamps("corpus").exists(
      Library.ReplayGuard.alreadyFolded(_, g0)),
      "the lookback probe still sees the stamped append")

    mem.addData((40L, distinct(40)), (41L, distinct(41)))
    val q = StreamIngest.dedupAdmitSink(lib, df, "mh3", "corpus",
      "doc_id", "text", threshold = 0.5, ckpt).start()
    q.awaitTermination()
    val corpusIds = lib.read("corpus").select("doc_id").as[Long].collect().toSet
    assert(corpusIds == Set(1L, 2L, 40L, 41L),
      s"heal must not re-admit or double-append: $corpusIds")
    val indexed = lib.read("mh3__bands").select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 40L, 41L),
      s"stranded signatures folded despite the maintenance commit: $indexed")
  }

  test("retrievalIndexSink folds are replay-idempotent, including a crash between the two commits") {
    // The foreachBatch body IS appendToBm25Index/appendToPositionalIndex
    // with the checkpoint-scoped batchId as replayGuard — drive those
    // directly to place the "crash" exactly where micro-batch replay
    // would re-enter.
    import graft.functions.Retrieval
    def g(b: Long) = Some(Library.ReplayGuard("ck", b))
    val b1 = Seq((1L, "a a a b"), (2L, "a b a b a")).toDF("doc_id", "text")
    val b2 = Seq((3L, "b a"), (4L, "x y z a")).toDF("doc_id", "text")
    val all = Seq((1L, "a a a b"), (2L, "a b a b a"), (3L, "b a"),
      (4L, "x y z a")).toDF("doc_id", "text")
    val lib = new Library(tmp("graft-replay-"), spark)

    // batch 0 folds, then REPLAYS verbatim: both symbols must skip —
    // not just end value-equal, but commit NO new version
    Retrieval.appendToBm25Index(lib, b1, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = g(0))
    val vPost0 = lib.latestVersion("lex__postings").get
    val vStat0 = lib.latestVersion("lex__stats").get
    Retrieval.appendToBm25Index(lib, b1, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = g(0))
    assert(lib.latestVersion("lex__postings").get == vPost0 &&
      lib.latestVersion("lex__stats").get == vStat0,
      "a replayed batch must not commit anything")

    // batch 1 folds fully, then the stats half is rolled back to the
    // pre-batch version — EXACTLY the crash-between-the-two-commits
    // state (postings appended + stamped 1, stats still stamped 0)
    Retrieval.appendToBm25Index(lib, b2, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = g(1))
    val vPost1 = lib.latestVersion("lex__postings").get
    lib.delete("lex__stats", Seq(lib.latestVersion("lex__stats").get))
    assert(lib.lastFoldStamp("lex__stats").contains("ck:0") &&
      lib.lastFoldStamp("lex__postings").contains("ck:1"), "crash state")

    // replay of batch 1 HEALS: postings skip (no tf/df double-post),
    // stats re-merge from the pre-crash version
    Retrieval.appendToBm25Index(lib, b2, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = g(1))
    assert(lib.latestVersion("lex__postings").get == vPost1,
      "replay double-appended postings")
    val one = new Library(tmp("graft-replay1-"), spark)
    Retrieval.buildBm25Index(one, all, "doc_id", "text", "lex", targetRows = 3L)
    val got = Retrieval.bm25Indexed(lib, "lex", Seq("a", "b")).collect().toSeq
    val want = Retrieval.bm25Indexed(one, "lex", Seq("a", "b")).collect().toSeq
    assert(got == want, s"\nhealed: $got\noneshot: $want")

    // positional: replay of a delivered batch commits nothing
    Retrieval.appendToPositionalIndex(lib, b1, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = g(0))
    val vPos = lib.latestVersion("lex__positions").get
    Retrieval.appendToPositionalIndex(lib, b1, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = g(0))
    assert(lib.latestVersion("lex__positions").get == vPos)
  }

  test("replay-guard scope survives FS-qualification failure (structural fallback)") {
    import org.apache.hadoop.conf.Configuration
    // a conf whose FileSystem init THROWS (bogus impl class, cache off)
    // — the transient-failure path forCheckpoint's fallback covers
    def broken(defaultFs: String): Configuration = {
      val c = new Configuration()
      c.set("fs.defaultFS", defaultFs)
      c.set("fs.file.impl", "no.such.FileSystemImpl")
      c.set("fs.hdfs.impl", "no.such.FileSystemImpl")
      c.setBoolean("fs.file.impl.disable.cache", true)
      c.setBoolean("fs.hdfs.impl.disable.cache", true)
      c
    }
    def okConf(defaultFs: String): Configuration = {
      val c = new Configuration()
      c.set("fs.defaultFS", defaultFs)
      c
    }
    def scope(p: String, conf: Option[Configuration]): String =
      Library.ReplayGuard.forCheckpoint(p, 0L, conf).scope
    // scheme-less absolute path: fallback must produce the SAME scope
    // the qualified run stamped, else the crash-replayed batch
    // double-folds
    assert(scope("/tmp/ck", Some(okConf("file:///"))) ==
      scope("/tmp/ck", Some(broken("file:///"))),
      "qualified and fallback scopes must agree for scheme-less paths")
    // scheme-ful authority-less path: the fallback fills the authority
    // from a SAME-scheme defaultFS, exactly like makeQualified
    assert(scope("hdfs:/ckpts/x", Some(broken("hdfs://nn:8020"))) ==
      scope("hdfs://nn:8020/ckpts/x", None),
      "missing authority must fill from a same-scheme defaultFS")
    // ...but never borrows an authority across schemes
    assert(scope("foo:/x", Some(broken("hdfs://nn:8020"))) ==
      scope("foo:/x", None),
      "a different-scheme defaultFS must not donate its authority")
    // malformed defaultFS (the misconfiguration that likely CAUSED the
    // FS failure) degrades to the raw string instead of throwing
    assert(scope("/tmp/ck", Some(broken("::not a uri::"))) ==
      scope("/tmp/ck", None),
      "a malformed defaultFS must degrade, not throw")
    // relative paths degrade to the raw string (working-dir resolution
    // needs the FS); the stamp stays well-formed either way
    assert(scope("ckpt/s1", Some(broken("hdfs://nn:8020"))) ==
      scope("ckpt/s1", None),
      "relative paths must not be glued onto scheme://authority")
  }

  test("replay guard is checkpoint-scoped: a new stream identity folds from batch 0") {
    // Spark batchIds are monotonic only WITHIN one checkpoint. A fresh
    // checkpoint pointed at an existing index restarts ids at 0 — a
    // bare-batchId guard would read the old stamp (57) and silently
    // SKIP the new stream's first 58 batches. The scope in the stamp is
    // what makes that a fold, not a drop.
    import graft.functions.Retrieval
    val b1 = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val b2 = Seq((3L, "c d")).toDF("doc_id", "text")
    val b3 = Seq((4L, "d e")).toDF("doc_id", "text")
    val lib = new Library(tmp("graft-scope-"), spark)
    def gA(b: Long) = Some(Library.ReplayGuard.forCheckpoint("/ck/A", b))
    def gB(b: Long) = Some(Library.ReplayGuard.forCheckpoint("/ck/B", b))
    Retrieval.appendToBm25Index(lib, b1, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = gA(0))
    Retrieval.appendToBm25Index(lib, b2, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = gA(1))
    val vPost = lib.latestVersion("lex__postings").get

    // a NEW checkpoint's batch 0 (0 <= stamped 1!) must fold
    Retrieval.appendToBm25Index(lib, b3, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = gB(0))
    assert(lib.latestVersion("lex__postings").get > vPost,
      "new-scope batch 0 was mistaken for a replay — silent data loss")
    // ...and within the new scope, replay still skips
    val vB = lib.latestVersion("lex__postings").get
    Retrieval.appendToBm25Index(lib, b3, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = gB(0))
    assert(lib.latestVersion("lex__postings").get == vB)

    // a legacy bare-long stamp (pre-scope build) never skips
    assert(!Library.ReplayGuard.alreadyFolded("57",
      Library.ReplayGuard("anything", 0L)))

    // the skip is EXACT-match only: a lower stored id is normal
    // progression, a higher one means the checkpoint was reset under
    // the same path (batchIds restarted) — both must FOLD; only the
    // crash-replay case (stored == current) skips
    assert(!Library.ReplayGuard.alreadyFolded("x:4",
      Library.ReplayGuard("x", 5L)), "progression must fold")
    assert(!Library.ReplayGuard.alreadyFolded("x:9",
      Library.ReplayGuard("x", 0L)), "a reset checkpoint must not starve")
    assert(Library.ReplayGuard.alreadyFolded("x:5",
      Library.ReplayGuard("x", 5L)), "crash replay skips")

    // tombstone-then-reingest under a fresh checkpoint: the tombstone
    // still carries scope A's stamp (lastFoldStamp reads tombstones
    // deliberately), but scope C mismatches and batch 0 write-creates
    lib.delete("lex__postings")
    lib.delete("lex__stats")
    def gC(b: Long) = Some(Library.ReplayGuard.forCheckpoint("/ck/C", b))
    Retrieval.appendToBm25Index(lib, b1, "lex", "doc_id", "text",
      targetRows = 3L, replayGuard = gC(0))
    assert(lib.read("lex__postings").count() > 0,
      "a tombstoned symbol's stale stamp starved the new stream")
  }

  test("ledgerSink heals a first-batch crash that left only __meta behind") {
    import graft.functions.CorpusStats
    def g(b: Long) = Some(Library.ReplayGuard("ck", b))
    val rows = Seq((1L, "alpha beta", "a"), (2L, "gamma", "b"))
    val df = rows.toDF("doc_id", "text", "dom")
    val lib = new Library(tmp("graft-ledgercrash-"), spark)
    // build folds batch 0 fully, then __stats/__hll roll back to
    // nothing — the crash-after-meta state the sink's hasSymbol branch
    // replays into mergeIntoLedger
    CorpusStats.buildLedger(lib, df, "text", "dom", "led", p = 8,
      portable = true, replayGuard = g(0))
    lib.delete("led__stats", Seq(lib.latestVersion("led__stats").get))
    lib.delete("led__hll", Seq(lib.latestVersion("led__hll").get))
    assert(!lib.hasSymbol("led__stats") && !lib.hasSymbol("led__hll"))
    CorpusStats.mergeIntoLedger(lib, df, "text", "dom", "led",
      replayGuard = g(0))
    // and a verbatim replay after the heal commits nothing further
    val vs = lib.latestVersion("led__stats").get
    CorpusStats.mergeIntoLedger(lib, df, "text", "dom", "led",
      replayGuard = g(0))
    assert(lib.latestVersion("led__stats").get == vs)
    val one = new Library(tmp("graft-ledgercrash1-"), spark)
    CorpusStats.buildLedger(one, df, "text", "dom", "led", p = 8,
      portable = true)
    val got = CorpusStats.readLedger(lib, "led")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val want = CorpusStats.readLedger(one, "led")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got == want)
  }

  test("retrievalIndexSink: multi-batch fold equals the one-shot indexes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "a a a b"), (2L, "a b a b a"), (3L, "b a"),
      (4L, "x y z a"), (5L, "a b")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val lib = new Library(tmp("graft-ris-"), spark)
    val ckpt = tmp("graft-ris-ckpt-")
    val sink = StreamIngest.retrievalIndexSink(lib,
      mem.toDF.toDF("doc_id", "text"), "lex", "doc_id", "text", ckpt,
      targetRows = 3L)
    mem.addData((1L, "a a a b"), (2L, "a b a b a"))
    sink.start().awaitTermination()
    mem.addData((3L, "b a"), (4L, "x y z a"))
    sink.start().awaitTermination()
    mem.addData((5L, "a b"))
    sink.start().awaitTermination()
    val one = new Library(tmp("graft-ris1-"), spark)
    graft.functions.Retrieval.buildBm25Index(
      one, docs, "doc_id", "text", "lex", targetRows = 3L)
    graft.functions.Retrieval.buildPositionalIndex(
      one, docs, "lex", "doc_id", "text", targetRows = 3L)
    val gotBm = graft.functions.Retrieval.bm25Indexed(lib, "lex", Seq("a", "b"))
      .collect().toSeq
    val wantBm = graft.functions.Retrieval.bm25Indexed(one, "lex", Seq("a", "b"))
      .collect().toSeq
    assert(gotBm == wantBm, s"\nstream: $gotBm\noneshot: $wantBm")
    val gotPh = graft.functions.Retrieval.phraseSearch(lib, "lex", Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    val wantPh = graft.functions.Retrieval.phraseSearch(one, "lex", Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(gotPh == wantPh && gotPh.nonEmpty, s"$gotPh vs $wantPh")
  }
}
