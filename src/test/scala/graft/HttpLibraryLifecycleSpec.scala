package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Library, LibraryOptions, Ts}
import graft.core.Library.AsOf

/** VERDICT r15 #3: the WHOLE Library lifecycle — write → append →
  * update-splice → snapshot → deleteRange → staged append → compact →
  * prune → GC — against the in-process HTTP object store, i.e. a
  * FileSystem whose rename is per-object copy+delete (never atomic),
  * whose directories are synthesized from key prefixes, and whose only
  * atomic primitive is the conditional PUT (S3's contract; reference
  * analog: `cpp/arcticdb/storage/s3/s3_storage.cpp`, tests under
  * `cpp/arcticdb/storage/test/`). HttpCasSpec races the CommitCas
  * primitive itself; THIS spec proves no Library path outside CommitCas
  * depends on rename atomicity or real directories — the failure mode
  * that passes every file:// test and corrupts data in production.
  *
  * (hadoop-aws is absent from the sandbox — SURVEY §12 — so S3A itself
  * cannot run here; this FileSystem exercises the exact semantic
  * surface S3A exposes to the Library and to Spark's parquet
  * reader/writer + FileOutputCommitter.)
  */
class HttpLibraryLifecycleSpec extends SparkSuite {

  private def events = spark.read.parquet(s"$sf/events.parquet")
  private lazy val tsT = events.schema("ts").dataType
  private def usL(us: Long) = Ts.usLit(us, tsT)

  private def withLib(body: (HttpObjectStore.Server, Library) => Unit): Unit = {
    val server = new HttpObjectStore.Server
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3.impl", classOf[HttpCasFileSystem].getName)
      // gcGraceMs=0: the lifecycle asserts orphans are gone right after
      // prune+GC; the condemn-grace path is covered in LibrarySpec.
      body(server, new Library(s"s3://127.0.0.1:${server.port}/bucket/lib",
        spark, LibraryOptions(gcGraceMs = 0)))
    } finally server.stop()
  }

  private def assertSameRows(got: DataFrame, exp: DataFrame): Unit = {
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "content diverged from the expected frame")
  }

  test("full lifecycle on conditional-PUT + copy-delete-rename object store") {
    withLib { (server, lib) =>
      val n = events.count()
      val cut = events.agg(
        expr("percentile_approx(unix_micros(cast(ts as timestamp)), 0.5)"))
        .head.getLong(0)

      // v0 write + v1 append (multi-file: parquet job commit walks the
      // FileOutputCommitter rename chain on copy+delete rename)
      lib.write("ev", events.filter(col("ts") < usL(cut)), Some("ts"), targetRows = 200)
      lib.append("ev", events.filter(col("ts") >= usL(cut)), targetRows = 200)
      assert(lib.read("ev").count() == n)
      lib.snapshot("pin") // pins v1

      // v2 update-splice on one mid file
      val mid = lib.resolveVersion("ev").files(2)
      val (mLo, mHi) = (mid.minIdx.get, mid.maxIdx.get)
      val patch = events.filter(col("ts").between(usL(mLo), usL(mHi)))
        .withColumn("value", col("value") + 1000000)
      lib.update("ev", patch, targetRows = 200)
      val expected = events.filter(!col("ts").between(usL(mLo), usL(mHi)))
        .unionByName(patch)
      assertSameRows(lib.read("ev"), expected)

      // v3 deleteRange of the TAIL slice, then v4 staged re-append of the
      // same slice: finalize moves delta dirs into data/ — here that move
      // is a non-atomic multi-object copy+delete, so correctness must
      // come from the manifest CAS commit, not the move
      val tail = lib.resolveVersion("ev").files.last
      val (tLo, tHi) = (tail.minIdx.get, tail.maxIdx.get)
      lib.deleteRange("ev", tLo * 1000, tHi * 1000)
      assert(lib.read("ev").count() ==
        expected.filter(!col("ts").between(usL(tLo), usL(tHi))).count())
      lib.stage("ev", expected.filter(col("ts").between(usL(tLo), usL(tHi))))
      lib.sortAndFinalizeStaged("ev", Some("ts"), mode = "append", targetRows = 50)
      assertSameRows(lib.read("ev"), expected)

      // v5 compact: the 50-row staged files fragment the tail — compact
      // must rewrite runs and leave content bit-identical
      assert(lib.isSymbolFragmented("ev", targetRows = 200))
      val before = lib.resolveVersion("ev").files.size
      lib.compact("ev", targetRows = 200)
      assert(lib.resolveVersion("ev").files.size < before)
      assertSameRows(lib.read("ev"), expected)

      // prune: latest + snapshot-pinned survive, the rest GCs
      val latest = lib.listVersions("ev").last
      lib.prunePreviousVersions("ev")
      assert(lib.listVersions("ev") == Seq(1, latest))
      assertSameRows(lib.read("ev"), expected)
      assert(lib.read("ev", AsOf.Snapshot("pin")).count() == n)
      intercept[Exception](lib.read("ev", AsOf.Version(0)).count())

      // drop the snapshot pin → prune again frees v1, latest still reads
      lib.deleteSnapshot("pin")
      lib.prunePreviousVersions("ev")
      assert(lib.listVersions("ev") == Seq(latest))
      assertSameRows(lib.read("ev"), expected)

      // storage hygiene: the committer/staging machinery left no temp
      // keys, and every surviving data key is manifest-referenced or
      // library metadata
      val leftovers = server.keys.filter(k =>
        k.contains("_temporary") || k.endsWith(".crc") || k.contains("/_staged/"))
      assert(leftovers.isEmpty, s"temp keys survived: $leftovers")
      val referenced = lib.resolveVersion("ev").files.map(_.path).toSet
      val dataKeys = server.keys.filter(k =>
        k.contains("/data/") && !k.endsWith("_SUCCESS") && !k.contains("_inflight"))
      val orphans = dataKeys.filterNot(k => referenced.exists(k.endsWith))
      assert(orphans.isEmpty, s"unreferenced data keys survived GC: $orphans")
    }
  }

  test("GC read grace: a pre-prune reader survives a concurrent prune") {
    val server = new HttpObjectStore.Server
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3.impl", classOf[HttpCasFileSystem].getName)
      val root = s"s3://127.0.0.1:${server.port}/bucket/grace"
      // two handles over the same store = two processes
      val writer = new Library(root, spark, LibraryOptions(gcGraceMs = 60000))
      val reader = new Library(root, spark, LibraryOptions(gcGraceMs = 60000))
      val a = events.limit(400)
      writer.write("s", a, Some("ts"), targetRows = 100) // v0: several files
      // reader resolves v0's manifest NOW (read() lists files eagerly) —
      // the in-flight-scan state the grace window exists to protect
      val preResolved = reader.read("s", AsOf.Version(0))
      writer.write("s", events.limit(100), Some("ts"), targetRows = 100) // v1
      writer.prunePreviousVersions("s") // v0 manifest gone, files condemned
      // the pre-resolved scan still completes: condemned, not deleted
      assert(preResolved.count() == 400)
      // a FRESH process (no manifest cache) resolving v0 must fail:
      // the version is pruned (only its already-resolved readers ride
      // the grace window)
      val fresh = new Library(root, spark, LibraryOptions(gcGraceMs = 60000))
      intercept[Exception](fresh.read("s", AsOf.Version(0)).count())
      // latest unaffected
      assert(writer.read("s").count() == 100)

      // contrast: with gcGraceMs=0 the same race loses the files
      val w0 = new Library(s"s3://127.0.0.1:${server.port}/bucket/nograce",
        spark, LibraryOptions(gcGraceMs = 0))
      w0.write("s", a, Some("ts"), targetRows = 100)
      val pre0 = w0.read("s", AsOf.Version(0))
      w0.write("s", events.limit(100), Some("ts"), targetRows = 100)
      w0.prunePreviousVersions("s")
      intercept[Exception](pre0.count())
    } finally server.stop()
  }

  test("maintain + admin toolbox on the object store (synthesized directories)") {
    val server = new HttpObjectStore.Server
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3.impl", classOf[HttpCasFileSystem].getName)
      val g = new graft.core.Graft(
        s"s3://127.0.0.1:${server.port}/bucket/root", spark)
      val lib = g.createLibrary("a",
        graft.core.LibraryOptions(rowsPerSegment = 200, gcGraceMs = 0))
      // fragment a symbol with dribble appends; give it version history
      lib.write("s", events.limit(600), Some("ts"), targetRows = 200)
      val more = events.orderBy(org.apache.spark.sql.functions.desc("ts")).limit(100)
      (0 until 3).foreach(_ => lib.append("s", more, validateIndex = false))
      assert(lib.isSymbolFragmented("s"))

      // toolbox walks synthesized prefix-directories, not real dirs
      assert(lib.keyTree("s").filter(col("layer") === "data").count() > 0)
      assert(lib.manifestDump("s").count() ==
        lib.resolveVersion("s").files.size)
      val sum = g.getLibrary("a").storageSummary().collect()
      assert(sum.length == 1 && sum.head.getAs[Boolean]("fragmented"))

      // maintain compacts + prunes through copy-delete renames and
      // conditional-PUT commits; second pass drains
      val ledger = g.maintain(keepVersions = 1).collect()
      assert(ledger.exists(_.getString(2) == "compact") &&
        ledger.exists(_.getString(2) == "delete_versions"))
      assert(!lib.isSymbolFragmented("s"))
      assert(lib.read("s").count() == 900)
      assert(g.maintain(keepVersions = 1).count() == 0)
      // nothing unreferenced or temporary survives on the store
      val referenced = lib.resolveVersion("s").files.map(_.path).toSet
      val dataKeys = server.keys.filter(k =>
        k.contains("/data/") && !k.endsWith("_SUCCESS") &&
          !k.contains("_inflight") && !k.contains("_CONDEMNED"))
      val orphans = dataKeys.filterNot(k => referenced.exists(k.endsWith))
      assert(orphans.isEmpty, s"unreferenced data keys survived maintain: $orphans")
    } finally server.stop()
  }

  test("batch ops + metadata + blobs + as-of reads on the object store") {
    withLib { (_, lib) =>
      val a = events.limit(100)
      lib.write("m", a, Some("ts"), targetRows = 1000,
        metadata = Map("source" -> "lifecycle-spec"))
      assert(lib.resolveVersion("m").metadata("source") == "lifecycle-spec")
      lib.writeMetadata("m", Map("source" -> "v1")) // metadata-only version
      assert(lib.resolveVersion("m").metadata("source") == "v1")
      assert(lib.read("m", AsOf.Version(0)).count() == 100)
      lib.writeBlob("b", Array[Byte](1, 2, 3), Map("kind" -> "model"))
      assert(lib.readBlob("b").toSeq == Seq[Byte](1, 2, 3))
      assert(lib.hasSymbol("m") && !lib.hasSymbol("nope"))
      assert(lib.listSymbols().contains("m"))
      lib.delete("m")
      assert(!lib.hasSymbol("m"))
    }
  }
}
