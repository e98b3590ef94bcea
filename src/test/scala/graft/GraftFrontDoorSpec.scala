package graft

import org.apache.spark.sql.functions._

import graft.core.{Graft, LibraryOptions}

/** Front door (reference arctic.py Arctic): library lifecycle under one
  * root URI, options persistence, and option-driven write defaults.
  */
class GraftFrontDoorSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-front-").toString

  test("create/list/has/get/delete library lifecycle") {
    val g = new Graft(freshRoot(), spark)
    assert(g.listLibraries() == Nil)
    assert(!g.hasLibrary("prices"))
    intercept[NoSuchElementException](g.getLibrary("prices"))

    g.createLibrary("prices")
    g.createLibrary("alt_data", LibraryOptions(dynamicSchema = true, rowsPerSegment = 123))
    assert(g.listLibraries() == Seq("alt_data", "prices"))
    assert(g.hasLibrary("prices"))
    intercept[IllegalArgumentException](g.createLibrary("prices"))

    // options round-trip through _options.json
    val opts = g.libraryOptions("alt_data")
    assert(opts == LibraryOptions(dynamicSchema = true, rowsPerSegment = 123))
    assert(g.getLibrary("alt_data").options == opts)

    g.deleteLibrary("prices")
    assert(g.listLibraries() == Seq("alt_data"))
    // get-or-create
    val again = g.getLibrary("prices", createIfMissing = true)
    assert(again.options == LibraryOptions())
    assert(g.listLibraries() == Seq("alt_data", "prices"))
  }

  test("library options drive write segmentation and dynamic-schema defaults") {
    val g = new Graft(freshRoot(), spark)
    val lib = g.createLibrary("t", LibraryOptions(dynamicSchema = true, rowsPerSegment = 100))
    val df = (0 until 500).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    lib.write("s", df, Some("k")) // no targetRows passed: 100-row segments
    assert(lib.manifest("s", lib.latestVersion("s").get).files.size >= 5)
    // dynamicSchema default comes from options: widened append succeeds
    val extra = Seq((1000L, 1.5, "tag")).toDF("k", "v", "note")
    lib.append("s", extra) // would throw without dynamic schema
    val got = lib.read("s")
    assert(got.columns.toSet == Set("k", "v", "note"))
    assert(got.count() == 501)
  }

  test("modifyLibraryOptions rewrites stored defaults for future opens") {
    val g = new Graft(freshRoot(), spark)
    g.createLibrary("t", LibraryOptions(rowsPerSegment = 100))
    val updated = g.modifyLibraryOptions("t")(_.copy(dynamicSchema = true))
    assert(updated == LibraryOptions(dynamicSchema = true, rowsPerSegment = 100))
    assert(g.libraryOptions("t") == updated)
    assert(g.getLibrary("t").options == updated)
  }

  test("invalid and reserved library names are rejected") {
    val g = new Graft(freshRoot(), spark)
    intercept[IllegalArgumentException](g.createLibrary(""))
    intercept[IllegalArgumentException](g.createLibrary("a/b"))
    intercept[IllegalArgumentException](g.createLibrary("_internal"))
    // '.' would plant _options.json in the root itself (and deleteLibrary
    // would then expunge every library); '..' escapes the root entirely
    intercept[IllegalArgumentException](g.createLibrary("."))
    intercept[IllegalArgumentException](g.createLibrary(".."))
    intercept[IllegalArgumentException](g.createLibrary("a b"))
    g.createLibrary("ok-1.2_x") // full safe charset accepted
    assert(g.hasLibrary("ok-1.2_x"))
  }

  test("legacy loose-named libraries stay openable and deletable") {
    // Names valid under the old rule (e.g. containing a space) must remain
    // reachable after the creation charset tightened: create-time is
    // strict, open/delete only reject path traversal.
    val g = new Graft(freshRoot(), spark)
    intercept[IllegalArgumentException](g.createLibrary("old lib"))
    // plant a legacy library on disk as an older build would have
    val p = new org.apache.hadoop.fs.Path(g.rootUri, "old lib/_options.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, false)
    out.write(LibraryOptions.toJson(LibraryOptions(rowsPerSegment = 42)).getBytes("UTF-8"))
    out.close()
    assert(g.listLibraries() == Seq("old lib"))
    assert(g.getLibrary("old lib").options.rowsPerSegment == 42)
    g.deleteLibrary("old lib")
    assert(g.listLibraries().isEmpty)
    // traversal stays rejected on every path
    intercept[IllegalArgumentException](g.getLibrary(".."))
    intercept[IllegalArgumentException](g.deleteLibrary("."))
  }

  test("options parse is a real JSON parse: hostile values, corrupt files fail loudly") {
    val g = new Graft(freshRoot(), spark)
    g.createLibrary("t", LibraryOptions(rowsPerSegment = 77))
    val p = new org.apache.hadoop.fs.Path(g.rootUri, "t/_options.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // unknown fields with values containing ','/'}' must not corrupt the
    // flat fields (a regex field-grabber would mis-parse these)
    val hostile =
      """{"comment":"a,b}c\",","nested":{"x":"}}","y":[1,2]},
         |"dynamicSchema":true,"rowsPerSegment":77}""".stripMargin
    val out = fs.create(p, true)
    out.write(hostile.getBytes("UTF-8")); out.close()
    assert(g.libraryOptions("t") == LibraryOptions(dynamicSchema = true, rowsPerSegment = 77))
    // empty/corrupt content throws instead of silently defaulting
    val out2 = fs.create(p, true); out2.close()
    intercept[IllegalStateException](g.libraryOptions("t"))
    val out3 = fs.create(p, true)
    out3.write("""{"dynamicSchema": tr""".getBytes("UTF-8")); out3.close()
    intercept[IllegalStateException](g.libraryOptions("t"))
  }

  test("maintain: retention + compaction across libraries, snapshot pins and blobs respected") {
    val g = new Graft(freshRoot(), spark)
    val a = g.createLibrary("a", LibraryOptions(rowsPerSegment = 200))
    val b = g.createLibrary("b", LibraryOptions(rowsPerSegment = 200))

    // a/frag: appended in dribbles -> fragmented at the 200-row target
    val base = (0 until 600).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    a.write("frag", base, Some("k"))
    (0 until 4).foreach { j =>
      a.append("frag",
        (0 until 40).map(i => ((600 + j * 40 + i).toLong, 1.0)).toDF("k", "v"))
    }
    assert(a.isSymbolFragmented("frag"))
    val fragContent = a.read("frag").localCheckpoint(true)

    // a/hist: 4 versions, v1 snapshot-pinned — unindexed, so only the
    // retention policy applies (no fragmentation probe without an index)
    a.write("hist", (0 until 100).map(i => (i.toLong, 0.0)).toDF("k", "v"))
    (1 to 3).foreach(j => a.append("hist",
      (0 until 50).map(i => ((100 * j + i).toLong, j.toDouble)).toDF("k", "v")))
    a.snapshot("pin", symbols = Seq("hist"), versions = Map("hist" -> 1))
    a.write("ok", (0 until 100).map(i => (i.toLong, 0.0)).toDF("k", "v"), Some("k"))
    a.writeBlob("model", Array[Byte](1, 2, 3))

    // b/frag2: a second library fragments independently
    b.write("frag2", base, Some("k"))
    (0 until 3).foreach(j => b.append("frag2",
      (0 until 30).map(i => ((600 + j * 30 + i).toLong, 1.0)).toDF("k", "v")))
    assert(b.isSymbolFragmented("frag2"))

    // dry run: full ledger, applied=false, nothing touched
    val dry = g.maintain(keepVersions = 2, dryRun = true).collect()
    assert(dry.forall(!_.getAs[Boolean]("applied")))
    assert(dry.exists(r => r.getString(0) == "a" && r.getString(1) == "frag" &&
      r.getString(2) == "compact"))
    assert(dry.exists(r => r.getString(0) == "b" && r.getString(1) == "frag2"))
    assert(a.listVersions("hist") == Seq(0, 1, 2, 3)) // untouched
    assert(a.isSymbolFragmented("frag"))

    // real run
    val ledger = g.maintain(keepVersions = 2)
    val acts = ledger.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ledger.collect().forall(_.getAs[Boolean]("applied")))
    // retention: hist keeps latest 2 + the pinned v1; frag loses v0..v2
    assert(acts.contains(("a", "hist", "delete_versions")))
    assert(a.listVersions("hist") == Seq(1, 2, 3))
    assert(a.read("hist", graft.core.Library.AsOf.Snapshot("pin")).count() == 150)
    // compaction: both fragmented symbols healed, content identical
    assert(acts.contains(("a", "frag", "compact")) && acts.contains(("b", "frag2", "compact")))
    assert(!a.isSymbolFragmented("frag") && !b.isSymbolFragmented("frag2"))
    assert(a.read("frag").exceptAll(fragContent).isEmpty &&
      fragContent.exceptAll(a.read("frag")).isEmpty)
    // healthy symbols emit no action; blob survives and reads back
    assert(!acts.exists(t => t._2 == "ok"))
    assert(a.readBlob("model").toSeq == Seq[Byte](1, 2, 3))

    // second pass is a no-op: the ledger drains
    assert(g.maintain(keepVersions = 2).count() == 0)
  }

  test("maintain: a failing symbol becomes an error row, every sibling still maintained") {
    val g = new Graft(freshRoot(), spark)
    val a = g.createLibrary("a", LibraryOptions(rowsPerSegment = 500))
    val b = g.createLibrary("b", LibraryOptions(rowsPerSegment = 500))
    def frag(lib: graft.core.Library, sym: String): Unit = {
      lib.write(sym, (0 until 600).map(i => (i.toLong, 1.0)).toDF("k", "v"), Some("k"))
      (0 until 3).foreach(j => lib.append(sym,
        (0 until 40).map(i => ((600 + j * 40 + i).toLong, 1.0)).toDF("k", "v")))
      assert(lib.isSymbolFragmented(sym))
    }
    frag(a, "good")
    frag(a, "bad")
    frag(b, "alsogood")
    // plant the failure: one of bad's data files vanishes from storage,
    // so its compact read blows up task-side — the per-symbol pool must
    // capture it as a ledger row, not abort the sweep. The LAST file:
    // it sits in the undersized tail run compact must rewrite (the
    // full-sized head file is reused without a read).
    val victim = a.resolveVersion("bad").files.last.path
    val f = new java.io.File(s"${g.rootUri}/a/bad/data/$victim")
    assert(f.isFile && f.delete(), s"victim $f")

    val ledger = g.maintain(keepVersions = 1, parallelism = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))
    val err = ledger.filter(t => t._3 == "error")
    assert(err.map(t => (t._1, t._2)).toSeq == Seq(("a", "bad")),
      s"ledger: ${ledger.mkString(";")}")
    assert(!err.head._5 && err.head._4.nonEmpty)
    // both siblings compacted + retained despite the bad symbol
    assert(ledger.exists(t => t._1 == "a" && t._2 == "good" && t._3 == "compact" && t._5))
    assert(ledger.exists(t => t._1 == "b" && t._2 == "alsogood" && t._3 == "compact" && t._5))
    assert(!a.isSymbolFragmented("good") && !b.isSymbolFragmented("alsogood"))
    assert(a.read("good").count() == 720 && b.read("alsogood").count() == 720)
    // deterministic ledger order: symbol-sorted within the library walk
    val symsInA = ledger.filter(_._1 == "a").map(_._2).toSeq
    assert(symsInA == symsInA.sorted, s"unsorted ledger: $symsInA")
  }

  test("maintain survives tombstoned symbols and sweeps condemned-past-grace files") {
    val g = new Graft(freshRoot(), spark)
    // 150ms grace: long enough that pass-1 only CONDEMNS, short enough
    // that a later sweep hard-deletes
    val lib = g.createLibrary("a",
      LibraryOptions(rowsPerSegment = 200, gcGraceMs = 150))
    val df = (0 until 400).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    lib.write("dead", df, Some("k"))
    lib.append("dead", (400 until 500).map(i => (i.toLong, 0.0)).toDF("k", "v"))
    lib.delete("dead") // tombstone on top (v2)
    lib.write("live", df, Some("k"))

    // the tombstoned symbol must not crash the pass or the census
    val census = lib.storageSummary().collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(census.keySet == Set("dead", "live") && census("dead") == 0L)
    val pass1 = g.maintain(keepVersions = 1).collect()
    // retention pruned the tombstone's history (data versions 0,1)...
    assert(pass1.exists(r => r.getString(1) == "dead" &&
      r.getString(2) == "delete_versions"))
    assert(lib.listVersions("dead").size == 1)
    // ...but the grace means files are condemned, not deleted
    val dataDir = new java.io.File(s"${g.rootUri}/a/dead/data")
    def dataFiles() =
      if (!dataDir.exists()) Array.empty[String]
      else new java.io.File(s"${g.rootUri}/a/dead/data").listFiles()
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .map(_.getName).filter(n => !n.startsWith("_CONDEMNED") && !n.endsWith(".crc"))
    assert(dataFiles().nonEmpty, "grace must condemn, not hard-delete")

    // past the grace, the NEXT maintain's gc sweep hard-deletes — the
    // steady-state path that has no version deletes left to piggyback on
    Thread.sleep(300)
    val pass2 = g.maintain(keepVersions = 1).collect()
    assert(pass2.exists(r => r.getString(1) == "dead" && r.getString(2) == "gc"),
      s"expected a gc action, got ${pass2.mkString(";")}")
    assert(dataFiles().isEmpty, s"condemned files survived the sweep: ${dataFiles().toSeq}")
    // live symbol untouched throughout
    assert(g.getLibrary("a").read("live").count() == 400)
  }
}
