package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Per-library defaults (reference: LibraryOptions, options.py:21 —
  * dynamic_schema, rows_per_segment; dedup/encoding are storage-codec
  * concerns Parquet already owns, columns_per_segment has no analogue
  * because Spark never column-slices).
  *
  * Stored as `_options.json` in the library root so every client of the
  * library sees the same defaults; per-call parameters on Library methods
  * still override.
  */
final case class LibraryOptions(
    dynamicSchema: Boolean = false,
    rowsPerSegment: Long = Library.DefaultTargetRows,
    /** Read grace for data-file GC (prune / delete(versions)): an
      * unreferenced data file is condemned with a marker and only
      * hard-deleted once the marker is older than this — so a reader in
      * another process that resolved a manifest just before the prune
      * can finish its in-flight scan (ArcticDB's tombstone-then-remove
      * discipline, version_map.hpp). 0 = immediate hard delete.
      */
    gcGraceMs: Long = Library.DefaultGcGraceMs,
    /** Highest manifest formatVersion this library's WRITERS may emit —
      * the mixed-fleet rollout dial complementing the read-side loud
      * refusal: pin it to 1 while old engine builds still read the
      * library (writes then stay full manifests, never the delta
      * encoding that stamps 2 and would make a pre-delta reader refuse),
      * lift it once the fleet is upgraded. The write-amplification win
      * of delta manifests is traded away only while the pin is on.
      */
    maxManifestFormat: Int = graft.core.VersionManifest.CurrentFormat)

object LibraryOptions {
  import org.json4s._
  import org.json4s.jackson.Serialization
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  def toJson(o: LibraryOptions): String = Serialization.writePretty(o)
  /** Real JSON parse (same codec family as the manifests) — missing
    * fields take case-class defaults, unknown fields are ignored, and
    * empty/corrupt content THROWS instead of silently yielding defaults
    * (a half-written options file must not misconfigure segmentation).
    */
  def fromJson(s: String): LibraryOptions = {
    require(s.trim.nonEmpty, "empty _options.json")
    Serialization.read[LibraryOptions](s)
  }
}

/** The front door (reference: arctic.py `Arctic`): manage named libraries
  * under one root URI. `create_library` / `get_library` /
  * `list_libraries` / `has_library` / `delete_library`, arctic.py:238+.
  *
  * A library is a child directory of the root holding its symbols plus an
  * `_options.json` marker; the marker is what distinguishes a library
  * from an unrelated directory, exactly as the reference keys libraries
  * in its config map rather than trusting the namespace listing.
  */
final class Graft(val rootUri: String, spark: SparkSession) {

  private val rootPath = new Path(rootUri)
  private def fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  /** Safe-charset name check for CREATION (reference verify_library_name:
    * alphanumeric plus `_ - .`, bounded length). The alphanumeric FIRST
    * char excludes '.', '..' and '_'-prefixed names — createLibrary(".")
    * would plant _options.json in the root itself and deleteLibrary(".")
    * would then expunge every library; '..' escapes the root entirely.
    */
  private val LibName = "[A-Za-z0-9][A-Za-z0-9._-]{0,254}".r
  /** Path-safety check for OPENING: laxer than creation so libraries
    * created under earlier, looser rules stay reachable (listable names
    * must remain openable and deletable) — only traversal is rejected.
    */
  private def libPath(name: String): Path = {
    require(name.nonEmpty && !name.contains("/") && name != "." && name != "..",
      s"invalid library name '$name'")
    new Path(rootPath, name)
  }
  private def optionsPath(name: String): Path = new Path(libPath(name), "_options.json")

  def createLibrary(
      name: String,
      options: LibraryOptions = LibraryOptions()): Library = {
    require(LibName.matches(name),
      s"invalid library name '$name' — must start alphanumeric, then [A-Za-z0-9._-], ≤255 chars")
    val p = libPath(name)
    if (fs.exists(optionsPath(name)))
      throw new IllegalArgumentException(s"library '$name' already exists")
    fs.mkdirs(p)
    // the options marker is the existence witness; single-winner via the
    // same no-overwrite commit primitive the manifests use
    val json = LibraryOptions.toJson(options)
    if (!CommitCas.forFs(fs).commit(fs, optionsPath(name), json))
      throw new IllegalArgumentException(s"library '$name' already exists")
    getLibrary(name)
  }

  def hasLibrary(name: String): Boolean = fs.exists(optionsPath(name))

  def listLibraries(): Seq[String] =
    if (!fs.exists(rootPath)) Nil
    else
      fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, "_options.json")))
        .map(_.getPath.getName)
        .sorted

  def getLibrary(name: String): Library = {
    if (!hasLibrary(name))
      throw new NoSuchElementException(s"library '$name' does not exist")
    new Library(libPath(name).toString, spark, libraryOptions(name))
  }

  /** get-or-create (reference: Arctic.get_library(create_if_missing=)). */
  def getLibrary(name: String, createIfMissing: Boolean): Library =
    if (hasLibrary(name)) getLibrary(name)
    else if (createIfMissing) createLibrary(name)
    else throw new NoSuchElementException(s"library '$name' does not exist")

  def libraryOptions(name: String): LibraryOptions = {
    val in = fs.open(optionsPath(name))
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    try LibraryOptions.fromJson(json)
    catch {
      case e: Exception =>
        throw new IllegalStateException(
          s"library '$name': unreadable _options.json (${e.getMessage}) — " +
            "refusing to fall back to defaults", e)
    }
  }

  /** Remove the library and everything in it (arctic.py delete_library:
    * "data associated with it is expunged"). */
  def deleteLibrary(name: String): Unit = {
    if (hasLibrary(name)) fs.delete(libPath(name), true)
    ()
  }

  /** Update a library's stored options (arctic.py modify_library_option).
    * A config update, not a versioned commit (the reference likewise
    * mutates its config map); already-open Library handles keep the
    * options they were opened with. Written to a temp sibling and renamed
    * into place so a crash mid-write can never leave a reader a partial
    * file (FileContext rename-with-OVERWRITE is atomic on local/HDFS).
    */
  def modifyLibraryOptions(
      name: String)(f: LibraryOptions => LibraryOptions): LibraryOptions = {
    val next = f(libraryOptions(name))
    val target = optionsPath(name)
    val tmp = new Path(libPath(name), s"._options-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(LibraryOptions.toJson(next)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // FileContext needs an AbstractFileSystem binding for the scheme;
    // object stores commonly lack one (s3a without fs.AbstractFileSystem
    // .s3a.impl), and their rename is not atomic anyway — fall back to a
    // plain overwrite there rather than fail the whole update.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        val o = fs.create(target, true)
        try o.write(LibraryOptions.toJson(next)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally o.close()
        fs.delete(tmp, false)
    }
    next
  }

  /** Scheduled maintenance over the WHOLE root — the operable story
    * behind the per-symbol primitives. The reference leaves
    * `defragment_symbol_data` (library.py:3342) and version pruning
    * user-invoked per symbol; at 100 TB with folding indexes, unmanaged
    * fragmentation decays file pruning, so this walks every library and
    * symbol and applies both policies in one pass:
    *
    *  - **retention**: hard-delete versions more than `keepVersions`
    *    back from latest, except snapshot-pinned ones (they refuse
    *    deletion by contract), then GC unreferenced data files — which
    *    also collects loser-writer and condemned-past-grace debris. A
    *    tombstoned symbol keeps its tombstone as "latest", so retention
    *    is what eventually reclaims a soft-deleted symbol's storage.
    *  - **compaction**: any symbol whose latest version is fragmented at
    *    the library's segment target gets `compact`ed. Persisted index
    *    families (BM25/positional postings, MinHash bands, PQ and IVF-PQ
    *    codes) are ordinary key-ranged symbols, so the same probe +
    *    compact restores their manifest pruning — no per-family code.
    *
    * Compaction runs BEFORE retention: compact commits a fresh version,
    * and retention in the same pass then prunes everything it
    * superseded — one `maintain` converges (a second immediate pass is
    * a no-op) instead of leaving the pre-compact version for next time.
    *
    * `dryRun = true` reports every action without touching anything.
    * Returns the action ledger — one row per (library, symbol, action)
    * with a human-readable detail and whether it was applied — the audit
    * artifact an operator schedules and archives.
    *
    * Symbols maintain CONCURRENTLY from the batch pool (`parallelism`
    * driver threads submitting independent Spark jobs — the
    * readBatch/writeBatch machinery): at a 10k-symbol root a serial
    * walk is hours of back-to-back compact/retention jobs, and the
    * per-symbol commits are independent manifest CASes. The per-item
    * error model rides along: one bad symbol (corrupt data file,
    * storage fault) yields an `error` ledger row and every sibling is
    * still maintained — the BatchResult contract, never a half-swept
    * root. Ledger row order stays deterministic (symbol-sorted).
    */
  def maintain(
      keepVersions: Int = 1,
      dryRun: Boolean = false,
      parallelism: Int = 8): org.apache.spark.sql.DataFrame = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    def maintainSymbol(
        lib: Library, ln: String, sym: String,
        infos: Seq[Library.VersionInfo]): Seq[(String, String, String, String, Boolean)] = {
      val actions =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, Boolean)]
      var vs = infos.sortBy(_.version)
      // a tombstoned symbol has no latest data to probe — retention
      // (which is what eventually reclaims its storage) still applies
      if (!vs.last.deleted && lib.isSymbolFragmented(sym)) {
        val before = lib.resolveVersion(sym).files.size
        actions += ((ln, sym, "compact",
          if (dryRun) s"$before fragmented files"
          else {
            lib.compact(sym)
            s"files $before -> ${lib.resolveVersion(sym).files.size}"
          }, !dryRun))
        // the compact commits a fresh version the retention step must
        // see — in dryRun too, so the reported deletable set matches
        // what a real run would delete (the pre-compact latest
        // included); the synthetic tail entry itself is always kept
        // (keepVersions >= 1), so only REAL version ids are reported
        vs = vs :+ Library.VersionInfo(sym,
          if (dryRun) vs.last.version + 1 else lib.latestVersion(sym).get,
          System.currentTimeMillis(), deleted = false, Seq.empty)
      }
      val (pinned, deletable) =
        vs.dropRight(keepVersions).partition(_.snapshots.nonEmpty)
      if (deletable.nonEmpty) {
        actions += ((ln, sym, "delete_versions",
          s"versions ${deletable.map(_.version).mkString(",")}" +
            (if (pinned.nonEmpty)
               s" (kept ${pinned.map(_.version).mkString(",")}: snapshot-pinned)"
             else ""), !dryRun))
        if (!dryRun) lib.delete(sym, deletable.map(_.version))
      }
      // steady-state sweep: prune/delete only CONDEMN under the read
      // grace; this is the pass that hard-deletes markers that have
      // outlived gcGraceMs on otherwise-idle symbols (without it
      // condemned files persist forever once retention has drained)
      if (!dryRun) {
        val swept = lib.gc(sym)
        if (swept > 0)
          actions += ((ln, sym, "gc", s"$swept condemned/unreferenced files", true))
      }
      actions.toSeq
    }
    val actions =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, Boolean)]
    listLibraries().foreach { ln =>
      val lib = getLibrary(ln)
      // one pass: every (symbol, version) incl. tombstones, pins resolved
      val bySym = lib.listVersionsInfo().groupBy(_.symbol)
      lib.inParallel(bySym.toSeq.sortBy(_._1), parallelism)(_._1) {
        case (sym, infos) => maintainSymbol(lib, ln, sym, infos)
      }.foreach {
        case Library.BatchOk(_, rows) => actions ++= rows
        case Library.DataError(sym, e) =>
          actions += ((ln, sym, "error",
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}",
            false))
      }
    }
    spark.createDataFrame(actions.toSeq)
      .toDF("library", "symbol", "action", "detail", "applied")
  }
}
