package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.core.{Library, LibraryOptions}

/** VERDICT r16 next-#2: the commit contract exercised across real JVM
  * boundaries. The six-writer CommitCas race and the two-handle prune
  * race run as in-process threads/handles; the contract being claimed
  * is cross-PROCESS — no shared manifest cache, no shared JVM lock can
  * be load-bearing. Here the parent seeds a symbol on the in-process
  * HTTP object store, forks TWO fully separate JVMs (each boots its own
  * local SparkSession and Library handle — see [[MultiJvmRaceChild]]),
  * and releases them through a store-keyed barrier so their append
  * windows genuinely overlap. Both children resolve the SAME base
  * manifest before the barrier, so the first round is a guaranteed
  * cross-process CAS collision decided server-side by the conditional
  * PUT (exactly where S3 decides it).
  *
  * Asserted afterwards, from the parent's own handle:
  *  - no lost updates: every child committed its full quota, the row
  *    total and per-batch counts are exact, and the version chain is
  *    precisely seed..seed+2·quota (every commit is a consistent winner);
  *  - monotone history: each version's resolved manifest adds exactly
  *    one batch on top of its predecessor;
  *  - ≥1 lost race was actually observed (deterministic via the pinned
  *    shared base — the spec can't silently degrade to sequential runs);
  *  - loser-writer data dirs GC on prune and nothing the manifests
  *    reference is touched (no data files orphan).
  *
  * Reference analog: concurrent writers racing last-writer-wins on
  * VERSION_REF (`docs/mkdocs/docs/technical/on_disk_storage.md:29-31`).
  */
class MultiJvmCasRaceSpec extends SparkSuite {

  private val Quota = 5
  private val Rows = 50L

  test("two forked JVMs race appends on one symbol through the object store") {
    val server = new HttpObjectStore.Server
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3.impl", classOf[HttpCasFileSystem].getName)
      val lib = new Library(s"s3://127.0.0.1:${server.port}/bucket/lib",
        spark, LibraryOptions(gcGraceMs = 0))
      // seed v0 so every child commit is a DERIVED append (the CAS path)
      lib.write("race",
        spark.range(10).select(col("id").as("v"), lit("seed").as("src")))
      val seedV = lib.latestVersion("race").get

      val procs = (0 until 2).map { id =>
        forkChild("graft.MultiJvmRaceChild",
          Seq(server.port.toString, id.toString, Quota.toString, Rows.toString))
      }

      // barrier: wait for both children to boot + resolve the shared
      // base, then open the gate with one unconditional PUT
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(120)
      while ((0 until 2).exists(id =>
               !server.keys.contains(s"/__race/ready-$id")) &&
             System.nanoTime() < deadline) Thread.sleep(50)
      if ((0 until 2).exists(id => !server.keys.contains(s"/__race/ready-$id"))) {
        procs.foreach(_._1.destroyForcibly())
        fail(s"children failed to boot; logs: ${procs.map(p => tail(p._2)).mkString("\n---\n")}")
      }
      MultiJvmPlumbing.putKey(server.port, "/__race/go")

      val reports = procs.map { case (p, log) =>
        if (!p.waitFor(240, TimeUnit.SECONDS)) {
          p.destroyForcibly()
          fail(s"child timed out; log: ${tail(log)}")
        }
        assert(p.exitValue() == 0, s"child failed; log: ${tail(log)}")
        val line = Source.fromFile(log).getLines()
          .find(_.startsWith("RACE-CHILD-DONE"))
          .getOrElse(fail(s"no DONE line; log: ${tail(log)}"))
        val kv = line.split(' ').drop(1)
          .map(_.split('=')).map(a => a(0) -> a(1).toInt).toMap
        kv
      }

      // no lost updates: full quotas committed, exact version chain
      assert(reports.forall(_("committed") == Quota), reports.toString)
      val versions = lib.listVersions("race")
      assert(versions == (seedV to seedV + 2 * Quota),
        s"version chain has gaps or extras: $versions")
      // the pinned shared base makes round one a guaranteed collision
      val conflicts = reports.map(_("conflicts")).sum
      assert(conflicts >= 1, "no cross-process CAS conflict was observed")
      info(s"cross-JVM lost races observed: $conflicts")

      // content: every batch present exactly once, rows exact
      val df = lib.read("race")
      assert(df.count() == 10 + 2 * Quota * Rows)
      val perSrc = df.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perSrc.size == 1 + 2 * Quota)
      assert(perSrc.filter(_._1 != "seed").values.forall(_ == Rows))

      // monotone history: each version layers exactly one batch
      val counts = versions.map(v =>
        lib.resolveVersion("race", Library.AsOf.Version(v)).rowCount)
      assert(counts == counts.indices.map(i => 10 + i * Rows),
        s"non-monotone version history: $counts")

      // loser-writer dirs (written pre-commit by lost races) GC on
      // prune; everything the surviving manifest references stays
      lib.prunePreviousVersions("race")
      assert(lib.read("race").count() == 10 + 2 * Quota * Rows)
      val referenced = lib.resolveVersion("race").files.map(_.path).toSet
      val dataKeys = server.keys.filter(k =>
        k.contains("/data/") && !k.endsWith("_SUCCESS") &&
          !k.contains("_inflight") && !k.contains("_CONDEMNED"))
      val orphans = dataKeys.filterNot(k => referenced.exists(k.endsWith))
      assert(orphans.isEmpty, s"unreferenced data keys survived GC: $orphans")
      val temps = server.keys.filter(k =>
        k.contains("_temporary") || k.endsWith(".crc"))
      assert(temps.isEmpty, s"temp keys survived: $temps")
    } finally server.stop()
  }

  test("cross-process GC grace: a forked reader's pre-prune scan survives the prune") {
    val server = new HttpObjectStore.Server
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3.impl", classOf[HttpCasFileSystem].getName)
      // (exitCode, log tail) of one reader-vs-prune interleaving: the
      // forked reader resolves v0, the PARENT then commits v1 + prunes
      // v0, and only then does the reader's scan run — zero shared JVM
      // state (the in-JVM two-handle variant shares FileSystem cache,
      // manifest cache and open handles, all of which can mask this)
      def run(bucket: String, graceMs: Long): (Int, String) = {
        val lib = new Library(s"s3://127.0.0.1:${server.port}/$bucket/lib",
          spark, LibraryOptions(gcGraceMs = graceMs))
        lib.write("s",
          spark.range(400).select(col("id").as("k"), (col("id") * 2).as("v")),
          Some("k"), targetRows = 100) // v0: several files
        val (p, log) = forkChild("graft.MultiJvmGraceReader",
          Seq(server.port.toString, bucket))
        val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(120)
        while (!server.keys.contains(s"/__grace/$bucket/resolved") &&
               System.nanoTime() < deadline) Thread.sleep(50)
        if (!server.keys.contains(s"/__grace/$bucket/resolved")) {
          p.destroyForcibly()
          fail(s"reader failed to resolve; log: ${tail(log)}")
        }
        lib.write("s",
          spark.range(100).select(col("id").as("k"), lit(0L).as("v")),
          Some("k"), targetRows = 100) // v1
        lib.prunePreviousVersions("s") // v0 manifest gone, files condemned/deleted
        MultiJvmPlumbing.putKey(server.port, s"/__grace/$bucket/pruned")
        if (!p.waitFor(240, TimeUnit.SECONDS)) {
          p.destroyForcibly()
          fail(s"reader timed out; log: ${tail(log)}")
        }
        (p.exitValue(), tail(log))
      }
      // graced: condemn-not-delete keeps the in-flight scan alive
      val (okExit, okLog) = run("graced", graceMs = 60000)
      assert(okExit == 0 && okLog.contains("GRACE-READER-DONE n=400"),
        s"graced reader must complete its 400-row scan:\n$okLog")
      // contrast: immediate hard-delete loses the same race — and it
      // must be THE missing-file failure, not any incidental crash
      val (badExit, badLog) = run("nograce", graceMs = 0)
      assert(badExit != 0 && !badLog.contains("GRACE-READER-DONE") &&
        (badLog.contains("FileNotFoundException") ||
          badLog.contains("FAILED_READ_FILE")),
        s"gcGraceMs=0 reader should have failed mid-scan on missing files:\n$badLog")
    } finally server.stop()
  }

  /** Fork a real child JVM on this (sbt-forked) test JVM's classpath
    * with the same JDK-17 module opens and a small heap — a genuinely
    * cold process sharing nothing with the parent.
    */
  private def forkChild(main: String, args: Seq[String]): (Process, java.io.File) = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val log = Files.createTempFile(s"${main.split('.').last}-", ".log").toFile
    val pb = new ProcessBuilder(
      (Seq(java) ++ addOpens ++ Seq(
        "-Xms512m", "-Xmx3g",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, main) ++ args): _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    (pb.start(), log)
  }

  private def tail(f: java.io.File): String = {
    val lines = Source.fromFile(f).getLines().toSeq
    lines.takeRight(25).mkString("\n")
  }
}
