package graft

import graft.core.{Graft, Library}

/** Admin-plane scale rehearsal (VERDICT r18 #5): every data-plane
  * operator carries measured sf1–sf50 posture, but the admin walks
  * (maintain / sizes / sizesBySymbol / storageSummary / restore) only
  * had correctness specs. This probe fabricates a many-symbol root —
  * the dimension the admin plane actually scales in is SYMBOL COUNT,
  * not rows — and measures each walk pooled (the shipping code path)
  * against a hand-rolled serial driver loop doing identical per-symbol
  * work, with the serial loop's per-symbol p50/p99. The question each
  * row answers: at a 10k-symbol object-store root, is the census an
  * admin query or an overnight job?
  *
  * Usage: `sbt "runMain graft.AdminScaleProbe [nSymbols]"` (default
  * 2000). Symbols are tiny (10 rows, 2 versions, staged debris on every
  * 50th) — the walk cost is metadata round-trips, which is exactly what
  * the probe must count.
  */
object AdminScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-adminscale-").toString
    val g = new Graft(root, spark)
    val lib = g.createLibrary("adm")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[adminscale] $tag%-34s wall=${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // ---- fabricate: n symbols × 2 versions (+ staged debris on every
    // 50th) through the batch pool — itself an admin-plane data point
    val rows = spark.range(10).selectExpr("id as ts2", "cast(id as double) as v")
    val rows2 = spark.range(10, 20).selectExpr("id as ts2", "cast(id as double) as v")
    time(s"fabricate ${n}x2 versions (pool)") {
      (0 until n).map(i => f"sym$i%05d").grouped(500).foreach { g =>
        lib.writeBatch(g.map((_, rows)), Some("ts2")).foreach(_.get)
        lib.appendBatch(g.map((_, rows2))).foreach(_.get)
      }
      (0 until n by 50).foreach(i => lib.stage(f"sym$i%05d", rows))
    }

    // ---- the four censuses, pooled (the library code path); FRESH
    // handles per census so manifest caches are cold, like a real
    // admin session opening the library
    val bySym = time("sizesBySymbol (pool, cold)")(
      g.getLibrary("adm").sizesBySymbol().collect())
    require(bySym.map(_.getString(0)).distinct.length == n + 1, // +1 snapshot row
      s"census rows: ${bySym.length}")
    time("sizes (pool, cold)")(g.getLibrary("adm").sizes().collect())
    val ss = time("storageSummary (pool, cold)")(
      g.getLibrary("adm").storageSummary().collect())
    require(ss.length == n, s"storageSummary rows: ${ss.length}")
    time("keyTree one symbol")(lib.keyTree("sym00000").collect())

    // ---- serial twin of storageSummary's per-symbol work — the exact
    // shape the pre-r19 implementation had (driver loop: listVersions +
    // manifest parse + recursive du), cold manifest cache, with
    // per-symbol latencies (the p99 a 10k-symbol root multiplies)
    val cold = g.getLibrary("adm")
    val perSym = new Array[Double](n)
    time("storageSummary (serial twin, cold)") {
      def du(f: java.io.File): Long =
        if (!f.exists()) 0L
        else if (f.isFile) f.length()
        else f.listFiles().map(du).sum
      (0 until n).foreach { i =>
        val sym = f"sym$i%05d"
        val t0 = System.nanoTime()
        val versions = cold.listVersions(sym)
        val m = cold.manifest(sym, versions.last)
        val bytes = du(new java.io.File(s"$root/adm/$sym/data")) +
          du(new java.io.File(s"$root/adm/$sym/_staged"))
        require(m.version >= 0 && bytes >= 0)
        perSym(i) = (System.nanoTime() - t0) / 1e6
      }
    }
    val sorted = perSym.sorted
    println(f"[adminscale] serial per-symbol p50=${sorted(n / 2)}%6.2fms " +
      f"p99=${sorted(n * 99 / 100)}%6.2fms max=${sorted.last}%6.2fms")

    // ---- maintenance + restore at symbol-count scale. Restore runs
    // BEFORE maintain (keepVersions=1 hard-deletes v0 — restoring it
    // afterwards would only "work" off a warm manifest cache) and on a
    // COLD handle, the probe's convention.
    time("restoreVersion one symbol (cold)")(
      g.getLibrary("adm").restoreVersion("sym00001", Library.AsOf.Version(0)))
    time("Graft.maintain dryRun (pool)")(g.maintain(keepVersions = 1, dryRun = true).collect())
    time("Graft.maintain apply (pool)")(g.maintain(keepVersions = 1).collect())
    spark.stop()
  }
}
