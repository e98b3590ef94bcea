package graft

import graft.core.Library.AsOf

/** Child process of the cross-process GC-grace race (see
  * [[MultiJvmCasRaceSpec]]): a REAL separate JVM that resolves a
  * version's manifest, signals the parent, waits for the parent to
  * commit a new version AND prune the old one, then runs its scan —
  * the exact reader-vs-prune interleaving `gcGraceMs` exists for, with
  * no shared FileSystem statistics, manifest cache, or open handles
  * masking the race (the in-JVM two-handle variant in
  * HttpLibraryLifecycleSpec shares all three).
  *
  * Prints `GRACE-READER-DONE n=<count>` on success; an FNF mid-scan
  * (the gcGraceMs=0 contrast leg) escapes as an uncaught exception and
  * a nonzero exit.
  */
object MultiJvmGraceReader {
  def main(args: Array[String]): Unit = {
    val port = args(0).toInt
    val bucket = args(1)

    val (spark, lib) = MultiJvmPlumbing.openLibrary(port, bucket)

    // resolve v0's manifest NOW (read() lists files eagerly), then let
    // the parent prune before the scan runs
    val preResolved = lib.read("s", AsOf.Version(0))
    MultiJvmPlumbing.putKey(port, s"/__grace/$bucket/resolved")
    while (!MultiJvmPlumbing.keyExists(port, s"/__grace/$bucket/pruned"))
      Thread.sleep(20)

    val n = preResolved.count() // scans files the prune condemned
    println(s"GRACE-READER-DONE n=$n")
    spark.stop()
    sys.exit(0)
  }
}
