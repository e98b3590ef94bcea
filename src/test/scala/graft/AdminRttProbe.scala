package graft

import graft.core.{Graft, Library}

/** Admin-plane census at 10k symbols WITH simulated per-op object-store
  * RTT (VERDICT r19 #7) — the AdminScaleProbe rows re-measured where
  * every metadata op costs a round trip, which is what separates "an
  * admin query" from "an overnight job" on a real object store. Lives
  * in the test tree because it drives the HttpCas harness (the
  * in-process S3-shaped store: conditional PUT, copy+delete rename,
  * prefix-synthesized directories).
  *
  * Phases: fabricate n symbols × 2 versions over the store at ZERO
  * delay (fabrication cost is AdminScaleProbe's row, not this one),
  * then set a per-request delay and measure each census leg — wall,
  * and the op count the wall divides into (ops × delay / wall = the
  * leg's effective parallelism over the store).
  *
  * Usage: sbt "Test/runMain graft.AdminRttProbe [nSymbols] [delayMs]"
  * (default 10000 symbols, 2 ms — same-region object-store GET order).
  */
object AdminRttProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val delay = args.drop(1).headOption.map(_.toLong).getOrElse(2L)
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val server = new HttpObjectStore.Server
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.s3.impl", classOf[HttpCasFileSystem].getName)
      val g = new Graft(s"s3://127.0.0.1:${server.port}/bucket", spark)
      val lib = g.createLibrary("adm")

      def time[T](tag: String)(f: => T): T = {
        val r0 = server.requests
        val t0 = System.nanoTime()
        val r = f
        val w = (System.nanoTime() - t0) / 1e9
        val ops = server.requests - r0
        val par = if (w > 0) ops * delay / 1000.0 / w else 0.0
        println(f"[adminrtt] $tag%-36s wall=$w%8.2fs ops=$ops%7d " +
          f"parallelism=${par}%5.1fx (n=$n delay=${delay}ms)")
        r
      }

      val rows = spark.range(10).selectExpr("id as ts2", "cast(id as double) as v")
      val rows2 = spark.range(10, 20).selectExpr("id as ts2", "cast(id as double) as v")
      time(s"fabricate ${n}x2 (delay OFF)") {
        // parallelism 32 (not the default 8): fabrication is probe
        // setup, bounded by Spark write-job latency × symbol count
        (0 until n).map(i => f"sym$i%05d").grouped(500).foreach { grp =>
          lib.writeBatch(grp.map((_, rows)), Some("ts2"), parallelism = 32)
            .foreach(_.get)
          lib.appendBatch(grp.map((_, rows2)), parallelism = 32).foreach(_.get)
        }
        (0 until n by 50).foreach(i => lib.stage(f"sym$i%05d", rows))
      }

      server.delayMs = delay
      val bySym = time("sizesBySymbol (pool, RTT)")(
        g.getLibrary("adm").sizesBySymbol().collect())
      require(bySym.map(_.getString(0)).distinct.length == n + 1, // +1 snapshots row
        s"census rows: ${bySym.length}")
      time("sizes (pool, RTT)")(g.getLibrary("adm").sizes().collect())
      val ss = time("storageSummary (pool, RTT)")(
        g.getLibrary("adm").storageSummary().collect())
      require(ss.length == n, s"storageSummary rows: ${ss.length}")
      time("maintain dryRun (pool, RTT)")(
        g.maintain(keepVersions = 1, dryRun = true).collect())
      time("maintain apply (pool, RTT)")(
        g.maintain(keepVersions = 1).collect())
    } finally { server.stop(); spark.stop() }
  }
}
