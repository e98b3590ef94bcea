package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Library}

/** Dev tool: measures what the persisted MinHash index (q123) buys over
  * re-running the self-join dedup per ingest drop. Per dir:
  *   - corpus = 95% of documents, batch = the 5% "daily drop",
  *   - BUILD: one-time index construction (amortized across drops),
  *   - CAND A: minhashCandidatesAgainstIndex(batch) — candidates via the
  *     persisted band rows (probe-key pruned read, corpus NEVER
  *     re-shingled),
  *   - CAND B: minhashCandidates(corpus ∪ batch) cross pairs — the
  *     no-index equivalent, which re-signatures the whole corpus,
  *   - FULL A: dedupAgainstIndex — candidates + exact verification +
  *     admission, the production per-drop path.
  * Both candidate paths produce the SAME pair set (printed as a
  * cross-check — the MinhashIndexSpec parity, measured). Every timed
  * stage runs once untimed first (scan + JIT warm), then timed; the
  * structural story is in the walls' GROWTH across dirs: cand B grows
  * with the corpus, cand A with the batch.
  *
  * Usage: `sbt "runMain graft.IndexProbe [dir ...]"`
  * (default: /tmp/graft-sf1 /tmp/graft-sf5).
  */
object IndexProbe {

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq else Seq("/tmp/graft-sf1", "/tmp/graft-sf5")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def timed[A](f: => A): (Double, Double, A) = {
      f // warm: scans, JIT, codegen
      shufBytes.set(0)
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, shufBytes.get / 1048576.0, a)
    }

    for (dir <- dirs if new java.io.File(s"$dir/documents.parquet").exists) {
      val tag = dir.split('/').last
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // FIXED batch across dirs (the base replica's %20 slice — gen_sf1
      // replica stride is 10k for the 5k-doc sf0.1 source), so corpus
      // size is the only variable: candScratch must grow with the
      // corpus, candIdx must not.
      val isBatch = col("doc_id") % 20 === 0 && col("doc_id") < 10000
      val corpus = docs.filter(!isBatch)
      val batch = docs.filter(isBatch)
      val root = java.nio.file.Files.createTempDirectory(s"graft-idxprobe-")
      val lib = new Library(root.toString, spark)
      lib.write("docs", corpus, Some("doc_id"))

      val bT0 = System.nanoTime()
      graft.functions.Dedup.buildMinhashIndex(
        lib, corpus, "doc_id", "text", "mh")
      val bWall = (System.nanoTime() - bT0) / 1e9
      val (aWall, aShuf, aCand) = timed {
        graft.functions.Dedup.minhashCandidatesAgainstIndex(
          lib, batch, "mh", "doc_id", "text").count()
      }
      val (sWall, sShuf, sCand) = timed {
        graft.functions.Dedup.minhashCandidates(docs, "doc_id", "text")
          .filter((col("id_a") % 20 === 0) =!= (col("id_b") % 20 === 0))
          .count()
      }
      val (fWall, fShuf, fKept) = timed {
        graft.functions.Dedup.dedupAgainstIndex(
          lib, batch, "mh", "docs", "doc_id", "text", threshold = 0.5)
          .count()
      }
      println(f"[index] $tag%-10s corpus=${corpus.count()}%d batch=${batch.count()}%d " +
        f"build=${bWall}%6.2fs | candIdx=${aWall}%6.2fs/${aShuf}%7.1fMB " +
        f"candScratch=${sWall}%6.2fs/${sShuf}%7.1fMB speedup=${sWall / aWall}%5.2fx " +
        f"| fullProbe=${fWall}%6.2fs/${fShuf}%7.1fMB " +
        f"| pairs=$aCand%d/$sCand%d kept=$fKept%d")
    }
    spark.stop()
  }
}
