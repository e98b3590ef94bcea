package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.Dedup

/** Dev tool (r12): measure the prefix-filtered exact-Jaccard path
  * against the incidence aggregate on a corpus with NATURAL vocabulary
  * skew — the regime prefix filtering is for.
  *
  * The sf-dir rehearsal corpora can't show this: their generator vocab
  * is so small (300k distinct shingles across 500k docs at sf10, median
  * df 141) that no shingle is rare, prefix buckets stay population-
  * sized, and the path correctly DELEGATES via the PrefixMaxAvgDf gate.
  * This probe plants the shape real crawls have instead: every doc is
  * mostly doc-unique text (df-1 shingles), 10% of docs form 3-doc
  * near-identical clusters (Jaccard ≈ 0.85 — the t ≥ 0.8 dedup regime),
  * and every doc embeds one of `nPassages` fixed boilerplate passages
  * (df ≈ n/nPassages) — the moderate-frequency mass that makes the
  * incidence path pay Σ|bucket|² ≈ 18·n²/nPassages co-occurrences while
  * the prefix path never buckets on it (boilerplate shingles are never
  * among a doc's rarest).
  *
  * Usage: `sbt "runMain graft.PrefixProbe [nDocs] [nPassages]"`
  * (defaults 100000, 100).
  */
object PrefixProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val nPassages = if (args.length > 1) args(1).toInt else 100
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufBytes = new AtomicLong(0)
    val peakMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakMs.getAndAccumulate(m.executorRunTime, Math.max)
        }
      }
    })

    val path = s"/tmp/graft-prefix-probe-v2-$n-$nPassages"
    if (!new java.io.File(path).exists()) {
      // cluster docs (id < n/10): body shared by the 3-doc cluster plus
      // 3 doc-unique tokens; other docs fully unique bodies. All docs
      // append fixed passage (id % nPassages).
      val body = spark.range(n).select(col("id"),
        when(col("id") < n / 10,
          concat_ws(" ",
            concat_ws(" ", transform(sequence(lit(1), lit(60)),
              i => concat(lit("c"), expr("id div 3"), lit("x"), i))),
            concat_ws(" ", transform(sequence(lit(1), lit(3)),
              i => concat(lit("u"), col("id"), lit("y"), i)))))
          .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(63)),
            i => concat(lit("u"), col("id"), lit("x"), i))))
          .as("__body"))
      // passage keyed on (id div 3) so a 3-doc cluster shares its passage
      // (keeps cluster Jaccard ~0.9, above the probe threshold)
      val pass = concat_ws(" ", transform(sequence(lit(1), lit(20)),
        i => concat(lit("p"), pmod(expr("id div 3"), lit(nPassages.toLong)),
          lit("x"), i)))
      body.select(col("id").as("doc_id"),
        concat_ws(" ", col("__body"), pass).as("text"))
        .repartition(32)
        .write.parquet(path)
    }
    val docs = spark.read.parquet(path)

    def run(name: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      var best = Double.MaxValue
      (0 until 2).foreach { _ =>
        shufBytes.set(0); peakMs.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      Thread.sleep(300)
      println(f"[prefix] $name%-12s wall=$best%8.2fs " +
        f"shuffleWrite=${shufBytes.get / 1048576.0}%8.1fMB " +
        f"peakTaskWall=${peakMs.get / 1000.0}%6.2fs")
    }

    val pairs = Dedup.ngramJaccardPairsImpl(docs, "doc_id", "text", 3, 0.8,
      maxDocFreq = 0, forceDense = Some(false), forcePrefix = Some(true))
    val viaAgg = Dedup.ngramJaccardPairsImpl(docs, "doc_id", "text", 3, 0.8,
      maxDocFreq = 0, forceDense = Some(false), forcePrefix = Some(false))
    println(s"[prefix] pair count (prefix path): ${pairs.count()}")
    run("prefix", pairs)
    run("incidence", viaAgg)
    spark.stop()
  }
}
