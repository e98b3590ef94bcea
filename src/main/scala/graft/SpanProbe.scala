package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.Dedup

/** Dev tool (VERDICT r11 #1): measure the q112 shuffle diet on a PLANTED
  * heavy-duplication corpus — the shape where exact-substring dedup
  * actually runs in production (a boilerplate passage shared by a large
  * corpus fraction at arbitrary alignments).
  *
  * Compares Dedup.dropRepeatedSpans (r12 plan: 8-byte gram-hash keys →
  * per-affected-doc sorted start arrays → map-side ExciseSpans kernel)
  * against the r11 plan it replaced (span-TEXT keys through the stats
  * exchange, then a token-level posexplode → (doc,pos) anti-join →
  * collect_list reassembly), re-created inline here as the measurement
  * reference. Reports min wall over 3 runs plus TOTAL shuffle bytes
  * written and peak single-task shuffle records (listener-true numbers,
  * not plan estimates).
  *
  * Usage: `sbt "runMain graft.SpanProbe [nDocs] [dupPct] [wordsPerDoc]"`
  * (defaults 200000, 30, 60).
  */
object SpanProbe {

  /** The r11 token-level formulation, kept verbatim as the baseline. */
  private def oldDropRepeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      spanWords: Int, minDocFreq: Int): DataFrame = {
    val w = df.select(col(idCol).as("__sid"), split(col(textCol), " ", -1).as("__w"))
    val grams = w.filter(size(col("__w")) >= spanWords)
      .select(col("__sid"), posexplode(transform(
        sequence(lit(1), size(col("__w")) - spanWords + 1),
        start => concat_ws(" ", slice(col("__w"), start, lit(spanWords))))))
      .select(col("__sid"), (col("pos") + 1).as("__s"), col("col").as("__gram"))
    val stats = grams.groupBy("__gram")
      .agg(count_distinct(col("__sid")).as("__df"), min(col("__sid")).as("__canon"))
    val dupStarts = grams.join(stats, "__gram")
      .filter(col("__df") >= minDocFreq && col("__sid") =!= col("__canon"))
      .select(col("__sid"), col("__s"))
    val covered = dupStarts
      .select(col("__sid"),
        explode(sequence(col("__s"), col("__s") + spanWords - 1)).as("__pos"))
      .distinct()
    val toks = w.select(col("__sid"), posexplode(col("__w")))
      .select(col("__sid"), (col("pos") + 1).as("__pos"), col("col").as("__tok"))
    val rebuilt = toks.join(covered, Seq("__sid", "__pos"), "left_anti")
      .groupBy("__sid")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          e => e.getField("__tok"))).as("__text"))
    df.select(col(idCol)).join(rebuilt, df(idCol) === rebuilt("__sid"), "left")
      .select(col(idCol), coalesce(col("__text"), lit("")).as(textCol))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val dupPct = if (args.length > 1) args(1).toInt else 30
    val wpd = if (args.length > 2) args(2).toInt else 60
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufBytes = new AtomicLong(0)
    val peakRecs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakRecs.getAndAccumulate(m.shuffleReadMetrics.recordsRead, Math.max)
        }
      }
    })

    // dupPct% of docs embed the same 16-word passage at a doc-dependent
    // offset (any-alignment duplication); unique filler words elsewhere
    // keep gram frequencies honest. Stored parquet so both plans read
    // identical splittable input.
    val path = s"/tmp/graft-span-probe-$n-$dupPct-$wpd"
    if (!new java.io.File(path).exists()) {
      val passage = (0 until 16).map(i => s"shared$i").mkString(" ")
      spark.range(n).select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) < dupPct,
          concat_ws(" ",
            concat_ws(" ", transform(sequence(lit(1), pmod(col("id"), lit(20)).cast("int") + 4),
              i => concat(lit("u"), col("id"), lit("x"), i))),
            lit(passage),
            concat_ws(" ", transform(sequence(lit(1), lit(wpd - 20)),
              i => concat(lit("v"), col("id"), lit("x"), i)))))
          .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(wpd)),
            i => concat(lit("w"), col("id"), lit("x"), i))))
          .as("text"))
        .write.parquet(path)
    }
    val docs = spark.read.parquet(path)

    def run(name: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      var bestWall = Double.MaxValue
      (0 until 3).foreach { _ =>
        shufBytes.set(0); peakRecs.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        bestWall = math.min(bestWall, (System.nanoTime() - t0) / 1e9)
      }
      Thread.sleep(500)
      println(f"[span] $name%-12s wall=$bestWall%.2fs " +
        f"shuffleWrite=${shufBytes.get / 1048576.0}%.1fMB " +
        f"peakTaskShuffleRecords=${peakRecs.get}%d")
    }

    // count_distinct alternative of the r12 stats aggregate, kept for
    // A/B measurement (two-exchange expand plan vs map-side dedup)
    def r12CountDistinct: DataFrame = {
      val w = docs.select(col("doc_id").as("__sid"),
        split(col("text"), " ", -1).as("__w"))
      val grams = w.filter(size(col("__w")) >= 8)
        .select(col("__sid"), posexplode(transform(
          sequence(lit(1), size(col("__w")) - 8 + 1),
          start => xxhash64(concat_ws(" ", slice(col("__w"), start, lit(8))))))
          .as(Seq("__p", "__gh")))
        .select(col("__sid"), (col("__p") + 1).cast("long").as("__s"), col("__gh"))
      val dupGrams = grams.groupBy("__gh")
        .agg(count_distinct(col("__sid")).as("__df"), min(col("__sid")).as("__canon"))
        .filter(col("__df") >= 2).select(col("__gh"), col("__canon"))
      val starts = grams.join(dupGrams, "__gh")
        .filter(col("__sid") =!= col("__canon"))
        .groupBy("__sid").agg(array_sort(collect_set(col("__s"))).as("__starts"))
      docs.select(col("doc_id"), col("text"))
        .join(starts, col("doc_id") === col("__sid"), "left")
        .select(col("doc_id"),
          when(col("__starts").isNotNull,
            graft.plans.ExciseSpans(col("text"), col("__starts"), 8))
            .otherwise(coalesce(col("text"), lit(""))).as("text"))
    }

    run("r12-hashed", Dedup.dropRepeatedSpans(docs, "doc_id", "text", 8, 2))
    run("r12-cntdist", r12CountDistinct)
    run("r11-token", oldDropRepeatedSpans(docs, "doc_id", "text", 8, 2))
    spark.stop()
  }
}
