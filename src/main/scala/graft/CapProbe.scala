package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Dev tool: measure the bucket-population cap's two physical shapes on a
  * PLANTED mega-bucket — the skew case the cap exists for (a boilerplate
  * shingle / saturated LSH chunk shared by a large fraction of a corpus).
  *
  * Shapes compared on an identical (id, band, bandhash) frame:
  *  - window  — count().over(Window.partitionBy(band, bandhash)): the
  *    r4–r7 implementation. Routes EVERY row of the mega key to one task
  *    and buffers it there before the cap filter drops it.
  *  - join    — groupBy(key).count → filter → join (the r8 shape, mirrors
  *    bucketAggJaccardPairs): only (key, count) partials shuffle for the
  *    cap decision; the mega key's rows are dropped map-side by the join.
  *
  * Reported per shape: wall (min of 3 warm), peak single-task shuffle-read
  * bytes and peak task wall — the single-task-buffer signal. Usage:
  * `sbt "runMain graft.CapProbe [nDocs] [megaShare%]"` (defaults 2M, 25).
  */
object CapProbe {

  /** Second recorded experiment (`runMain graft.CapProbe splice`): the
    * splice finalize's cost is metadata + rename, not data volume —
    * measured against sortAndFinalizeStaged on the same pre-sorted
    * half-of-sf1-events staged delta (~500k rows).
    */
  private def spliceExperiment(): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/graft-sf1") + "/events.parquet")
    // ts is TIMESTAMP_MICROS since the testdata regen: take the percentile
    // in epoch-µs and compare with a foldable ts-typed literal (Ts.usLit)
    val tsT = ev.schema("ts").dataType
    val cut = graft.core.Ts.usLit(
      ev.agg(expr("percentile_approx(unix_micros(cast(ts as timestamp)), 0.5)"))
        .head.getLong(0), tsT)
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[splice] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mkLib() = {
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-splice-exp-").toString, spark)
      lib.write("ev", ev.filter(col("ts") < cut), Some("ts"), targetRows = 1000000)
      lib.stage("ev", ev.filter(col("ts") >= cut)
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts"))
      lib
    }
    val lib1 = mkLib()
    timed("finalizeStaged splice, 500k-row staged delta") {
      lib1.finalizeStaged("ev", mode = "append")
    }
    println("[splice] rows=" + lib1.read("ev").count())
    val lib2 = mkLib()
    timed("sortAndFinalizeStaged, same delta") {
      lib2.sortAndFinalizeStaged("ev", Some("ts"), mode = "append", targetRows = 1000000)
    }
    println("[splice] rows=" + lib2.read("ev").count())
    spark.stop()
  }

  /** Third recorded experiment (`runMain graft.CapProbe dropdup [nDocs]
    * [megaShare%]`): dropExactDuplicates on a PLANTED mega duplicate group
    * — megaShare% of the corpus is ONE identical ~1 KiB text (the
    * boilerplate-page case). Compares the r8 window shape
    * (row_number over partitionBy(fingerprint): the whole group, text
    * included, buffers on one task) against the r9 groupBy-min + semi-join
    * shape, reporting peak single-task shuffle-read bytes.
    */
  private def dropdupExperiment(args: Array[String]): Unit = {
    val nDocs = if (args.length > 1) args(1).toLong else 2000000L
    val megaPct = if (args.length > 2) args(2).toInt else 25
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mod = 100 / megaPct
    // ~1 KiB per text; every mod-th doc is the SAME text (one mega group),
    // the rest are unique (id baked in). Stored once so both shapes read
    // identical input through a real (splittable) parquet scan.
    val path = s"/tmp/graft-dropdup-$nDocs-$megaPct"
    if (!new java.io.File(path).exists())
      spark.range(nDocs)
        .select(col("id").as("doc_id"),
          when(col("id") % mod === 0, lit("boilerplate page " * 64))
            .otherwise(concat(lit("unique doc " * 64), col("id").cast("string")))
            .as("text"))
        .write.parquet(path)
    val docs = spark.read.parquet(path)

    // identical texts compress to almost nothing in the shuffle stream, so
    // compressed-bytes-read hides the buffer: peak per-task RECORDS read is
    // the honest single-task-buffer signal (WindowExec holds them
    // UNCOMPRESSED in memory)
    val peakRecs = new AtomicLong(0)
    val peakMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peakRecs.getAndAccumulate(m.shuffleReadMetrics.recordsRead, Math.max)
          peakMs.getAndAccumulate(m.executorRunTime, Math.max)
        }
      }
    })
    def run(name: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      val walls = (0 until 3).map { i =>
        if (i == 2) { peakRecs.set(0); peakMs.set(0) }
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500)
      println(f"[dropdup] $name%-6s wall=${walls.min}%.2fs " +
        f"peakTaskShuffleRecords=${peakRecs.get}%d " +
        f"peakTaskWall=${peakMs.get / 1000.0}%.2fs")
    }
    println(s"[dropdup] nDocs=$nDocs megaGroupRows=${nDocs / mod} (~1KiB texts)")
    run("window", {
      val w = Window.partitionBy(
        graft.functions.Text.fingerprint(col("text"))).orderBy(col("doc_id"))
      docs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    })
    run("join", graft.functions.Dedup.dropExactDuplicates(docs, "doc_id", "text"))
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("splice")) { spliceExperiment(); return }
    if (args.headOption.contains("dropdup")) { dropdupExperiment(args); return }
    val nDocs = if (args.length > 0) args(0).toLong else 2000000L
    val megaPct = if (args.length > 1) args(1).toInt else 25
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 4 bands per doc. Band 0 of every megaPct-th doc collapses into ONE
    // bucket (the planted mega key); every other (doc, band) gets a
    // unique-ish hash → singleton buckets that no cap touches.
    val mod = 100 / megaPct
    // the trailing repartition mirrors the real operators, where the cap's
    // input hangs off a keyed aggregate's exchange: the two-sided shapes
    // then REUSE that exchange instead of double-evaluating the generator
    val banded = spark.range(nDocs)
      .select(col("id"), explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("id"), col("band"),
        when(col("band") === 0 && col("id") % mod === 0, lit(0L))
          .otherwise(xxhash64(col("id"), col("band"))).as("bandhash"))
      .repartition(col("id"))

    val maxBucket = 1000

    def windowCap(df: DataFrame): DataFrame =
      df.withColumn("n", count(lit(1)).over(Window.partitionBy("band", "bandhash")))
        .filter(col("n") <= maxBucket).drop("n")

    def joinCap(df: DataFrame): DataFrame = {
      val ok = df.groupBy("band", "bandhash").agg(count(lit(1)).as("n"))
        .filter(col("n") <= maxBucket).select("band", "bandhash")
      df.join(ok, Seq("band", "bandhash"))
    }

    // anti: the OVER-cap key set is tiny (skew keys only) → AQE broadcasts
    // it and the mega rows are dropped MAP-SIDE; data never shuffles for
    // the cap at all. The semi form above must shuffle df to join against
    // the huge survivor-key set.
    def antiCap(df: DataFrame): DataFrame = {
      val bad = df.groupBy("band", "bandhash").agg(count(lit(1)).as("n"))
        .filter(col("n") > maxBucket).select("band", "bandhash")
      df.join(bad, Seq("band", "bandhash"), "left_anti")
    }

    // peak-task metrics via listener: max shuffle-read bytes and max task
    // wall across all tasks of the measured run
    val peakBytes = new AtomicLong(0)
    val peakMs = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peakBytes.getAndAccumulate(m.shuffleReadMetrics.totalBytesRead, Math.max)
          peakMs.getAndAccumulate(m.executorRunTime, Math.max)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(name: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(500) // listener bus is async: drain the warm run's events
      val walls = (0 until 3).map { i =>
        if (i == 2) { peakBytes.set(0); peakMs.set(0) } // peaks from last pass only
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500)
      println(f"[cap] $name%-6s wall=${walls.min}%.2fs " +
        f"peakTaskShuffleRead=${peakBytes.get / 1048576.0}%.1fMiB " +
        f"peakTaskWall=${peakMs.get / 1000.0}%.2fs")
    }

    val megaRows = nDocs / mod
    println(s"[cap] nDocs=$nDocs bands=4 megaBucketRows=$megaRows maxBucket=$maxBucket")
    run("window", windowCap(banded))
    run("join", joinCap(banded))
    run("anti", antiCap(banded))
    if (args.contains("--plan")) {
      val a = antiCap(banded)
      a.write.format("noop").mode("overwrite").save()
      println("[cap] anti final plan:\n" +
        a.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
