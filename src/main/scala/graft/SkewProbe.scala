package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.{AsOfJoin, MergeUpdate}

/** Dev tool (VERDICT r10 #6): measure the two remaining key-skew
  * exposures — the as-of join's per-key window and MERGE's full-outer
  * join — on a PLANTED mega key, CapProbe-style.
  *
  * As-of: AQE skew handling splits JOIN partitions, never WINDOW
  * partitions, so `asofJoin`'s per-key window serializes a mega key
  * (one symbol holding megaShare% of all events) on one task.
  * `asofJoinChunked` is the fix — per-(key, time-chunk) windows plus a
  * summary-sized carry prefix scan. This probe reports wall, peak
  * single-task shuffle records, and peak task wall for both shapes on
  * the same planted-skew input.
  *
  * MERGE: AQE's OptimizeSkewedJoin cannot split a FULL OUTER join
  * (neither side may be replicated), so a duplicated merge key
  * concentrates — but exact-equality merge on duplicated keys is a
  * per-key CROSS PRODUCT by semantics (k_t × k_s matched rows), so the
  * output explodes before the plan does; on the (near-)unique index
  * keys the operator is defined for, distinct keys hash-distribute and
  * no per-key concentration is possible. The probe demonstrates both:
  * unique-key wall at n rows, and the quadratic output row count of a
  * small planted dup block.
  *
  * Usage: `sbt "runMain graft.SkewProbe [nRows] [megaShare%] [chunks]"`
  * (defaults 4M, 25, 64).
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val megaPct = if (args.length > 1) args(1).toInt else 25
    val chunks = if (args.length > 2) args(2).toInt else 64
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
      println(f"[skew] $name%-18s wall=${walls.min}%.2fs " +
        f"peakTaskShuffleRecords=${peakRecs.get}%d " +
        f"peakTaskWall=${peakMs.get / 1000.0}%.2fs")
    }

    // ---- as-of: megaShare% of BOTH sides is user_id 0, timestamps
    // interleave across the whole range (the realistic mega-symbol
    // shape). Stored parquet so both shapes read identical splittable
    // input.
    val mod = 100 / megaPct
    val path = s"/tmp/graft-skew-asof-$n-$megaPct"
    if (!new java.io.File(path).exists()) {
      spark.range(n)
        .select(
          when(col("id") % mod === 0, 0L)
            .otherwise(pmod(col("id"), lit(50000L))).as("user_id"),
          (col("id") * 1000L).as("ts"),
          rand(7).as("v"))
        .write.parquet(path)
    }
    val ev = spark.read.parquet(path)
    val leftSide = ev.select(col("user_id"), (col("ts") + 500L).as("ts"))
    val rightSide = ev.select(col("user_id"), col("ts"), col("v"))
    println(s"[skew] asof: n=$n megaRows=${n / mod} (user_id 0) chunks=$chunks")
    run("asof-window", AsOfJoin.asofJoin(
      leftSide, rightSide, "ts", Seq("user_id"), Seq("v")))
    run("asof-chunked", AsOfJoin.asofJoinChunked(
      leftSide, rightSide, "ts", Seq("user_id"), Seq("v"), chunks = chunks))

    // ---- MERGE on near-unique keys (the data-model case): no per-key
    // concentration is possible regardless of AQE, because every key is
    // distinct.
    val target = spark.range(n).select(col("id").as("k"), rand(1).as("v"))
    val source = spark.range(n / 2).select((col("id") * 2).as("k"), rand(2).as("v"))
    run("merge-unique-keys", MergeUpdate.merge(target, source, Seq("k")))

    // ---- MERGE with a planted duplicate block: 2k copies of one key on
    // each side -> 4M matched rows from 4k inputs. The quadratic OUTPUT
    // is the bound that bites first; a full-outer plan split could not
    // change it.
    val dupT = spark.range(2000).select(lit(42L).as("k"), rand(3).as("v"))
      .unionAll(spark.range(100000).select((col("id") + 100L).as("k"), rand(4).as("v")))
    val dupS = spark.range(2000).select(lit(42L).as("k"), rand(5).as("v"))
    val dupOut = MergeUpdate.merge(dupT, dupS, Seq("k")).count()
    println(s"[skew] merge-dup-block: 2k x 2k copies of one key -> " +
      s"$dupOut rows (quadratic by MERGE semantics, not a plan artifact)")
    spark.stop()
  }
}
