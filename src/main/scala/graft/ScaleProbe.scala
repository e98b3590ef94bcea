package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.AsOfJoin
import graft.query.QueryBuilder

/** Dev tool: replicate the sf0.1 tables N× (ids offset so keys stay
  * distinct) into /tmp and time the shuffle-heavy operators — evidence for
  * the "does this survive a scale-up" question that local SFs can't
  * answer. Usage: `sbt "runMain graft.ScaleProbe [multiplier]"`.
  */
object ScaleProbe {

  private def replicate(
      spark: SparkSession, src: String, table: String, n: Int,
      idCols: Seq[String], offset: Long): DataFrame = {
    val base = spark.read.parquet(s"$src/$table.parquet")
    (0 until n).map { i =>
      idCols.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(i * offset)))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val src = "/root/testdata/sf0.1"
    val out = s"/tmp/graft-scale-${mult}x"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = new java.io.File(out)
    if (!dir.exists()) {
      replicate(spark, src, "events", mult, Seq("event_id", "user_id"), 10000000L)
        .write.parquet(s"$out/events.parquet")
      replicate(spark, src, "lineitem", mult, Seq("l_orderkey"), 100000000L)
        .write.parquet(s"$out/lineitem.parquet")
    }
    val ev = spark.read.parquet(s"$out/events.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    println(s"[scale] events=${ev.count()} lineitem=${li.count()} (${mult}x)")

    def time(name: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("groupby_agg") {
      QueryBuilder().groupByAgg(
        Seq("l_returnflag", "l_linestatus"),
        Seq(("sum_qty", "l_quantity", "sum"), ("avg_disc", "l_discount", "mean"),
          ("n", "l_quantity", "count")))(li)
    }
    time("join_broadcast_agg") {
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(sum("l_extendedprice").as("rev"))
    }
    time("window_running") {
      val w = Window.partitionBy("user_id").orderBy("ts")
      ev.select(col("event_id"), sum("value").over(
        w.rowsBetween(Window.unboundedPreceding, 0)).as("running"))
    }
    time("asof_join") {
      AsOfJoin.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "signup"),
        "ts", Seq("user_id"), Seq("value"))
    }
    time("resample_1h") {
      QueryBuilder().resample("ts", "1h",
        Seq(("v", "value", "sum"), ("n", "value", "count")))(ev)
    }

    // Text-dedup stress: replicating docs keeps the TEXT identical, so
    // every doc gains (mult-1) exact twins — the adversarial case where
    // shingle buckets are mult× deeper and the candidate set explodes
    // quadratically per bucket.
    if (!new java.io.File(s"$out/documents.parquet").exists())
      replicate(spark, src, "documents", mult, Seq("doc_id"), 1000000L)
        .write.parquet(s"$out/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"[scale] documents=${docs.count()} (every text has ${mult - 1} twins)")
    time("dedup_exact") {
      graft.functions.Dedup.exactDuplicateGroups(docs, "doc_id", "text")
    }
    time("minhash_candidates") {
      graft.functions.Dedup.minhashCandidates(docs, "doc_id", "text")
    }
    time("ngram_jaccard") {
      graft.functions.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
    }
    // The production pipeline order: exact-dedup BEFORE near-dup search.
    // Exact twins are quadratic noise to the inverted index (every bucket
    // mult× deeper, C(mult,2) pairs per group); removing them first
    // returns the near-dup step to the deduplicated corpus size.
    time("dedup_then_ngram") {
      graft.functions.Dedup.ngramJaccardPairs(
        graft.functions.Dedup.dropExactDuplicates(docs, "doc_id", "text"),
        "doc_id", "text", 3, 0.2)
    }
    // SimHash under mult× duplication: every clone group shares identical
    // signatures, so chunk buckets are mult× deeper. The default maxBucket
    // keeps pair generation bounded (clone groups emit C(mult,2) pairs per
    // surviving bucket, never corpus-quadratic); compare the capped wall
    // time against an effectively-uncapped run.
    time("simhash_pairs_capped") {
      graft.functions.Dedup.simhashPairs(docs, "doc_id", "text")
    }
    println(s"[scale] simhash capped pairs=" +
      graft.functions.Dedup.simhashPairs(docs, "doc_id", "text").count())

    // Batch-write overlap: N symbols written through the driver thread
    // pool vs a sequential loop. Spark schedules concurrent jobs across
    // idle cores, so the pooled batch should land well under N× one
    // write's latency — the property that matters when a real cluster
    // ingests hundreds of symbols.
    {
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-scale-batch-").toString, spark)
      val syms = (0 until 8).map(i => s"batch$i" -> ev.limit(200000))
      val t0 = System.nanoTime()
      syms.foreach { case (s, df) => lib.write(s + "_seq", df, Some("ts"), 100000) }
      val seq = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      lib.writeBatch(syms, Some("ts"), 100000)
      val par = (System.nanoTime() - t1) / 1e9
      println(f"[scale] write 8 symbols sequential: $seq%.2f s, pooled batch: $par%.2f s")
    }
    spark.stop()
  }
}
