package graft

import graft.core.GraftSession

/** Fixed per-query path decomposition (VERDICT r18 #2a): where do the
  * ~100–200 ms walls of the sub-second sf0.1 headline queries actually
  * go — plan construction + analysis, optimization, or execution
  * (scheduling + compute)? Run on a handful of representative queries
  * with toggles for the suspects (AQE re-plan, shuffle width), so the
  * clawback targets measured cost, not guesses.
  *
  * Usage: runMain graft.FixedPathProbe [sfDir] — prints one line per
  * (query, variant) with build/plan/exec millis (median of 5 warm).
  */
object FixedPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = Seq("q03_filter_isin", "q10_resample_1h", "q20_merge_update",
      "q06_project_arith", "q08_groupby_agg", "q93_dsir_weights")

    def medians(name: String): (Double, Double, Double) = {
      def one(): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.analyzed // force analysis
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      one(); one() // warm
      val runs = (1 to 5).map(_ => one())
      def med(f: ((Double, Double, Double)) => Double) =
        runs.map(f).sorted.apply(2)
      (med(_._1), med(_._2), med(_._3))
    }

    def report(tag: String): Unit = qs.foreach { q =>
      val (b, p, e) = medians(q)
      println(f"[fixedpath] $tag%-22s $q%-28s build=$b%7.1fms plan=$p%7.1fms exec=$e%7.1fms")
    }

    // variant order is reversible (PROBE_ORDER=rev) to expose JIT
    // order-bias: later variants ride warmer code caches
    val variants: Seq[(String, () => Unit)] = Seq(
      ("baseline32/aqe", () => ()),
      ("noAQE", () => spark.conf.set("spark.sql.adaptive.enabled", "false")),
      ("aqe/shuffle8", () => {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
      }))
    val ordered =
      if (sys.env.get("PROBE_ORDER").contains("rev")) variants.reverse
      else variants
    ordered.foreach { case (tag, set) =>
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
      set()
      report(tag)
    }

    // q06 tail decomposition: where do the ~660 ms of the widest
    // map-output query live — single-task scan+project, the sort, or
    // the deterministic-order tail choice? Config resets FIRST: the
    // variants loop above ends on whatever its last variant set, and a
    // strategy comparison at the wrong shuffle width answers a
    // different question.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
    locally {
      import org.apache.spark.sql.functions._
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")), 6).as("profit"),
          (col("l_linenumber") * col("l_linenumber")).cast("long").as("lnsq"))
      def time(tag: String, df: => org.apache.spark.sql.DataFrame): Unit = {
        def one(): Double = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        one(); one()
        val t = (1 to 5).map(_ => one()).sorted.apply(2)
        println(f"[q06tail] $tag%-34s ${t * 1000}%7.1fms")
      }
      time("parallel, no order", base)
      time("coalesce(1), no sort", base.coalesce(1))
      time("coalesce(1)+sortWithin (current)",
        base.coalesce(1).sortWithinPartitions("l_orderkey", "l_linenumber"))
      time("repartition(1)+sortWithin",
        base.repartition(1).sortWithinPartitions("l_orderkey", "l_linenumber"))
      time("orderBy", base.orderBy("l_orderkey", "l_linenumber"))
      time("repartitionByRange(4)+sortWithin",
        base.repartitionByRange(4, col("l_orderkey"), col("l_linenumber"))
          .sortWithinPartitions("l_orderkey", "l_linenumber"))
      // single fused long key (l_linenumber < 8): unique, same total
      // order, radix-prefix covers the WHOLE key — no tie-break
      // comparator calls
      time("coalesce(1)+sortWithin(fusedKey)",
        base.coalesce(1).sortWithinPartitions(
          col("l_orderkey") * lit(8L) + col("l_linenumber")))
      spark.conf.set("spark.sql.sort.enableRadixSort", "false")
      time("coalesce(1)+sortWithin (noRadix)",
        base.coalesce(1).sortWithinPartitions("l_orderkey", "l_linenumber"))
      spark.conf.set("spark.sql.sort.enableRadixSort", "true")
      time("coalesce(8)+sortWithin (noOrder)",
        base.coalesce(8).sortWithinPartitions("l_orderkey", "l_linenumber"))
    }
    spark.stop()
  }
}
