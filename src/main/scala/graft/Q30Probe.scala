package graft

import org.apache.spark.sql.functions._

/** Dev-only q30 stage dissection (runMain graft.Q30Probe [sfDir]). */
object Q30Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val defaultReps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String, reps: Int = defaultReps)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q30] $label: ${ts.min}%.2f s (min of $reps)")
    }

    val posts = graft.functions.Dedup.shinglePostings(docs, "doc_id", "text", 3)
      .select(xxhash64(col("s")).as("s"), col("id").cast("long").as("id"), col("sz"))
    def buckets = posts.groupBy("s")
      .agg(collect_list(struct(col("id"), col("sz"))).as("docs"))
      .filter(size(col("docs")) > 1)
    time("buckets")(buckets)
    def pairsOnly = buckets.select(graft.plans.BucketPairs(col("docs"), 0.2))
    time("buckets+generate")(pairsOnly)
    def agged = pairsOnly
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"), first(col("szsum")).as("szsum"))
      .withColumn("jac", round(col("inter").cast("double") /
        (col("szsum") - col("inter")).cast("double"), 6))
      .filter(col("jac") >= 0.2)
      .select(col("id_a"), col("id_b"), col("jac"))
    time("full (no order)")(agged)
    time("full + orderBy")(agged.orderBy("id_a", "id_b"))
    time("full + repartition(1) sort")(
      agged.repartition(1).sortWithinPartitions("id_a", "id_b"))

    // Blocked dense-tile path (the dispatcher picks it at these scales):
    def blocked = graft.functions.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.2)
    time("blocked (public api)")(blocked)
    time("blocked + repartition(1) sort")(
      blocked.repartition(1).sortWithinPartitions("id_a", "id_b"))
    // equivalence vs the aggregate formulation above
    val old = agged.withColumnRenamed("jac", "jac_old")
    val neu = blocked.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"), col("jac"))
    val mism = neu.join(old, Seq("id_a", "id_b"), "full_outer")
      .filter(col("jac").isNull || col("jac_old").isNull ||
        col("jac") =!= col("jac_old")).count()
    println(s"[q30] blocked rows=${neu.count()} old rows=${old.count()} mismatches=$mism")

    // Experiment: fuse pair generation + per-partition aggregation into one
    // mapPartitions (bypasses Generate + codegen partial agg; pays encoder
    // deserialization of the docs arrays instead).
    import spark.implicits._
    def fused = {
      val t = 0.2
      buckets.as[(Long, Seq[(Long, Long)])].mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[(Long, Long), Array[Long]]
        while (it.hasNext) {
          val docs = it.next()._2.toArray
          var i = 0
          while (i < docs.length) {
            var j = i + 1
            while (j < docs.length) {
              val (ia, sza) = docs(i)
              val (ib, szb) = docs(j)
              val mn = math.min(sza, szb)
              val mx = math.max(sza, szb)
              if (mn >= t * mx && ia != ib) {
                val key = if (ia < ib) (ia, ib) else (ib, ia)
                m.getOrElseUpdate(key, Array(0L, sza + szb))(0) += 1
              }
              j += 1
            }
            i += 1
          }
        }
        m.iterator.map { case ((a, b), v) => (a, b, v(0), v(1)) }
      }.toDF("id_a", "id_b", "pinter", "szsum")
        .groupBy("id_a", "id_b")
        .agg(sum("pinter").as("inter"), first("szsum").as("szsum"))
        .withColumn("jac", round(col("inter").cast("double") /
          (col("szsum") - col("inter")).cast("double"), 6))
        .filter(col("jac") >= t)
        .select(col("id_a"), col("id_b"), col("jac"))
    }
    time("fused mapPartitions variant")(fused)
    spark.stop()
  }
}
