package graft

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Dev-only stage profiler for the q30 pipeline (not part of the driver
  * contract; run manually: runMain graft.DevProbe <sfDir>).
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val posts = graft.functions.Dedup.shinglePostings(docs, "doc_id", "text", 3)
    // warm
    posts.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      time(s"postings scan+generate (narrow) #$i") {
        posts.write.format("noop").mode("overwrite").save()
      }
    }
    val hashed = posts.select(xxhash64(col("s")).as("s"), col("id"), col("sz"))
    val buckets = hashed.groupBy("s")
      .agg(collect_list(struct(col("id"), col("sz"))).as("docs"))
      .filter(size(col("docs")) > 1)
    buckets.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      time(s"+ bucket groupBy(collect_list) #$i") {
        buckets.write.format("noop").mode("overwrite").save()
      }
    }
    val full = graft.functions.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
    full.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      time(s"full q30 #$i") { full.write.format("noop").mode("overwrite").save() }
    }
    println("[dev] postings rows: " + posts.count())
    println("[dev] bucket rows(>1): " + buckets.count())
    spark.stop()
  }
}
