package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.{Dedup, Vectors}

/** Dev-only: measure whether the approximate operators (minhash/simhash
  * LSH, hyperplane-LSH ANN, IVF ANN) reach recall 1 against their exact
  * counterparts on the driver corpora — the precondition for giving their
  * verified-pairs outputs an exact DuckDB oracle.
  * `sbt "runMain graft.RecallProbe <sfDir>"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // exact n-gram jaccard pairs at several thresholds
    for (t <- Seq(0.2, 0.3, 0.5)) {
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      for ((nh, b) <- Seq((12, 4), (12, 6), (16, 8))) {
        val cand = Dedup.minhashCandidates(docs, "doc_id", "text", 3, nh, b)
          .as[(Long, Long)].collect().toSet
        val miss = exact -- cand
        println(s"[recall] minhash t=$t numHashes=$nh bands=$b: exact=${exact.size} " +
          s"cand=${cand.size} missed=${miss.size} ${miss.take(5)}")
      }
      for ((mh, mb) <- Seq((3, 1000), (8, 1000), (12, 1000))) {
        val cand = Dedup.simhashPairs(docs, "doc_id", "text", 3, mh, mb)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        val miss = exact -- cand
        println(s"[recall] simhash t=$t maxHamming=$mh: exact=${exact.size} " +
          s"cand=${cand.size} missed=${miss.size} ${miss.take(5)}")
      }
    }

    // ANN: lsh/ivf top-k vs brute force (same 5 queries as q31/q32/q52)
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Vectors.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val lsh = Vectors.lshTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    println(s"[recall] lshTopK(default 16/4): match=${lsh == bf} " +
      s"missing=${(bf -- lsh).size} ${(bf -- lsh).take(5)}")
    for ((bits, bands) <- Seq((16, 8), (32, 16))) {
      val l2 = Vectors.lshTopK(emb, queries, "vec_id", "embedding", 5, bits, bands)
        .select("query_id", "corpus_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      println(s"[recall] lshTopK($bits/$bands): match=${l2 == bf} missing=${(bf -- l2).size}")
    }
    for ((nlist, nprobe) <- Seq((16, 8), (16, 12), (8, 8))) {
      val ivf = Vectors.ivfTopK(emb, queries, "vec_id", "embedding", 5, nlist, nprobe)
        .select("query_id", "corpus_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      println(s"[recall] ivfTopK($nlist/$nprobe): match=${ivf == bf} missing=${(bf -- ivf).size}")
    }

    // cosine near-dup pairs vs brute force at 0.45
    val ids = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val bfPairs = ids.as("a").join(ids.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(Vectors.cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .filter(col("sim") >= 0.45)
      .as[(Long, Long, Double)].collect().toSet
    val lshPairs = Vectors.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45, 16, 8)
      .as[(Long, Long, Double)].collect().toSet
    println(s"[recall] cosineNearDup(0.45,16/8): match=${lshPairs == bfPairs} " +
      s"exact=${bfPairs.size} missed=${(bfPairs -- lshPairs).size}")

    spark.stop()
  }
}
