package graft

import org.apache.spark.sql.functions._

import graft.functions.{Pq, Vectors}

/** Product quantization: code shape, lossless-corpus exactness, and
  * measured ADC recall on the real embedding fixture (the q155 gate
  * hash-pins the portable pipeline; these pin semantics and the
  * fast/production mode).
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  test("pqCodes: m codes per id, every code within [0, ksub)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    for (portable <- Seq(false, true)) {
      val codes = Pq.pqCodes(emb, "vec_id", "embedding",
        m = 4, ksub = 4, iters = 2, portable = portable)
      assert(codes.count() == 500)
      val bad = codes.select(explode(col("codes")).as("c"))
        .filter(col("c") < 0 || col("c") >= 4).count()
      assert(bad == 0, s"portable=$portable codes out of range")
      assert(codes.select(size(col("codes"))).distinct().as[Int].collect()
        .toSeq == Seq(4))
    }
  }

  test("pqTopK is EXACT on a lossless corpus (vectors are centroids)") {
    // every subvector is one of <= ksub distinct patterns AND the seed
    // set (the ksub smallest xxhash64-ranked rows — fast mode) covers
    // every pattern in both subspaces, so Lloyd converges to the exact
    // points and ADC distance == true squared L2 => PQ ranking must
    // equal the exact L2 ranking. Patterns are assigned by hash RANK,
    // not by id, precisely so ranks 0..3 hit all four.
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val pats = Array(
      Array(0f, 0f), Array(10f, 0f), Array(0f, 10f), Array(10f, 10f))
    val ids = (0L until 40L)
    val rank = ids.sortBy(i => (XXH64.hashLong(i, 42L), i))
      .zipWithIndex.toMap
    val rows = ids.map { i =>
      val r = rank(i)
      (i, pats(r % 4) ++ pats((r + 1) % 4))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Pq.pqTopK(df, df.filter(col("vec_id") < 2), "vec_id",
        "embedding", k = 5, m = 2, ksub = 4, iters = 3)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).map { case (q, hits) =>
        q -> hits.sortBy(_._4).map(h => (h._2, h._3)).toSeq
      }
    val exact = rows.filter(_._1 < 2).map { case (qid, qv) =>
      val scored = rows.filter(_._1 != qid).map { case (cid, cv) =>
        val d = qv.zip(cv).map { case (a, b) =>
          (a - b).toDouble * (a - b) }.sum
        (cid, d)
      }.sortBy { case (cid, d) => (d, cid) }.take(5)
      qid -> scored.map { case (cid, d) => (cid, d) }.toSeq
    }.toMap
    got.foreach { case (q, hits) =>
      assert(hits.map(_._1) == exact(q).map(_._1),
        s"query $q: pq ${hits.map(_._1)} vs exact ${exact(q).map(_._1)}")
      // adc equals the true squared distance (floor-µ quantized)
      hits.zip(exact(q)).foreach { case ((_, adc), (_, d)) =>
        assert(math.abs(adc - d) < 1e-5, s"query $q adc=$adc true=$d")
      }
    }
  }

  test("pqTopK fast mode: measured ADC recall vs exact top-k on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Vectors.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Pq.pqTopK(emb, q, "vec_id", "embedding", k = 10,
        m = 16, ksub = 16, iters = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map { k =>
      (pq.getOrElse(k, Set.empty) & exact(k)).size.toDouble / exact(k).size
    }.sum / exact.size
    // deterministic fixture + deterministic algorithm: this is a fixed
    // number; the bound guards regressions without pinning it exactly
    assert(recall >= 0.3, s"ADC recall@10 degraded: $recall")
    info(s"measured ADC recall@10 at m=16/ksub=16: $recall")
  }

  test("persisted PQ index: append encodes against the stored codebook") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    for (portable <- Seq(false, true)) {
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-pqi-").toString, spark)
      graft.functions.Pq.buildPqIndex(lib, emb.filter(col("vec_id") < 300),
        "vec_id", "embedding", "pq", m = 4, ksub = 8, iters = 2,
        portable = portable, targetRows = 100L)
      // append the tail plus an exact duplicate of vector 1 under a new id
      val dup = emb.filter(col("vec_id") === 1)
        .select(lit(100000L).as("vec_id"), col("embedding"))
      graft.functions.Pq.appendToPqIndex(lib,
        emb.filter(col("vec_id") >= 300).select("vec_id", "embedding")
          .unionByName(dup),
        "pq", "vec_id", "embedding", targetRows = 100L)
      val codes = lib.read("pq__codes")
      assert(codes.count() == 501, s"portable=$portable")
      // identical vectors encode to identical codes whichever path
      // (build vs append) produced them...
      val c1 = codes.filter(col("vec_id") === 1)
        .select("codes").as[Seq[Int]].head()
      val cd = codes.filter(col("vec_id") === 100000L)
        .select("codes").as[Seq[Int]].head()
      assert(c1 == cd, s"portable=$portable: dup codes $cd != original $c1")
      // ...so the duplicate ties the minimum ADC for query 1
      val hits = graft.functions.Pq.pqSearchIndexed(lib, "pq",
          emb.filter(col("vec_id") === 1), "vec_id", "embedding", k = 5)
        .as[(Long, Long, Double, Int)].collect()
      val best = hits.map(_._3).min
      val dupHit = hits.find(_._2 == 100000L)
      assert(dupHit.exists(_._3 == best),
        s"portable=$portable: dup $dupHit not at min adc $best")
    }
  }

  test("IVF+PQ: full probe equals plain ADC; partial probe prunes cell files") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lib = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-ivfpq-").toString, spark)
    graft.functions.Pq.buildIvfPqIndex(lib, emb, "vec_id", "embedding",
      "ix", nlist = 8, m = 4, ksub = 8, iters = 2, targetRows = 60L)
    val q = emb.filter(col("vec_id") < 3)
    // nProbe = nlist: routing is a no-op — must equal plain pqTopK
    // (fast mode both; same codebook seeds because training input and
    // parameters are identical)
    val full = graft.functions.Pq.ivfPqSearch(lib, "ix", q, "vec_id",
        "embedding", k = 5, nProbe = 8)
      .orderBy("query_id", "rank").collect().toSeq
    val plain = graft.functions.Pq.pqTopK(emb, q, "vec_id", "embedding",
        k = 5, m = 4, ksub = 8, iters = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(full == plain, s"\nivfpq: $full\nplain: $plain")
    // nProbe = 1 reads fewer cell files than the symbol holds
    val allFiles = lib.read("ix__cellcodes").inputFiles.length
    val hits1 = graft.functions.Pq.ivfPqSearch(lib, "ix", q, "vec_id",
      "embedding", k = 5, nProbe = 1)
    assert(hits1.count() > 0)
    val probed = lib.read("ix__cellcodes",
      exprFilter = Some(graft.query.Expr.col("cell") ===
        graft.query.Expr.lit(0L))).inputFiles.length
    assert(allFiles >= 4 && probed < allFiles, s"pruned $probed of $allFiles")
  }

  test("IVF+PQ append: fold encodes against stored cells AND codebook") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lib = new graft.core.Library(
      java.nio.file.Files.createTempDirectory("graft-ivfpqa-").toString, spark)
    graft.functions.Pq.buildIvfPqIndex(lib, emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", "ix", nlist = 4, m = 4, ksub = 8, iters = 2,
      targetRows = 60L)
    val dup = emb.filter(col("vec_id") === 1)
      .select(lit(100000L).as("vec_id"), col("embedding"))
    graft.functions.Pq.appendToIvfPqIndex(lib,
      emb.filter(col("vec_id") >= 300).select("vec_id", "embedding")
        .unionByName(dup),
      "ix", "vec_id", "embedding", targetRows = 60L)
    assert(lib.read("ix__cellcodes").count() == 501)
    // the duplicate landed in the SAME cell with the SAME codes as the
    // original (immutable routing + immutable codebook)
    val rows = lib.read("ix__cellcodes")
      .filter(col("vec_id") === 1 || col("vec_id") === 100000L)
      .select("cell", "codes").collect()
    assert(rows.length == 2 && rows(0) == rows(1), rows.toSeq)
    // full probe: the duplicate ties the minimum ADC for query 1
    val hits = graft.functions.Pq.ivfPqSearch(lib, "ix",
        emb.filter(col("vec_id") === 1), "vec_id", "embedding", k = 5,
        nProbe = 4)
      .as[(Long, Long, Double, Int)].collect()
    val best = hits.map(_._3).min
    assert(hits.find(_._2 == 100000L).exists(_._3 == best), hits.toSeq)
  }

  test("pq refuses a dim not divisible into m subspaces") {
    val df = Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.pqCodes(df, "vec_id", "embedding", m = 2, ksub = 2)
    }
  }
}
