package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.core.GraftSession

/** Dev tool (VERDICT r11 #7): scale rehearsal PAST sf1. Runs the
  * heaviest operator gates (the ones whose 100× design claims were
  * previously extrapolated from sf1 + probes) against generator-scaled
  * dirs (scripts/gen_sf1.py with a replica arg: sf5 = 50×, sf10 = 100×
  * of sf0.1) and reports listener-true walls + peak-task metrics. The
  * question each row answers: is wall growth ≤ linear in data volume,
  * and does the PEAK single task stay flat (no hidden serialization
  * point that would strangle a 1000-executor cluster)?
  *
  * Usage: `sbt "runMain graft.ScaleProbe [dir ...]"`
  * (default: /tmp/graft-sf1 /tmp/graft-sf5 /tmp/graft-sf10).
  */
object ScaleProbe {

  private val Queries = Seq(
    "q06_project_arith",
    "q30_ngram_jaccard",
    "q30_jaccard_cap256",
    "q68_decontaminate",
    "q93_dsir_weights",
    "q112_drop_repeated_spans",
    "q110_ann_ivf_persisted",
    // round-13 operators: the rank-engine percentile cut, the Bloom
    // build+probe lifecycle, the ledger fold, and SemDeDup with k
    // scaled to the corpus (the gate's k=8 is oracle-sized; SemDeDup's
    // design point is k ~ n/500 so clusters stay pair-joinable)
    "q124_perplexity_buckets",
    "q128_bloom_novelty",
    "q129_corpus_ledger",
    "q125_semdedup_scaledk",
    // q139-q146 additions: link extraction + integer PageRank (edge
    // emission scales with the corpus, the graph itself is host-sized),
    // the one-pass script census (pure scan-bound kernel), the Zipf
    // regression (vocab-sized rank engine), and the quality-aware
    // dedup keeper (the generator's 10x replicas are exactly the
    // exact-tier mass it must absorb before the jaccard tier)
    "q141_link_pagerank",
    "q143_script_profile",
    "q145_zipf_fit",
    "q146_quality_dedup",
    "q146_quality_cap256",
    "q147_link_hits",
    // round-14 additions: SemDeDup at its production operating point
    // (auto-k + eps 0.9), the LSH-fed keeper's production spelling
    // (xxhash64 minhash), and the PQ / IVF+PQ production searches —
    // the composed-index rows include their one-time builds
    "q125_semdedup_eps09",
    "q151_keeper_prod",
    "q155_pq_prod",
    "q157_ivfpq_prod",
    // round-17: the auto-LSH keeper with a planted >maxBucket
    // mega-cluster — the saturated-bucket star-link path at scale
    "q160_keeper_mega",
    // round-18 freshness rows (VERDICT r17 #7): the trained-langid
    // composite cleanup, the WordPiece train→encode lifecycle (closure
    // kernel — peak task must stay flat like UnigramLm), the persisted
    // hybrid-RRF stack (build both indexes + probe), and the batched
    // tokenizer trainers at a k the sequential loop cannot reach
    "q168_clean_trained_lang",
    "q175_wordpiece_batched_encode",
    "q177_hybrid_prod",
    "q99_bpe_batched512",
    // round-19: the batched hybrid serving path — 1000 queries fused in
    // ONE plan over the persisted stores (VERDICT r18 #3's scale row)
    "q184_hybrid_batch1k")
  // q30_jaccard_t05/t08_prefix stay in Extra for manual runs: on the
  // sf dirs the PrefixMaxAvgDf gate (correctly) delegates them to the
  // incidence path — the dense-vocab generator corpus has no rare
  // shingles. PrefixProbe carries the vocabulary-skewed A/B instead.

  /** Probe-only variants: q30 with the maxDocFreq skew/scale dial set —
    * the production configuration for exact Jaccard on a big corpus
    * (uncapped all-pairs is quadratic in co-occurrence incidences BY
    * DEFINITION; the cap bounds every bucket's pair fan-out).
    */
  private val Extra: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "q30_jaccard_cap256" -> ((s, dir) =>
      graft.functions.Dedup.ngramJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleLen = 3, threshold = 0.2, maxDocFreq = 256)),
    // high-threshold regime through the PUBLIC dispatch: past the dense
    // gate + t >= 0.5 routes to the prefix-filtered path (r12) — the
    // measured answer to the uncapped quadratic at sf10
    "q30_jaccard_t08_prefix" -> ((s, dir) =>
      graft.functions.Dedup.ngramJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleLen = 3, threshold = 0.8)),
    "q30_jaccard_t05_prefix" -> ((s, dir) =>
      graft.functions.Dedup.ngramJaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        shingleLen = 3, threshold = 0.5)),
    // the q146 gate runs the oracle-replayable uncapped jaccard tier;
    // this is the production configuration (maxDocFreq skew cap), the
    // same dial as q30_jaccard_cap256
    "q146_quality_cap256" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("__score",
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")).cast("double"))
      graft.functions.Dedup.dropNearDuplicatesByQuality(
        docs, "doc_id", "text", "__score", shingleLen = 3,
        threshold = 0.2, maxDocFreq = 256)
    }),
    "q125_semdedup_scaledk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      // k = -1: the ENFORCED auto-k envelope (k = ceil(n/512)) — the
      // row this probe prints is the evidence that per-cluster cost
      // stays ~flat as the corpus grows (r13's fixed-k run measured
      // 26× shuffle at 5× corpus; the envelope is the fix). eps = 0.3
      // matches the q125 gate but floods the component stage: within a
      // kmeans cluster most cosines clear 0.3 (that's what a cluster
      // IS), so ~every within-cluster pair ships to the clustering —
      // the eps09 row below is the production-eps companion.
      graft.functions.Vectors.semDedupReport(
        emb, "vec_id", "embedding",
        k = -1, eps = 0.3, iters = 2)
    }),
    "q157_ivfpq_prod" -> ((s, dir) => {
      // the composed stack's probe-side cost at scale: build once per
      // dir (cached via the tmp-root trick is unavailable here, so the
      // row includes the one-time build — the SEARCH share is the
      // pruned-cell read + broadcast table join, q110-shaped)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-ivfpqp-").toString, s)
      graft.functions.Pq.buildIvfPqIndex(lib, emb, "vec_id", "embedding",
        "ix", nlist = 64, m = 8, ksub = 16, iters = 2, targetRows = 100000L)
      graft.functions.Pq.ivfPqSearch(lib, "ix",
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
        "vec_id", "embedding", k = 10, nProbe = 8)
    }),
    "q155_pq_prod" -> ((s, dir) => {
      // production PQ: m codegen'd kmeans passes + broadcast ADC tables;
      // the scale question is whether code assignment stays narrow and
      // the (query, corpus) partial-agg exchange stays bounded
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.functions.Pq.pqTopK(emb, emb.filter(
          org.apache.spark.sql.functions.col("vec_id") < 10),
        "vec_id", "embedding", k = 10, m = 8, ksub = 16, iters = 2)
    }),
    "q160_keeper_mega" -> ((s, dir) => {
      // VERDICT r16 #5: the auto-dispatch keeper at scale WITH a planted
      // >maxBucket mega-cluster — 5000 near-identical variants of one
      // page (pairwise Jaccard ≈ 0.97, every band bucket saturates the
      // 1000 cap). The star-link path must hold the peak task linear in
      // the bucket (|bucket| edges + rescores, never |bucket|²), and the
      // whole group must still collapse to one keeper. At sf5/sf10 the
      // corpus is past the ~64k keeper bar, so this runs the production
      // auto-LSH route end to end.
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val base = (0 until 60).map(w => s"megatok$w").mkString(" ")
      val mega = s.range(5000).select(
        (col("id") + 900000000L).as("doc_id"),
        concat(lit(base + " variant"), col("id").cast("string")).as("text"))
      val all = docs.select(col("doc_id"), col("text")).unionByName(mega)
        .withColumn("__score", length(col("text")).cast("double"))
      graft.functions.Dedup.dropNearDuplicatesByQuality(
        all, "doc_id", "text", "__score", shingleLen = 3, threshold = 0.5)
    }),
    "q151_keeper_prod" -> ((s, dir) => {
      // q151's production spelling: xxhash64 minhash (the gate runs
      // portable=true md5 so DuckDB can replay — an oracle tax, not
      // the deployment path) feeding the pair-injection keeper
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("__score",
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")).cast("double"))
      val pairs = graft.functions.Dedup.minhashCandidates(
        docs, "doc_id", "text", portable = false)
      graft.functions.Dedup.dropNearDuplicatesByQuality(
        docs, pairs, "doc_id", "__score")
    }),
    "q125_cluster_sizes" -> ((s, dir) => {
      // diagnostic: the auto-k cluster SIZE DISTRIBUTION — the envelope
      // bounds the mean; this row shows how far the max strays from it
      // (a 50k-member cluster is 50k² cosines in one join task)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val k = math.max(1L, (n + 511) / 512).toInt
      val sizes = graft.functions.Vectors.kmeansAssign(
          emb, "vec_id", "embedding", k, iters = 2)
        .groupBy("cluster").count()
      val top = sizes.orderBy(org.apache.spark.sql.functions.desc("count"))
        .limit(10).collect().map(_.getLong(1))
      val stats = sizes.agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.avg("count")).head
      println(s"[sizes] $dir n=$n k=$k nonEmpty=${stats.getLong(0)} " +
        f"mean=${stats.getDouble(1)}%.0f top10=${top.mkString(",")}")
      sizes
    }),
    "q175_wordpiece_batched_encode" -> ((s, dir) => {
      // the full trained-tokenizer lifecycle at scale: batched
      // likelihood training (vocab-table passes, corpus-independent
      // iteration cost) + greedy encode of the WHOLE corpus as a pure
      // closure-model map — the scale question is the encode scan
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val merges = graft.functions.WordPiece.trainBatched(
        docs, "text", k = 120, maxBatch = 64)
      val vocab = graft.functions.WordPiece.vocab(docs, "text", merges)
      graft.functions.WordPiece.encode(docs, "doc_id", "text", vocab)
        .agg(sum(col("n_pieces")).as("total_pieces"),
          count(lit(1)).as("n_docs"))
    }),
    "q177_hybrid_prod" -> ((s, dir) => {
      // the persisted hybrid-RRF stack (q177) at scale: one-time BM25 +
      // IVF builds on the dir, then the fused probe — the probe share
      // is two pruned reads + a <=2·legK-row fuse (q157_ivfpq_prod's
      // build-included convention)
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-hybp-").toString, s)
      graft.functions.Retrieval.buildBm25Index(
        lib, docs, "doc_id", "text", "hl", targetRows = 100000L)
      graft.functions.Vectors.buildIvfIndex(lib, emb, "vec_id", "embedding",
        "hv", nlist = 64, iters = 2, targetRows = 100000L)
      graft.functions.Retrieval.hybridTopKIndexed(
        lib, "hl", "hv", Seq("dup", "vector", "merge"),
        emb.filter(col("vec_id") === 3L), "vec_id", "embedding",
        nProbe = 8, k = 15, legK = 50)
    }),
    "q184_hybrid_batch1k" -> ((s, dir) => {
      // VERDICT r18 #3's scale row: 1000 queries through the BATCHED
      // hybrid serving path as ONE plan over the persisted stores —
      // the per-query loop would pay 1000 sequential job waves for the
      // same answer (HybridBatchSpec pins bit-equality). Build cost is
      // included, the q157/q177 convention.
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-hybb-").toString, s)
      graft.functions.Retrieval.buildBm25Index(
        lib, docs, "doc_id", "text", "hl", targetRows = 100000L)
      graft.functions.Vectors.buildIvfIndex(lib, emb, "vec_id", "embedding",
        "hv", nlist = 64, iters = 2, targetRows = 100000L)
      val queries = emb.filter(col("vec_id") < 1000L)
        .withColumn("terms",
          when(col("vec_id") % 3 === 0, array(lit("dup"), lit("merge")))
            .when(col("vec_id") % 3 === 1,
              array(lit("vector"), lit("query"), lit("merge")))
            .otherwise(array(lit("filter"), lit("join"))))
      graft.functions.Retrieval.hybridTopKIndexedBatch(
        lib, "hl", "hv", queries, "vec_id", "terms", "embedding",
        nProbe = 8, k = 15, legK = 50)
    }),
    "q184_hybrid_batch10k" -> ((s, dir) => {
      // VERDICT r19 #7/#2: the 1k row at 10×, inside the hard batch cap
      // (MaxBatchQueries=65536; ~23k (query,term) pairs ≪ MaxBatchTerms)
      // and past VocabIsinMax when padding is added by scale — 10k
      // queries in ONE plan over the persisted stores. vec_id < 2
      // generator strides (replicas 0+1) = exactly 10k query rows at
      // sf50 replica layout.
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val lib = new graft.core.Library(
        java.nio.file.Files.createTempDirectory("graft-hybb10k-").toString, s)
      graft.functions.Retrieval.buildBm25Index(
        lib, docs, "doc_id", "text", "hl", targetRows = 100000L)
      graft.functions.Vectors.buildIvfIndex(lib, emb, "vec_id", "embedding",
        "hv", nlist = 64, iters = 2, targetRows = 100000L)
      val queries = emb.filter(col("vec_id") < 20000L)
        .withColumn("terms",
          when(col("vec_id") % 3 === 0, array(lit("dup"), lit("merge")))
            .when(col("vec_id") % 3 === 1,
              array(lit("vector"), lit("query"), lit("merge")))
            .otherwise(array(lit("filter"), lit("join"))))
      // the "10k queries" claim holds only on the sf50 replica layout
      // (5000-vector base, 10000 stride) — on any other dir the cutoff
      // quietly measures a different batch size, so assert it (ADVICE r20)
      val nQ = queries.count()
      require(nQ == 10000L,
        s"q184_hybrid_batch10k expects exactly 10000 query rows on the " +
          s"sf50 replica layout, got $nQ — wrong data dir for this probe")
      graft.functions.Retrieval.hybridTopKIndexedBatch(
        lib, "hl", "hv", queries, "vec_id", "terms", "embedding",
        nProbe = 8, k = 15, legK = 50)
    }),
    "q99_bpe_batched512" -> ((s, dir) => {
      // merges/minute evidence for the lifted envelope: 512 merges in
      // 256-sized batches — the sequential loop's per-merge wall at
      // this corpus (one pairCounts + one argmax collect per merge)
      // bounds what k=512 would cost there; the printed wall here is
      // the batched cost of the same sequence (BpeBatchedSpec pins the
      // sequences equal)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.functions.Bpe.trainMergesBatched(
        docs, "text", k = 512, maxBatch = 256)
    }),
    "q125_semdedup_eps09" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      // The SemDeDup-paper operating point (eps ≈ 0.9+: drop only
      // near-identical embeddings): pair generation still costs
      // Σ|c|² cosines inside the join, but almost nothing passes the
      // filter, so the components stage sees a trickle — this is the
      // envelope evidence row for the 100 TB posture.
      graft.functions.Vectors.semDedupReport(
        emb, "vec_id", "embedding",
        k = -1, eps = 0.9, iters = 2)
    }))

  private def query(name: String): (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame =
    Extra.getOrElse(name, SparkEntry.queries(name))

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft-sf1", "/tmp/graft-sf5", "/tmp/graft-sf10")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SCALE_SHUFFLE overrides shuffle width for the run — the
    // peak-task-vs-width divisibility check: a stage whose peak task is
    // per-task share (not a single hot key) must halve when width
    // doubles, which is the 1000-executor argument local[32] can't
    // otherwise show (wall stays CPU-bound at 32 cores).
    sys.env.get("SCALE_SHUFFLE").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))

    val shufBytes = new AtomicLong(0)
    val peakRecs = new AtomicLong(0)
    val peakMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakRecs.getAndAccumulate(m.shuffleReadMetrics.recordsRead, Math.max)
          peakMs.getAndAccumulate(m.executorRunTime, Math.max)
        }
      }
    })

    // SCALE_SKIP: comma-separated substrings; a matching query name is
    // skipped (lets the known-quadratic uncapped q30 sf10 cell — ~8 min
    // measured, recorded in SURVEY §15 — be excluded from re-runs).
    // SCALE_ONLY: comma-separated substrings; when set, ONLY matching
    // names run — and the manual-only Extra variants (the prefix-path
    // q30_jaccard_t05/t08 cells) become reachable, which is how the
    // Zipf-vocabulary dirs exercise the prefix dispatch on an sf-dir
    // corpus instead of only the planted PrefixProbe fixture.
    val skip = sys.env.get("SCALE_SKIP").map(_.split(',').toSeq).getOrElse(Nil)
    val only = sys.env.get("SCALE_ONLY").map(_.split(',').toSeq).getOrElse(Nil)
    val names =
      if (only.isEmpty) Queries
      else (Queries ++ Extra.keys.toSeq.sorted ++
          SparkEntry.queries.keys.toSeq.sorted)
        .distinct.filter(n => only.exists(n.contains))
    for (dir <- dirs; name <- names if !skip.exists(name.contains)) {
      val label = s"${dir.split('/').last}/$name"
      try {
        // noop write, NOT count(): count() lets Catalyst eliminate
        // row-preserving joins and prune every column, which turns q06
        // into a footer read and deletes q112's whole dedup subtree —
        // the noop sink materializes every output row like a real job.
        // run 1 warms scans + JIT; run 2 is the measured steady state.
        val walls = (0 until 2).map { i =>
          if (i == 1) { shufBytes.set(0); peakRecs.set(0); peakMs.set(0) }
          val t0 = System.nanoTime()
          query(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val w = (System.nanoTime() - t0) / 1e9
          (w, 0L)
        }
        Thread.sleep(300)
        println(f"[scale] $label%-38s wall=${walls(1)._1}%8.2fs " +
          f"shuffleMB=${shufBytes.get / 1048576.0}%8.1f " +
          f"peakTaskWall=${peakMs.get / 1000.0}%6.2fs " +
          f"peakTaskShufRecs=${peakRecs.get}%d")
      } catch {
        case e: Throwable =>
          println(s"[scale] $label FAILED: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
