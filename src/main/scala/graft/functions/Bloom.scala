package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Library

/** Persisted Bloom filters over n-gram sets — membership at a scale the
  * broadcast-postings decontamination path can't reach.
  *
  * [[Dedup.decontaminate]] broadcasts the contamination set's postings:
  * right for benchmark-sized eval suites, impossible when the reference
  * set is itself corpus-scale (e.g. "which of today's grams has the
  * 100 TB history seen before"). A Bloom filter compresses ANY reference
  * set to m bits with a known false-positive rate
  * (≈ (1 − e^(−kn/m))^k): the filter lives in the store as ≤ m/64
  * packed-word rows, merges by bitwise OR (associative, idempotent —
  * replay-safe increments, the [[Sketch]] discipline), and membership
  * is a word-keyed join against the packed table. Errors are one-sided:
  * a "contained" answer may be wrong at the FP rate, "novel" never is —
  * so decontamination built on it OVER-drops slightly (the safe
  * direction), and novelty scores are a lower bound.
  *
  * Determinism: bit positions are pure integer functions of the same
  * seeded portable hash as MinHash (`md5("i:" || gram)` 60-bit in
  * portable mode, xxhash64 in production), packing is bit_or over
  * longs — every word replays in any engine, no float anywhere.
  */
object Bloom {

  /** Bit positions of one value under k seeded hashes, m = 2^logM. */
  private def positions(
      value: Column, logM: Int, k: Int, portable: Boolean): Seq[Column] =
    (0 until k).map { i =>
      val h =
        if (portable) Dedup.h60(concat_ws(":", lit(i), value))
        else xxhash64(lit(i), value)
      pmod(h, lit(1L << logM))
    }

  /** The packed word table (word, bits) of a value column — ≤ 2^(logM−6)
    * rows, absent words are implicit zeros. The aggregate is a
    * groupBy–bit_or over word keys: partial aggregation bounds the
    * shuffle at the table size per map task regardless of input size.
    */
  def bloomWords(
      df: DataFrame,
      value: Column,
      logM: Int,
      k: Int,
      portable: Boolean = false): DataFrame = {
    require(logM >= 6 && logM <= 34, s"logM $logM outside [6,34]")
    require(k >= 1 && k <= 16, s"k $k outside [1,16]")
    df.filter(value.isNotNull)
      .select(posexplode(array(positions(value, logM, k, portable): _*)))
      .select(
        shiftright(col("col"), 6).cast("int").as("word"),
        col("col").bitwiseAND(lit(63L)).cast("int").as("__bit"))
      .select(col("word"), expr("shiftleft(CAST(1 AS BIGINT), __bit)").as("__m"))
      .groupBy("word").agg(expr("bit_or(__m)").as("bits"))
  }

  /** Word-wise OR merge — fold an increment in; idempotent. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("word").agg(expr("bit_or(bits)").as("bits"))

  /** Persist an n-gram Bloom filter of a reference corpus:
    * `<name>__meta` pins (log_m, k, shingle_len, portable) — probing
    * under different parameters is silent garbage — and `<name>__words`
    * holds the packed table indexed by word.
    */
  def buildNgramBloom(
      lib: Library,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      name: String,
      shingleLen: Int = 3,
      logM: Int = 20,
      k: Int = 4,
      portable: Boolean = false): Unit = {
    import ref.sparkSession.implicits._
    lib.write(s"${name}__meta",
      Seq((logM, k, shingleLen, portable))
        .toDF("log_m", "k", "shingle_len", "portable"))
    lib.write(s"${name}__words",
      bloomWords(Dedup.shinglePostings(ref, idCol, textCol, shingleLen),
        col("s"), logM, k, portable),
      Some("word"))
  }

  private def bloomMeta(lib: Library, name: String): (Int, Int, Int, Boolean) = {
    val r = lib.read(s"${name}__meta").head()
    (r.getAs[Int]("log_m"), r.getAs[Int]("k"),
      r.getAs[Int]("shingle_len"), r.getAs[Boolean]("portable"))
  }

  /** OR an increment's grams into the stored filter (new version; the
    * increment is never rescanned; the write stays ≤ 2^(logM−6) rows).
    */
  def mergeIntoNgramBloom(
      lib: Library, df: DataFrame, idCol: String, textCol: String,
      name: String): Unit = {
    val (logM, k, sl, portable) = bloomMeta(lib, name)
    val merged = bloomMerge(
      lib.read(s"${name}__words").select("word", "bits"),
      bloomWords(Dedup.shinglePostings(df, idCol, textCol, sl),
        col("s"), logM, k, portable))
    // localCheckpoint before the overwrite: the merged plan READS the
    // symbol version it is about to supersede
    lib.write(s"${name}__words", merged.localCheckpoint(true), Some("word"))
  }

  /** Largest logM whose dense word array ships inside the stage task
    * binary (2^24 bits = 2 MiB of longs): filters at or under it probe
    * through the [[graft.plans.BloomHits]] closure kernel — membership
    * for a whole document in ONE narrow call, ZERO exchanges (measured:
    * the join path shuffled one row per (doc, gram), 639 MB at sf5).
    * Bigger filters fall back to the word-keyed join path below.
    */
  val FastClosureMaxLogM: Int = 24

  /** Per-document (n_shingles, contained) against a persisted filter —
    * the shared probe of [[noveltyScore]] / [[decontaminateByBloom]].
    * Dispatches on filter size: closure kernel (shuffle-free) up to
    * [[FastClosureMaxLogM]], word-keyed join beyond. Docs too short to
    * shingle (or with null text) are ABSENT, both paths.
    */
  private def probeCounts(
      lib: Library, df: DataFrame, idCol: String, textCol: String,
      name: String): DataFrame = {
    val (logM, k, sl, portable) = bloomMeta(lib, name)
    if (logM <= FastClosureMaxLogM) {
      val dense = new Array[Long](1 << (logM - 6))
      lib.read(s"${name}__words").select("word", "bits").collect()
        .foreach(r => dense(r.getInt(0)) = r.getLong(1))
      val model = new graft.plans.BloomBits(dense, logM, k, sl, portable)
      df.select(col(idCol),
          graft.plans.OptimizerFence(
            graft.plans.BloomHits(col(textCol), model)).as("__h"))
        .select(col(idCol), col("__h.n_shingles").as("__n"),
          col("__h.contained").as("__c"))
        .filter(col("__n") > 0)
    } else
      probeJoin(lib, df, idCol, textCol, name)
        .groupBy(idCol)
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__contained"), 1L).otherwise(0L)).as("__c"))
  }

  /** Per-(doc, gram) membership via the word-keyed JOIN — the path for
    * filters too big for a task closure. Output: (idCol, __gh, __sz,
    * __contained). Scale shape: grams explode to k word-keyed probe
    * rows scan-side; the packed table joins word-keyed (broadcast when
    * it fits); the per-gram re-aggregate shuffles the 8-byte gram HASH,
    * never gram text — one exchanged row per (doc, gram).
    */
  private[graft] def probeJoin(
      lib: Library, df: DataFrame, idCol: String, textCol: String,
      name: String): DataFrame = {
    val (logM, k, sl, portable) = bloomMeta(lib, name)
    val words = lib.read(s"${name}__words")
      .select(col("word"), col("bits"))
    // internal __pid name: a caller id column literally named "pos"/
    // "col"/"word" must not collide with posexplode outputs or the join
    // key (the chunkDocuments aliasing lesson)
    val posts = Dedup.shinglePostings(df, idCol, textCol, sl)
      .select(col("id").as("__pid"), col("sz").as("__sz"),
        Dedup.h60(col("s")).as("__gh"),
        posexplode(array(positions(col("s"), logM, k, portable): _*)))
      .select(col("__pid"), col("__sz"), col("__gh"),
        shiftright(col("col"), 6).cast("int").as("word"),
        col("col").bitwiseAND(lit(63L)).cast("int").as("__bit"))
    posts
      .join(words, Seq("word"), "left")
      .select(col("__pid"), col("__sz"), col("__gh"),
        (coalesce(col("bits"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), __bit)")) =!= 0L)
          .as("__set"))
      .groupBy("__pid", "__gh")
      .agg(first(col("__sz")).as("__sz"),
        (sum(when(col("__set"), 1L).otherwise(0L)) === k).as("__contained"))
      .withColumnRenamed("__pid", idCol)
  }

  /** Fraction of each document's distinct shingles the reference filter
    * has NOT seen — the novelty / memorization-risk signal (a lower
    * bound: Bloom false positives can only mark a novel gram as seen).
    * Output: (idCol, n_shingles, novel_frac). Docs too short to shingle
    * are absent, as in every postings-based operator.
    */
  def noveltyScore(
      lib: Library, df: DataFrame, idCol: String, textCol: String,
      name: String): DataFrame =
    probeCounts(lib, df, idCol, textCol, name)
      .select(col(idCol), col("__n").as("n_shingles"),
        round((col("__n") - col("__c")).cast("double") /
          col("__n").cast("double"), 6).as("novel_frac"))

  /** Drop corpus docs sharing more than `maxHits` shingles with the
    * filtered reference set — [[Dedup.decontaminate]]'s shape with the
    * broadcast-postings bound removed (one-sided error ⇒ only
    * OVER-dropping, never leakage). Docs too short to shingle carry no
    * evidence and are KEPT, matching decontaminate.
    */
  def decontaminateByBloom(
      lib: Library, corpus: DataFrame, idCol: String, textCol: String,
      name: String, maxHits: Long = 0L): DataFrame = {
    val bad = probeCounts(lib, corpus, idCol, textCol, name)
      .filter(col("__c") > maxHits)
      .select(idCol)
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
