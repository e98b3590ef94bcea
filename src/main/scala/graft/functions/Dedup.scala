package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as a
  * Spark plan that scales to 100 TB:
  *
  *  - exact: hash-groupBy on a normalized fingerprint — one shuffle on a
  *    16-byte key, no text movement when only ids are needed.
  *  - minhash LSH: shingle → k minhashes → b bands; candidate pairs come
  *    from a self-join on (band, bandHash) so the shuffle key space is tiny
  *    and no O(n²) compare ever happens.
  *  - simhash: 64-bit near-dup signature; hamming-adjacent buckets via
  *    band rotation.
  *  - n-gram Jaccard: exact verification on LSH candidates (or exhaustive
  *    on small slices).
  *
  * All hashing uses xxhash64 (codegen'd Catalyst expression) — stable
  * across Spark versions and cluster nodes.
  */
object Dedup {

  /** Character-level n-gram shingles over normalized text.
    * wordGrams=n gives word n-gram shingles.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(Text.normalizeText(text), " ")
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks),
          concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))),
      s => s.isNotNull)
  }

  /** ---- exact dedup ----
    * Keep the first (min id) row per normalized-content fingerprint.
    * Plan: narrow map (fingerprint) → hash-shuffle on the 128-bit key →
    * partial+final min. Text column itself never shuffles.
    */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(Text.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** ---- MinHash ----
    * k independent minhashes via xxhash64 with k seeds over the shingle
    * set: sig[i] = min over shingles of xxhash64(shingle, seed=i).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingles, s => xxhash64(lit(seed), s)))
    }: _*)

  /** LSH band hashes: split the k-signature into b bands of r=k/b rows;
    * one 64-bit hash per band. Docs sharing ANY band hash are candidates.
    */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*)
    }: _*)

  /** Candidate near-duplicate pairs via MinHash LSH.
    * Output: (id_a, id_b, band) distinct pairs with id_a < id_b.
    * Shuffle is on (band, bandHash) — bounded-size keys; the classic
    * skew risk (a boilerplate shingle shared by millions of docs) is
    * handled by capping bucket size (`maxBucket`).
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      minhashSignature(wordShingles(col(textCol), shingleLen), numHashes).as("sig"))
    val banded = sig
      .select(col("id"), posexplode(lshBandHashes(col("sig"), bands, rows)))
      .toDF("id", "band", "bandhash")
    val bucketed = banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "bandhash")))
      .filter(col("bucket_n") <= maxBucket)
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bandhash") === col("b.bandhash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity between two docs' shingle SETS — used to
    * verify LSH candidates (the standard candidates→verify pipeline).
    */
  def jaccard(aSet: Column, bSet: Column): Column =
    when(size(array_union(aSet, bSet)) === 0, lit(0.0)).otherwise(
      size(array_intersect(aSet, bSet)).cast("double") /
        size(array_union(aSet, bSet)).cast("double"))

  /** Near-dup pairs with exact n-gram Jaccard ≥ threshold, computed by
    * inverted-index self-join (explode shingles → join on shingle →
    * count distinct shared / union) — no O(n²), shuffles on shingle ids.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      threshold: Double): DataFrame = {
    val sets = df.select(
      col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), shingleLen)).as("sh"))
    val sizes = sets.select(col("id"), size(col("sh")).as("sz"))
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    val inter = inv.as("a")
      .join(inv.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("jac",
        round(col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double"), 6))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** ---- SimHash ----
    * 64-bit signature: bit j = sign of Σ over shingles of (bit j of
    * xxhash64(shingle) ? +1 : -1). Near-dups differ in few bits.
    * Pure expression fold — no UDF, no shuffle until the bucket join.
    */
  def simhash(shingles: Column): Column = {
    val hashes = transform(shingles, s => xxhash64(s))
    val counts = (0 until 64).map { j =>
      aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
    }
    counts.zipWithIndex.map { case (c, j) =>
      when(c > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: band the 64 bits into 4×16-bit
    * chunks (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk),
    * join on (chunk index, chunk value), verify with exact hamming.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      simhash(wordShingles(col(textCol), shingleLen)).as("sig"))
    val chunks = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xffffL)): _*)))
      .toDF("id", "sig", "chunk", "chunkval")
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunkval") === col("b.chunkval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
