package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Library
import graft.functions.Dedup

/** Persisted MinHash-LSH dedup index (Dedup.buildMinhashIndex and
  * friends): parity with the self-join pipeline, exactness of the
  * verification stage, file pruning on bounded probes, and the over-cap
  * fallback path — the properties q123's oracle replay cannot pin on its
  * own (it runs one parameterization in portable mode only).
  */
class MinhashIndexSpec extends SparkSuite {
  import spark.implicits._

  private def normalize(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = normalize(text).split(" ", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if ((a ++ b).isEmpty) 0.0 else (a & b).size.toDouble / (a ++ b).size

  private lazy val docsDf: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
  private lazy val docs: Map[Long, String] =
    docsDf.as[(Long, String)].collect().toMap

  private def corpus = docsDf.filter(col("doc_id") % 3 =!= 0)
  private def batch = docsDf.filter(col("doc_id") % 3 === 0)

  private def tmpLib(): Library =
    new Library(java.nio.file.Files.createTempDirectory("graft-mhidx-").toString, spark)

  /** Index built in two increments (write + unsorted append), production
    * xxhash64 keys — the shape every test probes.
    */
  private def builtIndex(targetRows: Long = 200L): Library = {
    val lib = tmpLib()
    Dedup.buildMinhashIndex(lib, corpus.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", "mh", targetRows = targetRows)
    Dedup.appendToMinhashIndex(lib, corpus.filter(col("doc_id") % 3 === 2),
      "mh", "doc_id", "text", targetRows = targetRows)
    lib
  }

  test("index probe == cross-side pairs of the self-join pipeline") {
    val lib = builtIndex()
    val got = Dedup.minhashCandidatesAgainstIndex(lib, batch, "mh", "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // Same banding, same combined-population cap: the index path must
    // reproduce exactly the (batch, corpus) cross pairs of the one-shot
    // self-join over the union — the increment split is invisible.
    val union = Dedup.minhashCandidates(docsDf, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val expected = union.collect {
      case (a, b) if a % 3 == 0 && b % 3 != 0 => (a, b)
      case (a, b) if b % 3 == 0 && a % 3 != 0 => (b, a)
    }
    assert(expected.nonEmpty, "no cross-side candidates — test is vacuous")
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("matchesAgainstIndex: exact Jaccard on candidates, threshold applied") {
    val lib = builtIndex()
    lib.write("docs", corpus, Some("doc_id"), targetRows = 200L)
    val got = Dedup.matchesAgainstIndex(lib, batch, "mh", "docs",
      "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val cand = Dedup.minhashCandidatesAgainstIndex(lib, batch, "mh", "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val expected = cand.flatMap { case (n, i) =>
      val j = jaccard(shingleSet(docs(n), 3), shingleSet(docs(i), 3))
      val r = math.rint(j * 1e6) / 1e6
      if (r >= 0.5) Some((n, i, r)) else None
    }
    assert(expected.nonEmpty, "no verified matches — test is vacuous")
    assert(got.toSet == expected,
      s"missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
  }

  test("dedupAgainstIndex drops exactly the matched batch docs") {
    val lib = builtIndex()
    lib.write("docs", corpus, Some("doc_id"), targetRows = 200L)
    val matched = Dedup.matchesAgainstIndex(lib, batch, "mh", "docs",
      "doc_id", "text", threshold = 0.5)
      .select("id_new").as[Long].collect().toSet
    val kept = Dedup.dedupAgainstIndex(lib, batch, "mh", "docs",
      "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val all = batch.select("doc_id").as[Long].collect().toSet
    assert(kept == all -- matched)
    assert(matched.nonEmpty && kept.nonEmpty)
  }

  test("bounded probe prunes index files; over-cap fallback agrees") {
    val lib = builtIndex(targetRows = 60L)
    // A one-doc batch probes bands×1 keys: the manifest key ranges must
    // prune most of the band files (hash keys spread uniformly; each
    // increment is sorted within itself, so ranges overlap ~2× at worst).
    val one = batch.filter(col("doc_id") === batch.select(min("doc_id"))
      .as[Long].head())
    val allFiles = lib.read("mh__bands").inputFiles.length
    val keys = Dedup.bandedRows(one, "doc_id", "text", 3, 12, 4, portable = false)
      .select(col("bandhash")).as[Long].collect().toIndexedSeq
    val pruned = lib.read("mh__bands",
      exprFilter = Some(graft.query.Expr.col("bandkey").isin(keys: _*)))
      .inputFiles.length
    assert(allFiles >= 8, s"expected multi-file index, got $allFiles")
    assert(pruned < allFiles / 2, s"pruned read touched $pruned of $allFiles")
    // maxProbeKeys=0 forces the full-scan fallback; results must agree
    // with the pruned fast path bit-for-bit.
    val fast = Dedup.minhashCandidatesAgainstIndex(lib, batch, "mh",
      "doc_id", "text").as[(Long, Long)].collect().toSet
    val slow = Dedup.minhashCandidatesAgainstIndex(lib, batch, "mh",
      "doc_id", "text", maxProbeKeys = 0).as[(Long, Long)].collect().toSet
    assert(fast == slow)
  }

  test("fragmentation lifecycle: appends overlap ranges, compact restores pruning") {
    // three hash-keyed increments overlap each file's key range almost
    // fully (uniform hashes), so a one-key probe touches ~every file;
    // Library.compact rewrites globally sorted and pruning recovers —
    // the append-then-compact maintenance loop the reference documents
    val lib = tmpLib()
    val thirds = (0 to 2).map(i => docsDf.filter(col("doc_id") % 3 === i))
    Dedup.buildMinhashIndex(lib, thirds(0), "doc_id", "text", "mh",
      targetRows = 40L)
    Dedup.appendToMinhashIndex(lib, thirds(1), "mh", "doc_id", "text",
      targetRows = 40L)
    Dedup.appendToMinhashIndex(lib, thirds(2), "mh", "doc_id", "text",
      targetRows = 40L)
    val one = batch.filter(col("doc_id") === batch.select(min("doc_id"))
      .as[Long].head())
    val keys = Dedup.bandedRows(one, "doc_id", "text", 3, 12, 4, portable = false)
      .select(col("bandhash")).as[Long].collect().toIndexedSeq
    def prunedFiles(): Int = lib.read("mh__bands",
      exprFilter = Some(graft.query.Expr.col("bandkey").isin(keys: _*)))
      .inputFiles.length
    val allBefore = lib.read("mh__bands").inputFiles.length
    val before = prunedFiles()
    // the same candidates must come out before AND after compact
    val candBefore = Dedup.minhashCandidatesAgainstIndex(lib, batch, "mh",
      "doc_id", "text").as[(Long, Long)].collect().toSet
    lib.compact("mh__bands", targetRows = 40L)
    val allAfter = lib.read("mh__bands").inputFiles.length
    val after = prunedFiles()
    assert(allBefore >= 9, s"expected fragmented multi-file index, got $allBefore")
    // pruning DEGRADES under increments (each increment is sorted within
    // itself, so a probe touches ~one file per key per increment — still
    // far from a full scan) and compact strictly restores it
    assert(before < allBefore, s"per-increment ranges must still prune " +
      s"something: $before of $allBefore")
    // at this tiny scale the probe touches ~#keys files either way;
    // compact must never make it worse, and at real fan-in (many more
    // increments than keys) the win is the increments factor
    assert(after <= before, s"compact worsened pruning: $after > $before")
    assert(after < allAfter / 2, s"compact must restore pruning: " +
      s"$after of $allAfter")
    val candAfter = Dedup.minhashCandidatesAgainstIndex(lib, batch, "mh",
      "doc_id", "text").as[(Long, Long)].collect().toSet
    assert(candAfter == candBefore)
  }

  test("combined-population cap kills buckets both sides inflate") {
    // 30 identical corpus docs + 10 identical batch copies of the same
    // text: every band bucket holds 40 members; maxBucket=39 must yield
    // zero candidates (combined count gates), maxBucket=40 all 300 pairs.
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val corp = (0L until 30L).map(i => (i, text)).toDF("doc_id", "text")
    val bat = (100L until 110L).map(i => (i, text)).toDF("doc_id", "text")
    val lib = tmpLib()
    Dedup.buildMinhashIndex(lib, corp, "doc_id", "text", "mh", targetRows = 50L)
    def cands(cap: Int) = Dedup.minhashCandidatesAgainstIndex(
      lib, bat, "mh", "doc_id", "text", maxBucket = cap)
      .as[(Long, Long)].collect().toSet
    assert(cands(39).isEmpty)
    assert(cands(40).size == 300)
  }
}
