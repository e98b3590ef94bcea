package graft

import org.apache.spark.sql.functions._

import graft.core.Library
import graft.functions.Bloom

/** Persisted n-gram Bloom filters: packed words vs a driver mirror,
  * merge algebra, the one-sided error guarantee (zero false negatives),
  * an FP rate near the analytic value, and the novelty /
  * decontamination wrappers end to end through Library.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private def h60(s: String): Long =
    java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)

  private def mirrorWords(values: Seq[String], logM: Int, k: Int): Map[Int, Long] = {
    val m = 1L << logM
    values.flatMap(s => (0 until k).map(i => h60(s"$i:$s") % m))
      .groupBy(p => (p >> 6).toInt)
      .view.mapValues(_.map(b => 1L << (b & 63)).reduce(_ | _)).toMap
  }

  test("portable packed words match the driver mirror (incl. bit 63)") {
    // enough values that some position lands on bit 63 of some word —
    // the signed-long wrap corner the oracle packs in HUGEINT
    val vals = (1 to 2000).map(i => s"gram $i")
    val got = Bloom.bloomWords(vals.toDF("v"), col("v"), logM = 12, k = 4,
        portable = true)
      .as[(Int, Long)].collect().toMap
    val mirror = mirrorWords(vals, 12, 4)
    assert(got == mirror)
    assert(mirror.values.exists(_ < 0), "no word used bit 63 — corner untested")
  }

  test("merge == one-shot; idempotent; zero false negatives; FP near analytic") {
    val a = (1 to 1500).map(i => s"ref $i").toDF("v")
    val b = (1000 to 3000).map(i => s"ref $i").toDF("v")
    def words(df: org.apache.spark.sql.DataFrame) =
      Bloom.bloomWords(df, col("v"), 16, 4, portable = true)
    val merged = Bloom.bloomMerge(words(a), words(b))
      .as[(Int, Long)].collect().toMap
    assert(merged == words(a.unionByName(b)).as[(Int, Long)].collect().toMap)
    assert(Bloom.bloomMerge(Bloom.bloomMerge(words(a), words(b)), words(b))
      .as[(Int, Long)].collect().toMap == merged)
    // driver-side membership against the merged words
    def contained(s: String): Boolean = (0 until 4).forall { i =>
      val p = h60(s"$i:$s") % (1L << 16)
      (merged.getOrElse((p >> 6).toInt, 0L) & (1L << (p & 63))) != 0
    }
    assert((1 to 3000).forall(i => contained(s"ref $i")), "false negative")
    // analytic FP at n=3000, m=2^16, k=4: (1-e^(-4*3000/65536))^4 ≈ 0.073%
    val fp = (1 to 20000).count(i => contained(s"novel $i")) / 20000.0
    assert(fp < 0.005, s"fp rate $fp")
  }

  test("closure-kernel probe == join-path probe, doc for doc") {
    val lib = new Library(
      java.nio.file.Files.createTempDirectory("graft-bloomk-").toString, spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val name = s"bf_$portable"
      Bloom.buildNgramBloom(lib, docs.filter($"doc_id" % 3 === 0),
        "doc_id", "text", name, shingleLen = 3, logM = 16, k = 4,
        portable = portable)
      // kernel path (logM 16 <= FastClosureMaxLogM)
      val fast = Bloom.noveltyScore(lib, docs, "doc_id", "text", name)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      // join path, via the internal per-gram probe aggregated the same way
      val slow = Bloom.probeJoin(lib, docs, "doc_id", "text", name)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(!col("__contained"), 1L).otherwise(0L)).as("nov"))
        .collect().map { r =>
          r.getLong(0) -> (r.getLong(1),
            BigDecimal(r.getLong(2).toDouble / r.getLong(1))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toMap
      assert(fast == slow, s"portable=$portable")
      assert(fast.nonEmpty)
    }
  }

  test("noveltyScore + decontaminateByBloom end to end through Library") {
    val lib = new Library(
      java.nio.file.Files.createTempDirectory("graft-bloom-").toString, spark)
    def doc(i: Long, words: Seq[String]) = (i, words.mkString(" "))
    val refWords = (1 to 40).map(i => s"ref$i")
    val ref = Seq(doc(1L, refWords.take(20)), doc(2L, refWords.drop(20)))
      .toDF("doc_id", "text")
    Bloom.buildNgramBloom(lib, ref.filter($"doc_id" === 1), "doc_id", "text",
      "bf", shingleLen = 3, logM = 16, k = 4, portable = true)
    Bloom.mergeIntoNgramBloom(lib, ref.filter($"doc_id" === 2),
      "doc_id", "text", "bf")
    val corpus = Seq(
      doc(10L, refWords.take(20)), // pure ref content → novelty 0
      doc(11L, (1 to 20).map(i => s"new$i")), // fully novel
      doc(12L, refWords.take(10) ++ (1 to 10).map(i => s"new$i")), // mixed
      doc(13L, Seq("too", "short")) // < shingleLen tokens: no evidence
    ).toDF("doc_id", "text")
    val nov = Bloom.noveltyScore(lib, corpus, "doc_id", "text", "bf")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(nov.keySet == Set(10L, 11L, 12L)) // 13 unshingleable → absent
    assert(nov(10L)._2 == 0.0, s"ref doc novelty ${nov(10L)}")
    assert(nov(11L)._2 >= 0.9, s"novel doc novelty ${nov(11L)}")
    assert(nov(12L)._2 > 0.3 && nov(12L)._2 < 0.8, s"mixed ${nov(12L)}")
    val kept = Bloom.decontaminateByBloom(lib, corpus, "doc_id", "text",
        "bf", maxHits = 2L)
      .select("doc_id").as[Long].collect().toSet
    // 10 shares every shingle (dropped); 11 shares ~none (kept);
    // 12 shares 8 > 2 (dropped); 13 carries no evidence (kept)
    assert(kept == Set(11L, 13L), s"kept=$kept")
  }
}
