package graft

import graft.functions.Importance

/** DSIR importance weights, checked against an exact Scala replay of the
  * bucket/smoothing/fixed-point pipeline (the driver gate q93 replays it
  * in DuckDB at sf scale).
  */
class ImportanceSpec extends SparkSuite {
  import spark.implicits._

  private val raw = Seq(
    (0L, "aa aa bb"),
    (1L, "bb cc cc"),
    (2L, "aa cc dd")
  ).toDF("doc_id", "text")
  private val target = Seq((10L, "aa aa aa bb")).toDF("doc_id", "text")

  /** Mirror of Dedup.h60 % buckets on the JVM. */
  private def bucket(tok: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % buckets
  }

  private def expected(buckets: Int): Map[Long, (Long, Double)] = {
    val rawToks = Seq(0L -> "aa aa bb", 1L -> "bb cc cc", 2L -> "aa cc dd")
      .flatMap { case (id, t) => t.split(" ").map(id -> bucket(_, buckets)) }
    val tgtToks = "aa aa aa bb".split(" ").map(bucket(_, buckets)).toSeq
    val rCnt = rawToks.groupBy(_._2).view.mapValues(_.size).toMap
    val tCnt = tgtToks.groupBy(identity).view.mapValues(_.size).toMap
    val (rTot, tTot) = (rawToks.size, tgtToks.size)
    def lrf(bk: Long): Long =
      math.round(math.log(
        ((tCnt.getOrElse(bk, 0) + 1.0) * (rTot + buckets)) /
          ((rCnt(bk) + 1.0) * (tTot + buckets))) * 1e6)
    rawToks.groupBy(_._1).map { case (id, ts) =>
      id -> (ts.size.toLong, ts.map(t => lrf(t._2)).sum / 1e6)
    }
  }

  test("counting kernel == explode(split) counts on tokenization edges") {
    import org.apache.spark.sql.functions._
    // nulls DROP, empty text is ONE empty token, doubled spaces yield
    // empty tokens — the explode(split(text, " ")) convention the
    // model build had before the dsir_bucket_counts kernel replaced it
    val edgy = Seq(
      (0L, "aa  bb"), // doubled space -> empty token
      (1L, ""), // one empty token
      (2L, null.asInstanceOf[String]), // dropped
      (3L, " leading and trailing "), // empty tokens both ends
      (4L, "aa aa aa")
    ).toDF("doc_id", "text")
    val buckets = 16
    val viaKernel = edgy.filter(col("text").isNotNull)
      .agg(graft.plans.DsirBucketCounts(col("text"), buckets).as("c"))
      .head.getSeq[Long](0)
    val viaExplode = edgy
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(pmod(conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10)
        .cast("long"), lit(buckets.toLong)).as("bk"))
      .groupBy("bk").count().collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val exploded = (0 until buckets).map(i => viaExplode.getOrElse(i, 0L))
    assert(viaKernel == exploded,
      s"kernel $viaKernel != explode $exploded")
    assert(viaKernel.sum == 12L, // 3 + 1 + 0 + 5 + 3 tokens
      s"token count ${viaKernel.sum}")
  }

  test("weights match the exact fixed-point replay; target-like docs rank higher") {
    val got = Importance.dsirWeights(raw, target, "doc_id", "text", 256)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected(256), s"got $got expected ${expected(256)}")
    // doc 0 (two 'aa', one 'bb') must out-score doc 1 (no target tokens)
    assert(got(0L)._2 > got(1L)._2)
  }

  test("bucket collisions keep the pipeline consistent at tiny bucket counts") {
    val got = Importance.dsirWeights(raw, target, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected(2), s"got $got expected ${expected(2)}")
  }

  test("unbounded bucket counts are rejected (ratio table must stay collectable)") {
    intercept[IllegalArgumentException] {
      Importance.dsirWeights(raw, target, "doc_id", "text", 1 << 20)
    }
  }

  test("scoring is join-free: the model rides the kernel, docs never key-shuffle") {
    val p = Importance.dsirWeights(raw, target, "doc_id", "text", 256)
      .queryExecution.executedPlan
    assert(p.toString.contains("dsir_score"), p.toString)
    assert(!p.toString.contains("Join"), p.toString)
    // the only allowed exchange is Kernels.spread's ROUND-ROBIN
    // compute-spread (split-starved tiny scans; a no-op at corpus
    // scale) — no hash/range repartitioning of documents
    p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach(e => assert(
      e.outputPartitioning.toString.contains("RoundRobinPartitioning"),
      s"docs must not key-shuffle: ${e.outputPartitioning}"))
  }
}
