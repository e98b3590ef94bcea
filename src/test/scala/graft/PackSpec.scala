package graft

import org.apache.spark.sql.functions._

import graft.functions.Pack

class PackSpec extends SparkSuite {
  import spark.implicits._

  private def mkDocs(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // 1..40 tokens; ids shuffled over a sparse range so chunking by id
      // range sees uneven populations
      (i.toLong * 7 + (i % 3), Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))
    }
  }

  test("packOffsets: exact driver replay, partition-stable, chunk-count-independent") {
    val docs = mkDocs(3000, 7)
    val df = docs.toDF("doc_id", "text").repartition(13)
    def run(chunks: Int) = Pack.packOffsets(df, "doc_id", "text", 128L, chunks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // driver-side replay of the definition
    var cum = 0L
    val expected = docs.sortBy(_._1).map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val start = cum
      cum += n
      (id, n, start, start / 128L, (start + n - 1) / 128L)
    }
    val got = run(256)
    assert(got == expected)
    assert(run(1) == expected)    // degenerate single chunk
    assert(run(17) == expected)   // odd chunking
    val repart = Pack.packOffsets(df.repartition(3), "doc_id", "text", 128L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(repart == expected.map(e => (e._1, e._3)))
  }

  test("packOffsets: only the chunk summary sees an unpartitioned window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try testUnpartitionedWindowPin()
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def testUnpartitionedWindowPin(): Unit = {
    val df = mkDocs(500, 3).toDF("doc_id", "text")
    val p = Pack.packOffsets(df, "doc_id", "text", 512L)
      .queryExecution.executedPlan
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, p.toString.take(1500))
    // the corpus prefix-sum window is partitioned by __c; any
    // unpartitioned window may only see the <=chunks-row chunk summary
    // (identified by its output columns — the PlanSpec q104 pin style)
    assert(windows.exists(_.partitionSpec.nonEmpty), p.toString.take(1500))
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val childCols = w.child.output.map(_.name).toSet
      assert(!childCols.contains("__id") && !childCols.contains("doc_id"),
        s"unpartitioned window must only see the chunk summary, saw $childCols")
    }
  }

  test("packExamples: spans tile each window exactly, docs reassemble") {
    val df = mkDocs(400, 11).toDF("doc_id", "text")
    val ex = Pack.packExamples(df, "doc_id", "text", 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val offs = Pack.packOffsets(df, "doc_id", "text", 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val totalTokens = offs.values.sum
    // per-document: spans cover [0, n) contiguously
    ex.groupBy(_._2).foreach { case (id, spans) =>
      val ordered = spans.sortBy(_._3)
      assert(ordered.head._3 == 0L, s"doc $id starts at 0")
      assert(ordered.map(_._5).sum == offs(id), s"doc $id total length")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3, s"doc $id contiguous")
        case _ =>
      }
    }
    // per-window: spans tile [0, 64) with no overlap (last window ragged)
    val lastWin = totalTokens / 64L
    ex.groupBy(_._1).foreach { case (win, spans) =>
      val ordered = spans.sortBy(_._4)
      assert(ordered.head._4 == 0L, s"window $win starts at 0")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4, s"window $win contiguous")
        case _ =>
      }
      val width = ordered.map(_._5).sum
      if (win < lastWin) assert(width == 64L, s"window $win full")
      else assert(width == totalTokens % 64L, s"window $win ragged tail")
    }
  }

  test("packOffsets: null id is a loud error; non-integral id rejected") {
    val withNull = Seq((Some(1L), "a b"), (None, "c")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Pack.packOffsets(withNull, "doc_id", "text", 16L).collect()
    }
    assert(e.getMessage.contains("null id"), e.getMessage)
    val strId = Seq(("a", "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Pack.packOffsets(strId, "doc_id", "text", 16L)
    }
  }

  test("chunkDocuments: driver replay — full coverage, ragged tails, empty doc") {
    val docs = mkDocs(500, 11)
    val df = docs.toDF("doc_id", "text").repartition(7)
    val (w, stride) = (8, 5)
    val got = Pack.chunkDocuments(df, "doc_id", "text", w, stride)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(c => (c._1, c._2)).toSeq
    val expected = docs.sortBy(_._1).flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val c = 1 + math.ceil(math.max(toks.length - w, 0) / stride.toDouble).toInt
      (0 until c).map { i =>
        val start = i * stride
        (id, i, start + 1L, math.min(w, toks.length - start).toLong,
          toks.slice(start, start + w).mkString(" "))
      }
    }
    assert(got == expected)
    // every token position of every doc is covered by >= 1 chunk
    got.groupBy(_._1).foreach { case (id, chunks) =>
      val p = docs.toMap.apply(id).split(" ", -1).length
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (1L to p).toSet, s"doc $id coverage")
    }
    // empty text -> exactly one empty chunk
    val empty = Pack.chunkDocuments(Seq((1L, "")).toDF("doc_id", "text"), "doc_id",
      "text", w, stride).collect()
    assert(empty.length == 1 && empty(0).getString(4) == "" &&
      empty(0).getLong(3) == 1L) // "" splits to one empty token
    intercept[IllegalArgumentException] {
      Pack.chunkDocuments(df, "doc_id", "text", 8, 9) // stride > window
    }
  }
}
