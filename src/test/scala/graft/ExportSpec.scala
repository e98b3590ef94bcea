package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.Export

/** JSONL shard export (q172): the gate hash-checks the manifest against
  * the DuckDB recomputation on the generator corpus; this spec pins the
  * parts the corpus can't reach — hostile text (embedded newlines,
  * quotes, backslashes, emoji / supplementary-plane codepoints, empty
  * and NULL fields) must round-trip losslessly through the JSON lines,
  * and the routing must match a driver-side recomputation of the same
  * md5-h60 arithmetic (determinism: a re-run routes identically).
  */
class ExportSpec extends SparkSuite {
  import spark.implicits._

  private def h60(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  test("jsonlShards: hostile text round-trips losslessly, routing deterministic") {
    val rows: Seq[(Long, String)] = Seq(
      (0L, "plain text"),
      (1L, "line\nbreak and \"quotes\" and tab\t end"),
      (2L, "emoji 😀 and supplementary 𝐀 chars"),
      (3L, "backslash \\ and snowman ☃"),
      (4L, ""),
      (5L, null))
    val df = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-").toString
    val manifest = Export.jsonlShards(df, "doc_id", "text", dir, shards = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) 0L else r.getLong(3))).toMap

    // driver-side recomputation of the exact manifest from the SOURCE
    val expected = rows.groupBy { case (id, _) => (h60(id.toString) % 3).toInt }
      .map { case (shard, rs) =>
        shard -> (
          rs.size.toLong,
          rs.map(_._1).sum,
          rs.flatMap(r => Option(r._2)).map(t => h60(t) % 1000000007L).sum)
      }
    assert(manifest == expected, s"manifest $manifest != expected $expected")

    // the NULL-text row is counted but contributes no checksum; the
    // re-read texts are bit-identical to the source (JSON escaping of
    // \n, quotes, backslash; UTF-8 including non-BMP survives)
    val back = spark.read.text(dir)
      .select(from_json(col("value"), df.schema).as("j"))
      .select(col("j.doc_id"), col("j.text"))
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet, s"round-trip diverged: $back")

    // determinism: a second export to a fresh dir yields the same manifest
    val dir2 = java.nio.file.Files.createTempDirectory("graft-export2-").toString
    val again = Export.jsonlShards(df, "doc_id", "text", dir2, shards = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) 0L else r.getLong(3))).toMap
    assert(again == manifest)
  }

  test("jsonlShards: string ids get a verifiable h60 checksum id_sum") {
    // a plain sum() over a string id would be silently NULL — the
    // manifest must stay verifiable for non-numeric ids (ADVICE r17):
    // id_sum becomes sum(h60(id) % 1e9+7), the text_sum discipline
    val rows = Seq(("doc-a", "alpha"), ("doc-b", "beta"), ("uuid-7f", "gamma"))
    val df = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-export-sid-").toString
    val manifest = Export.jsonlShards(df, "doc_id", "text", dir, shards = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy { case (id, _) => (h60(id) % 2).toInt }
      .map { case (shard, rs) =>
        shard -> (rs.size.toLong, rs.map(r => h60(r._1) % 1000000007L).sum)
      }
    assert(manifest == expected, s"manifest $manifest != expected $expected")
  }

  test("jsonlShards refuses inputs with reserved 'shard'/'value' columns") {
    // a same-named input column would be silently replaced by the
    // router hash before serialization — corruption the re-read
    // manifest cannot see (it re-parses the same corrupted JSON)
    val withShard = Seq((1L, "t", 9)).toDF("doc_id", "text", "shard")
    intercept[IllegalArgumentException] {
      Export.jsonlShards(withShard, "doc_id", "text", "/tmp/never", 2)
    }
    val withValue = Seq((1L, "t", "x")).toDF("doc_id", "text", "value")
    intercept[IllegalArgumentException] {
      Export.jsonlShards(withValue, "doc_id", "text", "/tmp/never", 2)
    }
  }
}
