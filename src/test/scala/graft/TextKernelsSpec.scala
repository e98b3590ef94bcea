package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Pins the codegen'd text-kernel fingerprints to concrete values so any
  * future refactor that changes them is a loud failure, not a silent
  * migration (nothing else gates rollingHash — no query or oracle uses it).
  */
class TextKernelsSpec extends SparkSuite {
  import spark.implicits._

  test("rollingHash: pinned values (base-31 mod 2^31-1 over normalized text)") {
    val rows = Seq(
      ("Hello, World!", 1835087470L), // normalizes to "hello world"
      ("  abc  ", 96354L), // trim
      ("!!!", 0L), // normalizes to empty → 0
      ("The   quick BROWN fox.", 2100222396L), // lowercase + collapse runs
      ("hello world", 1835087470L)) // already normal — same as punctuated form
    val got = rows.map(_._1).toDF("text")
      .select(Text.rollingHash(col("text")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map(_._2))
  }

  test("rollingHash agrees with a driver-side recomputation on real docs") {
    def driverHash(text: String): Long = {
      val norm = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
      norm.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 2147483647L)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Text.rollingHash(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    docs.foreach { case (id, text) => assert(got(id) == driverHash(text), s"doc $id") }
  }
}
