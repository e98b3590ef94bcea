package graft

import org.apache.spark.sql.functions._

import graft.functions.Pii

/** PII scrub: detection counts, byte-exact redaction, single-attribution
  * of overlapping categories, and the density filter. The driver gate
  * (q78) replays the same patterns in DuckDB's RE2 — these tests pin the
  * Java-regex side on hand-checkable strings.
  */
class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def scanOne(text: String): (Int, Int, Int, String) = {
    val r = Pii.scan(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"), r.getAs[Int]("n_ips"),
      r.getAs[String]("clean_text"))
  }

  test("emails are detected and redacted, including +tag and subdomain forms") {
    assert(scanOne("reach alice.smith+x@mail.example.org today") ==
      ((1, 0, 0, "reach <EMAIL> today")))
    assert(scanOne("a@b.co and c_d%e@f-g.h.io") == ((2, 0, 0, "<EMAIL> and <EMAIL>")))
  }

  test("dashed phones are detected; bare digit runs are not") {
    assert(scanOne("call 555-867-5309 or 555-000-1111") ==
      ((0, 2, 0, "call <PHONE> or <PHONE>")))
    assert(scanOne("order 5558675309 shipped") == ((0, 0, 0, "order 5558675309 shipped")))
  }

  test("dotted-quad IPs are detected and redacted") {
    assert(scanOne("server at 192.168.0.1 and 10.0.0.7") ==
      ((0, 0, 2, "server at <IP> and <IP>")))
  }

  test("a span is attributed to exactly one category, in email>phone>ip order") {
    // the host half of user@host-with-TLD is consumed by the email match
    // and can never double-count as anything else
    assert(scanOne("mail bob@corp.example.net from 10.0.33.1") ==
      ((1, 0, 1, "mail <EMAIL> from <IP>")))
    // an @ followed by a bare IP is NOT an email (no alpha TLD) — the IP
    // still redacts, the local part stays
    assert(scanOne("user@10.0.33.1 is a host spec") ==
      ((0, 0, 1, "user@<IP> is a host spec")))
  }

  test("clean text passes through untouched") {
    assert(scanOne("no pii in this sentence at all") ==
      ((0, 0, 0, "no pii in this sentence at all")))
  }

  test("dropPiiHeavy filters by total match count across categories") {
    val df = Seq(
      (1L, "a@b.co and 1.2.3.4 and 555-867-5309"), // 3 hits
      (2L, "only a@b.co here"), // 1 hit
      (3L, "nothing")).toDF("doc_id", "text")
    assert(Pii.dropPiiHeavy(df, "text", 2).select("doc_id").as[Long].collect().toSet ==
      Set(2L, 3L))
    assert(Pii.dropPiiHeavy(df, "text", 0).select("doc_id").as[Long].collect().toSet ==
      Set(3L))
  }
}
