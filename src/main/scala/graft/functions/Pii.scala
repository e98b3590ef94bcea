package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus hygiene.
  *
  * Real pretraining pipelines scrub personally identifiable information
  * before anything else touches the text; the reference engine has no such
  * operator (its domain is market data), so this is part of the
  * LLM-pipeline extension surface, same tier as dedup/decontamination.
  *
  * Design constraints:
  *  - Patterns are deliberately restricted to the regex dialect subset
  *    shared by Java (Spark codegen'd `RegExpReplace`/`RegExpExtractAll`)
  *    and RE2 (DuckDB, Go tooling): character classes and bounded
  *    quantifiers only — no lookarounds, no backreferences. The same
  *    pattern string therefore detects the same spans in any engine,
  *    which is what makes the operator oracle-checkable and its output
  *    replayable across stacks.
  *  - Everything is built-in-function composition (`regexp_replace`,
  *    `regexp_extract_all`), so the whole scan stays inside whole-stage
  *    codegen with zero shuffles: at 100 TB this operator is exactly one
  *    pass over the text bytes, embarrassingly parallel per file split.
  *  - Counts are taken on the PROGRESSIVELY redacted text (emails first,
  *    then phones, then IPs) so a span can only ever be attributed to one
  *    category — e.g. the host part of `user@10.0.33.1` is an email,
  *    not an email AND an IP.
  */
object Pii {

  /** user@host.tld — local part per RFC-ish practice, 2+ alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone: 555-867-5309 (the unambiguous written form;
    * bare 10-digit runs are left alone — too many false positives on ids).
    */
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4. Octet-range validation (≤255) needs alternation
    * that RE2 and Java both support, but real scrub pipelines accept the
    * loose form: over-redaction of `999.1.1.1` is harmless, and the
    * simple class keeps the kernel cheap.
    */
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val IpTag    = "<IP>"

  /** Occurrences of fixed substring `tag` in `text` — a plain substring
    * scan (`split` by an escaped literal), ~10× cheaper than a Java-regex
    * pass over the same bytes.
    */
  private def tagCount(text: Column, tag: String): Column =
    size(split(text, java.util.regex.Pattern.quote(tag))) - 1

  /** Text with all three PII categories replaced by their tags, in the
    * fixed email → phone → IP order (the order counts are attributed in).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit(EmailTag)),
        lit(PhoneRe), lit(PhoneTag)),
      lit(Ipv4Re), lit(IpTag))

  /** Per-document scan report: category counts plus the redacted text.
    * Output: idCol, n_emails, n_phones, n_ips, clean_text.
    *
    * The six regex passes are compute-bound, so a split-starved scan (one
    * zstd row group holding the whole table) first buys parallelism via
    * [[Kernels.spread]] — a no-op whenever the file layout already
    * supplies splits, i.e. always at corpus scale.
    */
  def scan(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scanSelect(Kernels.spread(df, Seq(idCol, textCol)), idCol, textCol)

  /** The [[scan]] expression chain without the batch-only split-starvation
    * probe — shared with the streaming twin
    * (StreamIngest.piiScrubStream), whose parallelism comes from its
    * source and which cannot answer an `.rdd` partition probe.
    */
  private[graft] def scanSelect(
      in: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), lit(EmailRe), lit(EmailTag))
    val afterPhone = regexp_replace(afterEmail, lit(PhoneRe), lit(PhoneTag))
    val afterIp    = regexp_replace(afterPhone, lit(Ipv4Re), lit(IpTag))
    // Counts are derived from tag-count DIFFS over the redaction chain
    // (each match inserts exactly one tag, and subtracting the input's
    // pre-existing literal tags keeps the count exact even on adversarial
    // text) — three regex passes total instead of six; the fixed-string
    // scans are noise next to a regex pass. Codegen CSE shares the three
    // redaction expressions between the counts and clean_text.
    in.select(
      col(idCol),
      (tagCount(afterEmail, EmailTag) - tagCount(col(textCol), EmailTag))
        .as("n_emails"),
      (tagCount(afterPhone, PhoneTag) - tagCount(afterEmail, PhoneTag))
        .as("n_phones"),
      (tagCount(afterIp, IpTag) - tagCount(afterPhone, IpTag)).as("n_ips"),
      afterIp.as("clean_text"))
  }

  /** Drop documents whose PII density crosses `maxHits` total matches —
    * the "this is a contact-info dump, don't train on it" filter. Pure
    * codegen predicate; composes with any upstream clause.
    */
  def dropPiiHeavy(df: DataFrame, textCol: String, maxHits: Int): DataFrame = {
    val t = col(textCol)
    val a1 = regexp_replace(t, lit(EmailRe), lit(EmailTag))
    val a2 = regexp_replace(a1, lit(PhoneRe), lit(PhoneTag))
    val a3 = regexp_replace(a2, lit(Ipv4Re), lit(IpTag))
    val total = (tagCount(a1, EmailTag) - tagCount(t, EmailTag)) +
      (tagCount(a2, PhoneTag) - tagCount(a1, PhoneTag)) +
      (tagCount(a3, IpTag) - tagCount(a2, IpTag))
    df.filter(total <= maxHits)
  }
}
