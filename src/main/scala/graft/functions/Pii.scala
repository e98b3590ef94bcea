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

  /** The email → phone → IP chain as ONE fused kernel call
    * (graft.plans.SeqRedact): struct<n_emails, n_phones, n_ips, clean>.
    * Each pattern runs over the text already redacted by earlier
    * categories — identical java.util.regex semantics to the chained
    * regexp_replace it replaces, but the chain is evaluated once per row
    * in ANY expression context (Spark's filter codegen does no
    * subexpression elimination, so the Column formulation paid ~3× the
    * regex work inside density filters).
    */
  private[graft] def piiKernel(text: Column): Column =
    graft.plans.SeqRedact(text,
      Seq(EmailRe -> EmailTag, PhoneRe -> PhoneTag, Ipv4Re -> IpTag),
      Seq("n_emails", "n_phones", "n_ips"))

  /** Text with all three PII categories replaced by their tags, in the
    * fixed email → phone → IP order (the order counts are attributed in).
    */
  def redact(text: Column): Column = piiKernel(text).getField("clean")

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
    // one kernel call; codegen CSE shares it across the derived columns
    val k = piiKernel(col(textCol))
    in.select(
      col(idCol),
      k.getField("n_emails").as("n_emails"),
      k.getField("n_phones").as("n_phones"),
      k.getField("n_ips").as("n_ips"),
      k.getField("clean").as("clean_text"))
  }

  /** Drop documents whose PII density crosses `maxHits` total matches —
    * the "this is a contact-info dump, don't train on it" filter.
    *
    * The kernel is evaluated in a PROJECT (then the filter reads the
    * tiny summed column and the helper is dropped) because Spark's
    * filter codegen re-evaluates every duplicated subtree — projecting first
    * keeps the regex chain at exactly one evaluation per row.
    */
  def dropPiiHeavy(df: DataFrame, textCol: String, maxHits: Int): DataFrame = {
    val k = piiKernel(col(textCol))
    df.withColumn("__pii_total",
        graft.plans.OptimizerFence(
          k.getField("n_emails") + k.getField("n_phones") + k.getField("n_ips")))
      .filter(col("__pii_total") <= maxHits)
      .drop("__pii_total")
  }
}
