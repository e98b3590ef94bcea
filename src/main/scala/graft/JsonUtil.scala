package graft

/** Minimal JSON string escaping shared by Verify (oracle_sql.json dump)
  * and Bench (oracle timing subprocess input) — one definition so a future
  * escaping fix cannot silently miss one of the two writers.
  */
private[graft] object JsonUtil {
  /** Quote + escape: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in builder-authored SQL would otherwise break the
    * driver's json.load and silently zero a round's correctness.
    */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
