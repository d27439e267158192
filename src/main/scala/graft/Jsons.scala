package graft

/** Minimal JSON string escaping shared by the two harness mains (Verify's
  * oracle dump, Bench's artifact lines). Hand-built JSON is deliberate —
  * no JSON library is on the dependency list — so every interpolated
  * string MUST pass through here: a quote/backslash/control char in
  * builder-authored SQL or an env-provided path would otherwise make the
  * driver's json.load fail and silently zero the round's artifact. */
object Jsons {
  /** `s` as a double-quoted JSON string literal: escapes backslash, quote,
    * and ALL control chars (<0x20). */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
