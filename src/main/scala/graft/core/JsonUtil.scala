package graft.core

/** The one JSON string escaper (Verify's oracle dump, Bench's metric
  * line, TableIO's manifests previously carried three hand-rolled
  * near-copies with silently divergent control-char handling). */
object JsonUtil {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
