package graft

import org.scalatest.funsuite.AnyFunSuite

/** The one JSON escaper feeds Verify's oracle_sql.json, Bench's metric
  * line and TableIO manifests; a malformed escape would make the
  * driver's json.load fail and silently zero a round's correctness.
  * Fuzz it against an independent RFC 8259 string-literal decoder. */
class JsonUtilSpec extends AnyFunSuite {

  /** Minimal RFC 8259 string-literal decoder — the test's independent
    * ear. Rejects raw control chars and unescaped quotes outright. */
  private def decode(js: String): String = {
    require(js.length >= 2 && js.head == '"' && js.last == '"', js)
    val b = js.substring(1, js.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < b.length) {
      b(i) match {
        case '\\' =>
          b(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' =>
              sb += Integer.parseInt(b.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c => sb += c; i += 2
          }
        case c =>
          assert(c >= ' ' && c != '"', s"raw control/quote char ${c.toInt}")
          sb += c
          i += 1
      }
    }
    sb.toString
  }

  test("fuzz round-trip over quote/backslash/control-char strings") {
    val rnd = new scala.util.Random(11)
    val alphabet = "a\"\\\n\r\t xyz:{}[]0"
    for (_ <- 1 to 500) {
      val s = (0 until rnd.nextInt(20))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(decode(graft.core.JsonUtil.str(s)) === s)
    }
  }

  test("every oracle SQL text the driver will json.load round-trips") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(decode(graft.core.JsonUtil.str(k)) === k)
      assert(decode(graft.core.JsonUtil.str(sql)) === sql)
    }
  }
}
