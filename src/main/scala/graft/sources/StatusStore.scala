package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** S11: the session/status store — the reference persists corpora,
  * entity sets and relations to `ice.yml` between runs
  * (uicomps/Ice.java + IceCLI's YamlEncoder round-trips). This is a
  * minimal hand-rolled YAML subset (nested string maps + string lists;
  * no YAML library ships in this sandbox) with the same atomic-rename
  * commit discipline as [[TableIO]], so a killed run never sees a
  * half-written status file.
  */
final case class IceStatus(
    corpora: Map[String, Map[String, String]] = Map.empty,
    entitySets: Map[String, Seq[String]] = Map.empty,
    relations: Map[String, Seq[String]] = Map.empty)

object StatusStore {

  private def quote(s: String): String =
    if (s.isEmpty || s.exists(c => ":#-\"'".contains(c) || c.isWhitespace))
      // control chars escape to \n/\r/\t — a literal newline inside a
      // quoted scalar would split the line-based parse and silently
      // corrupt the value on reload
      "\"" + s.flatMap {
        case '\\' => "\\\\"
        case '"'  => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c => c.toString
      } + "\""
    else s

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) {
      // escape-aware scan (a pair of replace()s mis-handles `\\"`)
      val body = t.substring(1, t.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        if (body(i) == '\\' && i + 1 < body.length) {
          sb.append(body(i + 1) match {
            case 'n' => '\n'
            case 'r' => '\r'
            case 't' => '\t'
            case c => c
          })
          i += 2
        } else { sb.append(body(i)); i += 1 }
      }
      sb.toString
    } else t
  }

  /** Split a `key: value` property line at the key's TERMINATING colon —
    * a quoted key may itself contain colons (quote() quotes them), so
    * the split point is found by scanning past the closing quote, not
    * by indexOf(':'). */
  private def splitProp(t: String): (String, String) = {
    if (t.startsWith("\"")) {
      var i = 1
      var esc = false
      var end = -1
      while (i < t.length && end < 0) {
        val c = t(i)
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') end = i
        i += 1
      }
      val close = if (end < 0) t.length - 1 else end
      val rest = t.substring(math.min(close + 1, t.length))
      (unquote(t.substring(0, close + 1)),
        unquote(rest.dropWhile(_ != ':').drop(1)))
    } else {
      val i = t.indexOf(':')
      (unquote(t.substring(0, i)), unquote(t.substring(i + 1)))
    }
  }

  def render(st: IceStatus): String = {
    val sb = new StringBuilder
    sb.append("corpora:\n")
    st.corpora.toSeq.sortBy(_._1).foreach { case (name, props) =>
      sb.append(s"  ${quote(name)}:\n")
      props.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb.append(s"    ${quote(k)}: ${quote(v)}\n")
      }
    }
    sb.append("entitySets:\n")
    st.entitySets.toSeq.sortBy(_._1).foreach { case (name, members) =>
      sb.append(s"  ${quote(name)}:\n")
      members.foreach(m => sb.append(s"    - ${quote(m)}\n"))
    }
    sb.append("relations:\n")
    st.relations.toSeq.sortBy(_._1).foreach { case (name, paths) =>
      sb.append(s"  ${quote(name)}:\n")
      paths.foreach(p => sb.append(s"    - ${quote(p)}\n"))
    }
    sb.toString
  }

  def parse(text: String): IceStatus = {
    var corpora = Map.empty[String, Map[String, String]]
    var entitySets = Map.empty[String, Seq[String]]
    var relations = Map.empty[String, Seq[String]]
    var section = ""
    var current = ""
    text.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
      val indent = line.takeWhile(_ == ' ').length
      val t = line.trim
      if (indent == 0 && t.endsWith(":")) {
        section = t.dropRight(1)
        // a new section invalidates the name header: a hand-edited
        // list item before any name in THIS section must not attach to
        // the previous section's name
        current = ""
      }
      else if (indent == 2 && t.endsWith(":")) {
        current = unquote(t.dropRight(1))
        section match {
          case "corpora" => corpora += current -> Map.empty
          case "entitySets" => entitySets += current -> Vector.empty
          case "relations" => relations += current -> Vector.empty
          case _ =>
        }
      } else if (indent == 4 && t.startsWith("- ")) {
        val v = unquote(t.drop(2))
        // contains-guarded like the corpora branch: a hand-edited list
        // item with a missing/stale name header must not crash load()
        // with a NoSuchElementException
        section match {
          case "entitySets" if entitySets.contains(current) =>
            entitySets += current -> (entitySets(current) :+ v)
          case "relations" if relations.contains(current) =>
            relations += current -> (relations(current) :+ v)
          case _ =>
        }
      } else if (indent == 4 && t.contains(':') &&
                 section == "corpora" && corpora.contains(current)) {
        // section-guarded: a colon-bearing line in a hand-edited file's
        // other sections must not crash load() on corpora(current)
        val (k, v) = splitProp(t)
        corpora += current -> (corpora(current) + (k -> v))
      }
    }
    IceStatus(corpora, entitySets, relations)
  }

  /** Atomic save: write-to-temp + rename, like TableIO manifests. */
  def save(path: String, st: IceStatus): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp: Path = Paths.get(path + ".tmp")
    Files.writeString(tmp, render(st))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def load(path: String): IceStatus = {
    val p = Paths.get(path)
    if (Files.exists(p)) parse(Files.readString(p)) else IceStatus()
  }
}
