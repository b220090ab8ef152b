package graft.config

import scala.collection.mutable

/** Minimal TOML parser with real section semantics — enough for the
  * reference's sample configs (`docs/mysql-to-*-sample.toml`):
  *
  *  - `[a.b.c]` defines a nested table at a dotted path;
  *  - `[[a.b.c]]` appends an element to an array-of-tables;
  *  - a dotted path that crosses an array-of-tables descends into
  *    that array's LAST element (so `[transforms.config]` attaches
  *    to the latest `[[transforms]]` entry — the structure the
  *    reference's samples rely on);
  *  - `key = "string" | 123 | 1.5 | true | [list]`, `#` comments.
  *
  * Values surface as immutable `Map[String, Any]` /
  * `Seq[Map[String, Any]]` trees.
  */
object Toml {

  private sealed trait TVal
  private final class TTable extends TVal {
    val entries: mutable.LinkedHashMap[String, TVal] = mutable.LinkedHashMap()
  }
  private final class TArr extends TVal {
    val items: mutable.ArrayBuffer[TTable] = mutable.ArrayBuffer()
  }
  private final case class TPrim(v: Any) extends TVal

  /** Parse into a nested structure; top-level result maps section
    * names to values (`Map[String, Any]`, `Seq[Map[String, Any]]`,
    * or scalars). */
  def parseTree(text: String): Map[String, Any] = {
    val root = new TTable
    var current: TTable = root

    def navigate(segments: Seq[String]): TTable =
      segments.foldLeft(root) { (tab, seg) =>
        tab.entries.get(seg) match {
          case Some(t: TTable) => t
          case Some(a: TArr) => a.items.last
          case Some(_: TPrim) | None =>
            val t = new TTable
            tab.entries.put(seg, t)
            t
        }
      }

    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty)
      .foreach { line =>
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val path = line.substring(2, line.length - 2).trim.split("\\.").toSeq
          val parent = navigate(path.init)
          val arr = parent.entries.get(path.last) match {
            case Some(a: TArr) => a
            case _ =>
              val a = new TArr
              parent.entries.put(path.last, a)
              a
          }
          val t = new TTable
          arr.items += t
          current = t
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val path = line.substring(1, line.length - 1).trim.split("\\.").toSeq
          current = navigate(path)
        } else line.split("=", 2) match {
          case Array(k, v) => current.entries.put(k.trim, TPrim(parseValue(v.trim)))
          case _ =>
        }
      }
    freezeTable(root)
  }

  private def freeze(v: TVal): Any = v match {
    case t: TTable => freezeTable(t)
    case a: TArr => a.items.toSeq.map(freezeTable)
    case TPrim(p) => p
  }

  private def freezeTable(t: TTable): Map[String, Any] =
    t.entries.map { case (k, v) => k -> freeze(v) }.toMap

  /** Path lookup into the frozen tree: tables and array-of-tables. */
  def at(tree: Map[String, Any], path: String): Option[Any] =
    path.split("\\.").foldLeft(Option[Any](tree)) {
      case (Some(m: Map[String @unchecked, Any @unchecked]), seg) => m.get(seg)
      case (Some(s: Seq[Any @unchecked]), seg) =>
        s.lastOption.flatMap {
          case m: Map[String @unchecked, Any @unchecked] => m.get(seg)
          case _ => None
        }
      case _ => None
    }

  def tablesAt(tree: Map[String, Any], path: String): Seq[Map[String, Any]] =
    at(tree, path) match {
      case Some(s: Seq[Any @unchecked]) =>
        s.collect { case m: Map[String @unchecked, Any @unchecked] => m }
      case Some(m: Map[String @unchecked, Any @unchecked]) => Seq(m)
      case _ => Nil
    }

  /** Back-compat shim for the flat layout: top-level sections as
    * arrays of tables. */
  def parse(text: String): Map[String, Seq[Map[String, Any]]] = {
    val tree = parseTree(text)
    tree.collect {
      case (k, s: Seq[Any @unchecked]) =>
        k -> s.collect { case m: Map[String @unchecked, Any @unchecked] => m }
      case (k, m: Map[String @unchecked, Any @unchecked]) => k -> Seq(m)
    }
  }

  private def stripComment(line: String): String = {
    var inStr = false
    val sb = new StringBuilder
    for (c <- line) {
      if (c == '"') inStr = !inStr
      if (c == '#' && !inStr) return sb.toString
      sb += c
    }
    sb.toString
  }

  private[config] def parseValue(v: String): Any = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case s if s.startsWith("[") && s.endsWith("]") =>
      splitList(s.substring(1, s.length - 1)).map(parseValue)
    case "true" => true
    case "false" => false
    case s if s.matches("-?\\d+") => s.toLong
    case s if s.matches("-?\\d+\\.\\d+") => s.toDouble
    case s => s
  }

  private def splitList(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '"' => inStr = !inStr; cur += '"'
      case '[' if !inStr => depth += 1; cur += '['
      case ']' if !inStr => depth -= 1; cur += ']'
      case ',' if !inStr && depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
