package graft.config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.meta.SchemaRegistry
import graft.operators.Transforms
import graft.streaming.Pipeline

/** TOML-shaped pipeline configuration ≙ `config/config.go:10-53` +
  * the sample deployments (`docs/mysql-to-*-sample.toml`): an
  * [input] block, [[routers]] with optional positional
  * columns-mapper, [[transforms]] matched by (schema, table), and an
  * [output] block. [[Toml]] is a dependency-free subset parser
  * (sections, array-of-tables, string/int/bool/list values) — the
  * subset the reference's samples actually use.
  */
final case class TransformSpec(
    kind: String,
    matchDb: String,
    matchTable: String,
    params: Map[String, Any]) {

  private def strList(key: String): Seq[String] =
    params.get(key).map(_.asInstanceOf[Seq[Any]].map(_.toString))
      .getOrElse(Nil)

  /** ≙ transforms/trans_rename_column.go / trans_delete_column.go
    * config→function construction. */
  def toFn: DataFrame => DataFrame = kind match {
    case "rename-column" =>
      Transforms.renameColumn(strList("columns").zip(strList("rename-as")): _*)
    case "delete-column" =>
      Transforms.deleteColumn(strList("columns"): _*)
    case "filter" =>
      Transforms.dropWhere(org.apache.spark.sql.functions.expr(
        params("predicate").toString))
    case other =>
      throw new IllegalArgumentException(s"unknown transform: $other")
  }
}

final case class RouterSpec(
    sourceDb: String,
    sourceTable: String,
    targetDb: String,
    targetTable: String,
    sourceColumns: Seq[String],
    targetColumns: Seq[String])

final case class PipelineConfig(
    input: Map[String, Any],
    output: Map[String, Any],
    routers: Seq[RouterSpec],
    transforms: Seq[TransformSpec]) {

  /** Assemble Pipeline.Routes: per router, the matched transforms in
    * declaration order, then the positional column mapper
    * (≙ core/meta.go:38-104 ordering: transforms rewrite the column
    * list before the mapper zip). Target schemas resolve from the
    * registry (≙ output LoadMeta); when a SOURCE schema is also
    * registered, the envelope projects onto it first so transforms
    * see the source's column names. The mapper preserves the
    * pipeline's op/seq/pos metadata columns. */
  def routes(registry: SchemaRegistry): Seq[Pipeline.Route] =
    routers.map { r =>
      val target = registry.current(r.targetDb, r.targetTable).getOrElse(
        throw new IllegalArgumentException(
          s"no schema registered for ${r.targetDb}.${r.targetTable}"))
      val source = registry.current(r.sourceDb, r.sourceTable)
      val matched = transforms.filter(t =>
        t.matchDb == r.sourceDb && t.matchTable == r.sourceTable)
      val mapper: Seq[DataFrame => DataFrame] =
        if (r.sourceColumns.nonEmpty)
          Seq(Transforms.envelopeColumnMapper(r.sourceColumns, r.targetColumns))
        else Nil
      Pipeline.Route(r.sourceDb, r.sourceTable, target,
        matched.map(_.toFn) ++ mapper, source = source)
    }
}

object PipelineConfig {

  def fromToml(text: String): PipelineConfig = {
    val doc = Toml.parse(text)
    def tables(name: String): Seq[Map[String, Any]] =
      doc.getOrElse(name, Nil).asInstanceOf[Seq[Map[String, Any]]]
    def table(name: String): Map[String, Any] =
      tables(name).headOption.getOrElse(Map.empty)

    val routers = tables("routers").map { m =>
      RouterSpec(
        sourceDb = m.getOrElse("source-schema", "").toString,
        sourceTable = m.getOrElse("source-table", "").toString,
        targetDb = m.getOrElse("target-schema",
          m.getOrElse("source-schema", "")).toString,
        targetTable = m.getOrElse("target-table",
          m.getOrElse("source-table", "")).toString,
        sourceColumns = m.get("source-columns")
          .map(_.asInstanceOf[Seq[Any]].map(_.toString)).getOrElse(Nil),
        targetColumns = m.get("target-columns")
          .map(_.asInstanceOf[Seq[Any]].map(_.toString)).getOrElse(Nil))
    }
    val transforms = tables("transforms").map { m =>
      TransformSpec(
        kind = m.getOrElse("type", "").toString,
        matchDb = m.getOrElse("match-schema", "").toString,
        matchTable = m.getOrElse("match-table", "").toString,
        params = m)
    }
    PipelineConfig(table("input"), table("output"), routers, transforms)
  }
}

/** Minimal TOML subset parser: `[section]`, `[[array-of-tables]]`,
  * `key = "string" | 123 | true | [ list ]`, `#` comments. */
object Toml {

  def parse(text: String): Map[String, Seq[Map[String, Any]]] = {
    val out = collection.mutable.LinkedHashMap
      .empty[String, Vector[Map[String, Any]]]
    var current: Option[String] = None

    def put(k: String, v: Any): Unit = current.foreach { sec =>
      val tabs = out(sec)
      out(sec) = tabs.init :+ (tabs.last + (k -> v))
    }

    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty)
      .foreach { line =>
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val sec = line.substring(2, line.length - 2).trim
          out(sec) = out.getOrElse(sec, Vector.empty) :+ Map.empty[String, Any]
          current = Some(sec)
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val sec = line.substring(1, line.length - 1).trim
          out(sec) = out.getOrElse(sec, Vector.empty) :+ Map.empty[String, Any]
          current = Some(sec)
        } else line.split("=", 2) match {
          case Array(k, v) => put(k.trim, parseValue(v.trim))
          case _ =>
        }
      }
    out.toMap
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
