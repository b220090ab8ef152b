package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** The shipped sample configs (docs/…-sample.toml ≙ the reference's
  * docs/mysql-to-…-sample.toml set) must stay RUNNABLE shapes, not
  * prose: every CDC sample parses into a PipelineConfig whose
  * input/output types are registered plugins and whose routes
  * assemble; every curation sample stage compiles through
  * Curation.stage. A sample that rots is worse than none.
  */
class SampleConfigSpec extends SparkSpec {

  private val docs = Paths.get("docs")

  private def read(p: Path): String = Files.readString(p)

  private def samples(suffix: String): Seq[Path] = {
    val all = Files.list(docs).iterator().asScala
      .filter(_.toString.endsWith(suffix)).toSeq.sortBy(_.toString)
    assert(all.nonEmpty, s"no $suffix samples found under docs/")
    all
  }

  test("every CDC sample parses, names registered plugins, and assembles routes") {
    val cdcSamples = samples("-sample.toml")
      .filterNot(_.getFileName.toString.startsWith("curate"))
    assert(cdcSamples.size >= 4)
    cdcSamples.foreach { p =>
      val cfg = PipelineConfig.fromToml(read(p))
      val inType = cfg.input("type").toString
      val outType = cfg.output("type").toString
      assert(graft.streaming.Registry.sourceNames.contains(inType),
        s"$p: unknown input type $inType")
      assert(graft.streaming.Registry.sinkNames.contains(outType),
        s"$p: unknown output type $outType")
      assert(cfg.routers.nonEmpty, s"$p: no routers")
      // routes assemble against a minimal registry of the named tables
      val reg = new graft.meta.SchemaRegistry
      cfg.routers.foreach { r =>
        val cols = Seq(
          graft.meta.ColumnDef("id", "bigint", isPrimaryKey = true))
        reg.register(graft.meta.TableDef(r.sourceDb, r.sourceTable, cols))
        reg.register(graft.meta.TableDef(r.targetDb, r.targetTable, cols))
      }
      val routes = cfg.routes(reg)
      assert(routes.size == cfg.routers.size, s"$p: route assembly dropped rows")
      // every transform constructs (unknown kinds / arity throw here)
      cfg.transforms.foreach(_.toFn)
    }
  }

  test("the curation sample's stages all compile") {
    val tree = Toml.parseTree(read(docs.resolve("curate-sample.toml")))
    val stages = Toml.tablesAt(tree, "stages")
    assert(stages.size >= 10, s"expected a full pipeline, got ${stages.size}")
    val compiled = stages.map(graft.ops.Curation.stage(_, "text", "doc_id", spark))
    assert(compiled.map(_.name).distinct.size >= 10)
    assert(Toml.at(tree, "input.path").isDefined)
    assert(Toml.at(tree, "output.dir").isDefined)
  }
}
