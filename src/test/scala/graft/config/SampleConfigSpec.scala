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
      .filterNot(p => p.getFileName.toString.startsWith("curate") ||
        p.getFileName.toString.startsWith("hybrid-mining"))
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

  test("the hybrid-mining sample's stages all compile (real fixtures " +
      "substituted for the vocab/index placeholders)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the BPE stages load their vocabulary at COMPILE time by design
    // (a tokenizer is fixed for a run), so the anti-rot check needs
    // real fixture paths in place of the sample's /data placeholders
    val tmp = java.nio.file.Files.createTempDirectory("sample-hybrid")
    val vocabPath = s"$tmp/vocab.parquet"
    Seq((1, "a", "b", "ab", 4L))
      .toDF("rank", "left", "right", "merged", "freq")
      .write.parquet(vocabPath)
    val idxDir = s"$tmp/ann"
    graft.ops.IncrementalAnn.create(spark,
      (1 to 8).map(i => (i.toLong, Array(i.toFloat, 1.0f)))
        .toDF("vec_id", "embedding"),
      "embedding", "vec_id", idxDir, nCells = 2)
    val text = read(docs.resolve("hybrid-mining-sample.toml"))
      .replace("/data/vocab/bpe-32k.parquet", vocabPath)
      .replace("/data/index/ann", idxDir)
    val tree = Toml.parseTree(text)
    val stages = Toml.tablesAt(tree, "stages")
    assert(stages.size >= 6, s"expected the full pipeline, got ${stages.size}")
    // one shared slot registry, like CurateMain
    val compiled = graft.ops.Curation.compile(stages, "text", "doc_id", spark)
    assert(compiled.map(_.name) == Seq("quality-filter", "bpe-tokenize",
      "token-budget", "bm25-retrieve", "ann-index-retrieve",
      "hard-negatives"), compiled.map(_.name))
    // the mining tail replaces the corpus flow; the budget is batch-only
    assert(compiled.last.replacesFlow)
    assert(!compiled.exists(s => s.name == "token-budget" && s.streamable))
    // and the sample's retrieval stages really run against the
    // fixtures end-to-end (apply the chain on a tiny corpus)
    val corpus = Seq((1L, "ab ab spark query engine"),
      (2L, "tokenizer vocabulary training text"),
      (3L, "unrelated body of words here")).toDF("doc_id", "text")
    val mined = compiled.foldLeft(corpus)((df, s) => s.apply(df))
    assert(mined.columns.toSeq ==
      Seq("query_id", "doc_id", "sem_rank"))
    mined.collect() // executes: slots resolve, index probes run
  }
}
