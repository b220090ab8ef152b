package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.Toml
import graft.ops.Curation

/** Corpus-curation CLI — the training-data counterpart of the CDC
  * daemon [[Main]]: one TOML config describes input corpus → curation
  * stages → partitioned output, and the run prints a one-line JSON
  * funnel (per-stage survivor counts, measured by `observe()` on the
  * SAME write action — no extra passes).
  *
  * ```
  * spark-submit --class graft.CurateMain graft.jar --config curate.toml
  * ```
  *
  * Config:
  * ```toml
  * [input]
  * path = "/data/documents.parquet"
  * id-column = "doc_id"      # default
  * text-column = "text"      # default
  *
  * [[stages]]
  * type = "quality-filter"   # quality-filter | langid-filter |
  * min-score = 0.5           # length-filter | repetition-filter |
  *                           # dedup-exact | dedup-near | span-scrub |
  *                           # split
  * [output]
  * dir = "/data/curated"
  * partition-by = "split"    # optional
  * ```
  */
object CurateMain {

  /** Assemble + run; returns (output rows, per-stage funnel). Public
    * and driver-free so tests exercise the full config path without
    * a JVM spawn. */
  def run(spark: SparkSession, configText: String): (Long, Seq[(String, Long)]) = {
    val tree = Toml.parseTree(configText)
    def opt(path: String): Option[String] =
      Toml.at(tree, path).map(_.toString)
    val inPath = opt("input.path").getOrElse(sys.error("required: input.path"))
    val idCol = opt("input.id-column").getOrElse("doc_id")
    val textCol = opt("input.text-column").getOrElse("text")
    val outDir = opt("output.dir").getOrElse(sys.error("required: output.dir"))
    val partitionBy = opt("output.partition-by")

    val stages = Toml.tablesAt(tree, "stages")
      .map(Curation.stage(_, textCol, idCol, spark))
    val (curated, observations) =
      Curation.assemble(spark.read.parquet(inPath), stages)

    val writer = curated.write.mode("overwrite")
    partitionBy.fold(writer)(c => writer.partitionBy(c)).parquet(outDir)
    // external side effects (near-dup index append) land ONLY after
    // the output write succeeded — a failed run must not mutate
    // anything a re-run depends on
    stages.foreach(_.postCommit())

    val funnel = observations.map { case (name, ob) =>
      name -> ob.get.apply("n").asInstanceOf[Long]
    }
    (funnel.last._2, funnel)
  }

  def main(args: Array[String]): Unit = {
    val configPath = args.sliding(2).collectFirst {
      case Array("--config", p) => p
    }.getOrElse(sys.error("required: --config <curate.toml>"))
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (n, funnel) = run(spark,
        Files.readString(Paths.get(configPath)))
      val stagesJson = funnel.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      // one parseable line, same contract as Bench's output
      println(s"""{"curated_rows":$n,"funnel":$stagesJson}""")
    } finally spark.stop()
  }
}
