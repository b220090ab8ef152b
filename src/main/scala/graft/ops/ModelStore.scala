package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted train→save→load→serve lifecycle for the model-based
  * filter stages (`nb-filter`/`lm-filter`/`dsir-filter`) — the
  * [[IncrementalAnn]] marker discipline applied to model tables.
  *
  * Layout at `dir`:
  *  - `tables/<name>/` — the model's count tables as parquet (the
  *    SAME relational frames training produces, so a serve run
  *    compiles bit-identical kernels without the training corpus);
  *  - `_graft_model` — kind + the training parameters that are part
  *    of the model's identity (bucket space, n-gram order, positive
  *    label...), committed LAST.
  *
  * Crash safety: [[save]] deletes the marker FIRST and writes it
  * LAST — a save that dies in between leaves no marker, so [[open]]
  * refuses the torn state loudly ("retrain") instead of serving a
  * half-written model. [[open]] also refuses a kind or parameter
  * mismatch: scoring yesterday's 2-gram model as a 3-gram stage, or
  * a 1024-bucket DSIR model in a 4096-bucket stage, is a silent
  * corruption this check turns into a config error.
  */
object ModelStore {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def markerPath(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p, "_graft_model")

  private def render(kind: String, params: Map[String, String]): String =
    (s"kind=$kind" +: params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }).mkString("\n")

  /** Whether a COMMITTED model exists at `dir` (a torn save shows as
    * absent — by design). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val (hfs, p) = fs(spark, dir)
    hfs.exists(markerPath(p))
  }

  /** Persist model tables: marker deleted first, tables overwritten,
    * marker committed last. This IS the retrain action — on an
    * existing store it supersedes the old model, and readers between
    * the delete and the commit refuse loudly rather than mix
    * generations. ONE writer at a time: retrain is a deliberate
    * operator action (the [[IncrementalAnn.create]] contract) —
    * two concurrent retrains could interleave table overwrites and
    * commit a mixed-generation store. */
  def save(spark: SparkSession, dir: String, kind: String,
      params: Map[String, String],
      tables: Map[String, DataFrame]): Unit = {
    require(tables.nonEmpty, s"model store $dir: no tables to save")
    val (hfs, p) = fs(spark, dir)
    val marker = markerPath(p)
    if (hfs.exists(marker)) hfs.delete(marker, false)
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/tables/$name")
    }
    hfs.mkdirs(p)
    val out = hfs.create(marker, true)
    try out.write(render(kind, params).getBytes("UTF-8"))
    finally out.close()
  }

  /** Open a committed model for serving: refuses a missing/torn
    * store and any kind/parameter mismatch. Returns a loader for the
    * named tables. */
  def open(spark: SparkSession, dir: String, kind: String,
      params: Map[String, String]): String => DataFrame = {
    val (hfs, p) = fs(spark, dir)
    val marker = markerPath(p)
    require(hfs.exists(marker),
      s"no committed $kind model at $dir (missing or torn " +
        "_graft_model) — run the pipeline with --retrain and the " +
        "training corpus configured")
    val in = hfs.open(marker)
    val stored =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val expected = render(kind, params)
    require(stored == expected,
      s"model at $dir does not match this stage's configuration —\n" +
        s"stored:\n$stored\nexpected:\n$expected\n" +
        "retrain (--retrain) or fix the stage options")
    name => spark.read.parquet(s"$dir/tables/$name")
  }
}
