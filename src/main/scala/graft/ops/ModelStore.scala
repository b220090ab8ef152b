package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted train→save→load→serve lifecycle for the model-based
  * filter stages (`nb-filter`/`lm-filter`/`dsir-filter`) — the
  * [[IncrementalAnn]] marker discipline applied to model tables.
  *
  * Layout at `dir`:
  *  - `tables-g<N>/<name>/` — generation N's count tables as parquet
  *    (the SAME relational frames training produces, so a serve run
  *    compiles bit-identical kernels without the training corpus);
  *  - `_graft_model` — `gen=<N>` + kind + the training parameters
  *    that are part of the model's identity (bucket space, n-gram
  *    order, positive label...), committed LAST.
  *
  * Crash safety — generation staging: [[save]] writes the NEW
  * generation's tables to a fresh `tables-g<N>/` directory and only
  * then swaps the marker, so a retrain that dies mid-training (bad
  * ref-path, OOM, job kill) leaves the PREVIOUS committed model
  * fully servable — the failure mode is "yesterday's model keeps
  * serving", never "no model until a retrain that may no longer be
  * possible". A store with no marker at all (never-committed, or the
  * sub-millisecond marker-swap window) refuses loudly ("retrain")
  * instead of serving a half-written model. [[open]] also refuses a
  * kind or parameter mismatch: scoring yesterday's 2-gram model as a
  * 3-gram stage, or a 1024-bucket DSIR model in a 4096-bucket stage,
  * is a silent corruption this check turns into a config error.
  * GC keeps the superseded generation for ONE more save (a serving
  * job that opened the previous commit reads its parquet lazily at
  * action time — deleting at the commit instant would pull files out
  * from under any in-flight job) and deletes failed-save orphans and
  * anything older, so steady-state disk is two generations.
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

  /** Generation N's table root; N = 0 is the pre-generation layout
    * (`tables/`) so stores committed before staging landed keep
    * opening. */
  private def genRoot(gen: Long): String =
    if (gen == 0L) "tables" else s"tables-g$gen"

  private val GenDirRe = "tables-g([0-9]+)".r

  /** Split a stored marker into its generation line (absent on
    * pre-generation markers → gen 0) and the identity body. */
  private def parseMarker(stored: String): (Long, String) =
    stored.linesIterator.toList match {
      case head :: rest if head.startsWith("gen=") =>
        (head.stripPrefix("gen=").toLong, rest.mkString("\n"))
      case _ => (0L, stored)
    }

  private def readMarker(hfs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path): String = {
    val in = hfs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Whether a COMMITTED model exists at `dir` (a torn or in-flight
    * save shows as the PREVIOUS commit — by design). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val (hfs, p) = fs(spark, dir)
    hfs.exists(markerPath(p))
  }

  /** Persist model tables as a NEW generation: tables first (into a
    * directory no reader looks at), marker swap last, superseded
    * generations deleted after the swap. This IS the retrain action
    * — on an existing store it supersedes the old model the instant
    * the marker lands, and a save that dies anywhere before that
    * leaves the old model committed and servable. ONE writer at a
    * time: retrain is a deliberate operator action (the
    * [[IncrementalAnn.create]] contract) — two concurrent retrains
    * could interleave generation numbering and commit a
    * mixed-generation store. */
  def save(spark: SparkSession, dir: String, kind: String,
      params: Map[String, String],
      tables: Map[String, DataFrame]): Unit = {
    require(tables.nonEmpty, s"model store $dir: no tables to save")
    val (hfs, p) = fs(spark, dir)
    val marker = markerPath(p)
    // next generation: above both the committed one and any orphan
    // directory a previously failed save left behind
    val committed =
      if (hfs.exists(marker)) parseMarker(readMarker(hfs, marker))._1
      else -1L
    val onDisk =
      if (hfs.exists(p))
        hfs.listStatus(p).map(_.getPath.getName).collect {
          case GenDirRe(n) => n.toLong
          case "tables" => 0L
        }.foldLeft(-1L)(math.max)
      else -1L
    val gen = math.max(committed, onDisk) + 1
    // train + write into the staged generation — the crash window
    // with NO committed marker is gone; a failure here leaves the
    // previous generation serving
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/${genRoot(gen)}/$name")
    }
    hfs.mkdirs(p)
    // commit: write the new marker beside the old one, then swap.
    // rename-over-delete keeps the no-marker window to the two
    // metadata ops, and its failure mode is a LOUD open() refusal,
    // not a silently mixed store
    val tmp = new org.apache.hadoop.fs.Path(p, "_graft_model.tmp")
    val out = hfs.create(tmp, true)
    try out.write((s"gen=$gen\n" + render(kind, params)).getBytes("UTF-8"))
    finally out.close()
    if (hfs.exists(marker)) hfs.delete(marker, false)
    require(hfs.rename(tmp, marker),
      s"model store $dir: marker swap failed (rename $tmp -> $marker)")
    // GC: keep the NEW generation and the one it superseded (a
    // serving job that opened the previous commit reads its parquet
    // lazily at action time — deleting it at the commit instant
    // would pull files out from under any in-flight job); delete
    // orphans from failed saves and anything older. Steady-state
    // disk is two generations.
    hfs.listStatus(p).map(_.getPath).foreach { child =>
      val keep: Long => Boolean = n => n == gen || n == committed
      child.getName match {
        case GenDirRe(n) if !keep(n.toLong) => hfs.delete(child, true)
        case "tables" if !keep(0L) => hfs.delete(child, true)
        case _ => ()
      }
    }
  }

  /** Open a committed model for serving: refuses a missing/torn
    * store and any kind/parameter mismatch. Returns a loader for the
    * named tables, pinned to the committed generation. */
  def open(spark: SparkSession, dir: String, kind: String,
      params: Map[String, String]): String => DataFrame = {
    val (hfs, p) = fs(spark, dir)
    val marker = markerPath(p)
    require(hfs.exists(marker),
      s"no committed $kind model at $dir (missing or torn " +
        "_graft_model) — run the pipeline with --retrain and the " +
        "training corpus configured")
    val (gen, body) = parseMarker(readMarker(hfs, marker))
    val expected = render(kind, params)
    require(body == expected,
      s"model at $dir does not match this stage's configuration —\n" +
        s"stored:\n$body\nexpected:\n$expected\n" +
        "retrain (--retrain) or fix the stage options")
    name => spark.read.parquet(s"$dir/${genRoot(gen)}/$name")
  }
}
