package graft

/** Proof of the Tables.load "one-line swap" claim: the same queries
  * produce identical rows whether tables resolve from parquet paths
  * or through the session catalog (`spark.table`) — the 100 TB
  * deployment shape. The FULL gate + bench are additionally run in
  * catalog mode out-of-band (COVERAGE.md records the runs); this
  * spec pins the equivalence in-suite on representative queries
  * from every family so a path-dependence regression fails fast.
  */
class TablesCatalogSpec extends SparkSpec {

  test("catalog access path ≡ path access across query families") {
    val dir = "/root/testdata/sf0.001"
    def run(q: String): Seq[org.apache.spark.sql.Row] =
      SparkEntry.queries(q)(spark, dir).collect().toSeq
    val sample = Seq(
      "q1_pricing_summary",        // agg over lineitem
      "q5_region_nation_revenue",  // 6-way join
      "q_topk_orders",             // sort/limit
      "dedup_exact",               // documents
      "ann_ivf_topk",              // embeddings
      "cdc_compact_agg",           // events via normalizeTsNs
      "text_quality")              // scalar text functions
    val pathResults = sample.map(q => q -> run(q))
    val prev = Tables.mode
    Tables.mode = "catalog"
    try {
      val catResults = sample.map(q => q -> run(q))
      pathResults.zip(catResults).foreach { case ((qn, a), (_, b)) =>
        assert(a == b, s"$qn diverges between path and catalog modes")
      }
      // and the resolution really went through the catalog
      assert(spark.catalog.tableExists(Tables.catalogDb(dir) + ".lineitem"))
      assert(spark.catalog.tableExists(Tables.catalogDb(dir) + ".embeddings"))
    } finally Tables.mode = prev
  }

  test("partitioned catalog table prunes partitions through spark.table") {
    // the claim behind registerCatalog's "add PARTITIONED BY and no
    // query changes": a partition-valued filter through spark.table
    // must reach the catalog's partition metadata and prune files —
    // proven on a partitioned rewrite of the events table
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-part-demo")
    val dir = base.toString + "/events_p"
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.partitionBy("event_type").option("path", dir)
      .saveAsTable("graft_demo_events_p")
    try {
      val all = spark.table("graft_demo_events_p")
      val one = all.filter(col("event_type") === "click")
      val total = all.count()
      val clicks = one.count()
      assert(clicks > 0 && clicks < total)
      def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.FileSourceScanExec
        def leaves(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
          case qs: QueryStageExec => leaves(qs.plan)
          case s: FileSourceScanExec => Seq(s)
          case other => other.children.flatMap(leaves)
        }
        val q = df.queryExecution
        df.collect()
        leaves(q.executedPlan).map(_.metrics("numFiles").value).max
      }
      val allFiles = scannedFiles(all)
      val prunedFiles = scannedFiles(one)
      assert(prunedFiles < allFiles,
        s"expected partition pruning via the catalog: $prunedFiles of $allFiles files")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_demo_events_p")
      // DROP TABLE on a path-based external table leaves the files —
      // delete them so repeated runs don't accumulate temp copies
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("unknown access mode fails loudly") {
    val prev = Tables.mode
    Tables.mode = "wat"
    try {
      val e = intercept[IllegalStateException](
        Tables.load(spark, "/root/testdata/sf0.001", "region"))
      assert(e.getMessage.contains("unknown table access mode"))
    } finally Tables.mode = prev
  }
}
