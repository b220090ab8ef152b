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
