package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet testdata
  * (see TESTDATA.md). Every query takes an `sfDir` so the same code
  * runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loader keeps the access path behind one function so swapping in a
  * catalog (`spark.table`) or a bucketed layout is a one-line change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-relation cache ≙ the reference's load-metas-once-at-
  // startup design (`inputs/mysql/mysql_meta.go:32-69`): a resident
  // engine resolves each table's schema/file-listing ONCE per
  // session, not once per query build (schema inference is a Spark
  // job; paying it per query is pure overhead). Caches only the
  // analyzed relation — no data, no plans; every query still plans
  // and executes independently. WEAK-keyed by session so stopped
  // sessions (and their file listings) stay collectable — a strong
  // map would pin every session for the JVM lifetime. The testdata
  // is immutable; a mutable-source deployment would swap this for
  // catalog tables (`spark.table`), which re-list on refresh.
  private val relations =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String, String), DataFrame]]()

  /** Access-path mode: `"path"` (default) reads the parquet files
    * directly; `"catalog"` resolves every table through the session
    * catalog (`spark.table`) — the 100 TB deployment shape, where
    * tables are catalog entries with partition/bucket metadata and
    * re-list on refresh. Both the correctness gate and the bench run
    * green in either mode (TablesCatalogSpec pins the equivalence),
    * which is the proof behind the "one-line swap" claim above.
    * Switch with SPARK_GRAFT_TABLES=catalog. */
  @volatile var mode: String = sys.env.getOrElse("SPARK_GRAFT_TABLES", "path")

  /** Catalog database name for one testdata scale dir (each sfDir
    * registers into its own namespace). Sanitization alone is NOT
    * injective (`/data/sf-1` and `/data/sf_1` both flatten to
    * `data_sf_1`) and a collision would silently serve the FIRST
    * dir's data for the second — so the raw path's digest is part of
    * the name. */
  def catalogDb(sfDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    "graft_" + sfDir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "") + "_" + digest
  }

  /** Register every testdata table as an EXTERNAL catalog table over
    * its parquet location. Unpartitioned here because the generated
    * testdata has no partition dirs; the 100 TB layout adds
    * `PARTITIONED BY`/bucket specs to exactly these DDLs and no
    * query changes. */
  def registerCatalog(spark: SparkSession, sfDir: String): Unit = {
    val db = catalogDb(sfDir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    all.foreach { n =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS `$db`.`$n` USING parquet " +
        s"LOCATION '$sfDir/$n.parquet'")
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = relations.synchronized {
      var m = relations.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap
          .empty[(String, String, String), DataFrame]
        relations.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((mode, sfDir, name), mode match {
      case "catalog" =>
        // names are sanitized to [A-Za-z0-9_] — no quoting needed
        val ref = s"${catalogDb(sfDir)}.$name"
        if (!spark.catalog.tableExists(ref)) registerCatalog(spark, sfDir)
        spark.table(ref)
      case "path" => spark.read.parquet(s"$sfDir/$name.parquet")
      case other => throw new IllegalStateException(
        s"unknown table access mode '$other' (SPARK_GRAFT_TABLES): " +
          "expected 'path' or 'catalog'")
    })
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Normalize a timestamp-ish column to Long epoch-nanoseconds.
    *
    * The driver has shipped `events.ts` as BOTH int64-nanos parquet
    * (read as Long under `spark.sql.legacy.parquet.nanosAsLong`) and
    * `timestamp[us]` — the encoding changed silently between rounds.
    * Every downstream query does exact integer-ns arithmetic and
    * every DuckDB oracle reads the same instant via
    * `epoch_ns`/`epoch_us`, so this one probe is the whole
    * schema-drift contract: Long passes through, timestamps convert
    * exactly (µs → ns is an integer multiply; NTZ → LTZ is
    * instant-preserving under the UTC session every entrypoint sets),
    * and anything else fails LOUDLY here instead of as a scattered
    * `DATATYPE_MISMATCH` per query.
    */
  def normalizeTsNs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn(colName,
          unix_micros(col(colName).cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"testdata schema contract broken: column `$colName` is $other " +
          "(expected LONG nanos or TIMESTAMP/TIMESTAMP_NTZ) — the driver " +
          "regenerated the parquet with a new encoding; extend " +
          "Tables.normalizeTsNs for it")
    }
  }

  /** `events` with `ts` guaranteed Long epoch-ns (see normalizeTsNs). */
  def loadEventsNs(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTsNs(load(spark, sfDir, "events"))
}
