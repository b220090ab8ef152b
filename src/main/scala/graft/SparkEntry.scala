package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's declared queries;
  * each key has a matching DuckDB oracle in `oracleSql` unless the
  * operation is not SQL-expressible (then the driver records a
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Kept parquet-native (no ns-timestamp tables) so it runs
    * under any session config. */
  def entry(spark: SparkSession): DataFrame = {
    GraftExtensions.ensure(spark)
    CoreQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.6
    * extensions). Every query self-registers the engine's native
    * functions on the caller's session ([[GraftExtensions.ensure]],
    * idempotent) — the contract must hold on ANY session, not only
    * ones built with `spark.sql.extensions`. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val raw =
      CoreQueries.queries ++ Core2Queries.queries ++ Core3Queries.queries ++
        Core4Queries.queries ++ Core5Queries.queries ++
        CdcQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
        SimilarityQueries.queries ++ EventQueries.queries ++
        ModelQueries.queries
    raw.map { case (name, f) =>
      name -> ((s: SparkSession, dir: String) => {
        GraftExtensions.ensure(s); f(s, dir)
      })
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ Core2Queries.oracle ++ Core3Queries.oracle ++
      Core4Queries.oracle ++ Core5Queries.oracle ++
      CdcQueries.oracle ++ TextQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ EventQueries.oracle ++
      ModelQueries.oracle
}
