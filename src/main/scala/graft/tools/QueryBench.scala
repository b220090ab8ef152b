package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local profiling main: time individual declared queries (or named
  * A/B variants below) with the same session config and consumption
  * methodology as [[graft.Bench]], reporting min/median over N reps.
  *
  * Usage: runMain graft.tools.QueryBench <sfDir> <reps> <name>...
  */
object QueryBench {

  /** Named plan variants not in SparkEntry (A/B experiments). */
  def variants: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def consume(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    names.foreach { rawName =>
      val explain = rawName.startsWith("explain:")
      val name = rawName.stripPrefix("explain:")
      val fn = graft.SparkEntry.queries.getOrElse(name,
        variants.getOrElse(name,
          sys.error(s"unknown query/variant '$name'")))
      if (explain) {
        val df = fn(spark, sfDir)
        consume(df) // AQE: final plan only exists after execution
        println(s"== plan: $name ==")
        println(df.queryExecution.executedPlan.toString)
      } else {
        consume(fn(spark, sfDir)) // warm
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          consume(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"QB $name%-24s min=${times.head}%.3f med=${times(times.size / 2)}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
