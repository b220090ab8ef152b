package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table — the
  * validation layer a CDC consumer runs against the replicated
  * target (did the pipeline preserve the contract?) and a curation
  * pipeline runs before training.
  *
  * Evaluation cost is the point:
  *  - all ROW-LOCAL checks (not-null, value-set, range, custom
  *    predicate) fold into ONE conditional-aggregation pass over one
  *    scan — k checks cost one table read, not k;
  *  - `unique` adds one hash aggregate on its key columns;
  *  - `refIntegrity` adds one LEFT ANTI join per referenced parent
  *    (the parent side is typically dimension-sized and broadcasts;
  *    the child is never shuffled when it does).
  *
  * Output is one (check, n_violations) row per constraint — exact
  * integer counts, so the audit is oracle-checkable and
  * partition-invariant.
  */
object Constraints {

  sealed trait Check { def name: String }
  /** Row-local predicate that must hold; violations = rows where it
    * is false OR null. */
  final case class Predicate(name: String, holds: Column) extends Check
  final case class NotNull(colName: String) extends Check {
    val name = s"not_null($colName)"
  }
  final case class InSet(colName: String, values: Seq[Any]) extends Check {
    val name = s"in_set($colName)"
  }
  final case class Range(colName: String, lo: Any, hi: Any) extends Check {
    val name = s"range($colName)"
  }
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
  }
  final case class RefIntegrity(childCol: String, parent: DataFrame,
      parentCol: String, parentName: String) extends Check {
    val name = s"ref($childCol->$parentName.$parentCol)"
  }

  /** Evaluate every check; returns (check, n_violations), one row per
    * check, in the given order (an `ord` column carries it through
    * sorts). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    // names are the check identity (and the row-local agg aliases):
    // duplicates would alias two aggregates identically and fail
    // downstream with AMBIGUOUS_REFERENCE — reject them up front
    val dup = checks.map(_.name).groupBy(identity).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate check names: ${dup.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._

    def viol(pred: Column): Column =
      sum(when(pred.isNull || !pred, 1L).otherwise(0L))

    val rowLocal: Seq[(Int, String, Column)] = checks.zipWithIndex.collect {
      case (c: Predicate, i) => (i, c.name, viol(c.holds))
      case (c: NotNull, i) =>
        (i, c.name, sum(when(col(c.colName).isNull, 1L).otherwise(0L)))
      case (c: InSet, i) =>
        (i, c.name, viol(col(c.colName).isin(c.values: _*)))
      case (c: Range, i) =>
        (i, c.name, viol(col(c.colName).between(lit(c.lo), lit(c.hi))))
    }
    val rowLocalDf: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (_, n, a) => a.as(s"c$n") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(rowLocal.map { case (i, n, _) =>
          struct(lit(i).as("ord"), lit(n).as("check"),
            coalesce(col(s"c$n"), lit(0L)).as("n_violations")).as(s"s$i")
        }: _*).select(explode(array(rowLocal.map { case (i, _, _) =>
          col(s"s$i")
        }: _*)).as("r")).select(col("r.ord"), col("r.check"),
          col("r.n_violations")))
      }

    val others: Seq[DataFrame] = checks.zipWithIndex.collect {
      case (c: Unique, i) =>
        df.groupBy(c.cols.map(col): _*)
          .agg(count(lit(1)).as("n")).filter(col("n") > 1L)
          .agg(coalesce(sum(col("n") - 1L), lit(0L)).as("n_violations"))
          .select(lit(i).as("ord"), lit(c.name).as("check"),
            col("n_violations"))
      case (c: RefIntegrity, i) =>
        df.select(col(c.childCol)).filter(col(c.childCol).isNotNull)
          .join(c.parent.select(col(c.parentCol).as(c.childCol)),
            Seq(c.childCol), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(i).as("ord"), lit(c.name).as("check"),
            col("n_violations"))
    }

    (rowLocalDf.toSeq ++ others)
      .reduce(_ unionByName _)
      .orderBy(col("ord"))
  }
}
