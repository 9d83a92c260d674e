package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectation-style data-quality checks (the reference's
  * `run_data_quality_checks` task and the `sql/quality_checks.sql` its README
  * promises but does not contain — reference `dags/financial_pipeline.py:126-136`,
  * `README.md:183`).
  *
  * Every check is ONE aggregation returning (check, passed, observed) rows —
  * fail-fast friendly (collect a handful of rows, `require` on them) and
  * scan-efficient: `checkAll` unions the row-level predicates into a single
  * pass over the table instead of one job per check.
  */
object Quality {

  final case class CheckResult(check: String, passed: Boolean, observed: Long)

  /** Row-level predicate checks evaluated in ONE scan: each entry is
    * (name, predicate that must hold for every row).
    */
  def checkAll(df: DataFrame, checks: Seq[(String, Column)]): Seq[CheckResult] = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.map { case ((name, _), i) =>
      val violations = row.getLong(i)
      CheckResult(name, violations == 0L, violations)
    }
  }

  /** Exact row count (reference's COUNT(*) = 750000 gate). */
  def rowCount(df: DataFrame, expected: Long): CheckResult = {
    val n = df.count()
    CheckResult(s"row_count=$expected", n == expected, n)
  }

  /** Key uniqueness at the declared grain. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String]): CheckResult = {
    val dups = df.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).count()
    CheckResult(s"unique_key(${keyCols.mkString(",")})", dups == 0L, dups)
  }

  /** Referential integrity: every fact key resolves in the dimension
    * (left_anti count must be 0 — the FK declarations at reference
    * `dags/financial_pipeline.py:172-173` made Postgres enforce this).
    */
  def referentialIntegrity(fact: DataFrame, factKey: String,
                           dim: DataFrame, dimKey: String): CheckResult = {
    val orphans = fact.select(col(factKey))
      .join(broadcast(dim.select(col(dimKey))), col(factKey) === col(dimKey), "left_anti")
      .count()
    CheckResult(s"ref_integrity($factKey->$dimKey)", orphans == 0L, orphans)
  }

  /** Fail-fast runner: raises with every failed check listed. */
  def enforce(results: Seq[CheckResult]): Unit = {
    val failed = results.filterNot(_.passed)
    require(failed.isEmpty,
      "quality checks failed: " +
        failed.map(r => s"${r.check} (observed=${r.observed})").mkString("; "))
  }
}
