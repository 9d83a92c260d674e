package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small cross-engine numeric/format helpers shared by the query surface.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle, so
  * float results are rounded to a fixed number of decimals and negative zero
  * is normalized (IEEE: -0.0 + 0.0 == +0.0) on BOTH sides.
  */
object Fx {

  /** Round for oracle comparison and normalize -0.0 → 0.0. */
  def rd(c: Column, d: Int): Column = round(c, d) + lit(0.0)

  /** Spark's stddev of a 1-row group is NaN where Postgres/DuckDB return NULL
    * (SURVEY.md §2.4 A1 pitfall).
    */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** NULLIF(x, 0) division guard (reference `dags/financial_pipeline.py:193`). */
  def nullIfZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** Dates/timestamps are emitted as canonical strings so the oracle compare
    * never trips over parquet date32 vs DuckDB DATE representations.
    */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Exact distributed SUM of a double expression: cast each row to
    * DECIMAL(30,6) so the aggregate is order-independent (float sums over
    * millions of rows differ between engines by more than any sane rounding).
    * Result cast back to double.
    */
  def exactSum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(30, 6))).cast("double")
}
