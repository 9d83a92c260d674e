package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.7 set operations, pinned directly on the Dataset operators.
  *
  * The registered q48 query answers the same three cohort counts with a
  * single-scan flag aggregation (intersect/except/union each fork the lineage
  * and re-scan the fact — N full scans at 100 TB); this spec keeps the literal
  * `intersect` / `except` / `union.distinct` operators exercised and asserts
  * the flag-aggregation twin is value-identical to them.
  */
class SetOpsSpec extends SparkSpecBase {

  private lazy val weeks = {
    val e = Tables.events(spark, sf)
      .select(col("user_id"),
        date_trunc("week", col("date")).cast(org.apache.spark.sql.types.DateType).as("wk"))
    val w1d = e.agg(min(col("wk"))).head().getDate(0)
    val w2d = java.sql.Date.valueOf(w1d.toLocalDate.plusDays(7))
    val u1 = e.filter(col("wk") === lit(w1d)).select("user_id").distinct().cache()
    val u2 = e.filter(col("wk") === lit(w2d)).select("user_id").distinct().cache()
    (u1, u2)
  }

  test("intersect/except/union.distinct match the q48 flag-aggregation twin") {
    val (u1, u2) = weeks
    val nBoth = u1.intersect(u2).count()
    val nOnlyW1 = u1.except(u2).count()
    val nUnion = u1.union(u2).distinct().count()
    val row = SparkEntry.queries("q48_user_cohort_setops")(spark, sf).head()
    assert(row.getLong(0) == nBoth, "n_both")
    assert(row.getLong(1) == nOnlyW1, "n_only_w1")
    assert(row.getLong(2) == nUnion, "n_union")
  }

  test("set-op identities hold on the cohorts (|A| = |A∩B| + |A\\B|)") {
    val (u1, u2) = weeks
    assert(u1.count() == u1.intersect(u2).count() + u1.except(u2).count())
    assert(u1.union(u2).distinct().count() ==
      u1.count() + u2.count() - u1.intersect(u2).count())
  }
}
