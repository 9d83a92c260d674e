package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent right
  * row per key with right.ord <= left.ord (or < when `strict`).
  *
  * Spark has no ASOF JOIN operator; the naive range-join
  * (`l.key = r.key AND r.ord <= l.ord` + max-per-row) explodes to the full
  * per-key cross product before pruning. This implementation is the
  * single-shuffle formulation: union both sides tagged, sort within key by
  * (ord, tag), and carry the right side's values forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding running frame. Cost is
  * one exchange on `key` + one sort — the same plan shape as any window
  * aggregation, linear in total rows at any scale, skew-bounded by the
  * hottest key like every keyed operator.
  */
object AsOf {

  /** @param left      probe side; all its columns are preserved
    * @param right     reference side
    * @param key       equi-join key column (same name both sides)
    * @param ord       ordering column (same name both sides, any orderable type)
    * @param valueCols right columns to carry (emitted as `asof_<name>`)
    * @param strict    true = right.ord <  left.ord (strictly before);
    *                  false = right.ord <= left.ord (backward-inclusive)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ord: String,
               valueCols: Seq[String], strict: Boolean = false): DataFrame = {
    // tag ordering decides ties at equal ord: inclusive puts the right row
    // BEFORE the probe row (visible to the running frame), strict after it
    val leftTag = if (strict) 0 else 2
    val l = left.withColumn("__tag", lit(leftTag))
    val r = right.select((key +: ord +: valueCols).map(col): _*)
      .toDF((Seq(key, ord) ++ valueCols.map("__r_" + _)): _*)
      .withColumn("__tag", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(ord).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withVals = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withVals.filter(col("__tag") =!= 1)
      .drop("__tag")
      .drop(valueCols.map("__r_" + _): _*)
  }
}
