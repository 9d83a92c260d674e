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
               valueCols: Seq[String], strict: Boolean = false): DataFrame =
    asofImpl(left, right, key, ord, valueCols, strict, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row per key with
    * right.ord >= left.ord (or > when `strict`) — "next fill after the
    * order", "next purchase after the click". Identical single-shuffle
    * union-sort shape; only the window direction flips.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, ord: String,
                      valueCols: Seq[String], strict: Boolean = false): DataFrame =
    asofImpl(left, right, key, ord, valueCols, strict, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String, ord: String,
                       valueCols: Seq[String], strict: Boolean,
                       forward: Boolean): DataFrame = {
    // tag ordering decides ties at equal ord: inclusive puts the right row
    // BEFORE the probe row (visible to the running frame), strict after it.
    // The same tags serve both directions because the direction only flips
    // the ord sort, not the tie rule.
    val leftTag = if (strict) 0 else 2
    val l = left.withColumn("__tag", lit(leftTag))
    val r = right.select((key +: ord +: valueCols).map(col): _*)
      .toDF((Seq(key, ord) ++ valueCols.map("__r_" + _)): _*)
      .withColumn("__tag", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val ordSort = if (forward) col(ord).desc else col(ord).asc
    val w = Window.partitionBy(key).orderBy(ordSort, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withVals = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withVals.filter(col("__tag") =!= 1)
      .drop("__tag")
      .drop(valueCols.map("__r_" + _): _*)
  }

  /** Nearest as-of over a NUMERIC ord: the closer of the backward and
    * forward matches, optionally within `tolerance` (|Δord| ≤ tolerance);
    * ties break backward (the financial convention: prefer the known past
    * over the future). Two keyed window passes — still linear, still one
    * partitioning by key reused by both sorts.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String, ord: String,
                      valueCols: Seq[String],
                      tolerance: Option[Long] = None): DataFrame = {
    val vcs = (valueCols :+ ord).distinct
    val b = asofJoin(left, right, key, ord, vcs)
    val bRenamed = vcs.foldLeft(b)((df, c) =>
      df.withColumnRenamed(s"asof_$c", s"__b_$c"))
    val f = asofJoinForward(bRenamed, right, key, ord, vcs)
    val both = vcs.foldLeft(f)((df, c) =>
      df.withColumnRenamed(s"asof_$c", s"__f_$c"))
    val dB = col(ord) - col(s"__b_$ord")
    val dF = col(s"__f_$ord") - col(ord)
    val okB = col(s"__b_$ord").isNotNull &&
      tolerance.map(t => dB <= t).getOrElse(lit(true))
    val okF = col(s"__f_$ord").isNotNull &&
      tolerance.map(t => dF <= t).getOrElse(lit(true))
    val useB = okB && (!okF || dB <= dF) // tie -> backward
    val picked = vcs.foldLeft(both) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(useB, col(s"__b_$c")).when(okF, col(s"__f_$c")))
    }
    picked.drop(vcs.flatMap(c => Seq(s"__b_$c", s"__f_$c")): _*)
  }
}
