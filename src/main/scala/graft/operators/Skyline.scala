package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) as a DISTRIBUTIVE two-phase sweep.
  *
  * A point p is on the skyline (minimize `x`, maximize `y`) iff no other
  * point q has q.x <= p.x && q.y >= p.y with at least one strict. The naive
  * relational form is a quadratic NOT EXISTS self-join (that IS the oracle);
  * the engine shape instead exploits the 1-D sweep characterization:
  *
  *   p is dominated  iff  max{ y(q) : q.x <  p.x } >= p.y
  *                    or  max{ y(q) : q.x == p.x } >  p.y
  *
  * computed without any global sort:
  *   1. one cheap min/max aggregate fixes a fixed-width bucket grid on x
  *      (2 doubles to the driver — bucket routing only ever affects WHERE a
  *      row is computed, never the result);
  *   2. per distinct x: max(y) — a map-side-combinable hash aggregate that
  *      collapses the relation to |distinct x| rows;
  *   3. inside each bucket: running max over the (tiny, per-bucket) ordered
  *      distinct-x relation — the partitioned window sorts only its bucket;
  *   4. across buckets: a <=`buckets`-row aggregate, prefix-maxed and
  *      broadcast back.
  *
  * At 100 TB no stage shuffles more than the distinct-x relation and nothing
  * is quadratic; the only global ordering lives on the <=`buckets`-row
  * relation. Duplicate (x, y) points are both kept (neither strictly
  * dominates), matching the NOT EXISTS semantics exactly.
  */
object Skyline {

  /** Rows of `df` on the (minimize x, maximize y) Pareto frontier. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val x = col(xCol)
    val r = df.agg(min(x).as("mn"), max(x).as("mx")).head()
    if (r.isNullAt(0)) return df.limit(0) // empty input
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val width = (mx - mn) / buckets
    val b: Column =
      if (width == 0.0) lit(0L)
      else least(floor((x - lit(mn)) / lit(width)), lit(buckets - 1L)).cast("long")

    // distinct-x relation: best y at each x, bucket carried along (the
    // bucket is a pure function of x, so (b, x) groups == x groups)
    val g = df.groupBy(b.as("__b"), x.as("__x"))
      .agg(max(col(yCol)).as("__my"))

    // in-bucket running max over STRICTLY smaller x (rows frame ends at -1;
    // one row per distinct x, so rows === distinct-x values)
    val wRun = Window.partitionBy("__b").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, -1)
    // cross-bucket prefix: best y of every strictly-earlier bucket — the
    // global window is fine HERE because the relation is <= `buckets` rows
    val wPre = Window.orderBy("__bb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bAgg = g.groupBy(col("__b").as("__bb")).agg(max(col("__my")).as("__bm"))
      .withColumn("__pre", max(col("__bm")).over(wPre))
      .select(col("__bb").as("__b"), col("__pre"))

    val thresholds = g
      .withColumn("__run", max(col("__my")).over(wRun))
      .join(broadcast(bAgg), Seq("__b"))
      .select(col("__x"),
        // max y over all strictly-smaller x (NULL when none exists)
        greatest(coalesce(col("__run"), col("__pre")),
                 coalesce(col("__pre"), col("__run"))).as("__lt"),
        col("__my"))

    df.join(thresholds, x === col("__x"))
      .filter((col("__lt").isNull || col("__lt") < col(yCol)) &&
              !(col("__my") > col(yCol)))
      .drop("__x", "__lt", "__my")
  }

  /** Registered query (q152): the price/size Pareto frontier of the part
    * catalogue — cheapest part at every size level that no cheaper-or-equal
    * part matches-or-beats. The oracle is the literal quadratic NOT EXISTS;
    * hash equality proves the distributive sweep == the definition.
    */
  def paretoParts(spark: SparkSession, dir: String): DataFrame =
    skyline2d(
      graft.sources.Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_retailprice").cast("double").as("p_retailprice"),
          col("p_size").cast("long").as("p_size")),
      "p_retailprice", "p_size", buckets = 32)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_size", "p_partkey")
}
