package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lot-level FIFO matching — the inventory/cost-basis primitive behind
  * realized-P&L, stock-aging and warehouse-consumption reports (the
  * reference's fact table tracks per-instrument daily flows; FIFO is the
  * ledger-grain refinement of that family).
  *
  * FIFO looks inherently sequential: walk each part's additions and
  * removals in ship order, consuming the oldest open lot first. The
  * distributed reformulation is exact and classic: prefix-sum both streams
  * per part, so addition i owns the UNIT INTERVAL [lo_i, hi_i) of
  * cumulative added units and removal j owns [lo_j, hi_j) of cumulative
  * removed units — FIFO matches exactly the unit-interval OVERLAPS, because
  * FIFO consumption is order-preserving on both sides. The whole match is
  * then two window prefix-sums plus ONE interval-overlap join: no loop, no
  * driver state, no per-part recursion.
  *
  * Scale shape: the overlap join is BANDED (q54 discipline) — each lot
  * explodes to the fixed-width unit buckets it spans, the join is an
  * equi-join on (part, bucket), and a pair is emitted only in the bucket of
  * its overlap start, so nothing is double-counted and the fan-out per lot
  * is O(lot_size / bucket_width), independent of how many lots a part has.
  * A part with a billion matched units shuffles O(units/width) bucket rows,
  * never the quadratic lot cross-product; the window prefix-sums shuffle
  * once on the part key. All arithmetic is integer (quantities are whole
  * units; lags are whole days weighted by whole units), so the gate is
  * exact on any engine.
  */
object Ledger {

  /** Per-part FIFO match census over the lineitem ledger: additions are
    * `l_returnflag = 'N'` lots, removals `l_returnflag = 'R'`, both in
    * (shipdate, orderkey, linenumber) FIFO order. Emits one row per part
    * that has at least one matched pair: lot totals, matched units, pair
    * count, and the unit-weighted add→remove day lag (the "stock age" of
    * consumed inventory).
    */
  def fifoMatch(lineitem: DataFrame, bucketWidth: Long = 128L): DataFrame = {
    val adds = lotIntervals(lineitem, "N")
    val rems = lotIntervals(lineitem, "R")

    val pairs = banded(adds, bucketWidth).as("a")
      .join(banded(rems, bucketWidth).as("b"), Seq("pk", "__b"))
      .filter(col("a.lo") < col("b.hi") && col("b.lo") < col("a.hi"))
      // emit each overlapping pair exactly once: in the bucket where the
      // overlap starts
      .filter(col("__b") === floor(greatest(col("a.lo"), col("b.lo")) / bucketWidth))
      .select(col("pk"),
        (least(col("a.hi"), col("b.hi"))
          - greatest(col("a.lo"), col("b.lo"))).as("ov"),
        datediff(col("b.ship"), col("a.ship")).cast("long").as("lag"))

    val matched = pairs.groupBy("pk")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ov")).as("matched_qty"),
        sum(col("ov") * col("lag")).as("lag_unit_days"))

    val addTot = adds.groupBy("pk").agg(max(col("hi")).as("add_qty"))
    val remTot = rems.groupBy("pk").agg(max(col("hi")).as("rem_qty"))

    matched.join(addTot, "pk").join(remTot, "pk")
      .select(col("pk").as("p_partkey"), col("add_qty"), col("rem_qty"),
        col("matched_qty"), col("n_pairs"), col("lag_unit_days"))
      .orderBy("p_partkey")
  }

  /** FIFO inventory aging (q207): the unmatched tail of the add stream,
    * bucketed by lot age — "how old is what's still on the shelf". FIFO
    * consumes the OLDEST units first, so the remaining units of add lot
    * [lo, hi) are exactly max(0, hi − max(lo, total_removed)): one join of
    * the lot intervals against per-part removal totals — no matching pass
    * at all. Age = days from the lot's ship date to the corpus's last ship
    * date; fixed buckets (≤30, 31–90, 91–365, >365 days). All integer.
    *
    * Scale shape: one keyed prefix-sum window (shared with [[fifoMatch]]),
    * one per-part total aggregate, one broadcast of the single max-date
    * row; the census is bucket-bounded.
    */
  def fifoAging(lineitem: DataFrame): DataFrame = {
    val adds = lotIntervals(lineitem, "N")
    val remTot = lotIntervals(lineitem, "R")
      .groupBy("pk").agg(max(col("hi")).as("consumed"))
    val maxShip = lineitem.filter(col("l_returnflag").isin("N", "R"))
      .agg(max(col("l_shipdate").cast("date")).as("as_of"))
    adds
      .join(remTot, Seq("pk"), "left")
      .na.fill(0L, Seq("consumed"))
      .withColumn("remaining",
        greatest(lit(0L), col("hi") - greatest(col("lo"), col("consumed"))))
      .filter(col("remaining") > 0)
      .crossJoin(broadcast(maxShip))
      .withColumn("age_days", datediff(col("as_of"), col("ship")).cast("long"))
      .withColumn("age_bucket",
        when(col("age_days") <= 30, "a_0_30")
          .when(col("age_days") <= 90, "b_31_90")
          .when(col("age_days") <= 365, "c_91_365")
          .otherwise("d_over_365"))
      .groupBy("age_bucket")
      .agg(countDistinct(col("pk")).as("n_parts"), count(lit(1)).as("n_lots"),
        sum(col("remaining")).as("units"),
        sum(col("remaining") * col("age_days")).as("unit_age_days"))
      .orderBy("age_bucket")
  }

  /** The q207 oracle: the same remaining-tail identity in SQL. */
  def fifoAgingOracleSql: String = """
WITH lots AS (
  SELECT l_returnflag AS f, l_partkey AS pk, CAST(l_shipdate AS DATE) AS ship,
         CAST(sum(l_quantity) OVER (PARTITION BY l_returnflag, l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag IN ('N', 'R')
), iv AS (
  SELECT f, pk, ship, hi - q AS lo, hi FROM lots
), rt AS (
  SELECT pk, max(hi) AS consumed FROM iv WHERE f = 'R' GROUP BY pk
), mx AS (
  SELECT max(CAST(l_shipdate AS DATE)) AS as_of
  FROM lineitem WHERE l_returnflag IN ('N', 'R')
), rem AS (
  SELECT a.pk, a.ship,
         greatest(0, a.hi - greatest(a.lo, coalesce(rt.consumed, 0))) AS remaining
  FROM (SELECT * FROM iv WHERE f = 'N') a
  LEFT JOIN rt ON rt.pk = a.pk
), aged AS (
  SELECT pk, remaining,
         date_diff('day', ship, (SELECT as_of FROM mx)) AS age_days
  FROM rem WHERE remaining > 0
)
SELECT CASE WHEN age_days <= 30 THEN 'a_0_30'
            WHEN age_days <= 90 THEN 'b_31_90'
            WHEN age_days <= 365 THEN 'c_91_365'
            ELSE 'd_over_365' END AS age_bucket,
       CAST(count(DISTINCT pk) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_lots,
       CAST(sum(remaining) AS BIGINT) AS units,
       CAST(sum(remaining * age_days) AS BIGINT) AS unit_age_days
FROM aged GROUP BY 1 ORDER BY age_bucket"""

  /** One flag's lots with their cumulative unit intervals [lo, hi). */
  private def lotIntervals(lineitem: DataFrame, flag: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("ship", "okey", "ln")
    lineitem.filter(col("l_returnflag") === flag)
      .select(col("l_partkey").as("pk"),
        col("l_shipdate").cast("date").as("ship"),
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("ln"),
        col("l_quantity").cast("long").as("qty"))
      .withColumn("hi", sum(col("qty")).over(w))
      .withColumn("lo", col("hi") - col("qty"))
      .select(col("pk"), col("ship"), col("lo"), col("hi"))
  }

  /** Explode a lot to every fixed-width unit bucket its interval spans. */
  private def banded(lots: DataFrame, width: Long): DataFrame =
    lots.withColumn("__b",
      explode(sequence(floor(col("lo") / width), floor((col("hi") - 1) / width))))

  /** The q194 oracle: identical prefix-sum intervals, but the overlap join
    * stated as the LITERAL per-part quadratic predicate — hash equality
    * proves banded == definitional.
    */
  def fifoMatchOracleSql: String = """
WITH lots AS (
  SELECT l_returnflag AS f, l_partkey AS pk, CAST(l_shipdate AS DATE) AS ship,
         CAST(sum(l_quantity) OVER (PARTITION BY l_returnflag, l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag IN ('N', 'R')
), iv AS (
  SELECT f, pk, ship, hi - q AS lo, hi FROM lots
), pairs AS (
  SELECT a.pk,
         least(a.hi, b.hi) - greatest(a.lo, b.lo) AS ov,
         date_diff('day', a.ship, b.ship) AS lag
  FROM (SELECT * FROM iv WHERE f = 'N') a
  JOIN (SELECT * FROM iv WHERE f = 'R') b
    ON a.pk = b.pk AND a.lo < b.hi AND b.lo < a.hi
), m AS (
  SELECT pk, count(*) AS n_pairs, sum(ov) AS matched_qty,
         sum(ov * lag) AS lag_unit_days
  FROM pairs GROUP BY pk
), tot AS (
  SELECT f, pk, max(hi) AS t FROM iv GROUP BY f, pk
)
SELECT m.pk AS p_partkey,
       ta.t AS add_qty, tr.t AS rem_qty,
       CAST(m.matched_qty AS BIGINT) AS matched_qty,
       CAST(m.n_pairs AS BIGINT) AS n_pairs,
       CAST(m.lag_unit_days AS BIGINT) AS lag_unit_days
FROM m
JOIN (SELECT pk, t FROM tot WHERE f = 'N') ta ON ta.pk = m.pk
JOIN (SELECT pk, t FROM tot WHERE f = 'R') tr ON tr.pk = m.pk
ORDER BY p_partkey"""
}
