package graft.operators

import graft.functions.Fx._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Star-schema joins over the TPC-H-ish testdata (SURVEY.md §2.3 J1–J3).
  *
  * The reference declares fact→dim FKs (`dags/financial_pipeline.py:172-173`)
  * and relies on Postgres for the join strategy; here the strategy is the
  * 100 TB-correct one made explicit: dimensions (region/nation/part/supplier,
  * and customer at most scales) are `broadcast()` so the fact table never
  * shuffles for a dim lookup — the only exchanges left are the aggregations'.
  */
object Stars {

  /** J1: full star — lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue
    * rollup by region/nation. orders⋈customer is a shuffle join at 100 TB
    * (both sides scale); nation/region are broadcast.
    */
  def revenueByRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Top-k customers by order value (T1/T2 over a star join). */
  def topCustomers(spark: SparkSession, dir: String, k: Int): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("total_spent"))
      .orderBy(col("total_spent").desc, col("c_custkey").asc)
      .limit(k)

  /** Part-type margin profile: lineitem ⋈ part (broadcast dim). */
  def partTypeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(
        count(lit(1)).as("n_items"),
        exactSum(col("l_quantity")).as("sum_qty"),
        rd(avg(col("l_discount")), 6).as("avg_discount"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("p_type")

  /** J3: left-semi — customers having at least one high-value order. */
  def customersWithBigOrders(spark: SparkSession, dir: String, minPrice: Double): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > minPrice),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** A14's anti-join half: customers with NO high-value order (the
    * insert-if-absent upsert is `existing ∪ (incoming ∖ existing)`; the ∖ is
    * this left_anti).
    */
  def customersWithoutBigOrders(spark: SparkSession, dir: String, minPrice: Double): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > minPrice),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** A14: insert-if-absent upsert (`INSERT … ON CONFLICT DO NOTHING`,
    * reference `dags/financial_pipeline.py:150,161`): keep every existing row,
    * add incoming rows whose key is absent. Pure DataFrame expression —
    * distributed, no driver loop.
    */
  def upsertIfAbsent(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(key), Seq(key), "left_anti")
        .dropDuplicates(key))

  /** TPC-H Q1-shaped pricing summary — the scan-heavy flagship aggregate.
    * The shipdate predicate pushes to the parquet scan (PushedFilters).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(expr("l_shipdate <= TIMESTAMP_NTZ '2000-12-31 00:00:00'"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        rd(avg(col("l_quantity")), 6).as("avg_qty"),
        rd(avg(col("l_extendedprice")), 4).as("avg_price"),
        rd(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Orders rolled up by calendar month (projection+filter pushdown shape). */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mes"))
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("total"))
      .orderBy("mes")

  /** SCD2-style temporal compaction: each customer's time-ordered order
    * stream compressed into constant-status intervals — the gaps-and-islands
    * read path of slowly-changing-dimension maintenance (and of CDC log
    * compaction: N change events → one row per run of equal state).
    * Emits (custkey, seq, status, valid_from, valid_to, n_orders) where seq
    * numbers a customer's intervals in time order.
    *
    * Shape: one shuffle on custkey, then two window scans over each
    * customer's own series (change flag via lag, island id via running sum)
    * and a hash aggregation on (custkey, island). Nothing global: state
    * shards by customer exactly like the sessionize operator, so 100 TB of
    * order history compacts with per-key parallelism. Total order inside a
    * customer is (o_orderdate, o_orderkey) — orderkey breaks date ties
    * deterministically.
    */
  def statusIntervals(spark: SparkSession, dir: String): DataFrame =
    statusIntervalsFrom(Tables.orders(spark, dir))

  def statusIntervalsFrom(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .withColumn("chg",
        when(lag(col("o_orderstatus"), 1).over(w).isNull ||
          lag(col("o_orderstatus"), 1).over(w) =!= col("o_orderstatus"), 1L).otherwise(0L))
      .withColumn("island", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey").as("custkey"), col("island").as("seq"),
        col("o_orderstatus").as("status"))
      .agg(dateStr(min(col("o_orderdate"))).as("valid_from"),
        dateStr(max(col("o_orderdate"))).as("valid_to"),
        count(lit(1)).as("n_orders"))
      .orderBy("custkey", "seq")
  }
}
