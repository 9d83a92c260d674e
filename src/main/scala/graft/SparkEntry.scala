package graft

import graft.functions.Fx._
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator/query family from SURVEY.md §2 (or
  * the LLM-pipeline extension surface); `oracleSql` holds the DuckDB-dialect
  * ANSI SQL the driver runs on the same parquet tables at sf0.01 for the
  * hash-compare. Column names, rounding, and ordering are kept identical on
  * both sides (floats rounded, -0.0 normalized, dates stringified — see
  * graft.functions.Fx).
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the reference's "most volatile ticker" report
    * (reference `dags/financial_pipeline.py:59-66`). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Analytics.avgVolatilityPerTicker(MarketView.fact(spark, "/root/testdata/sf0.001")).limit(1)

  // ---------------------------------------------------------------------------
  // Shared DuckDB oracle prefixes: the market view re-hosted on `events`
  // (SURVEY.md §7.1). Deterministic intraday order = (ts, event_id).
  // ---------------------------------------------------------------------------
  private val BARS = """WITH e AS (
  SELECT event_type AS symbol, CAST(ts AS DATE) AS date, value, ts, event_id,
         TRY_CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS BIGINT) AS k
  FROM events
), re AS (
  SELECT *,
         row_number() OVER (PARTITION BY symbol, date ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY symbol, date ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), bars AS (
  SELECT symbol, date,
         max(CASE WHEN rn_a = 1 THEN value END) AS open,
         max(value) AS high,
         min(value) AS low,
         max(CASE WHEN rn_d = 1 THEN value END) AS close,
         CAST(sum(k) AS BIGINT) AS volume
  FROM re GROUP BY symbol, date
)"""

  private val FACT = BARS + """, fact AS (
  SELECT symbol, date, open, high, low, close, volume,
         lag(close) OVER (PARTITION BY symbol ORDER BY date) AS prev_close,
         (close - lag(close) OVER (PARTITION BY symbol ORDER BY date))
           / nullif(lag(close) OVER (PARTITION BY symbol ORDER BY date), 0) * 100 AS variacao_diaria
  FROM bars
)"""

  private val WEEKLY = FACT + """, wv AS (
  SELECT symbol, CAST(date_trunc('week', date) AS DATE) AS semana,
         stddev_samp(variacao_diaria) AS vol
  FROM fact WHERE variacao_diaria IS NOT NULL
  GROUP BY 1, 2
)"""

  // ---------------------------------------------------------------------------
  // Query surface
  // ---------------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- market/finance parity (SURVEY §2.2–§2.6, §2.8) --
    "q01_daily_bars" -> ((s, dir) =>
      MarketView.dailyBars(s, dir)
        .select(col("symbol"), dateStr(col("date")).as("date"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .orderBy("symbol", "date")),

    "q02_pct_change" -> ((s, dir) =>
      MarketView.fact(s, dir)
        .select(col("symbol"), dateStr(col("date")).as("date"), col("close"),
          col("prev_close"), rd(col("variacao_diaria"), 6).as("variacao_diaria"))
        .orderBy("symbol", "date")),

    "q03_weekly_volatility" -> ((s, dir) =>
      Analytics.weeklyVolatility(MarketView.fact(s, dir))
        .select(col("symbol"), dateStr(col("semana")).as("semana"), rd(col("vol"), 6).as("vol"))
        .orderBy("symbol", "semana")),

    "q04_top_volatility" -> ((s, dir) =>
      Analytics.avgVolatilityPerTicker(MarketView.fact(s, dir)).limit(1)),

    "q05_risk_profile" -> ((s, dir) =>
      Analytics.riskProfile(MarketView.fact(s, dir))),

    "q06_liquidity" -> ((s, dir) =>
      Analytics.liquidity(MarketView.dailyBars(s, dir))),

    "q07_global_stats" -> ((s, dir) =>
      Analytics.globalStats(MarketView.fact(s, dir))),

    "q08_dim_instrument" -> ((s, dir) =>
      Analytics.dimInstrument(MarketView.dailyBars(s, dir))),

    "q09_dim_tempo" -> ((s, dir) =>
      Analytics.dimTempo(MarketView.dailyBars(s, dir))),

    "q10_quality_gate" -> ((s, dir) =>
      Analytics.qualityGate(MarketView.dailyBars(s, dir))),

    "q11_weekly_vol_rounded" -> ((s, dir) =>
      Analytics.weeklyVolatilityRounded(MarketView.fact(s, dir))),

    "q12_top_performance" -> ((s, dir) =>
      Analytics.topPerformance(MarketView.fact(s, dir), 5)),

    "q13_investor_scores" -> ((s, dir) =>
      Analytics.investorScores(MarketView.fact(s, dir))),

    "q14_monthly_summary" -> ((s, dir) =>
      Analytics.monthlySummary(MarketView.dailyBars(s, dir))),

    // -- star joins over the TPC-H tables (SURVEY §2.3) --
    "q15_star_revenue" -> ((s, dir) => Stars.revenueByRegionNation(s, dir)),
    "q16_top_customers" -> ((s, dir) => Stars.topCustomers(s, dir, 10)),
    "q17_part_type_stats" -> ((s, dir) => Stars.partTypeStats(s, dir)),
    "q18_semi_join_big_orders" -> ((s, dir) => Stars.customersWithBigOrders(s, dir, 450000.0)),
    "q19_anti_join_no_big_orders" -> ((s, dir) => Stars.customersWithoutBigOrders(s, dir, 450000.0)),
    "q20_pricing_summary" -> ((s, dir) => Stars.pricingSummary(s, dir)),
    "q21_orders_by_month" -> ((s, dir) => Stars.ordersByMonth(s, dir)),

    // -- event-stream shapes in batch (SURVEY §2.9) --
    "q22_events_weekly" -> ((s, dir) =>
      EventOps.weeklyTumbling(s, dir)
        .select(col("event_type"), dateStr(col("semana")).as("semana"),
          col("n_events"), col("n_users"), col("sum_value"))
        .orderBy("event_type", "semana")),
    "q23_user_sessions" -> ((s, dir) => EventOps.userSessions(s, dir)),
    "q24_props_rollup" -> ((s, dir) => EventOps.propsRollup(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_daily_bars" -> (BARS + """
SELECT symbol, CAST(date AS VARCHAR) AS date, open, high, low, close, volume
FROM bars ORDER BY symbol, date"""),

    "q02_pct_change" -> (FACT + """
SELECT symbol, CAST(date AS VARCHAR) AS date, close, prev_close,
       round(variacao_diaria, 6) + 0 AS variacao_diaria
FROM fact ORDER BY symbol, date"""),

    "q03_weekly_volatility" -> (WEEKLY + """
SELECT symbol, CAST(semana AS VARCHAR) AS semana, round(vol, 6) + 0 AS vol
FROM wv ORDER BY symbol, semana"""),

    "q04_top_volatility" -> (WEEKLY + """
SELECT symbol, round(avg(vol), 4) + 0 AS avg_volatility
FROM wv GROUP BY symbol
ORDER BY avg_volatility DESC, symbol LIMIT 1"""),

    "q05_risk_profile" -> (FACT + """
SELECT symbol,
       round(stddev_samp(variacao_diaria), 6) + 0 AS volatilidade,
       round(avg(variacao_diaria), 6) + 0 AS variacao_media,
       round(max(variacao_diaria), 6) + 0 AS maior_alta,
       round(min(variacao_diaria), 6) + 0 AS maior_queda
FROM fact WHERE variacao_diaria IS NOT NULL
GROUP BY symbol ORDER BY volatilidade DESC, symbol"""),

    "q06_liquidity" -> (BARS + """
SELECT symbol,
       round(avg(volume), 4) + 0 AS volume_medio,
       CAST(sum(volume) AS BIGINT) AS volume_total
FROM bars GROUP BY symbol ORDER BY volume_total DESC, symbol"""),

    "q07_global_stats" -> (FACT + """
SELECT count(*) AS n_rows,
       count(DISTINCT symbol) AS n_symbols,
       count(DISTINCT date) AS n_days,
       CAST(min(date) AS VARCHAR) AS first_date,
       CAST(max(date) AS VARCHAR) AS last_date,
       round(avg(close), 4) + 0 AS avg_close,
       round(stddev_samp(variacao_diaria), 4) + 0 AS std_variacao,
       round(avg(volume), 4) + 0 AS avg_volume
FROM fact"""),

    "q08_dim_instrument" -> (BARS + """
SELECT DISTINCT symbol AS ticker, 'Ativo ' || symbol AS nome
FROM bars ORDER BY ticker"""),

    "q09_dim_tempo" -> (BARS + """
SELECT DISTINCT CAST(date AS VARCHAR) AS data_id,
       CAST(date_part('year', date) AS BIGINT) AS ano,
       CAST(date_part('month', date) AS BIGINT) AS mes,
       CAST(date_part('dow', date) AS BIGINT) AS dia_da_semana
FROM bars ORDER BY data_id"""),

    "q10_quality_gate" -> (BARS + """
SELECT total_rows, null_criticals,
       CASE WHEN null_criticals = 0 AND n_keys = total_rows THEN 1 ELSE 0 END::BIGINT AS passed
FROM (
  SELECT count(*) AS total_rows,
         CAST(sum(CASE WHEN close IS NULL OR date IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_criticals,
         count(DISTINCT symbol || '|' || CAST(date AS VARCHAR)) AS n_keys
  FROM bars
)"""),

    "q11_weekly_vol_rounded" -> (FACT + """
SELECT symbol AS ticker, CAST(CAST(date_trunc('week', date) AS DATE) AS VARCHAR) AS semana,
       round(stddev_samp(variacao_diaria), 2) + 0 AS vol
FROM fact WHERE variacao_diaria IS NOT NULL
GROUP BY 1, 2 ORDER BY ticker, semana"""),

    "q12_top_performance" -> (FACT + """
SELECT symbol, round(avg(variacao_diaria), 4) + 0 AS variacao_media
FROM fact WHERE variacao_diaria IS NOT NULL
GROUP BY symbol ORDER BY variacao_media DESC, symbol LIMIT 5"""),

    "q13_investor_scores" -> (FACT + """, metrics AS (
  SELECT symbol, stddev_samp(variacao_diaria) AS vol, avg(variacao_diaria) AS vm,
         CAST(sum(volume) AS DOUBLE) AS vt
  FROM fact WHERE variacao_diaria IS NOT NULL GROUP BY symbol
), g AS (
  SELECT max(vol) AS vol_max, min(vm) AS vm_min, max(vm) AS vm_max,
         min(vt) AS vt_min, max(vt) AS vt_max
  FROM metrics
), sc AS (
  SELECT symbol,
         100.0 - vol / nullif(vol_max, 0) * 100 AS s_seg,
         (vm - vm_min) / nullif(vm_max - vm_min, 0) * 100 AS s_perf,
         (vt - vt_min) / nullif(vt_max - vt_min, 0) * 100 AS s_liq
  FROM metrics CROSS JOIN g
)
SELECT symbol,
       round(s_seg, 4) + 0 AS score_seguranca,
       round(s_perf, 4) + 0 AS score_performance,
       round(s_liq, 4) + 0 AS score_liquidez,
       round(s_seg * 0.5 + s_perf * 0.3 + s_liq * 0.2, 4) + 0 AS score_conservador,
       round(s_seg * 0.35 + s_perf * 0.35 + s_liq * 0.3, 4) + 0 AS score_moderado,
       round(s_seg * 0.2 + s_perf * 0.5 + s_liq * 0.3, 4) + 0 AS score_agressivo
FROM sc ORDER BY symbol"""),

    "q14_monthly_summary" -> (BARS + """
SELECT CAST(date_part('year', date) AS BIGINT) AS ano,
       CAST(date_part('month', date) AS BIGINT) AS mes,
       count(*) AS n_bars,
       round(avg(close), 4) + 0 AS avg_close,
       CAST(sum(volume) AS BIGINT) AS volume_total
FROM bars GROUP BY 1, 2 ORDER BY ano, mes"""),

    "q15_star_revenue" -> """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q16_top_customers" -> """
SELECT c_custkey, c_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey LIMIT 10""",

    "q17_part_type_stats" -> """
SELECT p_type, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       round(avg(l_discount), 6) + 0 AS avg_discount,
       CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type ORDER BY p_type""",

    "q18_semi_join_big_orders" -> """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
ORDER BY c_custkey""",

    "q19_anti_join_no_big_orders" -> """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
ORDER BY c_custkey""",

    "q20_pricing_summary" -> """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 6) + 0 AS avg_qty,
       round(avg(l_extendedprice), 4) + 0 AS avg_price,
       round(avg(l_discount), 6) + 0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",

    "q21_orders_by_month" -> """
SELECT strftime(o_orderdate, '%Y-%m') AS mes, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
FROM orders GROUP BY 1 ORDER BY mes""",

    "q22_events_weekly" -> """
SELECT event_type,
       CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS VARCHAR) AS semana,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY event_type, semana""",

    "q23_user_sessions" -> """
WITH x AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM x GROUP BY user_id ORDER BY user_id""",

    "q24_props_rollup" -> """
SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(avg(k), 4) + 0 AS avg_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type,
             TRY_CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS BIGINT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type"""
  )
}
