package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Market view: re-hosts the reference's finance semantics onto the driver
  * testdata (SURVEY.md §7.1). `events` becomes a quote stream:
  * symbol := event_type, price := value, per-day share count := props.k.
  *
  * `dailyBars` rolls the intraday stream up to the reference's fact grain
  * (ticker, date) — OHLCV bars. `withPctChange` adds the reference's only
  * window computation, the LAG %-change (reference
  * `dags/financial_pipeline.py:185-194`).
  */
object MarketView {

  /** Raw quote stream projection. `k` (daily volume contribution) is parsed
    * from the JSON props with a regexp + try_cast so malformed rows degrade to
    * NULL instead of failing the job under ANSI mode.
    */
  def quotes(spark: SparkSession, dir: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1)
    Tables.events(spark, dir).select(
      col("event_type").as("symbol"),
      col("date"),
      col("value"),
      col("ts_ns"),
      col("event_id"),
      when(k === "", lit(null)).otherwise(k).cast("long").as("k")
    )
  }

  /** OHLCV daily bars, grain (symbol, date) — the Silver fact base.
    *
    * open/close are first/last intraday value, made deterministic by the
    * (ts_ns, event_id) total order. Both row_numbers share the same partition
    * keys, so Catalyst plans ONE shuffle exchange for the two window sorts +
    * the final aggregation — verified via explain; at 100 TB this is a single
    * repartition by (symbol, date), no second pass over the data.
    */
  def dailyBars(spark: SparkSession, dir: String): DataFrame = {
    val e = quotes(spark, dir)
    val wAsc = Window.partitionBy("symbol", "date").orderBy(col("ts_ns").asc, col("event_id").asc)
    val wDesc = Window.partitionBy("symbol", "date").orderBy(col("ts_ns").desc, col("event_id").desc)
    e.withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy("symbol", "date")
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        sum(col("k")).as("volume")
      )
  }

  /** W1/W2: previous close + daily %-change per ticker
    * (reference `dags/financial_pipeline.py:192-193`):
    * `(close - LAG(close)) / NULLIF(LAG(close), 0) * 100`.
    * First row per ticker and prev-close = 0 both yield NULL.
    */
  def withPctChange(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("date")
    val prev = lag(col("close"), 1).over(w)
    bars
      .withColumn("prev_close", prev)
      .withColumn("variacao_diaria",
        (col("close") - col("prev_close")) /
          when(col("prev_close") === 0, lit(null)).otherwise(col("prev_close")) * 100)
  }

  /** The full Silver fact: daily bars + %-change (fact_movimentacao_diaria
    * analog, reference `dags/financial_pipeline.py:170-194`).
    */
  def fact(spark: SparkSession, dir: String): DataFrame =
    withPctChange(dailyBars(spark, dir))
}
