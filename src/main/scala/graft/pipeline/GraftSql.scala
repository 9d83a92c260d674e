package graft.pipeline

import graft.operators.{Analytics, MarketView}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's RELATIONAL surface as Spark temp views — the "switch
  * engines without rewriting your SQL" contract: a user of the reference
  * queries `staging`, `dim_instrumento`, `dim_tempo`,
  * `fact_movimentacao_diaria`, and `volatility_weekly` by name (reference
  * `dags/financial_pipeline.py:104-213`); after [[registerReferenceSchema]]
  * those names resolve in `spark.sql(...)` with the same columns, so the
  * reference's own SELECT statements run unchanged (the INSERT-SELECT and
  * MATERIALIZED VIEW bodies — DDL wrappers are Postgres-side plumbing).
  *
  * Two documented dialect shims, both already encoded in the engine
  * operators and pinned by GraftSqlSpec:
  *   - `EXTRACT(DOW ...)`: Postgres yields 0=Sunday; Spark's `dayofweek`
  *     is 1=Sunday — dim_tempo carries the Postgres convention (−1).
  *   - `STDDEV_SAMP` of a single row: Postgres yields NULL, Spark NaN —
  *     volatility_weekly carries the NULL convention (NaN→NULL shim).
  *
  * Everything registers LAZILY as views over the parquet sources: no data
  * is copied, Catalyst prunes/pushes through the view boundary, and the
  * raw analytical tables (lineitem … embeddings) register alongside for
  * ad-hoc SQL over the full surface.
  */
object GraftSql {

  def registerReferenceSchema(spark: SparkSession, dir: String): Unit = {
    // Bronze: the reference's staging IS the daily OHLCV quote relation
    MarketView.dailyBars(spark, dir)
      .select(col("date"), col("symbol"), col("open"), col("high"),
        col("low"), col("close"), col("volume"))
      .createOrReplaceTempView("staging")
    // dims, with the reference's Portuguese column names and conventions
    spark.sql(
      """SELECT DISTINCT symbol AS ticker, 'Ativo ' || symbol AS nome_ativo,
        |       'Acao' AS tipo_ativo FROM staging""".stripMargin)
      .createOrReplaceTempView("dim_instrumento")
    Analytics.dimTempo(MarketView.dailyBars(spark, dir))
      .select(col("data_id").cast("date").as("data_id"), col("ano"),
        col("mes"), col("dia_da_semana"))
      .createOrReplaceTempView("dim_tempo")
    // Silver: the fact with the LAG-derived daily variation
    MarketView.fact(spark, dir)
      .select(col("symbol").as("ticker"), col("date").as("data_id"),
        col("open"), col("high"), col("low"), col("close"), col("volume"),
        col("variacao_diaria"))
      .createOrReplaceTempView("fact_movimentacao_diaria")
    // Gold: the weekly-volatility materialized view's relation
    spark.sql(
      """SELECT ticker, DATE_TRUNC('week', data_id) AS week,
        |       STDDEV_SAMP(variacao_diaria) AS vol
        |FROM fact_movimentacao_diaria
        |WHERE variacao_diaria IS NOT NULL
        |GROUP BY ticker, DATE_TRUNC('week', data_id)""".stripMargin)
      .withColumn("vol", when(isnan(col("vol")), lit(null)).otherwise(col("vol")))
      .createOrReplaceTempView("volatility_weekly")
    // the raw analytical tables, for SQL over the extension surface
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Convenience: register and immediately run a statement. */
  def sql(spark: SparkSession, dir: String, statement: String): DataFrame = {
    registerReferenceSchema(spark, dir)
    spark.sql(statement)
  }
}
