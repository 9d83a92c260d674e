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

  // --------------------------------------------------------------------------
  // The reference README's three PUBLISHED ad-hoc analyst queries — the texts
  // a migrating user would actually paste in. Each is stored as the literal
  // README text; the runners strip statement plumbing (the `CREATE TABLE …
  // AS` DDL wrapper and the trailing `;`, which are Postgres-side mechanics
  // exactly as GraftSqlSpec treats the DAG's DDL), apply at most the ONE
  // documented erratum below, execute via `spark.sql`, and then normalize
  // OUTSIDE the text for the driver's hash compare (date→string, NaN→NULL
  // dialect shim, ±0.0 double canonicalization, deterministic ORDER BY) —
  // the same conventions every other gate query uses on both sides.
  //
  // ERRATUM (q121 only): the README's weekly-volatility text
  // (`README.md:64-71`) names the fact date column `date`, but the shipped
  // fact table has `data_id` (`dags/financial_pipeline.py:171-173`) — the
  // text as published cannot run on the reference's own Postgres either.
  // One mechanical substitution (`'week', date)` → `'week', data_id)`),
  // applied identically on the oracle side, and nothing else.
  // --------------------------------------------------------------------------

  /** Literal text of `README.md:64-71` (rounded weekly volatility). */
  val readmeWeeklyVolText: String =
    """CREATE TABLE volatility_weekly AS
      |SELECT
      |    DATE_TRUNC('week', date)::date AS week_start,
      |    ticker,
      |    ROUND(STDDEV(variacao_diaria), 2) AS vol
      |FROM fact_movimentacao_diaria
      |GROUP BY DATE_TRUNC('week', date), ticker;""".stripMargin

  /** Literal text of `README.md:89-97` (volatility / risk profile).
    * (The README's `SELECT ` carries a trailing space; the stored text strips
    * line-trailing whitespace only — GraftSqlSpec pins this equivalence
    * against the published file.) */
  val readmeRiskProfileText: String =
    """SELECT
      |    ticker,
      |    STDDEV(variacao_diaria) AS volatilidade,
      |    AVG(variacao_diaria) AS retorno_medio,
      |    MAX(variacao_diaria) AS variacao_maxima,
      |    MIN(variacao_diaria) AS variacao_minima
      |FROM fact_movimentacao_diaria
      |GROUP BY ticker
      |ORDER BY volatilidade DESC;""".stripMargin

  /** Literal text of `README.md:109-115` (volume / liquidity); same
    * trailing-whitespace note as [[readmeRiskProfileText]]. */
  val readmeLiquidityText: String =
    """SELECT
      |    ticker,
      |    AVG(volume) AS volume_medio,
      |    SUM(volume) AS volume_total
      |FROM fact_movimentacao_diaria
      |GROUP BY ticker
      |ORDER BY volume_total DESC;""".stripMargin

  /** `CREATE TABLE t AS <select>;` → `<select>` — DDL wrapper and statement
    * terminator are engine-side plumbing, not query semantics. */
  private[graft] def stripStatementPlumbing(text: String): String =
    text.replaceFirst("(?s)^CREATE TABLE \\w+ AS\\s*", "").trim.stripSuffix(";")

  private[graft] def applyDateErratum(body: String): String =
    body.replace("'week', date)", "'week', data_id)")

  /** q121: the README weekly-vol text, run unchanged (modulo the documented
    * erratum) over the registered reference schema. */
  def readmeWeeklyVol(spark: SparkSession, dir: String): DataFrame = {
    registerReferenceSchema(spark, dir)
    spark.sql(applyDateErratum(stripStatementPlumbing(readmeWeeklyVolText)))
      .select(
        date_format(col("week_start"), "yyyy-MM-dd").as("week_start"),
        col("ticker"),
        (when(isnan(col("vol")), lit(null)).otherwise(col("vol")) + lit(0d)).as("vol"))
      .orderBy(col("ticker"), col("week_start"))
  }

  /** q122: the README risk-profile text, run unchanged. */
  def readmeRiskProfile(spark: SparkSession, dir: String): DataFrame = {
    registerReferenceSchema(spark, dir)
    spark.sql(stripStatementPlumbing(readmeRiskProfileText))
      .select(
        col("ticker"),
        (round(when(isnan(col("volatilidade")), lit(null)).otherwise(col("volatilidade")), 6) + lit(0d)).as("volatilidade"),
        (round(col("retorno_medio"), 6) + lit(0d)).as("retorno_medio"),
        (round(col("variacao_maxima"), 6) + lit(0d)).as("variacao_maxima"),
        (round(col("variacao_minima"), 6) + lit(0d)).as("variacao_minima"))
      .orderBy(col("volatilidade").desc, col("ticker"))
  }

  /** q123: the README liquidity text, run unchanged. */
  def readmeLiquidity(spark: SparkSession, dir: String): DataFrame = {
    registerReferenceSchema(spark, dir)
    spark.sql(stripStatementPlumbing(readmeLiquidityText))
      .select(
        col("ticker"),
        (round(col("volume_medio"), 4) + lit(0d)).as("volume_medio"),
        col("volume_total").cast("long").as("volume_total"))
      .orderBy(col("volume_total").desc, col("ticker"))
  }
}
