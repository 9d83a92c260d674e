package graft

import graft.operators.{Analytics, MarketView}
import graft.pipeline.GraftSql
import org.apache.spark.sql.functions._

/** The "switch engines without rewriting your SQL" contract: after
  * `GraftSql.registerReferenceSchema`, the reference pipeline's own SELECT
  * bodies (`dags/financial_pipeline.py` — the INSERT-SELECT and MATERIALIZED
  * VIEW statements) run UNCHANGED in `spark.sql` and agree with the engine's
  * DataFrame operators, with exactly the two documented dialect shims (DOW
  * convention, stddev-of-one NaN→NULL).
  */
class GraftSqlSpec extends SparkSpecBase {
  import spark.implicits._

  test("the reference's fact INSERT-SELECT body runs verbatim and equals the engine fact exactly") {
    GraftSql.registerReferenceSchema(spark, sf)
    // verbatim SELECT body of load_fact_table (financial_pipeline.py:185-194)
    val ref = spark.sql(
      """SELECT s.symbol,
        |       s.date,
        |       s.open,
        |       s.high,
        |       s.low,
        |       s.close,
        |       s.volume,
        |       (s.close - LAG(s.close) OVER (PARTITION BY s.symbol ORDER BY s.date))
        |       / NULLIF(LAG(s.close) OVER (PARTITION BY s.symbol ORDER BY s.date), 0) * 100 AS variacao_diaria
        |FROM staging s""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(5),
        Option(r.get(7)).map(_.asInstanceOf[Double]))).toSet
    val engine = spark.table("fact_movimentacao_diaria")
      .select(col("ticker"), col("data_id"), col("close"), col("variacao_diaria"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    // same double arithmetic, same per-(symbol, date) grain: EXACT equality
    assert(ref == engine, "verbatim reference fact SQL diverges from the engine fact")
    assert(ref.exists(_._4.isEmpty) && ref.exists(_._4.nonEmpty),
      "fixture did not exercise both the first-row NULL and computed variations")
  }

  test("the reference's volatility MV body runs verbatim; with the NaN shim it equals the engine's weekly volatility") {
    GraftSql.registerReferenceSchema(spark, sf)
    // verbatim MV body of calculate_volatility_view (financial_pipeline.py:203-210)
    val ref = spark.sql(
      """SELECT ticker,
        |       DATE_TRUNC('week', data_id) AS week,
        |       STDDEV_SAMP(variacao_diaria) AS vol
        |FROM fact_movimentacao_diaria
        |WHERE variacao_diaria IS NOT NULL
        |GROUP BY ticker, DATE_TRUNC('week', data_id)""".stripMargin)
      // the ONE dialect shim: Postgres STDDEV_SAMP of a single row is NULL,
      // Spark's is NaN — identical everywhere else
      .select(col("ticker"), date_format(col("week"), "yyyy-MM-dd").as("semana"),
        round(when(isnan(col("vol")), lit(null)).otherwise(col("vol")), 6).as("vol"))
      .as[(String, String, Option[Double])].collect().toSet
    val engine = Analytics.weeklyVolatility(MarketView.fact(spark, sf))
      .select(col("symbol"), col("semana"), round(col("vol"), 6).as("vol"))
      .as[(String, String, Option[Double])].collect().toSet
    assert(ref == engine, "verbatim reference MV SQL (shimmed) diverges from the engine weekly volatility")
    // the registered volatility_weekly view carries the shim already
    val view = spark.table("volatility_weekly")
      .select(col("ticker"), date_format(col("week"), "yyyy-MM-dd"),
        round(col("vol"), 6))
      .as[(String, String, Option[Double])].collect().toSet
    assert(view == engine)
  }

  test("q121-q123 texts are the published README blocks, modulo line-trailing whitespace") {
    val readme = java.nio.file.Paths.get("/root/reference/README.md")
    assume(java.nio.file.Files.isReadable(readme), "reference checkout not present")
    val lines = java.nio.file.Files.readAllLines(readme)
    def block(from: Int, to: Int): String = // 1-based inclusive, like the citations
      (from to to).map(i => lines.get(i - 1).replaceAll("\\s+$", "")).mkString("\n")
    def norm(s: String): String = s.linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n")
    assert(norm(GraftSql.readmeWeeklyVolText) == block(65, 71),
      "q121 stored text drifted from README.md:65-71")
    assert(norm(GraftSql.readmeRiskProfileText) == block(89, 97),
      "q122 stored text drifted from README.md:89-97")
    assert(norm(GraftSql.readmeLiquidityText) == block(109, 115),
      "q123 stored text drifted from README.md:109-115")
    // the one documented erratum is exactly one mechanical substitution wide:
    // it rewrites the two DATE_TRUNC('week', date) call sites and nothing else
    val body = GraftSql.stripStatementPlumbing(GraftSql.readmeWeeklyVolText)
    val shimmed = GraftSql.applyDateErratum(body)
    assert(shimmed != body && shimmed == body.replace("'week', date)", "'week', data_id)"))
    assert(GraftSql.applyDateErratum(GraftSql.readmeRiskProfileText) == GraftSql.readmeRiskProfileText
      && GraftSql.applyDateErratum(GraftSql.readmeLiquidityText) == GraftSql.readmeLiquidityText,
      "erratum must be a no-op on the q122/q123 texts")
  }

  test("the README ad-hoc queries execute through GraftSql and agree with the engine operators") {
    import org.apache.spark.sql.functions.{round => rnd}
    val risk = GraftSql.readmeRiskProfile(spark, sf)
      .select(col("ticker"), col("volatilidade"))
      .as[(String, Option[Double])].collect().toMap
    val engine = Analytics.riskProfile(MarketView.fact(spark, sf))
      .select(col("symbol"), (rnd(col("volatilidade"), 6) + lit(0d)).as("v"))
      .as[(String, Option[Double])].collect().toMap
    assert(risk == engine && risk.nonEmpty,
      "README risk-profile text diverges from the engine risk profile")
    val liq = GraftSql.readmeLiquidity(spark, sf)
      .select(col("ticker"), col("volume_total")).as[(String, Long)].collect().toMap
    val engineLiq = Analytics.liquidity(MarketView.dailyBars(spark, sf))
      .select(col("symbol"), col("volume_total")).as[(String, Long)].collect().toMap
    assert(liq == engineLiq && liq.nonEmpty)
    // weekly vol: README rounds to 2 — compare against the engine's rounded MV
    val wk = GraftSql.readmeWeeklyVol(spark, sf)
      .select(col("ticker"), col("week_start"), col("vol"))
      .as[(String, String, Option[Double])].collect().toSet
    val engineWk = Analytics.weeklyVolatilityRounded(MarketView.fact(spark, sf))
      .select(col("ticker"), col("semana"), (col("vol") + lit(0d)).as("vol"))
      .as[(String, String, Option[Double])].collect().toSet
    assert(wk == engineWk && wk.nonEmpty,
      "README weekly-vol text diverges from the engine rounded weekly volatility")
  }

  test("the reference's dim_instrumento body runs verbatim; the DOW dialect shim is pinned") {
    GraftSql.registerReferenceSchema(spark, sf)
    val ref = spark.sql(
      """SELECT DISTINCT symbol, 'Ativo ' || symbol, 'Acao' FROM staging""")
      .as[(String, String, String)].collect().toSet
    val view = spark.table("dim_instrumento")
      .as[(String, String, String)].collect().toSet
    assert(ref == view && view.nonEmpty)
    // Spark's EXTRACT(DOW) is 1=Sunday; Postgres is 0=Sunday (2024-01-07 is
    // a Sunday). dim_tempo carries the POSTGRES convention via the -1 shim.
    assert(spark.sql("SELECT EXTRACT(DOW FROM DATE'2024-01-07') AS d")
      .head().get(0).toString == "1", "Spark DOW convention changed — re-check the shim")
    val bad = spark.table("dim_tempo")
      .filter(col("dia_da_semana") =!= (dayofweek(col("data_id")) - 1)).count()
    assert(bad == 0, "dim_tempo does not carry the Postgres DOW convention")
    assert(spark.table("dim_tempo")
      .agg(min("dia_da_semana"), max("dia_da_semana"))
      .as[(Long, Long)].head() == ((0L, 6L)) ||
      spark.table("dim_tempo").count() < 7,
      "DOW range is not the Postgres 0..6")
  }
}
