package graft.pipeline

import graft.operators.{Analytics, MarketView}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The executive text report (reference
  * `analysis/análise_exploratória.ipynb` cell 27: general stats, top-5
  * volatility / performance / liquidity rankings, investor-profile guidance;
  * written to `outputs/relatorio_completo.txt`).
  *
  * Every number is computed distributed; only the ≤5-row rankings and the
  * 1-row global stats are collected. Formatting is driver-side by design —
  * this is the S9 text-report sink, not a query operator.
  */
object Report {

  private val Bar = "═" * 79

  /** F13: the reference stamps the report with the generation time
    * (`analysis/análise_exploratória.ipynb` cell 27, `pd.Timestamp.now()
    * .strftime`). The stamp is an explicit parameter here — `None` (the
    * default) keeps report output deterministic for oracle comparison;
    * callers that want the reference's stamped header pass the clock in.
    */
  private val StampFmt = java.time.format.DateTimeFormatter
    .ofPattern("dd/MM/yyyy HH:mm").withZone(java.time.ZoneOffset.UTC)

  def executiveReport(spark: SparkSession, dir: String,
                      generatedAt: Option[java.time.Instant] = None): String = {
    val fact = MarketView.fact(spark, dir).cache()

    val g = Analytics.globalStats(fact).head()
    val top5Vol = Analytics.riskProfile(fact).limit(5)
      .select("symbol", "volatilidade").collect()
    val top5Perf = Analytics.topPerformance(fact, 5).collect()
    val top5Liq = Analytics.liquidity(fact).limit(5)
      .select("symbol", "volume_total").collect()
    val scores = Analytics.investorScores(fact).collect()
    fact.unpersist()

    def ranking(rows: Array[org.apache.spark.sql.Row], fmt: org.apache.spark.sql.Row => String) =
      rows.zipWithIndex.map { case (r, i) => s"${i + 1}. ${fmt(r)}" }.mkString("\n")

    def bestBy(col: Int): String =
      scores.maxBy(_.getDouble(col)).getString(0)

    val stamp = generatedAt.map(i => s"\nGerado em: ${StampFmt.format(i)}").getOrElse("")

    s"""RELATÓRIO EXECUTIVO — ANÁLISE DE MERCADO
$Bar$stamp
PERÍODO ANALISADO: ${g.getAs[String]("first_date")} até ${g.getAs[String]("last_date")}

1. RESUMO GERAL
$Bar
Registros analisados: ${g.getAs[Long]("n_rows")}
Ações distintas: ${g.getAs[Long]("n_symbols")}
Dias de negociação: ${g.getAs[Long]("n_days")}
Volatilidade do mercado: ${f"${g.getAs[Double]("std_variacao")}%.2f"}%%
Preço médio de fechamento: ${f"${g.getAs[Double]("avg_close")}%.2f"}
Volume médio diário: ${f"${g.getAs[Double]("avg_volume")}%,.0f"}

2. TOP 5 MAIOR VOLATILIDADE (RISCO)
$Bar
${ranking(top5Vol, r => f"${r.getString(0)}: ${r.getDouble(1)}%.2f%% de volatilidade")}

3. TOP 5 MELHOR PERFORMANCE (RETORNO)
$Bar
${ranking(top5Perf, r => f"${r.getString(0)}: ${r.getDouble(1)}%+.2f%% de variação média diária")}

4. TOP 5 MAIOR LIQUIDEZ (VOLUME)
$Bar
${ranking(top5Liq, r => f"${r.getString(0)}: ${r.getLong(1)}%,d ações negociadas")}

5. PERFIS DE INVESTIDOR — MELHOR SCORE
$Bar
Conservador (50%% segurança / 30%% performance / 20%% liquidez): ${bestBy(4)}
Moderado    (35%% segurança / 35%% performance / 30%% liquidez): ${bestBy(5)}
Agressivo   (20%% segurança / 50%% performance / 30%% liquidez): ${bestBy(6)}
""".stripMargin
  }

  /** S9 sink: write the report to a text file (driver-side). */
  def writeTo(spark: SparkSession, dir: String, outPath: String,
              generatedAt: Option[java.time.Instant] = None): String = {
    val r = executiveReport(spark, dir, generatedAt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outPath).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), r)
    r
  }
}
