package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Truncated exponentially-weighted moving averages and MACD.
  *
  * Definition (the "adjusted" EWMA — pandas `ewm(adjust=True)` — truncated
  * to a fixed frame): over the last `window` rows of the per-symbol series,
  *
  *   ema_t = sum_j decay^j * x_{t-j} / sum_j decay^j        (j = 0..m-1)
  *
  * where m <= window is the actual frame size (series head). MACD is the
  * fast EMA minus the slow EMA, both taken at their published 6-decimal
  * rounding.
  *
  * Cross-engine exactness is BY CONSTRUCTION, not by tolerance:
  *   - decays are 0.5 and 0.75 — exactly representable binary fractions
  *     whose powers stay exactly representable across the whole frame
  *     (0.75^15 = 3^15/4^15 needs 24 mantissa bits; a double has 53), so
  *     engine-side repeated multiplication and oracle-side exact decimal
  *     literals denote the SAME doubles;
  *   - normalizers are prefix sums of those powers — numerators stay under
  *     2^32 over the common denominator 4^15, so the double sums are exact;
  *   - each term x*w is ONE IEEE multiply (identical everywhere), rounded
  *     at 9 decimals and summed as DECIMAL(30,12) (order-free, exact);
  *   - the unbounded-decay closed form (sum of decay^-i, the textbook
  *     window-sum trick) is deliberately NOT used: decay^-rn overflows
  *     double precision within a year of daily bars.
  *
  * Scale shape: one exchange on symbol; both frames are in-partition window
  * scans over daily bars (never ticks), and the per-row fold touches at
  * most `window` elements.
  */
object Indicators {

  /** decay^0 .. decay^(window-1), exact (see scaladoc). */
  private[graft] def weights(decay: Double, window: Int): Seq[Double] =
    Iterator.iterate(1.0)(_ * decay).take(window).toSeq

  /** Prefix sums of `weights` — norms(m-1) normalizes an m-row frame. */
  private[graft] def norms(decay: Double, window: Int): Seq[Double] =
    weights(decay, window).scanLeft(0.0)(_ + _).tail

  private val dec = DecimalType(30, 12)

  /** The truncated adjusted EWMA of `valueCol` over the trailing `window`
    * rows (collected in frame order into `cl`).
    */
  private def emaOf(cl: Column, decay: Double, window: Int): Column = {
    val wArr = array(weights(decay, window).map(lit): _*) // wArr[j+1] = decay^j
    val nArr = array(norms(decay, window).map(lit): _*)   // nArr[m]  = norm of m rows
    // element i (0-based, ascending date) has age = size-1-i -> 1-based
    // weight index (size - i); each term is one IEEE multiply, rounded at 9
    // and folded as exact decimal (order-free by decimal exactness)
    val terms = transform(cl, (x, i) =>
      round(x * element_at(wArr, size(cl) - i), 9).cast(dec))
    val s = aggregate(terms, lit(java.math.BigDecimal.ZERO).cast(dec),
      (a, x) => (a + x).cast(dec))
    graft.functions.Fx.rd(s.cast("double") / element_at(nArr, size(cl)), 6)
  }

  val FastDecay = 0.5
  val FastWindow = 8
  val SlowDecay = 0.75
  val SlowWindow = 16

  /** Registered query (q150): fast/slow truncated EWMA + MACD per symbol
    * and date over the daily bars.
    */
  def emaMacd(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Fx._
    def w(n: Int) = Window.partitionBy("symbol").orderBy("date")
      .rowsBetween(-(n - 1), 0)
    MarketView.dailyBars(spark, dir)
      .withColumn("clf", collect_list(col("close")).over(w(FastWindow)))
      .withColumn("cls", collect_list(col("close")).over(w(SlowWindow)))
      .select(col("symbol"), dateStr(col("date")).as("date"),
        emaOf(col("clf"), FastDecay, FastWindow).as("ema_fast"),
        emaOf(col("cls"), SlowDecay, SlowWindow).as("ema_slow"))
      .withColumn("macd", rd(col("ema_fast") - col("ema_slow"), 6))
      .orderBy("symbol", "date")
  }

  /** The q150 oracle: the same arithmetic with the window fold restated as
    * a bounded rn-band self-join against EXACT decimal weight literals
    * (`BigDecimal("0.75").pow(j)` prints the decimal expansion of the very
    * double the engine multiplies by — both denote the same value).
    */
  def emaMacdOracleSql(barsPrefix: String): String = {
    def values(decay: String, window: Int, norm: Boolean): String = {
      val wts = (0 until window).map(j => BigDecimal(decay).pow(j))
      val rows =
        if (norm) wts.scanLeft(BigDecimal(0))(_ + _).tail.zipWithIndex
          .map { case (n, m) => s"(${m + 1}, CAST(${n.underlying.toPlainString} AS DOUBLE))" }
        else wts.zipWithIndex
          .map { case (w, j) => s"($j, CAST(${w.underlying.toPlainString} AS DOUBLE))" }
      rows.mkString(", ")
    }
    barsPrefix + s""", r AS (
  SELECT symbol, date, close,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM bars
), wf AS (SELECT * FROM (VALUES ${values("0.5", FastWindow, norm = false)}) t(j, wt)),
nf AS (SELECT * FROM (VALUES ${values("0.5", FastWindow, norm = true)}) t(m, nrm)),
ws AS (SELECT * FROM (VALUES ${values("0.75", SlowWindow, norm = false)}) t(j, wt)),
ns AS (SELECT * FROM (VALUES ${values("0.75", SlowWindow, norm = true)}) t(m, nrm)),
ef AS (
  SELECT a.symbol, a.rn, sum(CAST(round(b.close * wf.wt, 9) AS DECIMAL(30,12))) AS s
  FROM r a JOIN r b ON b.symbol = a.symbol AND b.rn BETWEEN a.rn - ${FastWindow - 1} AND a.rn
  JOIN wf ON wf.j = a.rn - b.rn
  GROUP BY 1, 2
), es AS (
  SELECT a.symbol, a.rn, sum(CAST(round(b.close * ws.wt, 9) AS DECIMAL(30,12))) AS s
  FROM r a JOIN r b ON b.symbol = a.symbol AND b.rn BETWEEN a.rn - ${SlowWindow - 1} AND a.rn
  JOIN ws ON ws.j = a.rn - b.rn
  GROUP BY 1, 2
)
SELECT r.symbol, CAST(r.date AS VARCHAR) AS date,
       round(CAST(ef.s AS DOUBLE) / nf.nrm, 6) + 0 AS ema_fast,
       round(CAST(es.s AS DOUBLE) / ns.nrm, 6) + 0 AS ema_slow,
       round((round(CAST(ef.s AS DOUBLE) / nf.nrm, 6) + 0)
           - (round(CAST(es.s AS DOUBLE) / ns.nrm, 6) + 0), 6) + 0 AS macd
FROM r
JOIN ef ON ef.symbol = r.symbol AND ef.rn = r.rn
JOIN es ON es.symbol = r.symbol AND es.rn = r.rn
JOIN nf ON nf.m = least(r.rn, ${FastWindow})
JOIN ns ON ns.m = least(r.rn, ${SlowWindow})
ORDER BY r.symbol, date"""
  }
}
