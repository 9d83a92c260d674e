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

  /** Sample autocorrelation function (q176): r_k of the daily return per
    * symbol at lags 1..`maxLag`, the Box–Jenkins model-identification
    * diagnostic that complements the q179 control chart and q150 EWMA.
    *
    *   r_k = sum_t d_t * d_{t-k}  /  sum_t d_t^2,   d_t = x_t - mean(x)
    *
    * Cross-engine exactness follows the q179 contract: the mean is a
    * decimal-sum ratio published at 6 decimals, deviations are rounded at 6
    * (identical doubles on both engines), each product is ONE IEEE multiply
    * rounded at 9 and summed as DECIMAL(30,12) (order-free), and the final
    * ratio divides two exact operands.
    *
    * Scale shape: one exchange on symbol shared by the lag window and the
    * final aggregate; the per-symbol stats relation is broadcast back. The
    * k lag columns are materialized side by side so the big relation is
    * scanned ONCE (the explode happens on the symbols-sized aggregate, not
    * the bar stream).
    */
  def acf(fact: DataFrame, maxLag: Int): DataFrame = {
    import graft.functions.Fx._
    val f = fact.filter(col("variacao_diaria").isNotNull)
    val mu = f.groupBy("symbol")
      .agg(count(lit(1)).as("n"),
        sum(round(col("variacao_diaria"), 9).cast(dec)).as("sm"))
      .select(col("symbol"), rd(col("sm").cast("double") / col("n"), 6).as("mu"))
    val w = Window.partitionBy("symbol").orderBy("date")
    val d0 = f.join(broadcast(mu), "symbol")
      .withColumn("d", rd(col("variacao_diaria") - col("mu"), 6))
    val lagged = (1 to maxLag).foldLeft(d0)((df, k) =>
      df.withColumn(s"d_$k", lag(col("d"), k).over(w)))
    val aggs =
      sum(round(col("d") * col("d"), 9).cast(dec)).as("den") +:
        (1 to maxLag).flatMap(k => Seq(
          sum(round(col("d") * col(s"d_$k"), 9).cast(dec)).as(s"num_$k"),
          count(col(s"d_$k")).as(s"cnt_$k")))
    val g = lagged.groupBy("symbol").agg(aggs.head, aggs.tail: _*)
    g.select(col("symbol"), col("den"),
        explode(array((1 to maxLag).map(k => struct(
          lit(k).cast("long").as("lag"),
          col(s"num_$k").as("num"),
          col(s"cnt_$k").as("n_terms"))): _*)).as("e"))
      .select(col("symbol"), col("e.lag").as("lag"),
        rd(col("e.num").cast("double") /
          nullIfZero(col("den").cast("double")), 6).as("acf"),
        col("e.n_terms").as("n_terms"))
      .orderBy("symbol", "lag")
  }

  /** The q176 oracle: the identical two-pass arithmetic in DuckDB; the
    * lag-column unpivot is restated as a UNION ALL over the symbols-sized
    * aggregate.
    */
  def acfOracleSql(factPrefix: String, maxLag: Int): String = {
    val lagCols = (1 to maxLag).map(k => s"lag(d, $k) OVER w AS d_$k").mkString(",\n         ")
    val aggCols = (1 to maxLag).map(k =>
      s"sum(CAST(round(d * d_$k, 9) AS DECIMAL(30,12))) AS num_$k, count(d_$k) AS cnt_$k")
      .mkString(",\n         ")
    val arms = (1 to maxLag).map(k =>
      s"SELECT symbol, CAST($k AS BIGINT) AS lag, CAST(num_$k AS DOUBLE) AS num, CAST(den AS DOUBLE) AS den, cnt_$k AS n_terms FROM g")
      .mkString("\n  UNION ALL\n  ")
    factPrefix + s""", f AS (
  SELECT symbol, date, variacao_diaria AS x FROM fact WHERE variacao_diaria IS NOT NULL
), m AS (
  SELECT symbol,
         round(CAST(sum(CAST(round(x, 9) AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) + 0 AS mu
  FROM f GROUP BY 1
), d AS (
  SELECT f.symbol, f.date, round(f.x - m.mu, 6) + 0 AS d
  FROM f JOIN m ON f.symbol = m.symbol
), l AS (
  SELECT symbol, d,
         $lagCols
  FROM d WINDOW w AS (PARTITION BY symbol ORDER BY date)
), g AS (
  SELECT symbol,
         sum(CAST(round(d * d, 9) AS DECIMAL(30,12))) AS den,
         $aggCols
  FROM l GROUP BY 1
), u AS (
  $arms
)
SELECT symbol, lag, round(num / nullif(den, 0), 6) + 0 AS acf, n_terms
FROM u ORDER BY symbol, lag"""
  }

  /** Anchored VWAP (q177): the volume-weighted average price re-anchored at
    * each month start — the execution-quality benchmark price. The typical
    * price (high+low+close)/3 is weighted by integer daily volume; the
    * running numerator is an order-free decimal window sum, so the running
    * ratio is exact-operand IEEE on both engines.
    *
    * Scale shape: one exchange on (symbol) shared by the month-anchored
    * running frames; no second scan, no join.
    */
  def anchoredVwap(bars: DataFrame): DataFrame = {
    import graft.functions.Fx._
    val w = Window.partitionBy(col("symbol"), col("month")).orderBy("date")
      .rowsBetween(Window.unboundedPreceding, 0)
    bars
      .withColumn("month", date_format(col("date"), "yyyy-MM"))
      .withColumn("tp", round((col("high") + col("low") + col("close")) / 3.0, 6))
      .withColumn("pv", sum(round(col("tp") * col("volume"), 6).cast(dec)).over(w))
      .withColumn("vv", sum(col("volume")).over(w))
      .select(col("symbol"), dateStr(col("date")).as("date"), col("month"),
        rd(col("tp"), 6).as("typical_price"),
        rd(col("pv").cast("double") / nullIfZero(col("vv").cast("double")), 6)
          .as("vwap_anchored"),
        col("vv").cast("long").as("cum_volume"))
      .orderBy("symbol", "date")
  }

  /** The q177 oracle: same frames in DuckDB SQL. */
  def anchoredVwapOracleSql(barsPrefix: String): String =
    barsPrefix + """, b AS (
  SELECT symbol, date, strftime(date, '%Y-%m') AS month,
         round((high + low + close) / 3.0, 6) + 0 AS tp, volume
  FROM bars
), r AS (
  SELECT symbol, date, month, tp,
         sum(CAST(round(tp * volume, 6) AS DECIMAL(30,12))) OVER w AS pv,
         sum(volume) OVER w AS vv
  FROM b
  WINDOW w AS (PARTITION BY symbol, month ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT symbol, strftime(date, '%Y-%m-%d') AS date, month,
       round(tp, 6) + 0 AS typical_price,
       round(CAST(pv AS DOUBLE) / nullif(CAST(vv AS DOUBLE), 0), 6) + 0 AS vwap_anchored,
       CAST(vv AS BIGINT) AS cum_volume
FROM r ORDER BY symbol, date"""

  /** Seasonal-naive forecast backtest (q190): forecast close(d) =
    * close(d − 7 days) per symbol, evaluated wherever the lag exists —
    * the standard forecasting BASELINE every model must beat, plus the
    * accuracy metrics (MAE, MAPE, RMSE, bias) any backtest harness
    * reports.
    *
    * The 7-day lag is a calendar self-join on (symbol, date−7) — exact
    * date arithmetic, no window sort. Errors are single IEEE subtracts of
    * identical doubles; per-metric folds are round-at-9 decimal sums
    * (order-free; the per-symbol eval set is calendar-bounded, so the
    * scaled decimals stay far inside int64-exact double range).
    */
  def seasonalNaiveBacktest(bars: DataFrame): DataFrame = {
    import graft.functions.Fx._
    val b = bars.select(col("symbol"), col("date"), col("close"))
    val f = b.select(col("symbol"), date_add(col("date"), 7).as("date"),
      col("close").as("fc"))
    val ev = b.join(f, Seq("symbol", "date"))
      .withColumn("err", col("close") - col("fc"))
      .withColumn("ape", abs(col("err")) / col("close"))
    ev.groupBy("symbol")
      .agg(count(lit(1)).as("n_eval"),
        sum(round(abs(col("err")), 9).cast(dec)).as("sae"),
        sum(round(col("err"), 9).cast(dec)).as("se"),
        sum(round(col("err") * col("err"), 9).cast(dec)).as("sse"),
        sum(round(col("ape"), 9).cast(dec)).as("sape"))
      .select(col("symbol"), col("n_eval"),
        rd(col("sae").cast("double") / col("n_eval"), 6).as("mae"),
        rd(col("se").cast("double") / col("n_eval"), 6).as("bias"),
        rd(sqrt(col("sse").cast("double") / col("n_eval")), 6).as("rmse"),
        rd(col("sape").cast("double") / col("n_eval") * 100.0, 6).as("mape_pct"))
      .orderBy("symbol")
  }

  /** The q190 oracle: the same calendar join + decimal folds. */
  def seasonalNaiveBacktestOracleSql(barsPrefix: String): String =
    barsPrefix + """, ev AS (
  SELECT a.symbol, a.close - f.close AS err,
         abs(a.close - f.close) / a.close AS ape
  FROM bars a JOIN bars f
    ON a.symbol = f.symbol AND f.date + 7 = a.date
)
SELECT symbol, count(*) AS n_eval,
       round(CAST(sum(CAST(round(abs(err), 9) AS DECIMAL(30,12))) AS DOUBLE)
             / count(*), 6) + 0 AS mae,
       round(CAST(sum(CAST(round(err, 9) AS DECIMAL(30,12))) AS DOUBLE)
             / count(*), 6) + 0 AS bias,
       round(sqrt(CAST(sum(CAST(round(err * err, 9) AS DECIMAL(30,12))) AS DOUBLE)
             / count(*)), 6) + 0 AS rmse,
       round(CAST(sum(CAST(round(ape, 9) AS DECIMAL(30,12))) AS DOUBLE)
             / count(*) * 100.0, 6) + 0 AS mape_pct
FROM ev GROUP BY symbol ORDER BY symbol"""

  /** Longest win-streak per symbol (q198) — maximal runs of consecutive
    * positive-return days, the gaps-and-islands pattern in its purest form:
    * a run id is the prefix count of NON-positive days (it increments
    * exactly when a run breaks), so runs fall out of one window sum + one
    * aggregate. The best run ties break on earliest start. Everything is
    * integer counting and calendar dates — exact on any engine.
    *
    * Scale shape: the windows are keyed by symbol (one shuffle); the run
    * relation is calendar-bounded per symbol, so the ranking window is over
    * a tiny relation. A NULL first-day return counts as a break, matching
    * the oracle's CASE.
    */
  def winStreaks(fact: DataFrame): DataFrame = {
    import graft.functions.Fx._
    val w = Window.partitionBy("symbol").orderBy("date")
    val s = fact.select(col("symbol"), col("date"), col("variacao_diaria"))
      .withColumn("up", when(col("variacao_diaria") > 0, 1).otherwise(0))
      .withColumn("sid", sum(lit(1) - col("up")).over(w))
    val runs = s.filter(col("up") === 1)
      .groupBy("symbol", "sid")
      .agg(count(lit(1)).as("len"),
        min(col("date")).as("st"), max(col("date")).as("en"))
    val wr = Window.partitionBy("symbol").orderBy(col("len").desc, col("st"))
    runs.withColumn("rk", row_number().over(wr))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_runs"), sum(col("len")).as("up_days"),
        max(when(col("rk") === 1, col("len"))).as("best_len"),
        dateStr(max(when(col("rk") === 1, col("st")))).as("best_start"),
        dateStr(max(when(col("rk") === 1, col("en")))).as("best_end"))
      .orderBy("symbol")
  }

  /** The q198 oracle: identical run-id window over the shared fact CTE. */
  def winStreaksOracleSql(factPrefix: String): String =
    factPrefix + """, f AS (
  SELECT symbol, date,
         CASE WHEN variacao_diaria > 0 THEN 1 ELSE 0 END AS up
  FROM fact
), sgm AS (
  SELECT symbol, date, up,
         sum(1 - up) OVER (PARTITION BY symbol ORDER BY date
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
), runs AS (
  SELECT symbol, sid, count(*) AS len, min(date) AS st, max(date) AS en
  FROM sgm WHERE up = 1 GROUP BY 1, 2
), rk AS (
  SELECT symbol, len, st, en,
         row_number() OVER (PARTITION BY symbol ORDER BY len DESC, st) AS rk
  FROM runs
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(len) AS BIGINT) AS up_days,
       CAST(max(CASE WHEN rk = 1 THEN len END) AS BIGINT) AS best_len,
       strftime(max(CASE WHEN rk = 1 THEN st END), '%Y-%m-%d') AS best_start,
       strftime(max(CASE WHEN rk = 1 THEN en END), '%Y-%m-%d') AS best_end
FROM rk GROUP BY symbol ORDER BY symbol"""

  /** Holt's linear (double-exponential) smoothing + holdout backtest
    * (q208): the level+trend recursion
    *
    *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * fit on each symbol's bars minus the last `horizon` days, forecasting
    * l_T + h·b_T against the held-out week — and judged against the q190
    * seasonal-naive baseline on the same holdout (the comparison every
    * forecast must win to justify itself).
    *
    * The recursion is the q165 contract in BATCH form: the per-symbol
    * series is calendar-bounded, so the fold runs as an `aggregate` HOF
    * over the collected (rn, close) structs with state quantized at 6
    * decimals per step — the DuckDB oracle replays it as a RECURSIVE CTE
    * with the identical expressions, so the states are cross-engine exact.
    * The win/lose verdict compares EXACT decimal error sums, never floats.
    *
    * Scale shape: one keyed shuffle to per-symbol arrays (bars per symbol
    * = trading days, bounded at any SF); errors fold through round-9
    * decimals.
    */
  def holtBacktest(bars: DataFrame, horizon: Int = 7): DataFrame = {
    import graft.functions.Fx._
    // The ENTIRE recursion runs in exact DECIMAL arithmetic: halving a
    // 6-decimal state lands exactly on .5 round boundaries, where Spark's
    // round (shortest-repr) and DuckDB's (binary expansion) disagree by
    // one final-digit ulp — measured on this very query. Decimal ops have
    // no binary representation, so round-half-up is unambiguous; doubles
    // appear only at the published edges.
    val d6 = DecimalType(20, 6)
    def dlit(s: String) = lit(new java.math.BigDecimal(s))
    val half = dlit("0.5"); val quarter = dlit("0.25"); val threeQ = dlit("0.75")
    val w = Window.partitionBy("symbol").orderBy("date")
    val withRn = bars.select(col("symbol"), col("date"),
        round(col("close"), 6).cast(d6).as("close"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("symbol")))
      .withColumn("snaive", lag(col("close"), horizon).over(w))
    val train = withRn.filter(col("rn") <= col("n") - horizon)
    val fitted = train.groupBy("symbol")
      .agg(array_sort(collect_list(struct(col("rn"), col("close")))).as("xs"))
      .withColumn("n_train", size(col("xs")).cast("long"))
      .withColumn("st", aggregate(
        expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
        struct(
          element_at(col("xs"), 1).getField("close").cast(d6).as("l"),
          dlit("0").cast(d6).as("b")),
        (acc, x) => {
          val lNew = round(half * x.getField("close")
            + half * (acc.getField("l") + acc.getField("b")), 6).cast(d6)
          struct(lNew.as("l"),
            round(quarter * (lNew - acc.getField("l"))
              + threeQ * acc.getField("b"), 6).cast(d6).as("b"))
        }))
      .select(col("symbol"), col("n_train"),
        col("st.l").as("level"), col("st.b").as("trend"))
    val dec = DecimalType(30, 12)
    val holdout = withRn.filter(col("rn") > col("n") - horizon)
      .join(fitted, "symbol")
      .withColumn("h", col("rn") - col("n_train"))
      .withColumn("fc_holt", (col("level") + col("h") * col("trend")).cast(dec))
      .withColumn("e_holt", abs(col("close").cast(dec) - col("fc_holt")).cast(dec))
      .withColumn("e_snaive", abs(col("close") - col("snaive")).cast(dec))
    holdout.groupBy("symbol")
      .agg(max(col("n_train")).as("n_train"),
        rd(max(col("level")).cast("double"), 6).as("level"),
        rd(max(col("trend")).cast("double"), 6).as("trend"),
        count(lit(1)).as("n_eval"),
        sum(col("e_holt")).as("sae_holt"), sum(col("e_snaive")).as("sae_snaive"))
      .select(col("symbol"), col("n_train"), col("level"), col("trend"), col("n_eval"),
        rd(col("sae_holt").cast("double") / col("n_eval"), 6).as("mae_holt"),
        rd(col("sae_snaive").cast("double") / col("n_eval"), 6).as("mae_snaive"),
        when(col("sae_holt") < col("sae_snaive"), 1L).otherwise(0L).as("holt_wins"))
      .orderBy("symbol")
  }

  /** The q208 oracle: the identical DECIMAL recursion as a RECURSIVE CTE.
    * The recursive step restates lNew inside the trend update — identical
    * exact-decimal expressions, so the duplication is value-safe.
    */
  def holtBacktestOracleSql(barsPrefix: String, horizon: Int = 7): String = {
    val lNew = "CAST(round(CAST(0.5 AS DECIMAL(2,1)) * t.c" +
      " + CAST(0.5 AS DECIMAL(2,1)) * (r.l + r.bt), 6) AS DECIMAL(20,6))"
    "WITH RECURSIVE " + barsPrefix.stripPrefix("WITH ") + s""", bb AS (
  SELECT symbol, date, CAST(round(close, 6) AS DECIMAL(20,6)) AS c,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn,
         count(*) OVER (PARTITION BY symbol) AS n,
         CAST(round(lag(close, $horizon) OVER (PARTITION BY symbol ORDER BY date), 6)
           AS DECIMAL(20,6)) AS snaive
  FROM bars
), t AS (
  SELECT symbol, rn, c FROM bb WHERE rn <= n - $horizon
), r AS (
  SELECT symbol, rn, c AS l, CAST(0 AS DECIMAL(20,6)) AS bt
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.symbol, t.rn,
         $lNew,
         CAST(round(CAST(0.25 AS DECIMAL(3,2)) * ($lNew - r.l)
              + CAST(0.75 AS DECIMAL(3,2)) * r.bt, 6) AS DECIMAL(20,6))
  FROM t JOIN r ON t.symbol = r.symbol AND t.rn = r.rn + 1
), fit AS (
  SELECT r.symbol, r.rn AS n_train, r.l AS level, r.bt AS trend
  FROM r JOIN (SELECT symbol, max(rn) AS mx FROM r GROUP BY 1) m
    ON m.symbol = r.symbol AND m.mx = r.rn
), ho AS (
  SELECT bb.symbol, f.n_train, f.level, f.trend, bb.c, bb.snaive,
         bb.rn - f.n_train AS h
  FROM bb JOIN fit f ON f.symbol = bb.symbol
  WHERE bb.rn > bb.n - $horizon
), errs AS (
  SELECT symbol, n_train, level, trend,
         abs(CAST(c AS DECIMAL(30,12))
             - CAST(level + h * trend AS DECIMAL(30,12))) AS e_holt,
         CAST(abs(c - snaive) AS DECIMAL(30,12)) AS e_snaive
  FROM ho
)
SELECT symbol, CAST(max(n_train) AS BIGINT) AS n_train,
       round(CAST(max(level) AS DOUBLE), 6) + 0 AS level,
       round(CAST(max(trend) AS DOUBLE), 6) + 0 AS trend,
       CAST(count(*) AS BIGINT) AS n_eval,
       round(CAST(sum(e_holt) AS DOUBLE) / count(*), 6) + 0 AS mae_holt,
       round(CAST(sum(e_snaive) AS DOUBLE) / count(*), 6) + 0 AS mae_snaive,
       CAST(CASE WHEN sum(e_holt) < sum(e_snaive) THEN 1 ELSE 0 END AS BIGINT)
         AS holt_wins
FROM errs GROUP BY symbol ORDER BY symbol"""
  }
}
