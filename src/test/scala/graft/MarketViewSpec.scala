package graft

import graft.operators.{Analytics, MarketView}
import org.apache.spark.sql.functions._
import java.sql.Date

class MarketViewSpec extends SparkSpecBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // literal bar fixture: two symbols, with a zero close to exercise the guard
  private lazy val bars = Seq(
    ("A", d("2024-01-01"), 10.0, 100L),
    ("A", d("2024-01-02"), 12.0, 110L),
    ("A", d("2024-01-03"), 9.0, 120L),
    ("B", d("2024-01-01"), 0.0, 10L),
    ("B", d("2024-01-02"), 5.0, 20L)
  ).toDF("symbol", "date", "close", "volume")

  test("withPctChange: first row per ticker NULL; zero prev_close NULL; else exact") {
    val out = MarketView.withPctChange(bars)
      .select("symbol", "date", "variacao_diaria")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, Option(r.get(2)))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(out(0)._3.isEmpty)                                   // A first row
    assert(out(1)._3.contains(20.0))                            // (12-10)/10*100
    assert(out(2)._3.exists(v => math.abs(v.asInstanceOf[Double] - -25.0) < 1e-12))
    assert(out(3)._3.isEmpty)                                   // B first row
    assert(out(4)._3.isEmpty)                                   // prev close 0 -> NULL
  }

  test("dailyBars OHLCV: open=first, close=last by (ts_ns,event_id); volume=sum(k)") {
    val out = MarketView.dailyBars(spark, sf)
    val row = out.orderBy("symbol", "date").head()
    assert(out.columns.toSeq == Seq("symbol", "date", "open", "high", "low", "close", "volume"))
    // invariants: low <= open/close <= high on every bar
    val bad = out.filter(col("low") > col("high") ||
      col("open") < col("low") || col("open") > col("high") ||
      col("close") < col("low") || col("close") > col("high")).count()
    assert(bad == 0, s"OHLC invariant broken on $bad bars (first row was $row)")
  }

  test("weeklyVolatility buckets are Monday-start") {
    val fact = MarketView.withPctChange(bars)
    val weeks = Analytics.weeklyVolatility(fact).select("semana").distinct()
      .collect().map(_.getDate(0).toLocalDate)
    assert(weeks.nonEmpty)
    assert(weeks.forall(_.getDayOfWeek == java.time.DayOfWeek.MONDAY))
  }

  test("dimTempo: Postgres DOW convention 0=Sunday…6=Saturday") {
    val oneSunday = Seq(("A", d("2024-01-07"), 1.0, 1L), ("A", d("2024-01-08"), 1.0, 1L))
      .toDF("symbol", "date", "close", "volume")
    val out = Analytics.dimTempo(oneSunday)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("2024-01-07") == 0L) // Sunday
    assert(out("2024-01-08") == 1L) // Monday
  }

  test("qualityGate passes clean bars, fails on null close and duplicate keys") {
    assert(Analytics.qualityGate(bars).head().getLong(2) == 1L)
    val withNull = bars.unionByName(
      Seq(("C", d("2024-01-01"), Option.empty[Double], Option(5L))).toDF("symbol", "date", "close", "volume"))
    assert(Analytics.qualityGate(withNull).head().getLong(2) == 0L)
    val withDup = bars.unionByName(bars.limit(1))
    assert(Analytics.qualityGate(withDup).head().getLong(2) == 0L)
  }

  test("gapFillDailySupplier: dense 365-day panel per supplier, ffill carries the last observed price") {
    val out = Analytics.gapFillDailySupplier(spark, sf)
    val perSupp = out.groupBy("suppkey").agg(count(lit(1)).as("n"))
      .select("n").distinct().as[Long].collect()
    assert(perSupp.toSeq == Seq(365L), s"spine must be dense: $perSupp")
    // observed rows are exactly the is_filled = 0 rows
    val observed = graft.sources.Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1998)
      .select(col("l_suppkey"), col("l_shipdate").cast("date")).distinct().count()
    assert(out.filter(col("is_filled") === 0).count() == observed)
    // per-supplier ffill: a filled row carries the most recent observed price
    val one = out.filter(col("suppkey") === out.select("suppkey").head().getLong(0))
      .orderBy("day")
      .select("n_items", "price_filled")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    var last: Option[Double] = None
    one.foreach { case (n, p) =>
      if (n > 0) last = p
      else assert(p == last, s"filled row carries $p, expected $last")
    }
  }

  test("windowSuite: lead/lag@2/nth_value/cume_dist hand-computed on the fixture") {
    val out = Analytics.windowSuite(bars)
      .filter(col("symbol") === "A").orderBy("date")
      .collect().map(r => (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), r.getDouble(6)))
    // A closes: 10, 12, 9 on consecutive days
    assert(out(0)._1.contains(12.0) && out(1)._1.contains(9.0) && out(0)._2.isEmpty)
    assert(out(2)._2.contains(10.0))                  // lag@2 on day 3
    assert(out(0)._3.isEmpty)                         // nth_value(2): frame has 1 row
    assert(out(1)._3.contains(12.0) && out(2)._3.contains(12.0))
    // cume_dist over closes {9,10,12}: day1 close 10 -> 2/3
    assert(math.abs(out(0)._4 - math.round(2.0 / 3.0 * 1e6) / 1e6) < 1e-12)
  }

  test("rollingCorrelation: perfectly (anti-)correlated fixtures pin ±1; single-point frames NULL") {
    val fx = Seq(
      ("A", d("2024-01-01"), 1.0), ("A", d("2024-01-02"), 2.0), ("A", d("2024-01-03"), -1.0),
      ("B", d("2024-01-01"), 2.0), ("B", d("2024-01-02"), 4.0), ("B", d("2024-01-03"), -2.0),
      ("C", d("2024-01-01"), -1.0), ("C", d("2024-01-02"), -2.0), ("C", d("2024-01-03"), 1.0)
    ).toDF("symbol", "date", "variacao_diaria")
    val out = Analytics.rollingCorrelationFrom(fx, 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    // day 1: one point in the frame -> NULL everywhere
    assert(out(("A", "B", "2024-01-01")).isEmpty)
    // B = 2*A -> +1; C = -A -> -1 from day 2 on
    assert(out(("A", "B", "2024-01-02")).contains(1.0))
    assert(out(("A", "B", "2024-01-03")).contains(1.0))
    assert(out(("A", "C", "2024-01-02")).contains(-1.0))
    assert(out(("B", "C", "2024-01-03")).contains(-1.0))
    // real data: correlations bounded
    val bad = Analytics.rollingCorrelation(spark, sf)
      .filter(abs(col("corr30")) > 1.0 + 1e-9).count()
    assert(bad == 0)
  }

  test("weeklyFromPartials: merged sufficient statistics are value-identical to the direct weekly aggregation") {
    val viaPartials = Analytics.weeklyFromPartials(Analytics.dailyValuePartials(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), Option(r.get(5)))).toMap
    val direct = MarketView.quotes(spark, sf)
      .groupBy(col("symbol"),
        date_trunc("week", col("date")).cast("date").as("semana"))
      .agg(count(lit(1)).as("n_quotes"), countDistinct(col("date")).as("n_days"),
        graft.functions.Fx.rd(avg("value"), 6).as("mean_value"),
        graft.functions.Fx.rd(stddev_samp(col("value")), 6).as("std_value"))
      .select(col("symbol"), graft.functions.Fx.dateStr(col("semana")).as("semana"),
        col("n_quotes"), col("n_days"), col("mean_value"), col("std_value"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), Option(r.get(5)))).toMap
    assert(viaPartials.keySet == direct.keySet)
    viaPartials.foreach { case (k, v) =>
      assert(v == direct(k), s"partial-merge diverges from direct at $k: $v vs ${direct(k)}")
    }
  }
}
