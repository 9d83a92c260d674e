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
}
