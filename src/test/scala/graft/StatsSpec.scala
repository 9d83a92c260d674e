package graft

import graft.operators.{Analytics, Learn, MarketView, Stats}
import graft.sources.Tables

/** Statistical-test + allocation operators: brute-force cross-checks of the
  * distributed formulations and the integer invariants the oracles rely on.
  */
class StatsSpec extends SparkSpecBase {

  test("KS statistic matches a brute-force two-sample ECDF computation") {
    val fact = MarketView.fact(spark, sf)
    val vals = fact.filter("variacao_diaria IS NOT NULL")
      .selectExpr("symbol", "round(variacao_diaria, 6) + 0 AS v").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val bySym = vals.groupBy(_._1)
    val got = Stats.ksPerSymbol(fact).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    bySym.foreach { case (sym, rows) =>
      val s = rows.map(_._2).sorted
      val rest = vals.filter(_._1 != sym).map(_._2).sorted
      val grid = (s ++ rest).distinct
      val d = grid.map { x =>
        math.abs(s.count(_ <= x).toDouble / s.length
          - rest.count(_ <= x).toDouble / rest.length)
      }.max
      val (n1, n2, dStat) = got(sym)
      assert(n1 == s.length && n2 == rest.length, sym)
      // engine publishes d_stat at 6 decimals
      assert(math.abs(dStat - d) <= 5.000001e-7, s"$sym: $dStat != $d")
      assert(dStat >= 0.0 && dStat <= 1.0)
    }
  }

  test("Gini matches a brute-force sorted-rank computation and is bounded") {
    val got = Stats.giniBySegment(Tables.orders(spark, sf), Tables.customer(spark, sf))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val rev = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS p")
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(x => BigDecimal(x._2)).sum }
    val segs = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    segs.groupBy(_._2).foreach { case (seg, custs) =>
      val xs = custs.map(c => rev.getOrElse(c._1, BigDecimal(0))).sorted
      val n = xs.length
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val g = ((2 * six - (n + 1) * sx) / (n * sx)).toDouble
      val (gn, gg) = got(seg)
      assert(gn == n, seg)
      assert(math.abs(gg - g) < 1e-5, s"$seg: $gg != $g")
      assert(gg >= 0.0 && gg <= 1.0, seg)
    }
  }

  test("penny allocation: per-order sums are exact, bumps bounded by 1 cent") {
    val rows = Analytics.pennyAllocationRows(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf)).collect()
    assert(rows.nonEmpty)
    val byOrder = rows.groupBy(_.getAs[Long]("ok"))
    byOrder.foreach { case (ok, items) =>
      val tc = items.head.getAs[Long]("tc")
      assert(items.map(_.getAs[Long]("alloc")).sum == tc, s"order $ok")
      items.foreach { r =>
        val d = r.getAs[Long]("alloc") - r.getAs[Long]("base")
        assert(d == 0L || d == 1L, s"order $ok line ${r.getAs[Long]("ln")}")
      }
      // monotone in quantity up to the 1-cent remainder bump
      items.sortBy(_.getAs[Long]("qty")).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getAs[Long]("base") >= a.getAs[Long]("base"))
        case _ => ()
      }
    }
  }

  test("stump split gain matches brute-force SSE reduction at every threshold") {
    val ys = Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_quantity AS BIGINT) AS q",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS yc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def sse(xs: Array[Long]): Double = {
      val s = xs.sum.toDouble; val n = xs.length
      xs.map(y => y.toDouble * y).sum - s * s / n
    }
    val parent = sse(ys.map(_._2))
    val got = Learn.stumpSplitGain(Tables.lineitem(spark, sf)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    val best = got.values.map(_._2).max
    got.foreach { case (t, (nl, gain, isBest)) =>
      val l = ys.filter(_._1 <= t).map(_._2)
      val r = ys.filter(_._1 > t).map(_._2)
      assert(nl == l.length, s"t=$t")
      val expect = (parent - sse(l) - sse(r)) / 10000.0
      // brute force sums y^2 in doubles (engine side is exact-int identity)
      assert(math.abs(gain - expect) / math.max(1.0, math.abs(expect)) < 1e-6,
        s"t=$t: $gain != $expect")
      assert((isBest == 1L) == (gain == best), s"t=$t")
    }
  }

  test("cuped: adjusted arm means preserve the pooled mean direction and theta is the OLS slope") {
    val out = Stats.cuped(Tables.events(spark, sf)).collect()
    assert(out.length == 2)
    val theta = out.head.getAs[Double]("theta")
    // brute-force the pooled OLS slope of yc on xc
    val rows = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "coalesce(sum(CASE WHEN date < DATE '2024-01-15' AND event_type IN ('click','view') THEN CAST(round(value*100,0) AS BIGINT) END), 0)").as("xc"),
        org.apache.spark.sql.functions.expr(
          "coalesce(sum(CASE WHEN date >= DATE '2024-01-15' AND event_type = 'purchase' THEN CAST(round(value*100,0) AS BIGINT) END), 0)").as("yc"))
      .collect().map(r => (r.getAs[Long]("xc").toDouble, r.getAs[Long]("yc").toDouble))
    val n = rows.length
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(t => t._1 * t._1).sum; val sxy = rows.map(t => t._1 * t._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(theta - slope) < 1e-5, s"$theta != $slope")
    // adjustment is exact at the published 6-decimal grid
    out.foreach { r =>
      val adj = (r.getAs[Double]("mean_y")
        - theta * (r.getAs[Double]("mean_x") - r.getAs[Double]("mean_x_global")))
      assert(math.abs(r.getAs[Double]("mean_y_adj") - adj) < 1e-6, r.toString)
    }
  }
}
