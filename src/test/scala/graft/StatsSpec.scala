package graft

import graft.operators.{Analytics, Learn, MarketView, Stats}
import graft.sources.Tables
import org.apache.spark.sql.functions.col

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

  test("PSI: non-negative, zero for an identical split, matches brute force") {
    val out = Stats.psiDrift(Tables.events(spark, sf)).collect()
    assert(out.nonEmpty)
    // every PSI term (p-q)·ln(p/q) is non-negative, so the fold is too
    out.foreach(r => assert(r.getAs[Double]("psi") >= 0.0, r.toString))

    // brute force from raw rows, same bins/smoothing/rounding
    val raw = Tables.events(spark, sf)
      .selectExpr("event_type",
        "ts < TIMESTAMP '2024-01-16' AS is_ref",
        "least(CAST(floor(value / 25.0) AS BIGINT), 19L) AS bin")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (et, rows) =>
      val ref = rows.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val cur = rows.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val tR = ref.values.sum; val tC = cur.values.sum
      val psi = (0L until 20L).map { b =>
        val p = (ref.getOrElse(b, 0L) + 0.5) / (tR + 10.0)
        val q = (cur.getOrElse(b, 0L) + 0.5) / (tC + 10.0)
        BigDecimal((p - q) * (math.rint(math.log(p / q) * 1e6) / 1e6))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val got = out.find(_.getString(0) == et).get.getAs[Double]("psi")
      assert(math.abs(got - psi) < 2e-6, s"$et: $got != $psi")
    }

    // identical windows => PSI == 0 exactly (p == q in every bin)
    import spark.implicits._
    val sym = (0 until 200).flatMap { i =>
      Seq(("a", "2024-01-10 00:00:00", i % 7 * 30.0),
        ("a", "2024-01-20 00:00:00", i % 7 * 30.0))
    }.toDF("event_type", "s", "value")
      .selectExpr("event_type", "CAST(s AS TIMESTAMP) AS ts", "value")
    val z = Stats.psiDrift(sym).collect()
    assert(z.length == 1 && z.head.getAs[Double]("psi") == 0.0)
  }

  test("ABC classification partitions the catalog and respects the cuts") {
    val li = Tables.lineitem(spark, sf)
    val out = Analytics.abcClassification(li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute force: sequential cumsum over the sorted catalog
    val rev = li.selectExpr("l_partkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (pk, r) => (-r, pk) }
    val total = rev.map(_._2).sum
    var cum = 0L
    val classed = rev.map { case (pk, r) =>
      cum += r
      val cls = if (cum * 100 <= total * 80) "A"
                else if (cum * 100 <= total * 95) "B" else "C"
      (cls, pk, r)
    }
    classed.groupBy(_._1).foreach { case (cls, rows) =>
      val (n, cents, ck) = out(cls)
      assert(n == rows.size, s"$cls n")
      assert(cents == rows.map(_._3).sum, s"$cls cents")
      assert(ck == rows.map(_._2).sum, s"$cls checksum")
    }
    assert(out.values.map(_._1).sum == rev.size)
    assert(out.values.map(_._2).sum == total)
  }

  test("bootstrap CI matches a sequential replay of the hash draws") {
    val fact = MarketView.fact(spark, sf)
    val base = fact.filter("variacao_diaria IS NOT NULL")
      .selectExpr("symbol", "round(variacao_diaria, 6) + 0 AS v",
        "row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2).toLong))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = Stats.bootstrapCi(fact).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    base.groupBy(_._1).foreach { case (sym, rows) =>
      val means = (0 until 50).flatMap { bi =>
        var s = BigDecimal(0); var cnt = 0L
        rows.foreach { case (_, v, rn) =>
          val m = (0 until 8).count { j =>
            val h = md5hex(s"$sym|$rn|$bi|$j")
            h.head == '0' || h.head == '1'
          }
          cnt += m
          s += BigDecimal(v * m).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        if (cnt > 0) Some(s.toDouble / cnt) else None
      }.sorted
      val be = means.length
      val lo = means(math.ceil(be * 0.05).toInt - 1)
      val hi = means(be - math.ceil(be * 0.05).toInt)
      val (nDays, gBe, meanFull, gLo, gHi) = got(sym)
      assert(nDays == rows.length, sym)
      assert(gBe == be, sym)
      assert(math.abs(gLo - lo) < 1e-6, s"$sym lo $gLo != $lo")
      assert(math.abs(gHi - hi) < 1e-6, s"$sym hi $gHi != $hi")
      assert(gLo <= gHi && gLo <= meanFull + 1.0)
    }
  }

  test("banded ntile equals SQL ntile for every k and ragged n") {
    import spark.implicits._
    // 37 rows, ragged against every k in 2..7; duplicate metric values to
    // exercise the tie-break; negative ordinals to exercise band flooring
    val rows = (1 to 37).map(i => (i.toLong, ((i * 7) % 12 - 5).toLong))
      .toDF("id", "m")
    for (k <- 2 to 7) {
      val got = Analytics.ntileTiles(rows, col("m"), col("id"), k, 3L, "tile")
        .select("id", "tile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = rows.selectExpr("id", s"ntile($k) OVER (ORDER BY m, id) AS t")
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      assert(got == exp, s"k=$k")
    }
    // n < k: every row lands in its own leading tile
    val tiny = Seq((1L, 5L), (2L, 3L)).toDF("id", "m")
    val t = Analytics.ntileTiles(tiny, col("m"), col("id"), 5, 3L, "tile")
      .select("id", "tile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(2L -> 1L, 1L -> 2L))
  }

  test("RFM segments: census partitions the customer base; scores bounded") {
    val out = Analytics.rfmSegments(Tables.orders(spark, sf)).collect()
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_.getLong(3)).sum == nCust)
    out.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 1 && r.getLong(i) <= 5, r.toString))
    }
  }
}
