package graft

import graft.operators.Indicators

/** Truncated EWMA/MACD: exactness of the weight/normalizer construction and
  * agreement with a sequential per-series reference.
  */
class IndicatorsSpec extends SparkSpecBase {

  test("weights and norms are exactly-representable doubles") {
    // 0.75^j = 3^j / 4^j: reconstruct through BigDecimal and require
    // EXACT equality — these are the literals the oracle embeds
    // new java.math.BigDecimal(d) is the EXACT binary expansion (Scala's
    // BigDecimal(d) would round-trip the shortest string instead)
    def exact(d: Double) = BigDecimal(new java.math.BigDecimal(d))
    val w = Indicators.weights(0.75, Indicators.SlowWindow)
    w.zipWithIndex.foreach { case (d, j) =>
      assert(exact(d) == BigDecimal("0.75").pow(j), s"j=$j")
    }
    val n = Indicators.norms(0.75, Indicators.SlowWindow)
    val expect = w.scanLeft(BigDecimal(0))(_ + exact(_)).tail
    n.zip(expect).foreach { case (d, e) => assert(exact(d) == e) }
  }

  test("emaMacd agrees with a sequential per-series reference") {
    import graft.operators.MarketView
    val bars = MarketView.dailyBars(spark, sf)
      .select("symbol", "date", "close").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).map { case (s, rows) => s -> rows.sortBy(_._2) }

    def ref(closes: Seq[Double], decay: Double, window: Int): Seq[Double] =
      closes.indices.map { t =>
        val frame = closes.slice(math.max(0, t - window + 1), t + 1)
        val m = frame.size
        val terms = frame.zipWithIndex.map { case (x, i) =>
          BigDecimal(math.round(x * math.pow(decay, m - 1 - i) * 1e9) / 1e9)
        }
        val norm = Indicators.norms(decay, window)(m - 1)
        (terms.sum / BigDecimal(norm)).toDouble
      }

    val got = Indicators.emaMacd(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    bars.foreach { case (sym, rows) =>
      val closes = rows.map(_._3).toSeq
      val fast = ref(closes, Indicators.FastDecay, Indicators.FastWindow)
      val slow = ref(closes, Indicators.SlowDecay, Indicators.SlowWindow)
      rows.zipWithIndex.foreach { case ((_, d, _), t) =>
        val (gf, gs) = got((sym, d))
        assert(math.abs(gf - fast(t)) < 5e-7, s"$sym $d fast")
        assert(math.abs(gs - slow(t)) < 5e-7, s"$sym $d slow")
      }
    }
  }

  test("streaming recursive EMA (q165) equals the sequential quantized fold") {
    import graft.operators.MarketView
    def rd6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val bars = MarketView.dailyBars(spark, sf)
      .select("symbol", "date", "close").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1)
    val expected = bars.toSeq.flatMap { case (sym, rows) =>
      var prev = Double.NaN
      rows.sortBy(_._2).map { case (_, d, x) =>
        val e = if (prev.isNaN) rd6(x) else rd6(0.125 * x + 0.875 * prev)
        prev = e
        (sym, d) -> e
      }
    }.toMap
    val got = graft.streaming.StreamingOps.streamEmaParity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, e) =>
      assert(got(k) == e, s"$k: ${got(k)} != $e") // EXACT equality — the contract
    }
  }

  test("macd is the difference of the published (rounded) EMAs") {
    Indicators.emaMacd(spark, sf).collect().foreach { r =>
      val macd = BigDecimal(r.getDouble(2)) - BigDecimal(r.getDouble(3))
      assert(math.abs(macd.toDouble - r.getDouble(4)) < 1e-9, r.toString)
    }
  }
}
