package graft

import graft.operators.{Analytics, MarketView}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Date

/** ScalaCheck-generator properties for the semantic shims (SURVEY.md §5 test
  * plan). Generators are sampled with fixed seeds (no scalatestplus bridge in
  * the offline dependency set) — deterministic, still property-shaped.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val priceGen = Gen.chooseNum(1.0, 1000.0)

  test("pct-change of a constant series is 0 after the first row") {
    for ((p, n) <- samples(Gen.zip(priceGen, Gen.chooseNum(2, 12)), 5)) {
      val bars = (1 to n).map(i => ("X", Date.valueOf(f"2024-01-$i%02d"), p, 1L))
        .toDF("symbol", "date", "close", "volume")
      val vals = MarketView.withPctChange(bars)
        .select("variacao_diaria").collect().map(r => Option(r.get(0)))
      assert(vals.count(_.isEmpty) == 1)
      assert(vals.flatten.forall(v => math.abs(v.asInstanceOf[Double]) < 1e-9))
    }
  }

  test("stddev_samp is invariant under constant shift") {
    for ((xs, c) <- samples(Gen.zip(Gen.listOfN(8, priceGen), Gen.chooseNum(-50.0, 50.0)), 5)) {
      val base = xs.toDF("v").agg(stddev_samp(col("v"))).as[Double].head()
      val shifted = xs.map(_ + c).toDF("v").agg(stddev_samp(col("v"))).as[Double].head()
      assert(math.abs(base - shifted) < 1e-6)
    }
  }

  test("quality gate passes on any unique-key null-free bars") {
    for (n <- samples(Gen.chooseNum(1, 10), 5)) {
      val bars = (1 to n).map(i => (s"S$i", Date.valueOf("2024-01-01"), i.toDouble, 1L))
        .toDF("symbol", "date", "close", "volume")
      assert(Analytics.qualityGate(bars).head().getLong(2) == 1L)
    }
  }

  test("top-k is a prefix of the full ordering") {
    for (xs <- samples(Gen.listOfN(12, priceGen), 5)) {
      val df = xs.zipWithIndex.map { case (v, i) => (s"T$i", v) }.toDF("symbol", "v")
      val full = df.orderBy(col("v").desc, col("symbol").asc)
        .select("symbol").as[String].collect().toSeq
      val top3 = df.orderBy(col("v").desc, col("symbol").asc).limit(3)
        .select("symbol").as[String].collect().toSeq
      assert(full.take(3) == top3)
    }
  }

  test("CUSUM window reduction == the sequential recursive fold (q179 identity)") {
    // S_t = max(0, S_{t-1} + x_t) must equal P_t - min(0, running-min P)
    // where P is the prefix sum of x — on random series, in exact decimals
    val xGen = Gen.listOfN(40, Gen.chooseNum(-3.0, 3.0))
    for (xs <- samples(xGen, 8)) {
      val inc = xs.map(x => BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      // sequential definition
      val seqS = inc.scanLeft(BigDecimal(0)) { (s, x) => (s + x).max(0) }.tail
      // window reduction
      val p = inc.scanLeft(BigDecimal(0))(_ + _).tail
      val runmin = p.scanLeft(BigDecimal(0))(_ min _).tail
      val redS = p.zip(runmin).map { case (pt, mt) => pt - mt.min(0) }
      assert(seqS == redS)
    }
  }
}
