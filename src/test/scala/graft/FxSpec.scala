package graft

import graft.functions.Fx._
import org.apache.spark.sql.functions._

class FxSpec extends SparkSpecBase {
  import spark.implicits._

  test("rd rounds and normalizes -0.0 to +0.0") {
    val out = Seq(-0.0000001, 1.23456789, -0.0).toDF("x")
      .select(rd(col("x"), 4).as("r")).as[Double].collect()
    assert(out.toSeq == Seq(0.0, 1.2346, 0.0))
    // bit-exact +0.0, not -0.0 (hash-compare would differ)
    assert(java.lang.Double.doubleToLongBits(out(0)) == 0L)
  }

  test("nanToNull maps NaN to NULL, keeps values") {
    val out = Seq(Double.NaN, 1.5).toDF("x")
      .select(nanToNull(col("x")).as("r")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(1.5)))
  }

  test("stddev_samp of a 1-row group is NaN in Spark; nanToNull fixes parity") {
    val out = Seq(("a", 1.0), ("b", 1.0), ("b", 3.0)).toDF("k", "v")
      .groupBy("k").agg(nanToNull(stddev_samp(col("v"))).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").isEmpty)               // 1-row group -> NULL, not NaN
    assert(out("b").exists(s => math.abs(s.asInstanceOf[Double] - math.sqrt(2.0)) < 1e-12))
  }

  test("nullIfZero guards division by zero") {
    val out = Seq((1.0, 0.0), (4.0, 2.0)).toDF("n", "d")
      .select((col("n") / nullIfZero(col("d"))).as("q"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(2.0)))
  }

  test("exactSum is order-independent (decimal accumulation)") {
    val xs = (1 to 10000).map(i => 0.1 * (i % 7))
    val a = xs.toDF("x").select(exactSum(col("x"))).as[Double].head()
    val b = xs.reverse.toDF("x").repartition(13).select(exactSum(col("x"))).as[Double].head()
    assert(a == b)
  }
}
