package graft

import graft.operators.Learn
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** GLM training loop: sequential-reference agreement, bitwise partitioning
  * invariance (the reproducibility contract), learning direction, gate
  * shape.
  */
class LearnSpec extends SparkSpecBase {
  import spark.implicits._

  private def sigmoid(z: Double): Double = 0.5 + (0.5 * z) / (1.0 + math.abs(z))

  /** The operator's exact chain, replayed sequentially on the driver:
    * per-row terms rounded at 9, EXACT BigDecimal accumulation, weight
    * update through the same round-at-6.
    */
  private def referenceGlm(rows: Seq[(Double, Double, Double, Double)],
                           iters: Int, lr: Double): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0, 0.0)
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    for (_ <- 1 to iters) {
      val sums = Array.fill(4)(BigDecimal(0))
      rows.foreach { case (y, x1, x2, x3) =>
        val z = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        val resid = y - sigmoid(z)
        sums(0) += r9(resid); sums(1) += r9(resid * x1)
        sums(2) += r9(resid * x2); sums(3) += r9(resid * x3)
      }
      w = Array.tabulate(4) { j =>
        BigDecimal(w(j) + lr * (sums(j).toDouble / rows.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w
  }

  private lazy val docs = Tables.documents(spark, sf)

  test("trainGlm matches the sequential reference on a synthetic set") {
    val data = (0 until 500).map { i =>
      val y = if (i % 3 == 0) 1.0 else 0.0
      (y, (i % 17) / 17.0, (i % 5) / 10.0, (i % 7) / 7.0)
    }
    val df = data.toDF("y", "x1", "x2", "x3")
    val got = Learn.trainGlm(df, iters = 3, lr = 2.0)
    val want = referenceGlm(data, iters = 3, lr = 2.0)
    assert(got.toSeq == want.toSeq)
  }

  test("weights are BITWISE identical under any partitioning") {
    val f = Learn.featurized(docs)
    val w1 = Learn.trainGlm(f.repartition(1), 3, 2.0)
    val w7 = Learn.trainGlm(f.repartition(7, col("lang")), 3, 2.0)
    val w16 = Learn.trainGlm(f.repartition(16), 3, 2.0)
    assert(w1.toSeq == w7.toSeq && w7.toSeq == w16.toSeq)
    assert(w1.exists(_ != 0.0)) // training moved off the origin
  }

  test("the classifier learns the label direction: en scores highest") {
    val out = Learn.glmQualityGate(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val others = out.view.filterKeys(_ != "en").values
    assert(out("en") > others.max,
      s"en=${out("en")} vs others=${others.toList.sorted}")
  }

  test("gate shape: per-lang rows carry the learned weights as constants") {
    val out = Learn.glmQualityGate(spark, sf)
    assert(out.columns.toSeq == Seq("lang", "n_docs", "mean_score",
      "n_flagged", "w_bias", "w_len", "w_dot", "w_space"))
    val rows = out.collect()
    assert(rows.map(_.getDouble(4)).distinct.length == 1) // same w on every row
    assert(rows.map(_.getLong(1)).sum == docs.count())
  }

  test("naiveBayes confusion matrix matches a sequential reference") {
    // Spark round(double, 6) goes through the shortest-repr BigDecimal
    def ln6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val joined = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("o_orderkey", "o_orderpriority", "c_mktsegment",
        "CAST(c_nationkey AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (test, train) = joined.partition(_._1 % 5 == 0)
    val n = train.length
    val dSeg = train.map(_._3).distinct.length
    val dNat = train.map(_._4).distinct.length
    val nC = train.groupBy(_._2).view.mapValues(_.length).toMap
    val segC = train.groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    val natC = train.groupBy(t => (t._2, t._4)).view.mapValues(_.length).toMap
    val classes = nC.keys.toSeq.sorted
    val expected = test.map { case (okey, actual, seg, nat) =>
      val best = classes.map { c =>
        val score = ln6(math.log(nC(c).toDouble / n)) +
          ln6(math.log((segC.getOrElse((c, seg), 0) + 1).toDouble / (nC(c) + dSeg))) +
          ln6(math.log((natC.getOrElse((c, nat), 0) + 1).toDouble / (nC(c) + dNat)))
        (c, score)
      }.sortBy { case (c, s) => (-s, c) }.head._1
      ((actual, best), okey)
    }.groupBy(_._1).view.mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val got = Learn.naiveBayes(Tables.orders(spark, sf), Tables.customer(spark, sf))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == test.length)
  }
}
