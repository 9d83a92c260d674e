package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed model training on the engine: a generalized linear quality
  * classifier fit by full-batch gradient descent, where each GD iteration is
  * ONE distributed aggregate (map-side partial sums, a k+1-value reduce to
  * the driver — the same driver-traffic shape as the IVF k-means loop in
  * [[Similarity]]). This is the canonical "train a fastText-style quality
  * filter over the corpus" step of an LLM data pipeline, expressed so the
  * 100 TB story holds: T iterations = T corpus scans, zero driver-side row
  * traffic, and the learned weights broadcast back into a pure codegen'd
  * scoring expression.
  *
  * Bit-reproducibility contract (what makes the whole training loop
  * hash-oracle-able cross-engine, and — the same property — bit-stable
  * across cluster re-runs at any partitioning):
  *
  *  - The activation is the Elliott sigmoid σ(z) = 0.5 + 0.5·z/(1+|z|)
  *    (Elliott 1993's NN squashing function): rational arithmetic only.
  *    IEEE 754 guarantees correctly-rounded +,−,×,÷,|·|, so σ is
  *    bit-identical on every conformant engine — unlike exp(), whose libm
  *    implementations differ by ulps between JVMs and C engines. No
  *    rounding contract has to paper over the activation.
  *  - Features are rational too (clipped length scale, '.' density,
  *    whitespace density): no ln/exp anywhere in the loop.
  *  - Per-row gradient terms are rounded at 1e-9 and accumulated as
  *    DECIMAL(30,12): a rounded-at-9 double sits within ~1e-16 of a
  *    1e-12 grid point, so the decimal cast is boundary-free and the sum
  *    is EXACT — order-independent across any shuffle/partition layout.
  *  - Weights are quantized to 6 decimals after each iteration (the same
  *    determinism device as the IVF centroid contract), so iteration i+1
  *    starts from bit-identical weights everywhere.
  */
object Learn {

  /** Rational per-doc features + proxy label over the documents corpus.
    * x1: clipped length scale, x2: '.' density, x3: whitespace density —
    * the cheap surface statistics quality filters actually start from.
    * Label: the doc's lang tag = 'en' (a deterministic proxy target; the
    * POINT is the training machinery, not the labeling policy).
    */
  def featurized(docs: DataFrame): DataFrame = docs.select(
    col("lang"),
    when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
    (least(col("n_chars"), lit(2000L)).cast("double") / 2000.0).as("x1"),
    ((length(col("text")) - length(expr("replace(text, '.', '')"))).cast("double")
      / (col("n_chars").cast("double") + 1.0)).as("x2"),
    ((length(col("text")) - length(expr("replace(text, ' ', '')"))).cast("double")
      / (col("n_chars").cast("double") + 1.0)).as("x3"))

  /** σ(z) with the exact parenthesization the oracle states. */
  private def elliott(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(0.5) + (lit(0.5) * z) / (lit(1.0) + abs(z))

  /** w·x with the exact left-assoc parenthesization the oracle states. */
  private def zOf(w: Array[Double]): org.apache.spark.sql.Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  private val acc = DecimalType(30, 12)

  /** Full-batch GD: T iterations from w=0, learning rate lr, weights
    * quantized at 6 decimals per iteration. Returns the final weights.
    */
  def trainGlm(features: DataFrame, iters: Int, lr: Double): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val resid = col("y") - elliott(zOf(w))
      // The weight update runs THROUGH Spark's round (not driver-side
      // BigDecimal): the gate has already proven Spark round ≡ DuckDB round
      // on doubles, so quantized weights are cross-engine identical — the
      // same device as Similarity's rd(avg, 6) centroid contract.
      val row = features.agg(
        count(lit(1)).as("n"),
        sum(round(resid, 9).cast(acc)).as("g0"),
        sum(round(resid * col("x1"), 9).cast(acc)).as("g1"),
        sum(round(resid * col("x2"), 9).cast(acc)).as("g2"),
        sum(round(resid * col("x3"), 9).cast(acc)).as("g3"))
        .select((0 until 4).map(j =>
          round(lit(w(j)) + lit(lr) * (col(s"g$j").cast("double") / col("n")), 6)
            .as(s"w$j")): _*)
        .head() // 4 scalars to the driver — the only driver traffic
      w = Array.tabulate(4)(row.getDouble)
    }
    w
  }

  /** Registered query: train (T=3, lr=2.0) on the documents corpus, then
    * score the corpus with the learned weights and report per-lang
    * calibration — the learned weights ride along as literal columns so the
    * oracle hash covers THEM too, not just the scores.
    */
  def glmQualityGate(spark: SparkSession, dir: String,
                     iters: Int = 3, lr: Double = 2.0): DataFrame = {
    val f = featurized(Tables.documents(spark, dir))
    val w = trainGlm(f, iters, lr)
    val score = elliott(zOf(w))
    f.withColumn("s", score)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        (round(sum(round(col("s"), 9).cast(acc)).cast("double") / count(lit(1)), 6)
          + lit(0.0)).as("mean_score"),
        sum(when(col("s") > 0.5, 1L).otherwise(0L)).as("n_flagged"))
      .select(col("lang"), col("n_docs"), col("mean_score"), col("n_flagged"),
        // + 0.0 folds a −0.000000x-rounded-to-−0.0 weight onto +0.0 on both
        // engines (the Fx.rd convention — parquet hashes them differently)
        (lit(w(0)) + lit(0.0)).as("w_bias"), (lit(w(1)) + lit(0.0)).as("w_len"),
        (lit(w(2)) + lit(0.0)).as("w_dot"), (lit(w(3)) + lit(0.0)).as("w_space"))
      .orderBy("lang")
  }
}
