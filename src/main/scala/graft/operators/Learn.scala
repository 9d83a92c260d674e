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

  private val dec = DecimalType(30, 12)

  /** Leave-one-out target encoding (q182): the categorical-feature
    * construction GBDT/linear pipelines use — each row's category is
    * replaced by the mean target of the OTHER rows in that category,
    * enc_i = (S_c - y_i) / (n_c - 1), which removes the self-leakage a
    * plain group mean has.
    *
    * One hash aggregate builds per-category (n, S) with S an order-free
    * decimal sum; the encoding pass re-joins those ~|categories| rows by
    * broadcast, so the big relation is scanned twice with NO shuffle on
    * the second pass. The gate publishes per-category audit rows (count,
    * target mean, and an order-free decimal checksum + min/max of the
    * row-level encodings), so every row's encoding is hash-verified
    * without a row-sized result.
    */
  def looTargetEncoding(lineitem: DataFrame, part: DataFrame): DataFrame = {
    import graft.functions.Fx._
    // Integer-cent arithmetic end to end: prices are cent-exact, so the
    // per-category sum is an exact BIGINT and (S - y)/(n - 1) is a chain of
    // exact-operand IEEE ops on BOTH engines. A DECIMAL(30,12) sufficient
    // statistic would be exact too, but its int128-scaled cast to double is
    // NOT correctly rounded in every engine (measured: 1-ulp quotient skew
    // flipped one round-at-6 boundary at sf0.01) — the cents grid keeps
    // every intermediate under 2^53 where conversions are exact.
    val rows = lineitem
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("yc"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand").as("brand"))),
        col("l_partkey") === col("p_partkey"))
    val stats = rows.groupBy("brand")
      .agg(count(lit(1)).as("n"), sum(col("yc")).as("sc"))
    rows.join(broadcast(stats), "brand")
      .withColumn("enc",
        when(col("n") > 1,
          rd((col("sc") - col("yc")).cast("double") / 100.0 / (col("n") - 1), 6))
          .otherwise(lit(null).cast("double")))
      .groupBy("brand")
      .agg(max(col("n")).as("n_rows"),
        max(rd(col("sc").cast("double") / 100.0 / col("n"), 6)).as("avg_target"),
        sum(col("enc").cast(DecimalType(20, 6))).as("enc_sum"),
        min(col("enc")).as("enc_min"), max(col("enc")).as("enc_max"))
      .select(col("brand"), col("n_rows"), col("avg_target"),
        rd(col("enc_sum").cast("double"), 6).as("enc_sum"),
        col("enc_min"), col("enc_max"))
      .orderBy("brand")
  }

  /** The q182 oracle: identical integer-cent arithmetic in DuckDB. */
  def looTargetEncodingOracleSql: String = """
WITH rows_ AS (
  SELECT p.p_brand AS brand,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS yc
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), stats AS (
  SELECT brand, count(*) AS n, sum(yc) AS sc
  FROM rows_ GROUP BY 1
), enc AS (
  SELECT r.brand, s.n, s.sc,
         CASE WHEN s.n > 1 THEN
           round(CAST(s.sc - r.yc AS DOUBLE) / 100.0 / (s.n - 1), 6) + 0
         END AS enc
  FROM rows_ r JOIN stats s ON r.brand = s.brand
)
SELECT brand, CAST(max(n) AS BIGINT) AS n_rows,
       max(round(CAST(sc AS DOUBLE) / 100.0 / n, 6) + 0) AS avg_target,
       round(CAST(sum(CAST(enc AS DECIMAL(20,6))) AS DOUBLE), 6) + 0 AS enc_sum,
       min(enc) AS enc_min, max(enc) AS enc_max
FROM enc GROUP BY brand ORDER BY brand"""

  /** Per-dimension feature–label Pearson correlation over the embedding
    * corpus (q183) — the feature-selection ranking pass. One posexplode
    * scan feeds a 64-group map-side-combined aggregate of the six
    * sufficient statistics (all order-free decimal sums of single-IEEE-op
    * products: float→double casts are exact and float×smallint products
    * fit a double mantissa), so both engines derive the identical
    * correlation from identical operands.
    */
  def featureLabelCorr(embeddings: DataFrame): DataFrame = {
    import graft.functions.Fx._
    val x = embeddings
      .select(col("label").cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim").cast("long").as("dim"), col("xf").cast("double").as("x"), col("y"))
    val g = x.groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(round(col("x"), 9).cast(dec)).as("sx"),
      sum(round(col("x") * col("x"), 9).cast(dec)).as("sxx"),
      sum(round(col("y"), 9).cast(dec)).as("sy"),
      sum(round(col("y") * col("y"), 9).cast(dec)).as("syy"),
      sum(round(col("x") * col("y"), 9).cast(dec)).as("sxy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("sxy") - d("sx") * d("sy")
    val den = sqrt(n * d("sxx") - d("sx") * d("sx")) *
      sqrt(n * d("syy") - d("sy") * d("sy"))
    g.select(col("dim"), col("n"), rd(num / nullIfZero(den), 6).as("corr"))
      .withColumn("abs_corr", abs(col("corr")))
      .orderBy(col("abs_corr").desc, col("dim"))
  }

  /** The q183 oracle: q143's unnest/subscript lockstep expansion + the same
    * sufficient-statistics arithmetic.
    */
  def featureLabelCorrOracleSql: String = """
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(label AS DOUBLE) AS y
  FROM embeddings
), g AS (
  SELECT dim, count(*) AS n,
         sum(CAST(round(x, 9) AS DECIMAL(30,12))) AS sx,
         sum(CAST(round(x * x, 9) AS DECIMAL(30,12))) AS sxx,
         sum(CAST(round(y, 9) AS DECIMAL(30,12))) AS sy,
         sum(CAST(round(y * y, 9) AS DECIMAL(30,12))) AS syy,
         sum(CAST(round(x * y, 9) AS DECIMAL(30,12))) AS sxy
  FROM x GROUP BY dim
), c AS (
  SELECT dim, n,
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0), 6) + 0 AS corr
  FROM g
)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n, corr,
       abs(corr) AS abs_corr
FROM c ORDER BY abs_corr DESC, dim"""

  /** Regression-stump split finding (q187) — the inner loop of histogram
    * GBDT (LightGBM-style): for every candidate threshold t on l_quantity,
    * the variance-reduction gain of splitting l_extendedprice at
    * quantity <= t,
    *
    *   gain(t) = S_L^2/n_L + S_R^2/n_R - S^2/N
    *
    * (the sum-of-squares identity: the Sum(y^2) term cancels from the SSE
    * difference, so no squared-target statistic is needed). One hash
    * aggregate bins the scan into per-quantity (n, S) with S an exact
    * BIGINT cent sum; the candidate sweep is a running sum over the
    * BOUNDED distinct-value relation (50 rows) — exactly the histogram
    * trick that makes split finding scan-bound at 100 TB. Cent sums stay
    * < 2^53, so every cast and the gain arithmetic are exact-operand IEEE
    * on both engines.
    */
  def stumpSplitGain(lineitem: DataFrame): DataFrame = {
    import graft.functions.Fx._
    import org.apache.spark.sql.expressions.Window
    val bins = lineitem
      .select(col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("yc"))
      .groupBy("q")
      .agg(count(lit(1)).as("n_q"), sum(col("yc")).as("s_q"))
    val w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    val tot = bins.agg(sum(col("n_q")).as("n_tot"), sum(col("s_q")).as("s_tot"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    bins
      .withColumn("n_l", sum(col("n_q")).over(w))
      .withColumn("s_l", sum(col("s_q")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("n_r", col("n_tot") - col("n_l"))
      .withColumn("s_r", col("s_tot") - col("s_l"))
      .filter(col("n_r") > 0)
      .withColumn("gain",
        rd((d(col("s_l")) * col("s_l") / col("n_l")
          + d(col("s_r")) * col("s_r") / col("n_r")
          - d(col("s_tot")) * col("s_tot") / col("n_tot")) / 10000.0, 6))
      .withColumn("is_best",
        (col("gain") === max(col("gain")).over(
          Window.partitionBy(lit(1)))).cast("long"))
      .select(col("q").as("threshold"), col("n_l").as("n_left"),
        col("n_r").as("n_right"), col("gain"), col("is_best"))
      .orderBy("threshold")
  }

  /** The q187 oracle: identical histogram sweep in DuckDB. */
  def stumpSplitGainOracleSql: String = """
WITH bins AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, count(*) AS n_q,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS s_q
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(n_q) AS n_tot, sum(s_q) AS s_tot FROM bins),
cum AS (
  SELECT q, sum(n_q) OVER w AS n_l, sum(s_q) OVER w AS s_l
  FROM bins
  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), g AS (
  SELECT q, n_l, tot.n_tot - n_l AS n_r, s_l, tot.s_tot - s_l AS s_r,
         tot.n_tot, tot.s_tot
  FROM cum, tot WHERE tot.n_tot - n_l > 0
), sc AS (
  SELECT q, n_l, n_r,
         round((CAST(s_l AS DOUBLE) * s_l / n_l
                + CAST(s_r AS DOUBLE) * s_r / n_r
                - CAST(s_tot AS DOUBLE) * s_tot / n_tot) / 10000.0, 6) + 0 AS gain
  FROM g
)
SELECT q AS threshold, CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
       gain, CAST(CASE WHEN gain = (SELECT max(gain) FROM sc) THEN 1 ELSE 0 END AS BIGINT) AS is_best
FROM sc ORDER BY threshold"""

  /** Categorical Naive Bayes (q200): train on a deterministic 80% order
    * split, score the held-out 20%, publish the confusion matrix — the
    * counting-only classifier that complements the q134 gradient-descent
    * GLM. Label = order priority; features = the customer's market segment
    * and nation.
    *
    * Training IS one grouped count per feature (fully distributed,
    * map-side combinable); Laplace-smoothed likelihoods live on bounded
    * (class × feature-domain) relations that broadcast to the scoring
    * join. Each log term goes through the q82 ln round-6 contract and the
    * three terms add as exact decimals, so argmax (ties → class ASC)
    * picks the same class on any engine.
    *
    * Scale shape: scoring fans each test row out by |classes| (a constant)
    * against broadcast likelihood tables; the argmax window is keyed by
    * order key over that constant fan-out. Feature values unseen in
    * training fall back to the smoothed zero-count likelihood via the
    * left-join coalesce — no row is dropped.
    */
  def naiveBayes(orders: DataFrame, customer: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(20, 6)
    def ln6(c: org.apache.spark.sql.Column) =
      graft.functions.Fx.rd(log(c), 6).cast(dec)

    val cust = customer.select(col("c_custkey").as("ck"),
      col("c_mktsegment").as("seg"), col("c_nationkey").cast("long").as("nat"))
    // no broadcast hint: the customer dimension scales with the corpus —
    // AQE broadcasts while it fits and falls back to a keyed shuffle join
    // past the threshold (the only 100 TB-correct default)
    val rows = orders.select(col("o_orderkey").as("okey"),
        col("o_custkey").as("ck"), col("o_orderpriority").as("label"))
      .join(cust, "ck")
      .withColumn("is_test", col("okey") % 5 === 0)
    val train = rows.filter(!col("is_test"))

    val scalars = train.agg(countDistinct(col("seg")).as("d_seg"),
      countDistinct(col("nat")).as("d_nat"), count(lit(1)).as("n"))
    val classes = train.groupBy("label").agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(scalars))
      .withColumn("lp_prior", ln6(col("n_c").cast("double") / col("n")))

    def likelihood(feature: String, domain: String) = {
      val cnt = train.groupBy("label", feature).agg(count(lit(1)).as("cf"))
      classes.select(col("label"), col("n_c"), col(domain))
        .crossJoin(broadcast(train.select(feature).distinct()))
        .join(cnt, Seq("label", feature), "left")
        .na.fill(0L, Seq("cf"))
        .withColumn("lp",
          ln6((col("cf") + 1).cast("double") / (col("n_c") + col(domain))))
        .select(col("label").as("cand"), col(feature), col("lp"))
    }
    val segLik = likelihood("seg", "d_seg")
    val natLik = likelihood("nat", "d_nat")

    val cand = classes.select(col("label").as("cand"), col("lp_prior"),
      col("n_c"), col("d_seg"), col("d_nat"))
    val scored = rows.filter(col("is_test"))
      .select(col("okey"), col("label").as("actual"), col("seg"), col("nat"))
      .crossJoin(broadcast(cand))
      .join(broadcast(segLik.withColumnRenamed("lp", "lp_seg")), Seq("cand", "seg"), "left")
      .join(broadcast(natLik.withColumnRenamed("lp", "lp_nat")), Seq("cand", "nat"), "left")
      .withColumn("score",
        col("lp_prior")
          + coalesce(col("lp_seg"), ln6(lit(1.0) / (col("n_c") + col("d_seg"))))
          + coalesce(col("lp_nat"), ln6(lit(1.0) / (col("n_c") + col("d_nat")))))
    val w = Window.partitionBy("okey").orderBy(col("score").desc, col("cand"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n"), sum(col("okey")).as("okey_checksum"))
      .orderBy("actual", "predicted")
  }

  /** The q200 oracle: identical split, smoothing, ln contract, argmax. */
  def naiveBayesOracleSql: String = """
WITH rws AS (
  SELECT o.o_orderkey AS okey, o.o_orderpriority AS label,
         c.c_mktsegment AS seg, CAST(c.c_nationkey AS BIGINT) AS nat,
         o.o_orderkey % 5 = 0 AS is_test
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), train AS (SELECT * FROM rws WHERE NOT is_test),
sc AS (
  SELECT count(DISTINCT seg) AS d_seg, count(DISTINCT nat) AS d_nat,
         count(*) AS n
  FROM train
), pri AS (
  SELECT label, count(*) AS n_c,
         (SELECT d_seg FROM sc) AS d_seg, (SELECT d_nat FROM sc) AS d_nat,
         CAST(round(ln(CAST(count(*) AS DOUBLE) / (SELECT n FROM sc)), 6) + 0
           AS DECIMAL(20,6)) AS lp_prior
  FROM train GROUP BY label
), seg_cnt AS (SELECT label, seg, count(*) AS cf FROM train GROUP BY 1, 2),
seg_lik AS (
  SELECT p.label AS cand, s.seg,
         CAST(round(ln(CAST(coalesce(c.cf, 0) + 1 AS DOUBLE)
             / (p.n_c + p.d_seg)), 6) + 0 AS DECIMAL(20,6)) AS lp_seg
  FROM pri p
  CROSS JOIN (SELECT DISTINCT seg FROM train) s
  LEFT JOIN seg_cnt c ON c.label = p.label AND c.seg = s.seg
), nat_cnt AS (SELECT label, nat, count(*) AS cf FROM train GROUP BY 1, 2),
nat_lik AS (
  SELECT p.label AS cand, v.nat,
         CAST(round(ln(CAST(coalesce(c.cf, 0) + 1 AS DOUBLE)
             / (p.n_c + p.d_nat)), 6) + 0 AS DECIMAL(20,6)) AS lp_nat
  FROM pri p
  CROSS JOIN (SELECT DISTINCT nat FROM train) v
  LEFT JOIN nat_cnt c ON c.label = p.label AND c.nat = v.nat
), scored AS (
  SELECT t.okey, t.label AS actual, p.label AS cand,
         p.lp_prior
         + coalesce(sl.lp_seg,
             CAST(round(ln(1.0 / (p.n_c + p.d_seg)), 6) + 0 AS DECIMAL(20,6)))
         + coalesce(nl.lp_nat,
             CAST(round(ln(1.0 / (p.n_c + p.d_nat)), 6) + 0 AS DECIMAL(20,6)))
           AS score
  FROM (SELECT * FROM rws WHERE is_test) t
  CROSS JOIN pri p
  LEFT JOIN seg_lik sl ON sl.cand = p.label AND sl.seg = t.seg
  LEFT JOIN nat_lik nl ON nl.cand = p.label AND nl.nat = t.nat
), pred AS (
  SELECT okey, actual, cand,
         row_number() OVER (PARTITION BY okey ORDER BY score DESC, cand) AS rk
  FROM scored
)
SELECT actual, cand AS predicted, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(okey) AS BIGINT) AS okey_checksum
FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY actual, predicted"""
}
