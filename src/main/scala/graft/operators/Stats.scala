package graft.operators

import graft.functions.Fx._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-level statistical tests over the market view — the
  * drift/inequality diagnostics a data-quality or research pipeline runs
  * after the per-point checks (q10 gate, q77 outliers, q153 anomalies).
  *
  * Cross-engine exactness: both tests reduce to integer counting on a
  * published 6-decimal value grid (KS) or exact decimal revenue sums
  * (Gini); every ratio divides exact-operand doubles, so DuckDB and Spark
  * produce bit-identical statistics.
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov per symbol (q180): D = sup |F_s - F_rest|
    * between one symbol's daily-return distribution and the pooled rest —
    * the classic distribution-drift test.
    *
    * The ECDFs jump only at sample points, so D is an exact max over the
    * distinct-value grid: per-(symbol, value) and per-value counts, one
    * running sum per symbol over the shared grid, then
    * F_rest(v) = (N(<=v) - N_s(<=v)) / (N - n_s) — the rest-ECDF costs no
    * second scan. All ratios divide integer-valued doubles (< 2^53), so
    * both engines compare identical IEEE values.
    *
    * Scale shape: two hash aggregates over one scan (map-side combined);
    * the grid fan-out is symbols × distinct rounded returns — bounded by
    * the 6-decimal percent-change domain, NOT the row count — and the
    * running sums partition by symbol.
    */
  def ksPerSymbol(fact: DataFrame): DataFrame = {
    val vals = fact.filter(col("variacao_diaria").isNotNull)
      .select(col("symbol"), rd(col("variacao_diaria"), 6).as("v"))
    val per = vals.groupBy("symbol", "v").agg(count(lit(1)).as("c_s"))
    val tot = vals.groupBy("v").agg(count(lit(1)).as("c_all"))
    val ns = vals.groupBy("symbol").agg(count(lit(1)).as("n_s"))
    val nAll = vals.agg(count(lit(1)).as("n_all"))
    val grid = tot.crossJoin(broadcast(ns))
      .join(per, Seq("symbol", "v"), "left")
      .na.fill(0L, Seq("c_s"))
    val w = Window.partitionBy("symbol").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val diff = grid
      .withColumn("cum_s", sum(col("c_s")).over(w))
      .withColumn("cum_all", sum(col("c_all")).over(w))
      .crossJoin(broadcast(nAll))
      .withColumn("n_rest", col("n_all") - col("n_s"))
      .withColumn("diff", abs(
        col("cum_s").cast("double") / col("n_s")
          - (col("cum_all") - col("cum_s")).cast("double") / col("n_rest")))
    diff.groupBy("symbol")
      .agg(max(col("n_s")).as("n_s"), max(col("n_rest")).as("n_rest"),
        max(col("diff")).as("d_raw"))
      .select(col("symbol"), col("n_s"), col("n_rest"),
        rd(col("d_raw"), 6).as("d_stat"),
        rd(col("d_raw") * sqrt(
          col("n_s").cast("double") * col("n_rest") / (col("n_s") + col("n_rest"))),
          6).as("ks_scaled"))
      .orderBy("symbol")
  }

  /** The q180 oracle: identical counting/window arithmetic in DuckDB. */
  def ksOracleSql(factPrefix: String): String =
    factPrefix + """, f AS (
  SELECT symbol, round(variacao_diaria, 6) + 0 AS v
  FROM fact WHERE variacao_diaria IS NOT NULL
), per AS (SELECT symbol, v, count(*) AS c_s FROM f GROUP BY 1, 2),
tot AS (SELECT v, count(*) AS c_all FROM f GROUP BY 1),
ns AS (SELECT symbol, count(*) AS n_s FROM f GROUP BY 1),
na AS (SELECT count(*) AS n_all FROM f),
grid AS (
  SELECT ns.symbol, ns.n_s, tot.v, tot.c_all, coalesce(per.c_s, 0) AS c_s
  FROM tot CROSS JOIN ns
  LEFT JOIN per ON per.symbol = ns.symbol AND per.v = tot.v
), cum AS (
  SELECT symbol, n_s, v,
         sum(c_s) OVER w AS cum_s, sum(c_all) OVER w AS cum_all
  FROM grid
  WINDOW w AS (PARTITION BY symbol ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), d AS (
  SELECT symbol, n_s, na.n_all - n_s AS n_rest,
         abs(CAST(cum_s AS DOUBLE) / n_s
           - CAST(cum_all - cum_s AS DOUBLE) / (na.n_all - n_s)) AS diff
  FROM cum, na
)
SELECT symbol, CAST(max(n_s) AS BIGINT) AS n_s, CAST(max(n_rest) AS BIGINT) AS n_rest,
       round(max(diff), 6) + 0 AS d_stat,
       round(max(diff) * sqrt(CAST(max(n_s) AS DOUBLE) * max(n_rest)
             / (max(n_s) + max(n_rest))), 6) + 0 AS ks_scaled
FROM d GROUP BY symbol ORDER BY symbol"""

  /** Gini coefficient of per-customer revenue within each market segment
    * (q181) — the revenue-concentration audit. Customers with no orders
    * count at zero revenue.
    *
    *   G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))
    *
    * with x_i ascending. Ties on revenue are rank-order invariant: the
    * coefficient sum over a tied block is the same for any permutation
    * (identical x factors), so the (rev, custkey) tie-break only pins the
    * row_number, not the result. Revenue is cent-exact decimal; the rank
    * products stay exact in DECIMAL(38,2); the final ratio divides exact
    * operands.
    *
    * Scale shape: per-customer hash aggregate, then a per-segment rank —
    * the one per-partition sort; at 100 TB the q83 two-phase prefix-sum
    * pattern (range-partitioned rank) replaces the window without changing
    * the aggregate, which is already rank-product distributive.
    */
  def giniBySegment(orders: DataFrame, customer: DataFrame): DataFrame = {
    val cents = DecimalType(18, 2)
    val rev = orders.groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice"), 2).cast(cents)).as("rev"))
    val base = customer
      .select(col("c_custkey").as("custkey"), col("c_mktsegment").as("segment"))
      .join(rev, col("custkey") === col("o_custkey"), "left")
      .select(col("segment"), col("custkey"),
        coalesce(col("rev"), lit(java.math.BigDecimal.ZERO).cast(cents)).as("rev"))
    val w = Window.partitionBy("segment").orderBy(col("rev"), col("custkey"))
    val sRev = col("s_rev").cast("double")
    base.withColumn("i", row_number().over(w))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev").cast(DecimalType(38, 2))).as("s_rev"),
        sum((col("i") * col("rev")).cast(DecimalType(38, 2))).as("s_irev"))
      .select(col("segment"), col("n_customers"),
        rd(sRev, 2).as("total_rev"),
        rd((lit(2.0) * col("s_irev").cast("double")
            - (col("n_customers") + 1).cast("double") * sRev)
          / nullIfZero(col("n_customers").cast("double") * sRev), 6).as("gini"))
      .orderBy("segment")
  }

  /** The q181 oracle: same rank formula in DuckDB. */
  def giniOracleSql: String = """
WITH rev AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), base AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey AS custkey,
         coalesce(rev.rev, CAST(0 AS DECIMAL(18,2))) AS rev
  FROM customer c LEFT JOIN rev ON c.c_custkey = rev.o_custkey
), ranked AS (
  SELECT segment, rev,
         row_number() OVER (PARTITION BY segment ORDER BY rev, custkey) AS i
  FROM base
), g AS (
  SELECT segment, count(*) AS n,
         sum(CAST(rev AS DECIMAL(38,2))) AS s_rev,
         sum(CAST(i * rev AS DECIMAL(38,2))) AS s_irev
  FROM ranked GROUP BY 1
)
SELECT segment, CAST(n AS BIGINT) AS n_customers,
       round(CAST(s_rev AS DOUBLE), 2) + 0 AS total_rev,
       round((2.0 * CAST(s_irev AS DOUBLE)
              - CAST(n + 1 AS DOUBLE) * CAST(s_rev AS DOUBLE))
         / nullif(CAST(n AS DOUBLE) * CAST(s_rev AS DOUBLE), 0), 6) + 0 AS gini
FROM g ORDER BY segment"""

  /** CUPED variance reduction (q186) — the A/B-experiment adjustment:
    * per-user post-period purchase spend adjusted by the pre-period
    * engagement covariate,
    *
    *   y'_i = y_i - theta * (x_i - mean(x)),  theta = cov(x, y) / var(x)
    *
    * with theta pooled over all users (the standard CUPED estimator, which
    * leaves arm means unbiased). Arms are user_id % 2 — a deterministic
    * hash split.
    *
    * Exactness: values are cent-exact, so per-user covariates are exact
    * BIGINT cent sums and the pooled sufficient statistics are exact
    * int64 sums (cents^2 products stay < 2^53 per the gate data contract;
    * at sums beyond 2^53 the DECIMAL(38,0) + quantized-publication path
    * applies). theta and the global mean are PUBLISHED at 6 decimals
    * before the adjustment (the q162 quantize-first discipline), so the
    * arm-level arithmetic combines identical doubles.
    *
    * Scale shape: one scan → per-user hash aggregate; the pooled stats and
    * the 2-row arm relation are broadcast — no second scan of events.
    */
  def cuped(events: DataFrame, cutDate: String = "2024-01-15"): DataFrame = {
    val cut = to_date(lit(cutDate))
    val cents = round(col("value") * 100, 0).cast("long")
    val perUser = events.groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("date") < cut &&
          col("event_type").isin("click", "view"), cents)), lit(0L)).as("xc"),
        coalesce(sum(when(col("date") >= cut &&
          col("event_type") === "purchase", cents)), lit(0L)).as("yc"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val g = perUser.agg(count(lit(1)).as("n"),
      sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
      sum(col("xc") * col("xc")).as("sxx"), sum(col("xc") * col("yc")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val pooled = g.select(
      rd((d("n") * d("sxy") - d("sx") * d("sy"))
        / nullIfZero(d("n") * d("sxx") - d("sx") * d("sx")), 6).as("theta"),
      rd(d("sx") / 100.0 / col("n"), 6).as("mean_x_global"))
    perUser.groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum(col("xc")).as("sxa"), sum(col("yc")).as("sya"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("n_users"),
        rd(d("sxa") / 100.0 / col("n_users"), 6).as("mean_x"),
        rd(d("sya") / 100.0 / col("n_users"), 6).as("mean_y"),
        col("theta"), col("mean_x_global"))
      .withColumn("mean_y_adj",
        rd(col("mean_y") - col("theta") * (col("mean_x") - col("mean_x_global")), 6))
      .orderBy("arm")
  }

  /** The q186 oracle: identical cent counting + quantize-first combination
    * in DuckDB (events re-shaped exactly as `Tables.events`: date =
    * CAST(ts AS DATE)).
    */
  def cupedOracleSql(cutDate: String = "2024-01-15"): String = s"""
WITH pu AS (
  SELECT user_id,
         coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '$cutDate'
                            AND event_type IN ('click', 'view')
                           THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS xc,
         coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '$cutDate'
                            AND event_type = 'purchase'
                           THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS yc
  FROM events GROUP BY 1
), g AS (
  SELECT count(*) AS n, sum(xc) AS sx, sum(yc) AS sy,
         sum(xc * xc) AS sxx, sum(xc * yc) AS sxy
  FROM pu
), pooled AS (
  SELECT round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6) + 0 AS theta,
         round(CAST(sx AS DOUBLE) / 100.0 / n, 6) + 0 AS mean_x_global
  FROM g
), arms AS (
  SELECT user_id % 2 AS arm, count(*) AS n_users,
         sum(xc) AS sxa, sum(yc) AS sya
  FROM pu GROUP BY 1
), m AS (
  SELECT CAST(arm AS BIGINT) AS arm, CAST(n_users AS BIGINT) AS n_users,
         round(CAST(sxa AS DOUBLE) / 100.0 / n_users, 6) + 0 AS mean_x,
         round(CAST(sya AS DOUBLE) / 100.0 / n_users, 6) + 0 AS mean_y,
         theta, mean_x_global
  FROM arms, pooled
)
SELECT arm, n_users, mean_x, mean_y, theta, mean_x_global,
       round(mean_y - theta * (mean_x - mean_x_global), 6) + 0 AS mean_y_adj
FROM m ORDER BY arm"""

  /** Mutual information between customer market segment and order priority
    * (q189) — the categorical-dependence audit (feature redundancy, leakage
    * screening):
    *
    *   MI = sum_ij p_ij * ln(p_ij / (p_i * p_j))
    *
    * One broadcast join + one hash aggregate build the joint contingency
    * relation; margins, N, and the MI fold are windows over that BOUNDED
    * |segments| × |priorities| relation — never over orders. ln follows
    * the q82/q146 libm contract: rounded at 6 on the bounded-distinct
    * level BEFORE any sum, PMI products rounded at 9 and carried as
    * decimals.
    */
  def mutualInformation(orders: DataFrame, customer: DataFrame): DataFrame = {
    val dec = DecimalType(30, 12)
    val cells = orders
      .select(col("o_custkey").as("ck"), col("o_orderpriority").as("priority"))
      .join(broadcast(customer.select(col("c_custkey").as("ck"),
        col("c_mktsegment").as("segment"))), "ck")
      .groupBy("segment", "priority").agg(count(lit(1)).as("n_ij"))
    val wS = Window.partitionBy("segment")
    val wP = Window.partitionBy("priority")
    val wAll = Window.partitionBy(lit(1))
    val withP = cells
      .withColumn("n_i", sum(col("n_ij")).over(wS))
      .withColumn("n_j", sum(col("n_ij")).over(wP))
      .withColumn("n", sum(col("n_ij")).over(wAll))
      .withColumn("p_ij", col("n_ij").cast("double") / col("n"))
      .withColumn("pmi", rd(log(col("p_ij") /
        ((col("n_i").cast("double") / col("n"))
          * (col("n_j").cast("double") / col("n")))), 6))
      .withColumn("contrib", round(col("p_ij") * col("pmi"), 9).cast(dec))
    withP
      .withColumn("mi_total", rd(sum(col("contrib")).over(wAll).cast("double"), 6))
      .select(col("segment"), col("priority"), col("n_ij"),
        rd(col("p_ij"), 6).as("p_ij"), col("pmi"),
        rd(col("contrib").cast("double"), 6).as("contrib"), col("mi_total"))
      .orderBy("segment", "priority")
  }

  /** The q189 oracle: identical contingency windows + the ln contract. */
  def mutualInformationOracleSql: String = """
WITH cells AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         count(*) AS n_ij
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), m AS (
  SELECT segment, priority, n_ij,
         sum(n_ij) OVER (PARTITION BY segment) AS n_i,
         sum(n_ij) OVER (PARTITION BY priority) AS n_j,
         sum(n_ij) OVER () AS n
  FROM cells
), p AS (
  SELECT segment, priority, n_ij,
         CAST(n_ij AS DOUBLE) / n AS p_ij,
         round(ln((CAST(n_ij AS DOUBLE) / n)
           / ((CAST(n_i AS DOUBLE) / n) * (CAST(n_j AS DOUBLE) / n))), 6) + 0 AS pmi
  FROM m
), c2 AS (
  SELECT segment, priority, n_ij, p_ij, pmi,
         CAST(round(p_ij * pmi, 9) AS DECIMAL(30,12)) AS contrib
  FROM p
)
SELECT segment, priority, CAST(n_ij AS BIGINT) AS n_ij,
       round(p_ij, 6) + 0 AS p_ij, pmi,
       round(CAST(contrib AS DOUBLE), 6) + 0 AS contrib,
       round(CAST(sum(contrib) OVER () AS DOUBLE), 6) + 0 AS mi_total
FROM c2 ORDER BY segment, priority"""

  /** Theil–Sen robust trend (q191): the median of all pairwise slopes of
    * close over the per-symbol bar index — the breakdown-resistant
    * counterpart of the q162 OLS slope. The pair fan-out is bounded by the
    * CALENDAR (bars per symbol = trading days, independent of row scale),
    * so the quadratic step is constant-sized at any SF; the median is the
    * exact midpoint average over identical pairwise-slope doubles (each
    * ONE IEEE subtract-divide), matching DuckDB's interpolating median.
    */
  def theilSen(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("date")
    val r = bars.select(col("symbol"), col("date"), col("close"))
      .withColumn("rn", row_number().over(w))
    val pairs = r.as("a").join(r.as("b"),
        col("a.symbol") === col("b.symbol") && col("a.rn") < col("b.rn"))
      .select(col("a.symbol").as("symbol"),
        ((col("b.close") - col("a.close"))
          / (col("b.rn") - col("a.rn")).cast("double")).as("slope"))
    pairs.groupBy("symbol")
      .agg(count(lit(1)).as("n_pairs"),
        sort_array(collect_list(col("slope"))).as("sl"))
      .withColumn("m", size(col("sl")))
      .select(col("symbol"), col("n_pairs"),
        rd(when(col("m") % 2 === 1,
          element_at(col("sl"), ((col("m") + 1) / 2).cast("int")))
          .otherwise((element_at(col("sl"), (col("m") / 2).cast("int"))
            + element_at(col("sl"), (col("m") / 2 + 1).cast("int"))) / 2.0),
          6).as("theil_sen_slope"))
      .orderBy("symbol")
  }

  /** The q191 oracle: the literal pairwise-slope median in DuckDB. */
  def theilSenOracleSql(barsPrefix: String): String =
    barsPrefix + """, r AS (
  SELECT symbol, close,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM bars
), pairs AS (
  SELECT a.symbol, (b.close - a.close) / CAST(b.rn - a.rn AS DOUBLE) AS slope
  FROM r a JOIN r b ON a.symbol = b.symbol AND a.rn < b.rn
)
SELECT symbol, count(*) AS n_pairs,
       round(median(slope), 6) + 0 AS theil_sen_slope
FROM pairs GROUP BY symbol ORDER BY symbol"""

  /** Population Stability Index per event type (q196) — the standard ML
    * feature-drift monitor (alongside the q180 KS test, which answers
    * "did the distribution move" with a sup-norm; PSI answers it with the
    * symmetrized-KL bin fold the model-monitoring literature thresholds at
    * 0.1/0.25).
    *
    *   PSI = Σ_bins (p_b - q_b) · ln(p_b / q_b)
    *
    * Bins are FIXED-WIDTH on the value domain (q163 discipline — no
    * cross-engine quantile semantics in the cut points), densified to the
    * full grid so empty bins participate, and shares are Laplace-smoothed
    * (n + 0.5) / (N + bins/2) so the log is total — the standard practical
    * PSI. Counting is exact; each share is one divide of exact operands;
    * the ln goes through the q82/q189 round-6 contract and the fold through
    * round-9 decimal terms, so the published statistic is cross-engine
    * reproducible.
    *
    * Scale shape: one scan → (type, window, bin) hash aggregate (map-side
    * partial); the densified grid and the fold live on the bounded
    * types × bins relation. Nothing downstream of the first aggregate
    * scales with row count.
    */
  def psiDrift(events: DataFrame, splitTs: String = "2024-01-16",
               nBins: Int = 20, binWidth: Double = 25.0): DataFrame = {
    val dec = DecimalType(30, 12)
    val binned = events.filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("ts") < lit(splitTs).cast("timestamp")).as("is_ref"),
        greatest(least(floor(col("value") / binWidth), lit(nBins - 1L)), lit(0L))
          .cast("long").as("bin"))
    val counts = binned.groupBy("event_type", "bin")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
    val grid = binned.select("event_type").distinct()
      .withColumn("bin", explode(sequence(lit(0L), lit(nBins - 1L))))
    val dense = grid.join(counts, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val wT = Window.partitionBy("event_type")
    val half = nBins / 2.0
    dense
      .withColumn("t_ref", sum(col("n_ref")).over(wT))
      .withColumn("t_cur", sum(col("n_cur")).over(wT))
      .withColumn("p", (col("n_ref") + lit(0.5)) / (col("t_ref") + lit(half)))
      .withColumn("q", (col("n_cur") + lit(0.5)) / (col("t_cur") + lit(half)))
      .withColumn("term",
        round((col("p") - col("q")) * rd(log(col("p") / col("q")), 6), 9).cast(dec))
      .groupBy("event_type")
      .agg(max(col("t_ref")).as("n_ref"), max(col("t_cur")).as("n_cur"),
        rd(sum(col("term")).cast("double"), 6).as("psi"))
      .orderBy("event_type")
  }

  /** The q196 oracle: identical grid, smoothing, and ln/fold contracts. */
  def psiDriftOracleSql: String = """
WITH binned AS (
  SELECT event_type,
         ts < TIMESTAMP '2024-01-16' AS is_ref,
         greatest(least(CAST(floor("value" / 25.0) AS BIGINT), 19), 0) AS bin
  FROM events WHERE "value" IS NOT NULL
), counts AS (
  SELECT event_type, bin,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
  FROM binned GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, b.bin
  FROM (SELECT DISTINCT event_type FROM binned) t
  CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) b
), dense AS (
  SELECT g.event_type, g.bin,
         coalesce(c.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.bin = g.bin
), shares AS (
  SELECT event_type, n_ref, n_cur,
         sum(n_ref) OVER (PARTITION BY event_type) AS t_ref,
         sum(n_cur) OVER (PARTITION BY event_type) AS t_cur
  FROM dense
), terms AS (
  SELECT event_type, t_ref, t_cur,
         (n_ref + 0.5) / (t_ref + 10.0) AS p,
         (n_cur + 0.5) / (t_cur + 10.0) AS q
  FROM shares
)
SELECT event_type,
       CAST(max(t_ref) AS BIGINT) AS n_ref,
       CAST(max(t_cur) AS BIGINT) AS n_cur,
       round(CAST(sum(CAST(round((p - q) * (round(ln(p / q), 6) + 0), 9)
         AS DECIMAL(30,12))) AS DOUBLE), 6) + 0 AS psi
FROM terms GROUP BY event_type ORDER BY event_type"""

  /** Deterministic Poisson bootstrap CI for per-symbol mean daily return
    * (q209) — the SCALABLE bootstrap (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google 2012): instead of
    * resampling n rows with replacement (which needs global coordination),
    * each row independently receives a ~Poisson(1) multiplicity per
    * resample. Here the multiplicity is Binomial(8, 1/8) driven by md5 of
    * (symbol, rn, resample, trial) — a pure function of the data, so both
    * engines draw the SAME resamples and the whole procedure is
    * hash-exact; no RNG state anywhere.
    *
    * Per resample: multiplicity-weighted decimal mean (exact); per symbol:
    * the CI is positional over the B sorted resample means (5th/95th
    * percentile as exact order statistics). B and the trial count are
    * constants, so the fan-out is rows × B with one hash aggregate —
    * embarrassingly parallel at any corpus size.
    */
  def bootstrapCi(fact: DataFrame, b: Int = 50): DataFrame = {
    val dec = DecimalType(30, 12)
    val base = fact.filter(col("variacao_diaria").isNotNull)
      .select(col("symbol"), rd(col("variacao_diaria"), 6).as("v"),
        row_number().over(Window.partitionBy("symbol").orderBy("date"))
          .cast("long").as("rn"))
    val fan = base.withColumn("bi", explode(sequence(lit(0), lit(b - 1))))
    val mult = (0 until 8).map { j =>
      when(substring(md5(concat_ws("|", col("symbol"), col("rn"), col("bi"), lit(j))), 1, 1)
        .isin("0", "1"), 1L).otherwise(0L)
    }.reduce(_ + _)
    val means = fan.withColumn("m", mult)
      .groupBy("symbol", "bi")
      .agg(sum(round(col("v") * col("m"), 9).cast(dec)).as("s"), sum(col("m")).as("cnt"))
      .filter(col("cnt") > 0)
      .select(col("symbol"), (col("s").cast("double") / col("cnt")).as("mean_b"))
    val full = base.groupBy("symbol")
      .agg(count(lit(1)).as("n_days"),
        rd(sum(round(col("v"), 9).cast(dec)).cast("double") / count(lit(1)), 6)
          .as("mean_full"))
    means.groupBy("symbol")
      .agg(count(lit(1)).as("b_effective"),
        sort_array(collect_list(col("mean_b"))).as("ms"))
      .withColumn("lo_i", ceil(col("b_effective") * 0.05).cast("int"))
      .withColumn("hi_i", (col("b_effective") - ceil(col("b_effective") * 0.05) + 1).cast("int"))
      .select(col("symbol"), col("b_effective"),
        rd(element_at(col("ms"), col("lo_i")), 6).as("ci_lo"),
        rd(element_at(col("ms"), col("hi_i")), 6).as("ci_hi"))
      .join(full, "symbol")
      .select(col("symbol"), col("n_days"), col("b_effective"),
        col("mean_full"), col("ci_lo"), col("ci_hi"))
      .orderBy("symbol")
  }

  /** The q209 oracle: identical hash draws, means, and order statistics. */
  def bootstrapCiOracleSql(factPrefix: String, b: Int = 50): String = {
    val multSql = (0 until 8).map { j =>
      "CASE WHEN substr(md5(base.symbol || '|' || CAST(base.rn AS VARCHAR) || '|' || " +
        s"CAST(r.bi AS VARCHAR) || '|' || '$j'), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END"
    }.mkString(" + ")
    factPrefix + s""", base AS (
  SELECT symbol, round(variacao_diaria, 6) + 0 AS v,
         row_number() OVER (PARTITION BY symbol ORDER BY date) AS rn
  FROM fact WHERE variacao_diaria IS NOT NULL
), x AS (
  SELECT symbol, bi,
         sum(CAST(round(v * m, 9) AS DECIMAL(30,12))) AS s, sum(m) AS cnt
  FROM (SELECT base.symbol, base.v, r.bi, CAST($multSql AS BIGINT) AS m
        FROM base CROSS JOIN (SELECT unnest(range(0, $b)) AS bi) r) q
  GROUP BY 1, 2 HAVING sum(m) > 0
), mb AS (
  SELECT symbol, CAST(s AS DOUBLE) / cnt AS mean_b FROM x
), agg AS (
  SELECT symbol, count(*) AS be, list(mean_b ORDER BY mean_b) AS ms
  FROM mb GROUP BY 1
), fullm AS (
  SELECT symbol, count(*) AS n_days,
         round(CAST(sum(CAST(round(v, 9) AS DECIMAL(30,12))) AS DOUBLE)
               / count(*), 6) + 0 AS mean_full
  FROM base GROUP BY 1
)
SELECT a.symbol, CAST(f.n_days AS BIGINT) AS n_days,
       CAST(a.be AS BIGINT) AS b_effective, f.mean_full,
       round(ms[CAST(ceil(a.be * 0.05) AS INTEGER)], 6) + 0 AS ci_lo,
       round(ms[CAST(a.be - ceil(a.be * 0.05) + 1 AS INTEGER)], 6) + 0 AS ci_hi
FROM agg a JOIN fullm f ON f.symbol = a.symbol ORDER BY a.symbol"""
  }
}
