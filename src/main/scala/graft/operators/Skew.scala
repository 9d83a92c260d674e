package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * Spark's partial (map-side) aggregation already bounds skew for algebraic
  * aggregates, and AQE splits skewed shuffle-join partitions at runtime.
  * Two shapes still need explicit salting:
  *   - exact distinct counts per key (partials can't combine: the same value
  *     seen by two mappers must not count twice), and
  *   - shuffle joins whose hot key exceeds what AQE can split (it can split a
  *     partition, not a single key's row group on the build side).
  */
object Skew {

  /** Exact per-key distinct count with bounded skew. Salting by hash(value)
    * keeps distinct-counts additive — a value lands in exactly one salt
    * bucket, so per-bucket exact distincts sum to the key's exact distinct.
    * The hot key's work spreads across `saltFactor` reducers.
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__c"))
      .groupBy(col(key)).agg(sum(col("__c")).as("n_distinct"))

  /** Skew-safe equi-join: the probe side gets a per-row salt, the build side
    * is replicated once per salt value, and the join key becomes (key, salt) —
    * a hot key's rows spread over `saltFactor` partitions instead of one.
    * Build-side cost: ×saltFactor rows (use only when the build side is small
    * but too big / too hot to broadcast).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
