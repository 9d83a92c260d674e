package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled table layout so repeated large-large joins on the
  * same key pay zero exchanges at read time — the co-location lever for fact
  * joins too big to broadcast (SURVEY.md §4 / the 100 TB brief).
  */
class BucketingSpec extends SparkSpecBase {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_b LOCATION '$wh'")
    // disable broadcast so the join is sort-merge (the bucketed-layout case;
    // at real scale both sides are far beyond any broadcast threshold)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_b.orders_b")
      Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_b.lineitem_b")

      val joined = spark.table("graft_b.lineitem_b")
        .join(spark.table("graft_b.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read co-located buckets: the only exchange
      // allowed is the aggregation's
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joinSection.contains("SelectedBucketsCount") || joinSection.contains("Bucketed: true"),
        s"scan is not bucket-aware:\n$plan")

      // and it must produce the same result as the unbucketed join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP DATABASE IF EXISTS graft_b CASCADE")
    }
  }
}
