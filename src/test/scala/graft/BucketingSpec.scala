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

  test("bucketed standing MV: merge-keyed join plans zero base-side exchange and zero base-side sort") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: at standing-index scale neither side of
    // the merge join is broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // report the per-bucket sort order from the scan (one file per bucket —
    // the layout bucketedMvPath guarantees); off, Spark re-sorts the base
    // side per task even though the files are sorted
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val src = java.nio.file.Paths.get(sf, "lineitem.parquet")
      val baseRows = Seq((1L, 2L, 3L, 2L), (1L, 3L, 1L, 2L),
        (2L, 1L, 3L, 1L), (3L, 1L, 1L, 1L), (5L, 6L, 2L, 1L))
      // nBuckets = shuffle.partitions so the delta aggregate's own exchange
      // is already co-partitioned with the buckets (the deployment rule)
      val base = Tables.bucketedMv(spark, src, "bkt_spec_sym", 4,
        Seq("u", "v"), Seq("u", "v"), refresh = true) {
        baseRows.toDF("u", "v", "w", "deg_u")
      }
      val delta = Seq((1L, 2L, 5L), (4L, 1L, 1L), (1L, 2L, 2L))
        .toDF("u", "v", "dw").groupBy("u", "v")
        .agg(sum(col("dw")).as("dw"))
      val joined = base.join(delta, Seq("u", "v"), "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"base scan is not bucket-aware:\n$plan")
      // exactly ONE hash exchange in the whole plan — the delta
      // aggregate's; the base is read co-located
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
        s"base side of the merge join shuffles:\n$plan")
      // and exactly ONE sort — the delta side's; the base buckets are
      // written one file per bucket, so the scan reports the sort order
      assert("\\bSort \\[".r.findAllIn(plan).length == 1,
        s"base side of the merge join re-sorts:\n$plan")

      // value parity: catalog read-back ≡ plain path read, and the join
      // result matches the unbucketed join
      val mvPath = Tables.bucketedMvPath(spark, src, "bkt_spec_sym", 4,
        Seq("u", "v"), Seq("u", "v"))(sys.error("must be published"))
      val plain = spark.read.parquet(mvPath.toString)
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(key(base) == key(plain))
      assert(key(joined) == key(plain.join(delta, Seq("u", "v"), "left")))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("bucketed MV refresh: republish under the SAME fingerprint drops the stale catalog entry; later reads serve the fresh publish without rebuilding") {
    import spark.implicits._
    val src = java.nio.file.Paths.get(sf, "orders.parquet")
    val a = Tables.bucketedMv(spark, src, "bkt_spec_refresh", 4,
      Seq("k"), Seq("k"), refresh = true) { Seq((1L, "a")).toDF("k", "v") }
    assert(a.as[(Long, String)].collect().toSet == Set((1L, "a")))
    // refresh with the same source fingerprint replaces the files in place;
    // the session catalog entry over the OLD file listing must not survive
    val b = Tables.bucketedMv(spark, src, "bkt_spec_refresh", 4,
      Seq("k"), Seq("k"), refresh = true) { Seq((1L, "b"), (2L, "c")).toDF("k", "v") }
    assert(b.as[(Long, String)].collect().toSet == Set((1L, "b"), (2L, "c")))
    // a plain read is a cache hit: the build closure must never run
    val c = Tables.bucketedMv(spark, src, "bkt_spec_refresh", 4,
      Seq("k"), Seq("k")) { sys.error("must not rebuild on a published MV") }
    assert(c.as[(Long, String)].collect().toSet == Set((1L, "b"), (2L, "c")))
  }
}
