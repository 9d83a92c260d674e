package graft

import graft.operators.EventOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val M = 60L * 1000000000L // one minute in ns

  test("sessionize: gap >30min starts a new session; boundary gap does not") {
    val events = Seq(
      (7L, 0L * M, 1L),      // session 1
      (7L, 10L * M, 2L),     //   +10min
      (7L, 40L * M, 3L),     //   exactly 30min later -> same session
      (7L, 71L * M, 4L),     //   31min later -> session 2
      (8L, 0L * M, 5L)       // other user: own session
    ).toDF("user_id", "ts_ns", "event_id")
    val out = EventOps.sessionize(events, 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(7L) == ((2L, 4L)))
    assert(out(8L) == ((1L, 1L)))
  }

  test("weeklyTumbling: event counts are partitioned exactly (no loss/dup)") {
    val weekly = EventOps.weeklyTumbling(spark, sf)
    val total = weekly.agg(sum("n_events")).as[Long].head()
    assert(total == Tables.events(spark, sf).count())
  }

  test("weekly buckets are Monday-start dates") {
    val bad = EventOps.weeklyTumbling(spark, sf)
      .select(dayofweek(col("semana")).as("dow")).filter(col("dow") =!= 2).count()
    assert(bad == 0)
  }

  test("propsRollup parses k from JSON props") {
    val out = EventOps.propsRollup(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("sum_k").isNull).count() == 0)
  }
}
