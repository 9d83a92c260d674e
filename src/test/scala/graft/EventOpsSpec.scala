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

  test("lastTouchAttribution: in-window touch wins, stale touch and no-touch land in 'none'") {
    val events = Seq(
      // user 1: view 1000ns before the purchase -> attributed to view
      (1L, 1000L, 1L, "view"),
      (1L, 2000L, 2L, "purchase"),
      // user 2: click far outside the 1-minute window -> none
      (2L, 0L, 3L, "click"),
      (2L, 2L * M, 4L, "purchase"),
      // user 3: purchase with no touch at all -> none
      (3L, 500L, 5L, "purchase"),
      // user 4: click then view; view is the LATEST touch before purchase
      (4L, 100L, 6L, "click"),
      (4L, 200L, 7L, "view"),
      (4L, 300L, 8L, "purchase")
    ).toDF("user_id", "ts_ns", "event_id", "event_type")
    val out = EventOps.lastTouchAttributionFrom(events, windowMinutes = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("view") == ((2L, 2L)), s"got $out")
    assert(out("none") == ((2L, 2L)), s"got $out")
    assert(!out.contains("click"), s"stale click must not attribute: $out")
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

  test("unpivot(pivot(x)) recovers the long form with zero cells preserved") {
    val counts = SparkEntry.queries("q112_unpivot_weekly")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables.events(spark, sf)
      .groupBy(date_trunc("week", col("date")).cast("date").as("wk"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    // every direct cell appears; every remaining unpivoted cell is a zero fill
    direct.foreach { case (k, n) => assert(counts(k) == n, s"cell $k") }
    (counts.keySet -- direct.keySet).foreach { k => assert(counts(k) == 0L, s"cell $k") }
    assert(counts.size >= direct.size)
  }

  test("propsRollup parses k from JSON props") {
    val out = EventOps.propsRollup(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("sum_k").isNull).count() == 0)
  }
}
