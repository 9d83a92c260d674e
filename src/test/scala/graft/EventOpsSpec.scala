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

  test("peak concurrency: hand-computed sweep with same-ns cancellation and midnight carry") {
    val D = 86400000000000L // ns per day
    // u1 [100,200], u2 [150,150], u3 [201,201], u4 [D-1000, D+1000] (one
    // session spanning midnight: 2000 ns gap << 30 min)
    val ev = Seq(
      (1L, 100L, 1L), (1L, 200L, 2L),
      (2L, 150L, 3L),
      (3L, 201L, 4L),
      (4L, D - 1000L, 5L), (4L, D + 1000L, 6L)
    ).toDF("user_id", "ts_ns", "event_id")
    val out = EventOps.peakConcurrencyFrom(ev, gapMinutes = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // day 0 deltas: +1@100 +1@150 -1@151 0@201 (u3 start cancels u1 end+1)
    // -1@202 +1@(D-1000) -> running 1,2,1,1,0,1 -> peak 2, 6 delta points
    // day 1: carry-in 1 (u4 still open), -1@(D+1001) -> peak = carry = 1
    assert(out.toSeq == Seq(
      ("1970-01-01", 0L, 2L, 6L),
      ("1970-01-02", 1L, 1L, 1L)))
  }

  test("peak concurrency is partitioning-invariant") {
    val base = Tables.events(spark, sf)
    val a = EventOps.peakConcurrencyFrom(base.repartition(1), 30).collect().toSeq
    val b = EventOps.peakConcurrencyFrom(base.repartition(13), 30).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stickiness matches a brute-force per-day distinct window") {
    val ud = Tables.events(spark, sf).selectExpr("user_id", "date")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val days = byDay.keys.toSeq.sortBy(_.toEpochDay)
    val got = EventOps.stickiness(Tables.events(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    days.foreach { d =>
      val dau = byDay(d).size.toLong
      val wau = (0 to 6).flatMap(off =>
        byDay.getOrElse(d.minusDays(off.toLong), Set.empty[Long])).toSet.size.toLong
      val (gDau, gWau, st) = got(d.toString)
      assert(gDau == dau, s"$d dau")
      assert(gWau == wau, s"$d wau")
      assert(math.abs(st - dau.toDouble / wau) < 1e-6, s"$d stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
    assert(got.size == days.size)
  }

  test("settlementT2: weekend trades roll forward; settlement skips weekends") {
    // calendar fixture: Thu Jan 1 .. Sun Jan 11, 2004 (trading days:
    // Thu 1, Fri 2, Mon 5, Tue 6, Wed 7, Thu 8, Fri 9)
    val ev = (1 to 11).map { d =>
      (d.toLong, f"2004-01-$d%02d 10:00:00", 7000L + d,
        if (d % 2 == 0) "purchase" else "view", 10.0, "{}")
    }.toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props")
    val shaped = graft.sources.Tables.shapeEvents(ev)
    val out = EventOps.settlementT2(shaped).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // purchases on 2,4,6,8,10: Fri 2 -> +2 trading days = Tue 6;
    // Sun 4 rolls to Mon 5 -> Wed 7; Tue 6 -> Thu 8; Thu 8 -> +2 would be
    // Mon 12 (outside the observed calendar) -> UNSETTLED; Sat 10 finds no
    // next trading day inside the corpus at all -> UNSETTLED too
    assert(out.get("2004-01-06").contains(1L), out.toString)
    assert(out.get("2004-01-07").contains(1L), out.toString)
    assert(out.get("2004-01-08").contains(1L), out.toString)
    assert(out.get("UNSETTLED").contains(2L), out.toString)
    assert(out.values.sum == 5L, out.toString)
  }
}
