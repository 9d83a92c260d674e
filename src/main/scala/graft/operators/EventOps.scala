package graft.operators

import graft.functions.Fx._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Event-stream operators in batch form (SURVEY.md §2.9): the reference's
  * weekly `DATE_TRUNC` aggregation is the batch twin of a 7-day tumbling
  * window; sessionization is the gap-window twin. The streaming flavors live
  * in graft.streaming.StreamingOps over the same schema.
  */
object EventOps {

  /** Tumbling weekly window per event type — batch equivalent of
    * `events.withWatermark("ts","...").groupBy(window($"ts","7 days"), $"event_type")`.
    */
  def weeklyTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("week", col("date")).cast(DateType).as("semana"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        exactSum(col("value")).as("sum_value"))
      .orderBy("event_type", "semana")

  /** Gap-based sessionization: a new session starts after >30 min of user
    * inactivity. Computed on the raw nanosecond longs — exact, no precision
    * loss. One shuffle (partition by user), then a window scan.
    */
  def userSessions(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionize(Tables.events(spark, dir), gapMinutes)

  /** Core sessionization over any (user_id, ts_ns, event_id) relation. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapNs = gapMinutes.toLong * 60L * 1000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts_ns").asc, col("event_id").asc)
    events
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Last-touch attribution: every purchase is attributed to the user's most
    * recent view/click at-or-before the purchase, provided it happened within
    * `windowMinutes`; purchases with no touch in the window land in the
    * 'none' bucket. The classic marketing-attribution join, expressed as the
    * engine's as-of operator ([[AsOf.asofJoin]] — one shuffle on user_id +
    * one running-frame window, never a per-purchase range scan).
    *
    * Determinism: touches are pre-deduplicated per (user, ts_ns) with a
    * max_by(event_id) tie-break so the carried touch is a pure function of
    * the data even if two touches share a nanosecond. All time arithmetic is
    * on the raw nanosecond longs.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String,
                           windowMinutes: Long = 1440L): DataFrame =
    lastTouchAttributionFrom(Tables.events(spark, dir), windowMinutes)

  def lastTouchAttributionFrom(ev: DataFrame, windowMinutes: Long): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .groupBy("user_id", "ts_ns")
      .agg(max(struct(col("event_id"), col("event_type")))
        .getField("event_type").as("touch_type"))
      // the as-of carries value columns only; the attribution window needs
      // the touch's own timestamp too, so it rides as a second value column
      .withColumn("touch_ts", col("ts_ns"))
    val winNs = windowMinutes * 60L * 1000000000L
    AsOf.asofJoin(purchases, touches, "user_id", "ts_ns",
        Seq("touch_type", "touch_ts"))
      .withColumn("attributed",
        when(col("asof_touch_ts").isNull ||
          col("ts_ns") - col("asof_touch_ts") > winNs, "none")
          .otherwise(col("asof_touch_type")))
      .groupBy("attributed")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("attributed")
  }

  /** F-ext: JSON props parsing + rollup (`get_json_object`-shaped access on
    * the `props` column, SURVEY.md §2.8 note).
    */
  def propsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // try_cast: malformed props degrade to NULL instead of failing the job
      // under ANSI mode (matches the oracle's TRY_CAST)
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        rd(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
}
