package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming flavors of the engine's event operators (SURVEY.md §2.9).
  *
  * The reference is batch-only — its daily Airflow schedule plus
  * truncate-reload is a hand-rolled micro-batch. These are the genuine
  * streaming twins over the same event schema, for pipelines where the
  * quote/event stream arrives continuously:
  *   - weekly tumbling aggregation == the materialized view's DATE_TRUNC
  *     bucketing, with a watermark bounding state
  *   - session windows == EventOps.sessionize, via the built-in session_window
  *   - custom running state == mapGroupsWithState where built-ins don't fit
  * All operators are micro-batch agnostic: state lives in the state store,
  * keyed and partitioned by the group key, so a 1000-executor cluster shards
  * state exactly like a shuffle.
  */
object StreamingOps {

  /** Weekly tumbling aggregate per event type. Watermark = 7 days: late rows
    * beyond one full bucket are dropped and state for closed windows is
    * evicted — without it, window state grows unboundedly.
    * Epoch (1970-01-01) was a Thursday; startTime "4 days" aligns buckets to
    * Monday 00:00 like date_trunc('week').
    */
  def weeklyTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "7 days")
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("date").as("semana"),
        col("event_type"), col("n_events"), col("n_users_approx"), col("sum_value"))

  /** Gap-based sessions: built-in session_window with a 30-min gap — the
    * streaming twin of EventOps.sessionize. Emits one row per closed session.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user profile
    * (event count + value sum) maintained across micro-batches. The pattern
    * slot for state no built-in aggregation expresses (decayed scores,
    * fraud windows, per-key ML features).
    */
  def runningUserStats(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserRunning(userId, n, s)
          state.update(next)
          next
      }
  }

  /** Production state backend: RocksDB state store — keyed state spills to
    * local disk instead of living on the executor heap, the difference
    * between "fits" and "OOM" for high-cardinality session/window state at
    * 100 TB. Call before starting stateful queries.
    */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Stream-static join: enrich a stream with a (small) static dimension.
    * The static side is broadcast per micro-batch — the streaming twin of the
    * engine's broadcast star joins; no state store involved.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** foreachBatch parquet sink: appends each micro-batch to a parquet table
    * partitioned by event date — the streaming write path that produces the
    * same layout the batch pipeline reads (partition pruning downstream).
    */
  def parquetSink(agg: DataFrame, outPath: String, checkpoint: String) =
    agg.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(outPath)
      }

  /** File-source entry point over the same parquet schema as the batch path:
    * the engine's batch queries re-point to a stream by swapping `read` for
    * `readStream` — the transformations are shared.
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }
}
