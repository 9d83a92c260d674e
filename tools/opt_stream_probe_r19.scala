// Micro-batch duration breakdown for a q87-shaped session gate.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
val dir = sys.env.getOrElse("OPT_SF", "/root/testdata/sf0.1")
def t[A](tag: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r }
// warm
t("warm_q87") { graft.SparkEntry.queries("q87_stream_sessions")(spark, dir).count() }
t("warm_q85") { graft.SparkEntry.queries("q85_stream_weekly")(spark, dir).count() }
def gateProbe(tag: String, agg: org.apache.spark.sql.DataFrame, mode: OutputMode): Unit = {
  val name = s"probe_$tag"
  val ckpt = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(sys.env.getOrElse("PROBE_CKPT_ROOT", "/tmp")), s"probe_ckpt_$tag")
  val t0 = System.nanoTime()
  val q = agg.writeStream.format("memory").queryName(name).option("checkpointLocation", ckpt.toString).outputMode(mode).trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  val t1 = System.nanoTime()
  q.stop()
  println(f"PHASE ${tag}_stream_wall ${(t1 - t0) / 1e9}%.3f")
  q.recentProgress.foreach { p =>
    println(s"PROGRESS $tag batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
    Option(p.stateOperators).foreach(_.foreach(so => println(s"  STATE $tag commitMs=${so.commitTimeMs} rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}")))
  }
  spark.catalog.dropTempView(name)
  org.apache.spark.sql.graft.SqlShim.unloadAllStateStores()
}
val ev = graft.streaming.StreamingOps.eventStream(spark, dir)
val agg87 = ev.withWatermark("ts", "30 minutes").groupBy(session_window(col("ts"), "30 minutes"), col("user_id")).agg(count(lit(1)).as("n_events"), sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6))).as("sum_dec"))
for (r <- 1 to 2) { gateProbe(s"q87like_r$r", agg87, OutputMode.Append()) }
val agg85 = ev.groupBy(window(col("ts"), "7 days", "7 days", "4 days"), col("event_type")).agg(count(lit(1)).as("n_events"), sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6))).as("sum_dec"))
for (r <- 1 to 2) { gateProbe(s"q85like_r$r", agg85, OutputMode.Complete()) }
sys.exit(0)
