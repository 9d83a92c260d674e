// Round-19 OPTIMIZATION profiling harness: time queries individually
// (3 passes, min) in a bench-identical session with canary bracketing.
// Usage: see OPTIMIZATION_r19.md §Measurement protocol.
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("OPT_SF", "/root/testdata/sf0.1")
val passes = sys.env.getOrElse("OPT_PASSES", "3").toInt
val defaultQs = Seq(
  "q236_sym_merge_stream", "q217_sym_incremental", "q212_prefix_join",
  "q239_stream_multibench_decontam", "q165_stream_ema", "q87_stream_sessions",
  "q185_stream_late_drop", "q245_pq_durable", "q206_communities",
  "q232_sym_incremental_bucketed", "q144_bfs_rings",
  "q126_stream_session_timeout", "q235_multibench_decontam", "q248_pq_stream",
  "q98_copurchase_pagerank", "q127_edge_incremental", "q224_leak_safe_split")
val qs = sys.env.get("OPT_QS").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(defaultQs)
def canary(): Double = {
  val t0 = System.nanoTime()
  spark.range(0L, 10000000L, 1L, 32).selectExpr("(id*2654435761)%1000003 AS k", "id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count()
  (System.nanoTime() - t0) / 1e9
}
val sinkMeasured = Set(
  "q214_span_cut", "q220_stream_span_cut", "q222_benchmark_decontam",
  "q226_chunk_dedup_clean", "q228_novelty_curve", "q230_stream_decontam",
  "q235_multibench_decontam", "q239_stream_multibench_decontam")
val sinkDir = java.nio.file.Files.createTempDirectory("graft_opt_sink")
def act(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
  if (sinkMeasured(name)) df.write.mode("overwrite").parquet(sinkDir.resolve(name).toString)
  else { df.count(); () }
}
def runOne(q: String): Unit = {
  val fn = graft.SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
  try act(q, fn(spark, sf)) catch { case e: Throwable => println(s"PROF $q WARMUP_ERR $e") }
  val times = (1 to passes).map { _ =>
    val t0 = System.nanoTime()
    act(q, fn(spark, sf))
    (System.nanoTime() - t0) / 1e9
  }
  println(f"PROF $q min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
}
canary()
println(f"PROF canary ${canary()}%.3f")
qs.foreach(runOne)
println(f"PROF canary_end ${canary()}%.3f")
sys.exit(0)
