// Round-13 100x sweep, part B: the post-bench additions — q220 streaming
// span-cut cleaner (per-batch cleaning against the standing shingle-df
// index MV) and q221 incremental shingle-df maintenance (delta-additive
// index refresh vs the full-corpus rebuild oracle). Also times the batch
// cleaner with a REAL SINK (count() alone lets Catalyst eliminate the
// left-joined clean subtree entirely — see SCALING.md's q214/q220 note).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r13b.scala
import org.apache.spark.sql.functions._
val dir = "/tmp/scale100"
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZS canary ${Seq(canary(),canary(),canary()).min}%.3f")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZS $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def sink(df: org.apache.spark.sql.DataFrame): Long = { val out = java.nio.file.Files.createTempDirectory("zs_sink"); try { df.write.mode("overwrite").parquet(out.toString); spark.read.parquet(out.toString).count() } finally { org.apache.commons.io.FileUtils.deleteDirectory(out.toFile) } }
time("q214_batch_spancut_sink", 3) { sink(graft.SparkEntry.queries("q214_span_cut")(spark, dir)) }
time("q220_stream_spancut", 3) { graft.SparkEntry.queries("q220_stream_span_cut")(spark, dir).count() }
time("q221_shingle_df_incr", 3) { graft.SparkEntry.queries("q221_shingle_df_incremental")(spark, dir).count() }
println(f"ZS canary_end ${Seq(canary(),canary(),canary()).min}%.3f")
println("ZS DONE")
sys.exit(0)
