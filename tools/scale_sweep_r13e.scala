// Round-13 100x sweep, part E: leakage-safe split (q224, sink-measured —
// the corpus ⟕ clusters join hangs off a unique doc_id key, so a bare
// count() could eliminate it), mixture-budget selection (q225,
// count-measured — scoring + segmented prefix sum live inside the eager
// localCheckpoint and the budgets join is inner), and the chunk-level
// dedup cleaner (q226, sink-measured — column pruning would strip the
// reassembly aggregate under a bare count of groups).
import org.apache.spark.sql.functions._
val dir = "/tmp/scale100"
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZS canary ${Seq(canary(),canary(),canary()).min}%.3f")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZS $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def sink(df: org.apache.spark.sql.DataFrame): Long = { val out = java.nio.file.Files.createTempDirectory("zs_sink"); try { df.write.mode("overwrite").parquet(out.toString); spark.read.parquet(out.toString).count() } finally { org.apache.commons.io.FileUtils.deleteDirectory(out.toFile) } }
time("q224_leak_split_sink", 3) { sink(graft.SparkEntry.queries("q224_leak_safe_split")(spark, dir)) }
time("q225_mixture_budget", 3) { graft.SparkEntry.queries("q225_mixture_budget_select")(spark, dir).count() }
time("q226_chunk_clean_sink", 3) { sink(graft.SparkEntry.queries("q226_chunk_dedup_clean")(spark, dir)) }
println(f"ZS canary_end ${Seq(canary(),canary(),canary()).min}%.3f")
println("ZS DONE")
sys.exit(0)
