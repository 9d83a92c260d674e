// Round-13 100x sweep, part C: the batch span-cut cleaner AFTER the
// MV-probe rewrite (q214 now probes the persisted dup-shingle index like
// q220 instead of re-deriving it inline — the inline form tokenized the
// corpus twice). Sink-measured; first pass pays the index build if the MV
// is cold.
import org.apache.spark.sql.functions._
val dir = "/tmp/scale100"
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZS canary ${Seq(canary(),canary(),canary()).min}%.3f")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZS $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def sink(df: org.apache.spark.sql.DataFrame): Long = { val out = java.nio.file.Files.createTempDirectory("zs_sink"); try { df.write.mode("overwrite").parquet(out.toString); spark.read.parquet(out.toString).count() } finally { org.apache.commons.io.FileUtils.deleteDirectory(out.toFile) } }
time("q214_mv_spancut_sink", 3) { sink(graft.SparkEntry.queries("q214_span_cut")(spark, dir)) }
println(f"ZS canary_end ${Seq(canary(),canary(),canary()).min}%.3f")
println("ZS DONE")
sys.exit(0)
