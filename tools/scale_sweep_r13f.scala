// Round-13 100x sweep, part F: streaming mixture-budget admission (q227,
// real AvailableNow lifecycle — the cost IS the per-batch scoring
// projection + the sources-keyed state shuffle), shard novelty curve
// (q228, count-measured — the two vocabulary-keyed aggregates live under
// the count), and cell silhouette (q229, count-measured — the Lloyd
// training + ranked broadcast pass live under the count; k rows out).
import org.apache.spark.sql.functions._
val dir = "/tmp/scale100"
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZS canary ${Seq(canary(),canary(),canary()).min}%.3f")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZS $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def sink(df: org.apache.spark.sql.DataFrame): Long = { val out = java.nio.file.Files.createTempDirectory("zs_sink"); try { df.write.mode("overwrite").parquet(out.toString); spark.read.parquet(out.toString).count() } finally { org.apache.commons.io.FileUtils.deleteDirectory(out.toFile) } }
time("q227_stream_mixture_budget", 3) { graft.SparkEntry.queries("q227_stream_mixture_budget")(spark, dir).count() }
// q228 MUST be sink-measured: under a bare count() the aggregate-unique
// left join and the window prune away and the shingle work is eliminated
// (count becomes answerable from the shard census alone).
time("q228_novelty_curve_sink", 3) { sink(graft.SparkEntry.queries("q228_novelty_curve")(spark, dir)) }
time("q229_cell_silhouette", 3) { graft.SparkEntry.queries("q229_cell_silhouette")(spark, dir).count() }
println(f"ZS canary_end ${Seq(canary(),canary(),canary()).min}%.3f")
println("ZS DONE")
sys.exit(0)
