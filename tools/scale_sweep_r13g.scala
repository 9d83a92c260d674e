// Round-13 re-baseline, part G1 (text family on the 32-file /tmp/scale100b
// corpus — see SCALING.md "single-row-group scan cap"): the same gates and
// measurement modes as the recorded 1-file history (sink where a count
// would eliminate the payload through the unique-key left join, count
// where the work lives inside an eager checkpoint or aggregate).
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZG canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZG $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def sink(df: org.apache.spark.sql.DataFrame): Long = { val out = java.nio.file.Files.createTempDirectory("zg_sink"); try { df.write.mode("overwrite").parquet(out.toString); spark.read.parquet(out.toString).count() } finally { org.apache.commons.io.FileUtils.deleteDirectory(out.toFile) } }
def q(n: String) = graft.SparkEntry.queries(n)(spark, dir)
time("q214_span_cut_sink", 2) { sink(q("q214_span_cut")) }
time("q222_decontam_sink", 2) { sink(q("q222_benchmark_decontam")) }
time("q223_token_budget", 2) { q("q223_token_budget_select").count() }
time("q224_leak_split_sink", 2) { sink(q("q224_leak_safe_split")) }
time("q225_mixture_budget", 2) { q("q225_mixture_budget_select").count() }
time("q228_novelty_curve", 2) { q("q228_novelty_curve").count() }
time("q97_dup_passages", 2) { q("q97_dup_passages").count() }
time("q212_prefix_join", 2) { q("q212_prefix_join").count() }
time("q213_domain_quota", 2) { q("q213_domain_quota").count() }
time("q218_psl_quota", 2) { q("q218_psl_domain_quota").count() }
println(f"ZG canary_end ${Seq(canary(),canary()).min}%.3f")
println("ZG DONE")
sys.exit(0)
