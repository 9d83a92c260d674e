// Round-14 sweep C: the text/selection family on the 32-file corpus —
// (4) q223/q225 narrow-pin floor cut, (5) q231 full-PSL matcher at 9.5k
// rules, (6/7) decontamination via the fingerprinted cut-set MV, batch
// (sink-measured) and streaming, (8) q234 drift monitor.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZI canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String, passes: Int)(f: => org.apache.spark.sql.DataFrame): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/$tag"); println(f"ZI $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZI $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def q(n: String) = graft.SparkEntry.queries(n)(spark, dir)
// selection floor (r13 count baselines: q223 52.4, q225 53.8)
time("q223_token_budget", 2) { q("q223_token_budget_select").count() }
time("q225_mixture_budget", 2) { q("q225_mixture_budget_select").count() }
println(f"ZI canary_mid1 ${Seq(canary(),canary()).min}%.3f")
// PSL: subset baseline vs the full 9.5k-rule matcher + IDN staging
time("q218_psl_subset", 2) { q("q218_psl_domain_quota").count() }
time("q231_psl_full", 3) { q("q231_psl_full_domain_quota").count() }
// decontamination: one-time cut-set MV build, then the MV-probe batch form
// (sink-measured; r13 inline baseline 26.0 s) and the streaming twin
time("bench_shingles_mv_once", 1) { graft.operators.TextOps.benchShinglesMV(spark, dir).count() }
sinkTime("q222_decontam_mv", 2) { graft.operators.TextOps.benchmarkDecontam(spark, dir) }
time("q230_stream_decontam", 2) { q("q230_stream_decontam").count() }
time("q234_centroid_drift", 2) { q("q234_centroid_drift").count() }
println(f"ZI canary_end ${Seq(canary(),canary()).min}%.3f")
println("ZI DONE")
sys.exit(0)
