// Round-13 re-baseline, part G2 (streaming + embedding families on the
// 32-file /tmp/scale100b corpus). Streaming parity gates run their real
// AvailableNow lifecycles inside the call; counting the returned relation
// is the recorded convention. Embedding gates are count-measured (Lloyd
// training + broadcast ranked passes live under the count).
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZH canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZH $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def q(n: String) = graft.SparkEntry.queries(n)(spark, dir)
time("q220_stream_span_cut", 2) { q("q220_stream_span_cut").count() }
time("q221_shingle_df_incr", 2) { q("q221_shingle_df_incremental").count() }
time("q227_stream_mix_budget", 2) { q("q227_stream_mixture_budget").count() }
time("q219_stream_dom_quota", 2) { q("q219_stream_domain_quota").count() }
time("q90_semantic_dedup", 2) { q("q90_semantic_dedup").count() }
time("q215_semdedup_multiprobe", 2) { q("q215_semdedup_multiprobe").count() }
time("q229_cell_silhouette", 2) { q("q229_cell_silhouette").count() }
time("q205_pq_knn", 2) { q("q205_pq_knn").count() }
time("q56_lsh_neardup", 2) { q("q56_embedding_neardup_lsh").count() }
println(f"ZH canary_end ${Seq(canary(),canary()).min}%.3f")
println("ZH DONE")
sys.exit(0)
