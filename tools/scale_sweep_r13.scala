// Round-13 100x sweep: graph gates over the JVM-shared pin cache (above
// PinEdgeLimit the per-round re-scan discipline must be unchanged), the
// incremental sym maintenance (q217), the full-PSL quota (q218), and the
// streaming domain quota (q219).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r13.scala
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
val dir = "/tmp/scale100"
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZS canary ${Seq(canary(),canary(),canary()).min}%.3f")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZS $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
time("symAdjMV", 2) { GraphOps.symAdjMV(spark, dir).count() }
time("q98_pagerank", 3) { graft.SparkEntry.queries("q98_copurchase_pagerank")(spark, dir).count() }
time("q144_bfs", 3) { graft.SparkEntry.queries("q144_bfs_rings")(spark, dir).count() }
time("q184_paths", 3) { graft.SparkEntry.queries("q184_weighted_paths")(spark, dir).count() }
time("q206_lpa", 3) { graft.SparkEntry.queries("q206_communities")(spark, dir).count() }
time("q211_kcore", 3) { graft.SparkEntry.queries("q211_kcore")(spark, dir).count() }
time("q195_cf", 3) { graft.SparkEntry.queries("q195_item_neighbors")(spark, dir).count() }
time("q217_symincr", 3) { graft.SparkEntry.queries("q217_sym_incremental")(spark, dir).count() }
time("q218_pslquota", 3) { graft.SparkEntry.queries("q218_psl_domain_quota")(spark, dir).count() }
time("q219_streamquota", 3) { graft.SparkEntry.queries("q219_stream_domain_quota")(spark, dir).count() }
println(f"ZS canary_end ${Seq(canary(),canary(),canary()).min}%.3f")
println("ZS DONE")
sys.exit(0)
