// Round-12 100x sweep: graph family over the new symAdjMV/nodeDegMV +
// delta-vs-full LPA at fixpoint + the q214/q215/q216 queries.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r12.scala
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
val dir = "/tmp/scale100"
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZS $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
// MV first touch (cold build) then warm
time("symAdjMV", 2) { GraphOps.symAdjMV(spark, dir).count() }
time("nodeDegMV", 2) { GraphOps.nodeDegMV(spark, dir).count() }
time("q206_gate3", 3) { graft.SparkEntry.queries("q206_communities")(spark, dir).count() }
def lpa(rounds: Int, delta: Boolean) =
  GraphOps.labelPropagationOn(GraphOps.symAdjMV(spark, dir).select(col("u"), col("v")),
    GraphOps.nodeDegMV(spark, dir).select(col("node")), rounds, delta = delta)
time("r8_full", 2)  { lpa(8, false).groupBy("label").count().count() }
time("r8_delta", 2) { lpa(8, true).groupBy("label").count().count() }
time("q98_pagerank", 3) { graft.SparkEntry.queries("q98_copurchase_pagerank")(spark, dir).count() }
time("q211_kcore", 3) { graft.SparkEntry.queries("q211_kcore")(spark, dir).count() }
time("q144_bfs", 3) { graft.SparkEntry.queries("q144_bfs_rings")(spark, dir).count() }
time("q184_paths", 3) { graft.SparkEntry.queries("q184_weighted_paths")(spark, dir).count() }
time("q195_cf", 3) { graft.SparkEntry.queries("q195_item_neighbors")(spark, dir).count() }
time("q214_spancut", 3) { graft.SparkEntry.queries("q214_span_cut")(spark, dir).count() }
time("q215_multiprobe", 3) { graft.SparkEntry.queries("q215_semdedup_multiprobe")(spark, dir).count() }
time("q216_urlquota", 3) { graft.SparkEntry.queries("q216_url_domain_quota")(spark, dir).count() }
println("ZS DONE")
sys.exit(0)
