// Round-13 re-baseline, part G3 (graph family on the 32-file
// /tmp/scale100b corpus): lineitem had 7 row groups in the 1-file corpus
// (≤7-way scans), so the MV builds and every gate's source pass were
// scan-capped too. pass1 pays the one-time symAdjMV/nodeDegMV/
// partOrderCountMV builds for the new corpus fingerprint; warm passes are
// the steady state the recorded history quotes.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZI canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZI $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
def q(n: String) = graft.SparkEntry.queries(n)(spark, dir)
time("q98_pagerank", 3) { q("q98_copurchase_pagerank").count() }
time("q144_bfs", 2) { q("q144_bfs_rings").count() }
time("q184_bellman_ford", 2) { q("q184_weighted_paths").count() }
time("q206_lpa", 2) { q("q206_communities").count() }
time("q211_kcore", 2) { q("q211_kcore").count() }
time("q195_item_cf", 2) { q("q195_item_neighbors").count() }
println(f"ZI canary_end ${Seq(canary(),canary()).min}%.3f")
println("ZI DONE")
sys.exit(0)
