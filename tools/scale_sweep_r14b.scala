// Round-14 sweep B: bucketed-frontier LPA experiment (VERDICT r13 item 3) —
// to-fixpoint runs, plain vs bucketed, with the per-round frontier/bucket
// occupancy printed by the verbose path. The recorded r12 caveat predicts
// occupancy saturates (every delta round touches all buckets) except in the
// extreme convergence tail; this sweep records the curve and the verdict.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZI canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZI $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
// one-time: the u-bucketed layout for frontier pruning
time("lpa_ubkt_build_once", 1) { graft.operators.GraphOps.labelPropagationBucketed(spark, dir, 1, 32).count() }
// to-fixpoint (rounds cap 50; both paths share the empty-frontier short-circuit)
time("q206_fix_plain", 2) { graft.operators.GraphOps.communityGate(spark, dir, 50).count() }
time("lpa_fix_bucketed_verbose", 2) { graft.operators.GraphOps.labelPropagationBucketed(spark, dir, 50, 32, verbose = true).count() }
println(f"ZI canary_end ${Seq(canary(),canary()).min}%.3f")
println("ZI DONE")
sys.exit(0)
