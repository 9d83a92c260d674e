// Round-12 same-JVM A/B: pinned vs per-round-MV-scan for BFS/LPA, with
// host canaries bracketing the measurement (the only trustworthy
// comparator on a drifting host).
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
val dir = "/root/testdata/sf0.1"
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZAB canary ${Seq(canary(),canary(),canary()).min}%.3f")
val mvSym = GraphOps.symAdjMV(spark, dir)
val seed = GraphOps.nodeDegMV(spark, dir).agg(min(col("node")).as("node"))
val n = GraphOps.nodeDegMV(spark, dir).count()
def bfsOut(sym: => org.apache.spark.sql.DataFrame) =
  GraphOps.bfsDistancesOn(sym, seed, 4, n).groupBy("dist").agg(count(lit(1)).as("n_nodes")).count()
def t(tag: String)(f: => Long): Unit = { val ts = (1 to 4).map { _ => val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }; println(f"ZAB $tag min ${ts.min}%.2f all ${ts.map(x=>f"$x%.2f").mkString(",")}") }
t("bfs_scan") { bfsOut(mvSym.select(col("u"), col("v"))) }
val pinned = mvSym.select(col("u"), col("v")).localCheckpoint(true)
t("bfs_pin") { bfsOut(pinned) }
def lpaOut(sym: => org.apache.spark.sql.DataFrame) =
  GraphOps.labelPropagationOn(sym, GraphOps.nodeDegMV(spark, dir).select(col("node")), 3).groupBy("label").count().count()
t("lpa_scan") { lpaOut(mvSym.select(col("u"), col("v"))) }
t("lpa_pin") { lpaOut(pinned) }
println(f"ZAB canary_end ${Seq(canary(),canary(),canary()).min}%.3f")
sys.exit(0)
