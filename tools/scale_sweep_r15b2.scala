// Round-15 sweep B2: merge-materialization VARIANTS at 100x, after sweep B
// showed FULL materialization (deltaAgg+fresh+newDeg checkpointed) runs
// 2-3x SLOWER than r14's re-derived shape - checkpointing fresh/newDeg
// serializes base-shaped scans into their own jobs.
//   OLD = r14 shape (nothing materialized, unconditional broadcast)
//   V2  = deltaAgg checkpointed ONLY (delta-shaped job, no base scan);
//         fresh/newDeg lazy, broadcast hinted
//   V3  = deltaAgg + newDeg checkpointed (newDeg's job pays one serialized
//         base pass but gives an exact node count for the broadcast gate)
// Interleaved, canary-bracketed, sink-measured.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZV canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val delta = graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0)).localCheckpoint(true)
println(s"ZV delta_edges ${delta.count()}")
val bkt = graft.operators.GraphOps.symAdjBucketedMV(spark, dir)
type DF = org.apache.spark.sql.DataFrame
def core(baseSym: DF, deltaEdges: DF, chkAgg: Boolean, chkDeg: Boolean): DF = {
  val symDelta = deltaEdges.select(col("src").as("u"), col("dst").as("v"), col("w")).union(deltaEdges.select(col("dst").as("u"), col("src").as("v"), col("w")))
  val deltaAgg0 = symDelta.groupBy("u", "v").agg(sum(col("w")).as("dw"))
  val deltaAgg = if (chkAgg) deltaAgg0.localCheckpoint(true) else deltaAgg0
  val grown = baseSym.join(deltaAgg, Seq("u", "v"), "left").select(col("u"), col("v"), (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
  val fresh = deltaAgg.join(baseSym.select("u", "v"), Seq("u", "v"), "left_anti").select(col("u"), col("v"), col("dw").as("w"))
  val baseDeg = baseSym.select(col("u"), col("deg_u")).distinct()
  val freshCnt = fresh.groupBy("u").agg(count(lit(1)).as("d"))
  val newDeg0 = baseDeg.join(freshCnt, Seq("u"), "full_outer").select(col("u"), (coalesce(col("deg_u"), lit(0L)) + coalesce(col("d"), lit(0L))).as("deg_u"))
  val newDeg = if (chkDeg) newDeg0.localCheckpoint(true) else newDeg0
  grown.join(broadcast(newDeg), "u").select("u", "v", "w", "deg_u").union(fresh.join(broadcast(newDeg), "u").select("u", "v", "w", "deg_u"))
}
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String)(f: => DF): Unit = { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/out"); println(f"ZV $tag ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }
for (round <- 1 to 2) {
  sinkTime(s"old_r$round") { core(bkt, delta, chkAgg = false, chkDeg = false) }
  println(f"ZV canary_a$round ${canary()}%.3f")
  sinkTime(s"v2_aggonly_r$round") { core(bkt, delta, chkAgg = true, chkDeg = false) }
  println(f"ZV canary_b$round ${canary()}%.3f")
  sinkTime(s"v3_agg_deg_r$round") { core(bkt, delta, chkAgg = true, chkDeg = true) }
  println(f"ZV canary_c$round ${canary()}%.3f")
}
println("ZV DONE")
sys.exit(0)
