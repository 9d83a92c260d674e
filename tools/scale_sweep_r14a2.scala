// Round-14 sweep A2: sym merge-vs-rebuild economics, INTERLEAVED with
// canaries (sweep A's tail ran into a 4x host degradation — interleaving
// makes every comparison same-conditions). Rebuild comparator is the
// public refresh path (edge MV + sym MV full rebuild INCLUDING the
// parquet write — the r13 protocol). Also self-checks the merge plan:
// the bucketed base must contribute zero exchanges.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZZ canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/sym"); println(f"ZZ $tag ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val delta = graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0)).localCheckpoint(true)
println(s"ZZ delta_edges ${delta.count()}")
val bkt = graft.operators.GraphOps.symAdjBucketedMV(spark, dir)
val bktPath = graft.sources.Tables.bucketedMvPath(spark, java.nio.file.Paths.get(dir, "lineitem.parquet"), "copurchase_sym_bkt", 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
val plainSameBytes = spark.read.parquet(bktPath.toString)
val mergedPlan = graft.operators.GraphOps.mergeSymDelta(bkt, delta).queryExecution.executedPlan.toString
println(s"ZZ plan_exchanges ${"Exchange hashpartitioning".r.findAllIn(mergedPlan).length} bucketed=${mergedPlan.contains("Bucketed: true") || mergedPlan.contains("SelectedBucketsCount")}")
for (round <- 1 to 2) {
  sinkTime(s"sym_merge_bucketed_r$round") { graft.operators.GraphOps.mergeSymDelta(bkt, delta) }
  println(f"ZZ canary_a$round ${canary()}%.3f")
  sinkTime(s"sym_merge_plainpath_r$round") { graft.operators.GraphOps.mergeSymDelta(plainSameBytes, delta) }
  println(f"ZZ canary_b$round ${canary()}%.3f")
  val t0 = System.nanoTime()
  graft.operators.GraphOps.symAdjMVPath(spark, dir, refresh = true)
  println(f"ZZ sym_rebuild_refresh_r$round ${(System.nanoTime()-t0)/1e9}%.2f s (MV write)")
  println(f"ZZ canary_c$round ${canary()}%.3f")
}
println("ZZ DONE")
sys.exit(0)
