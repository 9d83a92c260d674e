// Round-15 sweep A: the bucketed WRITE-BACK TAIL (VERDICT r14 item 3).
// The merged 239M-row standing relation re-published in two layouts,
// interleaved with canaries:
//   A = oneFilePerBucket=true  (pre-shuffle to nBuckets, one file/bucket,
//       scan-reported sort for consumers)
//   B = oneFilePerBucket=false (no pre-shuffle, write at the merge plan's
//       own parallelism, k files/bucket, consumers re-sort)
// plus CONSUMER legs: the next refresh's merge against each layout,
// sink-measured, with plan exchange/sort counts printed.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZW canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val liPath = java.nio.file.Paths.get(dir, "lineitem.parquet")
val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val delta = graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0)).localCheckpoint(true)
println(s"ZW delta_edges ${delta.count()}")
val bkt = graft.operators.GraphOps.symAdjBucketedMV(spark, dir)
for (round <- 1 to 2) {
  val tA = System.nanoTime()
  graft.sources.Tables.bucketedMvPath(spark, liPath, "wbtest_a", 32, Seq("u","v"), Seq("u","v"), refresh = true, oneFilePerBucket = true)(graft.operators.GraphOps.mergeSymDelta(bkt, delta))
  println(f"ZW writeback_onefile_r$round ${(System.nanoTime()-tA)/1e9}%.2f s (merge + MV write)")
  println(f"ZW canary_a$round ${canary()}%.3f")
  val tB = System.nanoTime()
  graft.sources.Tables.bucketedMvPath(spark, liPath, "wbtest_b", 32, Seq("u","v"), Seq("u","v"), refresh = true, oneFilePerBucket = false)(graft.operators.GraphOps.mergeSymDelta(bkt, delta))
  println(f"ZW writeback_kfiles_r$round ${(System.nanoTime()-tB)/1e9}%.2f s (merge + MV write)")
  println(f"ZW canary_b$round ${canary()}%.3f")
}
val pA = graft.sources.Tables.bucketedMvPath(spark, liPath, "wbtest_a", 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
val pB = graft.sources.Tables.bucketedMvPath(spark, liPath, "wbtest_b", 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
println(s"ZW files_a ${graft.sources.Tables.bucketFiles(pA).values.map(_.size).sum} files_b ${graft.sources.Tables.bucketFiles(pB).values.map(_.size).sum}")
val baseA = graft.sources.Tables.bucketedMv(spark, liPath, "wbtest_a", 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
val baseB = graft.sources.Tables.bucketedMv(spark, liPath, "wbtest_b", 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
def shape(tag: String, df: org.apache.spark.sql.DataFrame): Unit = { val p = df.queryExecution.executedPlan.toString; println(s"ZW plan_$tag exchanges=${"Exchange hashpartitioning".r.findAllIn(p).length} sorts=${"\\bSort \\[".r.findAllIn(p).length}") }
shape("consume_onefile", graft.operators.GraphOps.mergeSymDelta(baseA, delta))
shape("consume_kfiles", graft.operators.GraphOps.mergeSymDelta(baseB, delta))
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/out"); println(f"ZW $tag ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }
for (round <- 1 to 2) {
  sinkTime(s"consume_merge_onefile_r$round") { graft.operators.GraphOps.mergeSymDelta(baseA, delta) }
  println(f"ZW canary_c$round ${canary()}%.3f")
  sinkTime(s"consume_merge_kfiles_r$round") { graft.operators.GraphOps.mergeSymDelta(baseB, delta) }
  println(f"ZW canary_d$round ${canary()}%.3f")
}
println("ZW DONE")
sys.exit(0)
