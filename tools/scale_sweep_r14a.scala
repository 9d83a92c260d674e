// Round-14 sweep A: bucketed standing-index merge economics (VERDICT r13
// item 2) on the 32-file corpus. All merge/rebuild timings are SINK-MEASURED
// (parquet write) — a bare count() eliminates the merge's unique-key left
// join exactly like the r13 cleaner-family lie. The clean A/B is
// merge_bucketed vs merge_plainpath: SAME bytes, same files, only the
// catalog bucket layout differs.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZI canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String, passes: Int)(f: => org.apache.spark.sql.DataFrame): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/$tag"); println(f"ZI $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }
def time(tag: String, passes: Int)(f: => Long): Unit =
  for (p <- 1 to passes) { val t0 = System.nanoTime(); val c = f; println(f"ZI $tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c") }
// report the per-bucket sort order from the one-file-per-bucket layout
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val delta = graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0)).localCheckpoint(true)
println(s"ZI delta_edges ${delta.count()}")
// one-time: the bucketed standing layout, built FROM the plain sym MV
time("sym_bkt_build_once", 1) { graft.operators.GraphOps.symAdjBucketedMV(spark, dir).count() }
val bkt = graft.operators.GraphOps.symAdjBucketedMV(spark, dir)
val bktPath = graft.sources.Tables.bucketedMvPath(spark, java.nio.file.Paths.get(dir, "lineitem.parquet"), "copurchase_sym_bkt", 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
val plainSameBytes = spark.read.parquet(bktPath.toString)
sinkTime("sym_merge_bucketed", 2) { graft.operators.GraphOps.mergeSymDelta(bkt, delta) }
sinkTime("sym_merge_plainpath", 2) { graft.operators.GraphOps.mergeSymDelta(plainSameBytes, delta) }
// the production write-back: the merged relation re-bucketed for the next refresh
sinkTime("sym_merge_bucketed_writeback", 1) { graft.operators.GraphOps.mergeSymDelta(bkt, delta).repartition(32, col("u"), col("v")).sortWithinPartitions("u", "v") }
// full rebuild comparator, same sink (source self-join + sym + degrees)
sinkTime("sym_rebuild", 2) { graft.operators.GraphOps.symmetrizeWithDegrees(graft.operators.GraphOps.copurchaseEdgesOf(li)) }
println(f"ZI canary_mid ${Seq(canary(),canary()).min}%.3f")
// ---- shingle-df standing index ----
val docs = graft.sources.Tables.documents(spark, dir)
val deltaDocs = docs.filter(col("doc_id") % 10 === 0)
time("shingle_bkt_build_once", 1) { graft.operators.TextOps.shingleDfBucketedMV(spark, dir).count() }
val sgBkt = graft.operators.TextOps.shingleDfBucketedMV(spark, dir)
val sgPath = graft.sources.Tables.bucketedMvPath(spark, java.nio.file.Paths.get(dir, "documents.parquet"), "shingle_df_bkt", 32, Seq("sg"), Seq("sg"))(sys.error("published"))
val sgPlain = spark.read.parquet(sgPath.toString)
sinkTime("shingle_merge_bucketed", 2) { graft.operators.TextOps.mergeShingleDfDelta(sgBkt, deltaDocs) }
sinkTime("shingle_merge_plainpath", 2) { graft.operators.TextOps.mergeShingleDfDelta(sgPlain, deltaDocs) }
sinkTime("shingle_rebuild", 2) { graft.operators.TextOps.shingleDfFrom(docs) }
println(f"ZI canary_end ${Seq(canary(),canary()).min}%.3f")
println("ZI DONE")
sys.exit(0)
