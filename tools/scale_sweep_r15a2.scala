// Round-15 sweep A2: write-back tail ISOLATED. The merged relation is
// localCheckpointed once (reads come from the block manager), then the
// bucketed write is timed from identical in-memory input under:
//   A = oneFilePerBucket=true   (explicit pre-shuffle)
//   B = oneFilePerBucket=false  (no explicit pre-shuffle; Spark's planned
//       write may insert its own distribution - sweep A measured 32 files
//       either way, so B's premise needs the plannedWrite conf examined)
//   C = B with spark.sql.optimizer.plannedWrite.enabled=false
// File counts printed per leg - the layout actually produced is part of
// the result, not an assumption.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZX canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val liPath = java.nio.file.Paths.get(dir, "lineitem.parquet")
val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val delta = graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0)).localCheckpoint(true)
val bkt = graft.operators.GraphOps.symAdjBucketedMV(spark, dir)
val merged = graft.operators.GraphOps.mergeSymDelta(bkt, delta).localCheckpoint(true)
println(s"ZX merged_rows ${merged.count()} partitions ${merged.rdd.getNumPartitions}")
println(f"ZX canary_0 ${canary()}%.3f")
def leg(tag: String, name: String, ofpb: Boolean, planned: Boolean): Unit = {
  spark.conf.set("spark.sql.optimizer.plannedWrite.enabled", planned.toString)
  val t0 = System.nanoTime()
  val p = graft.sources.Tables.bucketedMvPath(spark, liPath, name, 32, Seq("u","v"), Seq("u","v"), refresh = true, oneFilePerBucket = ofpb)(merged)
  val files = graft.sources.Tables.bucketFiles(p).values.map(_.size).sum
  println(f"ZX $tag ${(System.nanoTime()-t0)/1e9}%.2f s files=$files")
  spark.conf.set("spark.sql.optimizer.plannedWrite.enabled", "true")
}
for (round <- 1 to 3) {
  leg(s"write_onefile_r$round", "wbx_a", ofpb = true, planned = true)
  println(f"ZX canary_a$round ${canary()}%.3f")
  leg(s"write_kfiles_r$round", "wbx_b", ofpb = false, planned = true)
  println(f"ZX canary_b$round ${canary()}%.3f")
  leg(s"write_kfiles_noplan_r$round", "wbx_c", ofpb = false, planned = false)
  println(f"ZX canary_c$round ${canary()}%.3f")
}
// consumer probe: one merge against each layout, sink-measured once
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def consume(tag: String, name: String): Unit = {
  val base = graft.sources.Tables.bucketedMv(spark, liPath, name, 32, Seq("u","v"), Seq("u","v"))(sys.error("published"))
  val t0 = System.nanoTime()
  graft.operators.GraphOps.mergeSymDelta(base, delta).write.mode("overwrite").parquet(s"$sink/out")
  println(f"ZX $tag ${(System.nanoTime()-t0)/1e9}%.2f s (sink)")
}
for (round <- 1 to 2) {
  consume(s"consume_onefile_r$round", "wbx_a")
  println(f"ZX canary_d$round ${canary()}%.3f")
  consume(s"consume_noplan_r$round", "wbx_c")
  println(f"ZX canary_e$round ${canary()}%.3f")
}
println("ZX DONE")
sys.exit(0)
