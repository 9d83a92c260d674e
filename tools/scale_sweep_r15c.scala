// Round-15 sweep C: 100x scale shapes for the round's NEW operators.
//   q235 multi-benchmark decontam: tagged cut-set MV first-touch, then
//        sink-measured probes (the q222 protocol)
//   q237 incremental IVF: centroid+assignment MV first-touch, then the
//        warm pruned probe, with the files-read / files-total ratio
//   q236 streaming maintenance chain: ONE full lifecycle (base MV is
//        fingerprint-cached first-touch; the chain replays 3 CDC merges +
//        bucketed write-backs - the honest refresh-loop cost)
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZC canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/out"); println(f"ZC $tag ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }

// --- q235 ---
val t235 = System.nanoTime()
graft.operators.TextOps.multiBenchShinglesMV(spark, dir, graft.operators.TextOps.DefaultBenchSources, refresh = true).count()
println(f"ZC q235_cutset_mv_build ${(System.nanoTime()-t235)/1e9}%.2f s (MV write)")
println(f"ZC canary_1 ${canary()}%.3f")
for (r <- 1 to 2) {
  sinkTime(s"q235_decontam_r$r") { graft.operators.TextOps.multiBenchDecontam(spark, dir) }
  println(f"ZC canary_2$r ${canary()}%.3f")
}

// --- q237 ---
val t237 = System.nanoTime()
val r237 = graft.operators.Similarity.ivfIncrementalParityBucketed(spark, dir)
r237.count()
println(f"ZC q237_first_touch ${(System.nanoTime()-t237)/1e9}%.2f s (MV builds + probe)")
val asgPath = graft.sources.Tables.bucketedMvPath(spark, java.nio.file.Paths.get(dir, "embeddings.parquet"), "ivf_assign_b90_8_3", 8, Seq("cell"), Seq("cell", "vec_id"))(sys.error("published"))
println(s"ZC q237_total_bucket_files ${graft.sources.Tables.bucketFiles(asgPath).values.map(_.size).sum}")
for (r <- 1 to 3) {
  val t0 = System.nanoTime()
  graft.operators.Similarity.ivfIncrementalParityBucketed(spark, dir).count()
  println(f"ZC q237_warm_probe_r$r ${(System.nanoTime()-t0)/1e9}%.2f s")
}
println(f"ZC canary_3 ${canary()}%.3f")

// --- q236 --- (one full lifecycle; base MV first-touch separated)
val tBase = System.nanoTime()
graft.sources.Tables.bucketedMv(spark, java.nio.file.Paths.get(dir, "lineitem.parquet"), "copurchase_symb90p", 32, Seq("u","v"), Seq("u","v")) {
  val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
  graft.operators.GraphOps.symmetrizeWithDegrees(graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 =!= 0)))
}.count()
println(f"ZC q236_base_mv_first_touch ${(System.nanoTime()-tBase)/1e9}%.2f s")
println(f"ZC canary_4 ${canary()}%.3f")
val t236 = System.nanoTime()
val out236 = graft.streaming.StreamingOps.symMergeStreamParity(spark, dir)
println(f"ZC q236_stream_lifecycle ${(System.nanoTime()-t236)/1e9}%.2f s (3 CDC merges + bucketed write-backs, localCheckpointed result)")
println(s"ZC q236_rows ${out236.count()}")
println(f"ZC canary_5 ${canary()}%.3f")
println("ZC DONE")
sys.exit(0)
