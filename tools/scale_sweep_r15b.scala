// Round-15 sweep B: the MATERIALIZE-THE-MERGE-DELTA A/B at 100x (VERDICT
// r14 item 1's measurement half). NEW = the committed mergeSymDelta (delta
// aggregate / fresh / newDeg localCheckpointed once, broadcast gated);
// OLD = round-14's shape, reconstructed inline verbatim (unmaterialized
// delta derivation re-derived per branch, unconditional broadcast).
// Same JVM, interleaved, canary-bracketed, sink-measured.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZM canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val li = graft.sources.Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val delta = graft.operators.GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0)).localCheckpoint(true)
println(s"ZM delta_edges ${delta.count()}")
val bkt = graft.operators.GraphOps.symAdjBucketedMV(spark, dir)
// round-14 merge shape, verbatim (pre-materialization)
def mergeOld(baseSym: org.apache.spark.sql.DataFrame, deltaEdges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
  val symDelta = deltaEdges.select(col("src").as("u"), col("dst").as("v"), col("w")).union(deltaEdges.select(col("dst").as("u"), col("src").as("v"), col("w")))
  val deltaAgg = symDelta.groupBy("u", "v").agg(sum(col("w")).as("dw"))
  val grown = baseSym.join(deltaAgg, Seq("u", "v"), "left").select(col("u"), col("v"), (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
  val fresh = deltaAgg.join(baseSym.select("u", "v"), Seq("u", "v"), "left_anti").select(col("u"), col("v"), col("dw").as("w"))
  val baseDeg = baseSym.select(col("u"), col("deg_u")).distinct()
  val freshCnt = fresh.groupBy("u").agg(count(lit(1)).as("d"))
  val newDeg = baseDeg.join(freshCnt, Seq("u"), "full_outer").select(col("u"), (coalesce(col("deg_u"), lit(0L)) + coalesce(col("d"), lit(0L))).as("deg_u"))
  grown.join(broadcast(newDeg), "u").select("u", "v", "w", "deg_u").union(fresh.join(broadcast(newDeg), "u").select("u", "v", "w", "deg_u"))
}
val sink = java.nio.file.Files.createTempDirectory("graft_sweep_sink").toString
def sinkTime(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = { val t0 = System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/out"); println(f"ZM $tag ${(System.nanoTime()-t0)/1e9}%.2f s (sink)") }
for (round <- 1 to 3) {
  sinkTime(s"merge_materialized_r$round") { graft.operators.GraphOps.mergeSymDelta(bkt, delta) }
  println(f"ZM canary_a$round ${canary()}%.3f")
  sinkTime(s"merge_old_rederived_r$round") { mergeOld(bkt, delta) }
  println(f"ZM canary_b$round ${canary()}%.3f")
}
println("ZM DONE")
sys.exit(0)
