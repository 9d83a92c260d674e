// Round-16 sweep A: the two NEW maintenance gates at 100× (/tmp/scale100b,
// 500k docs / 200k vectors), interleaved with canaries per the r14/r15
// degradation-episode discipline:
//   - q238 durable IVF refresh (chain republish, probe with NO delta job)
//     vs q237 (per-call delta assign + union at probe time)
//   - q239 streaming multi-benchmark decontam (per-batch tagged probe)
//     vs q235 batch (one-pass tagged probe)
// Each gate is called twice: first touch builds/refreshes the standing MVs
// (fingerprint-cached across calls), the second call is the steady state.
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZI canary_start ${Seq(canary(),canary()).min}%.3f dir=$dir")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
val sink = java.nio.file.Files.createTempDirectory("graft_r16a_sink").toString
// SINK-measured (the r14 rule: count() lets Catalyst eliminate unique-key
// left joins — q235's audit/kept joins are exactly that shape)
def leg(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = { val t0=System.nanoTime(); f.write.mode("overwrite").parquet(s"$sink/out"); println(f"ZI $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); println(f"ZI canary_$tag ${canary()}%.3f") }
for (round <- 1 to 2) {
  leg(s"q237_incremental_r$round") { graft.operators.Similarity.ivfIncrementalParityBucketed(spark, dir) }
  leg(s"q238_durable_r$round") { graft.operators.Similarity.ivfDurableRefreshBucketed(spark, dir) }
}
for (round <- 1 to 2) {
  leg(s"q235_batch_decontam_r$round") { graft.operators.TextOps.multiBenchDecontam(spark, dir) }
  leg(s"q239_stream_decontam_r$round") { graft.streaming.StreamingOps.multiBenchDecontamStreamParity(spark, dir) }
}
println(f"ZI canary_end ${canary()}%.3f")
sys.exit(0)
