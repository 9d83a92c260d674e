// Round-16 sweep D: the MinHash-LSH family at 100x under FOUR independent
// base-hash families (the round-16 containment-recall fix). The family's
// canonical 100x history (SCALING.md round 4) was measured on the 1-file
// corpus under a SINGLE (a,b) family; this sweep starts the 32-file series
// on /tmp/scale100b and prices the four-family trade at scale:
//   - 4 base hashes per shingle (xxhash64 fast path) / 4 salted md5
//     (portable path) instead of 1,
//   - ~4x band-collision candidates into the exact-verify join.
// Canary-bracketed, 2 rounds per gate (cold = shared-cache build + codegen,
// warm = steady state), count-measured like the round-4 series (the verify
// inner join participates in the count cardinality, so Catalyst cannot
// eliminate the pair work; the r14 sink rule targets unique-key LEFT joins).
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r16d.scala
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZD canary_start ${Seq(canary(),canary()).min}%.3f dir=$dir")
def leg(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
  val t0=System.nanoTime(); val n=f.count(); println(f"ZD $tag ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n"); println(f"ZD canary_$tag ${canary()}%.3f") }
for (round <- 1 to 2) {
  leg(s"q27_jaccard_r$round")  { graft.operators.TextOps.jaccardPairs(spark, dir, 20) }
  leg(s"q28_minhash_r$round")  { graft.operators.TextOps.minHashLshPairs(spark, dir, 0.5) }
  leg(s"q49_portable_r$round") { graft.operators.TextOps.minHashLshPairsPortable(spark, dir, 0.5) }
  leg(s"q74_clusters_r$round") { graft.operators.TextOps.nearDupClusters(spark, dir, 0.5) }
}
println(f"ZD canary_end ${canary()}%.3f")
sys.exit(0)
