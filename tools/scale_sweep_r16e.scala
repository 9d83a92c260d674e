// Round-16 sweep E: q241 (streaming int8 chain maintenance) at 100x on
// /tmp/scale100b (500k docs / 200k vectors), interleaved against the batch
// gates it composes (q240 int8 chain, q238 float chain) with canaries per
// the r14/r15 discipline. Each gate runs twice: first touch builds the
// fingerprint-cached standing MVs, the second call is the steady state
// (chain reset + replayed maintenance cycles + probe).
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r16e.scala
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZE canary_start ${Seq(canary(),canary()).min}%.3f dir=$dir")
def leg(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
  val t0=System.nanoTime(); val n=f.count(); println(f"ZE $tag ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n"); println(f"ZE canary_$tag ${canary()}%.3f") }
for (round <- 1 to 2) {
  leg(s"q240_int8_batch_r$round")  { graft.operators.Similarity.int8IvfDurableRefresh(spark, dir) }
  leg(s"q241_int8_stream_r$round") { graft.streaming.StreamingOps.int8IvfStreamParity(spark, dir) }
  leg(s"q238_float_batch_r$round") { graft.operators.Similarity.ivfDurableRefreshBucketed(spark, dir) }
}
println(f"ZE canary_end ${canary()}%.3f")
sys.exit(0)
