// Round-14 sweep D: q223 narrow-pin A/B — the OLD front half
// (repartitionByRange directly over the scoring projection: the range
// sampler evaluates the child once for bounds, the shuffle map evaluates
// it again → the corpus is scored TWICE) vs the SHIPPED front half (score
// once into a narrow localCheckpoint, then range-exchange the pin).
// Everything downstream of the partitioned pin is identical code, so the
// front halves isolate exactly the r14 change. Interleaved,
// canary-bracketed — the only trustworthy comparator on a drifting host.
import org.apache.spark.sql.functions._
import graft.functions.Fx.rd
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZZ canary ${Seq(canary(),canary()).min}%.3f dir=$dir")
val docs = graft.sources.Tables.documents(spark, dir)
def scored() = docs.select(col("doc_id"), size(regexp_extract_all(col("text"), lit("[^\\s]+"), lit(0))).cast("long").as("n_tokens"), coalesce(rd(graft.operators.TextOps.qualityScore(col("text")), 6), lit(0.0)).as("q"))
def oldFront(): Long = {
  val parted = scored().repartitionByRange(col("q").desc, col("doc_id")).sortWithinPartitions(col("q").desc, col("doc_id")).localCheckpoint(true)
  val n = parted.count()
  parted.unpersist(true)
  n
}
def newFront(): Long = {
  val pin = scored().localCheckpoint(true)
  val parted = pin.repartitionByRange(col("q").desc, col("doc_id")).sortWithinPartitions(col("q").desc, col("doc_id")).localCheckpoint(true)
  val n = parted.count()
  parted.unpersist(true)
  pin.unpersist(true)
  n
}
for (r <- 1 to 3) {
  val t0 = System.nanoTime(); val a = oldFront(); println(f"ZZ q223_front_old_r$r ${(System.nanoTime()-t0)/1e9}%.2f s rows=$a")
  println(f"ZZ canary_a$r ${canary()}%.3f")
  val t1 = System.nanoTime(); val b = newFront(); println(f"ZZ q223_front_new_r$r ${(System.nanoTime()-t1)/1e9}%.2f s rows=$b")
  println(f"ZZ canary_b$r ${canary()}%.3f")
}
val t2 = System.nanoTime(); val c = graft.operators.TextOps.tokenBudgetSelect(spark, dir, 8000L).count(); println(f"ZZ q223_full_shipped ${(System.nanoTime()-t2)/1e9}%.2f s rows=$c")
println(f"ZZ canary_end ${canary()}%.3f")
println("ZZ DONE")
sys.exit(0)
