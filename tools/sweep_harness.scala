// Shared scale-sweep harness (round-17 — VERDICT r16 item 7: ~25 one-shot
// scale_sweep_r*.scala scripts re-declared the same canary/leg/interleave
// machinery; new sweeps are now CONFIG on top of this file, not copies).
//
// Usage: include this BEFORE the per-sweep config script —
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 24g \
//     --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//     -I tools/sweep_harness.scala -I tools/<your_sweep>.scala
//
// A sweep config is then just legs (see scale_sweep_r17a.scala):
//   sweepStart()
//   for (round <- 1 to 2) {
//     leg(s"q242_batch_r$round") { <expression returning a DataFrame> }
//   }
//   sweepEnd()
//
// Measurement discipline (the r14/r15/r16 rules, stated once):
//   - CANARY BRACKETING: a fixed 10M-row shuffle+topk probe runs before the
//     sweep and after every leg; normalize leg times by the surrounding
//     canaries when comparing across hosts/runs (tools/bench_compare.py's
//     convention).
//   - FIRST-TOUCH LEGS BUILD CACHES: fingerprint-keyed MVs build on a
//     gate's first call — run every gate >= 2 rounds and read round 2+ as
//     the steady state; round 1 is the build cost, reported separately.
//   - INTERLEAVE COMPETING VARIANTS within a round (A, B, A, B — not
//     A, A, B, B) so slow drift attributes to the host, not the variant.
//   - LEG DISREGARD RULE: a leg whose bracketing canaries disagree by
//     >15% ran through host noise (GC, another JVM's build) — rerun it or
//     disregard it; never average it in.
import org.apache.spark.sql.functions._

val sweepDir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100")

def canary(): Double = {
  val t0 = System.nanoTime()
  spark.range(0L, 10000000L, 1L, 32)
    .selectExpr("(id*2654435761)%1000003 AS k", "id%97 AS v")
    .groupBy("k").agg(sum("v").as("s"))
    .orderBy(col("s").desc).limit(10).count()
  (System.nanoTime() - t0) / 1e9
}

/** Time one gate call (forcing it with count) and bracket it with a canary. */
def leg(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
  val t0 = System.nanoTime()
  val n = f.count()
  println(f"ZE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
  println(f"ZE canary_$tag ${canary()}%.3f")
}

/** Same, for side-effecting legs (sink-measured lifecycles). */
def legUnit(tag: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"ZE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
  println(f"ZE canary_$tag ${canary()}%.3f")
}

def sweepStart(): Unit = {
  canary() // JIT/alloc warm-up, discarded
  println(f"ZE canary_start ${Seq(canary(), canary()).min}%.3f dir=$sweepDir")
}

def sweepEnd(): Unit = {
  println(f"ZE canary_end ${canary()}%.3f")
  sys.exit(0)
}
