// Multi-query alternating-jar replay leg for r19 flags: min-of-3
// in-process passes per flagged query at sf0.1, bracketed by BOTH host
// canaries (CPU-bound hash/agg + the round-19 shuffle-shaped one — the
// same shapes graft.Bench emits, so legs normalize on the same axes
// bench_compare adjudicates with). The jar on the classpath decides old
// vs new — run alternating sessions (old, new, old, new) via:
//   REPLAY_QS=qA,qB /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 --driver-memory 24g \
//     --jars <old-or-new jar> -I tools/replay_legs_r19.scala
import org.apache.spark.sql.functions._
val sfdir = "/root/testdata/sf0.1"
def canary(): Double = { val t0 = System.nanoTime(); spark.range(0L, 10000000L, 1L, 32).selectExpr("(id*2654435761)%1000003 AS k", "id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime() - t0) / 1e9 }
def canaryShuffle(): Double = { val t0 = System.nanoTime(); spark.range(0L, 2000000L, 1L, 32).selectExpr("md5(cast(id as string)) AS k", "id % 1000 AS g", "id AS v").groupBy("k", "g").agg(sum("v").as("s")).groupBy("g").agg(count(lit(1)).as("n"), sum("s").as("t")).orderBy(col("t").desc).limit(10).count(); (System.nanoTime() - t0) / 1e9 }
canary(); canaryShuffle()
val c0 = Seq(canary(), canary()).min
val cs0 = Seq(canaryShuffle(), canaryShuffle()).min
val flagged = sys.env.getOrElse("REPLAY_QS", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
assert(flagged.nonEmpty, "set REPLAY_QS=qA,qB,... to the flagged query names")
for (q <- flagged) { def once(): Double = { val t0 = System.nanoTime(); graft.SparkEntry.queries(q)(spark, sfdir).collect(); (System.nanoTime() - t0) / 1e9 }; once(); val ts = Seq(once(), once(), once()); println(f"ZR $q min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}") }
println(f"ZR canary start=$c0%.3f end=${Seq(canary(), canary()).min}%.3f shuffle_start=$cs0%.3f shuffle_end=${Seq(canaryShuffle(), canaryShuffle()).min}%.3f")
sys.exit(0)
