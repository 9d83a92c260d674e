// One alternating-jar replay leg for the r17 q98 flag: min-of-3 in-process
// passes of q98_copurchase_pagerank at sf0.1, canary-bracketed. The jar on
// the classpath decides old vs new — run via:
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --jars <old-or-new jar> -I tools/q98_replay_leg_r17.scala
import org.apache.spark.sql.functions._
val sfdir = "/root/testdata/sf0.1"
def canary(): Double = { val t0 = System.nanoTime(); spark.range(0L, 10000000L, 1L, 32).selectExpr("(id*2654435761)%1000003 AS k", "id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime() - t0) / 1e9 }
canary()
def once(): Double = { val t0 = System.nanoTime(); graft.SparkEntry.queries(sys.env.getOrElse("REPLAY_Q", "q98_copurchase_pagerank"))(spark, sfdir).collect(); (System.nanoTime() - t0) / 1e9 }
once() // warmup: JIT + MV first touch (fingerprint-cached, shared across legs)
val times = Seq(once(), once(), once())
println(f"ZR ${sys.env.getOrElse("REPLAY_Q", "q98_copurchase_pagerank")} min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")} canary=${canary()}%.3f")
sys.exit(0)
