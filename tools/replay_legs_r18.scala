// Multi-query alternating-jar replay leg for the r18 flags: min-of-3
// in-process passes per flagged query at sf0.1, canary-bracketed. The jar
// on the classpath decides old vs new — run alternating sessions
// (old, new, old, new) via:
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 24g --jars <old-or-new jar> -I tools/replay_legs_r18.scala
import org.apache.spark.sql.functions._
val sfdir = "/root/testdata/sf0.1"
def canary(): Double = { val t0 = System.nanoTime(); spark.range(0L, 10000000L, 1L, 32).selectExpr("(id*2654435761)%1000003 AS k", "id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime() - t0) / 1e9 }
val c0 = Seq(canary(), canary()).min
val flagged = Seq("q224_leak_safe_split", "q98_copurchase_pagerank", "q74_neardup_clusters", "q228_novelty_curve", "q229_cell_silhouette", "q204_settlement_t2", "q215_semdedup_multiprobe")
for (q <- flagged) { def once(): Double = { val t0 = System.nanoTime(); graft.SparkEntry.queries(q)(spark, sfdir).collect(); (System.nanoTime() - t0) / 1e9 }; once(); val ts = Seq(once(), once(), once()); println(f"ZR $q min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}") }
println(f"ZR canary start=$c0%.3f end=${Seq(canary(), canary()).min}%.3f")
sys.exit(0)
