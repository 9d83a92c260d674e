// Multi-query alternating-jar replay leg for the r18 flags: min-of-3
// in-process passes per flagged query at sf0.1, canary-bracketed. The jar
// on the classpath decides old vs new — run alternating sessions
// (old, new, old, new) via:
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 24g --jars <old-or-new jar> -I tools/replay_legs_r18.scala
//
// Query list via REPLAY_QS (comma-separated). The round ran TWO batches
// (bench/replay_r18.json): the morning artifact's 7 flags —
//   q224_leak_safe_split,q98_copurchase_pagerank,q74_neardup_clusters,
//   q228_novelty_curve,q229_cell_silhouette,q204_settlement_t2,
//   q215_semdedup_multiprobe
// — and the final-HEAD artifact's 22 flags, the default below.
import org.apache.spark.sql.functions._
val sfdir = "/root/testdata/sf0.1"
def canary(): Double = { val t0 = System.nanoTime(); spark.range(0L, 10000000L, 1L, 32).selectExpr("(id*2654435761)%1000003 AS k", "id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime() - t0) / 1e9 }
val c0 = Seq(canary(), canary()).min
val flagged = sys.env.getOrElse("REPLAY_QS", "q153_seasonal_anomaly,q184_weighted_paths,q185_stream_late_drop,q189_mutual_information,q190_forecast_backtest,q197_abc_parts,q200_naive_bayes,q201_vocab_growth,q202_rfm_segments,q205_pq_knn,q208_holt_backtest,q209_bootstrap_ci,q210_scd2_pit,q217_sym_incremental,q223_token_budget_select,q227_stream_mixture_budget,q232_sym_incremental_bucketed,q234_centroid_drift,q65_contamination,q73_ivf_knn_kmeans,q82_unigram_surprisal,q94_stream_running_stats").split(",").map(_.trim).filter(_.nonEmpty).toSeq
for (q <- flagged) { def once(): Double = { val t0 = System.nanoTime(); graft.SparkEntry.queries(q)(spark, sfdir).collect(); (System.nanoTime() - t0) / 1e9 }; once(); val ts = Seq(once(), once(), once()); println(f"ZR $q min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}") }
println(f"ZR canary start=$c0%.3f end=${Seq(canary(), canary()).min}%.3f")
sys.exit(0)
