// 100x sweep of the session's new families (q194-q204) over /tmp/scale100.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g \
//   --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r10b.scala
val dir = "/tmp/scale100"
val names = sys.env.get("SWEEP_NAMES").map(_.split(",").toSeq).getOrElse(Seq(
  "q194_fifo_match", "q195_item_neighbors", "q196_psi_drift",
  "q197_abc_parts", "q198_win_streaks", "q199_l_diversity",
  "q200_naive_bayes", "q201_vocab_growth", "q202_rfm_segments",
  "q203_stickiness", "q204_settlement_t2"))
println("ZSCALE names=" + names.mkString("+"))
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  // warm nothing: fresh plan per query, min of 2 passes
  val times = (1 to 2).map { _ =>
    val t0 = System.nanoTime()
    val cnt = fn(spark, dir).count()
    val s = (System.nanoTime() - t0) / 1e9
    (s, cnt)
  }
  println(f"ZSCALE $n%-22s min=${times.map(_._1).min}%8.2f s rows=${times.head._2}")
}
println("ZSCALE done")
sys.exit(0)
