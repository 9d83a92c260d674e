// 100x sweep of the q206-q213 families over /tmp/scale100 (VERDICT r10
// item 7): LPA, FIFO aging, Holt backtest, bootstrap CI, SCD2-PIT, k-core,
// the rebuilt prefix-similarity join, and the new per-domain quota.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g \
//   --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/scale_sweep_r11.scala
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100")
val names = sys.env.get("SWEEP_NAMES").map(_.split(",").toSeq).getOrElse(Seq(
  "q206_communities", "q207_fifo_aging", "q208_holt_backtest",
  "q209_bootstrap_ci", "q210_scd2_pit", "q211_kcore",
  "q212_prefix_join", "q213_domain_quota"))
println("ZSCALE names=" + names.mkString("+"))
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  var times = List.empty[Double]
  for (pass <- 1 to 3) {
    val t0 = System.nanoTime()
    val cnt = fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    times ::= dt
    println(f"ZSCALE $n pass$pass $dt%.2f s rows=$cnt")
  }
  println(f"ZSCALE $n COLD ${times.last}%.2f WARMMIN ${times.init.min}%.2f")
}
sys.exit(0)
