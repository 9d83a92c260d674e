// ANSI-robustness sweep (VERDICT r6 item 5): run EVERY registered query with
// spark.sql.ansi.enabled=true pinned explicitly (it is also the Spark 4
// session default — this run makes the guarantee explicit rather than
// inherited) and report any overflow/cast failure. ANSI-clean means the
// engine's arithmetic discipline holds under throwing semantics: checksums
// sum as decimal(38,0) not bigint, string→number casts go through try_cast,
// divisions are NULLIF-guarded.
//
// Usage:
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.ansi.enabled=true \
//     --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//     -I tools/ansi_sweep.scala
// Output: one "ANSI <query> OK rows=<n>" or "ANSI <query> FAIL <error>" line
// per query, then "ANSI_SWEEP_RESULT pass=<n> fail=<n>".
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark.conf.set("spark.sql.ansi.enabled", "true")
assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
  val ok = try {
    val n = fn(spark, sfDir).count()
    println(s"ANSI $name OK rows=$n")
    true
  } catch {
    case e: Throwable =>
      println(s"ANSI $name FAIL ${e.toString.takeWhile(_ != '\n').take(160)}")
      false
  }
  ok
}
println(s"ANSI_SWEEP_RESULT pass=${results.count(identity)} fail=${results.count(!_)}")
sys.exit(if (results.forall(identity)) 0 else 1)
