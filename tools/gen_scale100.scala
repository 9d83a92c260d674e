// Rebuild the /tmp/scale100 corpus: sf0.1 replicated ×100 with shifted keys
// (10M events / 2M parts / 120M lineitems / 15M orders / 500k docs / 200k
// vectors; every doc a 100-member exact-dup cluster). Timestamps are NOT
// shifted — the calendar stays one month, preserving the bars-bounded-by-
// calendar shapes the SCALING.md arguments rely on.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g \
//   --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/gen_scale100.scala
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val out = "/tmp/scale100"
val reps = spark.range(100).select(col("id").as("rep"))
def replicate(t: String, shifts: Map[String, Long]): Unit = {
  val df = spark.read.parquet(s"$src/$t.parquet")
  val rep = df.crossJoin(broadcast(reps))
  val shifted = shifts.foldLeft(rep) { case (d, (c, base)) =>
    d.withColumn(c, col(c) + col("rep") * base)
  }.drop("rep")
  shifted.write.mode("overwrite").parquet(s"$out/$t.parquet")
  println(s"ZGEN $t rows=" + spark.read.parquet(s"$out/$t.parquet").count())
}
replicate("events", Map("event_id" -> 1000000000L, "user_id" -> 100000L))
replicate("orders", Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
replicate("lineitem", Map("l_orderkey" -> 1000000000L, "l_partkey" -> 10000000L,
  "l_suppkey" -> 1000000L))
replicate("customer", Map("c_custkey" -> 10000000L))
replicate("part", Map("p_partkey" -> 10000000L))
replicate("supplier", Map("s_suppkey" -> 1000000L))
replicate("documents", Map("doc_id" -> 100000000L))
replicate("embeddings", Map("vec_id" -> 100000000L))
for (t <- Seq("nation", "region")) {
  spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
  println(s"ZGEN $t copied")
}
println("ZGEN done")
sys.exit(0)
