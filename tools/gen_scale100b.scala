// /tmp/scale100b: the SAME 100x replica corpus as gen_scale100.scala but
// written as 32 files per table (round-robin repartition before write).
//
// Why (round-13 finding): the original generator's crossJoin(broadcast)
// expands rows inside the scan task, so every output table inherited the
// SOURCE file's partitioning — one file, ONE ROW GROUP. A single-row-group
// parquet file admits exactly one scan task no matter how it is
// range-split, so every 100x sweep number over documents (500k rows),
// events (10M rows) or embeddings (200k rows) ran its scan-stage work —
// normalize, tokenize, chunk, decode — on ONE of 32 cores. At 100 TB the
// input is thousands of files and the scan parallelizes by construction;
// the multi-file layout is the representative one, the single-file corpus
// understates the engine (conservative, but wrong to tune against).
// SCALING.md carries bridge measurements for both layouts.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g -I tools/gen_scale100b.scala
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val out = "/tmp/scale100b"
val reps = spark.range(100).select(col("id").as("rep"))
def replicate(t: String, shifts: Map[String, Long]): Unit = {
  val df = spark.read.parquet(s"$src/$t.parquet")
  val rep = df.crossJoin(broadcast(reps))
  val shifted = shifts.foldLeft(rep) { case (d, (c, base)) =>
    d.withColumn(c, col(c) + col("rep") * base)
  }.drop("rep")
  shifted.repartition(32).write.mode("overwrite").parquet(s"$out/$t.parquet")
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
