// q236 phase decomposition (guide §1: attribute before changing).
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=2000 --driver-memory 8g \
//     --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//     -I tools/opt_phase_q236_r19.scala
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.GraphOps
import java.nio.file.Paths

val dir = sys.env.getOrElse("OPT_SF", "/root/testdata/sf0.1")
def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
}

// warm: one full q236 run (also materializes the split + pristine MV caches)
t("warm_full_q236") { graft.SparkEntry.queries("q236_sym_merge_stream")(spark, dir).count() }

val srcPath = Paths.get(dir, "lineitem.parquet")
val baseName = "copurchase_symb90p"
val outName = "copurchase_symb90p_out"
val bkt = Seq("u", "v")

// locate the materialized split files (newest fingerprint dir under the tag)
val splitFiles: Seq[String] = {
  import scala.jdk.CollectionConverters._
  val tagRoot = Paths.get(System.getProperty("java.io.tmpdir"), "graft_symdelta_split")
  val w = java.nio.file.Files.walk(tagRoot)
  try w.iterator().asScala.map(_.toString)
    .filter(p => p.contains("part-") && p.endsWith(".parquet")).toSeq.sorted
  finally w.close()
}
println(s"PHASE split_files ${splitFiles.size}")

def applyBatch(batchId: Long, b: org.apache.spark.sql.DataFrame): Unit =
  Tables.chainStep(spark, srcPath, outName, batchId, 32, bkt, bkt, retain = 2) { prev =>
    val cur = prev.getOrElse(
      Tables.bucketedMv(spark, srcPath, baseName, 32, bkt, bkt)(
        sys.error("pristine MV should be cached")))
    GraphOps.mergeSymDelta(cur, GraphOps.copurchaseEdgesOf(b))
  }

for (round <- 1 to 2) {
  t(s"r${round}_pristineMv_read") {
    Tables.bucketedMv(spark, srcPath, baseName, 32, bkt, bkt)(
      sys.error("should be cached")).count()
  }
  t(s"r${round}_resetChain") { Tables.resetChain(spark, srcPath, outName) }
  splitFiles.zipWithIndex.foreach { case (f, i) =>
    t(s"r${round}_batch$i") { applyBatch(i.toLong, spark.read.parquet(f)) }
  }
  t(s"r${round}_chainLatest_read") {
    Tables.chainLatest(spark, srcPath, outName, 32, bkt, bkt).get
      .select(col("u"), col("v"), col("w").cast("long").as("w"),
        col("deg_u").cast("long").as("deg_u"))
      .orderBy("u", "v")
      .localCheckpoint(true).count()
  }
  t(s"r${round}_resetChain2") { Tables.resetChain(spark, srcPath, outName) }
  t(s"r${round}_full_q236") { graft.SparkEntry.queries("q236_sym_merge_stream")(spark, dir).count() }
}
// batch-level sub-decomposition: merge compute vs bucketed write-back.
// batch0: merge output materialized to noop (no write) vs the chainStep write.
Tables.resetChain(spark, srcPath, outName)
val b0 = spark.read.parquet(splitFiles.head)
val base = Tables.bucketedMv(spark, srcPath, baseName, 32, bkt, bkt)(sys.error("cached"))
t("merge0_noop") {
  GraphOps.mergeSymDelta(base, GraphOps.copurchaseEdgesOf(b0))
    .write.format("noop").mode("overwrite").save()
}
t("merge0_chainstep_write") { applyBatch(0L, b0) }
val s1 = Tables.chainLatest(spark, srcPath, outName, 32, bkt, bkt).get
t("merge1_noop") {
  GraphOps.mergeSymDelta(s1, GraphOps.copurchaseEdgesOf(spark.read.parquet(splitFiles(1))))
    .write.format("noop").mode("overwrite").save()
}
t("base_count") { println("rows=" + base.count()) }
for (i <- 1 to 3) t(s"system_gc_$i") { System.gc() }
sys.exit(0)
