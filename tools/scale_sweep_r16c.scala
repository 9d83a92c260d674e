import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100b")
def canary(): Double = { val t0=System.nanoTime(); spark.range(0L,10000000L,1L,32).selectExpr("(id*2654435761)%1000003 AS k","id%97 AS v").groupBy("k").agg(sum("v").as("s")).orderBy(col("s").desc).limit(10).count(); (System.nanoTime()-t0)/1e9 }
canary(); println(f"ZI canary_start ${Seq(canary(),canary()).min}%.3f")
spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
def leg(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = { val t0=System.nanoTime(); f.count(); println(f"ZI $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); println(f"ZI canary_$tag ${canary()}%.3f") }
for (round <- 1 to 2) {
  leg(s"q238_float_r$round") { graft.operators.Similarity.ivfDurableRefreshBucketed(spark, dir) }
  leg(s"q240_int8_r$round") { graft.operators.Similarity.int8IvfDurableRefresh(spark, dir) }
}
val src = java.nio.file.Paths.get(dir, "embeddings.parquet")
def mvBytes(name: String): Long = { val p = graft.sources.Tables.publishedMvPath(src, name).get; val l = java.nio.file.Files.list(p); try { import scala.jdk.CollectionConverters._; l.iterator().asScala.map(f => java.nio.file.Files.size(f)).sum } finally l.close() }
println(s"ZI bytes_float ${mvBytes("ivf_assign_d90_8_3_b1")} bytes_int8 ${mvBytes("ivf_q8_d90_8_3_b1")}")
println(f"ZI canary_end ${canary()}%.3f")
sys.exit(0)
