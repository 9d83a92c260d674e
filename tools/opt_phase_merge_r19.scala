// mergeSymDelta subtree decomposition (q217/q232/q236 hot path).
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.GraphOps
import java.nio.file.Paths

val dir = sys.env.getOrElse("OPT_SF", "/root/testdata/sf0.1")
def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f"); r
}
val srcPath = Paths.get(dir, "lineitem.parquet")
val bkt = Seq("u", "v")
val li = Tables.lineitem(spark, dir).select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
val base = Tables.bucketedMv(spark, srcPath, "copurchase_symb90p", 32, bkt, bkt)(
  sys.error("pristine MV must exist — run after a q236 pass"))
val deltaEdges = GraphOps.copurchaseEdgesOf(li.filter(col("ok") % 10 === 0))
val _sanity = deltaEdges.columns.toList

// warm everything once
t("warm_full_merge_noop") {
  GraphOps.mergeSymDelta(base, deltaEdges).write.format("noop").mode("overwrite").save()
}

for (r <- 1 to 2) {
  val symDelta = (deltaEdges.select(col("src").as("u"), col("dst").as("v"), col("w"))
    .union(deltaEdges.select(col("dst").as("u"), col("src").as("v"), col("w"))))
  val deltaAgg = t(s"r${r}_deltaAgg_ckpt") {
    symDelta.groupBy("u", "v").agg(sum(col("w")).as("dw")).localCheckpoint(true)
  }
  println(s"  deltaAgg rows=${deltaAgg.count()}")
  t(s"r${r}_grown_noop") {
    base.join(deltaAgg, Seq("u", "v"), "left")
      .select(col("u"), col("v"), (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
      .write.format("noop").mode("overwrite").save()
  }
  val fresh = (deltaAgg.join(base.select("u", "v"), Seq("u", "v"), "left_anti")
    .select(col("u"), col("v"), col("dw").as("w")))
  t(s"r${r}_fresh_noop") { fresh.write.format("noop").mode("overwrite").save() }
  val baseDeg = base.select(col("u"), col("deg_u")).distinct()
  t(s"r${r}_baseDeg_noop") { baseDeg.write.format("noop").mode("overwrite").save() }
  val freshCnt = fresh.groupBy("u").agg(count(lit(1)).as("d"))
  val newDeg = (baseDeg.join(freshCnt, Seq("u"), "full_outer")
    .select(col("u"),
      (coalesce(col("deg_u"), lit(0L)) + coalesce(col("d"), lit(0L))).as("deg_u")))
  t(s"r${r}_newDeg_noop") { newDeg.write.format("noop").mode("overwrite").save() }
  t(s"r${r}_full_merge_noop") {
    GraphOps.mergeSymDelta(base, deltaEdges).write.format("noop").mode("overwrite").save()
  }
  t(s"r${r}_deltaEdges_noop") { deltaEdges.write.format("noop").mode("overwrite").save() }
}
// plan shape of the full merge
val plan = GraphOps.mergeSymDelta(base, deltaEdges).queryExecution.executedPlan.toString
println("PLAN_HEAD:")
println(plan.split("\n").filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort ") || l.contains("Scan") || l.contains("Aggregate")).mkString("\n"))
sys.exit(0)
