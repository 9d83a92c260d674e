// Round-12 streaming 100x sweep with a StreamingQueryListener recording
// per-query MAX state rows/bytes (same launch line as scale_sweep_r12).
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
// capture per-query max state rows + memory from progress events
val stateMax = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
spark.streams.addListener(new StreamingQueryListener {
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val rows = p.stateOperators.map(_.numRowsTotal).sum
    val mem = p.stateOperators.map(_.memoryUsedBytes).sum
    stateMax.merge(p.name match { case null => "unnamed"; case n => n },
      (rows, mem), (a, b) => (math.max(a._1, b._1), math.max(a._2, b._2)))
  }
})
val dir = "/tmp/scale100"
val names = Seq("q155_stream_cdc_apply", "q165_stream_ema", "q169_stream_sliding", "q185_stream_late_drop")
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  for (p <- 1 to 2) {
    val t0 = System.nanoTime()
    val c = try fn(spark, dir).count() catch { case e: Throwable => println(s"ZT $n ERROR ${e.toString.take(200)}"); -1L }
    println(f"ZT $n pass$p ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c")
  }
}
println("ZT STATE " + stateMax.toString)
println("ZT DONE")
sys.exit(0)
