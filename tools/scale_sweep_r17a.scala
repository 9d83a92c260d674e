// Round-17 sweep A (the first config-only sweep on tools/sweep_harness.scala):
// q242 durable incremental SemDeDup and q243 min-run span cut at 100x
// (/tmp/scale100b: 500k docs / 200k vectors).
//
//   - q242 runs at nCells = 200 (the q90 100x precedent: cells scale with
//     the corpus, k ~ n/1000, keeping ~1k vectors/cell). Round 1 is the
//     first-touch build (centroid MV + standing state incl. the base
//     pair pass); round 2 is the steady state the deployment pays per
//     refresh: resetChain + 2 batch steps (batch x cell pairs only) +
//     census. The full-rebuild comparator is q90's semanticDedup at the
//     same k, interleaved.
//   - q243/q214 are sink-measured (a bare count() lets Catalyst eliminate
//     the clean through the unique-key left join — the r13 finding), both
//     probing the same standing dup-shingle MV.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/sweep_harness.scala -I tools/scale_sweep_r17a.scala
import graft.operators.{Similarity, TextOps}
import graft.sources.Tables
sweepStart()
for (round <- 1 to 2) {
  leg(s"q242_semdedup_durable_k200_r$round") {
    Similarity.semanticDedupDurable(spark, sweepDir, nCells = 200)
  }
  leg(s"q90_semdedup_rebuild_k200_r$round") {
    Similarity.semanticDedup(Tables.embeddings(spark, sweepDir), nCells = 200)
  }
  legUnit(s"q243_min_run_sink_r$round") {
    TextOps.spanCutCleanRunsAgainst(Tables.documents(spark, sweepDir),
        TextOps.dupShinglesMV(spark, sweepDir), TextOps.SpanCutMinRunTokens)
      .write.mode("overwrite").parquet("/tmp/sweep_r17_q243_out")
  }
  legUnit(s"q214_span_cut_sink_r$round") {
    TextOps.spanCutClean(spark, sweepDir)
      .write.mode("overwrite").parquet("/tmp/sweep_r17_q214_out")
  }
}
sweepEnd()
