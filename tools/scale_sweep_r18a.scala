// Round-18 sweep: q245 durable PQ, q246/q247 semantic decontam at 100x
// (/tmp/scale100b: 500k docs / 200k vectors).
//
//   - q245 vs the static q205 rebuild, interleaved: round 1 is the
//     first-touch build (split books MV + standing code table), round 2
//     the steady state a deployment pays per refresh (resetChain + 2
//     encode steps + ADC probe). PQ codebook size does NOT scale with the
//     corpus (fixed nCodes per subspace, the Jegou design), so the gate
//     knobs are kept — only the corpus grows.
//   - q246 at nCells = 200 (the q90/q242 100x precedent: cells scale with
//     the corpus, ~1k vectors/cell) vs the n-gram q222 cut, interleaved —
//     the two decontam passes a production ingest runs side by side.
//     Brute-force comparison is deliberately absent at this scale: the
//     honest reference is |bench|x|corpus| ~ 1.9B cosines, exactly the
//     pair space the cell probe exists to avoid (recall vs brute is
//     pinned at gate SF in SimilaritySpec).
//   - q247 measures the streaming lifecycle overhead over batch q246.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 24g --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//   -I tools/sweep_harness.scala -I tools/scale_sweep_r18a.scala
import graft.operators.{Similarity, TextOps}
import graft.sources.Tables
sweepStart()
for (round <- 1 to 2) {
  leg(s"q245_pq_durable_r$round") {
    Similarity.pqDurableRefresh(spark, sweepDir)
  }
  leg(s"q205_pq_rebuild_r$round") {
    Similarity.pqKnn(Tables.embeddings(spark, sweepDir))
  }
  leg(s"q246_semantic_decontam_k200_r$round") {
    Similarity.semanticDecontam(spark, sweepDir, nCells = 200)
  }
  legUnit(s"q222_ngram_decontam_sink_r$round") {
    TextOps.benchmarkDecontam(spark, sweepDir)
      .write.mode("overwrite").parquet("/tmp/sweep_r18_q222_out")
  }
  leg(s"q247_semantic_decontam_stream_k8_r$round") {
    // the stream twin keeps the gate's default nCells=8 (its centroid MV
    // is resolved inside the gate); the k200 batch leg above carries the
    // cells-scale story — this leg isolates LIFECYCLE overhead vs the
    // same-knob batch call below
    graft.streaming.StreamingOps.semanticDecontamStreamParity(spark, sweepDir)
  }
  leg(s"q246_semantic_decontam_k8_r$round") {
    Similarity.semanticDecontam(spark, sweepDir)
  }
}
sweepEnd()
