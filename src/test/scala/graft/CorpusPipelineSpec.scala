package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation: planted PII is scrubbed, the low-quality
  * doc is gated out, the best-quality exact duplicate survives, near-dup
  * clusters collapse to one canonical doc, the split is deterministic, and
  * the partitioned write prunes by split.
  */
class CorpusPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val fixture = {
    val d = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val good = "the quick brown fox jumps over the lazy dog and keeps running through the field " * 3
    Seq(
      // exact dups (identical text ⇒ identical score; tie → lower doc_id wins)
      (1L, good, "en", "web", 0L),
      (2L, good, "en", "web", 0L),
      // near dup of 1 (one word changed in one repeat; J = 0.83 and verified
      // to band-collide under the md5 family) — same cluster, canonical is
      // the smallest member
      (3L, good.replaceFirst("keeps running", "keeps jogging"), "en", "web", 0L),
      // PII doc, decent quality
      (4L, "please contact me at someone@example.com about the meeting " +
        "we planned for next week in the main office with all of the team there", "en", "web", 0L),
      // low quality: too short, no stopwords
      (5L, "x1 z9 q7", "en", "web", 0L),
      // independent good doc
      (6L, "a completely different story about the weather in the mountains " +
        "where it rains for days and the rivers overflow into the valley below", "de", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(d + "/documents.parquet")
    d
  }

  test("stage counts are monotone and each gate does its job") {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus_out").toString + "/corpus"
    val r = CorpusPipeline.run(spark, fixture, Some(out), minQuality = 0.5, nearThreshold = 0.5)
    assert(r.nRaw == 6L)
    assert(r.nQuality == 5L, "the low-quality doc must be gated out")
    assert(r.nExactDeduped == 4L, "exact dups 1/2 collapse to one survivor")
    assert(r.nFinal == 3L, "near-dup cluster {survivor, 3} collapses to its canonical doc")

    val persisted = spark.read.parquet(out)
    // PII scrubbed everywhere downstream
    val pii = persisted.filter(col("text").contains("example.com")).count()
    assert(pii == 0L, "raw email leaked through redaction")
    assert(persisted.filter(col("text").contains("[EMAIL]")).count() == 1L)
    // the near-dup survivor is the component's canonical (smallest) doc
    assert(persisted.filter(col("doc_id").isin(2L, 3L)).count() == 0L)
    assert(persisted.filter(col("doc_id") === 1L).count() == 1L)
    // split column partitions the output directory
    val splits = persisted.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.nonEmpty)
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("split=")))
  }

  test("re-run is idempotent and the split is deterministic") {
    val r1 = CorpusPipeline.run(spark, fixture, None, minQuality = 0.5, nearThreshold = 0.5)
    val r2 = CorpusPipeline.run(spark, fixture, None, minQuality = 0.5, nearThreshold = 0.5)
    assert(r1.nFinal == r2.nFinal)
    val p1 = r1.profile.collect().map(_.toSeq)
    val p2 = r2.profile.collect().map(_.toSeq)
    assert(p1.toSeq == p2.toSeq, "profile must be bit-identical across runs")
  }
}
