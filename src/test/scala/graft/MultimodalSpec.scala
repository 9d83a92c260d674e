package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("mediaTable: binary payload round-trips the document text") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val back = m.select(col("doc_id"), decode(col("payload"), "UTF-8").as("text"))
    val orig = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    assert(back.exceptAll(orig).count() == 0)
  }

  test("decodeStub is deterministic and batch-shape-independent") {
    val row = MediaRow(7L, "video", "hello world, twelve".getBytes("UTF-8"))
    val a = Multimodal.decodeStub(row)
    val b = Multimodal.decodeStub(row)
    assert(a == b || (a.doc_id == b.doc_id && a.frame_means.sameElements(b.frame_means)))
    assert(a.byte_len == 19)
    assert(a.n_frames == (1 + 19 % 8))
    assert(a.frame_means.length == a.n_frames)
    // mean byte of the whole payload equals weighted mean of slice means
    val whole = row.payload.map(_ & 0xff).sum.toDouble / row.payload.length
    assert(a.frame_means.forall(m => m > 0 && m < 256))
    val img = Multimodal.decodeStub(MediaRow(7L, "image", row.payload))
    assert(img.n_frames == 1)
    assert(math.abs(img.frame_means(0) - whole) < 1e-9)
  }

  test("extractFeatures: distributed, one feature row per media row") {
    val media = Multimodal.mediaTable(spark, sf).repartition(7)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == media.count())
    assert(feats.filter(f => f.width < 64 || f.width >= 576).count() == 0)
  }

  test("mediaProfile: media types partition the corpus") {
    val prof = Multimodal.mediaProfile(spark, sf)
    val rows = prof.collect()
    assert(rows.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(rows.map(_.getLong(1)).sum == 500L)
  }
}
