package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("bruteKnn: k rows per query, ranks 1..k, self excluded, sims descending") {
    val out = Similarity.bruteKnn(spark, sf, 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 15)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rows.forall(_._2 != q))
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshKnn: high recall vs exact top-k on clustered vectors") {
    // LSH recall is a function of true neighbor similarity, so test it where
    // neighbors actually ARE similar: 10 cluster centers, 20 noisy members
    // each (cosine within a cluster ≈ 0.95+). The testdata embeddings are
    // uniform random (top-3 sims ~0.35) — no bucketing scheme separates that
    // regime from brute force, which is why q35 is a rows-only check.
    val rng = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(10, dim)(rng.nextGaussian())
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = centers(c).map(x => x + 0.15 * rng.nextGaussian())
      (c * 20L + m, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val exact = Similarity.bruteKnnFrom(emb, 5, 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshKnnFrom(emb, 5, 3, dim)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (approx=$approx exact=$exact)")
  }

  test("labelCentroids: one row per (label, dim); centroid of a label with one vector is the vector") {
    val out = Similarity.labelCentroids(spark, sf)
    val dims = out.groupBy("label").count().select("count").distinct().as[Long].collect()
    assert(dims.toSeq == Seq(64L))
  }

  test("centroidSimilarity: all unordered label pairs, sim in [-1, 1]") {
    val out = Similarity.centroidSimilarity(spark, sf).collect()
    val labels = Similarity.labelCentroids(spark, sf)
      .select("label").distinct().count()
    assert(out.length == (labels * (labels - 1) / 2).toInt)
    assert(out.forall { r =>
      val s = r.getDouble(2); s >= -1.0000001 && s <= 1.0000001
    })
  }
}
