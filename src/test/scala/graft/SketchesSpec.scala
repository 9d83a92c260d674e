package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------------------
  // KMV
  // ---------------------------------------------------------------------------

  test("KMV is exact below k and within the theoretical error bound above it") {
    val rows = (1 to 5000).map(i => ("big", i.toLong)) ++
      (1 to 7).map(i => ("small", i.toLong))
    val df = rows.toDF("event_type", "user_id").repartition(8)
    val out = Sketches.kmvDistinct(df, k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // below k: the sketch IS the distinct set — exact
    assert(out("small") == ((7L, 7.0)))
    // above k: (k-1)/R_k; for k=64 the standard deviation is ~n/sqrt(k-2)
    // ≈ 12.7% — assert a generous 4-sigma envelope (deterministic data,
    // deterministic hash: this is a fixed number, the bound documents WHY)
    val (nd, est) = out("big")
    assert(nd == 5000L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.5, s"estimate $est too far from 5000")
  }

  test("KMV sketches merge: sketch(A union B) == merge over the union of hash sets") {
    val a = (1 to 3000).map(i => ("t", i.toLong)).toDF("event_type", "user_id")
    val b = (2000 to 6000).map(i => ("t", i.toLong)).toDF("event_type", "user_id")
    val whole = Sketches.kmvDistinct(a.union(b), k = 32).collect().head
    // merging = running the same sketch over the concatenated streams; KMV
    // state is the k smallest distinct hashes, which is associative
    val merged = Sketches.kmvDistinct(b.union(a), k = 32).collect().head
    assert(whole.getDouble(2) == merged.getDouble(2))
    assert(whole.getLong(1) == 6000L) // 1..3000 union 2000..6000 = 1..6000
  }

  test("KMV gate shape on testdata: one row per event_type, est from exact kth hash") {
    val out = Sketches.kmvDistinctGate(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    // estimates positive and no bigger than a few multiples of truth
    rows.foreach { r =>
      val (nd, est) = (r.getLong(1), r.getDouble(2))
      assert(est > 0 && est < nd * 5.0 + 64)
    }
  }

  // ---------------------------------------------------------------------------
  // CMS
  // ---------------------------------------------------------------------------

  test("CMS never underestimates and is exact on dominant keys in a sparse sketch") {
    val rows = (1 to 2000).map(_ => 1L) ++ (1 to 500).map(_ => 2L) ++
      (1 to 30).flatMap(i => Seq.fill(3)(100L + i))
    val df = rows.map(u => (u, "e")).toDF("user_id", "event_type").repartition(8)
    val out = Sketches.cmsHeavyHitters(df, depth = 4, width = 64, topN = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (_, exact, est) => assert(est >= exact) }
    // the two heavy keys top the exact ranking
    assert(out.take(2).map(_._1).toSet == Set(1L, 2L))
  }

  test("CMS estimate equals min over depth rows of the cell relation") {
    val df = (1 to 300).map(i => ((i % 7).toLong, "e")).toDF("user_id", "event_type")
    val cells = Sketches.cmsCells(df, "user_id", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cell relation bounded by depth*width and counts sum to depth*n
    assert(cells.size <= 4 * 64)
    assert(cells.values.sum == 4L * 300)
    val hh = Sketches.cmsHeavyHitters(df, 4, 64, 3).collect()
    hh.foreach { r => assert(r.getLong(2) >= r.getLong(1)) }
  }
}
