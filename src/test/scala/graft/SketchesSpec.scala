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

  // ---------------------------------------------------------------------------
  // Misra–Gries exact heavy hitters (q172)
  // ---------------------------------------------------------------------------

  /** Deterministic Zipf-ish stream: key i appears ceil(400/i) times for
    * i = 1..400 — 400 distinct keys, so a 32-counter sketch is forced to
    * evict constantly on every partition and on every merge.
    */
  private def zipfRows = (1 to 400).flatMap(i => Seq.fill(400 / i + 1)(s"k$i"))

  test("MG guarantee under eviction: every key with freq > n/(k+1) survives the sketch") {
    val df = zipfRows.toDF("key").repartition(8)
    val n = zipfRows.size.toLong
    val k = 32
    val sketch = df
      .agg(graft.functions.MisraGriesKeys.mgKeys(col("key"), k).as("s"))
      .select(col("s.total"), col("s.keys")).collect().head
    assert(sketch.getLong(0) == n)
    val kept = sketch.getSeq[String](1).toSet
    assert(kept.size <= k)
    val exact = zipfRows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter { case (_, c) => c > n.toDouble / (k + 1) }.keySet
    assert(mustKeep.nonEmpty && (mustKeep -- kept).isEmpty,
      s"guarantee violated: missing ${mustKeep -- kept}")
  }

  test("two-pass exact heavy hitters == brute-force GROUP BY HAVING, any partitioning") {
    val n = zipfRows.size.toLong
    val phi = 20.0
    val exact = zipfRows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c > n / phi }
    for (parts <- Seq(1, 3, 16)) {
      val df = zipfRows.toDF("key").repartition(parts)
      val out = Sketches.exactHeavyHitters(df, "key", capacity = 32, phi = phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == exact, s"parts=$parts")
    }
  }

  test("exact heavy hitters rejects a threshold below the sketch guarantee") {
    val df = Seq("a", "b").toDF("key")
    intercept[IllegalArgumentException] {
      Sketches.exactHeavyHitters(df, "key", capacity = 8, phi = 10.0)
    }
  }

  test("MG summary serialization round-trips through merge") {
    val a = new graft.functions.MGSummary(4)
    Seq("x", "x", "x", "y", "z", "w", "v").foreach(a.add)
    val b = graft.functions.MGSummary.fromBytes(4, a.toBytes)
    assert(b.total == a.total && b.keysSorted.sameElements(a.keysSorted))
    val c = new graft.functions.MGSummary(4)
    Seq("x", "q", "q", "q").foreach(c.add)
    b.mergeIn(c)
    assert(b.total == 11)
    assert(b.keysSorted.length <= 4)
    assert(b.keysSorted.contains("x")) // freq 4 > 11/5 — must survive the merge
  }
}
