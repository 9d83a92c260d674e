package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("pageRank: one iteration on a path graph matches the hand computation") {
    // 1 - 2 - 3: deg(1)=deg(3)=1, deg(2)=2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = GraphOps.pageRank(edges, 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // r1(1) = 0.15 + 0.85 * r0(2)/deg(2) = 0.15 + 0.425 = 0.575 (and 3 by symmetry)
    // r1(2) = 0.15 + 0.85 * (r0(1)/1 + r0(3)/1) = 1.85
    assert(r1(1L) == ((1L, 0.575)))
    assert(r1(3L) == ((1L, 0.575)))
    assert(r1(2L) == ((2L, 1.85)))
  }

  test("pageRank: scaled formulation conserves total rank = N (no dangling nodes on an undirected graph)") {
    val edges = GraphOps.copurchaseEdges(spark, sf)
    val pr = GraphOps.pageRank(edges, 3)
    val n = pr.count().toDouble
    val total = pr.agg(sum("rank")).as[Double].head()
    // exact up to the per-iteration 6-decimal quantization
    assert(math.abs(total - n) < n * 1e-5, s"rank mass $total != $n")
  }

  test("copurchaseEdges: src<dst, no self loops, weights = shared-order counts") {
    val edges = GraphOps.copurchaseEdges(spark, sf).collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "edge not canonicalized src<dst")
      assert(r.getLong(2) >= 1L)
    }
    // recompute one edge's weight from first principles
    val (s, d, w) = (edges.head.getLong(0), edges.head.getLong(1), edges.head.getLong(2))
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val expect = li.filter(col("pk") === s).select("ok")
      .join(li.filter(col("pk") === d).select("ok"), "ok").count()
    assert(w == expect, s"edge ($s,$d) weight $w != recomputed $expect")
  }
}
