package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Distributive 2-D skyline: the bucketed sweep must equal the quadratic
  * dominance definition on arbitrary inputs, bucket counts, and duplicate
  * structure.
  */
class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  /** Quadratic reference: keep p iff no q dominates it. */
  private def brute(pts: Seq[(Long, Double, Long)]): Set[(Long, Double, Long)] =
    pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.toSet

  private def run(pts: Seq[(Long, Double, Long)], buckets: Int): Set[(Long, Double, Long)] =
    Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y", buckets)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

  test("matches the quadratic definition on random inputs, all bucket counts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5; buckets <- Seq(1, 3, 32)) {
      // duplicate-rich domain so equal-x and equal-(x,y) cases occur
      val pts = (1L to 200L).map(i =>
        (i + trial * 1000, (rnd.nextInt(20) * 0.5), rnd.nextInt(15).toLong))
      assert(run(pts, buckets) == brute(pts), s"trial=$trial buckets=$buckets")
    }
  }

  test("duplicate frontier points are BOTH kept (no strict dominator)") {
    val pts = Seq((1L, 1.0, 10L), (2L, 1.0, 10L), (3L, 2.0, 5L))
    assert(run(pts, 4) == Set((1L, 1.0, 10L), (2L, 1.0, 10L)))
  }

  test("equal-x strict-y dominance prunes within a price level") {
    val pts = Seq((1L, 1.0, 10L), (2L, 1.0, 9L), (3L, 0.5, 1L))
    // (2) loses to (1) at the same x; (3) survives as the cheapest point
    assert(run(pts, 4) == Set((1L, 1.0, 10L), (3L, 0.5, 1L)))
  }

  test("all-equal x collapses to one bucket (zero width) without error") {
    val pts = Seq((1L, 3.0, 1L), (2L, 3.0, 7L), (3L, 3.0, 7L), (4L, 3.0, 2L))
    assert(run(pts, 8) == Set((2L, 3.0, 7L), (3L, 3.0, 7L)))
  }

  test("empty input yields an empty skyline") {
    assert(run(Seq.empty, 4) == Set.empty)
  }

  test("plan carries no cartesian/nested-loop join (the sweep, not the definition)") {
    val plan = Skyline.paretoParts(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
