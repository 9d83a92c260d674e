package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val probe = Seq(
    (1L, "A", 10L), (2L, "A", 14L), (3L, "B", 100L), (4L, "C", 5L)
  ).toDF("id", "sym", "d")

  private lazy val build = Seq(
    ("A", 7L, 1.0), ("A", 10L, 2.0), ("A", 13L, 3.0),
    ("A", 18L, 4.0), ("B", 97L, 5.0), ("B", 104L, 6.0)
  ).toDF("sym", "d", "px")

  test("bandJoin equals the naive inequality join, boundaries inclusive") {
    val banded = RangeJoin.bandJoin(probe, build, "sym", "d", 3L, Seq("px"))
      .select("id", "r_d", "r_px")
      .as[(Long, Long, Double)].collect().toSet
    val b2 = build.toDF("bsym", "bd", "px")
    val naive = probe.join(b2,
        probe("sym") === b2("bsym") && abs(probe("d") - b2("bd")) <= 3)
      .select(col("id"), col("bd"), col("px"))
      .as[(Long, Long, Double)].collect().toSet
    assert(banded == naive)
    // spot-check semantics: id=1 (d=10) matches bars at 7,10,13 — NOT 18
    assert(banded.filter(_._1 == 1L).map(_._2) == Set(7L, 10L, 13L))
    // id=4: key with no build rows — absent (inner join)
    assert(!banded.exists(_._1 == 4L))
  }

  test("plan: equi-join on (key, bucket), no nested-loop") {
    val plan = RangeJoin.bandJoin(probe, build, "sym", "d", 3L, Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a cross product:\n$plan")
  }
}
