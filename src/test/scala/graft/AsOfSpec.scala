package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val quotes = Seq(
    ("A", 10L, 100.0),
    ("A", 20L, 110.0),
    ("A", 30L, 120.0),
    ("B", 15L, 50.0)
  ).toDF("sym", "t", "px")

  private lazy val trades = Seq(
    (1L, "A", 5L),    // before any quote
    (2L, "A", 20L),   // exactly at a quote
    (3L, "A", 25L),   // between quotes
    (4L, "A", 99L),   // after all quotes
    (5L, "B", 15L),
    (6L, "C", 50L)    // key with no quotes at all
  ).toDF("id", "sym", "t")

  test("backward-inclusive: ties take the same-ord quote") {
    val out = AsOf.asofJoin(trades, quotes, "sym", "t", Seq("px"))
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(110.0))
    assert(out(3L).contains(110.0))
    assert(out(4L).contains(120.0))
    assert(out(5L).contains(50.0))
    assert(out(6L).isEmpty)
  }

  test("strict: ties take the previous quote instead") {
    val out = AsOf.asofJoin(trades, quotes, "sym", "t", Seq("px"), strict = true)
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).contains(100.0))   // t=20 quote no longer visible
    assert(out(3L).contains(110.0))
    assert(out(5L).isEmpty)           // B's only quote is at the same ord
  }

  test("left row count and columns are preserved") {
    val out = AsOf.asofJoin(trades, quotes, "sym", "t", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("id", "sym", "t", "asof_px"))
  }

  test("plan: one exchange on the key, no cross/range join") {
    val plan = AsOf.asofJoin(trades, quotes, "sym", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("forward-inclusive: the earliest quote at-or-after; ties take it") {
    val out = AsOf.asofJoinForward(trades, quotes, "sym", "t", Seq("px"))
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(100.0)) // t=5 -> quote at 10
    assert(out(2L).contains(110.0)) // tie at 20 taken
    assert(out(3L).contains(120.0)) // t=25 -> quote at 30
    assert(out(4L).isEmpty)         // nothing after 99
    assert(out(5L).contains(50.0))
    assert(out(6L).isEmpty)
  }

  test("forward strict: the tie at equal ord is skipped") {
    val out = AsOf.asofJoinForward(trades, quotes, "sym", "t", Seq("px"), strict = true)
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).contains(120.0)) // t=20 strict -> next quote at 30
    assert(out(5L).isEmpty)         // B's only quote is AT 15
  }

  test("nearest: closer side wins, ties go backward, tolerance excludes") {
    val out = AsOf.asofJoinNearest(trades, quotes, "sym", "t", Seq("px"))
      .select("id", "asof_px", "asof_t").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(100.0), Some(10L)))  // only forward exists
    assert(out(2L) == (Some(110.0), Some(20L)))  // exact hit
    assert(out(3L) == (Some(110.0), Some(20L)))  // d=5 both ways -> backward
    assert(out(4L) == (Some(120.0), Some(30L)))  // only backward exists
    assert(out(6L) == (None, None))
    val tight = AsOf.asofJoinNearest(trades, quotes, "sym", "t", Seq("px"),
        tolerance = Some(4L))
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tight(1L).isEmpty && tight(3L).isEmpty && tight(4L).isEmpty)
    assert(tight(2L).contains(110.0)) // d=0 within any tolerance
  }
}
