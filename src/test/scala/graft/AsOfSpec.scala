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
}
