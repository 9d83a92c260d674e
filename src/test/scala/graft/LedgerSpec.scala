package graft

import graft.operators.Ledger
import graft.sources.Tables

/** FIFO lot matching: the banded interval-overlap join must agree with a
  * literal sequential FIFO walk (oldest open lot consumed first).
  */
class LedgerSpec extends SparkSpecBase {

  private case class Lot(ship: java.time.LocalDate, qty: Long)

  test("fifoMatch agrees with a sequential per-part FIFO simulation") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_returnflag", "CAST(l_shipdate AS DATE) AS ship",
        "l_orderkey", "l_linenumber", "CAST(l_quantity AS BIGINT) AS qty")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate,
        r.getLong(3), r.getInt(4), r.getLong(5)))

    def stream(flag: String) = li.filter(_._2 == flag)
      .sortBy(t => (t._3.toEpochDay, t._4, t._5))
      .groupBy(_._1).map { case (pk, rows) =>
        pk -> rows.sortBy(t => (t._3.toEpochDay, t._4, t._5))
          .map(t => Lot(t._3, t._6)).toList
      }

    val adds = stream("N")
    val rems = stream("R")

    // sequential FIFO walk: consume the oldest open add lot first
    val expected = adds.keySet.intersect(rems.keySet).map { pk =>
      var open = adds(pk) // head = oldest
      var pairs = 0L
      var matched = 0L
      var lagUnits = 0L
      rems(pk).foreach { r =>
        var need = r.qty
        while (need > 0 && open.nonEmpty) {
          val a = open.head
          val take = math.min(need, a.qty)
          pairs += 1
          matched += take
          lagUnits += take * (r.ship.toEpochDay - a.ship.toEpochDay)
          need -= take
          open = if (take == a.qty) open.tail
                 else Lot(a.ship, a.qty - take) :: open.tail
        }
      }
      pk -> ((pairs, matched, lagUnits))
    }.toMap

    val got = Ledger.fifoMatch(Tables.lineitem(spark, sf)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(3), r.getLong(5), r.getLong(1), r.getLong(2))))
      .toMap

    assert(got.keySet == expected.keySet)
    expected.foreach { case (pk, (pairs, matched, lag)) =>
      val (gPairs, gMatched, gLag, addQty, remQty) = got(pk)
      assert(gMatched == matched, s"part $pk matched")
      assert(gPairs == pairs, s"part $pk pairs")
      assert(gLag == lag, s"part $pk lag-units")
      // FIFO always matches min(total added, total removed)
      assert(gMatched == math.min(addQty, remQty), s"part $pk min-total")
    }
  }

  test("fifoAging matches the sequential FIFO remaining-lot computation") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_returnflag", "CAST(l_shipdate AS DATE) AS ship",
        "l_orderkey", "l_linenumber", "CAST(l_quantity AS BIGINT) AS qty")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate,
        r.getLong(3), r.getInt(4), r.getLong(5)))
    val asOf = li.filter(t => t._2 == "N" || t._2 == "R").map(_._3.toEpochDay).max
    // sequential: walk adds in FIFO order consuming against the removal total
    val buckets = scala.collection.mutable.Map.empty[String, (Set[Long], Long, Long, Long)]
      .withDefaultValue((Set.empty, 0L, 0L, 0L))
    li.filter(_._2 == "N").groupBy(_._1).foreach { case (pk, lots) =>
      var toConsume = li.filter(t => t._2 == "R" && t._1 == pk).map(_._6).sum
      lots.sortBy(t => (t._3.toEpochDay, t._4, t._5)).foreach { lot =>
        val consumed = math.min(toConsume, lot._6)
        toConsume -= consumed
        val remaining = lot._6 - consumed
        if (remaining > 0) {
          val age = asOf - lot._3.toEpochDay
          val b = if (age <= 30) "a_0_30" else if (age <= 90) "b_31_90"
                  else if (age <= 365) "c_91_365" else "d_over_365"
          val (ps, nl, u, uad) = buckets(b)
          buckets(b) = (ps + pk, nl + 1, u + remaining, uad + remaining * age)
        }
      }
    }
    val got = Ledger.fifoAging(Tables.lineitem(spark, sf)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == buckets.keySet)
    buckets.foreach { case (b, (ps, nl, u, uad)) =>
      assert(got(b) == ((ps.size.toLong, nl, u, uad)), s"bucket $b")
    }
  }

  test("fifoMatch is invariant to the banding width") {
    val base = Ledger.fifoMatch(Tables.lineitem(spark, sf), bucketWidth = 128L)
      .collect().toSeq.map(_.toSeq)
    val narrow = Ledger.fifoMatch(Tables.lineitem(spark, sf), bucketWidth = 7L)
      .collect().toSeq.map(_.toSeq)
    val wide = Ledger.fifoMatch(Tables.lineitem(spark, sf), bucketWidth = 100000L)
      .collect().toSeq.map(_.toSeq)
    assert(base == narrow)
    assert(base == wide)
  }
}
