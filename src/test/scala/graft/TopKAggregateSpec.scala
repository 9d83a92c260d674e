package graft

import graft.functions.{TopKByScore, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpecBase {
  import spark.implicits._

  test("heap keeps the k best with id-asc tie-break, in any insertion order") {
    val entries = Seq((0.5, 3L), (0.9, 1L), (0.5, 2L), (0.7, 4L), (0.9, 9L))
    for (perm <- entries.permutations.take(24)) {
      val h = new TopKHeap(3)
      perm.foreach { case (s, i) => h.offer(s, i) }
      assert(h.sortedDesc.toSeq == Seq((0.9, 1L), (0.9, 9L), (0.7, 4L)),
        s"order ${perm.mkString(",")}")
    }
  }

  test("serialization round-trips the heap") {
    val h = new TopKHeap(2)
    Seq((0.1, 1L), (0.9, 2L), (0.5, 3L)).foreach { case (s, i) => h.offer(s, i) }
    val back = TopKHeap.fromBytes(2, h.toBytes)
    assert(back.sortedDesc.toSeq == h.sortedDesc.toSeq)
  }

  test("aggregate matches the window row_number formulation, across partitions") {
    val rng = new scala.util.Random(5)
    val rows = for (q <- 0L until 4L; i <- 0L until 200L)
      yield (q, i, math.floor(rng.nextDouble() * 20) / 20.0) // forced score ties
    val cand = rows.toDF("q_id", "neighbor_id", "sim").repartition(13)

    val viaAgg = cand.groupBy("q_id")
      .agg(TopKByScore.topK(col("sim"), col("neighbor_id"), 5).as("nn"))
      .select(col("q_id"), explode(col("nn")).as("x"))
      .select(col("q_id"), col("x.id").as("neighbor_id"), col("x.rk").as("rk"), col("x.score").as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    val viaWindow = cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("neighbor_id"), col("rk").cast("long"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(viaAgg == viaWindow)
  }

  test("property: random split + random merge-tree + serialize round-trips ≡ sequential top-k") {
    // the merge path is the subtle half of a TypedImperativeAggregate: the
    // engine may split input into any partitions, merge partial buffers in
    // any tree order, and serialize/deserialize buffers across the shuffle
    // between any two steps. For seeded random inputs (forced ties included)
    // every such composition must equal the sequential (score desc, id asc)
    // top-k.
    for (seed <- Seq(11L, 42L, 77L, 123L)) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(5)
      // coarse score grid forces cross-partition ties; ids unique
      val entries = (0L until n.toLong).map(i => (rnd.nextInt(12) / 10.0, i))
      val expected = entries.sortBy { case (s, i) => (-s, i) }.take(k)

      // random partition split
      val parts = scala.collection.mutable.ArrayBuffer.fill(1 + rnd.nextInt(8))(
        scala.collection.mutable.ArrayBuffer.empty[(Double, Long)])
      entries.foreach(e => parts(rnd.nextInt(parts.size)) += e)
      // partial heaps, each serialize-round-tripped (the shuffle write/read)
      var heaps = parts.map { p =>
        val h = new TopKHeap(k)
        rnd.shuffle(p).foreach { case (s, i) => h.offer(s, i) }
        TopKHeap.fromBytes(k, h.toBytes)
      }.toVector
      // random merge tree: repeatedly merge two random heaps until one left
      while (heaps.size > 1) {
        val i = rnd.nextInt(heaps.size)
        val j0 = rnd.nextInt(heaps.size - 1)
        val j = if (j0 >= i) j0 + 1 else j0
        val merged = new TopKHeap(k)
        heaps(i).foreach((s, id) => merged.offer(s, id))
        heaps(j).foreach((s, id) => merged.offer(s, id))
        val rt = TopKHeap.fromBytes(k, merged.toBytes)
        heaps = heaps.zipWithIndex.collect {
          case (h, idx) if idx != i && idx != j => h
        } :+ rt
      }
      assert(heaps.head.sortedDesc.toSeq == expected,
        s"seed=$seed n=$n k=$k parts=${parts.size}: merge-tree result diverges from sequential top-k")
    }
  }

  test("plan: partial aggregation bounds the shuffle (no window exchange-sort)") {
    val cand = (0L until 100L).map(i => (i % 2, i, i.toDouble)).toDF("q_id", "neighbor_id", "sim")
    val df = cand.groupBy("q_id")
      .agg(TopKByScore.topK(col("sim"), col("neighbor_id"), 3).as("nn"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by_score"), s"no map-side partial heap in:\n$plan")
    assert(!plan.contains("Window"))
  }
}
