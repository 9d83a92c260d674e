package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Cross-cell miss quantification for q90's SemDeDup (VERDICT r7 missing
  * item 3): the within-cell pruning is the paper's own scale argument, but a
  * similar pair straddling a k-means cell boundary is silently missed, and
  * nothing previously measured that loss. Two regimes, both deterministic
  * (md5-seeded centroids, fixed data, fixed planting seed), so the asserted
  * bounds are stable pins, not statistical tests:
  *
  *  1. The CORPUS at the registered config (τ=0.35, k=8): the drop mass
  *     sits at MODERATE cosine (the synthetic corpus has zero pairs above
  *     0.7), and moderate-similarity pairs straddle cells freely — measured
  *     cross-cell miss 0.4537. That number is the honest statement that the
  *     registered q90 gate is an EXACTNESS contract of the within-cell rule,
  *     not a recall claim about all-pairs dedup at low τ.
  *  2. The NEAR-DUP regime the paper targets (planted exact-angle pairs,
  *     τ=0.9): recall of planted partners through k=8 cells is 0.81 at
  *     s=0.92, 0.885 at s=0.95, 0.94 at s=0.98 — tight pairs mostly co-cell,
  *     and recall rises with similarity. These are the numbers a user sizes
  *     k by; the curve lives in SCALING.md §SemDeDup.
  */
class SemDeDupMissSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.1"

  private def droppedSet(emb: org.apache.spark.sql.DataFrame, k: Int,
                         tau: Double): Set[Long] = {
    val asg = Similarity.semanticAssignment(emb, k, 3).localCheckpoint(true)
    Similarity.semanticDroppedFrom(asg, tau)
      .select("vec_id").distinct().as[Long].collect().toSet
  }

  test("q90 SemDeDup: celled drop set is a subset of all-pairs; corpus cross-cell miss at the registered config is the documented 45%") {
    val emb = Tables.embeddings(spark, sf01)
    val truth = droppedSet(emb, 1, 0.35) // one cell == the exact all-pairs rule
    val celled = droppedSet(emb, 8, 0.35) // the registered q90 configuration
    assert(truth.nonEmpty, "all-pairs dedup dropped nothing — τ misconfigured")
    // structural guarantee: within-cell pairs ⊆ all pairs, so celling can
    // only UNDER-drop, never over-drop — a violation means the drop rule
    // itself diverged
    assert(celled.subsetOf(truth),
      s"celled dedup dropped vectors the all-pairs rule keeps: ${(celled -- truth).take(5)}")
    val miss = (truth -- celled).size.toDouble / truth.size
    info(f"all-pairs dropped=${truth.size}, k=8 dropped=${celled.size}, cross-cell miss=$miss%.4f")
    // measured 2026-08-13 at sf0.1: 1512 dropped all-pairs, 826 within-cell,
    // miss 0.4537. The band pins the measurement (deterministic) with margin
    // for engine-version drift; a real regression in clustering or the drop
    // rule moves this far outside the band.
    assert(miss >= 0.40 && miss <= 0.50,
      f"cross-cell miss $miss%.4f left the measured 0.4537 band — clustering or rule changed")
  }

  test("q215 multi-probe: drop set is sandwiched (single-probe ⊆ multi-probe ⊆ all-pairs); cross-cell miss improves materially") {
    val emb = Tables.embeddings(spark, sf01)
    val truth = droppedSet(emb, 1, 0.35)
    val single = droppedSet(emb, 8, 0.35)
    val multi = {
      val asg = Similarity.semanticAssignmentMulti(emb, 8, 3, nProbe = 2)
        .localCheckpoint(true)
      Similarity.multiProbeDropped(asg, 0.35).as[Long].collect().toSet
    }
    // structural sandwich: probing MORE cells can only add comparisons, and
    // every probed-cell pair is a genuine pair — so single ⊆ multi ⊆ truth
    assert(single.subsetOf(multi),
      s"multi-probe lost single-probe drops: ${(single -- multi).take(5)}")
    assert(multi.subsetOf(truth),
      s"multi-probe dropped vectors the all-pairs rule keeps: ${(multi -- truth).take(5)}")
    val missSingle = (truth -- single).size.toDouble / truth.size
    val missMulti = (truth -- multi).size.toDouble / truth.size
    info(f"cross-cell miss: single-probe $missSingle%.4f -> multi-probe(2) $missMulti%.4f " +
      f"(all-pairs dropped=${truth.size}, single=${single.size}, multi=${multi.size})")
    // measured 2026-08-14 at sf0.1: single 0.4537, multi-probe(2) must
    // recover a material share of the boundary-straddling pairs
    assert(missMulti < missSingle - 0.10,
      f"multi-probe miss $missMulti%.4f did not materially improve on $missSingle%.4f")
  }

  test("probe curve (round 13): nProbe=3 near-exact; ε-margin DOMINATED by fixed nProbe at equal pair budget; nProbe=2 is the knee") {
    val emb = Tables.embeddings(spark, sf01)
    val truth = droppedSet(emb, 1, 0.35)
    def multiDrops(nProbe: Int): Set[Long] = {
      val asg = Similarity.semanticAssignmentMulti(emb, 8, 3, nProbe).localCheckpoint(true)
      Similarity.multiProbeDropped(asg, 0.35).as[Long].collect().toSet
    }
    def pairSpace(asg: org.apache.spark.sql.DataFrame): Long =
      asg.groupBy("cell").count()
        .agg(sum(col("count") * col("count"))).as[Long].collect().head
    // measured 2026-08-14 at sf0.1 (k=8, τ=0.35, truth=1512 drops):
    //   nProbe 1/2/3/4: miss .4537/.1144/.0179/.0000 at 1.0/4.0/9.0/16.0× pairs
    //   ε-margin .01/.02/.05/.10: miss .4061/.3829/.2864/.1448 at 1.14/1.26/1.88/3.99×
    val m3 = multiDrops(3)
    val miss3 = (truth -- m3).size.toDouble / truth.size
    assert(miss3 <= 0.05, f"nProbe=3 miss $miss3%.4f left the measured 0.0179 regime")
    // the dominance pin: ε=0.1 costs the SAME ~4× pair space as nProbe=2
    // but recovers FEWER pairs — centroid margin is a weak predictor of
    // pair loss in the moderate-similarity regime
    val m2 = multiDrops(2)
    val asgM = Similarity.semanticAssignmentMargin(emb, 8, 3, eps = 0.10).localCheckpoint(true)
    val mm = Similarity.multiProbeDropped(asgM, 0.35).as[Long].collect().toSet
    val ps2 = pairSpace(Similarity.semanticAssignmentMulti(emb, 8, 3, 2))
    val psM = pairSpace(asgM)
    info(f"nProbe=2: drops=${m2.size} pairs=$ps2; eps=0.10: drops=${mm.size} pairs=$psM")
    assert(math.abs(psM.toDouble / ps2 - 1.0) < 0.15, "budgets drifted — comparison no longer like-for-like")
    assert(mm.size < m2.size, "ε-margin stopped being dominated — re-measure the curve before re-deciding nProbe=2")
    assert(mm.subsetOf(truth), "margin probing invented drops outside the all-pairs rule")
    // knee rationale (recorded, not asserted): marginal pairs per recovered
    // drop grow geometrically — ≈2.9k (1→2), ≈17k (2→3), ≈130k (3→4) — so
    // the registered q215 config stays nProbe=2
  }

  test("q90 SemDeDup: planted near-dup pairs (the paper's operating regime) are recalled through k=8 cells at the measured floors") {
    val corpus = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val rng = new scala.util.Random(47)
    val dim = 64
    def unitv(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // exact-angle planting (AnnRecallSpec's construction): partner ids are
    // odd/higher so "lower id wins" must drop the partner iff co-celled
    def recallAt(s: Double): Double = {
      val nPairs = 200
      val rows = (0 until nPairs).flatMap { i =>
        val u = unitv(Array.fill(dim)(rng.nextGaussian()))
        val r = Array.fill(dim)(rng.nextGaussian())
        val proj = u.zip(r).map { case (a, b) => a * b }.sum
        val w = unitv(r.zip(u).map { case (b, a) => b - proj * a }) // ⊥ u
        val v = u.zip(w).map { case (a, b) => s * a + math.sqrt(1 - s * s) * b }
        Seq((100000L + 2L * i, u.map(_.toFloat)), (100000L + 2L * i + 1, v.map(_.toFloat)))
      }
      val combined = corpus.unionByName(rows.toDF("vec_id", "embedding"))
      val dropped = droppedSet(combined, 8, 0.9)
      (0 until nPairs).count(i => dropped(100000L + 2L * i + 1)).toDouble / nPairs
    }
    // the SAME rng stream as the measurement run: s=0.92 -> 0.81,
    // s=0.95 -> 0.885, s=0.98 -> 0.94 (sequential draws)
    val r92 = recallAt(0.92)
    val r95 = recallAt(0.95)
    val r98 = recallAt(0.98)
    info(f"planted recall: s=0.92 -> $r92%.3f, s=0.95 -> $r95%.3f, s=0.98 -> $r98%.3f")
    assert(r92 >= 0.78, f"s=0.92 recall $r92%.3f below the measured 0.81 floor")
    assert(r95 >= 0.86, f"s=0.95 recall $r95%.3f below the measured 0.885 floor")
    assert(r98 >= 0.92, f"s=0.98 recall $r98%.3f below the measured 0.94 floor")
    assert(r92 <= r95 && r95 <= r98,
      "recall is not monotone in planted similarity — the co-celling argument broke")
  }
}
