package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Randomized cross-implementation equivalence for the packing / chunking
  * family (q83/q84/q104): seeded random corpora (including empty-ish and
  * sub-budget documents) are run through the distributed operators and
  * compared against independent PURE-SCALA references that implement the
  * contracts sequentially — the prefix-sum packing and the fixed-grid
  * chunker. The DuckDB oracles pin the real testdata; this suite pins the
  * edge shapes random fixtures surface (documents exactly at a boundary,
  * documents longer than several budgets, single-token documents).
  */
class PackingPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def tokCount(s: String): Long =
    "[^\\s]+".r.findAllIn(s).length.toLong

  private def normToks(s: String): IndexedSeq[String] = {
    val n = s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    n.split(" ").toIndexedSeq
  }

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "k9")
    (0 until nDocs).map { i =>
      val n = rnd.nextInt(40) // includes 0-token docs
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("packedSpans ≡ sequential reference on seeded random corpora (boundary-straddling docs included)") {
    for (seed <- Seq(7L, 23L, 99L)) {
      val docs = corpus(seed, 60)
      val budget = 16L
      // sequential reference: walk docs in doc_id order, split at multiples of budget
      val ref = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var off = 0L
      docs.sortBy(_._1).foreach { case (id, text) =>
        val n = tokCount(text)
        var start = 0L
        while (start < n) {
          val sid = (off + start) / budget
          val take = math.min(n - start, (sid + 1) * budget - (off + start))
          ref += ((sid, id, start, take))
          start += take
        }
        off += n
      }
      val out = TextOps.packedSpansFrom(docs.toDF("doc_id", "text"), budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(out.sorted == ref.toSeq.sorted, s"seed $seed diverges from the sequential packer")
    }
  }

  test("ragChunks ≡ sequential grid reference; coverage and overlap invariants hold on random corpora") {
    for (seed <- Seq(5L, 41L)) {
      val docs = corpus(seed, 50)
      val (size, stride) = (8, 6)
      val ref = docs.flatMap { case (id, text) =>
        val t = normToks(text)
        val n = t.size.toLong
        val nChunks = if (n <= size) 1L else 1L + (n - size + stride - 1) / stride
        (0L until nChunks).map { c =>
          val start = c * stride
          val len = math.min(size.toLong, n - start)
          val slice = t.slice(start.toInt, (start + len).toInt).mkString(" ")
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (id, c, start, len, digest)
        }
      }
      val out = TextOps.ragChunksFrom(docs.toDF("doc_id", "text"), size, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
      assert(out.sorted == ref.sorted, s"seed $seed diverges from the grid reference")
      // invariants: chunks cover the document exactly; stride fixed
      out.groupBy(_._1).foreach { case (id, chunks) =>
        val n = normToks(docs.find(_._1 == id).get._2).size.toLong
        assert(chunks.map(c => c._3 + c._4).max == n, s"doc $id not covered")
        chunks.sortBy(_._2).sliding(2).foreach {
          case Seq(a, b) => assert(b._3 - a._3 == stride.toLong)
          case _ => ()
        }
      }
    }
  }
}
