package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Randomized first-principles pins for the round-12 cleaners: seeded
  * corpora are generated with engineered duplication and every output row
  * is compared against an independent PURE-SCALA reference (no Spark, no
  * DuckDB) that runs the raw definition — duplicated-shingle discovery,
  * covered-position expansion, kept-text reassembly, and the eTLD+1 label
  * rule. The DuckDB oracles pin the real testdata; this suite pins the
  * edge cases random fixtures surface (all-duplicated docs, shingle-less
  * shorts, overlap-merged spans, cut-created adjacencies).
  */
class SpanCutPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(s: String): IndexedSeq[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").toIndexedSeq.filter(_.nonEmpty)

  /** Pure-Scala reference: per doc (n_tokens, n_removed, n_kept, digest). */
  private def referenceSpanCut(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val tokenized = docs.map { case (id, t) => id -> toks(t) }.toMap
    val perDocShingles = tokenized.view.mapValues { t =>
      if (t.size < 3) IndexedSeq.empty[(Int, String)]
      else (0 to t.size - 3).map(i => i -> s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    }.toMap
    val df = perDocShingles.toSeq
      .flatMap { case (id, sh) => sh.map(_._2).distinct.map(sg => (sg, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    docs.map { case (id, _) =>
      val t = tokenized(id)
      val covered = perDocShingles(id)
        .filter { case (_, sg) => df(sg) > 1 }
        .flatMap { case (p, _) => p to (p + 2) }.toSet
      val kept = t.indices.filterNot(covered).map(t)
      id -> (t.size.toLong, covered.size.toLong, kept.size.toLong,
        md5hex(kept.mkString(" ")))
    }.toMap
  }

  test("spanCutClean equals the pure-Scala reference on seeded dup-engineered corpora") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- Seq(7, 41, 103)) {
      val rnd = new scala.util.Random(seed)
      def sentence(n: Int): String =
        Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
      // engineered duplication: a template passage pasted into ~half the
      // docs at random offsets, plus pure-random docs (incl. shingle-less
      // shorts of 0-2 tokens)
      val template = sentence(6)
      val docs: Seq[(Long, String)] = (0L until 40L).map { id =>
        val body =
          if (id % 7 == 6) sentence(rnd.nextInt(3)) // shingle-less
          else if (rnd.nextBoolean()) s"${sentence(rnd.nextInt(5))} $template ${sentence(rnd.nextInt(5))}"
          else sentence(4 + rnd.nextInt(10))
        (id, body.trim)
      }.filter(_._2.nonEmpty)
      val expect = referenceSpanCut(docs)
      val got = TextOps.spanCutCleanFrom(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toMap
      assert(got.keySet == expect.keySet, s"seed $seed: doc set mismatch")
      got.foreach { case (id, g) =>
        assert(g == expect(id), s"seed $seed doc $id: engine $g != reference ${expect(id)}")
      }
      // and the structural invariant the cleaner guarantees by construction
      got.foreach { case (id, (n, rm, kp, _)) =>
        assert(rm + kp == n, s"seed $seed doc $id: removed+kept != n_tokens")
      }
    }
  }

  /** Pure-Scala eTLD+1 reference mirroring TextOps.registrableDomain. */
  private def refDomain(url: String): String = {
    val host = "^[a-z][a-z0-9+.-]*://([^/:?#]+)".r.findFirstMatchIn(url)
      .map(_.group(1)).getOrElse("")
    val labels = host.split("\\.", -1).toIndexedSeq
    val n = labels.size
    val suffix2 = if (n >= 2) s"${labels(n - 2)}.${labels(n - 1)}" else ""
    val keep =
      if (n >= 3 && TextOps.MultiPartSuffixes.contains(suffix2)) 3
      else math.min(n, 2)
    labels.takeRight(keep).mkString(".")
  }

  test("registrableDomain equals the pure-Scala rule on randomized URLs over every suffix class") {
    val rnd = new scala.util.Random(23)
    val subs = Vector("", "www.", "news.", "a.b.", "x.y.z.")
    val sites = Vector("bbc", "example", "shop-4", "data2")
    val sufs = Vector("com", "org", "io", "co.uk", "com.au", "gov.uk", "co.jp", "net.au")
    val paths = Vector("", "/", "/a/b?q=1", ":8443/x", "/#frag")
    val urls = (1 to 200).map { _ =>
      s"https://${subs(rnd.nextInt(subs.size))}${sites(rnd.nextInt(sites.size))}." +
        s"${sufs(rnd.nextInt(sufs.size))}${paths(rnd.nextInt(paths.size))}"
    }
    val got = urls.toDF("url")
      .select(TextOps.registrableDomain(col("url"))).as[String].collect().toSeq
    urls.zip(got).foreach { case (u, g) =>
      assert(g == refDomain(u), s"url $u: engine $g != reference ${refDomain(u)}")
      // the registrable domain is always a dot-suffix of the host
      val host = u.stripPrefix("https://").takeWhile(c => c != '/' && c != ':' && c != '#')
      assert(host == g || host.endsWith("." + g), s"url $u: $g is not a suffix of $host")
    }
  }
}
