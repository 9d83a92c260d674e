package graft

import graft.sources.Tables

/** Direct unit pins for the shared [[Tables.fingerprintedMv]] helper (round
  * 11) — the train-once/probe-many backbone under the copurchase-edge MV,
  * the PQ codebooks, and the stream full-join emission. The copurchase spec
  * pins content/reuse/staleness end-to-end; this one pins the BUILD-COUNT
  * contract directly: the `build` thunk runs exactly once per (source
  * fingerprint, name), again on source change, and again under refresh.
  */
class FingerprintedMvSpec extends SparkSpecBase {
  import spark.implicits._

  /** Delete every `${name}_<fp>` dir under the live MV root — the root is
    * shared across suite RUNS, so vacuum-sweep assertions must start
    * hermetic or they pick up a previous run's stale fingerprints. */
  private def purgeMvName(name: String): Unit = {
    // keepFp "none" matches no real fingerprint; two passes because the
    // sweep is two-phase (pass 1 marks unstamped dirs, pass 2 deletes)
    val now = System.currentTimeMillis()
    Tables.vacuumMvs(name, keepFp = "none", graceMs = 0L, nowMs = now)
    Tables.vacuumMvs(name, keepFp = "none", graceMs = 0L, nowMs = now + 1)
  }

  test("fingerprintedMv: build runs once per fingerprint, again on source change, again on refresh") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_fpmv_spec")
    val src = work.resolve("src.txt")
    Files.write(src, "v1".getBytes("UTF-8"))
    var builds = 0
    def mv(refresh: Boolean = false) =
      Tables.fingerprintedMv(spark, src, "fpmv_spec_probe", refresh) {
        builds += 1
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      }
    val r1 = mv().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(r1 == Set((1L, "a"), (2L, "b")) && builds == 1,
      s"first access must build exactly once (builds=$builds)")
    mv().count()
    assert(builds == 1, s"second access must serve the materialization (builds=$builds)")
    // source change (size AND mtime both move) => new fingerprint => rebuild
    Files.write(src, "v2-longer".getBytes("UTF-8"))
    mv().count()
    assert(builds == 2, s"changed source must miss the stale MV (builds=$builds)")
    // refresh forces a rebuild even on a fingerprint hit
    mv(refresh = true).count()
    assert(builds == 3, s"refresh=true must rebuild (builds=$builds)")
    // and the rebuilt MV serves without building again
    mv().count()
    assert(builds == 3, s"post-refresh access must reuse (builds=$builds)")
  }

  test("mvRoot: SPARK_GRAFT_MV_DIR overrides; tmpdir/graft_mv is the fallback") {
    import java.nio.file.Paths
    assert(Tables.mvRoot(_ => None) ==
      Paths.get(System.getProperty("java.io.tmpdir"), "graft_mv"),
      "default root must be tmpdir/graft_mv")
    assert(Tables.mvRoot(k => if (k == "SPARK_GRAFT_MV_DIR") Some("/mnt/shared/mv") else None) ==
      Paths.get("/mnt/shared/mv"),
      "SPARK_GRAFT_MV_DIR must override the root")
    // the live helper resolves through the real environment by default —
    // same rule, so a deployment exporting the env var redirects every MV
    assert(Tables.mvRoot() == sys.env.get("SPARK_GRAFT_MV_DIR").map(Paths.get(_))
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir"), "graft_mv")))
  }

  test("atomic publish: a markerless partial directory is swept and rebuilt; no temp dirs linger") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_fpmv_atomic")
    val src = work.resolve("src.txt")
    Files.write(src, "v1".getBytes("UTF-8"))
    var builds = 0
    def mv() = Tables.fingerprintedMv(spark, src, "fpmv_spec_atomic") {
      builds += 1
      Seq((1L, "a")).toDF("id", "v")
    }
    val mvDir = Paths.get(mv().inputFiles.head.stripPrefix("file:")).getParent
    assert(builds == 1 && Files.exists(mvDir.resolve("_SUCCESS")))
    // simulate a crashed pre-publish state: published dir without its marker
    Files.delete(mvDir.resolve("_SUCCESS"))
    mv().count()
    assert(builds == 2, "a markerless partial MV must be swept and rebuilt, never served")
    assert(Files.exists(mvDir.resolve("_SUCCESS")), "rebuild must republish the marker")
    // the build staged through a temp dir and renamed — nothing left behind
    val leftovers = Files.list(mvDir.getParent).toArray.map(_.toString)
      .filter(p => p.contains("fpmv_spec_atomic") && p.contains(".tmp-"))
    assert(leftovers.isEmpty, s"temp staging dirs must not linger: ${leftovers.mkString(",")}")
  }

  test("vacuum: superseded fingerprint is marked on publish, swept only after the grace period; live MV kept") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_fpmv_vac")
    val src = work.resolve("src.txt")
    Files.write(src, "v1".getBytes("UTF-8"))
    val name = "fpmv_spec_vacuum"
    purgeMvName(name) // the shared MV root outlives suite runs — hermetic start
    def mv() = Tables.fingerprintedMv(spark, src, name) {
      Seq((1L, "a")).toDF("id", "v")
    }
    val dir1 = Paths.get(mv().inputFiles.head.stripPrefix("file:")).getParent
    // regenerate the source => new fingerprint publishes => sibling vacuum
    Files.write(src, "v2-longer".getBytes("UTF-8"))
    val dir2 = Paths.get(mv().inputFiles.head.stripPrefix("file:")).getParent
    assert(dir1 != dir2, "regenerated source must land on a new fingerprint")
    assert(Files.exists(dir1.resolve("_SUPERSEDED")),
      "publish must MARK the superseded sibling (reader-safe two-phase sweep)")
    assert(Files.exists(dir1.resolve("_SUCCESS")),
      "a superseded MV inside the grace period must survive for in-flight readers")
    val fp2 = dir2.getFileName.toString.stripPrefix(name + "_")
    // inside the grace window: kept
    assert(Tables.vacuumMvs(name, fp2).isEmpty, "sweep inside grace must delete nothing")
    // past the grace window (injected clock): swept
    val markedAt = new String(Files.readAllBytes(dir1.resolve("_SUPERSEDED")), "UTF-8").trim.toLong
    val swept = Tables.vacuumMvs(name, fp2, nowMs = markedAt + Tables.MvVacuumGraceMs + 1)
    assert(swept == Seq(dir1.getFileName.toString), s"expected exactly the superseded dir, got $swept")
    assert(!Files.exists(dir1) && Files.exists(dir2.resolve("_SUCCESS")),
      "superseded dir gone, live MV intact")
  }

  test("vacuum: markerless sibling swept immediately; a source flip-flop un-stamps the again-current MV") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_fpmv_vac2")
    val src = work.resolve("src.txt")
    Files.write(src, "v1".getBytes("UTF-8"))
    val mt1 = Files.getLastModifiedTime(src)
    val name = "fpmv_spec_vacuum2"
    purgeMvName(name)
    def mv() = Tables.fingerprintedMv(spark, src, name) {
      Seq((1L, "a")).toDF("id", "v")
    }
    val dir1 = Paths.get(mv().inputFiles.head.stripPrefix("file:")).getParent
    // a markerless partial sibling (crashed pre-atomic-era build): no reader
    // can hold it (paths are only handed out after the _SUCCESS check)
    val partial = dir1.getParent.resolve(s"${name}_deadbeefdeadbeef")
    Files.createDirectories(partial)
    Files.write(partial.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val fp1 = dir1.getFileName.toString.stripPrefix(name + "_")
    assert(Tables.vacuumMvs(name, fp1) == Seq(partial.getFileName.toString),
      "a markerless sibling must be swept immediately, any age")
    // flip-flop: v1 -> v2 (marks dir1 superseded) -> v1 again (same fp as dir1)
    Files.write(src, "v2-longer".getBytes("UTF-8"))
    mv().count()
    assert(Files.exists(dir1.resolve("_SUPERSEDED")))
    Files.write(src, "v1".getBytes("UTF-8")); Files.setLastModifiedTime(src, mt1)
    val dirBack = Paths.get(mv().inputFiles.head.stripPrefix("file:")).getParent
    assert(dirBack == dir1, "identical source bytes+mtime must re-resolve the old fingerprint")
    assert(!Files.exists(dir1.resolve("_SUPERSEDED")),
      "an again-current MV must be un-stamped so a later sibling vacuum can never reap it")
  }

  test("striped locks: two DIFFERENT MVs build concurrently; the SAME MV builds once under racing threads") {
    import java.nio.file.Files
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val work = Files.createTempDirectory("graft_fpmv_lock")
    val src = work.resolve("src.txt")
    Files.write(src, "v1".getBytes("UTF-8"))
    // different-name overlap: builder A blocks until builder B has ENTERED
    // its build — impossible under the old object-level lock
    val aEntered = new CountDownLatch(1)
    val bEntered = new CountDownLatch(1)
    def build(entered: CountDownLatch, other: CountDownLatch) = {
      entered.countDown()
      assert(other.await(30, TimeUnit.SECONDS),
        "both builds must be in flight at once (striped, not object-level, locking)")
      Seq((1L, "a")).toDF("id", "v")
    }
    val ta = new Thread(() =>
      Tables.fingerprintedMv(spark, src, "fpmv_lock_a")(build(aEntered, bEntered)).count())
    val tb = new Thread(() =>
      Tables.fingerprintedMv(spark, src, "fpmv_lock_b")(build(bEntered, aEntered)).count())
    ta.start(); tb.start(); ta.join(60000); tb.join(60000)
    assert(!ta.isAlive && !tb.isAlive, "concurrent different-MV builds must both complete")
    // same-name race: the build thunk runs exactly once across racing threads
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map(_ => new Thread(() =>
      Tables.fingerprintedMv(spark, src, "fpmv_lock_same") {
        builds.incrementAndGet()
        Seq((1L, "a")).toDF("id", "v")
      }.count()))
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(builds.get() == 1, s"same (name, fp) must build exactly once, got ${builds.get()}")
  }
}
