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
}
