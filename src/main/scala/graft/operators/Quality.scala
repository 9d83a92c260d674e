package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectation-style data-quality checks (the reference's
  * `run_data_quality_checks` task and the `sql/quality_checks.sql` its README
  * promises but does not contain — reference `dags/financial_pipeline.py:126-136`,
  * `README.md:183`).
  *
  * Every check is ONE aggregation returning (check, passed, observed) rows —
  * fail-fast friendly (collect a handful of rows, `require` on them) and
  * scan-efficient: `checkAll` unions the row-level predicates into a single
  * pass over the table instead of one job per check.
  */
object Quality {

  final case class CheckResult(check: String, passed: Boolean, observed: Long)

  /** Row-level predicate checks evaluated in ONE scan: each entry is
    * (name, predicate that must hold for every row).
    */
  def checkAll(df: DataFrame, checks: Seq[(String, Column)]): Seq[CheckResult] = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.map { case ((name, _), i) =>
      val violations = row.getLong(i)
      CheckResult(name, violations == 0L, violations)
    }
  }

  /** Exact row count (reference's COUNT(*) = 750000 gate). */
  def rowCount(df: DataFrame, expected: Long): CheckResult = {
    val n = df.count()
    CheckResult(s"row_count=$expected", n == expected, n)
  }

  /** Key uniqueness at the declared grain. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String]): CheckResult = {
    val dups = df.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).count()
    CheckResult(s"unique_key(${keyCols.mkString(",")})", dups == 0L, dups)
  }

  /** Referential integrity: every fact key resolves in the dimension
    * (left_anti count must be 0 — the FK declarations at reference
    * `dags/financial_pipeline.py:172-173` made Postgres enforce this).
    */
  def referentialIntegrity(fact: DataFrame, factKey: String,
                           dim: DataFrame, dimKey: String): CheckResult = {
    val orphans = fact.select(col(factKey))
      .join(broadcast(dim.select(col(dimKey))), col(factKey) === col(dimKey), "left_anti")
      .count()
    CheckResult(s"ref_integrity($factKey->$dimKey)", orphans == 0L, orphans)
  }

  /** Fail-fast runner: raises with every failed check listed. */
  def enforce(results: Seq[CheckResult]): Unit = {
    val failed = results.filterNot(_.passed)
    require(failed.isEmpty,
      "quality checks failed: " +
        failed.map(r => s"${r.check} (observed=${r.observed})").mkString("; "))
  }

  /** Deterministic corrupt-input fixture corpus for the quarantine gate:
    * a lenient-CSV load (5 clean rows, 2 with untypeable cells), a JSONL
    * corpus (4 clean lines, 3 broken), and a video dir (the 2 real AVI/MP4
    * containers beside 2 payloads with no recognizable container magic).
    * Same idempotent atomic-write contract as `Multimodal.ensureMediaFixtures`.
    */
  private[graft] def ensureQuarantineFixtures(): String = synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_quarantine_fixtures_v1")
    Files.createDirectories(dir)
    def place(name: String)(bytes: Array[Byte]): Unit = {
      val target = dir.resolve(name)
      if (!Files.exists(target)) {
        val tmp = dir.resolve(s".$name.tmp${System.nanoTime()}")
        Files.write(tmp, bytes)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    place("staging.csv")((
      "date,symbol,open,high,low,close,volume\n" +
      "2024-01-01,AAA,1.0,2.0,0.5,1.5,100\n" +
      "2024-01-02,AAA,1.5,2.5,1.0,2.0,200\n" +
      "2024-01-03,BBB,3.0,4.0,2.5,3.5,300\n" +
      "not-a-date,BBB,3.5,4.5,3.0,4.0,400\n" +      // untypeable date → quarantine
      "2024-01-04,CCC,5.0,6.0,4.5,5.5,five-hundred\n" + // untypeable volume → quarantine
      "2024-01-05,CCC,5.5,6.5,5.0,6.0,600\n" +
      "2024-01-06,DDD,7.0,8.0,6.5,7.5,700\n").getBytes("UTF-8"))
    place("docs.jsonl")((
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "web", "n_chars": 5}""" + "\n" +
      """{"doc_id": 2, "text": "beta", "lang": "en", "source": "web", "n_chars": 4}""" + "\n" +
      """{"doc_id": 3, "text":""" + "\n" +                 // truncated object
      "this line is not json at all\n" +
      """{"doc_id": 4, "text": "gamma", "lang": "pt", "source": "book", "n_chars": 5}""" + "\n" +
      """{"doc_id": 5 "text": "missing comma"}""" + "\n" + // syntax error
      """{"doc_id": 6, "text": "delta", "lang": "pt", "source": "book", "n_chars": 5}""" + "\n").getBytes("UTF-8"))
    place("vid_ok.avi")(Multimodal.mkAviFixture(320, 240, usPerFrame = 40000, frames = 250))
    place("vid_ok.mp4")(Multimodal.mkMp4Fixture(640, 360, timescale = 600, duration = 1200, frames = 300))
    place("garbage.avi")(Array.tabulate[Byte](256)(i => ((i * 37 + 11) & 0xff).toByte))
    place("truncated.mp4")("RIFF????".getBytes("UTF-8")) // RIFF magic, no parseable header
    dir.toString
  }

  /** Corrupt-input quarantine profile (registered as q86): one row per
    * ingest surface with (clean, quarantined) counts over the deterministic
    * fixture corpus — the quarantine contract (malformed inputs are COUNTED,
    * never silently dropped and never job-fatal) as a hash-exact driver row.
    * Counts stay as Spark aggregations (one tiny scan per surface); expected
    * values are closed-form constants the DuckDB oracle states as literals,
    * the q80/q81 technique.
    */
  def quarantineProfile(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import graft.sources.Tables
    val dir = ensureQuarantineFixtures()
    val csv = Tables.readStagingCsvLenient(spark, s"$dir/staging.csv").cache()
    val csvRow = csv.agg(
      sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_clean"),
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_quarantined"))
      .select(lit("csv").as("source"), col("n_clean"), col("n_quarantined"))
    val (cleanJ, quarJ) = Tables.readDocumentsJsonl(spark, s"$dir/docs.jsonl")
    val jsonlRow = cleanJ.agg(count(lit(1)).as("n_clean"))
      .crossJoin(quarJ.agg(count(lit(1)).as("n_quarantined")))
      .select(lit("jsonl").as("source"), col("n_clean"), col("n_quarantined"))
    val videoRow = Multimodal.videoFeatures(spark, dir).agg(count(lit(1)).as("n_clean"))
      .crossJoin(Multimodal.videoQuarantine(spark, dir).agg(count(lit(1)).as("n_quarantined")))
      .select(lit("video").as("source"), col("n_clean"), col("n_quarantined"))
    csvRow.unionAll(jsonlRow).unionAll(videoRow).orderBy("source")
  }
}
