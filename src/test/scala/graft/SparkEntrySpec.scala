package graft

/** Driver-contract integrity: the oracle map must reference real queries and
  * every query must at least pass analysis (schema resolution) — catches
  * renamed keys and unresolved-column typos without running the jobs.
  */
class SparkEntrySpec extends SparkSpecBase {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every query analyzes against the testdata (schema resolves)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { require(fn(spark, sf).schema.nonEmpty); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns at least one row (driver smoke contract)") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }

  test("query names are unique and stable-format qNN_*") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
  }
}
