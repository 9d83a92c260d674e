package graft

import java.nio.file.Files

import graft.sources.{Formats, Tables}
import org.apache.spark.sql.functions._

/** ORC/JSONL format boundary: row-for-row fidelity, escaping-hostile
  * strings, declared-schema discipline, fingerprint reuse.
  */
class FormatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_fmt_spec").toString

  test("ORC round-trip is row-for-row lossless on orders") {
    val src = Tables.orders(spark, sf)
    val back = Formats.viaOrc(src, s"${tmp()}/orc")
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("JSONL round-trip is lossless on orders (timestamps included)") {
    val src = Tables.orders(spark, sf)
    val back = Formats.viaJsonl(src, s"${tmp()}/jsonl")
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("JSONL survives escaping-hostile strings and nulls") {
    val hostile = Seq(
      (1L, Option("""he said "hi" \ and left"""), Option(1.5)),
      (2L, Option("line\nbreak\ttab"), None),
      (3L, Option("unicode: café ハロ"), Option(-0.0)),
      (4L, None, Option(2.0)),
      (5L, Option(""), Option(3.0))
    ).toDF("id", "s", "v")
    val back = Formats.viaJsonl(hostile, s"${tmp()}/hostile")
    assert(back.exceptAll(hostile).isEmpty && hostile.exceptAll(back).isEmpty)
  }

  test("events (adaptive timestamp layout) survives both hops") {
    val src = Tables.events(spark, sf)
    val viaBoth = Formats.viaJsonl(
      Formats.viaOrc(src, s"${tmp()}/e_orc"), s"${tmp()}/e_jsonl")
    assert(viaBoth.schema == src.schema)
    // ts_ns is the exact ordering key — compare on it plus the payload
    val a = src.select("event_id", "ts_ns", "user_id", "event_type", "value")
    val b = viaBoth.select("event_id", "ts_ns", "user_id", "event_type", "value")
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("roundtrip gate materializes once per fingerprint and is reused") {
    val first = Formats.ordersViaOrcAndJsonl(spark, sf)
    val n1 = first.count()
    // Second call must read the already-materialized chain (same _SUCCESS),
    // not rewrite: capture the marker mtimes across calls.
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft_fmt")
    val markers = Files.walk(base).filter(_.getFileName.toString == "_SUCCESS")
      .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    val before = markers.map(p => Files.getLastModifiedTime(p).toMillis).toSeq
    val second = Formats.ordersViaOrcAndJsonl(spark, sf)
    assert(second.count() == n1)
    val after = markers.map(p => Files.getLastModifiedTime(p).toMillis).toSeq
    assert(before == after)
  }

  test("schema evolution: merged read = union schema, old rows NULL, no row lost") {
    import org.apache.spark.sql.functions._
    val merged = Formats.ordersTwoGenerations(spark, sf)
    val orders = graft.sources.Tables.orders(spark, sf)
    assert(merged.columns.toSet ==
      Set("o_orderkey", "o_orderstatus", "o_totalprice", "o_priority_class"))
    assert(merged.count() == orders.count())
    // exactly the pre-column generation carries NULL
    val nulls = merged.filter(col("o_priority_class").isNull)
    assert(nulls.count() == orders.filter(col("o_orderkey") % 2 === 0).count())
    assert(nulls.filter(col("o_orderkey") % 2 =!= 0).isEmpty)
    // and the new generation's derived values are the stated CASE
    assert(merged.filter(col("o_priority_class") === "high"
      && col("o_totalprice") < 200000.0).isEmpty)
  }
}
