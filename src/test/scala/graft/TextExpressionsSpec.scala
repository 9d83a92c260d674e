package graft

import java.text.Normalizer

import graft.functions.{TextFunctions, UnicodeNormalize}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization expression: JDK-reference agreement across all
  * four forms, the ASCII / already-normalized fast paths (no-copy), codegen
  * vs interpreted parity, NULL propagation, SQL registration.
  */
class TextExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  // Composed, decomposed, multi-mark, compatibility, ASCII, empty.
  private val samples = Seq(
    "café",            // composed é
    "café",           // decomposed e + acute
    "Å",              // A + ring -> Å
    "Å̧",        // cedilla(ccc 202) + ring(ccc 230): ring composes over the cedilla
    "Å̧",        // same marks, other source order: canonical reordering first
    "ﬁnal",            // ﬁ ligature (NFKC folds, NFC keeps)
    "x²",              // superscript 2 (NFKC folds)
    "㎄",               // SQUARE KA (compatibility)
    "plain ascii 123",
    ""
  )

  private val forms = Seq("NFC", "NFD", "NFKC", "NFKD")

  test("all four forms agree with java.text.Normalizer on the sample corpus") {
    val df = samples.toDF("s")
    val out = df.select(col("s"),
        TextFunctions.nfc(col("s")).as("nfc"),
        TextFunctions.nfd(col("s")).as("nfd"),
        TextFunctions.nfkc(col("s")).as("nfkc"),
        TextFunctions.nfkd(col("s")).as("nfkd"))
      .collect()
    out.foreach { r =>
      val s = r.getString(0)
      forms.zipWithIndex.foreach { case (f, i) =>
        val expected = Normalizer.normalize(s, Normalizer.Form.valueOf(f))
        assert(r.getString(i + 1) == expected, s"form $f on ${s.map(_.toInt)}")
      }
    }
  }

  test("multi-mark composition and canonical reordering (UAX #15 core)") {
    val nfc = samples.toDF("s").select(TextFunctions.nfc(col("s"))).as[String].collect()
    // A + cedilla + ring: ring is NOT blocked by the lower-ccc cedilla, so
    // it composes over it -> Å + cedilla. Both source orders converge.
    assert(nfc(3) == "Å̧")
    assert(nfc(4) == "Å̧")
    // NFC keeps compatibility chars; NFKC folds them.
    assert(nfc(5) == "ﬁnal")
    val nfkc = samples.toDF("s").select(TextFunctions.nfkc(col("s"))).as[String].collect()
    assert(nfkc(5) == "final")
    assert(nfkc(6) == "x2")
  }

  test("ASCII and already-normalized inputs return the input buffer (no copy)") {
    val e = UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFC")
    val ascii = UTF8String.fromString("pure ascii, fast path")
    assert(e.normalize(ascii) eq ascii)
    val composed = UTF8String.fromString("café") // already NFC: quick-check path
    assert(e.normalize(composed) eq composed)
    val decomposed = UTF8String.fromString("cafe\u0301")
    assert(e.normalize(decomposed) ne decomposed)
    assert(e.normalize(decomposed).toString == "caf\u00E9")
  }

  test("NULL propagates; idempotence holds") {
    val out = Seq(Option.empty[String]).toDF("s")
      .select(TextFunctions.nfc(col("s"))).collect()
    assert(out(0).isNullAt(0))
    val once = samples.toDF("s").select(TextFunctions.nfkd(col("s")).as("o"))
    val twice = once.select(TextFunctions.nfkd(col("o"))).as[String].collect()
    assert(twice.toSeq == once.as[String].collect().toSeq)
  }

  test("codegen and interpreted paths agree") {
    def run(wholestage: Boolean): Seq[String] = {
      spark.conf.set("spark.sql.codegen.wholeStage", wholestage.toString)
      try samples.toDF("s").select(TextFunctions.nfc(col("s"))).as[String].collect().toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run(wholestage = true) == run(wholestage = false))
  }

  test("SQL registration: nfc_normalize / nfkc_normalize callable from SQL") {
    TextFunctions.register(spark)
    samples.toDF("s").createOrReplaceTempView("norm_samples")
    val out = spark.sql(
      "SELECT nfc_normalize(s) AS c, nfkc_normalize(s) AS k FROM norm_samples")
      .collect()
    out.zip(samples).foreach { case (r, s) =>
      assert(r.getString(0) == Normalizer.normalize(s, Normalizer.Form.NFC))
      assert(r.getString(1) == Normalizer.normalize(s, Normalizer.Form.NFKC))
    }
  }

  test("non-string input is rejected at analysis") {
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(TextFunctions.nfc(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
