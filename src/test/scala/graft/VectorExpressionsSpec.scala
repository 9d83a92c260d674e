package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0, 1.0, 0.0)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0, 1.0, 1.0))
  ).toDF("id", "f", "d")

  test("vec_dot over mixed float/double arrays") {
    val out = vecs.select(col("id"), vecDot(col("f"), col("d")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 32.0)
    assert(out(2L) == 0.0)
  }

  test("cosine_sim: orthogonal -> 0, zero-norm -> NULL, parallel -> 1") {
    val out = vecs.select(col("id"), cosineSim(col("f"), col("d")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).contains(0.0))
    assert(out(3L).isEmpty) // zero left norm -> NULL (nullif guard semantics)
    val self = vecs.filter(col("id") === 1L)
      .select(cosineSim(col("d"), col("d"))).as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("NULL input propagates to NULL output") {
    val out = Seq((Option(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b").select(vecDot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    def run(wholestage: Boolean): Seq[(Long, Option[Any])] = {
      spark.conf.set("spark.sql.codegen.wholeStage", wholestage.toString)
      try vecs.select(col("id"), cosineSim(col("f"), col("d")).as("c"), vecDot(col("f"), col("d")).as("x"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run(wholestage = true) == run(wholestage = false))
  }

  test("SQL registration: vec_dot / cosine_sim callable from spark.sql") {
    register(spark)
    vecs.createOrReplaceTempView("vtest")
    val out = spark.sql(
      "SELECT id, vec_dot(f, d) AS dot, cosine_sim(f, d) AS cos FROM vtest WHERE id = 1")
      .head()
    assert(out.getDouble(1) == 32.0)
    assert(math.abs(out.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }
}
