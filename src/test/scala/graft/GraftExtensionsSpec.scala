package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install on a SparkSessionExtensions instance") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; functions registered at session build
  }

  test("topk_by_score k argument: integral literals accepted, fractional rejected") {
    assert(GraftExtensions.literalK(Literal(3)) == 3L)
    assert(GraftExtensions.literalK(Literal(3L)) == 3L)
    assert(GraftExtensions.literalK(Literal(3.toShort)) == 3L)
    // a Double literal must be REJECTED, not truncated to 3
    intercept[IllegalArgumentException](GraftExtensions.literalK(Literal(3.9)))
    intercept[IllegalArgumentException](
      GraftExtensions.literalK(Literal(BigDecimal(3.9))))
    intercept[IllegalArgumentException](GraftExtensions.literalK(Literal("3")))
    intercept[IllegalArgumentException](GraftExtensions.literalK(Literal(0)))
    intercept[IllegalArgumentException](GraftExtensions.literalK(Literal(-1L)))
  }

  test("interpreted eval of the injected expressions") {
    val a = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0)), ArrayType(DoubleType))
    val b = Literal.create(ArrayData.toArrayData(Array(3.0, 4.0)), ArrayType(DoubleType))
    assert(graft.functions.DotProduct(a, b).eval(InternalRow.empty) == 11.0)
    val cos = graft.functions.CosineSimilarity(a, a).eval(InternalRow.empty)
    assert(math.abs(cos.asInstanceOf[Double] - 1.0) < 1e-12)
  }
}
