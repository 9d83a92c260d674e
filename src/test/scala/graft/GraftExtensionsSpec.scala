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

  test("interpreted eval of the injected expressions") {
    val a = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0)), ArrayType(DoubleType))
    val b = Literal.create(ArrayData.toArrayData(Array(3.0, 4.0)), ArrayType(DoubleType))
    assert(graft.functions.DotProduct(a, b).eval(InternalRow.empty) == 11.0)
    val cos = graft.functions.CosineSimilarity(a, a).eval(InternalRow.empty)
    assert(math.abs(cos.asInstanceOf[Double] - 1.0) < 1e-12)
  }
}
