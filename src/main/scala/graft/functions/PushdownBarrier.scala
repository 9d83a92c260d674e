package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlShim.{column, expression}
import org.apache.spark.sql.types.DataType

/** Value-transparent optimizer fence: evaluates exactly to its child, but is
  * FLAGGED non-deterministic so `PushPredicateThroughNonJoin` (and project
  * collapsing) will not relocate a predicate containing it.
  *
  * Why this exists (round 13, q218): a deterministic predicate on a DERIVED
  * grouping column (`registrable domain IS NOT NULL`) is pushed through the
  * aggregate and the staging projections all the way to the scan, and column
  * pruning then INLINES the staged column's defining expression into every
  * branch reference of the pushed condition — the q218 filter condition
  * ended up carrying ~20 copies of the md5→concat→regexp→split subtree,
  * evaluated per source row outside whole-stage codegen: measured 40.5 s vs
  * 0.14 s for the identical relation computed once in a projection (500k
  * docs, 100× corpus). Fencing the post-aggregate NULL-drop keeps the
  * predicate where it is group-cardinality cheap and provably equivalent
  * (the grouping key is what the filter tests; dropping a group after the
  * aggregate equals dropping its rows before it).
  *
  * The fence is for DETERMINISTIC children only — the flag is a plan fence,
  * never a semantics change, so results stay replayable and oracle-exact.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  require(child.deterministic,
    "PushdownBarrier fences plan movement of deterministic predicates only")

  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "pushdown_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}

object PushdownBarrier {
  /** Column front door: `fence(cond)` keeps `cond` at its written plan
    * position. */
  def fence(c: Column): Column = column(PushdownBarrier(expression(c)))
}
