package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Identity wrapper that forces its subtree to evaluate interpreted
  * instead of being inlined into generated Java.
  *
  * Purpose: bound the SIZE of generated code, not its cost. The or-ctx
  * message assembly (Compiler.orCtx) embeds per-branch collect-all plus
  * full message rendering — a tree that can exceed Janino's 64KB method
  * limit when inlined, throwing InternalCompilerException and silently
  * deoptimizing the WHOLE stage to interpreted execution. Wrapped, the
  * generated code is one `eval` call; everything around it stays
  * codegen'd, and because the wrapper sits under `when(fail, …)` guards
  * only failing rows — a vanishing fraction at scale — ever execute the
  * interpreted subtree. Same bytes out either way (the subtree's
  * interpreted eval is the same Catalyst semantics).
  */
case class Interpreted(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def withNewChildInternal(newChild: Expression)
      : Interpreted = copy(child = newChild)
}

object Interpreted {
  /** Column-level: evaluate `c` interpreted (codegen sees one call). */
  def apply(c: Column): Column =
    GraftColumnBridge.column(Interpreted(GraftColumnBridge.expression(c)))
}
