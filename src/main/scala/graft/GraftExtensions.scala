package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: exposes the engine's custom Catalyst
  * expressions to SQL users, so `spark.sql` queries can call them
  * without the Scala Column API. Install with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Registered functions:
  *  - `graft_dot(a, b)` — codegen'd sequential dot product over
  *    float/double arrays ([[graft.functions.DotProduct]]); the ANN
  *    inner loop, ~10x over the HOF `aggregate(zip_with(...))` form.
  *
  * This is the "(b) custom Expression, registered via
  * SparkSessionExtensions" integration tier; the engine needs no custom
  * LogicalPlan/Strategy — every operator composes from declarative
  * DataFrame plans that Catalyst already optimizes (see PLANS.md).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** the injected (identifier, info, builder) triples — exposed so
    * tests (and non-builder callers) can register them into an
    * existing session's FunctionRegistry. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_dot(a, b) takes exactly two array arguments")
        graft.functions.DotProduct(children.head, children(1))
      }))
}
