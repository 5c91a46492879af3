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
  *  - `graft_ngrams(text, n)` — distinct space-joined word n-gram
  *    shingles ([[graft.functions.NgramShingles]]); the dedup/
  *    decontamination shingler, ~40x over the interpreted HOF form
  *    at n=8.
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
      }),
    (new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(
        classOf[graft.functions.NgramShingles].getName, "graft_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_ngrams(text, n) takes a string and a literal int")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_ngrams n must be a literal int, got $other")
        }
        graft.functions.NgramShingles(children.head, n)
      }))
}
