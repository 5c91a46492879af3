package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Element-wise `xxhash64` over a string array: each element hashed
  * exactly as Spark's `xxhash64(col)` (XXH64 over the UTF8 bytes, seed
  * 42; a null element yields the seed, matching `xxhash64(NULL)`).
  *
  * Why: the dedup verify joins ship each document's full gram set
  * through one or two exchanges and intersect them per candidate pair.
  * A word 3-gram is ~20-40 bytes; its hash is 8 — so hashing the
  * persisted gram projection ONCE shrinks every downstream exchange
  * and makes `array_intersect`/join keys compare longs instead of
  * strings (guide §2.3 "narrower types / shuffle keys instead of
  * payloads"). Two distinct grams colliding (2⁻⁶⁴) could only merge
  * set elements — the same accepted-risk argument as the minhash `gh`
  * hash-once draw (Dedup.scala) — and the exact-Jaccard outputs are
  * oracle-verified against string-gram replays at every scale factor.
  *
  * The composable form — `transform(grams, g => xxhash64(g))` — is an
  * interpreted HOF (CodegenFallback + per-element boxing); this
  * expression is one compiled loop (same rationale as
  * [[NgramShingles]]).
  */
case class XxhashArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"xxhash_array requires array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    XxhashArray.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.XxhashArray.compute($arr);")

  override protected def withNewChildInternal(
      newChild: Expression): XxhashArray = copy(child = newChild)
}

object XxhashArray {
  import org.apache.spark.sql.GraftColumnBridge._

  /** Spark's default xxhash64 seed. */
  private val Seed = 42L

  /** static so generated code can call it: one compiled walk per row.
    * Element hash ≡ `xxhash64(element)` (XxHash64Function over
    * StringType, seed 42); null elements yield the seed, like
    * `xxhash64(NULL)`. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) Seed
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(arr.getUTF8String(i), StringType, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: per-element xxhash64 of a string array. */
  def hashed(arr: Column): Column =
    column(XxhashArray(expression(arr)))
}
