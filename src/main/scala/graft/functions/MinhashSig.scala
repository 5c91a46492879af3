package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature from a PRE-HASHED gram array in one compiled
  * pass: element s of the result is
  * `min over grams of xxhash64(gh, s)` — bit-identical to the
  * explode → `min(xxhash64(col("gh"), lit(s)))` aggregate form it
  * replaces in [[graft.pipeline.Dedup.minhashLshPairs]] (Spark hashes
  * the LongType `gh` child via XXH64.hashLong from seed 42, then the
  * IntegerType literal `s` via hashInt from that; this loop calls the
  * same static functions in the same order).
  *
  * Why: each document's grams live in ONE row, so the 64 per-document
  * minima are row-local; the aggregate form re-exploded the array,
  * paid 64 hash-agg buffer updates per gram row, re-derived
  * `hashLong(gh, 42)` once per SEED (64× redundant), and exchanged
  * the partials. This expression hoists the shared inner hash out of
  * the seed loop (half the hash work), keeps the minima in a local
  * array, and emits the signature with no shuffle at all. Callers
  * must pre-filter empty gram arrays (the explode form dropped those
  * documents; this expression would emit a Long.MaxValue signature).
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"minhash_sig requires array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinhashSig.compute($arr, " +
        s"$numHashes);")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSig = copy(child = newChild)
}

object MinhashSig {
  import org.apache.spark.sql.GraftColumnBridge._

  /** Spark's default xxhash64 seed. */
  private val Seed = 42L

  /** static so generated code can call it. Per gram: the shared
    * `hashLong(gh, 42)` once, then one `hashInt(s, ·)` per seed —
    * exactly `xxhash64(gh, s)`'s child fold (LongType gh, IntegerType
    * literal seed). */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h1 = XXH64.hashLong(arr.getLong(i), Seed)
      var s = 0
      while (s < numHashes) {
        val v = XXH64.hashInt(s, h1)
        if (v < out(s)) out(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `numHashes` seeded minima over a pre-hashed gram
    * array. */
  def sig(hashedGrams: Column, numHashes: Int): Column =
    column(MinhashSig(expression(hashedGrams), numHashes))
}
