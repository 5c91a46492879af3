package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `nTables` hyperplane-LSH bucket ids of a vector in one pass:
  * element `t` of the output is table `t`'s sign-bit bucket
  * (bit `p` set iff `vec · planes(t)(p) > 0`).
  *
  * Why a dedicated Expression (same reasoning as [[IvfTopBuckets]]):
  * the composable form builds nTables × nPlanes separate
  * [[DotProduct]] nodes, each carrying its plane as a dim-element
  * literal array. Plane count grows with the corpus — the auto-sizing
  * rule nPlanes ≈ log₂(n/targetBucket) gives ~36 planes by 10¹²
  * vectors, × 12 tables × 64 dims ≈ 28k literal doubles in every
  * bucketing plan — so analysis/codegen cost scales with DATA size,
  * which is the same trap the IVF centroid literals hit at round 2.
  * Here the full plane tensor rides along as one codegen reference
  * object, the hot loop is plain JVM code shared by interpreted and
  * generated paths, and the expression tree stays O(1) in n.
  *
  * Bit semantics match the composed form it replaces
  * (`when(dot(vec, w) > 0, 1L << p)` folded with bitwiseOR):
  * per-plane dot accumulates in double over element order, null vector
  * elements contribute 0 ([[DotProduct]] rule), strict `> 0`
  * comparison (a NaN dot — impossible with ±1 planes and finite
  * inputs, but defined — sets no bit). Null vector → null output
  * (nullSafeEval), matching the composed form where every per-plane
  * `when` is null.
  */
/** `planes` is nested IndexedSeq, not Array: the case-class-generated
  * equals/hashCode then compare the tensor STRUCTURALLY, so two
  * instantiations over the same planes canonicalize equal and Catalyst
  * can common-subexpression/reuse them (an Array param compares by
  * reference and defeats that). The hasher converts to flat arrays
  * once per expression instance. */
case class LshBucketIds(child: Expression,
                        planes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"lsh_bucket_ids requires array<float|double>, got ${dt.sql}")
    }

  @transient private lazy val hasher = new LshHasher(
    planes.map(_.map(_.toArray).toArray).toArray,
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType)

  override def nullSafeEval(v: Any): Any =
    hasher.buckets(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshHasher", hasher,
      classOf[LshHasher].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.buckets($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LshBucketIds = copy(child = newChild)
}

object LshBucketIds {
  import org.apache.spark.sql.GraftColumnBridge._

  /** `array<long>` of length nTables — table t's bucket id at index t. */
  def buckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    column(LshBucketIds(expression(vec),
      planes.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}

/** The per-row hashing loop, shared by interpreted eval and generated
  * code (codegen emits one call per row — Janino never sees the loop,
  * so the method size is constant in nTables·nPlanes·dim). */
class LshHasher(planes: Array[Array[Array[Double]]], floatInput: Boolean)
    extends Serializable {

  def buckets(vec: ArrayData): ArrayData = {
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var b = 0L
      var p = 0
      while (p < table.length) {
        val w = table(p)
        val n = math.min(vec.numElements(), w.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          if (!vec.isNullAt(i)) {
            val x = if (floatInput) vec.getFloat(i).toDouble
                    else vec.getDouble(i)
            s += x * w(i)
          }
          i += 1
        }
        if (s > 0) b |= 1L << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}
