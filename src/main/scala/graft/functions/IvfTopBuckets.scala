package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Scores a vector against every IVF centroid and returns the top
  * `nProbe` `(s: double, c: int)` buckets ordered by (score desc,
  * centroid-id desc) — the same total order as
  * `reverse(array_sort(array(struct(s, c)…)))`, which the DuckDB oracle
  * replays as `ORDER BY s DESC, cid DESC`.
  *
  * Why a dedicated Expression: the composable alternative embeds the
  * centroid matrix as nCentroids × dim literal nodes inside one
  * expression tree. At the √n-centroid default that is ~640k literals
  * by 10⁸ vectors — Catalyst analysis and the 64KB Janino method limit
  * blow up long before the data does. Here the matrix rides along as a
  * single codegen reference object (one pointer in the generated
  * class), the O(nCentroids·dim) loop — IVF assignment's inherent
  * per-row cost — runs in [[IvfScorer]] JVM code, and whole-stage
  * codegen survives at any centroid count. A broadcast-join +
  * window alternative was rejected: it shuffles n × nCentroids score
  * rows to rank them, a non-starter at 10¹²-document scale.
  *
  * Summation is sequential in element order, accumulating in double
  * (float inputs widened per element), bit-matching [[DotProduct]] and
  * the oracle's `list_aggregate(list_apply(list_zip(..)), 'sum')`.
  */
/** `centroids` is nested IndexedSeq, not Array, for the same reason as
  * [[LshBucketIds]]: structural equals/hashCode so plan
  * canonicalization/common-subexpression reuse works across the two
  * instantiations per IVF plan (index + probe side). */
case class IvfTopBuckets(child: Expression,
                         centroids: IndexedSeq[IndexedSeq[Double]],
                         nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = IvfTopBuckets.outType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"ivf_top_buckets requires array<float|double>, got ${dt.sql}")
    }

  @transient private lazy val scorer = new IvfScorer(
    centroids.map(_.toArray).toArray, nProbe,
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType)

  override def nullSafeEval(v: Any): Any =
    scorer.topBuckets(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfScorer", scorer,
      classOf[IvfScorer].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.topBuckets($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : IvfTopBuckets = copy(child = newChild)
}

object IvfTopBuckets {
  import org.apache.spark.sql.GraftColumnBridge._

  val outType: DataType = ArrayType(
    new StructType().add("s", DoubleType, nullable = false)
      .add("c", IntegerType, nullable = false),
    containsNull = false)

  def topBuckets(vec: Column, centroids: Array[Array[Double]],
                 nProbe: Int): Column =
    column(IvfTopBuckets(expression(vec),
      centroids.map(_.toIndexedSeq).toIndexedSeq, nProbe))
}

/** The per-row scoring loop, shared by interpreted eval and generated
  * code (the codegen emits one call into this object per row — the hot
  * loop itself is this plain-JVM code, so Janino never sees it). */
class IvfScorer(cents: Array[Array[Double]], nProbe: Int,
                floatInput: Boolean) extends Serializable {

  /** top-`nProbe` (score, cid) under (s desc, c desc); insertion top-k,
    * O(nCentroids · (dim + nProbe)) per row. */
  def topBuckets(vec: ArrayData): ArrayData = {
    val k = math.min(nProbe, cents.length)
    val topS = new Array[Double](k)
    val topC = new Array[Int](k)
    var size = 0
    var ci = 0
    while (ci < cents.length) {
      val w = cents(ci)
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
      // position of the first entry the candidate outranks; iterating
      // ci ascending means an equal score outranks earlier (lower) cids
      var p = 0
      while (p < size && !(s > topS(p) || (s == topS(p) && ci > topC(p))))
        p += 1
      if (p < k) {
        val last = math.min(size, k - 1)
        var q = last
        while (q > p) { topS(q) = topS(q - 1); topC(q) = topC(q - 1); q -= 1 }
        topS(p) = s; topC(p) = ci
        if (size < k) size += 1
      }
      ci += 1
    }
    val out = new Array[Any](size)
    var j = 0
    while (j < size) { out(j) = InternalRow(topS(j), topC(j)); j += 1 }
    new GenericArrayData(out)
  }
}
