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
  * loop itself is this plain-JVM code, so Janino never sees it).
  *
  * Above [[IvfScorer.blockMin]] centroids the scorer carries a
  * branch-and-bound BLOCK INDEX: the centroids are grouped (seeded
  * deterministic Lloyd over the centroid set, ~√nc blocks) and each
  * block stores its mean μ_B and radius r_B = max|c−μ_B|. Per row,
  * block upper bounds dot(q,c) ≤ dot(q,μ_B) + |q|·r_B are computed
  * first and blocks are visited in bound order, stopping once a bound
  * cannot displace the current k-th score — so the per-row cost drops
  * from O(nc·dim) toward O((√nc + scanned)·dim) on clustered
  * quantizers. This matters because assignment cost is the one IVF
  * term that grows with nc: at the √n default over 10¹² rows,
  * nc ≈ 10⁶ makes the flat scan the pipeline's dominant flops.
  *
  * The pruned path is EXACT, not approximate — output is bit-identical
  * to the flat scan (pinned in PipelineSpec):
  *  - scores are computed by the same element-order loop, so a scanned
  *    centroid's s is the same double either way;
  *  - the (s desc, c desc) comparator is a strict total order (cids
  *    unique), so the top-k set and order are visit-order independent;
  *  - bounds are inflated by a relative slack (1e-9) so FP rounding of
  *    the bound can never prune a centroid whose score mathematically
  *    ties or beats the k-th;
  *  - pruning stops only on a STRICT bound < k-th (a tied bound keeps
  *    scanning — an equal-score higher-cid member must still displace);
  *  - non-finite inputs (NaN/∞ vector norms, where NaN scores make
  *    insertion order-dependent) and non-finite centroids fall back to
  *    the flat scan entirely. */
class IvfScorer(cents: Array[Array[Double]], nProbe: Int,
                floatInput: Boolean) extends Serializable {

  private val nc = cents.length
  private val dim = if (nc == 0) 0 else cents(0).length

  private def elem(vec: ArrayData, i: Int): Double =
    if (floatInput) vec.getFloat(i).toDouble else vec.getDouble(i)

  private def score(vec: ArrayData, w: Array[Double]): Double = {
    val n = math.min(vec.numElements(), w.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) s += elem(vec, i) * w(i)
      i += 1
    }
    s
  }

  /** insertion of (s, ci) into the bound (s desc, c desc) buffer;
    * identical to the historical flat-loop insertion. Returns new
    * size. */
  private def offer(topS: Array[Double], topC: Array[Int], size: Int,
                    k: Int, s: Double, ci: Int): Int = {
    var p = 0
    while (p < size && !(s > topS(p) || (s == topS(p) && ci > topC(p))))
      p += 1
    if (p >= k) size
    else {
      val last = math.min(size, k - 1)
      var q = last
      while (q > p) { topS(q) = topS(q - 1); topC(q) = topC(q - 1); q -= 1 }
      topS(p) = s; topC(p) = ci
      if (size < k) size + 1 else size
    }
  }

  private def emit(topS: Array[Double], topC: Array[Int], size: Int)
      : ArrayData = {
    val out = new Array[Any](size)
    var j = 0
    while (j < size) { out(j) = InternalRow(topS(j), topC(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** below this centroid count the per-row bound pass + block ordering
    * is pure overhead against a cheap flat scan. */
  private val blockMin = 256

  /** largest |element| over all centroids — the round-6 overflow gate
    * (advisor finding): a product of two FINITE values can overflow to
    * ±∞ and make member scores NaN via ∞−∞, where NaN ties insert in
    * visit order and the pruned path could diverge from the flat
    * scan's canonical cid-order insertion. Rows where
    * maxAbsQ · maxAbsCent could overflow any partial term fall back
    * to the flat scan (which IS the canonical behavior). NaN centroid
    * elements cannot reach this gate: the block build below refuses
    * any non-finite centroid element, so the pruned path — the only
    * consumer — always sees a finite maxAbsCent. */
  private val maxAbsCent: Double = {
    var m = 0.0
    var i = 0
    while (i < nc) {
      val c = cents(i)
      var j = 0
      while (j < c.length) {
        val a = math.abs(c(j)); if (a > m) m = a; j += 1
      }
      i += 1
    }
    m
  }
  /** one-time index-build budget (driver-side, flops ≈ 5·nc·kb·dim);
    * past it the scorer stays flat rather than stalling construction. */
  private val maxBuildFlops = 2e10

  /** (block means, slack-free radii, member cids asc) — deterministic
    * (stride init, fixed 4 Lloyd iterations, sequential accumulation);
    * None = flat scanning. */
  private val blocks
      : Option[(Array[Array[Double]], Array[Double], Array[Array[Int]])] =
    // ragged centroid sets (unequal lengths) stay flat: the block
    // build assumes a uniform dim, and a bound computed in fewer
    // dimensions than a member's score would not be an upper bound —
    // the flat scan's per-centroid min() handles ragged inputs
    // correctly, so route them there
    if (nc < blockMin ||
        cents.exists(_.length != dim) ||
        cents.exists(_.exists(x => !java.lang.Double.isFinite(x)))) None
    else {
      val kb = math.ceil(math.sqrt(nc.toDouble)).toInt
      // kb ≤ 1024 keeps the packed sort key's low-bits block id exact;
      // maxBuildFlops caps nc (hence kb) far below this at any real dim
      if (kb > 1024 || 5.0 * nc * kb * dim > maxBuildFlops) None
      else {
        var mus = Array.tabulate(kb)(b =>
          cents((b.toLong * nc / kb).toInt).clone())
        val assign = new Array[Int](nc)
        def assignAll(): Unit = {
          var i = 0
          while (i < nc) {
            val c = cents(i)
            var best = 0; var bestD = Double.MaxValue
            var b = 0
            while (b < kb) {
              val mu = mus(b)
              var d = 0.0; var j = 0
              while (j < dim) { val t = c(j) - mu(j); d += t * t; j += 1 }
              if (d < bestD) { bestD = d; best = b }
              b += 1
            }
            assign(i) = best
            i += 1
          }
        }
        var it = 0
        while (it < 4) {
          assignAll()
          val sums = Array.fill(kb)(new Array[Double](dim))
          val counts = new Array[Int](kb)
          var i = 0
          while (i < nc) {
            val c = cents(i); val b = assign(i)
            counts(b) += 1
            var j = 0
            while (j < dim) { sums(b)(j) += c(j); j += 1 }
            i += 1
          }
          mus = Array.tabulate(kb)(b =>
            if (counts(b) == 0) mus(b)
            else {
              val s = sums(b)
              Array.tabulate(dim)(j => s(j) / counts(b))
            })
          it += 1
        }
        assignAll() // membership must match the FINAL means
        val radii = new Array[Double](kb)
        val members = Array.fill(kb)(Array.newBuilder[Int])
        var i = 0
        while (i < nc) {
          val b = assign(i); val mu = mus(b); val c = cents(i)
          var d = 0.0; var j = 0
          while (j < dim) { val t = c(j) - mu(j); d += t * t; j += 1 }
          val r = math.sqrt(d)
          if (r > radii(b)) radii(b) = r
          members(b) += i
          i += 1
        }
        Some((mus, radii, members.map(_.result())))
      }
    }

  def topBuckets(vec: ArrayData): ArrayData = blocks match {
    case Some((mus, radii, members)) if nProbe > 0 =>
      val n = math.min(vec.numElements(), dim)
      var q2 = 0.0
      var maxAbsQ = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val x = elem(vec, i); q2 += x * x
          val a = math.abs(x); if (a > maxAbsQ) maxAbsQ = a
        }
        i += 1
      }
      val qn = math.sqrt(q2)
      // overflow gate (see maxAbsCent): with every |qᵢ·cⱼ| ≤
      // maxAbsQ·maxAbsCent ≤ MaxValue/(4·(dim+1)), all partial sums,
      // bounds (incl. qn·r_B ≤ 2·dim·maxAbsQ·maxAbsCent) and scores
      // stay finite, so the pruned path's exactness proof holds; past
      // it, fall back to the flat scan — the canonical behavior for
      // pathological magnitudes
      if (!java.lang.Double.isFinite(qn) ||
          maxAbsQ > Double.MaxValue / (4.0 * (dim + 1)) / maxAbsCent)
        topBucketsFlat(vec)
      else {
        val kb = mus.length
        val k = math.min(nProbe, nc)
        val topS = new Array[Double](k)
        val topC = new Array[Int](k)
        var size = 0
        val bound = new Array[Double](kb)
        // packed visit order: ~ascendingSortKey(bound) in the high 54
        // bits (ascending long sort ⇒ descending bound) with the block
        // id exact in the low 10 bits (kb ≤ 1024, asserted at build) —
        // one primitive Arrays.sort(long[]), no boxing in the per-row
        // loop. Low-bit truncation of the double can only perturb the
        // VISIT ORDER between near-equal bounds; correctness never
        // depends on it because every block is tested against its own
        // full-precision bound below (no order-dependent early break).
        val order = new Array[Long](kb)
        var b = 0
        while (b < kb) {
          // bound slack: FP summation error of the dot is ABSOLUTE in
          // the summand magnitudes (≤ dim·ε·Σ|qᵢ·μᵢ|), so under heavy
          // cancellation a slack relative to the near-zero RESULT
          // would under-cover — accumulate Σ|qᵢ·μᵢ| alongside and
          // scale the slack by it (1e-9 ≥ 4500·ε·1000, orders of
          // magnitude above the true error for any dim ≤ 4·10⁶)
          val mu = mus(b)
          val nn = math.min(vec.numElements(), mu.length)
          var s = 0.0; var absSum = 0.0
          var j = 0
          while (j < nn) {
            if (!vec.isNullAt(j)) {
              val t = elem(vec, j) * mu(j)
              s += t; absSum += math.abs(t)
            }
            j += 1
          }
          val raw = s + qn * radii(b)
          bound(b) = raw + 1e-9 * (1.0 + absSum + qn * radii(b))
          val bits = java.lang.Double.doubleToLongBits(bound(b))
          val asc = bits ^ ((bits >> 63) | java.lang.Long.MIN_VALUE)
          order(b) = (~asc & ~1023L) | b.toLong
          b += 1
        }
        java.util.Arrays.sort(order)
        var oi = 0
        while (oi < kb) {
          val blk = (order(oi) & 1023L).toInt
          if (!(size == k && bound(blk) < topS(k - 1))) {
            val ms = members(blk)
            var mi = 0
            while (mi < ms.length) {
              val ci = ms(mi)
              size = offer(topS, topC, size, k, score(vec, cents(ci)), ci)
              mi += 1
            }
          }
          oi += 1
        }
        emit(topS, topC, size)
      }
    case _ => topBucketsFlat(vec)
  }

  /** the historical exhaustive scan — the audit twin of the pruned
    * path (PipelineSpec pins bit-identity) and the fallback for
    * non-finite inputs / small nc. */
  private[graft] def topBucketsFlat(vec: ArrayData): ArrayData = {
    val k = math.min(nProbe, nc)
    val topS = new Array[Double](k)
    val topC = new Array[Int](k)
    var size = 0
    var ci = 0
    while (ci < nc) {
      size = offer(topS, topC, size, k, score(vec, cents(ci)), ci)
      ci += 1
    }
    emit(topS, topC, size)
  }
}
