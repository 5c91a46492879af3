package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** First grid index `i` with `v <= grid(i)` (binary search), or
  * `grid.length` when `v` exceeds every grid point (incl. NaN, which
  * compares false against everything — exactly like the per-point
  * `when(v <= g_i, 1)` conditional sums this replaces).
  *
  * Why: [[graft.engine.Drift.checkExact]]'s empirical CDFs were two
  * aggregations of `gridSize` conditional sums each — a ~100-branch
  * evaluation per row and a ~200-column codegen unit. Because the CDF
  * count at grid point i is `#{v : bucket(v) <= i}` whenever the grid
  * is non-decreasing (the predicate `v <= g_i` is then monotone in i),
  * the same counts derive from ONE histogram over this bucket index
  * plus a driver-side suffix sum over ≤ gridSize+1 cells — ~7
  * comparisons per row, no wide codegen, bit-identical longs. Callers
  * must verify grid monotonicity (NaN-free, non-decreasing) and fall
  * back to the conditional-sum form otherwise.
  *
  * The grid ships as one reference object (same rationale as
  * [[IvfTopBuckets]]/[[LshBucketIds]]: literals-per-point grow the
  * plan; a reference array does not).
  */
case class GridBucket(child: Expression, grid: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"grid_bucket requires double, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    GridBucket.compute(input.asInstanceOf[Double], grid)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("grid", grid, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.GridBucket.compute($v, $g);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GridBucket = copy(child = newChild)
}

object GridBucket {
  import org.apache.spark.sql.GraftColumnBridge._

  /** static so generated code can call it. Binary search for the first
    * index with `v <= grid(i)` — requires `grid` non-decreasing and
    * NaN-free (then the predicate is monotone in i, so the search
    * equals the linear scan). */
  def compute(v: Double, grid: Array[Double]): Int = {
    var lo = 0
    var hi = grid.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= grid(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  /** caller-side guard: the bucket⇔conditional-sum equivalence needs a
    * NaN-free non-decreasing grid. */
  def monotone(grid: Array[Double]): Boolean = {
    var i = 0
    while (i < grid.length) {
      if (java.lang.Double.isNaN(grid(i))) return false
      if (i > 0 && grid(i) < grid(i - 1)) return false
      i += 1
    }
    true
  }

  /** Column API. */
  def bucket(v: Column, grid: Array[Double]): Column =
    column(GridBucket(expression(v), grid))
}
