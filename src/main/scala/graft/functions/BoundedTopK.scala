package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Shared k-bounded sorted-buffer Aggregator: the single audited
  * implementation of insert-into-sorted-prefix and bounded sorted
  * merge behind every window-replacing ranking aggregate
  * ([[TopKNeighbors]], [[TopKTerms]],
  * [[graft.engine.FirstKViolations]]).
  *
  * Subclasses provide the TOTAL order (`cmp < 0` iff `a` outranks
  * `b`) and the encoders; the buffer invariant — ascending by `cmp`,
  * length ≤ k, ties inserted AFTER equals (stable) — lives here once.
  * Runs as an ObjectHashAggregate with map-side partial aggregation:
  * the exchange carries ≤ k rows per (group, map task) instead of the
  * group's whole candidate set, which is the entire point (see
  * [[TopKNeighbors]]'s scaladoc for the shuffle-volume argument).
  */
abstract class BoundedTopK[T](k: Int)
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  /** < 0 iff `a` outranks (sorts before) `b`. Must be a total order
    * replicating the window's `orderBy` exactly — Spark sort-key
    * semantics included (NaN greatest, signed zero collapsed, UTF8
    * binary strings; see [[Utf8Order]]). */
  protected def cmp(a: T, b: T): Int

  final override def zero: Seq[T] = Vector.empty

  final override def reduce(buf: Seq[T], in: T): Seq[T] = {
    if (buf.length >= k && cmp(buf.last, in) <= 0) buf
    else {
      val i = buf.indexWhere(cmp(in, _) < 0)
      val at = if (i < 0) buf.length else i
      (buf.take(at) :+ in) ++ buf.drop(at).take(k - at - 1)
    }
  }

  final override def merge(a: Seq[T], b: Seq[T]): Seq[T] = {
    val out = Vector.newBuilder[T]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length ||
        (i < a.length && cmp(a(i), b(j)) <= 0)
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  final override def finish(buf: Seq[T]): Seq[T] = buf
}
