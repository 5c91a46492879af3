package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Session-level lifecycle for the intermediate projections the dedup /
  * decontamination operators persist (gram projections, positional
  * shingles, eval gram sets).
  *
  * Those persists are load-bearing — each projection feeds 2–3
  * non-identical exchanges that ReuseExchange cannot dedupe, so without
  * them the corpus is re-tokenized and re-shingled per subtree — but
  * the operator that creates one CANNOT unpersist it: the blocks back
  * the returned LAZY plan. Previously callers owned the cleanup by
  * convention (`spark.catalog.clearCache()` between passes); a session
  * looping dedup passes that didn't know the convention leaked blocks.
  * This registry makes the lifecycle mechanical:
  *
  *  - every operator persist goes through [[persistTracked]];
  *  - [[withGramCache]] brackets a pass: everything persisted inside
  *    the bracket is unpersisted when it exits. The bracket's contract
  *    is that results are MATERIALIZED (collected / written) before it
  *    exits — unpersist after exit turns the blocks back into
  *    recompute-on-touch, which is correct but slow;
  *  - [[release]] drops everything tracked so far — the "between
  *    passes" hammer when no bracket was used.
  *
  * Unpersist is non-blocking: block removal proceeds asynchronously
  * while the next pass starts. The registry is process-wide and
  * synchronized; concurrent brackets on different threads release only
  * the frames persisted after their own mark (frames a sibling thread
  * persisted later are released by whichever bracket exits last —
  * harmless, both were done with them).
  */
object GramCache {

  private val tracked = mutable.ArrayBuffer.empty[DataFrame]

  /** persist MEMORY_AND_DISK (spill, never recompute, at 100 TB
    * partition sizes) and register for bracketed release. */
  private[graft] def persistTracked(df: DataFrame): DataFrame =
    synchronized {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked += p
      p
    }

  /** frames persisted and not yet released — observability + tests. */
  def activeCount: Int = synchronized(tracked.size)

  /** run `body`, then unpersist every projection persisted during it. */
  def withGramCache[A](body: => A): A = {
    val mark = synchronized(tracked.size)
    try body
    finally releaseFrom(mark)
  }

  /** unpersist ALL tracked projections (between-passes cleanup when no
    * bracket was used). */
  def release(): Unit = releaseFrom(0)

  private def releaseFrom(mark: Int): Unit = synchronized {
    var i = tracked.size - 1
    while (i >= mark) {
      tracked(i).unpersist(blocking = false)
      tracked.remove(i)
      i -= 1
    }
  }
}
