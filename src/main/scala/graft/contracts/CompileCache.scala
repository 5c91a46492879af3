package graft.contracts

/** Process-wide memo for compiled contract artifacts (verdict
  * programs, bound generic first-violation expressions, rendered
  * columns).
  *
  * Compiling a contract against a schema is pure driver-side work —
  * per-leaf probe analyses, a full optimizer pass to constant-fold the
  * message scaffolding (VerdictCompiler.bindRowProbe) — and its result
  * is a deterministic, immutable expression tree that depends only on
  * (contract, schema, check name). Re-running it on every query
  * construction re-paid hundreds of milliseconds of serial driver CPU
  * per invocation (measured round 6; the reference library builds each
  * contract once at module load, and Spark itself memoizes the
  * analogous artifact — generated Java — in its codegen cache). This
  * cache holds those artifacts keyed by contract IDENTITY (contracts
  * can embed predicate lambdas, so structural equality is not
  * available) plus the structural schema/name parts. Nothing here
  * caches DATA or query results: every action still recomputes from
  * its inputs; only the compile step is amortized, exactly like
  * Janino's generated-class cache.
  *
  * Bounded: the key space is the set of distinct (contract, schema)
  * pairs a process validates — a handful in any real run — but a
  * caller minting fresh contract objects per call would grow it, so
  * the map LRU-evicts past [[MaxEntries]] (recompile-on-miss is always
  * correct).
  */
object CompileCache {

  /** reference-identity wrapper so contracts with embedded lambdas can
    * key the memo. */
  final class IdRef(val o: AnyRef) {
    override def hashCode: Int = System.identityHashCode(o)
    override def equals(that: Any): Boolean = that match {
      case r: IdRef => r.o eq o
      case _ => false
    }
  }

  private val MaxEntries = 256
  // access-ordered LRU behind a synchronized wrapper: a caller minting
  // fresh contract objects per call (identity keys that never repeat)
  // evicts only the LEAST-RECENTLY-USED entries instead of wiping the
  // hot flagship artifacts this cache exists for
  private val m = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Any, AnyRef](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, AnyRef]): Boolean =
        size() > MaxEntries
    })

  /** memoize `build` under `key` (bounded LRU — an evicted entry only
    * re-pays one compile).
    *
    * The cache is process-wide while keys carry no session identity:
    * artifacts built under one session's SQLConf are served to every
    * session in the JVM. That is sound for the contract trees cached
    * here (string/struct logic whose folding is conf-independent; all
    * engine sessions additionally pin UTC), but a future caller
    * caching conf-SENSITIVE folds (timestamp casts under varying
    * timezones, ANSI-dependent arithmetic) must add the relevant conf
    * to its key. */
  def memo[A <: AnyRef](key: Any)(build: => A): A =
    m.computeIfAbsent(key, _ => build).asInstanceOf[A]

  /** tests/diagnostics. */
  def size: Int = m.size
  def clear(): Unit = m.clear()

  /** Analyze + optimize `c` ONCE against `rowType` (empty-RDD probe —
    * PropagateEmptyRelation cannot prove a LogicalRDD empty, so the
    * projection survives intact; the VerdictCompiler.bindRowProbe
    * precedent) and hand back the FOLDED expression as a reusable
    * Column with its attribute references re-unresolved by name.
    *
    * Why: generic-compiler trees carry literal frame/message
    * scaffolding that constant-folds from MBs to KBs — bindRowProbe
    * measured 64 MB analyzed vs 158 KB optimized on a 350-leaf
    * contract. Without this, EVERY query invocation re-pays Catalyst
    * analysis + optimization walks over the unfolded tree (serial
    * driver CPU); folded once and memoized, the per-query passes walk
    * kilobytes. The fold is the same optimizer the real plan ships
    * through anyway, so results are unchanged by construction. */
  def foldedColumn(spark: org.apache.spark.sql.SparkSession,
                   rowType: org.apache.spark.sql.types.StructType,
                   c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowType)
    val plan = probe.select(c.as("__folded__"))
      .queryExecution.optimizedPlan
    val resolved = plan.asInstanceOf[Project].projectList.head match {
      case a: Alias => a.child
      case other => other
    }
    val unresolved = resolved.transform {
      case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name)
    }
    org.apache.spark.sql.GraftColumnBridge.column(unresolved)
  }
}
