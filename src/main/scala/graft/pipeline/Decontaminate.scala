package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-set decontamination: flag training documents that share
  * word n-grams with an evaluation corpus (the published n-gram
  * overlap procedure used for LM training sets — Brown et al. 2020,
  * appendix C — with the n-gram length as a knob).
  *
  * Scale shape: eval corpora are tiny (KBs–MBs) next to a 100 TB
  * training table, so the eval n-gram set is deduped and BROADCAST —
  * the training side is scanned map-only: shingle, hash-probe the
  * broadcast set, aggregate per doc. The training table is never
  * shuffled by n-gram (an n-gram-keyed exchange of the big side would
  * dwarf every other cost; hot n-grams would skew it).
  */
object Decontaminate {

  /** per-contaminated-training-doc overlap report: which training ids
    * share ≥ `minShared` distinct n-grams with ANY eval doc, with the
    * count of distinct shared n-grams and of eval docs hit. */
  def overlap(train: DataFrame, evalDf: DataFrame,
              idCol: String, textCol: String,
              evalIdCol: String, evalTextCol: String,
              n: Int = 8, minShared: Int = 1): DataFrame = {
    // HASHED grams both sides (round 6): the broadcast set, the probe
    // join key and the distinct counts all ride 8-byte gram hashes
    // instead of ~50-byte 8-gram strings (guide §2.3). A cross-gram
    // collision (2⁻⁶⁴) could only merge two counted grams; the oracle
    // replays string grams and stays green at every SF.
    val tg = Dedup.withHashedNgrams(train, idCol, textCol, n)
      .select(col("id"), explode(col("grams")).as("g"))
    val eg = Dedup.withHashedNgrams(evalDf, evalIdCol, evalTextCol, n)
      .select(col("id").as("eval_id"), explode(col("grams")).as("g"))
      .distinct()
    tg.join(broadcast(eg), "g")
      .groupBy("id")
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .where(col("n_shared_ngrams") >= minShared)
  }

  /** [[overlap]] for eval corpora too big to broadcast as an exact
    * gram set: a Bloom filter of the eval n-grams (~1.2 bytes/gram at
    * 1% fpp vs ~50+ bytes for the gram string itself) prunes the
    * training side MAP-SIDE — a gram the filter rejects is DEFINITELY
    * not in the eval set (no false negatives), so only bloom hits (true
    * overlaps + an fpp-fraction of false positives) reach the exact
    * verification join, which removes the false positives. Output is
    * identical to [[overlap]]; the training table is still never
    * shuffled by n-gram, and the verification join's input is ~|true
    * overlaps| + fpp·|training grams| instead of |training grams| —
    * AQE sees the runtime size and picks broadcast for the typical tiny
    * survivor set.
    *
    * The filter is built and probed with Spark's NATIVE expressions —
    * `BloomFilterAggregate` over xxhash64(gram) as a one-row binary
    * aggregate, handed to the probe as a SCALAR SUBQUERY, and
    * `BloomFilterMightContain` (codegen'd, one lazy deserialize per
    * task) in the training-side filter. This is exactly the machinery
    * Spark's own InjectRuntimeFilter plants for runtime row-group
    * filtering: no Scala UDF, the probe stays inside whole-stage
    * codegen, and Catalyst can see through the filter condition.
    * (Hashing to 64-bit before the membership test can only ADD
    * xxhash64-collision false positives — removed, like the filter's
    * own, by the verification join.)
    *
    * `expectedGrams` sizes the filter; 0 means count the deduped eval
    * grams first (one extra pass over the SMALL side only).
    *
    * The eval gram projection feeds THREE subtrees (the sizing count,
    * the filter build, the verification join), so it is persisted via
    * [[GramCache]] — run passes inside `GramCache.withGramCache { … }`
    * (or call `GramCache.release()` between passes) to reclaim the
    * blocks once the returned plan is materialized. */
  def overlapBloom(train: DataFrame, evalDf: DataFrame,
                   idCol: String, textCol: String,
                   evalIdCol: String, evalTextCol: String,
                   n: Int = 8, minShared: Int = 1, fpp: Double = 0.01,
                   expectedGrams: Long = 0L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => asCol, expression => asExpr}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.util.sketch.BloomFilter

    // HASHED grams both sides (round 6, see [[overlap]]): `g` is the
    // gram's xxhash64 long — exactly the value the Bloom build/probe
    // previously computed inline via xxhash64(gram string), so the
    // filter's contents are unchanged; the cache, the sizing count,
    // the verification join and the distinct counts all shrink from
    // ~50-byte strings to 8-byte longs.
    val eg = GramCache.persistTracked(
      Dedup.withHashedNgrams(evalDf, evalIdCol, evalTextCol, n)
        .select(col("id").as("eval_id"), explode(col("grams")).as("g"))
        .distinct())
    // sizing: the cached (eval_id, g) pair count is an upper bound on
    // the distinct gram count — in the unclamped regime an over-sized
    // filter only LOWERS the false-positive rate (output unchanged
    // either way: the exact join removes false positives), and the
    // bound skips the round-5 distinct-by-g exchange the exact count
    // paid just to size a filter (the count job doubles as the cache
    // materialization). PAST the clamp regime the argument inverts:
    // BloomFilterAggregate caps numBits at its conf maximum (default
    // 67,108,864 bits ≈ 4M items near 1% fpp) while the inflated item
    // estimate still drives the hash-function count, so a large upper
    // bound would DEGRADE the filter — there, pay the exact
    // distinct-gram count (tiny eval corpora, the common case, never
    // take that extra exchange).
    val expected0 =
      if (expectedGrams > 0) expectedGrams
      else math.max(eg.count(), 1L)
    val expected =
      if (expectedGrams > 0 || expected0 <= 4000000L) expected0
      else math.max(eg.select("g").distinct().count(), 1L)
    val numBits = math.max(BloomFilter.optimalNumOfBits(expected, fpp), 64L)
    val bfAgg = asCol(new BloomFilterAggregate(
      asExpr(col("g")), asExpr(lit(expected)),
      asExpr(lit(numBits))).toAggregateExpression())
    // the filter is built over the cached (eval_id, g) rows DIRECTLY:
    // Bloom insertion is idempotent, so a distinct-by-g before the
    // build would pay a whole exchange to deduplicate inserts the
    // filter dedupes for free
    val bf = eg.select("g").agg(bfAgg.as("bf")).scalar()
    val mightContain = asCol(BloomFilterMightContain(
      asExpr(bf), asExpr(col("g"))))
    val tg = Dedup.withHashedNgrams(train, idCol, textCol, n)
      .select(col("id"), explode(col("grams")).as("g"))
      .where(mightContain)
    tg.join(eg, "g") // unhinted: AQE broadcasts the tiny survivor side
      .groupBy("id")
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .where(col("n_shared_ngrams") >= minShared)
  }

  /** the clean training set: drop every doc [[overlap]] flags. Uses a
    * broadcast anti-join on the flagged id set (small by construction —
    * contamination is rare; if it weren't, the corpus has bigger
    * problems than the join strategy). */
  def clean(train: DataFrame, evalDf: DataFrame,
            idCol: String, textCol: String,
            evalIdCol: String, evalTextCol: String,
            n: Int = 8, minShared: Int = 1): DataFrame = {
    val flagged = overlap(train, evalDf, idCol, textCol,
      evalIdCol, evalTextCol, n, minShared)
      .select(col("id").as("_contaminated_id"))
    train.join(broadcast(flagged),
      col(idCol) === col("_contaminated_id"), "left_anti")
  }
}
