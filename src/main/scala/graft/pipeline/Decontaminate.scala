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
    val tg = Dedup.withNgrams(train, idCol, textCol, n)
      .select(col("id"), explode(col("grams")).as("g"))
    val eg = Dedup.withNgrams(evalDf, evalIdCol, evalTextCol, n)
      .select(col("id").as("eval_id"), explode(col("grams")).as("g"))
      .distinct()
    tg.join(broadcast(eg), "g")
      .groupBy("id")
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .where(col("n_shared_ngrams") >= minShared)
  }

  /** [[overlap]] for eval corpora too big to broadcast as an exact
    * gram set: a Bloom filter of the eval n-grams (built distributed
    * via `DataFrameStatFunctions.bloomFilter`, ~1.2 bytes/gram at 1%
    * fpp vs ~50+ bytes for the gram string itself) prunes the training
    * side MAP-SIDE — a gram the filter rejects is DEFINITELY not in the
    * eval set (no false negatives), so only bloom hits (true overlaps +
    * an fpp-fraction of false positives) reach the exact verification
    * join, which removes the false positives. Output is identical to
    * [[overlap]]; the training table is still never shuffled by n-gram,
    * and the verification join's input is ~|true overlaps| +
    * fpp·|training grams| instead of |training grams| — AQE sees the
    * runtime size and picks broadcast for the typical tiny survivor set.
    *
    * `expectedGrams` sizes the filter; 0 means count the deduped eval
    * grams first (one extra pass over the SMALL side only).
    *
    * The eval gram projection feeds THREE subtrees (the sizing count,
    * the filter build, the verification join), so it is persisted for
    * the call — like `Dedup.ngramJaccardPairs`' gram projection, the
    * returned plan still references it, so CALLERS own the unpersist
    * (drop the returned frame or clear persistent RDDs between passes). */
  def overlapBloom(train: DataFrame, evalDf: DataFrame,
                   idCol: String, textCol: String,
                   evalIdCol: String, evalTextCol: String,
                   n: Int = 8, minShared: Int = 1, fpp: Double = 0.01,
                   expectedGrams: Long = 0L): DataFrame = {
    val eg = Dedup.withNgrams(evalDf, evalIdCol, evalTextCol, n)
      .select(col("id").as("eval_id"), explode(col("grams")).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val egGrams = eg.select("g").distinct()
    val expected =
      if (expectedGrams > 0) expectedGrams
      else math.max(egGrams.count(), 1L)
    // the filter rides to executors as a BROADCAST variable, not a UDF
    // closure: a closure-captured filter is re-serialized into every
    // task binary of every stage that touches the probe (at 10⁹ eval
    // grams the filter is GBs — broadcast ships it once per executor
    // via the torrent protocol and keeps it off the task path). Its
    // lifecycle tracks the returned plan: the probe UDF holds the only
    // handle, so once the caller drops the frame the ContextCleaner's
    // reference tracking reclaims the blocks everywhere — no explicit
    // destroy() needed (calling it early would break the lazy plan).
    val bfB = train.sparkSession.sparkContext.broadcast(
      egGrams.stat.bloomFilter("g", expected, fpp))
    val mightContain =
      udf((s: String) => s != null && bfB.value.mightContainString(s))
    val tg = Dedup.withNgrams(train, idCol, textCol, n)
      .select(col("id"), explode(col("grams")).as("g"))
      .where(mightContain(col("g")))
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
