package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Uniqueness / duplicate-key detection (the `doc_id` uniqueness check of
  * BASELINE.json `north_rule`; no analog in the reference — SURVEY.md
  * §2.9 "distinct / uniqueness").
  *
  * Skew-explicit two-phase aggregation: phase 1 partially counts on
  * (key, salt) so a hot key (e.g. a crawler emitting one doc_id a billion
  * times) spreads over `saltBuckets` reducers; phase 2 merges the partial
  * counts per key. For uniform keys Catalyst's map-side partial agg makes
  * phase 1 nearly free; for skewed keys it bounds the largest reduce
  * partition by n_hot/saltBuckets. AQE skew handling covers joins but NOT
  * groupBy skew, hence the explicit salt (SURVEY.md §4.2).
  */
object Uniqueness {

  /** keys occurring more than once, with their multiplicity.
    *
    * `saltBuckets <= 1` (default): single hash-agg — Spark's map-side
    * partial aggregation already collapses a hot key to one partial row
    * per map task, so plain count-dedup is skew-safe AND one shuffle.
    * `saltBuckets > 1`: explicit two-phase salt, for aggregations whose
    * partial state is large (e.g. collecting duplicate row ids) where a
    * hot key would blow a single reducer. */
  def duplicates(df: DataFrame, keyCol: String,
                 saltBuckets: Int = 0): DataFrame = {
    val counts =
      if (saltBuckets <= 1)
        df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_dups"))
      else df
        .groupBy(col(keyCol), pmod(xxhash64(spark_partition_id(),
          monotonically_increasing_id()), lit(saltBuckets)).as("_salt"))
        .agg(count(lit(1)).as("_partial"))
        .groupBy(col(keyCol))
        .agg(sum(col("_partial")).as("n_dups"))
    counts.where(col("n_dups") > 1)
  }

  /** duplicate rows as violations: every row whose key is duplicated,
    * reported in the reference's violation shape.
    *
    * ONE shuffle: a window count over the key partition replaces the
    * groupBy + semi-join shape (two exchanges of the key column) —
    * measured faster on the flagship, and NULL keys group together
    * under the window natively (an equi-join would silently drop
    * them). Skewed hot keys land in one window partition; at
    * pathological skew use [[duplicates]] (map-side partial collapses
    * hot keys) + an explicit join instead. */
  def violations(df: DataFrame, keyCol: String, thing: String = "data")
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
    df.withColumn("_n_dups", count(lit(1)).over(w))
      .where(col("_n_dups") > 1)
      .select(
        col(keyCol).cast("string").as("doc_id"),
        lit("." + keyCol).as("path"),
        lit(s"unique `$keyCol`").as("expected"),
        col(keyCol).cast("string").as("got"),
        lit(s"unique($keyCol)").as("contract_repr"),
        concat(lit(s"check on `$thing` failed: Expected unique `$keyCol`, " +
          s"but got duplicate "), col(keyCol).cast("string")).as("message"))
  }
}
