package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column statistics profile (the column-stats pass of BASELINE.json
  * `north_rule`: null-rate, distinct count, min/max; no reference analog
  * — SURVEY.md §2.9 "aggregation").
  *
  * Single scan: every metric for every profiled column is one aggregate
  * expression in ONE `agg` call, so Catalyst fuses them into a single
  * partial+final hash aggregation over one pass of the data; the long
  * (row-per-column) shape is produced by exploding an array of structs
  * AFTER aggregation (driver-sized data, zero extra scans).
  *
  * `exact = false` (the 100 TB default) uses HyperLogLog++
  * (`approx_count_distinct`, rsd 0.05) — constant memory, one pass.
  * `exact = true` is the small-scale audit mode (SURVEY.md §5.2 #4): each
  * exact distinct adds an Expand branch, multiplying scanned rows — fine
  * for audits, wrong at scale.
  */
object Stats {

  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false): DataFrame = {
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__ndv").as("ndv"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    wide.select(explode(array(entries: _*)).as("s")).select("s.*")
  }

  /** log2 length histogram for a string column — the length-histogram
    * check (`north_star`): bucket = floor(log2(length)), one groupBy. */
  def lengthHistogram(df: DataFrame, c: String): DataFrame =
    df.select(when(col(c).isNull, lit(-1))
        .when(length(col(c)) === 0, lit(-1))
        .otherwise(floor(log2(length(col(c))))).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
}
