package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable quality-filter funnel for training-data pipelines: a
  * named list of keep-predicates applied as ONE conjunctive filter,
  * with per-rule drop accounting computed in the SAME single scan —
  * at 100 TB, "how many rows did each rule kill?" must not cost one
  * table scan per rule.
  *
  * Two attribution views per rule, both standard funnel metrics:
  *  - `n_fail`: rows failing the rule regardless of the others
  *    (independent marginals — overlaps double-count);
  *  - `n_fail_first`: rows attributed to the FIRST failing rule in
  *    declaration order (a partition of all dropped rows).
  */
object QualityFilter {

  /** SQL three-valued logic would let a NULL-valued predicate drop a
    * row in [[apply]] yet count it as passing in [[report]]; pin both
    * to the same two-valued read: NULL keep = fail. */
  private def keep2v(c: Column): Column = coalesce(c, lit(false))

  /** the kept rows: one conjunctive predicate, fully pushdown-eligible
    * (plain boolean Columns — Catalyst splits and pushes conjuncts).
    * No rules ⇒ identity (a config-driven empty rule list is valid). */
  def apply(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    if (rules.isEmpty) df
    else df.where(rules.map(r => keep2v(r._2)).reduce(_ && _))

  /** one-scan funnel report: one row per rule (declaration order,
    * `rule_idx` carries it) with independent and first-fail drop
    * counts, plus a trailing `__kept__` row with the surviving count.
    * Single aggregation over conditional counts — the scan cost is one
    * pass whatever the rule count. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    if (rules.isEmpty)
      return df.agg(count(lit(1)).as("kept"))
        .select(lit(0).as("rule_idx"), lit("__kept__").as("rule"),
          col("kept").as("n_fail"), col("kept").as("n_fail_first"))
    val ks = rules.map(r => keep2v(r._2))
    val aggs = ks.zipWithIndex.flatMap { case (keep, i) =>
      val firstFail = ks.take(i).foldLeft(!keep) {
        (acc, prevKeep) => acc && prevKeep
      }
      Seq(count(when(!keep, 1)).as(s"f$i"),
        count(when(firstFail, 1)).as(s"ff$i"))
    } :+ count(when(ks.reduce(_ && _), 1)).as("kept")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot by exploding ONE struct array over the single agg row —
    // a per-rule select+union would re-run the aggregation per branch
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("rule_idx"), lit(name).as("rule"),
        col(s"f$i").as("n_fail"), col(s"ff$i").as("n_fail_first"))
    } :+ struct(lit(rules.size).as("rule_idx"),
      lit("__kept__").as("rule"), col("kept").as("n_fail"),
      col("kept").as("n_fail_first"))
    row.select(explode(array(entries: _*)).as("e"))
      .select(col("e.rule_idx").as("rule_idx"), col("e.rule").as("rule"),
        col("e.n_fail").as("n_fail"),
        col("e.n_fail_first").as("n_fail_first"))
      .orderBy("rule_idx")
  }
}
