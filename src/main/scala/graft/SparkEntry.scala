package graft

import graft.contracts._
import graft.engine._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one entry per implemented operator (SURVEY.md §2 /
  * §7), each with a DuckDB-runnable oracle in [[SparkEntry.oracleSql]].
  * All queries order their output deterministically and avoid
  * order-dependent floating-point aggregation so the hash compare is
  * stable (integer-valued sums, or explicit rounding).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Policy contract for the driver `documents` table — exercises the
    * object/field machinery: required fields, integer refinement, enum
    * (oneOf), regex (matches), and() chains with range + cross-field
    * predicates (contract.impl.js:642-730, :308-321, :412-418, :384-410).
    */
  private[graft] def documentsContract: ObjectC = C.obj(
    "doc_id" -> C.integer,
    "text" -> C.nonEmptyString,
    "lang" -> C.oneOf("en", "es", "de", "fr"),
    "source" -> C.matches("^src[0-9]+$"),
    "n_chars" -> C.and(C.integer, C.between(1, 500),
      C.pred("n_chars = length(text)")(c => c === length(col("text")))))

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Validate.violations(t(spark, "/root/testdata/sf0.001", "documents"),
      documentsContract, "doc_id", "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // contract validation: first violation per row, canonical order
    "v_documents" -> ((s, dir) =>
      Validate.violations(t(s, dir, "documents"), documentsContract,
          "doc_id", "documents")
        .select("doc_id", "path", "expected", "got", "message")
        .orderBy("doc_id")),

    // per-partition pass/fail summary (partition key = source)
    "summary_documents" -> ((s, dir) =>
      Validate.summaryByColumn(t(s, dir, "documents"), documentsContract,
          "source")
        .orderBy("partition_key")),

    // uniqueness: duplicate keys with multiplicity (skew-safe agg)
    "uniq_lineitem" -> ((s, dir) =>
      Uniqueness.duplicates(t(s, dir, "lineitem"), "l_orderkey")
        .orderBy("l_orderkey")),

    // referential: FK probe against a filtered catalog (anti-join,
    // broadcast dimension)
    "ref_lineitem_part" -> ((s, dir) =>
      Referential.dangling(t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part").where(col("p_size") <= 25), "p_partkey")
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")),

    // single-scan per-column stats (exact audit mode for oracle parity)
    "stats_documents" -> ((s, dir) =>
      Stats.profile(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"), exact = true)
        .orderBy("column")),

    // length histogram (log2 buckets)
    "hist_doc_length" -> ((s, dir) =>
      Stats.lengthHistogram(t(s, dir, "documents"), "text")
        .orderBy("bucket")),

    // flagship span-document validation (input_hint schema): generated
    // deterministic table + media catalog, full validation pass
    // (contract + uniqueness + referential), per-check violation counts.
    // Not SQL-expressible over the driver tables → rows-only check.
    "span_validate" -> ((s, dir) => {
      val docs = gen.SpanGen.docs(s, 20000, 32,
        defects = gen.SpanGen.Defects(nullKind = true, badKind = true,
          textOnMedia = true, danglingRef = true, dupDocId = true,
          negOffset = true, rate = 200, hotKeyEvery = 500))
      val media = gen.SpanGen.media(s, 10000)
      SpanDocs.validateAll(docs, media)
        .groupBy(substring(col("expected"), 1, 40).as("check"))
        .agg(count(lit(1)).as("n_violations"))
        .orderBy("check")
    }),

    // classic aggregation sanity (integer-valued sums only)
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")))

  def oracleSql: Map[String, String] = Map(

    "v_documents" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id, path, expected, got,
        |  'check on `documents` failed: Expected ' || expected ||
        |  ', but got ' || got || ', at position documents' || path AS message
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN lang IS NULL THEN '.lang'
        |         WHEN lang NOT IN ('en','es','de','fr') THEN '.lang'
        |         WHEN n_chars IS NULL THEN '.n_chars'
        |         WHEN NOT (n_chars >= 1 AND n_chars <= 500)
        |           THEN '.n_chars.and(1)'
        |         WHEN n_chars <> length(text) THEN '.n_chars.and(2)'
        |    END AS path,
        |    CASE WHEN lang IS NULL THEN 'Field `lang`'
        |         WHEN lang NOT IN ('en','es','de','fr')
        |           THEN 'oneOf(''en'', ''es'', ''de'', ''fr'')'
        |         WHEN n_chars IS NULL THEN 'Field `n_chars`'
        |         WHEN NOT (n_chars >= 1 AND n_chars <= 500)
        |           THEN 'between(1, 500)'
        |         WHEN n_chars <> length(text) THEN 'n_chars = length(text)'
        |    END AS expected,
        |    CASE WHEN lang IS NULL THEN 'null'
        |         WHEN lang NOT IN ('en','es','de','fr')
        |           THEN '''' || lang || ''''
        |         WHEN n_chars IS NULL THEN 'null'
        |         ELSE CAST(n_chars AS VARCHAR)
        |    END AS got
        |  FROM documents)
        |WHERE path IS NOT NULL ORDER BY CAST(doc_id AS VARCHAR)"""
        .stripMargin,

    "summary_documents" ->
      """WITH f AS (
        |  SELECT source,
        |    CASE WHEN doc_id IS NULL OR text IS NULL OR length(text) = 0
        |      OR lang IS NULL OR lang NOT IN ('en','es','de','fr')
        |      OR source IS NULL
        |      OR NOT regexp_matches(source, '^src[0-9]+$')
        |      OR n_chars IS NULL OR NOT (n_chars >= 1 AND n_chars <= 500)
        |      OR n_chars <> length(text) THEN 1 END AS bad
        |  FROM documents)
        |SELECT source AS partition_key, count(*) AS n_checked,
        |  count(bad) AS n_failed, count(bad) = 0 AS pass
        |FROM f GROUP BY source ORDER BY partition_key""".stripMargin,

    "uniq_lineitem" ->
      """SELECT l_orderkey, count(*) AS n_dups FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey"""
        .stripMargin,

    "ref_lineitem_part" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem l
        |WHERE l.l_partkey IS NOT NULL AND NOT EXISTS (
        |  SELECT 1 FROM part p
        |  WHERE p.p_partkey = l.l_partkey AND p.p_size <= 25)
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "stats_documents" ->
      Seq("doc_id", "lang", "source", "n_chars").map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS ndv,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s FROM documents""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),

    "hist_doc_length" ->
      """SELECT CASE WHEN text IS NULL OR length(text) = 0 THEN -1
        |  ELSE CAST(floor(log2(length(text))) AS BIGINT) END AS bucket,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
