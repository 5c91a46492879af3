package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl corpora — the normalize-before-dedup
  * step (two crawls of `HTTP://Example.COM:80/a?utm_source=x#top` and
  * `http://example.com/a` are the same document; URL-exact dedup
  * without canonicalization silently keeps both).
  *
  * Normalization steps, in order:
  *  1. lowercase the scheme and host (path/query stay case-sensitive);
  *  2. drop the fragment (`#…` — never sent to the server);
  *  3. drop `utm_*` tracking parameters, tidying separators;
  *  4. drop explicit default ports (`:80` for http, `:443` for https);
  *  5. drop a trailing `/` on a non-root path.
  *
  * All steps are `regexp_extract`/`regexp_replace` with RE2/Java-
  * portable patterns (classes + bounded alternation, no lookaround) —
  * a pure codegen'd row-local projection: zero shuffle, linear-time
  * matching on adversarial crawl strings, and a DuckDB oracle replays
  * every step verbatim. [[urlNormSqlSteps]] exposes the SQL form built
  * from the SAME pattern constants so the engines cannot drift.
  */
object UrlNorm {

  /** (pattern, replacement) applied in order by both engines. */
  val steps: Seq[(String, String)] = Seq(
    // 2. fragment
    ("#[^#]*$", ""),
    // 3a. a RUN of utm_* params each followed by '&' keeps only its
    //     leading separator (runs must match as one unit: global
    //     replace scans past each match, so per-param removal would
    //     strand every second utm param in a run)
    ("([?&])(utm_[A-Za-z0-9_]*=[^&#]*&)+", "$1"),
    // 3b. a trailing utm_* param goes together with its separator
    ("[?&]utm_[A-Za-z0-9_]*=[^&#]*$", ""),
    // 3c. a now-empty query
    ("[?]$", ""),
    // 4. default ports (the port may be followed by a path, a query —
    //    `http://h.org:80?a=1` — or nothing at all; `$3` re-emits the
    //    captured separator)
    ("^(http)://([^/:]+):80(/|[?]|$)", "$1://$2$3"),
    ("^(https)://([^/:]+):443(/|[?]|$)", "$1://$2$3"),
    // 5. trailing slash on a non-root path
    ("^([a-z]+://[^/]+/.+)/$", "$1"))

  /** scheme+host lowercased, rest untouched (step 1): rebuilt from
    * regex groups — no UDF, no java.net.URI (whose parse rejects the
    * malformed URLs a crawl always contains; unparseable rows pass
    * through unchanged rather than nulling out). */
  private def lowerSchemeHost(u: Column): Column = {
    val scheme = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val host = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)",
      1)
    val rest = regexp_replace(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    when(scheme === "", u)
      .otherwise(concat(lower(scheme), lit("://"), lower(host), rest))
  }

  /** adds url_norm, host, and domain (last two host labels — a
    * registrable-domain approximation good enough for per-site
    * grouping without a public-suffix list).
    *
    * Scheme-less strings (no `scheme://` prefix — a crawl's malformed
    * rows) pass through COMPLETELY unchanged: every step, not just the
    * lowercasing one, is gated on a parsed scheme, so `not a url #x`
    * keeps its `#x` instead of spuriously merging with `not a url`
    * under dedup-by-url_norm. */
  def normalize(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame = {
    // build the chain from col("url") AFTER the rename below, so any
    // caller-side column name works (building from col(urlCol) would
    // fail analysis once the select renames it away)
    val u = col("url")
    val scheme = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val stepped = steps.foldLeft(lowerSchemeHost(u)) {
      case (c, (re, repl)) => regexp_replace(c, re, repl)
    }
    val normed = when(scheme === "", u).otherwise(stepped)
    val host = regexp_extract(col("url_norm"), "^[a-z]+://([^/?#:]*)", 1)
    df.select(col(idCol).as("id"), col(urlCol).as("url"))
      .withColumn("url_norm", normed)
      .withColumn("host", host)
      .withColumn("domain",
        regexp_extract(col("host"), "([^.]+[.][^.]+)$", 1))
  }

  /** the identical normalization as DuckDB SQL over column `expr0`,
    * generated from the same constants ([[steps]] + the scheme/host
    * patterns). Returns the SQL expression string for url_norm. */
  def urlNormSql(expr0: String): String = {
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
    val headRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val lowered =
      s"""CASE WHEN regexp_extract($expr0, '$schemeRe', 1) = ''
         | THEN $expr0
         | ELSE lower(regexp_extract($expr0, '$schemeRe', 1)) || '://' ||
         |   lower(regexp_extract($expr0, '$hostRe', 1)) ||
         |   regexp_replace($expr0, '$headRe', '')
         | END""".stripMargin.replace("\n", " ")
    val stepped = steps.foldLeft(lowered) { case (e, (re, repl)) =>
      // DuckDB backreference syntax is \1 (RE2), not $1; and DuckDB
      // regexp_replace is FIRST-match unless passed 'g' — Spark's is
      // always global, and the utm-run rule can match several times
      // in one query string (utm runs split by non-utm params)
      val r = repl.replace("$", "\\")
      s"regexp_replace($e, '$re', '$r', 'g')"
    }
    // mirror the Spark side's whole-chain scheme gate (see normalize):
    // scheme-less rows pass through untouched by EVERY step
    s"""CASE WHEN regexp_extract($expr0, '$schemeRe', 1) = ''
       | THEN $expr0 ELSE $stepped END""".stripMargin.replace("\n", " ")
  }
}
