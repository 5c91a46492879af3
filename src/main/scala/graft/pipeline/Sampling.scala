package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: per-group rate
  * sampling (the "data mixture" step — e.g. keep 50% of English, 10%
  * of a boilerplate-heavy crawl) and per-group fixed-size subsets.
  *
  * Decisions are pure functions of (id, salt) via md5, NOT `rand()`:
  * a resumed/retried 10¹²-row job must make the SAME keep/drop choice
  * per row on re-execution (Spark retries tasks; rand() would ship
  * different rows per attempt and break exactly-once sinks), and any
  * other engine (the DuckDB oracle here) can replay the decision from
  * the same bytes.
  *
  * Scale shape: [[stratified]] is a stateless per-row filter — no
  * shuffle, pushes below wide transforms, linear scan. [[groupTopK]]
  * shuffles once on the group key with a rank window; for a hot group
  * at extreme scale, pre-thin with [[stratified]] at a generous rate
  * (E[survivors] ≫ k) before ranking so no single reducer sees the
  * whole group.
  */
object Sampling {

  /** first 8 hex chars of md5(key·salt) — a uniform 32-bit draw
    * rendered as fixed-width lowercase hex, so LEXICOGRAPHIC order
    * equals numeric order and any md5-bearing engine reproduces it. */
  def hashFrac(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** a rate in [0,1] as the 8-hex threshold its draws fall under.
    * rate ≥ 1.0 saturates to "g" — lexicographically above every hex
    * draw — so keep-everything really keeps the ~1-in-4B rows whose
    * draw is exactly "ffffffff" (a strict `<` against "ffffffff"
    * would drop ~250 rows at 10¹²). */
  def rateHex(rate: Double): String = {
    val n = math.min(math.max((rate * 4294967296.0).toLong, 0L),
      4294967296L)
    if (n >= 4294967296L) "g" else f"$n%08x"
  }

  /** per-group deterministic rate sampling: keep a row iff its hash
    * draw falls under its group's rate (groups absent from `rates` use
    * `default`). Expected survivor count per group = rate × group size;
    * membership is exact-replayable, never approximate-per-run. */
  def stratified(df: DataFrame, groupCol: String,
                 rates: Map[String, Double], default: Double,
                 idCol: String, salt: String = "graft"): DataFrame = {
    // ListMap-free fold is fine: when-chains evaluate first-match, and
    // group names are distinct keys so order cannot change the result
    val thr = rates.foldLeft(lit(rateHex(default))) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(rateHex(r))).otherwise(acc)
    }
    df.where(hashFrac(col(idCol), salt) < thr)
  }

  /** deterministic k-subset per group: rank rows by hash draw (id as
    * total tie-break) within each group, keep the first k — a uniform
    * without-replacement sample whose membership is stable across
    * runs, engines, and partitionings. */
  def groupTopK(df: DataFrame, groupCol: String, idCol: String, k: Int,
                salt: String = "graft-topk"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashFrac(col(idCol), salt), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** [[groupTopK]]'s scale shape for integral ids: the same
    * deterministic k-subset — (hash draw asc, id asc) per group —
    * computed by a k-bounded aggregate
    * ([[graft.functions.TopKNeighbors]] over the NEGATED numeric draw)
    * instead of a rank window, returning only
    * `(groupCol, sample_rank, idCol)` (id widened to bigint).
    *
    * Why: the window shuffles EVERY row to |groups| reducers — with
    * few groups (languages, sources) that is the skew trap at
    * 10¹²-row scale, which [[groupTopK]] mitigates only by documented
    * pre-thinning. The aggregate keeps ≤ k ids per (group, map task)
    * before the exchange, so no reducer ever sees a whole group; need
    * full rows? join the k·|groups| ids back (broadcast-sized by
    * construction). Row-identical to [[groupTopK]] whenever ids are
    * unique within a group (the md5 draw is a fixed-width hex render
    * of a 32-bit value, so lexicographic asc ≡ numeric asc ≡ negated
    * desc; ties break by id asc on both paths). */
  def groupTopKIds(df: DataFrame, groupCol: String, idCol: String,
                   k: Int, salt: String = "graft-topk"): DataFrame = {
    // integral ids ONLY: the id rides through a bigint-typed aggregate
    // slot, so a string/decimal id would cast to null (runtime encoder
    // failure) or silently reorder ties vs groupTopK's native string
    // order. Fail fast instead of leaving the constraint in prose.
    val idType = df.schema(idCol).dataType
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    require(integral(idType),
      s"groupTopKIds requires an integral id column (byte/short/int/" +
        s"long) — '$idCol' is ${idType.sql}; use groupTopK (rank " +
        "window, any id type) or pre-map ids to a dense bigint")
    val draw = conv(hashFrac(col(idCol), salt), 16, 10).cast("double")
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKNeighbors.topk(k)(
        -draw, col(idCol).cast("long")).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).as("sample_rank"),
        col("col.neighbor").as(idCol))
  }
}
