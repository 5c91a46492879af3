package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity check: FK values with no match in a dimension
  * (the `media_ref` ∈ media-catalog check of BASELINE.json `north_rule`;
  * no reference analog — SURVEY.md §2.9 "joins").
  *
  * A left-anti join: Catalyst/AQE picks broadcast when the (deduplicated)
  * key side fits `spark.sql.autoBroadcastJoinThreshold`; callers with a
  * known-small catalog force it via `broadcastDim = true` so a 100 TB fact
  * side never shuffles. The dimension is projected to its key column
  * *before* the join (and distinct-ed) so the broadcast ships only keys.
  */
object Referential {

  /** rows of `fact` whose `fkCol` is non-null and absent from
    * `dim.pkCol`. NULL FKs are not violations here (nullability is the
    * object contract's concern — required vs optional). */
  def dangling(fact: DataFrame, fkCol: String, dim: DataFrame,
               pkCol: String, broadcastDim: Boolean = true): DataFrame = {
    val keys0 = dim.select(col(pkCol).as(fkCol)).distinct()
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    fact.where(col(fkCol).isNotNull).join(keys, Seq(fkCol), "left_anti")
  }

  /** dangling FKs in the violation shape. */
  def violations(fact: DataFrame, fkCol: String, dim: DataFrame,
                 pkCol: String, idCol: String, thing: String = "data",
                 broadcastDim: Boolean = true): DataFrame =
    dangling(fact, fkCol, dim, pkCol, broadcastDim)
      .select(
        col(idCol).cast("string").as("doc_id"),
        lit("." + fkCol).as("path"),
        lit(s"`$fkCol` present in catalog").as("expected"),
        col(fkCol).cast("string").as("got"),
        lit(s"ref($fkCol -> $pkCol)").as("contract_repr"),
        concat(lit(s"check on `$thing` failed: Expected `$fkCol` present " +
          s"in catalog, but got dangling "), col(fkCol).cast("string"))
          .as("message"))
}
