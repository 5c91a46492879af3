package graft.engine

import graft.contracts._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Violation-set utilities (SURVEY.md §2.9: window functions, top-k
  * sampling, set ops). */
object ViolationOps {

  /** collect-ALL violations per row (engine extension of the
    * first-violation parity surface): one output row per violation, in
    * depth-first order, `seq` numbering them within a document. */
  def allViolations(df: DataFrame, contract: ObjectC, idCol: String,
                    thing: String = "data"): DataFrame = {
    implicit val env: MsgEnv = MsgEnv(thing, contract)
    val rowType = org.apache.spark.sql.types.StructType(df.schema.fields)
    val rowCol = struct(df.columns.toSeq.map(col): _*)
    val vs = Compiler.allViols(contract, rowType, rowCol, Frame.root)
    df.withColumn("_vs", vs)
      .where(size(col("_vs")) > 0)
      .select(col(idCol).cast("string").as("doc_id"),
        posexplode(col("_vs")).as(Seq("seq", "_v")))
      .select(col("doc_id"), col("seq"),
        col("_v.path").as("path"), col("_v.expected").as("expected"),
        col("_v.got").as("got"),
        lit(contract.render).as("contract_repr"),
        Compiler.assembleMessage(col("_v")).as("message"))
  }

  /** deterministic per-check violation sampling: at most `k` rows per
    * distinct (path-prefix, expected) check, chosen by doc_id order —
    * the triage view of a billion-violation run (orderBy().limit() per
    * group via row_number window). */
  def samplePerCheck(viols: DataFrame, k: Int): DataFrame = {
    val check = regexp_replace(col("path"), "\\[[0-9]+\\]", "[]")
    val w = Window.partitionBy(check, col("expected"))
      .orderBy(col("doc_id"), col("path"))
    viols.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k).drop("_rn")
  }

  /** golden-test diffing: multiset difference in both directions
    * (`exceptAll`) — empty ⇔ exact violation-set match. */
  def diff(actual: DataFrame, expected: DataFrame)
      : (DataFrame, DataFrame) = {
    val cols = expected.columns.map(col).toIndexedSeq
    val a = actual.select(cols: _*)
    (expected.exceptAll(a), a.exceptAll(expected))
  }
}
