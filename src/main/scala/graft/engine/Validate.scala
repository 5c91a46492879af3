package graft.engine

import graft.contracts._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Canonical violation row — errors become *data*, not exceptions
  * (SURVEY.md §2.6; ContractError fields, contract-errors.js:124-231). */
case class Violation(doc_id: String, path: String, expected: String,
                     got: String, contract_repr: String, message: String)

/** the ContractError analog for the fail-fast `checkOrThrow` mode. */
class ContractViolationException(message: String, val docId: String,
                                 val path: String)
    extends RuntimeException(message)

/** Batch validation: the data-plane analog of `contract.check(data, name)`
  * (contract.impl.js:265-269, 167-175).
  *
  * One declarative pass: the compiled first-violation expression is a
  * single projected column, so Catalyst prunes the scan to exactly the
  * columns the contract touches, pushes any pre-filters to parquet, and
  * whole-stage-codegens the check. `violations` and `summary` both derive
  * from the same plan; at 10¹² rows the per-partition summary is a
  * map-side partial agg (no extra scan of the violation details).
  *
  * Messages are rendered in the reference's ContractError format
  * (multi-line; see [[graft.contracts.Compiler.assembleMessage]]),
  * byte-identical to messages captured from executing the reference.
  * The "The full value being checked was:" section follows
  * `withFullValue` (off by default at scale — it renders the complete
  * document per violation).
  */
object Validate {

  /** Row-level validation of a DataFrame against an object contract whose
    * fields bind to top-level columns. `thing` is the check name appearing
    * in messages (the `name` arg of `check`, contract.impl.js:265).
    * This is the GENERIC compile — the semantic reference; hot paths use
    * [[fastFirstViolation]] (same output, property-asserted). */
  def firstViolation(df: DataFrame, contract: ObjectC,
                     thing: String = "data",
                     withFullValue: Boolean = false): Column = {
    implicit val env: MsgEnv = msgEnv(df, contract, thing, withFullValue)
    Compiler.objectViols(contract, df.schema, f => col(f), Frame.root,
      rowRender(df))
  }

  /** first violation through the codegen'd verdict compiler
    * (graft.functions.ContractCheck): pass/fail decided by a generated
    * primitive loop (no HOF interpretation — measured 2.3x over the
    * generic compile on the flagship shape), failing rows delegate to
    * the generic expression for bit-identical payloads. */
  def fastFirstViolation(df: DataFrame, contract: ObjectC,
                         thing: String = "data"): Column =
    graft.functions.ContractCheck.rowFirstViolation(df, contract, thing)

  private def rowRender(df: DataFrame): Column =
    Compiler.render(StructType(df.schema.fields),
      struct(df.columns.toSeq.map(col): _*))

  private def msgEnv(df: DataFrame, contract: ObjectC, thing: String,
                     withFullValue: Boolean): MsgEnv =
    MsgEnv(thing, contract.render,
      if (withFullValue) Some(rowRender(df)) else None)

  /** violations dataset: one row per input row with >= 1 violation,
    * carrying the first violation in canonical traversal order
    * ("throws first error" ⇒ first in depth-first declaration order). */
  def violations(df: DataFrame, contract: ObjectC, idCol: String,
                 thing: String = "data"): DataFrame =
    violations(df, contract, idCol, thing, withFullValue = false)

  /** `withFullValue = true` adds the reference's "The full value being
    * checked was: …" section to messages (contract-errors.js:182-198) —
    * full byte-parity mode — plus a `full_value` column (depth-capped
    * rendering of the whole row, suppressed (null) when it would just
    * repeat `got`). Off by default at scale: it renders the complete
    * document per violation. */
  def violations(df: DataFrame, contract: ObjectC, idCol: String,
                 thing: String, withFullValue: Boolean): DataFrame = {
    implicit val env: MsgEnv = msgEnv(df, contract, thing, withFullValue)
    // default mode runs the codegen'd verdict (payloads delegated to the
    // generic compile — identical by construction); full-value parity
    // mode compiles generically so rootRender threads into or-messages
    val v =
      if (withFullValue)
        Compiler.objectViols(contract, df.schema, f => col(f),
          Frame.root, rowRender(df))
      else fastFirstViolation(df, contract, thing)
    val base = df.withColumn("_v", v)
      .where(col("_v").isNotNull)
    val core = Seq(
      col(idCol).cast("string").as("doc_id"),
      col("_v.path").as("path"),
      col("_v.expected").as("expected"),
      col("_v.got").as("got"),
      lit(contract.render).as("contract_repr"),
      Compiler.assembleMessage(col("_v")).as("message"))
    if (!withFullValue) base.select(core: _*)
    else {
      val full = rowRender(df)
      base.select(core :+
        when(full === col("_v.got"), lit(null))
          .otherwise(full).as("full_value"): _*)
    }
  }

  /** per-partition pass/fail summary (BASELINE.json `north_rule`):
    * partitions are *data* partitions (a caller-supplied partition
    * column, e.g. an ingest date or bucket id), not task partitions —
    * stable across reruns and cluster sizes. */
  def summaryByColumn(df: DataFrame, contract: ObjectC,
                      partCol: String): DataFrame = {
    val v = fastFirstViolation(df, contract)
    df.withColumn("_fail", v.isNotNull)
      .groupBy(col(partCol).as("partition_key"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("_fail"), 1L).otherwise(0L)).as("n_failed"))
      .withColumn("pass", col("n_failed") === 0L)
  }

  /** task-partition summary (spark_partition_id) — used by the resume
    * manifest where lineage is per input split. */
  def summaryByTaskPartition(df: DataFrame, contract: ObjectC): DataFrame = {
    val v = fastFirstViolation(df, contract)
    df.withColumn("_fail", v.isNotNull)
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("_fail"), 1L).otherwise(0L)).as("n_failed"))
      .withColumn("pass", col("n_failed") === 0L)
  }

  /** literal `check(data)` parity: throw on the FIRST violation with the
    * reference-format message (ContractError semantics,
    * contract.impl.js:167-175 / contract-errors.js) — the driver-side
    * fail-fast mode for small/gate datasets; batch jobs use
    * [[violations]] (errors as data). Returns the input unchanged on
    * success, like the reference's `check`. Full-value reporting is ON:
    * fail-fast mode is for small data, so the reference's complete
    * message applies. */
  def checkOrThrow(df: DataFrame, contract: ObjectC, idCol: String,
                   thing: String = "data"): DataFrame = {
    // same RDD analysis barrier as checkMemberOrThrow: a caller may
    // gate a frame whose columns are themselves large compiled
    // expressions, and composing the check directly would let the
    // optimizer inline those trees into every probe reference (plan
    // stringification then walks a blown-up tree for minutes).
    // Full-value mode renders every column anyway, so the barrier
    // costs no pruning; the ORIGINAL df is returned for chaining.
    val probe = df.sparkSession.createDataFrame(df.rdd, df.schema)
    val first = violations(probe, contract, idCol, thing,
      withFullValue = true).limit(1).collect()
    if (first.nonEmpty)
      throw new ContractViolationException(
        first(0).getAs[String]("message"),
        first(0).getAs[String]("doc_id"), first(0).getAs[String]("path"))
    df
  }

  /** wrapped-member enforcement (see [[Publish]]): blame follows the
    * reference's wrapping mode (contract-errors.js:163-169; messages
    * captured by executing the reference) — input failures blame the
    * CALLER ("broke the contract on `m()`:"), result failures blame the
    * MEMBER ("`m()` broke its contract:"), and result-side frames carry
    * the '.result' / "for the return value of the call." stack item
    * (contract-errors.js:23, function-contracts.js:146-152). `fnRepr`
    * is the function-contract rendering shown in the `in contract:`
    * clause. The reference's "(contract was wrapped at: file:line)"
    * line is a JS-stack artifact and is not reproduced. Returns `df`
    * unchanged on success. */
  def checkMemberOrThrow(df: DataFrame, contract: ObjectC, idCol: String,
                         member: String, fnRepr: String,
                         isResult: Boolean,
                         argFrame: Option[(Int, Boolean)] = None,
                         argName: Option[String] = None,
                         thisFrame: Boolean = false)
      : DataFrame = {
    val blame =
      if (isResult) s"`$member()` broke its contract:"
      else s"broke the contract on `$member()`:"
    // wrapping mode has no "The full value being checked was:" section
    // (contract-errors.js:182-198 gates on !context.wrapping)
    implicit val env: MsgEnv =
      MsgEnv(member, fnRepr, None, Some(blame))
    // multi-input members stack the reference's argument frame
    // (stackContextItems.argument, contract-errors.js:12-18; extras:
    // :209-216 render "… extra argument of the call.")
    val frame = argFrame match {
      case Some((i, isExtra)) =>
        if (isExtra) Frame.root.push(lit(s".extraArguments[$i]"),
          lit(s"for the ${Compiler.ithS(i)} extra argument of the call."))
        else argName match {
          // named-arg variant (stackContextItems.argument with a
          // thingName, contract-errors.js:12-18): `.name` short frame
          case Some(n) => Frame.root.push(lit(s".$n"),
            lit(s"for the `$n` argument of the call."))
          case None => Frame.root.push(lit(s".arg($i)"),
            lit(s"for the ${Compiler.ithS(i)} argument of the call."))
        }
      case None if isResult => Frame.root.push(lit(".result"),
        lit("for the return value of the call."))
      // receiver frame (stackContextItems.this, contract-errors.js:21)
      case None if thisFrame => Frame.root.push(lit(".this"),
        lit("for the `this` argument of the call."))
      case None => Frame.root
    }
    // The probe runs over an RDD ANALYSIS BARRIER, not the member's
    // plan directly: when the checked frame's columns are themselves
    // large compiled expressions (a member returning a violations
    // frame), composing the shape check on top lets the optimizer
    // inline the member's expression trees into every probe reference,
    // and the action-time plan stringification (SQL listener events)
    // then walks a combinatorially blown-up tree — minutes of driver
    // CPU on toString alone. Behind the barrier the member's plan is a
    // leaf; the probe's own plan stays probe-sized. The ORIGINAL df is
    // returned for chaining, so downstream composition/pushdown is
    // unaffected; the barrier exists only inside this one gate job.
    val probe = df.sparkSession.createDataFrame(df.rdd, df.schema)
    val v = Compiler.objectViols(contract, probe.schema, f => col(f),
      frame, Compiler.render(StructType(probe.schema.fields),
        struct(probe.columns.toSeq.map(col): _*)))
    val id: Column =
      if (probe.columns.contains(idCol)) col(idCol).cast("string")
      else lit(null).cast("string") // member may project the id away
    val first = probe.withColumn("_v", v).where(col("_v").isNotNull)
      .select(id.as("doc_id"), col("_v.path").as("path"),
        Compiler.assembleMessage(col("_v")).as("message"))
      .limit(1).collect()
    if (first.nonEmpty)
      throw new ContractViolationException(
        first(0).getAs[String]("message"),
        first(0).getAs[String]("doc_id"), first(0).getAs[String]("path"))
    df
  }

  /** single-column convenience: validate one column against any contract */
  def columnViolations(df: DataFrame, colName: String, contract: Contract,
                       idCol: String, thing: String = "data",
                       withFullValue: Boolean = false): DataFrame = {
    val dt = df.schema(colName).dataType
    implicit val env: MsgEnv = MsgEnv(thing, contract.render,
      if (withFullValue) Some(Compiler.render(dt, col(colName))) else None)
    val f = Frame.root.push(lit("." + colName),
      lit(s"for the field `$colName` of the object"))
    val v = Compiler.firstViol(contract, dt, col(colName), f)
    df.withColumn("_v", v)
      .where(col("_v").isNotNull)
      .select(
        col(idCol).cast("string").as("doc_id"),
        col("_v.path").as("path"),
        col("_v.expected").as("expected"),
        col("_v.got").as("got"),
        lit(contract.render).as("contract_repr"),
        Compiler.assembleMessage(col("_v")).as("message"))
  }
}
