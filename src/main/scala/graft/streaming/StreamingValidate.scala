package graft.streaming

import graft.contracts.ObjectC
import graft.engine.{Manifest, SpanDocs, Validate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Structured-Streaming adoption of the validation pass (SURVEY.md
  * §2.9 "streaming": absent from the reference; the engine keeps
  * validation a pure DataFrame → DataFrame function so it drops into a
  * stream unchanged).
  *
  * Two modes:
  *  - [[violations]]: stateless per-row checking on a streaming frame —
  *    works in append mode with no watermark (the compiled contract is
  *    a projection+filter).
  *  - [[foreachBatchSink]]: per-micro-batch validation wired into the
  *    SAME manifest/resume log the batch runner uses (batch id =
  *    partition id) — violations land partitioned by batch, summaries
  *    append to the manifest, giving exactly-once-per-batch semantics on
  *    restart via Spark's checkpointing + the manifest's idempotent
  *    (snapshot, partition) key.
  */
object StreamingValidate {

  /** stateless streaming violations — append-mode safe. */
  def violations(stream: DataFrame, contract: ObjectC, idCol: String,
                 thing: String = "stream"): DataFrame =
    Validate.violations(stream, contract, idCol, thing)

  /** foreachBatch sink: validate each micro-batch, write violations to
    * `outDir/violations/part=<batchId>`, append a manifest row. */
  def foreachBatchSink(stream: DataFrame, contract: ObjectC,
                       idCol: String, outDir: String, snapshotId: String)
      : DataStreamWriter[Row] = {
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val done = Manifest.completed(spark, outDir, snapshotId)
      if (!done.contains(batchId.toInt)) {
        val viols = Validate.violations(batch, contract, idCol, "stream")
        viols.write.mode("overwrite")
          .parquet(s"$outDir/violations/part=$batchId")
        val n = batch.count()
        val nFailed = spark.read
          .parquet(s"$outDir/violations/part=$batchId")
          .select("doc_id").distinct().count()
        Manifest.append(spark, outDir, snapshotId, batchId.toInt, n,
          nFailed, 0L, batchId)
      }
      ()
    }
  }

  /** streaming referential check: dangling-FK rows of an unbounded
    * stream against a bounded static dimension (the `media_ref` ∈
    * media-catalog check of the north rule, in stream form). A
    * stream-static join is STATELESS — each micro-batch joins the
    * static side, nothing accumulates in streaming state — so this is
    * append-mode safe with no watermark. The dimension is key-projected
    * and distinct-ed before the join and broadcast by default
    * (known-small catalogs): the stream side never shuffles, the same
    * plan shape as the batch [[graft.engine.Referential]]. Implemented
    * as stream-static LEFT OUTER + null-filter, the join type
    * Structured Streaming guarantees for a stream left side; output
    * rows equal the batch left-anti. */
  def danglingRefs(stream: DataFrame, fkCol: String, dim: DataFrame,
                   pkCol: String, idCol: String,
                   thing: String = "stream",
                   broadcastDim: Boolean = true): DataFrame = {
    val keys0 = dim.select(col(pkCol).as(fkCol)).distinct()
      .withColumn("_present", lit(true))
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    stream.where(col(fkCol).isNotNull)
      .join(keys, Seq(fkCol), "left_outer")
      .where(col("_present").isNull)
      .select(
        col(idCol).cast("string").as("doc_id"),
        lit("." + fkCol).as("path"),
        lit(s"`$fkCol` present in catalog").as("expected"),
        col(fkCol).cast("string").as("got"),
        lit(s"ref($fkCol -> $pkCol)").as("contract_repr"),
        concat(lit(s"check on `$thing` failed: Expected `$fkCol` " +
          s"present in catalog, but got dangling "),
          col(fkCol).cast("string")).as("message"))
  }

  /** streaming decontamination: flag arriving docs that share any word
    * n-gram with a STATIC eval corpus. Eval corpora are tiny, so the
    * deduped eval gram set is collected once at stream construction
    * and BROADCAST; each arriving doc computes its shingles with the
    * compiled [[graft.functions.NgramShingles]] expression and probes
    * the broadcast set in a typed filter. Stateless (no streaming
    * state, no watermark needed), stream side never shuffles,
    * append-mode safe — the streaming sibling of
    * [[graft.pipeline.Decontaminate.overlap]]. The per-row
    * deserialization at the typed filter is bounded by micro-batch
    * volume; a stream never amortizes a gram-keyed join the way the
    * batch path does, so set-probe is the right shape here. */
  def contaminated(stream: DataFrame, evalDf: DataFrame,
                   textCol: String, evalIdCol: String,
                   evalTextCol: String, n: Int = 8): DataFrame = {
    val evalGrams = graft.pipeline.Dedup
      .withNgrams(evalDf, evalIdCol, evalTextCol, n)
      .select(explode(col("grams")).as("g")).distinct()
      .collect().map(_.getString(0)).toSet
    val bc = stream.sparkSession.sparkContext.broadcast(evalGrams)
    val withG = stream.withColumn("_grams",
      graft.functions.NgramShingles.ngrams(col(textCol), n))
    val gIdx = withG.schema.fieldIndex("_grams")
    withG.filter { (r: org.apache.spark.sql.Row) =>
        // null text ⇒ null grams (NgramShingles is null-propagating);
        // treat as not-contaminated like the batch path, where explode
        // drops the null — an NPE here would kill the whole query
        val g = r.getSeq[String](gIdx)
        g != null && g.exists(bc.value.contains)
      }
      .drop("_grams")
  }

  /** streaming distribution-drift: tumbling-window KLL sketches of a
    * numeric column, each compared against a BASELINE sketch (serialized
    * bytes — e.g. from a batch [[graft.engine.Drift.sketch]] persisted
    * with a run manifest) using the same KS/PSI definitions as the batch
    * path. The per-row work is the codegen'd cast/filter plus an O(1)
    * sketch update riding Spark's streaming aggregation state; the
    * comparison runs once per CLOSED WINDOW (append mode), so the scalar
    * UDF here executes once per window row, never in the per-row hot
    * path. Emits (window_start, window_end, n, ks, psi, pass). */
  def windowedDrift(stream: DataFrame, valueCol: String, tsCol: String,
                    window: String, watermark: String,
                    baseline: Array[Byte], ksThreshold: Double = 0.1,
                    psiThreshold: Double = 0.2,
                    backend: String = "kll"): DataFrame = {
    require(baseline != null && baseline.nonEmpty,
      "windowedDrift requires a non-empty serialized baseline sketch")
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.tdigest.TDigestDouble
    // the baseline bytes must come from the SAME backend (Drift.sketch
    // for "kll", Drift.sketchTd for "tdigest")
    val (sketchAgg, cmp) = backend match {
      case "kll" =>
        (udaf(new graft.engine.Drift.KllAgg()),
          udf((bytes: Array[Byte]) => {
            val r = graft.engine.Drift.compare(
              KllDoublesSketch.heapify(Memory.wrap(baseline)),
              KllDoublesSketch.heapify(Memory.wrap(bytes)))
            (r.ks, r.psi)
          }))
      case "tdigest" =>
        (udaf(new graft.engine.Drift.TdAgg()),
          udf((bytes: Array[Byte]) => {
            val r = graft.engine.Drift.compareTd(
              TDigestDouble.heapify(Memory.wrap(baseline)),
              TDigestDouble.heapify(Memory.wrap(bytes)))
            (r.ks, r.psi)
          }))
      case other => throw new IllegalArgumentException(
        s"unknown drift backend '$other' (kll | tdigest)")
    }
    // watermark AFTER the cast projection (watermark column identity
    // must survive into the aggregation)
    stream.select(col(tsCol), col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(sketchAgg(col("_v")).as("_sketch"),
        count(lit(1)).as("n"))
      .withColumn("_d", cmp(col("_sketch")))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"),
        col("_d._1").as("ks"), col("_d._2").as("psi"),
        (col("_d._1") <= ksThreshold && col("_d._2") <= psiThreshold)
          .as("pass"))
  }

  /** one (value, n, exact) entry of a per-window top-k list. */
  final case class TopValue(value: String, n: Long, exact: Boolean)

  /** Per-window heavy hitters: [[graft.engine.Stats.topValues]] as a
    * streaming monitoring signal — one mergeable Misra-Gries sketch per
    * event-time window (bounded state per window regardless of value
    * cardinality, merged through the state store like any partial
    * aggregate), finished to the top-k (value, estimate, exact) list by
    * the SAME [[graft.engine.Stats.topEntries]] the batch path uses, so
    * tie-break and exactness rules cannot diverge. Null values are
    * filtered BEFORE the shuffle (a null is a null-rate fact, not a
    * value — and an all-null window must emit nothing, like the batch
    * path, not a phantom empty row). */
  def windowedTopValues(stream: DataFrame, valueCol: String,
                        tsCol: String, window: String, watermark: String,
                        k: Int = 3, maxMapSize: Int = 1024): DataFrame = {
    val agg = udaf(new graft.engine.Stats.FreqAgg(maxMapSize))
    val top = udf((bytes: Array[Byte]) =>
      graft.engine.Stats.topEntries(bytes, k)
        .map { case (v, est, _, _, exact) => TopValue(v, est, exact) })
    stream.select(col(tsCol), col(valueCol).cast("string").as("_v"))
      .where(col("_v").isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(agg(col("_v")).as("_sk"))
      .select(col("window"), top(col("_sk")).as("top"))
  }

  /** Per-window PII exposure monitor: the batch [[graft.pipeline.Pii]]
    * patterns counted per event-time window — an ingest gate ("this
    * hour's crawl suddenly carries emails") rather than a per-doc
    * scrub. Stateless per-row regex counts (codegen'd, linear-time
    * RE2-portable patterns) feeding one watermarked tumbling-window
    * aggregation; state is O(windows), never O(docs). */
  def windowedPiiStats(stream: DataFrame, textCol: String,
                       tsCol: String, window: String,
                       watermark: String): DataFrame = {
    val (counts, _) = graft.pipeline.Pii.countColumns(col(textCol))
    val counted = stream
      .select(col(tsCol) +: counts: _*)
      .select(col(tsCol), graft.pipeline.Pii.totalCol.as("n_pii"))
      .withColumn("is_dirty", col("n_pii") > 0)
    counted
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_pii").cast("long")).as("n_pii"),
        sum(when(col("is_dirty"), 1L).otherwise(0L)).as("n_dirty"))
      .withColumn("dirty_frac",
        round(col("n_dirty").cast("double") /
          greatest(col("n_docs"), lit(1L)), 4))
  }

  /** Per-key event sessionization: gap-based `session_window` (a
    * session closes after `gap` of silence), emitting count and exact
    * span per (key, session). Ingest-side use: a crawler host whose
    * fetch session suddenly spans hours, or a doc_id re-emitted across
    * sessions, is a data-quality signal tumbling windows blur. State
    * is one open session per active key, closed and evicted by the
    * watermark — bounded by ACTIVE keys, never by history. */
  def sessionized(stream: DataFrame, keyCol: String, tsCol: String,
                  gap: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
      .select(col(keyCol), col("session_window"), col("n_events"),
        col("first_ts"), col("last_ts"))

  /** streaming per-window pass/fail summary for event-timestamped
    * documents: watermarked tumbling-window aggregation. */
  def windowedSummary(stream: DataFrame, contract: ObjectC,
                      tsCol: String, window: String,
                      watermark: String): DataFrame = {
    val fail = Validate.fastFirstViolation(stream, contract).isNotNull
    stream.withColumn("_fail", fail)
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("_fail"), 1L).otherwise(0L)).as("n_failed"))
      .withColumn("pass", col("n_failed") === 0L)
  }
}
