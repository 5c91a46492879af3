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
