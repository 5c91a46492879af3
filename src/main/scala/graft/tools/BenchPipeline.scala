package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend probe for the training-pipeline operators added in the
  * round-3 continuation (PII scrub, sequence packing, substring-dup
  * coverage, vocab induction, TF-IDF): the same job at N and 10N
  * synthetic docs, reporting docs/sec at both — linear per-doc cost
  * (or better, as fixed job overhead amortizes) is the evidence that
  * no operator hides a super-linear term.
  *
  * Deterministic corpus: ~80 words/doc from a 30-word vocab via
  * xxhash64 arithmetic; every 10th doc appends a fixed 16-word
  * boilerplate sentence so substring-dup coverage has real duplicated
  * spans to find (10% incidence, like crawl boilerplate).
  *
  * Usage: runMain graft.tools.BenchPipeline [N] (default 250000)
  */
object BenchPipeline {

  private def gen(spark: SparkSession, n: Long): DataFrame = {
    val vocab = Seq("the", "data", "spark", "table", "row", "scan",
      "join", "merge", "sort", "hash", "key", "filter", "group",
      "query", "batch", "stream", "window", "agg", "value", "line",
      "order", "part", "fast", "slow", "big", "small", "column",
      "vector", "customer", "supplier")
    val vocabArr = array(vocab.map(lit): _*)
    val boiler = " click here to subscribe to our newsletter and " +
      "follow us on social media for more updates every day"
    spark.range(n).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(79)),
          i => element_at(vocabArr,
            (pmod(xxhash64(col("id") * 97 + i), lit(30)) + 1)
              .cast("int")))),
        when(pmod(col("id"), lit(10)) === 0, lit(boiler))
          .otherwise(lit(""))).as("text"))
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 250000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("bench-pipeline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (docs <- Seq(n, n * 10)) {
      val df = gen(spark, docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize outside the timings
      val ops = Seq[(String, () => Long)](
        "pii_scrub" -> (() => graft.pipeline.Pii.scrub(
          df.withColumn("text",
            concat(col("text"), lit(" mail u"),
              col("doc_id").cast("string"), lit("@x.io"))),
          "doc_id", "text")
          .where(col("is_dirty")).count()),
        "pack_sequences" -> (() => graft.pipeline.Packing
          .packSequences(df, "doc_id", "text", 2048, 256).count()),
        "span_coverage" -> (() => graft.pipeline.Dedup
          .duplicateSpanCoverage(df, "doc_id", "text", 8,
            hashGrams = true)
          .where(col("covered_tokens") > 0).count()),
        "vocab_build" -> (() => graft.pipeline.TextAnalysis
          .buildVocab(df, "text", minCount = 2).count()),
        "tfidf_topk" -> (() => graft.pipeline.TextAnalysis
          .tfidfTopK(df, "doc_id", "text", 3, docs).count()))
      ops.foreach { case (name, f) =>
        val (warm, _) = time(f())   // plan+shuffle warm-up
        val (sec, rows) = time(f())
        println(f"PIPE $name docs=$docs sec=$sec%.2f " +
          f"warm=$warm%.2f rows=$rows " +
          f"docs_per_sec=${docs / sec}%.0f")
        spark.catalog.clearCache()
        df.persist(org.apache.spark.storage.StorageLevel
          .MEMORY_AND_DISK)
        df.count()
      }
      df.unpersist()
    }
    spark.stop()
  }
}
