package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generator for the `input_hint` span-document
  * table (BASELINE.json: `doc_id STRING, spans ARRAY<STRUCT<kind, text,
  * media_ref, offset>>`) and its media catalog — FIXTURES.md §1-2.
  *
  * Fully distributed and seed-stable: every field is a pure function of
  * (seed, row id, span index) via xxhash64, evaluated inside Spark SQL
  * expressions — `spark.range(n)` parallelizes, no driver-side loops, no
  * RNG state, so the same (seed, nDocs) yields identical bytes at any
  * parallelism or partition count (the property the resume and scaling
  * benches rely on).
  *
  * Defect planting (each independently togglable, hash-selected rows ⇒
  * stable goldens): null_kind, bad_kind, text_on_media, dangling_ref,
  * dup_doc_id (the skew hot key), neg_offset.
  */
object SpanGen {

  case class Defects(nullKind: Boolean = false, badKind: Boolean = false,
                     textOnMedia: Boolean = false, danglingRef: Boolean = false,
                     dupDocId: Boolean = false, negOffset: Boolean = false,
                     /** shape-valid but regex-invalid ref ("xmedia-1x") */
                     badRef: Boolean = false,
                     /** ~1/rate rows get each planted defect */
                     rate: Int = 1000,
                     /** rows duplicated onto the hot key (skew knob) */
                     hotKeyEvery: Int = 0)

  private val vocab = Seq("data", "span", "media", "check", "table", "row",
    "scan", "batch", "text", "audio", "video", "image", "doc", "offset",
    "kind", "ref")

  private def h(seed: Long, cols: Column*): Column =
    xxhash64((lit(seed) +: cols): _*)

  /** the span-document table. `drifted` switches the text-length regime
    * (for the distribution-drift checks). */
  def docs(spark: SparkSession, nDocs: Long, nPartitions: Int = 32,
           seed: Long = 42, nMedia: Long = 10000,
           defects: Defects = Defects(), drifted: Boolean = false,
           /** adds a `row_id` column (the generator index) — a unique
             * per-row key even when dup_doc_id planting collides
             * doc_ids (used by oracle staging) */
           withRowId: Boolean = false)
      : DataFrame = {
    val base = spark.range(0, nDocs, 1, nPartitions)
    val id = col("id")

    def planted(which: Int): Column =
      pmod(h(seed + 100 + which, id), lit(defects.rate)) === 0

    val docId =
      if (defects.dupDocId && defects.hotKeyEvery > 0)
        when(pmod(id, lit(defects.hotKeyEvery.toLong)) === 0, lit("doc-hot"))
          .otherwise(format_string("doc-%012d", id))
      else if (defects.dupDocId)
        // pair-duplicates: every planted row collides with its neighbor
        // (integer arithmetic: Column./ would widen to double)
        when(planted(5), format_string("doc-%012d", id - pmod(id, lit(2L))))
          .otherwise(format_string("doc-%012d", id))
      else format_string("doc-%012d", id)

    val nSpans = (pmod(h(seed, id), lit(16L)) + 1).cast("int")
    val maxLen = if (drifted) 60L else 30L

    val spans = transform(sequence(lit(0), nSpans - 1), i => {
      val isText = i % 2 === 0
      val mediaKind = element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(h(seed + 1, id, i), lit(3L)) + 1).cast("int"))
      val kindClean = when(isText, lit("text")).otherwise(mediaKind)
      val kind0 =
        if (defects.nullKind)
          when(planted(1) && i === 0, lit(null: String)).otherwise(kindClean)
        else kindClean
      val kind =
        if (defects.badKind)
          when(planted(2) && i === 1, lit("blob")).otherwise(kind0)
        else kind0
      val nTok = (pmod(h(seed + 2, id, i), lit(maxLen)) + 1).cast("int")
      val textBody = array_join(
        transform(sequence(lit(1), nTok), j =>
          element_at(array(vocab.map(lit): _*),
            (pmod(h(seed + 3, id, i, j), lit(vocab.size.toLong)) + 1)
              .cast("int"))), " ")
      val textClean = when(isText, textBody).otherwise(lit(null: String))
      val text =
        if (defects.textOnMedia)
          when(planted(3) && i === 1 && !isText, lit("stray text"))
            .otherwise(textClean)
        else textClean
      val refClean = when(isText, lit(null: String)).otherwise(
        format_string("media-%d", pmod(h(seed + 4, id, i), lit(nMedia))))
      // dangling refs are shape-valid (`media-N`) but beyond the catalog
      // range, so only the referential check fires — not the shape contract
      val refDangling =
        if (defects.danglingRef)
          when(planted(4) && i === 1 && !isText,
            format_string("media-%d", id + lit(nMedia))).otherwise(refClean)
        else refClean
      // regex-invalid refs embed a valid-looking substring so only an
      // ANCHORED match rejects them (guards the fast-path regex parity)
      val mediaRef =
        if (defects.badRef)
          when(planted(7) && i === 1 && !isText,
            format_string("xmedia-%dx", pmod(h(seed + 4, id, i), lit(nMedia))))
            .otherwise(refDangling)
        else refDangling
      val offClean = (i * 100 + pmod(h(seed + 5, id, i), lit(100L)))
        .cast("int")
      val offset =
        if (defects.negOffset)
          when(planted(6) && i === 0, lit(-1)).otherwise(offClean)
        else offClean
      struct(kind.as("kind"), text.as("text"), mediaRef.as("media_ref"),
        offset.as("offset"))
    })

    if (withRowId)
      base.select(docId.as("doc_id"), spans.as("spans"), id.as("row_id"))
    else base.select(docId.as("doc_id"), spans.as("spans"))
  }

  /** media catalog — FIXTURES.md §2: media_id PK, mime enum, bytes > 0 */
  def media(spark: SparkSession, nMedia: Long = 10000, seed: Long = 42,
            nPartitions: Int = 4): DataFrame = {
    val id = col("id")
    spark.range(0, nMedia, 1, nPartitions).select(
      format_string("media-%d", id).as("media_id"),
      element_at(array(lit("image/png"), lit("image/jpeg"), lit("audio/wav"),
        lit("video/mp4")), (pmod(h(seed + 6, id), lit(4L)) + 1).cast("int"))
        .as("mime"),
      (pmod(h(seed + 7, id), lit(1000000L)) + 1).as("bytes"))
  }
}
