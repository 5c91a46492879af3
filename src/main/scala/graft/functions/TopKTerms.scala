package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** One scored term with its counts — the full row the TF-IDF top-k
  * must carry through ranking. */
case class ScoredTerm(tfidf: Double, term: String, tf: Long, df: Long)

/** Bounded top-k terms by (tfidf desc, term asc) — the
  * shuffle-shrinking replacement for the rank window in
  * [[graft.pipeline.TextAnalysis.tfidfTopK]]. Same partial-aggregation
  * argument as [[TopKNeighbors]]: the window re-shuffles EVERY scored
  * (doc, term) row — the corpus's whole postings list, ~10-100× k per
  * doc — to rank it; this aggregate's exchange carries ≤ k rows per
  * (doc, map task).
  *
  * Order replicated exactly from
  * `orderBy(col("tfidf").desc, col("term"))`: scores via
  * `java.lang.Double.compare` with signed zero normalized inside the
  * comparison (NaN/null cannot occur — tfidf is round(tf·ln(N/df))
  * over positive counts — but the comparator follows the
  * [[TopKNeighbors]] rules anyway), term ties ascending in Spark's
  * UTF8 binary collation ([[Utf8Order]]). */
class TopKTerms(k: Int) extends BoundedTopK[ScoredTerm](k) {

  override protected def cmp(a: ScoredTerm, b: ScoredTerm): Int = {
    val c = java.lang.Double.compare(b.tfidf + 0.0, a.tfidf + 0.0)
    if (c != 0) c else Utf8Order.cmpStrings(a.term, b.term)
  }

  override def bufferEncoder: Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
      Seq[ScoredTerm]]()
  override def outputEncoder: Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
      Seq[ScoredTerm]]()
}

object TopKTerms {
  /** `topk(k)(tfidf, term, tf, df)` →
    * `array<struct<tfidf, term, tf, df>>` in rank order. */
  def topk(k: Int)(tfidf: Column, term: Column, tf: Column,
                   df: Column): Column =
    udaf(new TopKTerms(k)).apply(tfidf, term, tf, df)
}
