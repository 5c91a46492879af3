package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

/** Decontamination overlap/clean and the quality-filter funnel. */
class DecontamFilterSpec extends SparkTestBase {

  import spark.implicits._

  test("decontaminate: exact copy flagged, disjoint doc not, clean drops") {
    val train = Seq(
      (1L, "a b c d e f g h i j"),   // exact copy of eval 100
      (2L, "k l m n o p q r s t"),   // disjoint
      (3L, "z a b c d e f g h i j")  // contains eval 100 as suffix
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "a b c d e f g h i j"))
      .toDF("eval_id", "eval_text")
    val flagged = Decontaminate.overlap(train, ev, "doc_id", "text",
      "eval_id", "eval_text", n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 3L))
    // doc 1: 10 tokens -> 3 distinct 8-grams, all shared
    assert(flagged(1L) == 3L)
    val kept = Decontaminate.clean(train, ev, "doc_id", "text",
      "eval_id", "eval_text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("decontaminate: minShared raises the bar") {
    val train = Seq((1L, "a b c d e f g h z z")).toDF("doc_id", "text")
    val ev = Seq((9L, "a b c d e f g h")).toDF("eval_id", "eval_text")
    // exactly one shared 8-gram
    assert(Decontaminate.overlap(train, ev, "doc_id", "text",
      "eval_id", "eval_text", n = 8, minShared = 1).count() == 1)
    assert(Decontaminate.overlap(train, ev, "doc_id", "text",
      "eval_id", "eval_text", n = 8, minShared = 2).count() == 0)
  }

  test("decontaminate: bloom prefilter ≡ exact overlap, even at an " +
      "absurd fpp (verification join removes false positives)") {
    // synthetic corpus over a 26-token vocab so grams collide: some
    // train docs copy eval text, most don't
    val words = ('a' to 'z').map(_.toString)
    def text(seed: Int, len: Int): String =
      (0 until len).map(i => words(math.abs(seed * 31 + i * 7) % 26))
        .mkString(" ")
    val train = (1 to 40).map(i => (i.toLong, text(i, 12)))
      .toDF("doc_id", "text")
    val ev = Seq((101L, text(5, 12)), (102L, text(9, 12)),
      (103L, text(999, 12))).toDF("eval_id", "eval_text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val exact = norm(Decontaminate.overlap(train, ev, "doc_id", "text",
      "eval_id", "eval_text", n = 8))
    assert(exact.map(_._1).contains(5L)) // the planted copy is flagged
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = norm(Decontaminate.overlapBloom(train, ev, "doc_id",
        "text", "eval_id", "eval_text", n = 8, fpp = fpp))
      assert(bloom == exact, s"fpp=$fpp diverged")
    }
  }

  test("decontaminate: bloom probe is native Catalyst — no Scala UDF " +
      "in the plan, might_contain + bloom_filter_agg present") {
    val train = Seq((1L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val ev = Seq((100L, "a b c d e f g h i j"))
      .toDF("eval_id", "eval_text")
    val df = Decontaminate.overlapBloom(train, ev, "doc_id", "text",
      "eval_id", "eval_text", n = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"native probe missing from plan:\n$plan")
    assert(!plan.contains("UDF"), s"UDF found in plan:\n$plan")
    // the filter itself is built by the native aggregate, planned as a
    // scalar subquery feeding the probe
    val analyzed = df.queryExecution.optimizedPlan.toString
    assert(analyzed.contains("bloom_filter_agg"),
      s"native bloom_filter_agg missing:\n$analyzed")
  }

  test("gram cache: withGramCache releases every projection persisted " +
      "during the pass; release() clears strays") {
    import graft.pipeline.GramCache
    val base = GramCache.activeCount
    val train = (1 to 30).map(i => (i.toLong,
      s"tok${i % 7} a b c d e f tok${i % 5} g h i j")).toDF("doc_id", "text")
    val ev = Seq((100L, "a b c d e f g h i j")).toDF("eval_id", "eval_text")
    GramCache.withGramCache {
      // four tracked persist sites in one pass (minhash persists its
      // gram projection AND, since round 6, its row-local signature
      // frame — the band self-join consumes the latter as both sides)
      Dedup.minhashLshPairs(train, "doc_id", "text", n = 3).count()
      Dedup.duplicateSpanCoverage(train, "doc_id", "text", k = 4).count()
      Decontaminate.overlapBloom(train, ev, "doc_id", "text",
        "eval_id", "eval_text", n = 8).count()
      assert(GramCache.activeCount == base + 4)
    }
    assert(GramCache.activeCount == base)
    // stray (unbracketed) pass → release() reclaims it
    Dedup.ngramJaccardPairs(train, "doc_id", "text", n = 3).count()
    assert(GramCache.activeCount == base + 1)
    GramCache.release()
    assert(GramCache.activeCount == 0)
  }

  test("filter funnel: marginals, first-fail partition, kept row") {
    val df = Seq(
      (1L, 10),  // fails r0 only
      (2L, 10),  // fails r0 only
      (3L, 95),  // fails r1 (and passes r0)
      (4L, 50),  // passes all
      (5L, 5)    // fails r0 AND r1 -> first-fail attributes to r0
    ).toDF("id", "v")
    val rules = Seq(
      "v_min" -> (col("v") >= 20),
      "v_not_mid" -> !(col("v") === 95 || col("v") === 5))
    val rep = QualityFilter.report(df, rules).collect()
    val byRule = rep.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(byRule("v_min") == ((3L, 3L)))        // 1,2,5 fail
    assert(byRule("v_not_mid") == ((2L, 1L)))    // 3,5 fail; first=3 only
    assert(byRule("__kept__") == ((1L, 1L)))     // only 4 survives
    // first-fail counts + kept partition the input
    assert(rep.map(_.getLong(3)).sum == df.count())
    val kept = QualityFilter(df, rules).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(4L))
  }

  test("filter funnel: NULL-valued predicate is a fail in both views") {
    val df = Seq((1L, Some(10)), (2L, None), (3L, Some(50)))
      .toDF("id", "v")
    val rules = Seq("v_min" -> (col("v") >= 20)) // NULL for id=2
    val kept = QualityFilter(df, rules).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    val rep = QualityFilter.report(df, rules).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // id=1 fails outright, id=2's NULL counts as fail — apply ≡ report
    assert(rep("v_min") == 2L)
    assert(rep("__kept__") == 1L)
  }

  test("filter funnel: empty rule list = identity + bare kept row") {
    val df = Seq((1L, 10), (2L, 30)).toDF("id", "v")
    assert(QualityFilter(df, Seq.empty).count() == 2)
    val rep = QualityFilter.report(df, Seq.empty).collect()
    assert(rep.length == 1)
    assert(rep(0).getString(1) == "__kept__")
    assert(rep(0).getLong(2) == 2L)
  }

  test("filter funnel: single scan (one aggregate in the plan)") {
    val df = Seq((1L, 10), (2L, 30)).toDF("id", "v")
    val rep = QualityFilter.report(df,
      Seq("a" -> (col("v") > 0), "b" -> (col("v") < 20),
        "c" -> (col("v") =!= 10)))
    val plan = rep.queryExecution.optimizedPlan.toString
    // the funnel must not expand into one aggregate per rule
    val nAggs = "Aggregate".r.findAllIn(plan).size
    assert(nAggs == 1, s"expected 1 Aggregate, got $nAggs in:\n$plan")
  }
}
