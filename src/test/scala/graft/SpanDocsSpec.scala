package graft

import graft.contracts._
import graft.engine._
import graft.gen.SpanGen
import org.apache.spark.sql.functions._

/** End-to-end span-table goldens (FIXTURES.md §1): deterministic
  * generator, planted defects → exact violation paths, span-sequence
  * equality invariant, generator partition-invariance. */
class SpanDocsSpec extends SparkTestBase {

  test("generator is deterministic and partition-invariant") {
    val a = SpanGen.docs(spark, 200, 4).orderBy("doc_id")
      .withColumn("j", to_json(col("spans"))).drop("spans").collect()
    val b = SpanGen.docs(spark, 200, 16).orderBy("doc_id")
      .withColumn("j", to_json(col("spans"))).drop("spans").collect()
    assert(a.sameElements(b))
  }

  test("clean generated docs pass the span contract") {
    val docs = SpanGen.docs(spark, 500, 4)
    val v = Validate.violations(docs, SpanDocs.contract, "doc_id", "docs")
    assert(v.count() == 0)
  }

  test("null_kind defect → required-field violation at .spans[0].kind") {
    val docs = SpanGen.docs(spark, 2000, 4,
      defects = SpanGen.Defects(nullKind = true, rate = 100))
    val v = Validate.violations(docs, SpanDocs.contract, "doc_id", "docs")
    val rows = v.collect()
    assert(rows.nonEmpty)
    // null kind breaks both or-branches → violation surfaces at the
    // span element (or aggregates branch failures, impl :455-471)
    assert(rows.forall(_.getAs[String]("path") == ".spans[0]"))
  }

  test("bad_kind defect → or-failure at .spans[1]") {
    val docs = SpanGen.docs(spark, 2000, 4,
      defects = SpanGen.Defects(badKind = true, rate = 100))
    val v = Validate.violations(docs, SpanDocs.contract, "doc_id", "docs")
      .collect()
    assert(v.nonEmpty)
    assert(v.forall(_.getAs[String]("path") == ".spans[1]"))
  }

  test("neg_offset defect → or-failure at .spans[0] (offset pred)") {
    val docs = SpanGen.docs(spark, 2000, 4,
      defects = SpanGen.Defects(negOffset = true, rate = 100))
    val v = Validate.violations(docs, SpanDocs.contract, "doc_id", "docs")
      .collect()
    assert(v.nonEmpty)
    assert(v.forall(_.getAs[String]("path") == ".spans[0]"))
  }

  test("dangling_ref defect → referential violations, others clean") {
    val docs = SpanGen.docs(spark, 2000, 4,
      defects = SpanGen.Defects(danglingRef = true, rate = 100))
    val media = SpanGen.media(spark, 10000)
    val all = SpanDocs.validateAll(docs, media)
    val refViols = all.where(col("contract_repr").startsWith("ref(")).collect()
    assert(refViols.nonEmpty)
    assert(refViols.forall(_.getAs[String]("got").startsWith("media-")))
    // contract pass itself stays clean: dangling refs still match the
    // media-ref shape
    assert(all.where(col("contract_repr").startsWith("object(")).count() == 0)
  }

  test("dup_doc_id defect → uniqueness violations with multiplicity") {
    val docs = SpanGen.docs(spark, 1000, 4,
      defects = SpanGen.Defects(dupDocId = true, hotKeyEvery = 100))
    val dups = Uniqueness.duplicates(docs, "doc_id")
    val rows = dups.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("doc_id") == "doc-hot")
    assert(rows(0).getAs[Long]("n_dups") == 10)
    // salted two-phase agrees with single-phase
    val salted = Uniqueness.duplicates(docs, "doc_id", saltBuckets = 8)
      .collect()
    assert(salted.length == 1 && salted(0).getAs[Long]("n_dups") == 10)
  }

  test("uniqueness: duplicated NULL keys appear in violation output") {
    // equi-joins drop NULL keys; the violation join must be null-safe
    val df = fix("stack(4, cast(null as string), 'a', " +
      "cast(null as string), 'b', 'k1', 'c', 'k1', 'd') as (k, v)")
    val dups = Uniqueness.duplicates(df, "k").collect()
    assert(dups.length == 2) // NULL x2 and k1 x2
    val viols = Uniqueness.violations(df, "k").collect()
    assert(viols.length == 4, s"want all 4 duplicated rows, got $viols")
    assert(viols.count(_.isNullAt(0)) == 2)
    // the message must render for NULL keys too (concat null-propagates
    // without the coalesce; util.inspect renders null as 'null')
    assert(viols.forall(!_.isNullAt(5)))
    assert(viols.filter(_.isNullAt(0)).forall(
      _.getString(5).endsWith("got duplicate null")))
  }

  test("uniqueness violations: planted hot key is skew-proof — " +
       "count-join shape (no Window), fact side broadcast-joined") {
    // the north_rule's named skew case: one crawler-grade doc_id
    // repeated across half the corpus. The window-count shape would
    // shuffle all n rows and serialize the hot key into ONE partition;
    // the count-join shape reduces to the dup-key set first (map-side
    // partials) and broadcast-joins it back — no fact shuffle at all.
    val n = 200000L
    val df = spark.range(0, n, 1, 8).select(
      when(col("id") % 2 === 0, lit("doc-hot"))
        .otherwise(concat(lit("u-"), col("id"))).as("doc_id"))
    val viols = Uniqueness.violations(df, "doc_id")
    assert(viols.count() == n / 2)
    val plan = viols.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot key back in a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("AdaptiveSparkPlan"),
      s"expected dup-set broadcast (or AQE to pick it):\n$plan")
  }

  test("span-sequence equality invariant: validation mutates nothing") {
    val docs = SpanGen.docs(spark, 300, 4,
      defects = SpanGen.Defects(badKind = true, rate = 50)).cache()
    val before = SpanDocs.spanChecksum(docs).orderBy("doc_id").collect()
    // run the full validation pass, then re-checksum the same frame
    SpanDocs.validateAll(docs, SpanGen.media(spark, 1000)).count()
    val after = SpanDocs.spanChecksum(docs).orderBy("doc_id").collect()
    assert(before.sameElements(after))
    docs.unpersist()
  }

  test("monotone-offset pred fires (silentAnd: no frame)") {
    // hand-built non-monotone spans
    val df = fix(
      """'doc-000000000001' as doc_id,
        |array(named_struct('kind','text','text','a',
        |  'media_ref',cast(null as string),'offset',5),
        |named_struct('kind','image','text',cast(null as string),
        |  'media_ref','media-1','offset',3)) as spans""".stripMargin)
    val v = firstViol(df, SpanDocs.contract)
    assert(v.isDefined)
    assert(v.get.getAs[String]("path") == ".spans")
    assert(v.get.getAs[String]("expected") == "strictly increasing offsets")
  }

  test("SpanCheck fast path ≡ generic compile on defect-planted data") {
    val docs = SpanGen.docs(spark, 4000, 8,
      defects = SpanGen.Defects(nullKind = true, badKind = true,
        textOnMedia = true, negOffset = true, badRef = true, rate = 50))
    val generic = Validate
      .violations(docs, SpanDocs.contract, "doc_id", "docs")
      .orderBy("doc_id").collect()
    val fast = SpanDocs.violationsFast(docs)
      .orderBy("doc_id").collect()
    assert(generic.length == fast.length && generic.length > 0)
    generic.zip(fast).foreach { case (g, f) =>
      assert(g == f, s"fast-path divergence:\n  generic=$g\n  fast=$f") }
    // non-monotone offsets too (hand-built)
    val nm = fix(
      """'doc-000000000001' as doc_id,
        |array(named_struct('kind','text','text','a',
        |  'media_ref',cast(null as string),'offset',5),
        |named_struct('kind','image','text',cast(null as string),
        |  'media_ref','media-1','offset',3)) as spans""".stripMargin)
    val gv = nm.select(Validate.firstViolation(nm, SpanDocs.contract)
      .as("v")).collect()(0)
    val fv = nm.select(SpanDocs.fastFirstViolation(nm).as("v"))
      .collect()(0)
    assert(gv == fv)
  }

  test("bad_ref defect (xmedia-1x) → shape violation in BOTH paths") {
    // regex-invalid refs contain a valid-looking substring: an unanchored
    // find() would wrongly accept them — guard both compile paths
    val docs = SpanGen.docs(spark, 3000, 4,
      defects = SpanGen.Defects(badRef = true, rate = 50))
    val generic = Validate
      .violations(docs, SpanDocs.contract, "doc_id", "docs")
      .orderBy("doc_id").collect()
    val fast = SpanDocs.violationsFast(docs).orderBy("doc_id").collect()
    assert(generic.nonEmpty, "planted bad refs must violate generically")
    assert(generic.length == fast.length)
    generic.zip(fast).foreach { case (g, f) => assert(g == f) }
    assert(generic.forall(_.getAs[String]("path") == ".spans[1]"))
  }

  test("per-partition summary counts checked and failed") {
    val docs = SpanGen.docs(spark, 1000, 4,
      defects = SpanGen.Defects(badKind = true, rate = 100))
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(8)))
    val sum = Validate.summaryByColumn(docs, SpanDocs.contract, "bucket")
    val rows = sum.collect()
    assert(rows.map(_.getAs[Long]("n_checked")).sum == 1000)
    val failed = rows.map(_.getAs[Long]("n_failed")).sum
    val direct = Validate.violations(docs, SpanDocs.contract, "doc_id",
      "docs").count()
    assert(failed == direct && failed > 0)
  }
}
