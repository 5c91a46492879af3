package graft

import graft.contracts._
import graft.engine.{SpanDocs, Validate}
import graft.functions.ContractCheck
import graft.gen.SpanGen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fast-vs-generic equivalence for the codegen'd verdict compiler
  * (graft.functions.{VerdictCompiler, ContractCheck}): for EVERY
  * contract/schema pair the compiled verdict must agree with the
  * generic compiler's pass/fail, and failing rows must produce
  * BIT-IDENTICAL violation payloads (the fast path delegates to the
  * unchanged generic expression). */
class ContractCheckSpec extends SparkTestBase {

  /** row-by-row equality of the fast and generic first-violation.
    * Codegen is forced (CODEGEN_ONLY) so a fast path that silently
    * fell back to interpretation would fail the test. */
  private def assertEquivalent(df: DataFrame, c: ObjectC,
                               expectSomeViol: Boolean = true): Unit = {
    val generic = df.select(Validate.firstViolation(df, c).as("v"))
      .collect()
    val forced = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val fast =
      try df.select(ContractCheck.rowFirstViolation(df, c).as("v"))
        .collect()
      finally forced match {
        case Some(m) => spark.conf.set("spark.sql.codegen.factoryMode", m)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    assert(generic.length == fast.length)
    generic.zip(fast).foreach { case (g, f) =>
      assert(g == f, s"fast-path divergence:\n  generic=$g\n  fast=$f")
    }
    if (expectSomeViol)
      assert(generic.exists(!_.isNullAt(0)),
        "fixture should produce at least one violation")
  }

  test("codegen verdict ≡ generic on the span table (all defects)") {
    val docs = SpanGen.docs(spark, 4000, 8,
      defects = SpanGen.Defects(nullKind = true, badKind = true,
        textOnMedia = true, negOffset = true, badRef = true, rate = 50))
    assertEquivalent(docs, SpanDocs.contract)
  }

  test("codegen verdict ≡ generic on the documents policy contract") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    assertEquivalent(docs, SparkEntry.documentsContract)
  }

  test("codegen verdict ≡ generic across shape matrix fixtures") {
    // tuples over arrays and structs, hash, strict, optional, falsy,
    // value/oneOf, nothing, schema-mismatched gates
    val c = C.obj(
      "t" -> C.tuple(C.value(1), C.integer),
      "ts" -> C.tuple(C.string, C.number),
      "h" -> C.hash(C.number),
      "o" -> C.obj("y" -> C.optional(C.oneOf("a", "b"))).strict,
      "f" -> C.optional(C.falsy),
      "s" -> C.matches("^x+$"),
      "xs" -> C.array(C.or(C.string, C.value("z"))))
    val fixtures = Seq(
      // all-pass
      """array(1, 5) as t, named_struct('a','s','b',2.0) as ts,
        |map('k', 1.0) as h, named_struct('y','a') as o,
        |0 as f, 'xxx' as s, array('p','q') as xs""".stripMargin,
      // tuple pos fail + optional null
      """array(2, 5) as t, named_struct('a','s','b',2.0) as ts,
        |map('k', 1.0) as h, named_struct('y',cast(null as string)) as o,
        |cast(null as int) as f, 'xxx' as s, array('p') as xs""".stripMargin,
      // tuple short, hash value fail
      """array(1) as t, named_struct('a','s','b',2.0) as ts,
        |map('k', cast(null as double)) as h, named_struct('y','b') as o,
        |0 as f, 'xxx' as s, array('p') as xs""".stripMargin,
      // oneOf fail, matches fail, truthy f fail
      """array(1, 7) as t, named_struct('a','s','b',2.0) as ts,
        |map('k', 1.0) as h, named_struct('y','c') as o,
        |5 as f, 'yyy' as s, array('p') as xs""".stripMargin,
      // null array, null struct
      """cast(null as array<int>) as t,
        |named_struct('a','s','b',2.0) as ts,
        |map('k', 1.0) as h, cast(null as struct<y:string>) as o,
        |0 as f, 'xxx' as s, cast(null as array<string>) as xs"""
        .stripMargin,
      // NULL positions inside a struct-tuple: no required gate — the
      // positional contract decides (string rejects null; the whole
      // struct-tuple field ts fails exactly as the generic compile says)
      """array(1, 5) as t,
        |named_struct('a',cast(null as string),'b',2.0) as ts,
        |map('k', 1.0) as h, named_struct('y','a') as o,
        |0 as f, 'xxx' as s, array('p') as xs""".stripMargin)
    fixtures.foreach { f =>
      assertEquivalent(fix(f), c, expectSomeViol = false)
    }
  }

  test("codegen verdict ≡ generic: null-accepting contracts at struct-" +
       "tuple positions (no required gate)") {
    // any/falsy/optional ACCEPT a null position — the verdict compiler
    // must not impose object-field required semantics on tuples
    val df = fix(
      "named_struct('a', cast(null as int), 'b', 'x') as ts")
    assertEquivalent(df, C.obj("ts" -> C.tuple(C.any, C.string)),
      expectSomeViol = false)
    assertEquivalent(df, C.obj("ts" -> C.tuple(C.falsy, C.string)),
      expectSomeViol = false)
    assertEquivalent(df,
      C.obj("ts" -> C.tuple(C.optional(C.integer), C.string)),
      expectSomeViol = false)
    assertEquivalent(df, C.obj("ts" -> C.tuple(C.integer, C.string)))
  }

  test("codegen verdict ≡ generic on FailAlways paths (schema gaps)") {
    // required field missing from schema; strict extras; shape on a
    // mismatched physical type
    val df = fix("5 as a, 'x' as b")
    assertEquivalent(df, C.obj("a" -> C.number, "zz" -> C.string))
    assertEquivalent(df, C.obj("a" -> C.number).strict)
    assertEquivalent(df, C.obj("a" -> C.array(C.any)))
    assertEquivalent(df, C.obj("b" -> C.hash(C.any), "a" -> C.tuple(C.any)))
  }

  test("codegen verdict ≡ generic: hash value leaf with NO structural " +
       "twin elsewhere (MapVals leaf indexing regression)") {
    // a map whose value contract appears nowhere else in the plan: the
    // leaf must be indexed through the MapVals walk itself — it used to
    // be reachable only when a structurally-equal leaf happened to be
    // registered under another field
    val c = C.obj("h" -> C.hash(C.value(42L)), "x" -> C.string)
    assertEquivalent(fix("map('k', 41L) as h, 'a' as x"), c)
    assertEquivalent(fix("map('k', 42L) as h, 'a' as x"), c,
      expectSomeViol = false)
  }

  test("codegen verdict ≡ generic on a 500-leaf contract (method-split " +
       "codegen — round 2 fell back to the generic compile here)") {
    // 50 fields × and(10 leaves) = 500 leaves: each Obj/AndN past the
    // split threshold is hoisted into its own generated method, so
    // CODEGEN_ONLY (forced inside assertEquivalent) would fail if any
    // method overflowed 64KB or the emit were wrong
    val nf = 50
    val contract = C.obj((0 until nf).map { i =>
      s"f$i" -> (C.and(Seq.fill(9)(C.integer: Contract) :+
        (C.between(0, 1000000): Contract): _*): Contract)
    }: _*)
    val cols = (0 until nf).map(i =>
      s"${if (i == 7) -5 else i * 3} as f$i").mkString(", ")
    val df = fix(cols) // f7 = -5 violates between(0, 1000000)
    assertEquivalent(df, contract)
  }

  test("property: codegen verdict ≡ generic over random contracts") {
    import org.scalacheck.Gen
    val leavesLong: Seq[Contract] = Seq(C.integer, C.number,
      C.value(3L), C.oneOf(1L, 2L, 3L), C.truthy, C.falsy, C.any,
      C.pred("pos")(x => x > 0))
    val leavesStr: Seq[Contract] = Seq(C.string, C.matches("^a"),
      C.value("aa"), C.oneOf("aa", "bb"), C.nonEmptyString, C.any)
    def gLong: Gen[Contract] = Gen.oneOf(leavesLong)
      .flatMap(l => Gen.oneOf(l, C.optional(l), C.and(C.integer, l),
        C.or(l, C.value(-999L))))
    def gStr: Gen[Contract] = Gen.oneOf(leavesStr)
      .flatMap(l => Gen.oneOf(l, C.optional(l), C.or(C.value("zz"), l)))
    val contracts = Gen.listOfN(40, for {
      a <- gLong; b <- gStr; xs <- gLong; y <- gStr
      useStrict <- Gen.oneOf(true, false)
      o0 = C.obj("y" -> y)
    } yield C.obj("a" -> a, "b" -> b, "xs" -> C.array(xs),
      "o" -> (if (useStrict) o0.strict else o0),
      "m" -> C.hash(b))).sample.get
    val rows = Seq(
      "1 as a, 'aa' as b, array(1,2,3) as xs, named_struct('y','aa') as o, map('k','aa') as m",
      "3 as a, 'bb' as b, array(3) as xs, named_struct('y','bb') as o, map('k','bb') as m",
      "0 as a, '' as b, array(-5) as xs, named_struct('y','') as o, map('k','') as m",
      "cast(null as bigint) as a, cast(null as string) as b, array(cast(null as bigint)) as xs, named_struct('y',cast(null as string)) as o, map('k',cast(null as string)) as m",
      "-7 as a, 'zz' as b, cast(null as array<bigint>) as xs, cast(null as struct<y:string>) as o, cast(null as map<string,string>) as m")
    val df = rows.map(fix).reduce(_ unionByName _)
    contracts.foreach(c => assertEquivalent(df, c,
      expectSomeViol = false))
  }

  test("property: codegen verdict ≡ generic over random DEEP-NESTED " +
       "contracts (array-of-struct, map-of-struct, struct-of-struct)") {
    import org.scalacheck.Gen
    // fixed 3-level schema; contracts vary randomly at every level —
    // the class of hole this hunts is exactly the round-3 MapVals
    // leaf-indexing bug (leaves reachable only through nested
    // composite nodes)
    val rows = Seq(
      "1 as a, named_struct('x', 5L, 'ys', array('aa','bb')) as s, " +
        "array(named_struct('k','aa','n',1L)) as arr, " +
        "map('p', named_struct('q', 2L)) as m",
      "0 as a, named_struct('x', cast(null as bigint), 'ys', " +
        "array(cast(null as string))) as s, " +
        "array(named_struct('k','zz','n',-1L), " +
        "named_struct('k',cast(null as string),'n',3L)) as arr, " +
        "map('p', named_struct('q', cast(null as bigint))) as m",
      "cast(null as bigint) as a, " +
        "cast(null as struct<x:bigint, ys:array<string>>) as s, " +
        "cast(null as array<struct<k:string,n:bigint>>) as arr, " +
        "cast(null as map<string,struct<q:bigint>>) as m",
      "7 as a, named_struct('x', 0L, 'ys', array()) as s, " +
        "array() as arr, map() as m")
    val df = rows.map(fix).reduce(_ unionByName _)
    val leafL: Gen[Contract] = Gen.oneOf[Contract](C.integer, C.number,
      C.value(5L), C.truthy, C.any, C.pred("pos")(x => x > 0))
    val leafS: Gen[Contract] = Gen.oneOf[Contract](C.string,
      C.matches("^a"), C.value("aa"), C.oneOf("aa", "bb"), C.any)
    def deco(g: Gen[Contract]): Gen[Contract] = g.flatMap(l =>
      Gen.oneOf(l, C.optional(l), C.or(l, C.value(-42L)),
        C.and(l, C.any)))
    val gS: Gen[Contract] = for {
      x <- deco(leafL); y <- deco(leafS)
      useStrict <- Gen.oneOf(true, false)
      o = C.obj("x" -> x, "ys" -> C.array(y))
    } yield if (useStrict) o.strict else o
    val gArrItem: Gen[Contract] = for {
      k <- deco(leafS); n <- deco(leafL)
      useOr <- Gen.oneOf(true, false)
      o = C.obj("k" -> k, "n" -> n)
    } yield if (useOr) C.or(o, C.value("sentinel")) else o
    val gM: Gen[Contract] = for { q <- deco(leafL) }
      yield C.hash(C.obj("q" -> q))
    val contracts = Gen.listOfN(30, for {
      a <- deco(leafL); s <- gS; item <- gArrItem; m <- gM
      sWrap <- Gen.oneOf[Contract => Contract](
        (c: Contract) => c, (c: Contract) => C.optional(c))
    } yield C.obj("a" -> a, "s" -> sWrap(s),
      "arr" -> C.array(item), "m" -> m)).sample.get
    contracts.foreach(c =>
      assertEquivalent(df, c.asInstanceOf[ObjectC],
        expectSomeViol = false))
  }
}
