package graft

import graft.contracts._

/** Ported contract-semantics suite — each case mirrors a
  * `/root/reference/src/contract.spec.js` assertion (cited per test);
  * goldens are hand-derived from the reference implementation semantics
  * (contract.impl.js) since the reference is not executable here.
  * Fixture = one-row DataFrame; verdict = compiled first-violation. */
class ContractSemanticsSpec extends SparkTestBase {

  // --- toContract promotion (contract.spec.js:12-66; impl :227-263) ---
  test("toContract: scalar promotes to value") {
    assert(C.from(5) == ValueC(5))
    assert(C.from("x") == ValueC("x"))
  }
  test("toContract: contract passes through") {
    assert(C.from(StringC) == StringC)
  }
  test("toContract: 1-element seq promotes to array; 0/2+ rejected") {
    assert(C.from(Seq(StringC)) == ArrayC(StringC))
    intercept[ContractLibraryError](C.from(Seq.empty[Contract]))
    intercept[ContractLibraryError](C.from(Seq(StringC, NumberC)))
  }

  // --- any (contract.spec.js:68-72) ---
  test("any accepts everything including null") {
    assertPass(fix("5 as x"), C.obj("x" -> C.any.optional))
    assertPass(fix("'s' as x"), C.obj("x" -> C.any))
    assertPass(fix("array(1,2) as x"), C.obj("x" -> C.any))
  }

  // --- nothing (contract.spec.js:74-84) ---
  test("nothing rejects everything") {
    assertViol(fix("5 as x"), C.obj("x" -> NothingC), ".x", "nothing", "5")
  }

  // --- value (contract.spec.js:86-93) ---
  test("value: exact match passes, mismatch fails") {
    assertPass(fix("5 as x"), C.obj("x" -> C.value(5)))
    assertViol(fix("6 as x"), C.obj("x" -> C.value(5)), ".x", "value(5)", "6")
    // cross-type mismatch (JS ===)
    assertViol(fix("'5' as x"), C.obj("x" -> C.value(5)), ".x", "value(5)",
      "'5'")
  }

  test("value: NaN and signed-zero equality (reference-probed: " +
       "underscore isEqual treats NaN ≡ NaN and -0 ≡ 0)") {
    // the fuzz corpus cannot carry these — JSON serializes NaN as null
    // — so they are pinned here against live reference probes. Spark's
    // <=> agrees on both: NaN <=> NaN is true, -0.0 normalizes to 0.0.
    val nanC = C.obj("x" -> C.value(Double.NaN))
    assertPass(fix("double('NaN') as x"), nanC)
    assertViol(fix("5.0d as x"), nanC, ".x", "value(NaN)", "5")
    assertPass(fix("0.0d as x"), C.obj("x" -> C.value(-0.0)))
    assertPass(fix("-0.0d as x"), C.obj("x" -> C.value(0.0)))
    // Infinity is un-JSON-able too; reference probe: c.value(Infinity)
    // renders bare, fails 5 with "Expected value(Infinity), but got 5"
    val infC = C.obj("x" -> C.value(Double.PositiveInfinity))
    assert(infC.fields.head._2.render == "c.value(Infinity)")
    assertPass(fix("double('Infinity') as x"), infC)
    assertViol(fix("5.0d as x"), infC, ".x", "value(Infinity)", "5")
    assertPass(fix("double('-Infinity') as x"),
      C.obj("x" -> C.value(Double.NegativeInfinity)))
  }

  test("value/oneOf: temporal literals compare (not auto-fail)") {
    // mirrors contract.spec.js:86-93 with Date/Timestamp literals —
    // `value` accepts any literal (contract.impl.js:323-326)
    val d = C.obj("x" -> C.value(java.sql.Date.valueOf("2026-01-01")))
    assertPass(fix("date'2026-01-01' as x"), d)
    assertViol(fix("date'2026-01-02' as x"), d, ".x",
      "value(2026-01-01)", "2026-01-02")
    val ts = C.obj("x" ->
      C.value(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
    assertPass(fix("timestamp'2026-01-01 10:00:00' as x"), ts)
    assertViol(fix("timestamp'2026-01-01 10:00:01' as x"), ts, ".x",
      "value(2026-01-01 10:00:00.0)", "2026-01-01T10:00:01.000Z")
    val e = C.obj("x" -> C.oneOf(java.sql.Date.valueOf("2026-01-01"),
      java.sql.Date.valueOf("2026-02-01")))
    assertPass(fix("date'2026-02-01' as x"), e)
    assertViol(fix("date'2026-03-01' as x"), e, ".x",
      "oneOf(2026-01-01, 2026-02-01)", "2026-03-01")
  }

  // --- string (contract.spec.js:95-102) ---
  test("string: passes strings, rejects numbers and null") {
    assertPass(fix("'asd' as x"), C.obj("x" -> C.string))
    assertViol(fix("5 as x"), C.obj("x" -> C.string), ".x", "string", "5")
    // null on a required field reports the required-field error
    // (contract.impl.js:653-660)
    assertViol(fix("cast(null as string) as x"), C.obj("x" -> C.string),
      ".x", "Field `x`", "null")
  }

  // --- date (contract.spec.js:104-111) ---
  test("date: timestamps pass, strings fail") {
    assertPass(fix("timestamp'2011-11-11 00:00:00' as x"),
      C.obj("x" -> C.date))
    assertViol(fix("'2011' as x"), C.obj("x" -> C.date), ".x", "Date",
      "'2011'")
  }

  // --- pred (contract.spec.js:127-131) ---
  test("pred: user predicate over the column") {
    val gt3 = C.pred("gt3")(c => c > 3)
    assertPass(fix("5 as x"), C.obj("x" -> gt3))
    assertViol(fix("2 as x"), C.obj("x" -> gt3), ".x", "gt3", "2")
  }
  test("anonymous pred: 'unamed-pred' naming quirks (reference bytes, " +
       "contract.impl.js:284-287)") {
    val p = C.pred(c => c > 5)
    assert(p.render == "c.unamed-pred()") // toString appends parens...
    assert(p.name == "unamed-pred")       // ...the contractName has none
    assertViol(fix("3 as x"), C.obj("x" -> p), ".x", "unamed-pred", "3")
    assertPass(fix("7 as x"), C.obj("x" -> p))
    // null fails the pred when it REACHES it (engine coalesce-null-fails
    // rule; the reference closure sees null and its guard returns
    // false). A null FIELD never reaches the pred — both engines raise
    // `Field required` first — so route the null through an array
    // element.
    assertViol(fix("array(cast(null as int)) as x"),
      C.obj("x" -> C.array(p)), ".x[0]", "unamed-pred", "null")
    val big = p.rename("big") // rename DROPS the parens: c.big
    assert(big.render == "c.big")
    assertViol(fix("3 as x"), C.obj("x" -> big), ".x", "big", "3")
  }

  // --- and (contract.spec.js:133-147; impl :384-410) ---
  test("and: first failing branch wins, .and(i) path frame") {
    val c = C.obj("x" -> C.and(C.string, C.value("asd")))
    assertPass(fix("'asd' as x"), c)
    assertViol(fix("'aaa' as x"), c, ".x.and(1)", "value(asd)", "'aaa'")
    assertViol(fix("5 as x"), c, ".x.and(0)", "string", "5")
  }
  test("silentAnd: no .and(i) frames (contract.impl.js:407-409)") {
    val c = C.obj("x" -> C.silentAnd(C.string, C.value("asd")))
    assertViol(fix("'aaa' as x"), c, ".x", "value(asd)", "'aaa'")
  }

  // --- or (contract.spec.js:149-169; impl :420-482) ---
  test("or: first success short-circuits; total failure aggregates") {
    val c = C.obj("x" -> C.or(C.string, C.value(6)))
    assertPass(fix("'aaa' as x"), c)
    assertPass(fix("6 as x"), c)
    // total or-failure reports the reference's aggregated form
    assertViol(fix("0 as x"), c, ".x", "none of the contracts passed", "0")
  }

  // --- matches (contract.spec.js:171-181) ---
  test("matches: regex test; null fails without coercion (:178-180)") {
    val c = C.obj("x" -> C.optional(C.matches("x+")))
    assertPass(fix("'---xxxxx ' as x"), c)
    assertViol(fix("'--- ' as x"), c, ".x", "matches(/x+/)", "'--- '")
    // optional+null passes; required+null → required error
    assertPass(fix("cast(null as string) as x"), c)
    assertViol(fix("cast(null as string) as x"),
      C.obj("x" -> C.matches("x+")), ".x", "Field `x`", "null")
  }

  // --- oneOf (contract.spec.js via impl :308-321) ---
  test("oneOf: membership") {
    val c = C.obj("x" -> C.oneOf("a", "b"))
    assertPass(fix("'a' as x"), c)
    assertViol(fix("'c' as x"), c, ".x", "oneOf(a, b)", "'c'")
  }

  // --- integer (impl :334-337) ---
  test("integer: floor(v) === v; NaN rejected") {
    val c = C.obj("x" -> C.integer)
    assertPass(fix("5 as x"), c)
    assertPass(fix("double(5.0) as x"), c)
    assertViol(fix("double(5.5) as x"), c, ".x", "integer", "5.5")
    assertViol(fix("double('NaN') as x"), c, ".x", "integer", "NaN")
  }

  // --- falsy / truthy (impl :298-306) ---
  test("falsy/truthy per JS semantics") {
    assertPass(fix("0 as x"), C.obj("x" -> C.optional(C.falsy)))
    assertPass(fix("'' as x"), C.obj("x" -> C.optional(C.falsy)))
    assertViol(fix("1 as x"), C.obj("x" -> C.optional(C.falsy)), ".x",
      "falsy", "1")
    assertPass(fix("1 as x"), C.obj("x" -> C.truthy))
    assertViol(fix("'' as x"), C.obj("x" -> C.truthy), ".x", "truthy", "''")
  }

  // --- array (contract.spec.js:183-211) ---
  test("array: every element checked, [i] path frame, first fail wins") {
    val c = C.obj("x" -> C.array(C.value(5)))
    assertPass(fix("array(5, 5) as x"), c)
    assertViol(fix("array(10, 5) as x"), c, ".x[0]", "value(5)", "10")
    assertViol(fix("array(5, 10) as x"), c, ".x[1]", "value(5)", "10")
  }
  test("array: nested arrays recurse with stacked frames") {
    val c = C.obj("x" -> C.array(C.array(C.number)))
    assertPass(fix("array(array(1,2), array(3)) as x"), c)
    assertViol(fix("array(array(1,2), array(cast(null as int))) as x"), c,
      ".x[1][0]", "number", "null")
  }

  // --- tuple (contract.spec.js:213-248) ---
  test("tuple: size gate, positional checks, extras pass unless strict") {
    val c = C.obj("x" -> C.tuple(C.value(1), C.value(2)))
    assertPass(fix("array(1, 2) as x"), c)
    assertPass(fix("array(1, 2, 99) as x"), c) // extras pass (:559-564)
    assertViol(fix("array(1) as x"), c, ".x", "tuple of size 2", "[ 1 ]")
    assertViol(fix("array(1, 3) as x"), c, ".x[1]", "value(2)", "3")
    val strictC = C.obj("x" -> C.tuple(C.value(1), C.value(2)).strict)
    assertViol(fix("array(1, 2, 99) as x"), strictC, ".x",
      "tuple of exactly size 2", "[ 1, 2, 99 ]")
  }
  test("tuple over struct: heterogeneous positional checks") {
    val c = C.obj("x" -> C.tuple(C.string, C.number))
    assertPass(fix("named_struct('a', 'so', 'b', 5) as x"), c)
    assertViol(fix("named_struct('a', 5, 'b', 5) as x"), c, ".x[0]",
      "string", "5")
  }

  // --- hash (contract.spec.js:250-266) ---
  test("hash: every value checked, .key path frame") {
    val c = C.obj("x" -> C.hash(C.string))
    assertPass(fix("map('a', 'aaa', 'b', 'bbb') as x"), c)
    assertViol(fix("map('x', 'aaa', 'y', cast(null as string)) as x"), c,
      ".x.y", "string", "null")
  }

  // --- object (contract.spec.js:268-421) ---
  test("object: nested field paths") {
    val c = C.obj("o" -> C.obj("x" -> C.obj("y" -> C.number)))
    assertPass(fix("named_struct('x', named_struct('y', 5)) as o"), c)
    assertViol(fix("named_struct('x', named_struct('y', 's')) as o"), c,
      ".o.x.y", "number", "'s'")
  }
  test("object: extra fields allowed by default (contract.spec.js:383-390)") {
    assertPass(fix("named_struct('x', 5, 'z', 9) as o"),
      C.obj("o" -> C.obj("x" -> C.number)))
  }
  test("object: missing non-optional field fails (impl :653-660)") {
    // data-plane path points at the missing field itself (the
    // reference's error is raised at the object level — frames in the
    // MESSAGE reflect that; see MessageParitySpec)
    assertViol(fix("named_struct('z', 9) as o"),
      C.obj("o" -> C.obj("x" -> C.number)), ".o.x", "Field `x`", "missing")
  }

  // --- optional-field matrix (contract.spec.js:322-381; FIXTURES.md §3) ---
  test("optional field: missing/null/match pass; wrong value fails") {
    val c = C.obj("o" -> C.obj("x" -> C.number,
      "y" -> C.optional(C.value(10))))
    assertPass(fix("named_struct('x', 1) as o"), c)           // missing
    assertPass(fix("named_struct('x', 1, 'y', cast(null as int)) as o"), c)
    assertPass(fix("named_struct('x', 1, 'y', 10) as o"), c)
    assertViol(fix("named_struct('x', 1, 'y', 5) as o"), c, ".o.y",
      "value(10)", "5")
    assertViol(fix("named_struct('x', 1, 'y', '') as o"), c, ".o.y",
      "value(10)", "''")
    assertViol(fix("named_struct('x', 1, 'y', double('NaN')) as o"), c,
      ".o.y", "value(10)", "NaN")
  }

  // --- strict / extend matrix (contract.spec.js:423-521) ---
  test("strict: rejects undeclared fields, listing them (:697-709)") {
    val c = C.obj("o" -> C.obj("x" -> C.number).strict)
    assertPass(fix("named_struct('x', 5) as o"), c)
    assertViol(fix("named_struct('x', 5, 'z', 9) as o"), c, ".o",
      "object with no extra fields", "{z}")
  }
  test("extend/strict commute (contract.spec.js:479-520)") {
    val base = C.obj("x" -> C.number)
    val es = C.obj("o" -> base.extend("y" -> C.number).strict)
    val se = C.obj("o" -> base.strict.extend("y" -> C.number))
    for (c <- Seq(es, se)) {
      assertPass(fix("named_struct('x', 1, 'y', 2) as o"), c)
      assertViol(fix("named_struct('x', 1, 'y', 2, 'z', 3) as o"), c, ".o",
        "object with no extra fields", "{z}")
      assertViol(fix("named_struct('x', 1) as o"), c, ".o.y", "Field `y`",
        "missing")
    }
  }

  // --- rename (impl :188-198) ---
  test("rename: display name flows into expected text") {
    val c = C.obj("x" -> C.string.rename("label"))
    assertViol(fix("5 as x"), c, ".x", "label", "5")
  }

  // --- kidPark recursive-object golden (contract.spec.js:19-59) ---
  test("kidPark: deep nested path with array frame") {
    val ladder = C.obj("color" -> C.string, "size" -> C.string)
    val kidPark = C.obj("park" -> C.obj(
      "name" -> C.string,
      "acres" -> C.number,
      "playunit" -> C.obj(
        "junglebars" -> C.bool,
        "slides" -> C.number,
        "ladders" -> C.array(ladder))))
    val good = fix(
      """named_struct('name', 'corner', 'acres', 0.1,
        |'playunit', named_struct('junglebars', true, 'slides', 2,
        |'ladders', array(named_struct('color','red','size','small'),
        |named_struct('color','blue','size','tall')))) as park""".stripMargin)
    assertPass(good, kidPark)
    val bad = fix(
      """named_struct('name', 'corner', 'acres', 0.1,
        |'playunit', named_struct('junglebars', true, 'slides', 2,
        |'ladders', array(named_struct('color','red','size','small'),
        |named_struct('color','blue','size',cast(null as string))))) as park"""
        .stripMargin)
    assertViol(bad, kidPark, ".park.playunit.ladders[1].size",
      "Field `size`", "null")
  }

  // --- pred with an opaque Scala closure (UDF escape hatch) ---
  test("predUdf: arbitrary closure predicate (blocks pushdown — escape " +
       "hatch only)") {
    val evenLen = PredUdfC("evenLen",
      v => v != null && v.toString.length % 2 == 0)
    assertPass(fix("'ab' as x"), C.obj("x" -> evenLen))
    assertViol(fix("'abc' as x"), C.obj("x" -> evenLen), ".x", "evenLen",
      "'abc'")
  }

  // --- construction guards (ContractLibraryError, contract-errors.js:244) ---
  test("builder guards reject misuse") {
    intercept[ContractLibraryError](C.and())
    intercept[ContractLibraryError](C.or())
    intercept[ContractLibraryError](C.oneOf())
    intercept[ContractLibraryError](C.obj("x" -> C.any, "x" -> C.string))
  }

  // --- rendering (toString parity surface, impl :181-187) ---
  test("contract renderings are canonical (reference toString parity)") {
    // every expected string below was captured by EXECUTING the
    // reference's toString (see MessageParitySpec for the harness)
    assert(C.and(C.string, C.value("asd")).render ==
      "c.and(c.string, c.value(asd))")
    // strict() renames the whole contract (contract.impl.js:718)
    assert(C.obj("x" -> C.number).strict.render == "c.object.strict")
    assert(C.obj("x" -> C.number).render == "c.object({x: c.number})")
    assert(C.array(C.oneOf(1, 2)).render == "c.array(c.oneOf(1, 2))")
    assert(C.optional(C.string).render == "c.optional(c.string)")
    assert(C.tuple(C.string, C.number).render ==
      "c.tuple(c.string, c.number)")
    assert(C.tuple(C.string).strict.render == "c.tuple.strict")
    assert(C.hash(C.bool).render == "c.hash(c.bool)")
    // or drops its branches (subToString never overridden, :421)
    assert(C.or(C.string, C.value(6)).render == "c.or()")
    assert(C.any.render == "c.any()")
    assert(C.date.render == "c.Date")
    assert(C.value(5.0).render == "c.value(5)")
    assert(C.value(true).render == "c.value(true)")
    assert(C.array(C.string).rename("strs").render == "c.strs")
  }
}
