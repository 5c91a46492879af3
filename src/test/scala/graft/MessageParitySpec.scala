package graft

import graft.contracts._
import org.apache.spark.sql.functions._

/** BYTE-parity golden suite for ContractError messages.
  *
  * Every golden in `reference_messages.json` was captured by EXECUTING
  * the reference implementation (`/root/reference/src/contract.js` under
  * node, with a minimal underscore shim) and recording the thrown
  * `e.message` verbatim — so these are the reference's actual bytes, not
  * a hand-derived transcription. Each test replays the same check in the
  * data plane (full-value mode on, matching the reference's always-on
  * fullContractAndValue) and asserts byte equality.
  *
  * Known deviations (asserted structurally, not byte-for-byte):
  *  - node's util.inspect wraps LARGE values across multiple lines; the
  *    engine renders single-line, length-capped values (scale guard).
  *    Goldens here use small values where inspect is single-line.
  */
class MessageParitySpec extends SparkTestBase {

  private val goldens: Map[String, String] = {
    val in = getClass.getResourceAsStream("/reference_messages.json")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(txt)
    val it = m.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
    b.result()
  }

  /** data-plane analog of `contract.check(value, 'data')`: compile at
    * the root frame over a single column holding the value. */
  private def checkValue(sqlExpr: String, c: Contract): Option[String] = {
    val df = fix(s"$sqlExpr as x")
    val dt = df.schema("x").dataType
    implicit val env: MsgEnv = MsgEnv("data", c.render,
      Some(Compiler.render(dt, col("x"))))
    val v = Compiler.firstViol(c, dt, col("x"), Frame.root)
    val r = df.select(when(v.isNotNull, Compiler.assembleMessage(v))
      .as("m")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  /** data-plane analog of `contract.check(row, 'data')` where the row is
    * the object: row-level compile with full-value mode (direct, so the
    * rendered row contains only the data columns — no id column). */
  private def checkRow(projection: String, c: ObjectC): Option[String] = {
    val df = fix(projection)
    val rowRender = Compiler.render(
      org.apache.spark.sql.types.StructType(df.schema.fields),
      struct(df.columns.map(col): _*))
    implicit val env: MsgEnv = MsgEnv("data", c.render, Some(rowRender))
    val v = Compiler.objectViols(c, df.schema, f => col(f), Frame.root,
      rowRender)
    val r = df.select(when(v.isNotNull, Compiler.assembleMessage(v))
      .as("m")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  private def assertGolden(name: String, actual: Option[String]): Unit = {
    val want = goldens(name)
    assert(actual.isDefined, s"$name: expected a violation, got pass")
    assert(actual.get == want,
      s"$name:\n--- engine ---\n${actual.get}\n--- reference ---\n$want\n" +
      s"--- engine(esc) ---\n${escape(actual.get)}\n" +
      s"--- ref(esc) ---\n${escape(want)}")
  }
  private def escape(s: String): String =
    s.replace("\n", "\\n")

  // --- leaves at top level (no frames, no full value) ---
  test("parity: leaf type gates") {
    assertGolden("string_top", checkValue("5", C.string))
    assertGolden("number_str", checkValue("'x'", C.number))
    assertGolden("integer_float", checkValue("double(5.5)", C.integer))
    assertGolden("bool_num", checkValue("1", C.bool))
    assertGolden("nothing", checkValue("5", C.nothing))
    assertGolden("falsy", checkValue("1", C.falsy))
    assertGolden("truthy", checkValue("0", C.truthy))
    assertGolden("value_str", checkValue("'aaa'", C.value("asd")))
    assertGolden("value_num_mismatch_type", checkValue("'5'", C.value(5)))
    assertGolden("oneOf", checkValue("'xx'", C.oneOf("en", "es")))
    assertGolden("matches",
      checkValue("'nope'", C.matches("^src[0-9]+$")))
    assertGolden("matches_null",
      checkValue("cast(null as string)", C.matches("null")))
    assertGolden("renamed", checkValue("5", C.string.rename("mystr")))
    assertGolden("date_num", checkValue("5", C.date))
  }

  test("parity: firstChecker failures of shape contracts") {
    assertGolden("array_nonarray", checkValue("5", C.array(C.any)))
    assertGolden("tuple_nonarray", checkValue("5", C.tuple(C.any)))
    assertGolden("hash_nonobj", checkValue("5", C.hash(C.any)))
    assertGolden("object_nonobj", checkValue("5", C.obj("x" -> C.any)))
  }

  // --- frames: long innermost form, at-position, in-contract, value ---
  test("parity: array element frame (+ 11st ordinal quirk)") {
    assertGolden("array_item",
      checkValue("array(5, 10)", C.array(C.value(5))))
    // the reference's ith() has no 11/12/13 special case → "11st";
    // large-value inspect wraps lines, so assert the ordinal only
    val m11 = checkValue("array(5,5,5,5,5,5,5,5,5,5,9)",
      C.array(C.value(5))).get
    assert(m11.contains("for the 11st element of the array"))
    assert(goldens("array_item_11th")
      .contains("for the 11st element of the array"))
  }

  test("parity: nested object/array/tuple/hash frames") {
    assertGolden("nested_obj_array", checkRow(
      "array(5, 10) as x", C.obj("x" -> C.array(C.value(5)))))
    assertGolden("deep_path", checkRow(
      "array(named_struct('y','a'), named_struct('y','b')) as x",
      C.obj("x" -> C.array(C.obj("y" -> C.value("a"))))))
    assertGolden("tuple_pos", checkRow(
      "array(1, 3) as t", C.obj("t" -> C.tuple(C.value(1), C.value(2)))))
    assertGolden("hash_key", checkRow(
      "map('a', '1', 'b', 'x') as h", C.obj("h" -> C.hash(C.number))))
  }

  test("parity: and frames; silentAnd suppresses frames") {
    assertGolden("and_frame", checkRow("'aaa' as x",
      C.obj("x" -> C.and(C.string, C.value("asd")))))
    assertGolden("and_top",
      checkValue("'aaa'", C.and(C.string, C.value("asd"))))
    assertGolden("silentAnd_top",
      checkValue("'aaa'", C.silentAnd(C.string, C.value("asd"))))
  }

  test("parity: optional inner failure keeps the field frame") {
    assertGolden("optional_inner_fail", checkRow("5 as x",
      C.obj("x" -> C.optional(C.string))))
  }

  // --- constructor-message errors ---
  test("parity: tuple size errors (no full-contract clause)") {
    assertGolden("tuple_short",
      checkValue("array(1)", C.tuple(C.any, C.any)))
    assertGolden("tuple_short_nested", checkRow("array(1) as t",
      C.obj("t" -> C.tuple(C.any, C.any))))
    assertGolden("tuple_strict_extra",
      checkValue("array(1, 2)", C.tuple(C.any).strict))
  }

  test("parity: required field, top-level and nested") {
    assertGolden("required_field", checkRow("5 as y",
      C.obj("x" -> C.string)))
    assertGolden("required_nested", checkRow(
      "named_struct('y', 1) as o",
      C.obj("o" -> C.obj("x" -> C.string))))
  }

  test("parity: strict extra fields (singular and plural)") {
    assertGolden("strict_extra1", checkRow("'a' as x, 1 as z",
      C.obj("x" -> C.string).strict))
    assertGolden("strict_extra2", checkRow("'a' as x, 1 as z, 2 as w",
      C.obj("x" -> C.string).strict))
  }

  // --- or-failure aggregation (contract.impl.js:455-471) ---
  test("parity: or aggregates every branch failure") {
    assertGolden("or_top", checkValue("0", C.or(C.string, C.value(6))))
    assertGolden("or_nested", checkRow("0 as x",
      C.obj("x" -> C.or(C.string, C.value(6)))))
    assertGolden("or_deep_branch", checkValue("array('a', 'b')",
      C.or(C.array(C.value("a")), C.number)))
    assertGolden("or_three",
      checkValue("array()", C.or(C.string, C.number, C.bool)))
  }

  test("parity: nested or (or-in-or embeds the inner aggregation; " +
       "or-in-and carries the and frame into every inner message)") {
    assertGolden("or_in_or", checkValue("0",
      C.or(C.or(C.string, C.bool), C.value(6))))
    assertGolden("or_in_and", checkValue("3",
      C.and(C.number, C.or(C.value(1), C.value(2)))))
  }

  test("parity: or over object branches collects required-field " +
       "failures too") {
    assertGolden("or_of_objects", checkValue(
      "named_struct('kind', 'blob')",
      C.or(C.obj("kind" -> C.value("text"), "t" -> C.string),
        C.obj("kind" -> C.value("image"), "r" -> C.string))))
  }

  test("parity: or over a DYNAMIC (map-typed) object lists EVERY field " +
       "failure of the object branch (collect-all over MapType)") {
    assertGolden("or_obj_dynamic_collect", checkValue(
      "map('x', 'a', 'y', '5')",
      C.or(C.obj("x" -> C.number, "y" -> C.value("ok")), C.string)))
  }

  // --- renders (toString parity) ---
  test("parity: contract renderings match reference toString") {
    assert(C.obj("x" -> C.array(C.value(5)),
      "y" -> C.optional(C.string)).render == goldens("render_obj"))
    assert(C.obj("x" -> C.string).strict.render == goldens("render_strict"))
    assert(C.tuple(C.any).strict.render == goldens("render_tuple_strict"))
    assert(C.or(C.string, C.value(6)).render == goldens("render_or"))
    assert(C.and(C.string, C.value("asd")).render == goldens("render_and"))
    assert(C.silentAnd(C.string, C.value("a")).render ==
      goldens("render_silentAnd"))
    assert(C.matches("^a+$").render == goldens("render_matches"))
    assert(C.oneOf("en", "es", 1, true).render == goldens("render_oneOf"))
    assert(C.hash(C.number).render == goldens("render_hash"))
    assert(C.array(C.string).rename("strs").render ==
      goldens("render_renamed"))
    assert(C.optional(C.value(10)).render == goldens("render_optional"))
    assert(C.any.render == goldens("render_any"))
    assert(C.date.render == goldens("render_date"))
    assert(C.nothing.render == goldens("render_nothing"))
    assert(C.value(5.0).render == goldens("render_value_float"))
    assert(C.value(-2.5).render == goldens("render_value_neg"))
    assert(C.value(true).render == goldens("render_value_bool"))
    assert(C.value(null).render == goldens("render_value_null"))
  }

  // --- got-side util.inspect nuances ---
  test("parity: got-value rendering (inspect nuances)") {
    assertGolden("got_float", checkValue("double(2.5)", C.string))
    assertGolden("got_float_int", checkValue("double(5.0)", C.string))
    assertGolden("got_nan", checkValue("double('NaN')", C.string))
    assertGolden("got_true", checkValue("true", C.string))
    assertGolden("got_empty_arr",
      checkValue("array()", C.number))
    assertGolden("got_str_quote", checkValue("\"it's\"", C.number))
  }

  test("parity: inspection depth caps nested rendering with [Object]") {
    Compiler.setErrorMessageInspectionDepth(2)
    try assertGolden("depth2_deep_got", checkValue(
      "named_struct('a', named_struct('b', named_struct('c', " +
        "named_struct('d', 1))))", C.number))
    finally Compiler.setErrorMessageInspectionDepth(5)
  }
}
