package graft.contracts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a [[Contract]] against a concrete Spark schema into a single
  * Catalyst `Column` yielding the row's FIRST violation — a
  * `STRUCT<path, expected, got>` — or NULL when the row conforms.
  *
  * This replaces the reference's per-value recursive interpretation
  * (`checkWContext`, contract.impl.js:30-63) with a *static* compilation:
  * the depth-first, declaration-order traversal is encoded as nested
  * `coalesce`/`when`/`transform` expressions, so Catalyst constant-folds,
  * prunes columns, pushes filters, and whole-stage-codegens the check.
  * "Throws first error" (context.fail, contract.impl.js:108-111) becomes
  * "first non-null violation in canonical traversal order".
  *
  * Schema-awareness: JS is dynamically typed, Spark is not. A type gate
  * that the physical schema already guarantees (e.g. `string` on a
  * StringType column) reduces to a null check (SQL NULL ⇔ JS
  * null/undefined, utils.js:20-22); a gate the schema contradicts (e.g.
  * `string` on LongType) compiles to an unconditional per-row violation,
  * matching the reference's runtime "Expected string, but got 5".
  *
  * Scale notes: violation *rendering* (`got` strings, paths) sits inside
  * `when(fail, …)` branches, so conforming rows — the overwhelming
  * majority at 10¹²-doc scale — never pay string-building cost (the
  * reference's silent-frame / lazy-message optimization, SURVEY.md §4.1).
  * Rendered values are depth- and length-capped (utils.js:53-65 analog).
  */
object Compiler {

  /** violation payload produced per node; `contract_repr` and `message`
    * are attached once at the sink (see [[graft.engine.Validate]]). */
  val violType: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("expected", StringType),
    StructField("got", StringType)))

  /** inspection depth/length for rendered values. Mutable module state
    * mirrors the reference exactly: setErrorMessageInspectionDepth is a
    * global knob there too (utils.js:53-57; default depth 5). Length cap
    * is the engine's scale guard (bounded violation-row bytes). */
  @volatile var MaxRenderDepth = 5
  @volatile var MaxRenderLen = 512
  def setErrorMessageInspectionDepth(d: Int): Unit = {
    require(d >= 0, "depth must be >= 0"); MaxRenderDepth = d
  }

  private val nullViol: Column = lit(null).cast(violType)

  def viol(path: Column, expected: String, got: Column): Column =
    struct(path.as("path"), lit(expected).as("expected"),
      got.as("got")).cast(violType)

  /** first-violation expression for contract `c` over column `col` of
    * static type `dt`; `path` is the accumulated path-frame string
    * (short forms concatenated, contract-errors.js:11-66). */
  def firstViol(c: Contract, dt: DataType, col: Column, path: Column): Column =
    c match {
      case AnyC => nullViol

      case NothingC => viol(path, "nothing", render(dt, col))

      case Renamed(inner, name) =>
        // rename affects the display name in messages
        // (contract.impl.js:188-198): rewrite the `expected` field.
        val v = firstViol(inner, dt, col, path)
        when(v.isNotNull,
          struct(v.getField("path").as("path"),
            when(v.getField("path") === path, lit(name))
              .otherwise(v.getField("expected")).as("expected"),
            v.getField("got").as("got")).cast(violType))

      case f: ForwardRefC => firstViol(f.resolved, dt, col, path)

      case OptionalC(inner) =>
        // null short-circuits the whole check (contract.impl.js:31-32)
        when(col.isNotNull, firstViol(inner, dt, col, path))

      case StringC => typeGate(dt == StringType, "string", dt, col, path)

      case NumberC => typeGate(isNumeric(dt), "number", dt, col, path)

      case BoolC => typeGate(dt == BooleanType, "bool", dt, col, path)

      case DateC => typeGate(dt == DateType || dt == TimestampType ||
        dt == TimestampNTZType, "date", dt, col, path)

      case IntegerC => dt match {
        // Math.floor(v) === v (contract.impl.js:334-337); NaN explicitly
        // rejected (JS NaN !== NaN; Spark treats NaN = NaN as TRUE).
        case t if isIntegral(t) =>
          when(col.isNull, viol(path, "integer", lit("null")))
        case DoubleType | FloatType =>
          when(col.isNull || isnan(col) || floor(col) =!= col,
            viol(path, "integer", render(dt, col)))
        case _: DecimalType =>
          when(col.isNull || floor(col) =!= col,
            viol(path, "integer", render(dt, col)))
        case _ => viol(path, "integer", render(dt, col))
      }

      case ValueC(v) =>
        if (comparable(dt, v))
          when(!(col <=> lit(v)), viol(path, ValueC(v).render, render(dt, col)))
        else viol(path, ValueC(v).render, render(dt, col))

      case OneOfC(vs) =>
        if (vs.forall(comparable(dt, _)))
          when(col.isNull || !coalesce(col.isin(vs: _*), lit(false)),
            viol(path, OneOfC(vs).render, render(dt, col)))
        else viol(path, OneOfC(vs).render, render(dt, col))

      case FalsyC =>
        when(!isFalsy(dt, col), viol(path, "falsy", render(dt, col)))

      case TruthyC =>
        when(isFalsy(dt, col), viol(path, "truthy", render(dt, col)))

      case MatchesC(re) => dt match {
        // string gate first; null fails — no coercion
        // (contract.spec.js:178-180)
        case StringType =>
          when(col.isNull || !coalesce(col.rlike(re), lit(false)),
            viol(path, MatchesC(re).render, render(dt, col)))
        case _ => viol(path, MatchesC(re).render, render(dt, col))
      }

      case PredC(_, fn) =>
        when(!coalesce(fn(col), lit(false)),
          viol(path, c.render, render(dt, col)))

      case PredUdfC(_, fn) =>
        val u = udf((v: Any) => fn(v))
        when(!coalesce(u(col), lit(false)),
          viol(path, c.render, render(dt, col)))

      case AndC(branches, silent) =>
        // in order, fail on first (contract.impl.js:384-410); non-silent
        // branches push `.and(i)` path frames
        val vs = branches.zipWithIndex.map { case (b, i) =>
          val p = if (silent || branches.size == 1) path
                  else concat(path, lit(s".and($i)"))
          firstViol(b, dt, col, p)
        }
        coalesceAll(vs)

      case o @ OrC(branches) =>
        // first-success short-circuit in declaration order
        // (contract.impl.js:420-482); on total failure the expectation
        // aggregates every branch (:455-471)
        val vs = branches.map(b => firstViol(b, dt, col, path))
        when(vs.map(_.isNotNull).reduce(_ && _),
          viol(path, o.render, render(dt, col)))

      case a @ ArrayC(item) => dt match {
        case ArrayType(et, _) =>
          // every element checked, `[i]` path frame (arrayItem,
          // contract-errors.js:41-47); first failing element wins
          val elems = transform(col, (x, i) =>
            firstViol(item, et, x,
              concat(path, lit("["), i.cast(StringType), lit("]"))))
          when(col.isNull, viol(path, a.render, lit("null")))
            .otherwise(get(array_compact(elems), lit(0)))
        case _ => viol(path, a.render, render(dt, col))
      }

      case t @ TupleC(items, strict) => dt match {
        case ArrayType(et, _) =>
          val n = items.size
          val posViols = items.zipWithIndex.map { case (ic, i) =>
            firstViol(ic, et, element_at(col, i + 1),
              concat(path, lit(s"[$i]")))
          }
          val sizeViol = when(size(col) < n,
            viol(path, s"tuple of size $n", render(dt, col)))
          val strictViol =
            if (strict) when(size(col) > n,
              viol(path, s"tuple of exactly size $n", render(dt, col)))
            else nullViol
          when(col.isNull, viol(path, t.render, lit("null")))
            .otherwise(coalesceAll(sizeViol +: posViols :+ strictViol))
        case StructType(sfs) =>
          // heterogeneous tuples land on structs
          val n = items.size
          if (sfs.length < n) viol(path, s"tuple of size $n", render(dt, col))
          else {
            val posViols = items.zipWithIndex.map { case (ic, i) =>
              firstViol(ic, sfs(i).dataType, col.getField(sfs(i).name),
                concat(path, lit(s"[$i]")))
            }
            val strictViol =
              if (strict && sfs.length > n)
                viol(path, s"tuple of exactly size $n", render(dt, col))
              else nullViol
            when(col.isNull, viol(path, t.render, lit("null")))
              .otherwise(coalesceAll(posViols :+ strictViol))
          }
        case _ => viol(path, t.render, render(dt, col))
      }

      case h @ HashC(valueC) => dt match {
        case MapType(_, vt, _) =>
          // every value checked, `.k` path frame (hashItem,
          // contract.impl.js:609-640)
          val entryViols = transform(map_entries(col), e =>
            firstViol(valueC, vt, e.getField("value"),
              concat(path, lit("."), e.getField("key").cast(StringType))))
          when(col.isNull, viol(path, h.render, lit("null")))
            .otherwise(get(array_compact(entryViols), lit(0)))
        case _ => viol(path, h.render, render(dt, col))
      }

      case o: ObjectC => dt match {
        case st: StructType =>
          when(col.isNull, viol(path, "object", lit("null")))
            .otherwise(objectViols(o, st, f => col.getField(f), path))
        case MapType(StringType, vt, _) =>
          // dynamic rows: declared fields looked up by key
          val checks = o.fields.toSeq.map { case (fname, fc) =>
            val child = element_at(col, fname)
            val childPath = concat(path, lit("." + fname))
            fieldCheck(fname, fc, vt, child, childPath)
          }
          when(col.isNull, viol(path, "object", lit("null")))
            .otherwise(coalesceAll(checks))
        case _ => viol(path, "object", render(dt, col))
      }
    }

  /** declared-field checks of an object contract over a struct, in
    * declaration order (JS insertion order ⇒ ListMap) — the core of
    * contract.impl.js:642-730. Factored so the row-level validator can
    * bind fields to real top-level columns (no struct() wrapper). */
  def objectViols(o: ObjectC, st: StructType, fieldCol: String => Column,
                  path: Column): Column = {
    val byName = st.fields.map(f => f.name -> f).toMap
    val checks = o.fields.toSeq.map { case (fname, fc) =>
      byName.get(fname) match {
        case None =>
          if (isOptionalC(fc)) nullViol
          // missing non-optional field: ``Field `x` required``
          // (contract.impl.js:653-660) — here the *schema* lacks it, so
          // every row violates
          else viol(path, s"Field `$fname`", lit("missing"))
        case Some(sf) =>
          fieldCheck(fname, fc, sf.dataType, fieldCol(fname),
            concat(path, lit("." + fname)))
      }
    }
    val strictViol =
      if (o.isStrict) {
        // rejects undeclared fields, error lists them
        // (contract.impl.js:691-719); static schema ⇒ compile-time diff
        val extra = st.fieldNames.filterNot(o.fields.keySet)
        if (extra.nonEmpty)
          viol(path, s"object with no extra fields",
            lit(extra.mkString("{", ", ", "}")))
        else nullViol
      } else nullViol
    coalesceAll(checks :+ strictViol)
  }

  /** one declared field: required-unless-optional; a NULL value on a
    * required field reports ``Field `x` required``, not the inner
    * contract's type error (contract.impl.js:653-663). */
  private def fieldCheck(fname: String, fc: Contract, dt: DataType,
                         child: Column, childPath: Column): Column =
    peelOptional(fc) match {
      case Some(inner) =>
        when(child.isNotNull, firstViol(inner, dt, child, childPath))
      case None =>
        when(child.isNull, viol(childPath, s"Field `$fname`", lit("null")))
          .otherwise(firstViol(fc, dt, child, childPath))
    }

  /** strips one level of optionality, preserving a rename wrapper so a
    * renamed optional keeps its display name on failure
    * (`optional(...).rename(...)` composes like gentleUpdate clones). */
  private def peelOptional(c: Contract): Option[Contract] = c match {
    case OptionalC(inner) => Some(inner)
    case Renamed(inner, n) => peelOptional(inner).map(Renamed(_, n))
    case _ => None
  }

  private def isOptionalC(c: Contract): Boolean = peelOptional(c).isDefined

  private def coalesceAll(vs: Seq[Column]): Column = {
    val live = vs // keep order; coalesce = first non-null = first failure
    live.size match {
      case 0 => nullViol
      case 1 => live.head
      case _ => coalesce(live: _*)
    }
  }

  private def typeGate(ok: Boolean, name: String, dt: DataType, col: Column,
                       path: Column): Column =
    if (ok) when(col.isNull, viol(path, name, lit("null")))
    else viol(path, name, render(dt, col))

  private def isNumeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType => true
    case _: DecimalType => true
    case _ => false
  }
  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def comparable(dt: DataType, v: Any): Boolean = (dt, v) match {
    case (_, null) => true
    case (StringType, _: String) => true
    case (t, _: Int) if isNumeric(t) => true
    case (t, _: Long) if isNumeric(t) => true
    case (t, _: Double) if isNumeric(t) => true
    case (t, _: Float) if isNumeric(t) => true
    case (BooleanType, _: Boolean) => true
    // temporal literals: the reference's `value` accepts any literal
    // (contract.impl.js:323-326) — Date/Timestamp columns compare
    // null-safely against java.sql / java.time literals
    case (DateType, _: java.sql.Date) => true
    case (DateType, _: java.time.LocalDate) => true
    case (TimestampType, _: java.sql.Timestamp) => true
    case (TimestampType, _: java.time.Instant) => true
    case (TimestampNTZType, _: java.time.LocalDateTime) => true
    case _ => false
  }

  /** JS-falsy per static type: false, 0, '', NaN, null
    * (contract.impl.js:298-301). Containers are always truthy in JS. */
  private def isFalsy(dt: DataType, col: Column): Column = dt match {
    case StringType => col.isNull || col === ""
    case BooleanType => col.isNull || !col
    case DoubleType | FloatType => col.isNull || isnan(col) || col === 0.0
    case t if isNumeric(t) => col.isNull || col === 0
    case _ => col.isNull
  }

  // ---------------------------------------------------------------------
  // collect-ALL mode: every violation in depth-first order (array of
  // viol structs). The reference's check() throws on the FIRST error
  // (context.fail, contract.impl.js:108-111) — firstViol is the parity
  // surface; allViols is the engine's batch-reporting extension (a
  // 10¹²-row job wants the full defect inventory in one pass).
  // ---------------------------------------------------------------------

  private val emptyViols: Column = array().cast(ArrayType(violType))

  private def asArray(v: Column): Column =
    when(v.isNotNull, array(v)).otherwise(emptyViols)

  def allViols(c: Contract, dt: DataType, col: Column, path: Column)
      : Column = c match {
    case AnyC => emptyViols
    case OptionalC(inner) =>
      when(col.isNotNull, allViols(inner, dt, col, path))
        .otherwise(emptyViols)
    case Renamed(inner, name) =>
      // rename rewrites expected on this node's own violations
      transform(allViols(inner, dt, col, path), v =>
        struct(v.getField("path").as("path"),
          when(v.getField("path") === path, lit(name))
            .otherwise(v.getField("expected")).as("expected"),
          v.getField("got").as("got")).cast(violType))
    case f: ForwardRefC => allViols(f.resolved, dt, col, path)
    case AndC(branches, silent) =>
      val vs = branches.zipWithIndex.map { case (b, i) =>
        val p = if (silent || branches.size == 1) path
                else concat(path, lit(s".and($i)"))
        allViols(b, dt, col, p)
      }
      vs.reduce(concat(_, _))
    case ArrayC(item) => dt match {
      case ArrayType(et, _) =>
        when(col.isNull, array(viol(path, c.render, lit("null"))))
          .otherwise(flatten(transform(col, (x, i) =>
            allViols(item, et, x,
              concat(path, lit("["), i.cast(StringType), lit("]"))))))
      case _ => asArray(firstViol(c, dt, col, path))
    }
    case o: ObjectC => dt match {
      case st: StructType =>
        val byName = st.fields.map(f => f.name -> f).toMap
        val checks = o.fields.toSeq.map { case (fname, fc) =>
          byName.get(fname) match {
            case None =>
              if (peelOptional(fc).isDefined) emptyViols
              else array(viol(path, s"Field `$fname`", lit("missing")))
            case Some(sf) =>
              val child = col.getField(fname)
              val childPath = concat(path, lit("." + fname))
              peelOptional(fc) match {
                case Some(inner) =>
                  when(child.isNotNull,
                    allViols(inner, sf.dataType, child, childPath))
                    .otherwise(emptyViols)
                case None =>
                  when(child.isNull,
                    array(viol(childPath, s"Field `$fname`", lit("null"))))
                    .otherwise(
                      allViols(fc, sf.dataType, child, childPath))
              }
          }
        }
        val strictViols =
          if (o.isStrict) {
            val extra = st.fieldNames.filterNot(o.fields.keySet)
            if (extra.nonEmpty)
              array(viol(path, "object with no extra fields",
                lit(extra.mkString("{", ", ", "}"))))
            else emptyViols
          } else emptyViols
        val fieldsAll = (checks :+ strictViols).reduce(concat(_, _))
        when(col.isNull, array(viol(path, "object", lit("null"))))
          .otherwise(fieldsAll)
      case _ => asArray(firstViol(c, dt, col, path))
    }
    case HashC(valueC) => dt match {
      case MapType(_, vt, _) =>
        when(col.isNull, array(viol(path, c.render, lit("null"))))
          .otherwise(flatten(transform(map_entries(col), e =>
            allViols(valueC, vt, e.getField("value"),
              concat(path, lit("."), e.getField("key")
                .cast(StringType))))))
      case _ => asArray(firstViol(c, dt, col, path))
    }
    // leaves, or, tuple, preds: single-violation nodes
    case other => asArray(firstViol(other, dt, col, path))
  }

  // ---------------------------------------------------------------------
  // deterministic value rendering (`got` / `full_value` strings) —
  // util.inspect-like, depth-capped (utils.js:53-65), length-capped for
  // scale. Only evaluated on failing rows (inside when(fail, …)).
  // ---------------------------------------------------------------------

  def render(dt: DataType, col: Column): Column =
    clip(renderDepth(dt, col, MaxRenderDepth))

  private def clip(c: Column): Column =
    when(length(c) > MaxRenderLen,
      concat(substring(c, 1, MaxRenderLen), lit("…"))).otherwise(c)

  private def renderDepth(dt: DataType, col: Column, depth: Int): Column = {
    val body: Column = dt match {
      case StringType => concat(lit("'"), col, lit("'"))
      case BooleanType => when(col, "true").otherwise("false")
      case DoubleType | FloatType => jsNum(col)
      case t if isIntegral(t) => col.cast(StringType)
      case _: DecimalType => col.cast(StringType)
      case DateType => date_format(col, "yyyy-MM-dd")
      case TimestampType | TimestampNTZType =>
        date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      case BinaryType =>
        concat(lit("<binary "), substring(hex(col), 1, 16), lit(">"))
      case ArrayType(et, _) =>
        if (depth <= 0) lit("[Array]")
        else when(size(col) === 0, "[]").otherwise(
          concat(lit("[ "),
            array_join(transform(col, x => renderDepth(et, x, depth - 1)),
              ", ", "null"),
            lit(" ]")))
      case StructType(sfs) =>
        if (depth <= 0) lit("[Object]")
        else if (sfs.isEmpty) lit("{}")
        else concat(lit("{ "),
          concat_ws(", ", sfs.map(sf => concat(lit(sf.name + ": "),
            renderDepth(sf.dataType, col.getField(sf.name), depth - 1))): _*),
          lit(" }"))
      case MapType(_, vt, _) =>
        if (depth <= 0) lit("[Object]")
        else when(size(col) === 0, "{}").otherwise(
          concat(lit("{ "),
            array_join(transform(map_entries(col), e =>
              concat(e.getField("key").cast(StringType), lit(": "),
                renderDepth(vt, e.getField("value"), depth - 1))),
              ", ", "null"),
            lit(" }")))
      case _ => col.cast(StringType)
    }
    when(col.isNull, lit("null")).otherwise(body)
  }

  /** JS number rendering: integral doubles drop the ".0" (5.0 → "5"),
    * NaN/Infinity verbatim — matches Render.num on the driver side. */
  private def jsNum(col: Column): Column =
    when(isnan(col), "NaN")
      .when(col === Double.PositiveInfinity, "Infinity")
      .when(col === Double.NegativeInfinity, "-Infinity")
      .when(floor(col) === col && abs(col) < 1e15,
        col.cast(LongType).cast(StringType))
      .otherwise(col.cast(StringType))
}
