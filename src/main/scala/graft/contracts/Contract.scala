package graft.contracts

import org.apache.spark.sql.Column
import scala.collection.immutable.ListMap

/** Contract ADT — a first-class, immutable, composable predicate tree.
  *
  * Re-expresses the first-order combinator algebra of the reference
  * (rho-contracts `src/contract.impl.js`): leaf type tests (:281-365),
  * boolean combinators and/or/optional (:384-482, :276-279), and the shape
  * algebra array/tuple/hash/object (:518-730). Contracts here are pure
  * driver-side values; `graft.contracts.Compiler` compiles a contract
  * against a concrete Spark schema into a single Catalyst `Column`
  * expression yielding the row's first violation (or NULL), so evaluation
  * is whole-stage-codegen'd on executors — no per-row interpretation, no
  * exceptions (violations become data, cf. SURVEY.md §1.2).
  *
  * Immutability discipline mirrors the reference's `gentleUpdate`
  * (`src/utils.js:30-37`): every refinement (`rename`, `optional`,
  * `strict`, `extend`) returns a new value.
  */
sealed trait Contract {
  /** Canonical rendering — the reference `toString`
    * (contract.impl.js:181-187): "c."-prefixed, nested renders joined
    * with ", ", bug-for-bug including `c.or()` (or's subToString returns
    * [] in the reference) and `c.object.strict` (strict() renames the
    * whole contract). Used for `contract_repr` and the `in contract:`
    * message clause. */
  def render: String
  /** `contractName` (contract.impl.js:131) — the `expected` text when
    * this node's own check fails. */
  def name: String = render.stripPrefix("c.")
  def rename(n: String): Contract = Renamed(this, n)
  def optional: Contract = this match {
    case o: OptionalC => o
    case c            => OptionalC(c)
  }
  /** the reference's wrapping flag (contract.impl.js:137): true only
    * for contracts that must intercept calls (function contracts). All
    * data-plane contracts check values, never wrap calls — function
    * contracts live driver-side in [[ContractRegistry]] — so this is
    * false throughout the ADT; [[CyclicC]]'s close-cycle guard compares
    * against it exactly like the reference (:489-494). */
  def needsWrapping: Boolean = false
}

/** accepts everything — contract.impl.js:281-282. Never renamed in the
  * reference, so its toString keeps the `()` (subToString is empty). */
case object AnyC extends Contract {
  def render = "c.any()"; override def name = "any"
}

/** rejects everything — contract.impl.js:289-292 */
case object NothingC extends Contract { def render = "c.nothing" }

/** string type test — contract.impl.js:328-329 */
case object StringC extends Contract { def render = "c.string" }

/** number type test — contract.impl.js:331-332 */
case object NumberC extends Contract { def render = "c.number" }

/** integer: Math.floor(v) === v — contract.impl.js:334-337 */
case object IntegerC extends Contract { def render = "c.integer" }

/** boolean type test — contract.impl.js:339-340 */
case object BoolC extends Contract { def render = "c.bool" }

/** Date test — contract.impl.js:345-346 (named 'Date', capital D);
  * maps to Date/TimestampType */
case object DateC extends Contract { def render = "c.Date" }

/** JS-falsy — contract.impl.js:298-301 */
case object FalsyC extends Contract { def render = "c.falsy" }

/** negation of falsy — contract.impl.js:303-306 */
case object TruthyC extends Contract { def render = "c.truthy" }

/** exact value — contract.impl.js:323-326 (null-safe equality). The
  * display name interpolates the value as a JS template literal —
  * strings UNQUOTED: `value(asd)` (contract.impl.js:325). */
final case class ValueC(v: Any) extends Contract {
  def render = s"c.value(${Render.js(v)})"
}

/** membership in an enumerated set — contract.impl.js:308-321; values
  * joined bare: `oneOf(en, es)` (:309). */
final case class OneOfC(vs: Seq[Any]) extends Contract {
  def render = s"c.oneOf(${vs.map(Render.js).mkString(", ")})"
}

/** string AND regex test — contract.impl.js:412-418. Pattern is a Java
  * regex, applied unanchored (JS `RegExp.test` ≈ `rlike`). */
final case class MatchesC(pattern: String) extends Contract {
  def render = s"c.matches(/$pattern/)"
}

/** user predicate over the compiled Column — the `pred(fn)` escape hatch
  * (contract.impl.js:284-287). `fn` builds a *Catalyst expression* (stays
  * inside codegen); for opaque closures use [[PredUdfC]].
  *
  * `anonymous` mirrors the reference's un-renamed `pred(fn)` quirk: the
  * contractName is 'unamed-pred' (sic, contract.impl.js:285) so messages
  * say "Expected unamed-pred", but toString APPENDS argument parens —
  * `c.unamed-pred()` — because the name carries no args of its own
  * (renaming drops the parens: `c.pred(fn).rename('big')` → `c.big`). */
final case class PredC(predName: String, fn: Column => Column,
                       anonymous: Boolean = false)
    extends Contract {
  def render = if (anonymous) s"c.$predName()" else s"c.$predName"
  override def name = predName
}

/** opaque Scala-closure predicate, compiled to a Scala UDF (blocks
  * pushdown — last resort, mirrors the reference's arbitrary JS pred). */
final case class PredUdfC(predName: String, fn: Any => Boolean,
                          anonymous: Boolean = false)
    extends Contract {
  def render = if (anonymous) s"c.$predName()" else s"c.$predName"
  override def name = predName
}

/** all pass, in order, fail on first, `.and(i)` path frame —
  * contract.impl.js:384-410; silent variant omits frames (:407-409). */
final case class AndC(branches: Seq[Contract], silent: Boolean = false)
    extends Contract {
  // silentAnd shares the 'and' name (makeAnd, contract.impl.js:383-410)
  def render = s"c.and(${branches.map(_.render).mkString(", ")})"
  override def name = "and"
}

/** first-success short-circuit in declaration order; on total failure the
  * violation aggregates branch expectations — contract.impl.js:420-482 */
final case class OrC(branches: Seq[Contract]) extends Contract {
  // bug-for-bug: the reference's or never overrides subToString, so its
  // toString drops the branches — `c.or()` (contract.impl.js:181-187,
  // :421; confirmed by executing the reference)
  def render = "c.or()"
}

/** accept null (SQL NULL ⇔ JS null/undefined, utils.js:20-22), else
  * delegate — contract.impl.js:276-279, :31-32. NOTE: only null — the
  * falsy values '' and NaN are rejected (contract.spec.js:355-370;
  * implementation beats the doc at contract.js:233-234). */
final case class OptionalC(inner: Contract) extends Contract {
  def render = s"c.optional(${inner.render})"
  override def name = s"optional(${inner.name})"
}

/** homogeneous array, every element checked, `[i]` path frame —
  * contract.impl.js:518-542 */
final case class ArrayC(item: Contract) extends Contract {
  def render = s"c.array(${item.render})"
  override def name = "array"
}

/** positional tuple: length >= n, per-position checks, extras pass
  * unless strict — contract.impl.js:544-607 */
final case class TupleC(items: Seq[Contract], isStrict: Boolean = false)
    extends Contract {
  // strict() RENAMES the contract (contract.impl.js:598) so the whole
  // rendering collapses to `c.tuple.strict`
  def render =
    if (isStrict) "c.tuple.strict"
    else s"c.tuple(${items.map(_.render).mkString(", ")})"
  // strict() also changes the contractName used by firstChecker gate
  // messages: "Expected tuple.strict, but got null" (contract.impl.js:597)
  override def name = if (isStrict) "tuple.strict" else "tuple"
  def strict: TupleC = copy(isStrict = true)
}

/** homogeneous map values under arbitrary string keys, `.k` path frame —
  * contract.impl.js:609-640 */
final case class HashC(valueC: Contract) extends Contract {
  def render = s"c.hash(${valueC.render})"
  override def name = "hash"
}

/** named fields each with its own contract; required unless optional;
  * extra fields allowed unless strict — contract.impl.js:642-730.
  * Field order (ListMap) is semantic: first-violation selection follows
  * declaration order, like JS object insertion order. */
final case class ObjectC(fields: ListMap[String, Contract],
                         isStrict: Boolean = false) extends Contract {
  // strict() renames to 'object.strict' (contract.impl.js:718), which
  // collapses the rendering — bug-for-bug with the reference
  def render =
    if (isStrict) "c.object.strict"
    else s"c.object({${fields.map { case (k, v) => s"$k: ${v.render}" }
      .mkString(", ")}})"
  // ...and the contractName with it: gate failures on a strict object
  // read "Expected object.strict, but got null" (contract.impl.js:718)
  override def name = if (isStrict) "object.strict" else "object"
  /** merged field map, persistent update — contract.impl.js:683-689 */
  def extend(more: (String, Contract)*): ObjectC =
    copy(fields = fields ++ ListMap(more: _*))
  /** rejects undeclared fields — contract.impl.js:691-719 */
  def strict: ObjectC = copy(isStrict = true)
}

/** display-name override flowing into `expected` text — rename,
  * contract.impl.js:188-198 */
final case class Renamed(inner: Contract, newName: String)
    extends Contract {
  def render = s"c.$newName"
  override def name = newName
}

/** explicit `cyclic()` handle enabling self-referential contracts
  * (contract.impl.js:484-503). `closeCycle(c)` installs the referent
  * under the reference's wrapping-consistency guard (:489-494): the
  * handle's declared needsWrapping must equal the closing contract's,
  * else ContractLibraryError with the reference's exact wording.
  * Recursion is bounded by the finite input schema depth at compile
  * time — Spark schemas are non-recursive, so unrolling always
  * terminates.
  *
  * Documented divergence (probed by executing the reference): on a
  * plain data `check`, the reference's inner self-occurrence checks
  * NOTHING — the enclosing contract captured the handle's pre-close
  * (accept-anything) checker, so `{v: 1, next: 'notobj'}` passes its
  * recursive list contract; recursion only works for its function
  * WRAPPING path, which resolves lazily at call time. The engine
  * resolves the cycle at compile time instead and validates every
  * nested level — the semantics a validation engine exists for
  * (pinned in SurfaceSpec: a depth-2 leaf violation IS reported). */
class CyclicC private[contracts] (
    override val needsWrapping: Boolean,
    refName: String = "cyclic") extends Contract {
  private var ref: Option[Contract] = None
  def closeCycle(c: Contract): this.type = {
    if (needsWrapping != c.needsWrapping)
      throw new ContractLibraryError(
        s"$refName: A $refName() was started with needsWrapping=" +
          s"$needsWrapping, but it was closed with a contract that " +
          s"has needsWrapping=${c.needsWrapping}:\n${c.render}\n")
    ref = Some(c)
    this
  }
  def resolved: Contract = ref.getOrElse(
    throw new ContractLibraryError(s"$refName used before closeCycle"))
  /** reference toString bytes (probed by executing contract.impl.js):
    * an unclosed handle renders `c.cyclic()` — WITH parens, like any
    * un-renamed contract — while `forwardRef`'s rename drops them
    * (`c.forwardRef`, the rename-drops-parens quirk). A CLOSED handle
    * renders as its BODY (closeCycle copies the body's properties onto
    * the handle), with any inner occurrence of the same handle cut
    * back to the short form — the reference gets the cut for free
    * because the body captured the handle's pre-close toString;
    * here a reentrancy guard produces the identical bytes. */
  protected def shortRender: String = s"c.$refName()"
  def render: String =
    if (ref.isEmpty || CyclicC.rendering.get.contains(this)) shortRender
    else {
      CyclicC.rendering.set(CyclicC.rendering.get + this)
      try resolved.render
      finally CyclicC.rendering.set(CyclicC.rendering.get - this)
    }
}

object CyclicC {
  /** handles currently being rendered on this thread — cuts the
    * self-reference in [[CyclicC.render]] (mutual A↔B cycles too). */
  private val rendering =
    new ThreadLocal[Set[CyclicC]] {
      override def initialValue(): Set[CyclicC] = Set.empty
    }
}

/** forward reference — `cyclic` pre-closed into non-wrapping mode with
  * `setRef` in place of `closeCycle` (contract.impl.js:505-511: the
  * reference builds forwardRef by passing cyclic a DEFINED argument,
  * which its `!!_.isUndefined` quirk maps to needsWrapping=false). */
final class ForwardRefC extends CyclicC(false, "forwardRef") {
  /** `.rename('forwardRef')` in the reference drops the parens. */
  override protected def shortRender: String = "c.forwardRef"
  def setRef(c: Contract): this.type = closeCycle(c)
  override def resolved: Contract =
    try super.resolved
    catch { case _: ContractLibraryError =>
      throw new ContractLibraryError("forwardRef used before setRef")
    }
}

/** misuse of the engine's own builder API — ContractLibraryError,
  * contract-errors.js:244-254 (the reference's `publish`-style
  * API-hardening maps to driver-side construction guards, SURVEY.md §2.9) */
final class ContractLibraryError(msg: String)
    extends IllegalArgumentException(msg)

/** Deterministic driver-side literal rendering used in contract
  * renderings. `js` is JS template-literal interpolation (the reference
  * builds value/oneOf names with `${v}` — strings UNQUOTED,
  * contract.impl.js:309, :325); `num` is JS number formatting where 5.0
  * renders "5". */
object Render {
  def js(v: Any): String = v match {
    case null => "null"
    case s: String => s
    case d: Double => num(d)
    case f: Float => num(f.toDouble)
    case b: Boolean => b.toString
    case other => other.toString
  }
  def num(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == Math.floor(d) && Math.abs(d) < 1e15) d.toLong.toString
    else d.toString
}

/** Builder DSL — the engine's public combinator surface, mirroring the
  * reference façade `src/contract.js` plus `toContract`-style promotion
  * (contract.impl.js:227-263). */
object C {
  val any: Contract = AnyC
  val nothing: Contract = NothingC
  val string: Contract = StringC
  val number: Contract = NumberC
  val integer: Contract = IntegerC
  val bool: Contract = BoolC
  val date: Contract = DateC
  val falsy: Contract = FalsyC
  val truthy: Contract = TruthyC
  def value(v: Any): Contract = ValueC(v)
  def oneOf(vs: Any*): Contract = {
    if (vs.isEmpty) throw new ContractLibraryError("oneOf requires values")
    OneOfC(vs)
  }
  def matches(pattern: String): Contract = MatchesC(pattern)
  def pred(name: String)(fn: Column => Column): Contract = PredC(name, fn)
  /** the reference's un-renamed `pred(fn)`: contractName 'unamed-pred'
    * (sic), rendered `c.unamed-pred()` (contract.impl.js:284-287). */
  def pred(fn: Column => Column): Contract =
    PredC("unamed-pred", fn, anonymous = true)
  def predUdf(fn: Any => Boolean): Contract =
    PredUdfC("unamed-pred", fn, anonymous = true)
  def and(cs: Contract*): Contract = {
    if (cs.isEmpty) throw new ContractLibraryError("and requires branches")
    AndC(cs)
  }
  def silentAnd(cs: Contract*): Contract = AndC(cs, silent = true)
  def or(cs: Contract*): Contract = {
    if (cs.isEmpty) throw new ContractLibraryError("or requires branches")
    // the reference unions its branch lists with _.union, which dedups
    // by OBJECT IDENTITY (contract.impl.js:437): two references to the
    // same singleton (c.truthy, c.truthy) collapse to one branch, while
    // two separately-constructed but equal contracts stay distinct.
    // Scala case classes are structurally equal, so dedup must be
    // reference-based (eq) to match.
    val seen = new java.util.IdentityHashMap[Contract, Unit]
    val distinct = cs.filter { c =>
      if (seen.containsKey(c)) false else { seen.put(c, ()); true }
    }
    OrC(distinct)
  }
  def optional(c: Contract): Contract = c.optional
  def array(item: Contract): Contract = ArrayC(item)
  def tuple(items: Contract*): TupleC = TupleC(items)
  def hash(valueC: Contract): Contract = HashC(valueC)
  def obj(fields: (String, Contract)*): ObjectC = {
    val names = fields.map(_._1)
    if (names.distinct.size != names.size)
      throw new ContractLibraryError(s"duplicate object fields: $names")
    ObjectC(ListMap(fields: _*))
  }
  def forwardRef(): ForwardRefC = new ForwardRefC
  /** explicit cyclic handle (contract.impl.js:484-503). The no-arg form
    * is the reference's wrapping default (`!!_.isUndefined(arg)` is
    * true only when the argument is OMITTED)… */
  def cyclic(): CyclicC = new CyclicC(true)
  /** …and, quirk-faithfully, ANY explicit argument — `cyclic(true)`
    * included — yields needsWrapping=false in the reference. Mirrored
    * verbatim; the argument's value is deliberately ignored. */
  def cyclic(needsWrapping: Boolean): CyclicC = {
    val _ = needsWrapping
    new CyclicC(false)
  }

  /** toContract promotion (contract.impl.js:227-263): contract→itself,
    * one-element Seq→array, scalar→value. Object auto-promotion is
    * deliberately explicit-only, like the reference (README.md:828-834). */
  def from(v: Any): Contract = v match {
    case c: Contract => c
    case s: Seq[_] =>
      if (s.size != 1)
        throw new ContractLibraryError(
          s"array promotion requires exactly 1 element, got ${s.size}")
      ArrayC(from(s.head))
    case m: Map[_, _] =>
      ObjectC(ListMap(m.toSeq.map { case (k, c) => k.toString -> from(c) }: _*))
    case scalar => ValueC(scalar)
  }

  // common refinements
  def between(lo: Double, hi: Double): Contract =
    PredC(s"between(${Render.num(lo)}, ${Render.num(hi)})",
      c => c.isNotNull && c >= lo && c <= hi)
  def nonEmptyString: Contract =
    AndC(Seq(StringC, PredC("nonEmpty", c => c.isNotNull &&
      org.apache.spark.sql.functions.length(c) > 0)), silent = true)
}
