package graft.engine

import graft.contracts._
import org.apache.spark.sql.DataFrame

/** Call-time contract enforcement for published modules — the data-plane
  * analog of the reference's wrapped `publish` (contract.impl.js:824-846
  * binds declared contracts to implementations; the function-contract
  * wrapper then guards every call at the module boundary,
  * function-contracts.js). Here a "module member" is a Dataset
  * transform; wrapping it fail-fast checks its INPUT against the
  * member's declared contract (checkOrThrow, reference-format message)
  * before the member runs — so a misuse is blamed on the caller at the
  * boundary, like the reference's blame assignment. */
object Publish {

  /** every declared contract must be implemented
    * (contract.impl.js:830-835 — via registry.publish), and every
    * returned member is wrapped with BOTH halves of the reference's
    * function-contract enforcement: the INPUT frame is checked before
    * the member runs (caller blame — "broke the contract on `m()`:"),
    * and when the registry declares `.returns` the member's RESULT
    * frame is checked after (callee blame — "`m()` broke its
    * contract:", '.result' frames; function-contracts.js:146-152 checks
    * the result without reversing blame). Members whose declared
    * contracts are not object contracts cannot bind rows and are
    * rejected at publish time (ContractLibraryError), not call time. */
  def wrapAll(reg: ContractRegistry, idCol: String)
             (impl: Map[String, DataFrame => DataFrame])
      : Map[String, DataFrame => DataFrame] = {
    // completeness is enforced over the registry's SINGLE-INPUT members
    // only: a mixed registry publishes its multi-input members through
    // [[wrapAllMulti]] (which enforces completeness over those), so the
    // two calls together cover every declared name
    val singleNames = reg.names.filter(reg.inputsOf(_).isEmpty)
    singleNames.find(!impl.contains(_)).foreach { missing =>
      throw new ContractLibraryError(
        s"publish: no implementation for declared contract `$missing`")
    }
    impl.keys.foreach { k =>
      // a multi-input member's Entry.contract is only its FIRST input;
      // wrapping it single-input would silently skip the rest of the
      // window — reject at publish time, route through wrapAllMulti
      if (reg.inputsOf(k).nonEmpty)
        throw new ContractLibraryError(
          s"`$k` declares ${reg.inputsOf(k).size} inputs — " +
            "publish it through wrapAllMulti, not wrapAll")
    }
    singleNames.map { name =>
      val fn = impl(name)
      val c = reg.contractOf(name).get
      def asObject(cc: Contract, side: String): ObjectC = cc match {
        case o: ObjectC => o
        case other => throw new ContractLibraryError(
          s"publish enforcement requires an object contract for the " +
            s"$side of `$name`, got ${other.render}")
      }
      val inC = asObject(c, "input")
      val retC = reg.returnsOf(name).map(asObject(_, "result"))
      // `in contract:` rendering: the function-contract form when a
      // result contract exists (the reference renders
      // `c.fun({ arg: ... } -> ...)`), else the input contract alone —
      // one source of truth with the docs (Registry.renderOf)
      val fnRepr = reg.renderOf(name)
      name -> { (df: DataFrame) =>
        val out = fn(Validate.checkMemberOrThrow(df, inC, idCol, name,
          fnRepr, isResult = false))
        retC match {
          case Some(r) => Validate.checkMemberOrThrow(out, r, idCol,
            name, fnRepr, isResult = true)
          case None => out
        }
      }
    }.toMap
  }

  /** the `in contract:` rendering of a registered multi-input member —
    * the reference's function-contract toString (captured goldens
    * arity_obj_arg_field, arity_extra_obj_field, fun_named_arg_field,
    * method_render, fn_thisarg_render): positional
    * `c.fn(argC, … -> resultC)`, named `c.fun({ name: argC }, … ->
    * resultC)`, method `c.method(…)`; a declared receiver renders as
    * the `this: <c>, ` prefix (function-contracts.js:362, :420);
    * result defaults to c.any(); extras render in the reference's
    * `...c.array(perItemC)` form. */
  def fnRepr(reg: ContractRegistry, name: String): String =
    reg.renderOf(name)

  /** MULTI-INPUT member enforcement — the data-plane analog of the
    * reference's `c.fn(argC…)` arity window (function-contracts.js:
    * 28-67): each call supplies a Seq of input frames; the count is
    * checked against the declared required/optional window (exact count
    * when no optionals and no extras), each supplied input is checked
    * against its positional contract under the `.arg(i)` frame, extras
    * against the `extraInputs` contract under the extra-argument frame,
    * and a declared `.returns` checks the result. Count and input
    * failures blame the CALLER; result failures blame the member.
    * Message text matches output captured by executing the reference
    * (minus its "(contract was wrapped at: file:line)" JS-stack line).
    * Members of `reg` declared via plain `register` are ignored here —
    * they are single-input and wrap through [[wrapAll]]. */
  def wrapAllMulti(reg: ContractRegistry, idCol: String)
                  (impl: Map[String, Seq[DataFrame] => DataFrame])
      : Map[String, Seq[DataFrame] => DataFrame] = {
    val multiNames = reg.names.filter(reg.inputsOf(_).nonEmpty)
    multiNames.find(!impl.contains(_)).foreach { missing =>
      throw new ContractLibraryError(
        s"publish: no implementation for declared contract `$missing`")
    }
    impl.keys.find(!multiNames.contains(_)).foreach { unknown =>
      throw new ContractLibraryError(
        s"publish: `$unknown` is not a declared multi-input contract")
    }
    multiNames.map { name =>
      val declared = reg.inputsOf(name)
      def unwrap(c: Contract): Contract = c match {
        case OptionalC(inner) => inner
        case other => other
      }
      def asObject(cc: Contract, side: String): ObjectC =
        unwrap(cc) match {
          case o: ObjectC => o
          case other => throw new ContractLibraryError(
            s"publish enforcement requires an object contract for the " +
              s"$side of `$name`, got ${other.render}")
        }
      val inCs = declared.zipWithIndex.map { case (c, i) =>
        (asObject(c, s"input $i"), c.isInstanceOf[OptionalC])
      }
      val extraC = reg.extraOf(name).map(asObject(_, "extra inputs"))
      val retC = reg.returnsOf(name).map(asObject(_, "result"))
      // receiver contract (thisArg / method, function-contracts.js:
      // 166-171, :437-451): the call's FIRST frame is the receiver,
      // checked under `.this`; the argument window applies to the rest
      val thisC = reg.thisOf(name).map(asObject(_, "this"))
      val nReq = inCs.count(!_._2)
      val nDecl = inCs.size
      val inNames = reg.inputNamesOf(name)
      val fnRepr = Publish.fnRepr(reg, name)
      val blame = s"broke the contract on `$name()`:"
      val fn = impl(name)
      name -> { (dfs0: Seq[DataFrame]) =>
        // the receiver frame is supplied first, but the COUNT check runs
        // before the receiver check — the reference's wrapper calls
        // checkOptionalArgumentCount before it checks `this`
        // (function-contracts.js:94-101 vs :115-120), so a call that is
        // both mis-counted and mis-received reports the count error
        val dfs = thisC match {
          case Some(_) =>
            if (dfs0.isEmpty) throw new ContractLibraryError(
              s"`$name` declares a this-contract: the call must " +
                "supply the receiver frame first")
            dfs0.tail
          case None => dfs0
        }
        val m = dfs.size
        // checkOptionalArgumentCount, function-contracts.js:28-67 —
        // message text byte-matches the executed reference
        def countFail(msg: String): Nothing =
          throw new ContractViolationException(s"$blame $msg\n", null,
            null)
        if (nReq == nDecl && extraC.isEmpty) {
          if (m != nReq) countFail(
            s"Wrong number of arguments, expected $nReq but got $m")
        } else if (m < nReq) countFail(
          s"Too few arguments, expected at least $nReq but got $m")
        else if (extraC.isEmpty && m > nDecl) countFail(
          s"Too many arguments, expected at most $nDecl but got $m")
        val recv = thisC match {
          case Some(tc) =>
            Seq(Validate.checkMemberOrThrow(dfs0.head, tc, idCol,
              name, fnRepr, isResult = false, thisFrame = true))
          case None => Nil
        }
        val checked = dfs.zipWithIndex.map { case (df, i) =>
          if (i < nDecl)
            Validate.checkMemberOrThrow(df, inCs(i)._1, idCol, name,
              fnRepr, isResult = false, argFrame = Some((i, false)),
              argName = inNames.lift(i))
          else
            Validate.checkMemberOrThrow(df, extraC.get, idCol, name,
              fnRepr, isResult = false,
              argFrame = Some((i - nDecl, true)))
        }
        val out = fn(recv ++ checked)
        retC match {
          case Some(r) => Validate.checkMemberOrThrow(out, r, idCol,
            name, fnRepr, isResult = true)
          case None => out
        }
      }
    }.toMap
  }
}
