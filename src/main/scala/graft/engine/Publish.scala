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
      : Map[String, DataFrame => DataFrame] =
    reg.publish(impl).map { case (name, (fn, c)) =>
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
      // `c.fun({ arg: ... } -> ...)`), else the input contract alone
      val fnRepr = retC match {
        case Some(r) => s"c.fun({ df: ${inC.render} } -> ${r.render})"
        case None => inC.render
      }
      name -> { (df: DataFrame) =>
        val out = fn(Validate.checkMemberOrThrow(df, inC, idCol, name,
          fnRepr, isResult = false))
        retC match {
          case Some(r) => Validate.checkMemberOrThrow(out, r, idCol,
            name, fnRepr, isResult = true)
          case None => out
        }
      }
    }
}
