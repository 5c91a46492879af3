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
    * returned member is wrapped with input enforcement. Members whose
    * declared contract is not an object contract cannot bind rows and
    * are rejected at publish time (ContractLibraryError), not call
    * time. */
  def wrapAll(reg: ContractRegistry, idCol: String)
             (impl: Map[String, DataFrame => DataFrame])
      : Map[String, DataFrame => DataFrame] =
    reg.publish(impl).map { case (name, (fn, c)) =>
      val oc = c match {
        case o: ObjectC => o
        case other => throw new ContractLibraryError(
          s"publish enforcement requires an object contract for " +
            s"`$name`, got ${other.render}")
      }
      name -> { (df: DataFrame) =>
        fn(Validate.checkOrThrow(df, oc, idCol, name))
      }
    }
}
