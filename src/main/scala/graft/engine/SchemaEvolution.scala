package graft.engine

import org.apache.spark.sql.types._

/** Iceberg-analog schema-evolution audit for the validation runner.
  *
  * Iceberg tables evolve in place: columns are added (old files read
  * null), numeric types widen, and — breaking for any consumer pinned
  * to the old shape — columns get dropped or retyped. The emulated
  * lake here is a parquet directory, so the runner reproduces the same
  * read semantics with `mergeSchema` and uses this module to classify
  * what changed between the last validated snapshot's schema and the
  * current one:
  *
  *   - `Added`   — new column/field anywhere in the tree. SAFE: the
  *     non-strict object contract ignores extras (same semantics the
  *     reference's object contract has for undeclared keys,
  *     /root/reference/src/contract.impl.js:503-533) and old files
  *     read null.
  *   - `Retyped` with a lossless numeric widening (int→bigint,
  *     float→double, …). SAFE: Iceberg itself performs these in place.
  *   - `Removed`, or any other `Retyped`. BREAKING: a contract that
  *     names the field would either fail compilation or silently gate
  *     every row — at 10¹² rows that must fail in seconds with the
  *     exact path, not after a cluster-day of violation writes.
  *
  * The diff is purely structural (names + types, order-insensitive) so
  * it is O(schema), never O(data).
  */
object SchemaEvolution {

  sealed trait Kind { def label: String }
  case object Added   extends Kind { val label = "added"   }
  case object Removed extends Kind { val label = "removed" }
  case object Retyped extends Kind { val label = "retyped" }

  /** one changed node; `path` uses `[]` for array elements and `{key}`/
    * `{}` for map keys/values, matching the violation-frame notation. */
  final case class Change(path: String, kind: Kind,
                          prevType: Option[String],
                          curType: Option[String]) {
    /** true for the changes Iceberg performs as in-place evolution. */
    def safe: Boolean = kind match {
      case Added   => true
      case Removed => false
      case Retyped => (prevType, curType) match {
        case (Some(p), Some(c)) => widenings((p, c))
        case _                  => false
      }
    }
    def describe: String = kind match {
      case Added   => s"$path: added (${curType.get})"
      case Removed => s"$path: removed (was ${prevType.get})"
      case Retyped => s"$path: retyped ${prevType.get} -> ${curType.get}"
    }
  }

  /** lossless numeric widenings (Iceberg's legal type promotions). */
  private val widenings: Set[(String, String)] = {
    val ints = Seq("tinyint", "smallint", "int", "bigint")
    val intPairs = for {
      (n, i) <- ints.zipWithIndex; w <- ints.drop(i + 1)
    } yield (n, w)
    intPairs.toSet + (("float", "double"))
  }

  private def tn(dt: DataType): String = dt.sql.toLowerCase

  /** structural diff prev→cur, recursing through structs, array
    * elements and map keys/values. Field order changes are NOT drift
    * (Iceberg columns are id-addressed; Spark resolves by name). */
  def diff(prev: StructType, cur: StructType,
           prefix: String = ""): Seq[Change] = {
    val pf = prev.fields.map(f => f.name -> f).toMap
    val cf = cur.fields.map(f => f.name -> f).toMap
    val names =
      prev.fields.map(_.name).toSeq ++
        cur.fields.map(_.name).filterNot(pf.contains)
    names.flatMap { n =>
      val path = if (prefix.isEmpty) n else s"$prefix.$n"
      (pf.get(n), cf.get(n)) match {
        case (None, Some(c))    => Seq(Change(path, Added, None, Some(tn(c.dataType))))
        case (Some(p), None)    => Seq(Change(path, Removed, Some(tn(p.dataType)), None))
        case (Some(p), Some(c)) => diffType(p.dataType, c.dataType, path)
        case _                  => Nil
      }
    }
  }

  private def diffType(p: DataType, c: DataType,
                       path: String): Seq[Change] = (p, c) match {
    case (ps: StructType, cs: StructType) => diff(ps, cs, path)
    case (ArrayType(pe, _), ArrayType(ce, _)) =>
      diffType(pe, ce, s"$path[]")
    case (MapType(pk, pv, _), MapType(ck, cv, _)) =>
      diffType(pk, ck, s"$path{key}") ++ diffType(pv, cv, s"$path{}")
    case _ if tn(p) == tn(c) => Nil
    case _ => Seq(Change(path, Retyped, Some(tn(p)), Some(tn(c))))
  }

  /** thrown by the runner before ANY partition starts when the current
    * snapshot's schema drifted breakingly from the last validated one. */
  final case class SchemaDriftError(breaking: Seq[Change],
                                    all: Seq[Change])
      extends RuntimeException(
        "breaking schema drift vs last validated snapshot: " +
          breaking.map(_.describe).mkString("; ") +
          (if (all.size > breaking.size)
             s" (plus ${all.size - breaking.size} safe change(s))"
           else ""))
}
