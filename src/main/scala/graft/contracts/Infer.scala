package graft.contracts

import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Contract inference — the `fromExample` / `quacksLike` surface
  * (contract.impl.js:737-768, :367-370) plus the Spark-native variant:
  * inference from a `StructType` schema (the engine's analog of
  * inferring from a sample value, since Spark rows carry schemas).
  */
object Infer {

  /** infer a contract from an example value (fromExample,
    * contract.impl.js:737-768): array → array(fromExample(head)),
    * map → object field-wise, scalars → type contracts. Keys prefixed
    * `?` become optional fields when `withQuestionMark` (:744-748). */
  def fromExample(v: Any, withQuestionMark: Boolean = false): Contract =
    v match {
      case null => AnyC
      case _: String => StringC
      case _: Int | _: Long | _: Short | _: Byte | _: Double | _: Float |
          _: BigDecimal => NumberC
      case _: Boolean => BoolC
      case _: java.sql.Timestamp | _: java.sql.Date |
          _: java.time.Instant | _: java.time.LocalDate => DateC
      case s: Seq[_] =>
        if (s.isEmpty)
          throw new ContractLibraryError(
            "fromExample requires a non-empty array example")
        ArrayC(fromExample(s.head, withQuestionMark))
      case m: Map[_, _] =>
        val fields = m.toSeq.map { case (k0, fv) =>
          val k = k0.toString
          if (withQuestionMark && k.startsWith("?"))
            k.drop(1) -> OptionalC(fromExample(fv, withQuestionMark))
          else k -> fromExample(fv, withQuestionMark)
        }
        ObjectC(ListMap(fields: _*))
      case other =>
        throw new ContractLibraryError(
          s"fromExample: unsupported example ${other.getClass.getName}")
    }

  /** structural typing from an example — quacksLike
    * (contract.impl.js:367-370): the inferred object contract, extras
    * allowed (non-strict), applied as a conformance check. */
  def quacksLike(example: Map[String, Any]): Contract =
    fromExample(example)

  /** Spark-native inference: a schema IS a sample shape. nullable
    * fields → optional; nested structs/arrays/maps recurse. Useful as
    * the starting point a user then refines with enums/preds. */
  def fromSchema(st: StructType): ObjectC =
    ObjectC(ListMap(st.fields.map { f =>
      val c = fromDataType(f.dataType)
      f.name -> (if (f.nullable) OptionalC(c) else c)
    }.toIndexedSeq: _*))

  def fromDataType(dt: DataType): Contract = dt match {
    case StringType => StringC
    case ByteType | ShortType | IntegerType | LongType => IntegerC
    case FloatType | DoubleType => NumberC
    case _: DecimalType => NumberC
    case BooleanType => BoolC
    case DateType | TimestampType | TimestampNTZType => DateC
    case ArrayType(et, containsNull) =>
      val e = fromDataType(et)
      ArrayC(if (containsNull) OptionalC(e) else e)
    case MapType(_, vt, valueContainsNull) =>
      val e = fromDataType(vt)
      HashC(if (valueContainsNull) OptionalC(e) else e)
    case st: StructType => fromSchema(st)
    case _ => AnyC
  }
}
