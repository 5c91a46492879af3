package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in one compiled pass:
  * `array<struct<term string, tf bigint>>` with one entry per distinct
  * single-space-split token of `text` (first-occurrence order) and its
  * occurrence count — exactly the rows
  * `explode(split(text, ' ')) → groupBy(id, term) → count` produces
  * for that document.
  *
  * Why: the TF pass of [[graft.pipeline.TextAnalysis.tfidfTopK]]
  * shuffled the corpus's ENTIRE postings stream by (doc, term) just to
  * count within-document occurrences — but every row of that group-by
  * lives in ONE input row's token array, so the count is row-local by
  * construction (guide §2.4 "remove shuffles outright": the exchange
  * existed only because the composable form exploded first). Split
  * semantics match Spark's `split(text, ' ')` exactly (UTF8String
  * regex split, limit -1 — the [[NgramShingles]] precedent), so tf
  * values are bit-identical. Null text ⇒ null.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(TermCounts.entryType, false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"term_counts requires string, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TermCounts.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TermCounts.compute($t);")

  override protected def withNewChildInternal(
      newChild: Expression): TermCounts = copy(child = newChild)
}

object TermCounts {
  import org.apache.spark.sql.GraftColumnBridge._

  val entryType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false)))

  private val SpaceSep = UTF8String.fromString(" ")

  /** static so generated code can call it: one compiled walk per row. */
  def compute(text: UTF8String): ArrayData = {
    // same split as Spark SQL's split(text, ' '): regex, limit -1
    val toks = text.split(SpaceSep, -1)
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](
      math.max(8, toks.length * 2))
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val cur = counts.get(t)
      counts.put(t, if (cur == null) 1L else cur + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val row = new GenericInternalRow(2)
      row.update(0, e.getKey)
      row.update(1, e.getValue.longValue())
      out(j) = row.asInstanceOf[InternalRow]
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: distinct terms of `text` with their counts. */
  def termCounts(text: Column): Column =
    column(TermCounts(expression(text)))
}
