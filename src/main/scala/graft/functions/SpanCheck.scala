package graft.functions

import graft.contracts.{Compiler, Contract}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, InterpretedProjection, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd fast path for the flagship span-document check: validates
  * `spans ARRAY<STRUCT<kind,text,media_ref,offset>>` against the
  * interleaved text/media disjunctive contract
  * (`array(or(textSpan, mediaSpan))` + strictly-increasing offsets —
  * [[graft.engine.SpanDocs.contract]]) and returns the row's first
  * violation struct, or null when the row conforms.
  *
  * Why a custom Catalyst Expression: the generic compiler expresses
  * this check as nested higher-order functions, which Spark evaluates
  * interpreted (CodegenFallback, per-element boxing). This expression
  * generates a tight primitive loop over the ArrayData — the
  * "(b) custom Expression for whole-operator semantics" tier.
  *
  * Parity by construction: the HOT loop only decides pass/fail. On a
  * failing row (rare at production defect rates) evaluation DELEGATES
  * to `generic` — the UNCHANGED generic compiled first-violation
  * expression, carried as a serialized field and evaluated interpreted
  * over just that row — so paths/expected/got are bit-identical to the
  * generic plan (asserted by an equivalence test on defect-planted
  * data).
  *
  * The fast verdict is hard-wired to the flagship span shape
  * (kind/text/media_ref/offset in order, `media-[0-9]+` refs); callers
  * guard the rewrite and fall back to the generic path for any other
  * contract.
  */
case class SpanCheck(child: Expression, generic: Expression)
    extends UnaryExpression {

  override def dataType: DataType = Compiler.violType
  override def nullable: Boolean = true

  @transient private lazy val genericProj =
    new InterpretedProjection(Seq(generic))
  @transient private lazy val rowHolder = new GenericInternalRow(1)

  private def nFields: Int = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].length

  /** slow path: generic interpreted evaluation of the failing row —
    * byte-identical violation payloads, never in the hot loop. */
  def slowPath(arr: ArrayData): Any = {
    rowHolder.update(0, arr)
    val out = genericProj(rowHolder)
    if (out.isNullAt(0)) null
    else out.getStruct(0, Compiler.violType.length).copy()
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0; var prev = Int.MinValue; var ok = true
    val TEXT = SpanCheck.TEXT; val IMAGE = SpanCheck.IMAGE
    val AUDIO = SpanCheck.AUDIO; val VIDEO = SpanCheck.VIDEO
    while (i < n && ok) {
      if (arr.isNullAt(i)) ok = false
      else {
        val s = arr.getStruct(i, nFields)
        val kind = if (s.isNullAt(0)) null else s.getUTF8String(0)
        val text = if (s.isNullAt(1)) null else s.getUTF8String(1)
        val ref = if (s.isNullAt(2)) null else s.getUTF8String(2)
        val sOk =
          if (kind == null || s.isNullAt(3) || s.getInt(3) < 0) false
          else if (kind.equals(TEXT)) text != null && ref == null
          else if (kind.equals(IMAGE) || kind.equals(AUDIO) ||
            kind.equals(VIDEO))
            text == null && ref != null && SpanCheck.isMediaRef(ref)
          else false
        if (!sOk) ok = false
        else {
          val off = s.getInt(3)
          if (off <= prev) ok = false else prev = off
        }
      }
      i += 1
    }
    if (ok) null else slowPath(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("spanCheck", this,
      classOf[SpanCheck].getName)
    val text = ctx.addReferenceObj("utfText", SpanCheck.TEXT)
    val image = ctx.addReferenceObj("utfImage", SpanCheck.IMAGE)
    val audio = ctx.addReferenceObj("utfAudio", SpanCheck.AUDIO)
    val video = ctx.addReferenceObj("utfVideo", SpanCheck.VIDEO)
    val nf = nFields
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val ok = ctx.freshName("ok"); val prev = ctx.freshName("prev")
      val s = ctx.freshName("s"); val kind = ctx.freshName("kind")
      val txt = ctx.freshName("txt"); val ref = ctx.freshName("ref")
      val sOk = ctx.freshName("sOk"); val off = ctx.freshName("off")
      val r = ctx.freshName("r")
      s"""
         |final int $n = $arr.numElements();
         |boolean $ok = true;
         |int $prev = Integer.MIN_VALUE;
         |for (int $i = 0; $i < $n && $ok; $i++) {
         |  if ($arr.isNullAt($i)) { $ok = false; break; }
         |  InternalRow $s = $arr.getStruct($i, $nf);
         |  UTF8String $kind = $s.isNullAt(0) ? null : $s.getUTF8String(0);
         |  UTF8String $txt = $s.isNullAt(1) ? null : $s.getUTF8String(1);
         |  UTF8String $ref = $s.isNullAt(2) ? null : $s.getUTF8String(2);
         |  boolean $sOk;
         |  if ($kind == null || $s.isNullAt(3) || $s.getInt(3) < 0) {
         |    $sOk = false;
         |  } else if ($kind.equals($text)) {
         |    $sOk = $txt != null && $ref == null;
         |  } else if ($kind.equals($image) ||
         |      $kind.equals($audio) ||
         |      $kind.equals($video)) {
         |    $sOk = $txt == null && $ref != null &&
         |      graft.functions.SpanCheck.isMediaRef($ref);
         |  } else { $sOk = false; }
         |  if (!$sOk) { $ok = false; break; }
         |  int $off = $s.getInt(3);
         |  if ($off <= $prev) { $ok = false; break; }
         |  $prev = $off;
         |}
         |if ($ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object $r = $self.slowPath($arr);
         |  ${ev.isNull} = ($r == null);
         |  if (!${ev.isNull}) { ${ev.value} = (InternalRow) $r; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SpanCheck =
    copy(child = c)
}

object SpanCheck {
  private[functions] val TEXT = UTF8String.fromString("text")
  private[functions] val IMAGE = UTF8String.fromString("image")
  private[functions] val AUDIO = UTF8String.fromString("audio")
  private[functions] val VIDEO = UTF8String.fromString("video")

  /** `^media-[0-9]+$` decided on the UTF8 BYTES — exactly the regex's
    * verdict (the pattern is pure ASCII, and UTF-8 is bijective on
    * ASCII: any non-ASCII byte fails both forms), without the
    * per-span `toString` allocation + regex machinery the hot loop
    * paid per media span (round-6 flagship micro-opt; the fast loop
    * only decides pass/fail, so payloads are untouched). Public for
    * generated code. */
  def isMediaRef(s: UTF8String): Boolean = {
    val n = s.numBytes()
    if (n < 7) return false // "media-" + at least one digit
    if (s.getByte(0) != 'm' || s.getByte(1) != 'e' ||
        s.getByte(2) != 'd' || s.getByte(3) != 'i' ||
        s.getByte(4) != 'a' || s.getByte(5) != '-') return false
    var i = 6
    while (i < n) {
      val b = s.getByte(i)
      if (b < '0' || b > '9') return false
      i += 1
    }
    true
  }

  /** the span-array struct shape this fast path is compiled for. */
  def matches(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fs), _) =>
      fs.map(f => (f.name, f.dataType)).toSeq == Seq(
        ("kind", StringType), ("text", StringType),
        ("media_ref", StringType), ("offset", IntegerType))
    case _ => false
  }

  /** Column API: first violation of `spansContract` over the spans
    * column of `df`, fast-verdict loop + generic slow path.
    * `spansContract` must be the flagship contract for results to agree
    * — asserted by the [[graft.engine.SpanDocs]] equivalence test.
    *
    * The generic slow-path expression is resolved through a probe
    * projection on `df` (Column-API trees are unresolved ColumnNodes;
    * the `generic` field bypasses analysis, so it must be bound here)
    * and then re-bound to slot 0 of the single-value row the slow path
    * evaluates. */
  def check(df: org.apache.spark.sql.DataFrame, spansCol: String,
            spansContract: Contract, thing: String = "docs")
           (implicit env: graft.contracts.MsgEnv): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.lit
    val dt = df.schema(spansCol).dataType
    require(matches(dt), "SpanCheck fast path requires the span shape")
    // same frame the row-level compile would push for this field, so
    // slow-path payloads are bit-identical to the generic plan
    val frame = graft.contracts.Frame.field(
      graft.contracts.Frame.root, spansCol)
    val genericCol = Compiler.firstViol(spansContract, dt,
      org.apache.spark.sql.functions.col(spansCol), frame)
    val analyzed = df.select(genericCol.as("__gv__"))
      .queryExecution.analyzed
    val resolved = analyzed.asInstanceOf[Project].projectList.head match {
      case a: Alias => a.child
      case other => other
    }
    val bound = resolved.transform {
      case ar: AttributeReference if ar.name == spansCol =>
        BoundReference(0, dt, nullable = true)
    }.transformUp {
      // interpreted eval can't see RuntimeReplaceable (normally rewritten
      // by the optimizer's ReplaceExpressions — we bypass the optimizer)
      case rr: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
        => rr.replacement
    }
    GraftColumnBridge.column(SpanCheck(
      GraftColumnBridge.expression(
        org.apache.spark.sql.functions.col(spansCol)), bound))
  }
}
