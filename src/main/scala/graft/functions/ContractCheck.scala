package graft.functions

import graft.contracts.{Compiler, Contract, Frame, MsgEnv, ObjectC}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, InterpretedProjection, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** Codegen'd first-violation check for an ARBITRARY contract — the
  * generalization of the round-1 flagship-only SpanCheck fast path to
  * every contract/schema pair.
  *
  * Two halves, parity by construction:
  *  - the HOT loop only decides pass/fail: `plan` (a
  *    [[graft.functions.VNode]] verdict program from
  *    [[VerdictCompiler]]) compiles to straight-line Java — primitive
  *    loops over ArrayData/InternalRow for shapes, inlined generated
  *    code for scalar leaf conditions (bound through
  *    `ctx.currentVars`), and an embedded interpreted eval only for
  *    leaves whose condition contains CodegenFallback subtrees.
  *  - on a FAILING row (rare at production defect rates) evaluation
  *    DELEGATES to `generic` — the UNCHANGED generic compiled
  *    first-violation expression, carried bound to slot 0 and evaluated
  *    interpreted over just that row — so paths/expected/got/ctx are
  *    bit-identical to the generic plan (asserted by the
  *    fast-vs-generic property suite).
  *
  * `child` is never null at the call sites (a `struct(*)` of the row,
  * or a required-guarded column); a null child short-circuits to null
  * (= pass) via the UnaryExpression default.
  */
case class ContractCheck(child: Expression, plan: VNode,
                         generic: Expression) extends UnaryExpression {

  override def dataType: DataType = Compiler.violType
  override def nullable: Boolean = true

  @transient private lazy val genericProj =
    new InterpretedProjection(Seq(generic))
  @transient private lazy val rowHolder = new GenericInternalRow(1)
  @transient private lazy val slotHolder = new GenericInternalRow(1)

  /** all Leaf/Fallback conditions in traversal order — the stable
    * index space for interpreted eval and fallback dispatch. */
  @transient private lazy val leafIndex: Map[VNode, Int] = {
    val buf = scala.collection.mutable.LinkedHashMap.empty[VNode, Int]
    def walk(v: VNode): Unit = v match {
      case l: VNode.Leaf => buf.getOrElseUpdate(l, buf.size)
      case f: VNode.Fallback => buf.getOrElseUpdate(f, buf.size)
      case rf: VNode.RowFallback => buf.getOrElseUpdate(rf, buf.size)
      case VNode.Opt(i) => walk(i)
      case VNode.AndN(is) => is.foreach(walk)
      case VNode.OrN(is) => is.foreach(walk)
      case VNode.Arr(e, _) => walk(e)
      case VNode.TupArr(is, _, _) => is.foreach(walk)
      case VNode.TupStruct(is) => is.foreach(x => walk(x._1))
      case VNode.MapVals(v, _) => walk(v) // was missing: a map-value
      // leaf with no structurally-equal twin elsewhere in the plan had
      // no index at all (latent NoSuchElement in eval + codegen dispatch)
      case VNode.Obj(fs) => fs.foreach(f => walk(f.inner))
      case VNode.Field(_, _, _, i) => walk(i)
      case _ => ()
    }
    walk(plan)
    buf.toMap
  }
  @transient private lazy val leafExprs: IndexedSeq[Expression] =
    leafIndex.toSeq.sortBy(_._2).map {
      case (VNode.Leaf(e), _) => e
      case (VNode.Fallback(e), _) => e
      case (VNode.RowFallback(e), _) => e
      case _ => throw new IllegalStateException("unreachable")
    }.toIndexedSeq

  /** interpreted FAIL evaluation of leaf condition `i` over `value` —
    * also the runtime hook the generated code calls for Fallback
    * leaves. Must be public for codegen access. */
  def leafFails(i: Int, value: Any): Boolean = {
    slotHolder.update(0, value)
    leafExprs(i).eval(slotHolder) == true
  }

  /** slow path: generic interpreted evaluation of the failing row —
    * byte-identical violation payloads, never in the hot loop. */
  def slowPath(value: Any): Any = {
    rowHolder.update(0, value)
    val out = genericProj(rowHolder)
    if (out.isNullAt(0)) null
    else out.getStruct(0, Compiler.violType.length).copy()
  }

  // -------------------------------------------------------------------
  // interpreted verdict (used when the surrounding plan is not
  // code-generated) — same semantics as the generated loop
  // -------------------------------------------------------------------

  private def verdict(v: VNode, value: Any, dt: DataType,
                      root: Any): Boolean =
    v match {
      case VNode.PassAlways => true
      case VNode.FailAlways => false
      case l: VNode.Leaf => !leafFails(leafIndex(l), value)
      case f: VNode.Fallback => !leafFails(leafIndex(f), value)
      case rf: VNode.RowFallback => !leafFails(leafIndex(rf), root)
      case VNode.Opt(inner) =>
        value == null || verdict(inner, value, dt, root)
      case VNode.AndN(items) => items.forall(verdict(_, value, dt, root))
      case VNode.OrN(items) => items.exists(verdict(_, value, dt, root))
      case VNode.Arr(elem, et) =>
        if (value == null) false
        else {
          val arr = value.asInstanceOf[ArrayData]
          val n = arr.numElements()
          var i = 0; var ok = true
          while (i < n && ok) {
            val e = if (arr.isNullAt(i)) null else arr.get(i, et)
            ok = verdict(elem, e, et, root)
            i += 1
          }
          ok
        }
      case VNode.TupArr(items, et, strict) =>
        if (value == null) false
        else {
          val arr = value.asInstanceOf[ArrayData]
          val n = arr.numElements()
          if (n < items.size) false
          else if (strict && n > items.size) false
          else items.zipWithIndex.forall { case (item, i) =>
            val e = if (arr.isNullAt(i)) null else arr.get(i, et)
            verdict(item, e, et, root)
          }
        }
      case VNode.TupStruct(items) =>
        if (value == null) false
        else {
          val row = value.asInstanceOf[InternalRow]
          items.zipWithIndex.forall { case ((item, fdt), i) =>
            val e = if (row.isNullAt(i)) null else row.get(i, fdt)
            verdict(item, e, fdt, root)
          }
        }
      case VNode.Obj(fields) =>
        if (value == null) false
        else {
          val row = value.asInstanceOf[InternalRow]
          fields.forall { f =>
            if (f.ordinal < 0) // row-scoped (cross-field) field check
              verdict(f.inner, null, f.dt, root)
            else {
              val isNull = row.isNullAt(f.ordinal)
              if (isNull) f.optional
              else verdict(f.inner, row.get(f.ordinal, f.dt), f.dt, root)
            }
          }
        }
      case f: VNode.Field => throw new IllegalStateException(
        "Field is only reachable through Obj")
      case VNode.MapVals(valueNode, vt) =>
        if (value == null) false
        else {
          val m = value.asInstanceOf[MapData]
          val vals = m.valueArray()
          val n = vals.numElements()
          var i = 0; var ok = true
          while (i < n && ok) {
            val e = if (vals.isNullAt(i)) null else vals.get(i, vt)
            ok = verdict(valueNode, e, vt, root)
            i += 1
          }
          ok
        }
    }

  override def nullSafeEval(input: Any): Any =
    if (verdict(plan, input, child.dataType, input)) null
    else slowPath(input)

  // -------------------------------------------------------------------
  // code generation
  // -------------------------------------------------------------------

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("contractCheck", this,
      classOf[ContractCheck].getName)
    nullSafeCodeGen(ctx, ev, input => {
      val pass = ctx.freshName("pass")
      val body = emitNode(ctx, self, plan, input, "false",
        child.dataType, pass, input)
      val r = ctx.freshName("r")
      s"""
         |boolean $pass;
         |$body
         |if ($pass) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object $r = $self.slowPath($input);
         |  ${ev.isNull} = ($r == null);
         |  if (!${ev.isNull}) { ${ev.value} = (InternalRow) $r; }
         |}
       """.stripMargin
    })
  }

  /** leaves under a node — the code-size proxy for method splitting. */
  private def leafCount(v: VNode): Int = v match {
    case _: VNode.Leaf | _: VNode.Fallback | _: VNode.RowFallback => 1
    case VNode.Opt(i) => leafCount(i)
    case VNode.AndN(is) => is.map(leafCount).sum
    case VNode.OrN(is) => is.map(leafCount).sum
    case VNode.Arr(e, _) => leafCount(e)
    case VNode.TupArr(is, _, _) => is.map(leafCount).sum
    case VNode.TupStruct(is) => is.map(x => leafCount(x._1)).sum
    case VNode.MapVals(m, _) => leafCount(m)
    case VNode.Obj(fs) => fs.map(f => leafCount(f.inner)).sum
    case VNode.Field(_, _, _, i) => leafCount(i)
    case _ => 0
  }

  /** leaves per generated method before hoisting a subtree into its own
    * function: whole-stage codegen cannot split ONE expression's code
    * (no INPUT_ROW), so past this many leaves we do it ourselves via
    * ctx.addNewFunction — each composite node above the threshold
    * becomes `private boolean check_N(<jt> v, boolean vNull,
    * InternalRow root)`, recursively, so method size stays bounded for
    * arbitrarily large contracts (the round-2 build fell back to the
    * interpreted generic compile past 300 leaves instead). */
  private val SplitLeafThreshold = 40

  /** recursion entry: inline small nodes, hoist big composite ones. */
  private def emitNode(ctx: CodegenContext, self: String, v: VNode,
                       valueVar: String, isNullCode: String, dt: DataType,
                       res: String, rootVar: String): String = v match {
    case _: VNode.AndN | _: VNode.OrN | _: VNode.Obj | _: VNode.Arr |
         _: VNode.TupArr | _: VNode.TupStruct | _: VNode.MapVals |
         _: VNode.Opt if leafCount(v) > SplitLeafThreshold =>
      val vParam = ctx.freshName("v")
      val nParam = ctx.freshName("vNull")
      val rootParam = ctx.freshName("root")
      val fnRes = ctx.freshName("res")
      val name = ctx.freshName("checkNode")
      val body = emit(ctx, self, v, vParam, nParam, dt, fnRes, rootParam)
      val jt = CodeGenerator.javaType(dt)
      val fnName = ctx.addNewFunction(name,
        s"""
           |private boolean $name($jt $vParam, boolean $nParam,
           |    InternalRow $rootParam) {
           |  boolean $fnRes;
           |  $body
           |  return $fnRes;
           |}
         """.stripMargin)
      s"$res = $fnName($valueVar, ($isNullCode), $rootVar);"
    case _ => emit(ctx, self, v, valueVar, isNullCode, dt, res, rootVar)
  }

  /** emit Java assigning `res = <value passes v>`. `valueVar` holds the
    * (possibly primitive) value, `isNullCode` a boolean expression that
    * is true when the value is null. */
  private def emit(ctx: CodegenContext, self: String, v: VNode,
                   valueVar: String, isNullCode: String, dt: DataType,
                   res: String, rootVar: String): String = v match {
    case VNode.PassAlways => s"$res = true;"
    case VNode.FailAlways => s"$res = false;"

    case l: VNode.Leaf =>
      // bind the leaf condition's BoundReference(0) to the local value
      // via currentVars — the same mechanism whole-stage codegen uses
      val isNullVar = ctx.freshName("vNull")
      val saved = ctx.currentVars
      val savedRow = ctx.INPUT_ROW
      ctx.currentVars = Seq(ExprCode(
        JavaCode.isNullVariable(isNullVar),
        JavaCode.variable(valueVar, dt)))
      ctx.INPUT_ROW = null
      val ec = try l.fail.genCode(ctx)
      finally { ctx.currentVars = saved; ctx.INPUT_ROW = savedRow }
      s"""
         |boolean $isNullVar = $isNullCode;
         |${ec.code}
         |$res = !(!${ec.isNull} && ${ec.value});
       """.stripMargin

    case f: VNode.Fallback =>
      val idx = leafIndex(f)
      val boxed = s"(($isNullCode) ? null : " +
        s"(Object) ${CodeGenerator.boxedType(dt)}.valueOf($valueVar))"
      // boxedType.valueOf works for primitives; object types pass as-is
      val arg =
        if (CodeGenerator.isPrimitiveType(dt)) boxed
        else s"(($isNullCode) ? null : (Object) $valueVar)"
      s"$res = !$self.leafFails($idx, $arg);"

    case rf: VNode.RowFallback =>
      val idx = leafIndex(rf)
      s"$res = !$self.leafFails($idx, (Object) $rootVar);"

    case VNode.Opt(inner) =>
      val innerRes = ctx.freshName("optRes")
      s"""
         |boolean $innerRes = true;
         |if (!($isNullCode)) {
         |  ${emitNode(ctx, self, inner, valueVar, "false", dt, innerRes,
                   rootVar)}
         |}
         |$res = $innerRes;
       """.stripMargin

    case VNode.AndN(items) =>
      val parts = items.map { item =>
        val r = ctx.freshName("andRes")
        val code = emitNode(ctx, self, item, valueVar, isNullCode, dt, r,
          rootVar)
        s"""
           |if ($res) {
           |  boolean $r;
           |  $code
           |  $res = $r;
           |}
         """.stripMargin
      }
      s"$res = true;\n${parts.mkString("\n")}"

    case VNode.OrN(items) =>
      val parts = items.map { item =>
        val r = ctx.freshName("orRes")
        val code = emitNode(ctx, self, item, valueVar, isNullCode, dt, r,
          rootVar)
        s"""
           |if (!$res) {
           |  boolean $r;
           |  $code
           |  $res = $r;
           |}
         """.stripMargin
      }
      s"$res = false;\n${parts.mkString("\n")}"

    case VNode.Arr(elem, et) =>
      val arr = ctx.freshName("arr"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val eNull = ctx.freshName("eNull")
      val eVal = ctx.freshName("eVal"); val er = ctx.freshName("elemRes")
      val jt = CodeGenerator.javaType(et)
      s"""
         |if ($isNullCode) { $res = false; } else {
         |  ArrayData $arr = $valueVar;
         |  final int $n = $arr.numElements();
         |  $res = true;
         |  for (int $i = 0; $i < $n && $res; $i++) {
         |    boolean $eNull = $arr.isNullAt($i);
         |    $jt $eVal = $eNull ? ${CodeGenerator.defaultValue(et)}
         |      : ${CodeGenerator.getValue(arr, et, i)};
         |    boolean $er;
         |    ${emitNode(ctx, self, elem, eVal, eNull, et, er, rootVar)}
         |    $res = $er;
         |  }
         |}
       """.stripMargin

    case VNode.TupArr(items, et, strict) =>
      val arr = ctx.freshName("arr"); val n = ctx.freshName("n")
      val jt = CodeGenerator.javaType(et)
      val strictGate =
        if (strict) s"else if ($n > ${items.size}) { $res = false; }"
        else ""
      val positions = items.zipWithIndex.map { case (item, i) =>
        val eNull = ctx.freshName("eNull")
        val eVal = ctx.freshName("eVal"); val er = ctx.freshName("posRes")
        s"""
           |if ($res) {
           |  boolean $eNull = $arr.isNullAt($i);
           |  $jt $eVal = $eNull ? ${CodeGenerator.defaultValue(et)}
           |    : ${CodeGenerator.getValue(arr, et, i.toString)};
           |  boolean $er;
           |  ${emitNode(ctx, self, item, eVal, eNull, et, er, rootVar)}
           |  $res = $er;
           |}
         """.stripMargin
      }.mkString("\n")
      s"""
         |if ($isNullCode) { $res = false; } else {
         |  ArrayData $arr = $valueVar;
         |  final int $n = $arr.numElements();
         |  if ($n < ${items.size}) { $res = false; }
         |  $strictGate
         |  else {
         |    $res = true;
         |    $positions
         |  }
         |}
       """.stripMargin

    case VNode.TupStruct(items) =>
      val row = ctx.freshName("row")
      val positions = items.zipWithIndex.map { case ((item, fdt), i) =>
        val eNull = ctx.freshName("posNull")
        val eVal = ctx.freshName("posVal")
        val er = ctx.freshName("posRes")
        val jt = CodeGenerator.javaType(fdt)
        s"""
           |if ($res) {
           |  boolean $eNull = $row.isNullAt($i);
           |  $jt $eVal = $eNull ? ${CodeGenerator.defaultValue(fdt)}
           |    : ${CodeGenerator.getValue(row, fdt, i.toString)};
           |  boolean $er;
           |  ${emitNode(ctx, self, item, eVal, eNull, fdt, er, rootVar)}
           |  $res = $er;
           |}
         """.stripMargin
      }.mkString("\n")
      s"""
         |if ($isNullCode) { $res = false; } else {
         |  InternalRow $row = $valueVar;
         |  $res = true;
         |  $positions
         |}
       """.stripMargin

    case VNode.Obj(fields) =>
      val row = ctx.freshName("row")
      val checks = fields.map { f =>
        if (f.ordinal < 0) {
          // row-scoped (cross-field) field check
          val fr = ctx.freshName("rowFldRes")
          s"""
             |if ($res) {
             |  boolean $fr;
             |  ${emitNode(ctx, self, f.inner, valueVar, "false", f.dt, fr,
                       rootVar)}
             |  $res = $fr;
             |}
           """.stripMargin
        } else {
        val fNull = ctx.freshName("fNull")
        val fVal = ctx.freshName("fVal"); val fr = ctx.freshName("fldRes")
        val jt = CodeGenerator.javaType(f.dt)
        val nullCase =
          if (f.optional) "/* optional: null passes */"
          else s"$res = false;"
        s"""
           |if ($res) {
           |  boolean $fNull = $row.isNullAt(${f.ordinal});
           |  if ($fNull) { $nullCase } else {
           |    $jt $fVal =
           |      ${CodeGenerator.getValue(row, f.dt, f.ordinal.toString)};
           |    boolean $fr;
           |    ${emitNode(ctx, self, f.inner, fVal, "false", f.dt, fr,
                       rootVar)}
           |    $res = $fr;
           |  }
           |}
         """.stripMargin
        }
      }.mkString("\n")
      s"""
         |if ($isNullCode) { $res = false; } else {
         |  InternalRow $row = $valueVar;
         |  $res = true;
         |  $checks
         |}
       """.stripMargin

    case _: VNode.Field => throw new IllegalStateException(
      "Field is only reachable through Obj")

    case VNode.MapVals(valueNode, vt) =>
      val m = ctx.freshName("map"); val vals = ctx.freshName("vals")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val eNull = ctx.freshName("vNull"); val eVal = ctx.freshName("vVal")
      val er = ctx.freshName("valRes")
      val jt = CodeGenerator.javaType(vt)
      s"""
         |if ($isNullCode) { $res = false; } else {
         |  MapData $m = $valueVar;
         |  ArrayData $vals = $m.valueArray();
         |  final int $n = $vals.numElements();
         |  $res = true;
         |  for (int $i = 0; $i < $n && $res; $i++) {
         |    boolean $eNull = $vals.isNullAt($i);
         |    $jt $eVal = $eNull ? ${CodeGenerator.defaultValue(vt)}
         |      : ${CodeGenerator.getValue(vals, vt, i)};
         |    boolean $er;
         |    ${emitNode(ctx, self, valueNode, eVal, eNull, vt, er, rootVar)}
         |    $res = $er;
         |  }
         |}
       """.stripMargin
  }

  override protected def withNewChildInternal(c: Expression): ContractCheck =
    copy(child = c)
}

object ContractCheck {

  /** Row-level first violation through the codegen'd verdict: the whole
    * row (as a struct) is checked by the compiled verdict program;
    * failing rows delegate to the generic compile for bit-identical
    * payloads. Output ≡ [[graft.engine.Validate.firstViolation]]
    * (property-tested). */
  def rowFirstViolation(df: org.apache.spark.sql.DataFrame,
                        contract: ObjectC, thing: String = "data")
      : Column = {
    implicit val spark: org.apache.spark.sql.SparkSession =
      df.sparkSession
    import org.apache.spark.sql.functions.{col, struct}
    val rowType = StructType(df.schema.fields)
    implicit val env: MsgEnv = MsgEnv(thing, contract)
    // the verdict program AND the bound generic expression are pure
    // functions of (contract, schema, thing) — deterministic immutable
    // trees whose construction pays per-leaf probe analyses plus a
    // full optimizer constant-fold of the message scaffolding
    // (bindRowProbe), i.e. serial driver CPU per query construction.
    // Memoized since round 6 ([[graft.contracts.CompileCache]] — the
    // compile amortizes like Janino's codegen cache; results are
    // still computed fresh per action).
    val (plan, bound) = graft.contracts.CompileCache.memo(
      ("rowFirstViolation", new graft.contracts.CompileCache.IdRef(
        contract), rowType, thing)) {
      val p = VerdictCompiler.buildRow(contract, rowType)
      // no size cap: doGenCode hoists composite nodes past
      // SplitLeafThreshold leaves into their own generated methods, so
      // arbitrarily large contracts stay on the codegen verdict (round 2
      // fell back to the interpreted generic compile past 300 leaves)
      // generic compile over a probe with the REAL row schema (so
      // cross-field predicates resolve against siblings, exactly like
      // Validate.firstViolation), then bound to the row struct in slot 0
      val probe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowType)
      val genericCol = Compiler.objectViols(contract, rowType,
        f => col(f), Frame.root,
        Compiler.render(rowType, struct(rowType.fieldNames.map(col)
          .toIndexedSeq: _*)))
      val b = VerdictCompiler.bindRowProbe(
        probe.select(genericCol.as("__gv__")), rowType)
      (p, b)
    }
    val rowStruct = struct(df.columns.toSeq.map(col): _*)
    GraftColumnBridge.column(ContractCheck(
      GraftColumnBridge.expression(rowStruct), plan, bound))
  }
}
