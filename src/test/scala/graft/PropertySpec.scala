package graft

import graft.contracts._
import org.scalacheck.Gen

import org.apache.spark.sql.functions.lit

/** Property-based invariants (SURVEY.md §5.2 #3), batched: each
  * property evaluates MANY generated cases in ONE Spark job (a DataFrame
  * of generated rows), not one job per case — properties stay fast.
  *
  *  - conforming values ⇒ zero violations
  *  - one planted defect at path p ⇒ exactly one first-violation at p
  *  - optional ≡ null-tolerance
  *  - and/or verdict composition matches Boolean semantics
  */
class PropertySpec extends SparkTestBase {

  import org.apache.spark.sql.functions._

  private implicit val env: MsgEnv = MsgEnv("data", C.any)
  private def fr(p: String): Frame = Frame(lit(p), lit(""), lit(""))

  private def verdicts(rows: Seq[(Int, java.lang.Long)], c: Contract)
      : Map[Int, Boolean] = {
    import spark.implicits._
    val df = rows.toDF("i", "x")
    val dt = df.schema("x").dataType
    df.select(col("i"),
        Compiler.firstViol(C.optional(c), dt, col("x"), fr(".x"))
          .isNull.as("ok"))
      .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
  }

  test("property: value(v) accepts exactly v (batched over 200 samples)") {
    val samples = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(-1000L, 1000L)))
      .sample.get
    import spark.implicits._
    val df = samples.zipWithIndex
      .map { case ((tgt, v), i) => (i, tgt, v) }.toDF("i", "tgt", "v")
    val checks = df.collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))
    }
    val grouped = checks.groupBy(_._2)
    grouped.foreach { case (tgt, rows) =>
      val vs = verdicts(rows.map(r => (r._1, java.lang.Long.valueOf(r._3)))
        .toSeq, C.value(tgt))
      rows.foreach { case (i, t, v) =>
        assert(vs(i) == (v == t), s"value($t) on $v")
      }
    }
  }

  test("property: and/or verdicts compose like Boolean algebra") {
    import spark.implicits._
    val gens = Gen.listOfN(300, Gen.chooseNum(-50L, 50L)).sample.get
    val df = gens.zipWithIndex.map(_.swap).toDF("i", "x")
    val a = C.pred("a")(c => c > 0)
    val b = C.pred("b")(c => c % 2 === 0)
    val cc = C.pred("c")(c => c < 40)
    val dt = df.schema("x").dataType
    def ok(c: Contract) = Compiler.firstViol(c, dt, col("x"), fr("")).isNull
    val rows = df.select(col("x"),
      ok(C.and(a, b, cc)).as("andv"), ok(C.or(a, b, cc)).as("orv"),
      ok(a).as("av"), ok(b).as("bv"), ok(cc).as("cv"),
      ok(C.and(C.or(a, b), cc)).as("mixv")).collect()
    rows.foreach { r =>
      val (av, bv, cv) = (r.getAs[Boolean]("av"), r.getAs[Boolean]("bv"),
        r.getAs[Boolean]("cv"))
      assert(r.getAs[Boolean]("andv") == (av && bv && cv))
      assert(r.getAs[Boolean]("orv") == (av || bv || cv))
      assert(r.getAs[Boolean]("mixv") == ((av || bv) && cv))
    }
  }

  test("property: planted defect index ⇒ first violation at that index") {
    // arrays of 1s with a single 0 planted at a random index
    import spark.implicits._
    val cases = Gen.listOfN(100,
      Gen.zip(Gen.chooseNum(1, 20), Gen.chooseNum(0, 19)))
      .sample.get
      .map { case (len, at0) =>
        val at = at0 % len
        (at, Seq.tabulate(len)(j => if (j == at) 0 else 1))
      }
    val df = cases.zipWithIndex
      .map { case ((at, xs), i) => (i, at, xs) }.toDF("i", "at", "xs")
    val dt = df.schema("xs").dataType
    val out = df.select(col("i"), col("at"),
        Compiler.firstViol(C.array(C.value(1)), dt, col("xs"), fr(""))
          .getField("path").as("p"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[String]("p") == s"[${r.getAs[Int]("at")}]")
    }
  }

  test("property: driver-side literal rendering matches compiled " +
       "per-row rendering (value / got parity)") {
    import spark.implicits._
    val doubles = Gen.listOfN(100, Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(-50.0, 50.0),
      Gen.oneOf(0.0, -0.0, 5.0, 5.5, 1e15, Double.NaN,
        Double.PositiveInfinity))).sample.get
    val df = doubles.zipWithIndex.map(_.swap).toDF("i", "x")
    val rendered = df.select(col("i"),
        Compiler.render(org.apache.spark.sql.types.DoubleType, col("x"))
          .as("r")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    doubles.zipWithIndex.foreach { case (d, i) =>
      assert(rendered(i) == Render.num(d),
        s"compiled '${rendered(i)}' vs driver '${Render.num(d)}' for $d")
    }
  }

  test("property: first violation ≡ head of collect-all, across planted " +
       "defect positions") {
    import org.apache.spark.sql.functions._
    val c = C.obj("o" -> C.obj("a" -> C.number, "b" -> C.string,
      "xs" -> C.array(C.oneOf(1, 2)), "m" -> C.hash(C.string)))
    val fixtures = Seq(
      "named_struct('a', 1, 'b', 'x', 'xs', array(1,2), 'm', map('k','v')) as o",
      "named_struct('a', 's', 'b', 'x', 'xs', array(1,2), 'm', map('k','v')) as o",
      "named_struct('a', 1, 'b', 9, 'xs', array(1,2), 'm', map('k','v')) as o",
      "named_struct('a', 1, 'b', 'x', 'xs', array(1,7), 'm', map('k','v')) as o",
      "named_struct('a', 1, 'b', 'x', 'xs', array(7,9), 'm', map('k','v')) as o",
      "named_struct('a', 's', 'b', 9, 'xs', array(7), 'm', map('k', 5)) as o")
    fixtures.foreach { f =>
      val df = fix(f).withColumn("id", lit(0))
      val first = firstViol(df, c)
      val all = graft.engine.ViolationOps.allViolations(df, c, "id")
        .orderBy("seq").collect()
      (first, all.headOption) match {
        case (None, None) => ()
        case (Some(v), Some(h)) =>
          assert(v.getAs[String]("path") == h.getAs[String]("path") &&
            v.getAs[String]("expected") == h.getAs[String]("expected") &&
            v.getAs[String]("got") == h.getAs[String]("got"),
            s"first=$v vs all-head=$h for fixture $f")
        case other => fail(s"pass/fail disagreement $other for $f")
      }
    }
  }

  test("collect-all tuple: size errors do not short-circuit positions; " +
       "missing positions are checked against undefined") {
    // the reference's collecting fail gathers, in checker order: the
    // strict exactly-size error, the base size error (shorter only),
    // then EVERY position — out-of-bounds positions check `undefined`
    // (contract.impl.js:559-563,578-590); fuzz cases fz* pinned this.
    def rows(sql: String, c: ObjectC): Seq[(String, String, String)] = {
      val df = fix(sql).withColumn("id", lit(0))
      graft.engine.ViolationOps.allViolations(df, c, "id")
        .orderBy("seq").collect()
        .map(r => (r.getAs[String]("path"), r.getAs[String]("expected"),
          r.getAs[String]("got"))).toSeq
    }
    val strictC = C.obj("pair" -> C.tuple(C.integer, C.integer).strict)
    // short + strict: exactly-size, then size, then position 1 vs undefined
    assert(rows("array(5L) as pair", strictC) == Seq(
      (".pair", "tuple of exactly size 2", "[ 5 ]"),
      (".pair", "tuple of size 2", "[ 5 ]"),
      (".pair[1]", "integer", "undefined")))
    // long + strict: exactly-size only — both positions pass
    assert(rows("array(1L, 2L, 3L) as pair", strictC) == Seq(
      (".pair", "tuple of exactly size 2", "[ 1, 2, 3 ]")))
    // short + non-strict: size, then the undefined positional sweep
    val looseC = C.obj("pair" -> C.tuple(C.integer, C.integer))
    assert(rows("array(5L) as pair", looseC) == Seq(
      (".pair", "tuple of size 2", "[ 5 ]"),
      (".pair[1]", "integer", "undefined")))
  }

  test("property: optional ≡ null-tolerance for every leaf family") {
    import spark.implicits._
    val leaves: Seq[Contract] = Seq(C.string, C.number, C.integer,
      C.bool, C.value(5), C.oneOf(1, 2, 3), C.matches("x"),
      C.pred("pos")(c => c > 0))
    val nullLong: java.lang.Long = null
    leaves.foreach { leaf =>
      val vs = verdicts(Seq((0, nullLong)), leaf) // through optional()
      assert(vs(0), s"optional(${leaf.render}) must accept null")
    }
    // required counterpart rejects null (modulo any, falsy)
    val df = Seq((0, nullLong)).toDF("i", "x")
    leaves.foreach { leaf =>
      val v = df.select(Compiler.firstViol(leaf,
        df.schema("x").dataType, col("x"), fr(".x")).isNull.as("ok"))
        .head().getBoolean(0)
      assert(!v, s"${leaf.render} must reject null")
    }
  }

  test("property: TopKNeighbors ≡ rank window on seeded random " +
       "candidates (heavy ties, duplicate scores, mixed group sizes)") {
    // 3000 rows, 120 groups (sizes 1..50), scores drawn from a SMALL
    // value set so cross-neighbor ties are everywhere — the regime
    // where an ordering mismatch between the aggregator's comparator
    // and the window's (cosine desc, neighbor asc) would surface.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(9001)
    val rows = (0 until 3000).map { i =>
      (rnd.nextInt(120), i.toLong,
        if (rnd.nextInt(20) == 0) Double.NaN
        else (rnd.nextInt(7) - 3) / 3.0)
    }
    val cand = spark.createDataFrame(rows)
      .toDF("id", "neighbor", "cosine")
    for (k <- Seq(1, 3, 7)) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
        .orderBy(col("cosine").desc, col("neighbor").asc)
      val viaWindow = cand.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("id", "rank", "neighbor", "cosine")
        .orderBy("id", "rank").collect().toSeq
      val viaAgg = cand.groupBy("id")
        .agg(graft.functions.TopKNeighbors.topk(k)(
          col("cosine"), col("neighbor")).as("top"))
        .select(col("id"), posexplode(col("top")))
        .select(col("id"), (col("pos") + 1).as("rank"),
          col("col.neighbor").as("neighbor"), col("col.cosine").as("cosine"))
        .orderBy("id", "rank").collect().toSeq
      assert(viaAgg.map(_.toString) == viaWindow.map(_.toString),
        s"k=$k diverged on seeded random candidates")
    }
  }

  test("property: Utf8Order surrogate-aware fast path ≡ byte compare " +
       "(500 seeded pairs incl. astral/high-BMP/prefix edges)") {
    def byteCmp(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    // alphabet engineered around the divergence zones: ASCII, high BMP
    // (≥ U+E000, above the surrogate range in UTF-16 but 3-byte in
    // UTF-8), astral chars (surrogate pairs, 4-byte), and a lone high
    // surrogate (encodes as '?') — plus empty/prefix shapes
    val atoms = Seq("", "a", "b", "é", "￠", "",
      "𝟘", "😀", "\ud835", "ab", "a￠",
      "a𝟘", "a\ud835")
    val rnd = new scala.util.Random(20260820)
    val strs = Seq.fill(500)(
      Seq.fill(rnd.nextInt(4))(atoms(rnd.nextInt(atoms.size))).mkString)
    for (a <- atoms ++ strs.take(40); b <- atoms) {
      val got = Integer.signum(graft.functions.Utf8Order.cmpStrings(a, b))
      val want = Integer.signum(byteCmp(a, b))
      assert(got == want,
        s"cmpStrings(${a.map(_.toInt.toHexString)}, " +
          s"${b.map(_.toInt.toHexString)}) = $got, byte order says $want")
    }
    for (Seq(a, b) <- strs.grouped(2)) {
      assert(Integer.signum(graft.functions.Utf8Order.cmpStrings(a, b)) ==
        Integer.signum(byteCmp(a, b)))
    }
  }
}
