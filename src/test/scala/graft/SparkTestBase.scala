package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.contracts._
import graft.engine.Validate

object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Shared helpers: fixtures are one-row DataFrames built from SQL
  * literals (typed via SQL: array(), named_struct(), map(), cast(null
  * as t), double('NaN')); assertions check the compiled first-violation
  * against goldens hand-derived from the reference semantics (the
  * reference is not executable here — each case cites the
  * contract.spec.js lines it mirrors). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  /** one-row fixture from a SQL projection, e.g. fix("5 as x, 'a' as y") */
  def fix(projection: String): DataFrame =
    spark.sql(s"SELECT $projection")

  def firstViol(df: DataFrame, c: ObjectC): Option[Row] = {
    val r = df.select(Validate.firstViolation(df, c).as("v"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getStruct(0))
  }

  def assertPass(df: DataFrame, c: ObjectC): Unit = {
    val v = firstViol(df, c)
    assert(v.isEmpty, s"expected pass, got violation $v")
  }

  def assertViol(df: DataFrame, c: ObjectC, path: String, expected: String,
                 got: String = null): Unit = {
    val v = firstViol(df, c)
    assert(v.isDefined, s"expected violation at $path, but passed")
    assert(v.get.getAs[String]("path") == path,
      s"path: got ${v.get.getAs[String]("path")}, want $path")
    assert(v.get.getAs[String]("expected") == expected,
      s"expected-text: got ${v.get.getAs[String]("expected")}, want $expected")
    if (got != null)
      assert(v.get.getAs[String]("got") == got,
        s"got-text: got ${v.get.getAs[String]("got")}, want $got")
  }
}
