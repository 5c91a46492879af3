package graft.tools

import graft.engine.{SpanDocs, Validate}
import graft.functions.ContractCheck
import graft.gen.SpanGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** micro-bench: flagship span validation through (a) the generic HOF
  * compiler, (b) the hand-written SpanCheck fast path, (c) the generic
  * codegen verdict compiler (ContractCheck). Interleaved min-of-3. */
object BenchCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("N_DOCS", "2000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SpanGen.docs(spark, n, cpus * 4,
      defects = SpanGen.Defects(nullKind = true, badKind = true,
        rate = 10000)).cache()
    docs.count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val c = f
      (System.nanoTime() - t0) / 1e9
    }
    def generic() = docs.where(
      Validate.firstViolation(docs, SpanDocs.contract).isNotNull).count()
    def fastSpan() = docs.where(
      SpanDocs.fastFirstViolation(docs).isNotNull).count()
    def cc() = docs.where(ContractCheck.rowFirstViolation(docs,
      SpanDocs.contract, "docs").isNotNull).count()
    // warm all three
    generic(); fastSpan(); cc()
    val results = (1 to 3).map { _ =>
      (time(generic()), time(fastSpan()), time(cc()))
    }
    val g = results.map(_._1).min
    val s = results.map(_._2).min
    val c = results.map(_._3).min
    println(f"{\"generic_sec\":$g%.2f,\"spancheck_sec\":$s%.2f," +
      f"\"contractcheck_sec\":$c%.2f,\"n\":$n}")
    spark.stop()
  }
}
