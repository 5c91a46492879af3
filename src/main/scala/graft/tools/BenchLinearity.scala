package graft.tools

import graft.engine._
import graft.gen.SpanGen
import org.apache.spark.sql.SparkSession

/** Diagnostic: throughput-vs-corpus-size linearity. The design point is
  * 10^12 documents; the flagship bench measures one size (4M). This
  * probe runs the IDENTICAL validateAll job at 4M and 40M docs (10x)
  * and reports docs/sec at both — per-doc cost should be flat if the
  * engine is linear in n (hash-agg uniqueness, broadcast referential,
  * per-row contract check are all O(n); nothing is quadratic or
  * driver-materialized). Steal-gated min-of-N like graft.Bench. Run
  * with SPARK_DRIVER_MEM=96g so the 40M cache stays in memory (spills
  * to disk otherwise, which measures the disk instead). Not part of
  * the driver contract; a builder tool.
  */
object BenchLinearity {

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("SIZES", "4000000,40000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = SpanGen.media(spark, 100000)
    val results = sizes.map { n =>
      val path = s"/tmp/graft_bench/docs_$n"
      if (!new java.io.File(path).exists())
        SpanGen.docs(spark, n, 128,
          defects = SpanGen.Defects(nullKind = true, badKind = true,
            danglingRef = true, dupDocId = true, rate = 10000))
          .write.mode("overwrite").parquet(path)
      val cached = spark.read.parquet(path).cache()
      cached.count()
      def run(): Unit = { SpanDocs.validateAll(cached, m).count(); () }
      run() // codegen warm
      val runs = StealGate.gatedRuns(3, 10)(run())
      val clean = runs.filter(_._2 <= StealGate.stealMax)
      val t = StealGate.minPreferClean(runs)
      cached.unpersist(true)
      println(f"n=$n%d  t=$t%.2fs  docs/s=${n / t}%.0f  " +
        f"(${runs.size} runs, ${clean.size} steal-clean)")
      (n, t, n / t)
    }
    results.sliding(2).foreach {
      case Seq((n1, _, d1), (n2, _, d2)) =>
        println(f"linearity ${n1}->${n2}: per-doc cost ratio " +
          f"${d1 / d2}%.3f (1.0 = perfectly linear)")
      case _ =>
    }
    spark.stop()
  }
}
