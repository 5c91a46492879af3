package graft.tools

import graft.engine._
import graft.gen.SpanGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-leg timings for the 2-vs-8-core scaling evidence.
  * Prints EVERY individual run (not just mins) for (a) validateAll
  * alone and (b) the full suite, alternating 2/8, plus GC time deltas —
  * to separate engine scaling from JVM noise (GC/JIT) and serial
  * per-job overhead. Not part of the driver contract; a builder tool.
  */
object BenchScalingProbe {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("N_DOCS", "4000000").toLong
    val rounds = sys.env.getOrElse("ROUNDS", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docsPath = s"/tmp/graft_bench/docs_$nDocs"
    if (!new java.io.File(docsPath).exists())
      SpanGen.docs(spark, nDocs, 128,
        defects = SpanGen.Defects(nullKind = true, badKind = true,
          danglingRef = true, dupDocId = true, rate = 10000))
        .write.mode("overwrite").parquet(docsPath)
    val cached = spark.read.parquet(docsPath).cache()
    cached.count()
    val m = SpanGen.media(spark, 100000)
    def time(f: => Unit): (Double, Double) = {
      val g0 = gcMillis(); val t0 = System.nanoTime(); f
      ((System.nanoTime() - t0) / 1e9, (gcMillis() - g0) / 1e3)
    }
    val slices = Seq(2, 8).map(p => p -> cached.coalesce(p)).toMap
    def validate(p: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      SpanDocs.validateAll(slices(p), m).count(); ()
    }
    def suite(p: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val d = slices(p)
      SpanDocs.validateAll(d, m).count()
      val derived = d.select(col("doc_id"),
        size(col("spans")).as("n_spans"),
        aggregate(col("spans"), lit(0), (a, s) =>
          a + coalesce(length(s.getField("text")), lit(0)))
          .as("text_len"))
      Stats.profile(derived, Seq("doc_id", "n_spans", "text_len"))
        .collect()
      Drift.sketch(derived, "text_len")
      ()
    }
    validate(8); suite(8) // warm codegen
    println("== validateAll alone ==")
    for (i <- 1 to rounds) {
      val (t2, g2) = time(validate(2))
      val (t8, g8) = time(validate(8))
      println(f"round $i: t2=$t2%6.2f (gc $g2%5.2f)  t8=$t8%6.2f " +
        f"(gc $g8%5.2f)  eff=${t2 / (4 * t8)}%5.3f")
    }
    println("== full suite ==")
    for (i <- 1 to rounds) {
      val (t2, g2) = time(suite(2))
      val (t8, g8) = time(suite(8))
      println(f"round $i: t2=$t2%6.2f (gc $g2%5.2f)  t8=$t8%6.2f " +
        f"(gc $g8%5.2f)  eff=${t2 / (4 * t8)}%5.3f")
    }
    spark.stop()
  }
}
