package graft.tools

import graft.engine._
import graft.gen.SpanGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: split driver-side planning (analysis + optimization +
  * physical planning) from cluster execution for each suite component,
  * at 2 and 8 shuffle partitions. Identifies the serial Amdahl term
  * capping measured 2→8 scaling at bench scale. Builder tool. */
object BenchPlanTime {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("N_DOCS", "4000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docsPath = s"/tmp/graft_bench/docs_$nDocs"
    val cached = spark.read.parquet(docsPath).cache()
    cached.count()
    val m = SpanGen.media(spark, 100000)
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def derived(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), size(col("spans")).as("n_spans"),
        aggregate(col("spans"), lit(0), (a, s) =>
          a + coalesce(length(s.getField("text")), lit(0)))
          .as("text_len"))
    for (p <- Seq(8, 2, 8, 2); round <- Seq(1, 2)) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val d = cached.coalesce(p)
      val va = SpanDocs.validateAll(d, m)
      val tPlanV = time(va.queryExecution.executedPlan)
      val tExecV = time(va.count())
      val der = derived(d)
      val st = Stats.profile(der, Seq("doc_id", "n_spans", "text_len"))
      val tPlanS = time(st.queryExecution.executedPlan)
      val tExecS = time(st.collect())
      val tDrift = time(Drift.sketch(der, "text_len"))
      println(f"[p=$p r=$round] validate: plan=$tPlanV%5.2f " +
        f"exec=$tExecV%6.2f | stats: plan=$tPlanS%5.2f " +
        f"exec=$tExecS%5.2f | drift=$tDrift%5.2f")
    }
    spark.stop()
  }
}
