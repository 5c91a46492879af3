package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: Catalyst phase timings (analysis / optimization /
  * planning) for selected SparkEntry queries — identifies whether a
  * slow fixed-size query burns driver CPU in the planner or executors
  * in the plan. Not part of the driver contract. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("v_shapes_all", "v_spans_nested", "span_validate",
        "v_documents", "sample_violations", "summary_documents")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-phaseprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.stageAll(spark, sfDir)
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val tCons = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t1) / 1e9
        val phases = df.queryExecution.tracker.phases.map {
          case (p, s) => f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.3f"
        }.mkString(" ")
        val t2 = System.nanoTime()
        df.count()
        val tExec = (System.nanoTime() - t2) / 1e9
        println(f"[phase] $n rep$rep cons=$tCons%.3f plan=$tPlan%.3f " +
          f"exec=$tExec%.3f :: $phases")
      }
    }
    spark.stop()
  }
}
