package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-off diagnostic: per-stage wall/CPU for selected SparkEntry
  * queries (UI is disabled in the bench session, so this listener is
  * the stage-level visibility). Not part of the driver contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("span_validate", "ann_ivf_topk", "ann_lsh_topk",
        "dedup_ngram_jaccard")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-stageprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var tag = ""
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)) / 1e3
        val m = i.taskMetrics
        println(f"[stage] $tag id=${i.stageId} tasks=${i.numTasks} " +
          f"wall=$wall%.3f cpu=${m.executorCpuTime / 1e9}%.2f " +
          f"run=${m.executorRunTime / 1e3}%.2f " +
          f"gc=${m.jvmGCTime / 1e3}%.2f " +
          f"deser=${m.executorDeserializeTime / 1e3}%.2f " +
          f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB " +
          f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB " +
          s":: ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = {
          val p = qe.executedPlan.toString
          def c(s: String) = s.r.findAllIn(p).length
          println(s"[plan] $fn smj=${c("SortMergeJoin")} " +
            s"bhj=${c("BroadcastHashJoin")} shj=${c("ShuffledHashJoin")} " +
            s"bnlj=${c("BroadcastNestedLoopJoin")} " +
            s"sort=${c("\\bSort\\b")} codegenIds=${c("\\*\\(")}")
        }
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    graft.SparkEntry.stageAll(spark, sfDir)
    names.foreach { n =>
      (1 to 4).foreach { rep =>
        tag = s"$n#$rep"
        val t0 = System.nanoTime()
        graft.pipeline.GramCache.withGramCache {
          graft.SparkEntry.queries(n)(spark, sfDir).count(); ()
        }
        println(f"[query] $n rep$rep total=" +
          f"${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
