package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness — ISOLATED measurement only, never the
  * driver artifact (that is [[Bench]], frozen). Times a subset of
  * [[SparkEntry.queries]] with the SAME session config and action
  * (`.count()` after up-front staging, gram-cache bracketed) as the
  * frozen bench, min-of-N, and can dump `.explain("formatted")` per
  * query for the committed plan evidence in `plans/r06/`.
  *
  * Env:
  *  - SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS: as Bench.
  *  - GRAFT_BENCHX_QUERIES: comma-separated names (default: all).
  *  - GRAFT_BENCHX_REPS: timing repetitions per query (default 3).
  *  - GRAFT_BENCHX_PLANS_DIR: when set, write <dir>/<query>_<suffix>.txt
  *    with the formatted plan (suffix: GRAFT_BENCHX_SUFFIX, default
  *    "before").
  *  - GRAFT_BENCHX_NOOP: "1" → time a noop-sink write instead of count
  *    (guide §1.4 isolation; the headline stays count for
  *    like-for-like with the frozen bench).
  */
object BenchExtra {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // GRAFT_BENCHX_DIRS: comma-separated data dirs swept SEQUENTIALLY
    // in ONE session (the frozen bench's 1× → 10× → 30× shape — later
    // sweeps run with the earlier sweeps' JIT warm-up, which is the
    // regime the driver measures); falls back to SPARK_GRAFT_SF_DIR.
    val dirs = sys.env.get("GRAFT_BENCHX_DIRS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_BENCHX_REPS", "3").toInt
    val noop = sys.env.get("GRAFT_BENCHX_NOOP").contains("1")
    val plansDir = sys.env.get("GRAFT_BENCHX_PLANS_DIR")
    val suffix = sys.env.getOrElse("GRAFT_BENCHX_SUFFIX", "before")
    val wanted = sys.env.get("GRAFT_BENCHX_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // quadratic audit twins excluded above 1× (like the frozen bench)
    val replicaExcluded = Set("ann_cosine_topk", "dedup_embedding_cosine")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    plansDir.foreach { d => new java.io.File(d).mkdirs() }
    // exclusion keys off the DIR (replica dirs are named <base>_xN),
    // not the position in the list — a single-replica run must still
    // skip the O(n²) audit twins (explicitly listing them in
    // GRAFT_BENCHX_QUERIES overrides)
    def isReplica(dir: String): Boolean =
      new java.io.File(dir).getName.matches(".*_x[0-9]+$")
    dirs.foreach(dir => sweep(spark, dir, cpus, reps, noop,
      if (dir == dirs.head) plansDir else None, suffix,
      wanted,
      if (isReplica(dir) && wanted.isEmpty) replicaExcluded
      else Set.empty))
    spark.stop()
  }

  private def sweep(spark: SparkSession, sfDir: String, cpus: Int,
                    reps: Int, noop: Boolean, plansDir: Option[String],
                    suffix: String, wanted: Option[Set[String]],
                    excluded: Set[String]): Unit = {
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val stageSec = time(SparkEntry.stageAll(spark, sfDir))

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        wanted.forall(_.contains(n)) && !excluded(n) }

    val results = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"benchx: $name")
      plansDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$d/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
      }
      def once(): Double = graft.pipeline.GramCache.withGramCache(
        time {
          val df = fn(spark, sfDir)
          if (noop)
            df.write.format("noop").mode("overwrite").save()
          else df.count()
          ()
        })
      // planning-only probe: how much of the wall is Catalyst
      // analysis/optimization/physical planning (driver-side, serial)
      val tPlan = time {
        fn(spark, sfDir).queryExecution.executedPlan; ()
      }
      val ts = (1 to reps).map(_ => once())
      spark.sparkContext.setJobDescription(null)
      println(f"[benchx] $name%-28s min=${ts.min}%.3f plan=$tPlan%.3f " +
        ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      name -> ts.min
    }
    val total = results.map(_._2).sum
    val json = results
      .map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    println(s"""{"benchx":true,"sf":"$sfDir","stage_sec":${f"$stageSec%.1f"},""" +
      s""""action":"${if (noop) "noop" else "count"}","reps":$reps,""" +
      s""""queries_total_sec":${f"$total%.3f"},"queries":$json}""")
  }
}
