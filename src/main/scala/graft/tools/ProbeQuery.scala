package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query diagnostic: run a named SparkEntry query at a given sf
  * dir, print timing (3 runs) and the formatted plan.
  * Usage: runMain graft.tools.ProbeQuery <name> [sfDir] [explain]
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName(s"probe-$name")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name run$i: $s%.2f s, $n rows")
    }
    if (args.length > 2 && args(2) == "explain")
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
