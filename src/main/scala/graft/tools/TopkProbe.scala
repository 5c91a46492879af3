package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: isolate the ANN ranking aggregate's cost at a
  * replica scale — times the candidate+cosine frame alone (noop-style
  * count), then the native TopKNeighborsAgg vs the udaf(Aggregator)
  * twin over the same frame. Not part of the driver contract. */
object TopkProbe {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else "/tmp/graft_bench/sf0.1_x30"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-topkprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("GRAFT_TOPKPROBE_STAGE").contains("1")) {
      val t = time(graft.SparkEntry.stageAll(spark, sfDir))
      println(f"[topkprobe] stageAll=$t%.1f")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val gen = graft.SparkEntry.genDir(sfDir)
    val bucketed = spark.read.parquet(s"$gen/lsh_buckets")
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("vec"),
      sqrt(graft.functions.DotProduct.dot(col("embedding"),
        col("embedding"))).as("nrm"))
    def scored = {
      val cand = bucketed.as("x").join(bucketed.as("y"),
          col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
            col("x.id") =!= col("y.id"))
        .select(col("x.id").as("id"), col("y.id").as("neighbor"))
        .distinct()
      cand
        .join(v.select(col("id"), col("vec").as("va"),
          col("nrm").as("na")), "id")
        .join(v.select(col("id").as("neighbor"), col("vec").as("vb"),
          col("nrm").as("nb")), "neighbor")
        .select(col("id"), col("neighbor"),
          (graft.functions.DotProduct.dot(col("va"), col("vb")) /
            (col("na") * col("nb"))).as("cosine"))
    }
    (1 to 2).foreach { rep =>
      val tBase = time(scored.count())
      val tNative = time(scored.groupBy("id")
        .agg(graft.functions.TopKNeighbors.topk(3)(
          col("cosine"), col("neighbor")).as("t")).count())
      val tUdaf = time(scored.groupBy("id")
        .agg(graft.functions.TopKNeighbors.topkUdaf(3)(
          col("cosine"), col("neighbor")).as("t")).count())
      println(f"[topkprobe] rep$rep scored=$tBase%.2f " +
        f"native=$tNative%.2f udaf=$tUdaf%.2f " +
        f"rows=${scored.count()}")
    }
    spark.stop()
  }
}
