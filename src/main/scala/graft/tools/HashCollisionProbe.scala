package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 evidence probe: the hashed-gram dedup paths
  * ([[graft.pipeline.Dedup.withHashedNgrams]]) are output-identical to
  * the string-gram forms UNLESS two distinct grams collide in
  * xxhash64 (2⁻⁶⁴ per pair). This probe measures the fact directly at
  * a given scale: per n, the corpus-wide distinct STRING gram count vs
  * the distinct HASH count — equal ⇒ zero collisions ⇒ the hashed
  * pipelines' sets are isomorphic to the string pipelines' on this
  * corpus. Run against the biggest staged replica (30×) for the
  * committed OPTIMIZATION_r06.md evidence.
  */
object HashCollisionProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_bench/sf0.1_x30"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-collision-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Seq(3, 8).foreach { n =>
      val grams = graft.pipeline.Dedup
        .withNgrams(docs, "doc_id", "text", n)
        .select(explode(col("grams")).as("g"))
      val r = grams.agg(
        countDistinct(col("g")).as("distinct_strings"),
        countDistinct(xxhash64(col("g"))).as("distinct_hashes")).head()
      println(s"[collision-probe] dir=$dir n=$n " +
        s"distinct_strings=${r.getLong(0)} " +
        s"distinct_hashes=${r.getLong(1)} " +
        s"collisions=${r.getLong(0) - r.getLong(1)}")
    }
    spark.stop()
  }
}
