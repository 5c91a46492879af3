package graft.tools

import graft.engine._
import graft.gen.SpanGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** component breakdown of the flagship validateAll (contract /
  * uniqueness / referential / union) — interleaved min-of-3. */
object BenchFlagship {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("N_DOCS", "4000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SpanGen.docs(spark, n, cpus * 4,
      defects = SpanGen.Defects(nullKind = true, badKind = true,
        danglingRef = true, dupDocId = true, rate = 10000)).cache()
    docs.count()
    val media = SpanGen.media(spark, 100000)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def contract() = SpanDocs.violationsFast(docs).count()
    def uniq() = Uniqueness.violations(
      docs.select("doc_id"), "doc_id", "docs").count()
    def ref() = {
      val refs = docs.select(col("doc_id"),
          explode(col("spans.media_ref")).as("media_ref"))
        .where(col("media_ref").isNotNull)
      Referential.violations(refs, "media_ref", media, "media_id",
        "doc_id", "docs", Some(true)).count()
    }
    def all() = SpanDocs.validateAll(docs, media).count()
    contract(); uniq(); ref(); all() // warm
    val r = (1 to 3).map(_ => (time(contract()), time(uniq()),
      time(ref()), time(all())))
    println(f"""{"contract":${r.map(_._1).min}%.2f,""" +
      f""""uniq":${r.map(_._2).min}%.2f,"ref":${r.map(_._3).min}%.2f,""" +
      f""""all":${r.map(_._4).min}%.2f,"n":$n}""")
    spark.stop()
  }
}
