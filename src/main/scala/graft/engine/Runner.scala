package graft.engine

import graft.gen.SpanGen
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit-able validation job with checkpoint resume.
  *
  * Usage (args):
  *   init   <inputDir> <nDocs> <nParts>        — write partitioned input
  *   run    <inputDir> <outDir> [maxParts]     — validate, resumable
  *
  * `run` discovers input partitions (directory-partitioned by `part`),
  * skips those already in the manifest for the current snapshot, and for
  * each pending partition: validates (contract + uniqueness-within-
  * partition + referential), writes violations + summary to
  * per-partition output dirs, appends the manifest row. Partition
  * pruning makes each per-partition pass scan only its own files
  * (`.where(col("part") === k)` on a directory-partitioned table).
  * `maxParts` caps how many partitions one invocation processes — the
  * hook the kill/resume test uses to simulate a mid-job crash.
  *
  * Global (cross-partition) doc_id uniqueness runs as a separate
  * incremental pass over per-partition key counts; at 10¹² rows the
  * per-partition pass bounds memory and the merge is key-count-sized.
  */
object Runner {

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-runner")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = session(cpus)
    args.toList match {
      case "init" :: inputDir :: nDocs :: nParts :: Nil =>
        init(spark, inputDir, nDocs.toLong, nParts.toInt)
      case "run" :: inputDir :: outDir :: rest =>
        val maxParts = rest.headOption.map(_.toInt).getOrElse(Int.MaxValue)
        run(spark, inputDir, outDir, maxParts)
      case other =>
        System.err.println(s"unknown args: $other"); sys.exit(2)
    }
    spark.stop()
  }

  def init(spark: SparkSession, inputDir: String, nDocs: Long,
           nParts: Int): Unit = {
    val docs = SpanGen.docs(spark, nDocs, nParts,
        defects = SpanGen.Defects(nullKind = true, badKind = true,
          danglingRef = true, dupDocId = true, rate = 1000))
      .withColumn("part",
        pmod(xxhash64(col("doc_id")), lit(nParts.toLong)).cast("int"))
    docs.write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(s"$inputDir/docs")
    SpanGen.media(spark, 10000).write.mode(SaveMode.Overwrite)
      .parquet(s"$inputDir/media")
  }

  /** snapshot id = fingerprint of the input file listing (names+sizes) —
    * the partitioned-Parquet stand-in for an Iceberg snapshot id. */
  def snapshotId(inputDir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val listing = walk(new java.io.File(s"$inputDir/docs"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getPath}:${f.length}").mkString("\n")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(listing).toLong)
  }

  /** the run's contract catalog, written with every run manifest so
    * outputs record exactly which contracts they enforced (the `publish`
    * / documentationTable analog, SURVEY.md §3.3). */
  def registry: graft.contracts.ContractRegistry =
    new graft.contracts.ContractRegistry("graft.engine")
      .register("spanDoc", SpanDocs.contract,
        "interleaved text+media span document", "core")
      .register("textSpan", SpanDocs.textSpan, "text span branch", "core")
      .register("mediaSpan", SpanDocs.mediaSpan, "media span branch",
        "core")

  /** returns (processed, skipped) partition counts. */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          maxParts: Int = Int.MaxValue): (Int, Int) = {
    val snap = snapshotId(inputDir)
    // contract catalog rides with the outputs (idempotent overwrite)
    val regPath = java.nio.file.Paths.get(outDir, "_registry.json")
    java.nio.file.Files.createDirectories(regPath.getParent)
    java.nio.file.Files.writeString(regPath, registry.toManifestJson)
    val docs = spark.read.parquet(s"$inputDir/docs")
    val media = spark.read.parquet(s"$inputDir/media").cache()
    val parts = docs.select("part").distinct().collect()
      .map(_.getInt(0)).sorted
    val done = Manifest.completed(spark, outDir, snap)
    val pending = parts.filterNot(done)
    var seq = done.size.toLong
    pending.take(maxParts).foreach { k =>
      val slice = docs.where(col("part") === k) // partition-pruned scan
      val viols = SpanDocs.validateAll(slice, media)
      viols.write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/violations/part=$k")
      val counts = slice.agg(count(lit(1))).head().getLong(0)
      val nFailed = spark.read.parquet(s"$outDir/violations/part=$k")
        .select("doc_id").distinct().count()
      // order-independent content fingerprint (xor of row hashes — no
      // overflow under ANSI, commutative across task orderings)
      val fp = slice.agg(bit_xor(xxhash64(col("doc_id"),
        to_json(col("spans"))))).head().getLong(0)
      Manifest.append(spark, outDir, snap, k, counts, nFailed, fp, seq)
      seq += 1
    }
    val processed = math.min(pending.length, maxParts)
    (processed, done.size)
  }
}
