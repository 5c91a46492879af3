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
           nParts: Int, format: String = "parquet"): Unit = {
    val docs = SpanGen.docs(spark, nDocs, nParts,
        defects = SpanGen.Defects(nullKind = true, badKind = true,
          danglingRef = true, dupDocId = true, rate = 1000))
      .withColumn("part",
        pmod(xxhash64(col("doc_id")), lit(nParts.toLong)).cast("int"))
    docs.write.mode(SaveMode.Overwrite).partitionBy("part")
      .format(format).save(s"$inputDir/docs")
    SpanGen.media(spark, 10000).write.mode(SaveMode.Overwrite)
      .format(format).save(s"$inputDir/media")
  }

  /** snapshot id = fingerprint of the input file listing (names+sizes) —
    * the partitioned-table stand-in for an Iceberg snapshot id.
    * Resolved through the Hadoop FileSystem API so it works on any
    * supported store (local, HDFS, s3a), not just java.io paths.
    * Counts every DATA file (metadata/hidden files — `_SUCCESS`,
    * `.crc` — excluded), so it is format-agnostic. */
  def snapshotId(spark: SparkSession, inputDir: String): String =
    hashListing(dataFiles(spark, inputDir))

  private def hashListing(files: Seq[String]): String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        files.sorted.mkString("\n")).toLong)

  private def dataFiles(spark: SparkSession, inputDir: String)
      : Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$inputDir/docs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        files += s"${f.getPath.toUri.getPath}:${f.getLen}"
    }
    files.toSeq
  }

  /** per-partition INPUT fingerprints: each `part=k` directory's file
    * listing (paths+sizes) hashed independently — the incremental-scan
    * key. A snapshot that only appended files to partition 3 changes
    * partition 3's fp and nobody else's, so resume recomputes exactly
    * the touched partitions (the global snapshot id, by contrast,
    * changes whenever ANY file changes). Empty map when the layout is
    * not `part=k`-partitioned — callers then fall back to global
    * snapshot-keyed resume. */
  private val PartRe = ".*/part=(\\d+)/.*".r
  def partitionInputFps(spark: SparkSession, inputDir: String)
      : Map[Int, String] = {
    val keyed = dataFiles(spark, inputDir).map {
      case f @ PartRe(k) => k.toInt -> f
      case _             => -1 -> "" // unpartitioned layout marker
    }
    if (keyed.exists(_._1 < 0)) Map.empty
    else keyed.groupBy(_._1)
      .map { case (k, fs) => k -> hashListing(fs.map(_._2)) }
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

  /** Returns (processed, skipped) partition counts.
    *
    * Per-partition job hygiene: input row count and the content
    * fingerprint are OBSERVED on the contract-validation branch of the
    * violations write (one pass — `observe` metrics ride the write job
    * for free), so each partition costs two jobs (write + small
    * read-back for the distinct-failing-docs metric) instead of four.
    * Partitions are processed `spark.graft.runner.concurrency`-way
    * concurrently (default 4): each is an independent Spark job, so the
    * scheduler interleaves their stages and a long tail partition no
    * longer serializes the run. Crash-safety is per partition (outputs
    * before manifest row), so concurrency does not weaken resume. */
  /** thrown when the violation-rate circuit breaker trips: at 10¹² rows
    * a systematically-broken snapshot (bad upstream writer, schema
    * drift) must fail in minutes, not burn a day writing 10¹¹ violation
    * rows. Completed partitions keep their manifest rows, so a rerun
    * after the fix resumes instead of restarting. */
  final case class RunAborted(processed: Int, nChecked: Long,
                              nFailed: Long, maxRate: Double)
      extends RuntimeException(
        f"validation aborted: violation rate ${nFailed.toDouble /
          math.max(1L, nChecked)}%.4f over $nChecked%d docs after " +
        f"$processed%d partitions exceeds maxViolRate=$maxRate%.4f")

  /** `format` is any Spark DataSource able to represent the span schema
    * (parquet default; orc and json ship with Spark — json callers
    * should write with an embedded-schema-preserving generator or
    * accept inference). The violations/manifest SINK stays parquet:
    * outputs are the engine's own artifact, inputs are whatever the
    * lake holds.
    *
    * Resume is two-keyed: a partition is skipped when its manifest row
    * matches the current global snapshot id (the round-2 behavior), OR
    * when its recorded per-partition input fingerprint still matches
    * the current `part=k` file listing — so appending one partition's
    * files to a 10¹²-row table recomputes ONE partition, not all of
    * them (incremental-scan semantics; see [[partitionInputFps]]).
    *
    * `maxViolRate` arms the circuit breaker: once the cumulative
    * distinct-failing-doc rate across completed partitions exceeds it,
    * no further partitions start and [[RunAborted]] is thrown.
    *
    * Schema evolution (Iceberg read semantics over the emulated lake):
    * inputs are read with `mergeSchema`, so a snapshot that ADDED a
    * column reads old files as null and the non-strict contract ignores
    * the extra — additive evolution validates without reconfiguration.
    * The docs schema of every run is recorded at `outDir/_schema.json`;
    * when the current snapshot's schema has BREAKING drift vs the last
    * validated one (removed/retyped fields — see
    * [[SchemaEvolution.Change.safe]]) the run throws
    * [[SchemaEvolution.SchemaDriftError]] before any partition starts,
    * naming the exact paths. `allowBreakingDrift` overrides the gate
    * (the recorded schema then advances to the new shape). */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          maxParts: Int = Int.MaxValue,
          format: String = "parquet",
          maxViolRate: Option[Double] = None,
          allowBreakingDrift: Boolean = false): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val snap = snapshotId(spark, inputDir)
    // contract catalog rides with the outputs (idempotent overwrite),
    // written through the Hadoop FS so outDir may be any store
    val regPath = new Path(outDir, "_registry.json")
    val fs = regPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(regPath, true)
    try out.write(registry.toManifestJson.getBytes("UTF-8"))
    finally out.close()
    // mergeSchema: evolved snapshots whose newer files carry added
    // columns read as the union schema (old files -> null), the
    // add-column evolution Iceberg guarantees; parquet/orc honor the
    // option, other sources ignore it harmlessly
    val docs = spark.read.option("mergeSchema", "true")
      .format(format).load(s"$inputDir/docs")
    val media = spark.read.option("mergeSchema", "true")
      .format(format).load(s"$inputDir/media").cache()
    // schema-drift gate: compare against the last validated snapshot's
    // recorded schema and fail fast on breaking drift (O(schema), runs
    // before any data is touched)
    val schemaPath = new Path(outDir, "_schema.json")
    val curSchema = docs.drop("part").schema
    if (fs.exists(schemaPath)) {
      val in = fs.open(schemaPath)
      val prevJson =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val prev = org.apache.spark.sql.types.DataType.fromJson(prevJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val changes = SchemaEvolution.diff(prev, curSchema)
      val breaking = changes.filterNot(_.safe)
      if (breaking.nonEmpty && !allowBreakingDrift)
        throw SchemaEvolution.SchemaDriftError(breaking, changes)
    }
    val sOut = fs.create(schemaPath, true)
    try sOut.write(curSchema.json.getBytes("UTF-8"))
    finally sOut.close()
    val parts = docs.select("part").distinct().collect()
      .map(_.getInt(0)).sorted
    val partFps = partitionInputFps(spark, inputDir)
    val doneSnap = Manifest.completed(spark, outDir, snap)
    val doneFp: Set[Int] =
      if (partFps.isEmpty) Set.empty
      else {
        val recorded = Manifest.latestInputFps(spark, outDir)
        parts.filter(k =>
          recorded.get(k).exists(fp => partFps.get(k).contains(fp))).toSet
      }
    val done = doneSnap ++ doneFp
    val pending = parts.filterNot(done).take(maxParts)
    val seq = new java.util.concurrent.atomic.AtomicLong(
      Manifest.nextSeq(spark, outDir))
    val checkedTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    val failedTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val conc = spark.conf.getOption("spark.graft.runner.concurrency")
      .map(_.toInt).getOrElse(4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(conc, pending.length max 1)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = pending.toSeq.map { k =>
      scala.concurrent.Future {
        if (tripped.get) () else {
        val slice = docs.where(col("part") === k) // partition-pruned scan
        // observe on the contract branch only (it scans every input row
        // exactly once); uniqueness/referential branches use the raw
        // slice so metrics are not double-counted
        val obs = org.apache.spark.sql.Observation(s"part_$k")
        val observed = slice.observe(obs,
          count(lit(1)).as("n_checked"),
          // order-independent content fingerprint (xor of row hashes —
          // no overflow under ANSI, commutative across task orderings)
          bit_xor(xxhash64(col("doc_id"), to_json(col("spans"))))
            .as("fp"))
        val contractViols = SpanDocs.violationsFast(observed)
        val uniqViols = Uniqueness.violations(
          slice.select("doc_id"), "doc_id", "docs")
        val refs = slice.select(col("doc_id"),
            explode(col("spans.media_ref")).as("media_ref"))
          .where(col("media_ref").isNotNull)
        val refViols = Referential.violations(refs, "media_ref", media,
          "media_id", "doc_id", "docs", Some(true))
        val viols = contractViols.unionByName(uniqViols)
          .unionByName(refViols)
        viols.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/violations/part=$k")
        val metrics = obs.get // metrics from the write job itself
        val counts = metrics("n_checked").asInstanceOf[Long]
        val fp = metrics("fp").asInstanceOf[Long]
        val nFailed = spark.read.parquet(s"$outDir/violations/part=$k")
          .select("doc_id").distinct().count()
        Manifest.append(spark, outDir, snap, k, counts, nFailed, fp,
          seq.getAndIncrement(), partFps.get(k))
        ran.incrementAndGet()
        val c = checkedTotal.addAndGet(counts)
        val f = failedTotal.addAndGet(nFailed)
        maxViolRate.foreach { r =>
          if (c > 0 && f.toDouble / c > r) tripped.set(true)
        }
        }
      }
    }
    import scala.concurrent.duration._
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 24.hours)
    finally pool.shutdown() // non-daemon threads would pin the JVM on failure
    if (tripped.get)
      throw RunAborted(ran.get(), checkedTotal.get(), failedTotal.get(),
        maxViolRate.get)
    (pending.length, done.size)
  }
}
