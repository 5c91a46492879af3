package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-granular run manifest — the checkpoint-resume log of
  * BASELINE.json `north_rule` ("resumable from checkpoint with
  * per-partition lineage + metrics"). FIXTURES.md §4.
  *
  * An append-only Parquet log (the "manifest Delta" of `north_star`,
  * emulated over plain Parquet since no Iceberg/Delta jars ship —
  * SURVEY.md §7.4): one row per completed (snapshot, partition), carrying
  * metrics and an input fingerprint. Resume = read log, skip partitions
  * whose (snapshot, partition, fingerprint) already completed.
  *
  * Crash-safety contract: a partition's outputs are (over)written BEFORE
  * its manifest row is appended, and output writes are per-partition
  * directories — so a kill at any point leaves either (a) no manifest row
  * → partition redone idempotently, or (b) manifest row present → outputs
  * complete. Completed partitions are never recomputed (SURVEY.md §5.2
  * resume test).
  */
object Manifest {

  val schemaCols = Seq("snapshot_id", "partition_id", "status", "n_checked",
    "n_failed", "fingerprint", "seq", "input_fp")

  def path(outDir: String): String = s"$outDir/_manifest"

  def load(spark: SparkSession, outDir: String): DataFrame = {
    val p = path(outDir)
    // existence check through the Hadoop FS — outDir may be HDFS/s3a,
    // not just a local path
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df =
      if (!fs.exists(hp))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "snapshot_id STRING, partition_id INT, status STRING, " +
            "n_checked BIGINT, n_failed BIGINT, fingerprint BIGINT, " +
            "seq BIGINT, input_fp STRING"))
      else spark.read.parquet(p)
    // manifests written before the input_fp column existed read as
    // null-fp rows (they resume on snapshot match only)
    if (df.columns.contains("input_fp")) df
    else df.withColumn("input_fp", lit(null).cast("string"))
  }

  /** partitions already completed for this snapshot (latest row wins). */
  def completed(spark: SparkSession, outDir: String,
                snapshotId: String): Set[Int] = {
    load(spark, outDir)
      .where(col("snapshot_id") === snapshotId &&
        col("status") === "done")
      .select("partition_id").distinct()
      .collect().map(_.getInt(0)).toSet
  }

  /** latest recorded per-partition INPUT fingerprint (any snapshot,
    * latest `seq` wins) — the incremental-resume key: a partition whose
    * current input listing still hashes to its recorded fp has already
    * been validated, even if OTHER partitions' files (and therefore the
    * global snapshot id) changed since. This is the emulated analog of
    * an Iceberg incremental scan: snapshot evolution only recomputes
    * the partitions it actually touched. */
  def latestInputFps(spark: SparkSession, outDir: String)
      : Map[Int, String] = {
    load(spark, outDir)
      .where(col("status") === "done" && col("input_fp").isNotNull)
      .groupBy("partition_id")
      .agg(max_by(col("input_fp"), col("seq")).as("input_fp"))
      .collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
  }

  /** next free `seq` value — strictly greater than every recorded row's,
    * so a re-validated partition's new row always wins the
    * latest-row-by-seq tiebreak in [[latestInputFps]]. */
  def nextSeq(spark: SparkSession, outDir: String): Long = {
    val r = load(spark, outDir).agg(max(col("seq"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
  }

  /** append one completed-partition row (atomic enough: parquet append
    * creates a new file; readers take the union). Appends are
    * serialized under a JVM-wide lock: concurrent partition workers
    * (Runner) append to the SAME directory, and Hadoop's
    * FileOutputCommitter stages every job of a path under one shared
    * `_temporary/0/` — overlapping commits would delete each other's
    * staging. The lock costs nothing (a manifest row is one tiny file);
    * the heavy per-partition work stays concurrent. */
  private val appendLock = new Object
  def append(spark: SparkSession, outDir: String, snapshotId: String,
             partitionId: Int, nChecked: Long, nFailed: Long,
             fingerprint: Long, seq: Long,
             inputFp: Option[String] = None): Unit =
      appendLock.synchronized {
    import spark.implicits._
    Seq((snapshotId, partitionId, "done", nChecked, nFailed, fingerprint,
      seq, inputFp.orNull))
      .toDF(schemaCols: _*)
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path(outDir))
  }
}
