package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`): brute-force cosine top-k as the exact baseline /
  * audit path, and random-hyperplane LSH bucketing as the scale path
  * (candidates from bucket collisions, exact cosine on candidates,
  * recall measured against the baseline in tests).
  *
  * All arithmetic stays in codegen'd HOF expressions (`zip_with` dot
  * products, `aggregate` folds) — no UDFs, so Catalyst prunes to the
  * id+vector columns at the scan. The brute path is O(n²) pairs and
  * exists for correctness; the LSH path joins only within buckets,
  * turning the cross join into |bucket|²-bounded work.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in element order (deterministic, matches sequential
    * summation on the oracle side). Codegen'd custom Expression — the
    * HOF form (`aggregate(zip_with(...))`) is interpreted per element
    * and ~10x slower in the ANN inner loop. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** exact cosine top-k per vector (brute force; audit/baseline path).
    * Deterministic total order: score desc, then neighbor id asc. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 k: Int = 3): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    val pairs = v.as("a").join(v.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("neighbor"),
        (dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("cosine").desc, col("neighbor").asc)
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "rank", "neighbor", "cosine")
  }

  /** embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine >= threshold — the exact audit path for embedding dedup
    * (LSH-bucket the vectors via [[lshTopK]]'s machinery at scale). */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** IVF-style ANN: a coarse quantizer (deterministic centroids — the
    * `nCentroids` lowest-id vectors; production swaps in k-means
    * iterations, same plumbing) assigns every vector to its best
    * centroid bucket; queries probe their `nProbe` best buckets and
    * exact-cosine-rerank only those candidates. Complements the
    * hyperplane-LSH path: IVF buckets adapt to the data distribution,
    * LSH needs no training pass. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int = 3,
              nCentroids: Int = 16, nProbe: Int = 3): DataFrame = {
    val cents = df.orderBy(col(idCol)).limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    // (score, centroid) per centroid, sorted descending by score
    def scores(vec: Column): Column = reverse(array_sort(
      array(cents.zipWithIndex.map { case (w, ci) =>
        struct(dot(vec, array(w.map(lit): _*)).as("s"), lit(ci).as("c"))
      }: _*)))
    val indexed = v.withColumn("bucket",
      element_at(scores(col("vec")), 1).getField("c"))
    val probes = v.select(col("id"), col("vec"), col("nrm"),
      explode(transform(slice(scores(col("vec")), 1, nProbe),
        e => e.getField("c"))).as("bucket"))
    val cand = probes.as("q").join(
        indexed.select(col("id").as("neighbor"), col("vec").as("vb"),
          col("nrm").as("nb"), col("bucket")).as("x"), Seq("bucket"))
      .where(col("id") =!= col("neighbor"))
      .select(col("id"), col("neighbor"),
        (dot(col("vec"), col("vb")) / (col("nrm") * col("nb")))
          .as("cosine"))
      .dropDuplicates("id", "neighbor")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("cosine").desc, col("neighbor").asc)
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "rank", "neighbor", "cosine")
  }

  /** deterministic random hyperplanes: nTables × nPlanes × dim weights
    * in {-1,+1} from a seeded driver-side PRNG, embedded as literals. */
  private def planes(nTables: Int, nPlanes: Int, dim: Int, seed: Long)
      : IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(nTables)(IndexedSeq.fill(nPlanes)(
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)))
  }

  /** sign-bit bucket id of a vector under one table's hyperplanes. */
  private def bucket(vec: Column, table: IndexedSeq[Array[Double]]): Column =
    table.zipWithIndex.map { case (w, i) =>
      val wLit = array(w.map(lit): _*)
      when(dot(vec, wLit) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed ANN top-k: same output shape as [[cosineTopK]];
    * recall < 1 (measured in tests), cost bounded by bucket sizes.
    * `nPlanes` trades bucket granularity vs recall; `nTables` unions
    * independent bucketings to recover recall.
    *
    * Tuning: recall per table for angle θ is (1-θ/π)^nPlanes, so size
    * nPlanes ≈ log2(n / targetBucketSize) and recover recall with
    * nTables unions. Defaults favor moderate-similarity neighbors
    * (cos ≈ 0.5); for true near-duplicates (cos > 0.9) even
    * nPlanes = 16 keeps recall ≈ 1 with a handful of tables. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int = 3,
              dim: Int = 64, nPlanes: Int = 5, nTables: Int = 12,
              seed: Long = 42): DataFrame = {
    val ps = planes(nTables, nPlanes, dim, seed)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    // candidate pairs are deduped NARROW (ids only) before vectors are
    // re-attached — carrying vectors through the nTables-way bucket join
    // and deduping wide rows shuffles dim×nTables more bytes
    val bucketed = v.select(col("id"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"), bucket(col("vec"), ps(t)).as("b"))): _*))
        .as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = bucketed.as("x").join(bucketed.as("y"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("neighbor"))
      .distinct()
    val scored = cand
      .join(v.select(col("id"), col("vec").as("va"), col("nrm").as("na")),
        "id")
      .join(v.select(col("id").as("neighbor"), col("vec").as("vb"),
        col("nrm").as("nb")), "neighbor")
      .select(col("id"), col("neighbor"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "rank", "neighbor", "cosine")
  }
}
