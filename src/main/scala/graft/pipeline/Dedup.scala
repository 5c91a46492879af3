package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for large-scale training-data pipelines: exact,
  * exact n-gram Jaccard (inverted-index join), MinHash+LSH (the 100 TB
  * path), and SimHash with banded Hamming search.
  *
  * Scale notes per operator:
  *  - exact: one hash-agg (map-side partial) — skew-safe, one shuffle.
  *  - ngram Jaccard: exact all-pairs via shingle inverted index — the
  *    shuffle is bounded by Σ df(gram)²; correct but quadratic in hot
  *    grams, so it is the AUDIT path. At scale run minhashLsh (candidates
  *    from banded signatures, exact verify on candidates only).
  *  - minhash: signatures/bands are pure SQL expressions (xxhash64 under
  *    HOF lambdas — codegen'd, no UDF); band join keys are 64-bit hashes
  *    so bucket skew is hash-bounded.
  *  - simhash: 64-bit signature from token hashes; near-dup pairs via
  *    4×16-bit band join (guarantees recall for Hamming distance ≤ 3) +
  *    bit_count verify.
  */
object Dedup {

  /** exact duplicate groups over a set of key columns: groups with
    * multiplicity > 1, with the minimal id as representative. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("first_id"))
      .where(col("n_dups") > 1)

  /** distinct word n-gram set per document (empty when too short). */
  def tokenNgrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (1 to n).map(j => element_at(toks, i + j)): _*))))
  }

  /** exact n-gram Jaccard similarity join: all pairs with J >= threshold.
    * Inverted-index self-join on shingles, common counts per pair, then
    * J = common / (|A| + |B| - common). Deterministic, no hashing. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(tokenNgrams(col(textCol), n)).as("g"))
    val sz = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a.g") === col("b.g") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sz.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sz.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "common", "sz_a", "sz_b", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the document's shingle hashes — pure SQL HOFs. */
  def minhashSignature(grams: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(grams, g => xxhash64(g, s))))

  /** MinHash+LSH near-dup pairs: banded signature buckets generate
    * candidates; exact Jaccard (array_intersect on the true shingle
    * sets) verifies — so precision is exact and only recall depends on
    * the (bands × rows) sensitivity curve. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val docs = df.select(col(idCol).as("id"),
        tokenNgrams(col(textCol), n).as("grams"))
      .where(size(col("grams")) > 0)
    val sig = docs.withColumn("sig",
      minhashSignature(col("grams"), numHashes))
    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          aggregate(slice(col("sig"), b * r + 1, lit(r)), lit(0L),
            (acc, v) => xxhash64(acc, v)).as("bh")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val g = docs.select(col("id"), col("grams"))
    cand
      .join(g.select(col("id").as("id_a"), col("grams").as("ga")), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("gb")), "id_b")
      .withColumn("common", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"),
        size(col("ga")).as("sz_a"), size(col("gb")).as("sz_b"),
        col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, the sign of the
    * sum of ±1 contributions from each token hash. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol).as("id"),
      explode(split(col(textCol), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"b$i"))
    val assembled = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    tokens.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs: 4×16-bit band join (complete for Hamming
    * distance ≤ 3 by pigeonhole) + exact bit_count verification. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash64(df, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
          .as("chunk"))): _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"),
        col("bb.chunk").as("chunk"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.chunk") === col("y.chunk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
