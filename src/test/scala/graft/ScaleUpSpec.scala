package graft

import graft.gen.ScaleUp
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** The 10×-replication generator behind the bench's scale-up sweep must
  * produce inputs whose WORK scales linearly — otherwise the sweep
  * measures a replication artifact, not the engine (ten byte-identical
  * copies would give every document 9 planted near-duplicates and make
  * pair outputs quadratic in the copy factor). */
class ScaleUpSpec extends SparkTestBase {

  test("scale-up: counts scale, violations scale, near-dup pairs scale " +
       "EXACTLY linearly (disjoint per-copy vocab), embedding geometry " +
       "preserved within copies") {
    val out = java.nio.file.Files.createTempDirectory("graft_sf1").toString
    ScaleUp.scaleDir(spark, "/root/testdata/sf0.001", out, 3)

    val d1 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val d3 = spark.read.parquet(s"$out/documents.parquet")
    assert(d3.count() == 3 * d1.count())
    // planted n_chars ≠ length(text) violations survive the token
    // suffix (n_chars shifts by the text-length delta)
    val mis1 = d1.where(col("n_chars") =!= length(col("text"))).count()
    val mis3 = d3.where(col("n_chars") =!= length(col("text"))).count()
    assert(mis3 == 3 * mis1, s"violation structure distorted: $mis3 vs 3*$mis1")

    // the load-bearing property: near-dup pair output is EXACTLY 3× —
    // within-copy shingle relations isomorphic (bijective token map),
    // cross-copy vocabularies disjoint (no planted twins)
    val p1 = Dedup.minhashLshPairs(d1, "doc_id", "text",
      n = 3, threshold = 0.5).count()
    val p3 = Dedup.minhashLshPairs(d3, "doc_id", "text",
      n = 3, threshold = 0.5).count()
    assert(p3 == 3 * p1, s"pair scaling broke: $p3 != 3 * $p1")

    // embeddings: cyclic dimension rotation preserves norms exactly,
    // so within-copy geometry is the original's
    val e1 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e3 = spark.read.parquet(s"$out/embeddings.parquet")
    assert(e3.count() == 3 * e1.count())
    def normSum(df: org.apache.spark.sql.DataFrame) =
      df.select(sum(round(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x * x), 3)).as("s")).head.getDouble(0)
    val base = normSum(e1)
    val copy1 = normSum(e3.where(col("vec_id") >= ScaleUp.KeyOff &&
      col("vec_id") < 2 * ScaleUp.KeyOff))
    assert(math.abs(base - copy1) < 1e-6,
      s"rotation changed norms: $base vs $copy1")

    // facts scale, dims stay 1×
    def n(dir: String, t: String) =
      spark.read.parquet(s"$dir/$t.parquet").count()
    assert(n(out, "lineitem") == 3 * n("/root/testdata/sf0.001", "lineitem"))
    assert(n(out, "events") == 3 * n("/root/testdata/sf0.001", "events"))
    assert(n(out, "part") == n("/root/testdata/sf0.001", "part"))
    graft.pipeline.GramCache.release()
  }
}
