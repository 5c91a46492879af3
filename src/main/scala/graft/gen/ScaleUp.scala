package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N replication of the driver tables — the 10× input
  * for the bench's scale-up sweep (there is no sf1 test directory; the
  * round-4 brief asks the same queries to be evidenced at 10× the
  * sf0.1 data, synthesized deterministically, no external data).
  *
  * Naive replication would be WRONG for the dedup/ANN queries: ten
  * byte-identical copies make every document 9 planted near-duplicates,
  * so pair outputs and LSH-bucket collision work grow quadratically in
  * the copy factor — measuring the duplication artifact, not the
  * engine. Each copy is therefore mapped into its own disjoint space:
  *
  *  - keys (doc_id, vec_id, event_id, user_id, l_orderkey, o_orderkey)
  *    shift by copy·10⁸ — disjoint key ranges, group structure within a
  *    copy preserved exactly;
  *  - document TEXT gets a per-copy token suffix (`tok` → `tok_c3`):
  *    a bijection on the token vocabulary, so within-copy shingle-set
  *    relations (Jaccard, minhash, simhash) are isomorphic to the
  *    original while cross-copy vocabularies are disjoint — pair
  *    outputs scale exactly linearly; n_chars shifts by the text-length
  *    delta so the planted n_chars≠length(text) violations survive;
  *  - EMBEDDINGS get a per-copy cyclic dimension rotation: norms and
  *    all within-copy angles are preserved exactly, cross-copy cosines
  *    become ~random — neighbor structure per copy is the original's;
  *  - dimension tables (region…part) stay 1×: a 10× corpus does not
  *    grow its reference catalogs, and the referential checks should
  *    keep probing realistic dim sizes (fact scaled, dim broadcast).
  */
object ScaleUp {

  /** per-copy key shift — public so tests/tools can slice copies. */
  val KeyOff = 100000000L

  def scaleDir(s: SparkSession, srcDir: String, outDir: String,
               factor: Int): Unit = {
    Seq("region", "nation", "customer", "supplier", "part").foreach {
      tn =>
        s.read.parquet(s"$srcDir/$tn.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$tn.parquet")
    }

    def copies(tn: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = s.read.parquet(s"$srcDir/$tn.parquet")
      (0 until factor).map(i => f(base, i))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$tn.parquet")
    }

    copies("documents") { (d, i) =>
      if (i == 0) d
      else {
        val newText =
          regexp_replace(col("text"), "(\\S+)", "$1_c" + i)
        d.select(
          (col("doc_id") + i * KeyOff).as("doc_id"),
          newText.as("text"),
          col("lang"), col("source"),
          (col("n_chars") + length(newText) - length(col("text")))
            .as("n_chars"))
      }
    }

    val dim = s.read.parquet(s"$srcDir/embeddings.parquet")
      .head.getSeq[Float](1).size
    copies("embeddings") { (d, i) =>
      if (i == 0) d
      else d.select(
        (col("vec_id") + i * KeyOff).as("vec_id"),
        array((0 until dim).map(j =>
          element_at(col("embedding"), ((j + i) % dim) + 1)): _*)
          .as("embedding"),
        col("label"))
    }

    copies("events") { (d, i) =>
      if (i == 0) d
      else d.withColumn("event_id", col("event_id") + i * KeyOff)
        .withColumn("user_id", col("user_id") + i * KeyOff)
    }

    copies("lineitem") { (d, i) =>
      if (i == 0) d
      else d.withColumn("l_orderkey", col("l_orderkey") + i * KeyOff)
    }

    copies("orders") { (d, i) =>
      if (i == 0) d
      else d.withColumn("o_orderkey", col("o_orderkey") + i * KeyOff)
    }
  }
}
