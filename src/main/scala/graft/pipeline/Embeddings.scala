package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space operators beyond ANN (see [[Similarity]]): seeded
  * random projection for dimensionality reduction — the cheap JL-style
  * shrink (Achlioptas, JCSS'03: ±1 entries suffice) applied before
  * clustering / coarse ANN so distance work costs k, not d,
  * multiply-adds per comparison.
  *
  * Scale + determinism shape: the k×d matrix is a pure function of the
  * seed (k·d ~ hundreds of doubles — expression-embedded, NOT data),
  * so the projection is a FIXED-size codegen'd row-local projection:
  * zero shuffle, no UDF, no broadcast, and a retried task or a resumed
  * job recomputes the identical matrix. Unlike data-dependent
  * constants (the IVF centroid lesson: literals that grow with the
  * DATA blow the codegen method limit), k·d is a design-time constant
  * independent of corpus size.
  *
  * Float-parity discipline: each output is a LEFT-ASSOCIATIVE chain
  * `((v₁·m₁ + v₂·m₂) + v₃·m₃) …` — both Spark's Column `+` fold and
  * SQL's `a + b + c` parse left-associative, so an oracle built from
  * the SAME matrix literals reproduces the IEEE sum bit-for-bit
  * (no order-dependent aggregation anywhere), before the final
  * round(4).
  */
object Embeddings {

  /** deterministic ±1 (Rademacher) projection matrix from a seed. */
  def projectionMatrix(k: Int, d: Int, seed: Long)
      : Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k, d)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** projects a d-dim float-array column to k columns p0..p(k-1):
    * pᵢ = round((Σⱼ vⱼ·mᵢⱼ) / √k, 4). */
  def project(df: DataFrame, idCol: String, vecCol: String,
              k: Int, d: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1 && d >= 1)
    val m = projectionMatrix(k, d, seed)
    val inv = 1.0 / math.sqrt(k.toDouble)
    val cols = (0 until k).map { i =>
      val terms = (0 until d).map(j =>
        element_at(col(vecCol), j + 1).cast("double") * lit(m(i)(j)))
      round(terms.reduceLeft(_ + _) * lit(inv), 4).as(s"p$i")
    }
    df.select(col(idCol).as("id") +: cols: _*)
  }

  /** the identical projection as DuckDB SQL select-list items, built
    * from the SAME matrix (list indexing 1-based like element_at). */
  def projectSqlCols(vecExpr: String, k: Int, d: Int,
                     seed: Long = 42L): Seq[String] = {
    val m = projectionMatrix(k, d, seed)
    val inv = 1.0 / math.sqrt(k.toDouble)
    (0 until k).map { i =>
      val terms = (0 until d).map(j =>
        s"CAST($vecExpr[${j + 1}] AS DOUBLE) * ${m(i)(j)}")
        .mkString(" + ")
      s"round(($terms) * $inv, 4) AS p$i"
    }
  }
}
