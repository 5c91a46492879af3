package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate documents (in a deterministic
  * order) and split the token stream into fixed-length sequences — the
  * "concat-and-chunk" step that turns a filtered corpus into model
  * input windows. Emits one row per (sequence × document-slice): which
  * token range of which doc lands at which offset of which sequence.
  *
  * Scale shape: packing is inherently sequential, so the corpus is
  * first split into `nShards` independent shards and each shard packs
  * its own token stream — ONE shuffle (hash-partition by shard), one
  * window (running token offset per shard), then a row-local explode
  * of each doc into the ≤ 1 + nTok/seqLen sequences it spans. Choose
  * nShards so a shard's documents fit a task comfortably (at 10¹²
  * docs: nShards ~ 10⁵-10⁶ ⇒ ~10⁶-10⁷ docs per window partition);
  * sequences are globally identified by (shard, seq_id) so no
  * cross-shard coordination exists at any size. The last sequence per
  * shard is ragged (padding/drop policy is the trainer's call — the
  * operator reports exact slice geometry and takes no policy).
  *
  * Determinism: shard assignment and within-shard order are pure
  * functions of the id column, so a retried task, a resumed job, and
  * an external replayer (the DuckDB oracle) produce byte-identical
  * packing. The default shard expression hashes the id
  * (`pmod(xxhash64(id), nShards)`) to stay balanced under clustered
  * ids; pass `shardExpr` to override (tests and the oracle use
  * `id % nShards`, replayable in any engine).
  */
object Packing {

  /** pack whitespace-token streams into `seqLen`-token sequences within
    * `nShards` deterministic shards. Output: one row per document-slice
    * — (shard, seq_id, id, tok_start, tok_end) with tok_end exclusive,
    * n_toks = slice length, seq_off = where the slice begins inside
    * the sequence. Every token of every doc appears in exactly one
    * slice; every sequence except a shard's last holds exactly seqLen
    * tokens. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, nShards: Int,
                    shardExpr: Option[Column] = None): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    require(nShards >= 1, "nShards must be >= 1")
    val shard = shardExpr.getOrElse(
      pmod(xxhash64(col(idCol)), lit(nShards)))
    // the base projection renames idCol to `id` — order by the alias
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
    val base = df.select(col(idCol).as("id"),
        shard.cast("bigint").as("shard"),
        size(split(col(textCol), " ")).cast("bigint").as("n_tok"))
      // running token offset of this doc inside its shard's stream
      .withColumn("off0", coalesce(
        sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding,
          -1)), lit(0L)))
    packFrom(base, seqLen)
  }

  /** Group-pure packing: like [[packSequences]], but no sequence ever
    * mixes documents from different `groupCols` values (language- or
    * domain-pure training sequences — mixing languages inside one
    * attention window is usually a data bug, not a choice). Each
    * (group, shard) packs its own stream; `nShards` still bounds the
    * window partition so one giant group (English) cannot serialize
    * through one task. */
  def packSequencesBy(df: DataFrame, groupCols: Seq[String],
                      idCol: String, textCol: String,
                      seqLen: Int, nShards: Int,
                      shardExpr: Option[Column] = None): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(seqLen >= 1 && nShards >= 1)
    val shard = shardExpr.getOrElse(
      pmod(xxhash64(col(idCol)), lit(nShards)))
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs :+ col("shard"): _*)
      .orderBy(col("id"))
    val base = df.select(
        gs ++ Seq(col(idCol).as("id"), shard.cast("bigint").as("shard"),
          size(split(col(textCol), " ")).cast("bigint")
            .as("n_tok")): _*)
      .withColumn("off0", coalesce(
        sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding,
          -1)), lit(0L)))
    packFrom(base, seqLen, groupCols)
  }

  /** shared tail: explode the running-offset projection into
    * per-(sequence × document-slice) rows. `base` must carry
    * (id, shard, n_tok, off0) plus any group columns. */
  private def packFrom(base: DataFrame, seqLen: Int,
                       groupCols: Seq[String] = Nil): DataFrame = {
    val L = lit(seqLen.toLong)
    val tokStart = greatest(col("seq_id") * L - col("off0"), lit(0L))
    val tokEnd = least((col("seq_id") + 1) * L - col("off0"),
      col("n_tok"))
    base
      // sequences this doc spans: off0 div L .. (off0+n-1) div L —
      // SQL `div` (integral long division) not floor(a/b): `/` on two
      // longs is IEEE double division, exact only below 2^53, and a
      // shard's running token offset is exactly the quantity this
      // operator lets grow unbounded (the DuckDB oracle's `//` is
      // exact integer division — the engines must agree bit-for-bit)
      .withColumn("seq_id", explode(sequence(
        expr(s"off0 div ${seqLen.toLong}"),
        expr(s"(off0 + n_tok - 1) div ${seqLen.toLong}"))))
      .select(groupCols.map(col) ++ Seq(col("shard"), col("seq_id"),
        col("id"), tokStart.as("tok_start"), tokEnd.as("tok_end"),
        (tokEnd - tokStart).as("n_toks"),
        // offset of the slice inside its sequence: where in [0, L)
        // this doc-slice's first token lands
        (col("off0") + tokStart - col("seq_id") * L)
          .as("seq_off")): _*)
  }
}
