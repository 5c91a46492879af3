package graft.tools

import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Diagnostic: per-row cost of the block-pruned IVF scorer vs the
  * exhaustive scan, at a centroid count where assignment dominates
  * (the √n default reaches nc ≈ 10³ by 10⁶ rows). Not part of the
  * driver contract; a builder tool.
  *
  *   sbt "runMain graft.tools.BenchIvfScorer [nc] [dim] [rows]"
  */
object BenchIvfScorer {
  def main(args: Array[String]): Unit = {
    val nc = if (args.length > 0) args(0).toInt else 4096
    val dim = if (args.length > 1) args(1).toInt else 64
    val rows = if (args.length > 2) args(2).toInt else 20000
    val nClusters = math.max(8, nc / 40)
    val cents = Array.tabulate(nc) { i =>
      val c = i % nClusters
      val raw = Array.tabulate(dim)(d =>
        math.sin(c * 131.0 + d * 17.0) +
          0.05 * math.sin(i * 31.0 + d * 7.0))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val sc = new graft.functions.IvfScorer(cents, 3, floatInput = false)
    val rnd = new scala.util.Random(42)
    val vecs = Array.fill(rows)(new GenericArrayData(
      cents(rnd.nextInt(nc)).map(x =>
        (x + 0.1 * rnd.nextGaussian()): Any)))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths
    vecs.take(2000).foreach(v => { sc.topBuckets(v); sc.topBucketsFlat(v) })
    for (round <- 1 to 3) {
      val tB = time(vecs.foreach(sc.topBuckets(_)))
      val tF = time(vecs.foreach(sc.topBucketsFlat(_)))
      println(f"round $round: blocked ${rows / tB}%.0f rows/s  " +
        f"flat ${rows / tF}%.0f rows/s  speedup ${tF / tB}%.2fx")
    }
  }
}
