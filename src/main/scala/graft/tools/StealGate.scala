package graft.tools

/** Shared steal-aware timing for the bench tools. The host is a VM
  * whose hypervisor steals CPU in minutes-scale bursts (observed up to
  * 29% of wanted-CPU, invisible to loadavg); every timed run therefore
  * records its /proc/stat steal fraction, and callers prefer
  * steal-clean samples. One definition so the field indexing, the 3%
  * cleanliness threshold and the extend/backoff discipline cannot
  * drift apart between graft.Bench and the diagnostic tools.
  */
object StealGate {

  /** a sample is "steal-clean" when ≤3% of its wanted CPU was stolen */
  val stealMax = 0.03

  /** (busy ticks, steal ticks) from the aggregate /proc/stat cpu line */
  def cpuTicks(): (Long, Long) = {
    val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      .trim.split("\\s+")
    (l(1).toLong + l(2).toLong + l(3).toLong, l(8).toLong)
  }

  /** (wall seconds, fraction of wanted-CPU stolen by the hypervisor
    * during the run — /proc/stat steal/(busy+steal) delta). */
  def timeSteal(f: => Unit): (Double, Double) = {
    val (b0, s0) = cpuTicks(); val t0 = System.nanoTime(); f
    val w = (System.nanoTime() - t0) / 1e9
    val (b1, s1) = cpuTicks()
    val (db, ds) = (b1 - b0, s1 - s0)
    (w, if (db + ds <= 0) 0.0 else ds.toDouble / (db + ds))
  }

  /** steal-gated min-of-N sampling: always run `minRuns` samples, then
    * keep extending (up to `maxRuns`, while `extend` holds) until at
    * least one sample is steal-clean. Steal bursts last tens of seconds
    * to minutes, so after a contaminated sample (once past the
    * mandatory minimum) waiting `backoffMs` beats burning the retry
    * budget inside the same burst (measured: 10 back-to-back retries
    * all landed dirty). Returns every (wall, steal) sample. */
  def gatedRuns(minRuns: Int, maxRuns: Int, backoffMs: Long = 12000,
                extend: => Boolean = true)(f: => Unit)
      : Seq[(Double, Double)] = {
    val runs = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    var i = 0
    def continuing(next: Int): Boolean = next < maxRuns &&
      (next < minRuns || (extend && !runs.exists(_._2 <= stealMax)))
    while (continuing(i)) {
      runs += timeSteal(f)
      // only worth waiting out a burst if another sample will follow —
      // a sleep before guaranteed exit just burns the caller's budget
      if (runs.last._2 > stealMax && i >= minRuns - 1 && continuing(i + 1))
        Thread.sleep(backoffMs)
      i += 1
    }
    runs.toSeq
  }

  /** min wall time over the steal-clean samples, falling back to the
    * min over ALL samples when none were clean. */
  def minPreferClean(runs: Seq[(Double, Double)]): Double = {
    val clean = runs.filter(_._2 <= stealMax)
    (if (clean.nonEmpty) clean else runs).map(_._1).min
  }
}
