package graft

/** Diagnostic runner for the differential fuzz corpus: replays every
  * fuzz_cases.json case and writes the FULL divergence report (ScalaTest
  * truncates assertion messages) to the given path. Test-scope tool, not
  * part of the library.
  *
  *   sbt "Test/runMain graft.FuzzProbe /tmp/fuzz_diffs.txt"
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/fuzz_diffs.txt"
    val spec = new FuzzParitySpec
    val diffs = spec.probeAll()
    val report = s"${diffs.size} divergences\n\n" + diffs.mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      report.getBytes("UTF-8"))
    println(s"${diffs.size} divergences -> $out")
    spec.spark.stop()
  }
}
