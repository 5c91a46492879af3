package graft

/** Diagnostic runner for the fn-contract differential fuzz corpus:
  * replays every fuzz_fn_cases.json case and writes the FULL divergence
  * report (ScalaTest truncates assertion messages) to the given path.
  * Test-scope tool, not part of the library.
  *
  *   sbt "Test/runMain graft.FuzzFnProbe /tmp/fuzz_fn_diffs.txt"
  */
object FuzzFnProbe {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/fuzz_fn_diffs.txt"
    val spec = new FuzzFnParitySpec
    val diffs = spec.probeAll()
    val report = s"${diffs.size} divergences\n\n" + diffs.mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      report.getBytes("UTF-8"))
    println(s"${diffs.size} divergences -> $out")
    spec.spark.stop()
  }
}
