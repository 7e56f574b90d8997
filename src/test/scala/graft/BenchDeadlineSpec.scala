package graft

import org.scalatest.funsuite.AnyFunSuite

/** The un-killable-bench contract (the r13 verdict's #1 item), pinned as
  * a suite gate: whatever the wall-clock budget, a `graft.Bench` run must
  * exit 0 and print the tiny final machine line — with remaining queries
  * reported as SKIPPED when the internal deadline trips, never as
  * failures, and never by dying to the external timeout. Each case runs
  * Bench as a forked child JVM (the MemoryPressureSpec recipe) against
  * sf0.001 so the gate stays cheap.
  */
class BenchDeadlineSpec extends AnyFunSuite {

  private def runBench(extraEnv: Map[String, String],
      timeoutMin: Int = 10): (Int, String) = {
    import scala.jdk.CollectionConverters._
    val javaBin = sys.props("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xrunjdwp"))
    val cmd = (Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.environment().remove("SPARK_GRAFT_SHARED")
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    val outBuf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => {
      try p.getInputStream.transferTo(outBuf)
      catch { case _: Exception => () }
    })
    drain.setDaemon(true)
    drain.start()
    val done = p.waitFor(timeoutMin.toLong,
      java.util.concurrent.TimeUnit.MINUTES)
    if (!done) p.destroyForcibly()
    drain.join(10000)
    assert(done, "bench child timed out")
    (p.exitValue(), outBuf.toString("UTF-8"))
  }

  private def finalLine(out: String): String = {
    val l = out.linesIterator.filter(_.startsWith("{\"metric\":\"total\""))
      .toSeq
    assert(l.nonEmpty, s"no final machine line in:\n${out.takeRight(1500)}")
    l.last
  }

  test("an exhausted deadline still exits 0 with everything reported skipped") {
    // DeadlineSec <= PrintReserve => zero work budget: every query must
    // be SKIPPED (not run, not failed) and the machine line still print
    val (rc, out) = runBench(Map(
      "SPARK_GRAFT_ONLY" -> "q01,q02,q03",
      "SPARK_GRAFT_DEADLINE_SEC" -> "1"))
    assert(rc == 0, s"rc=$rc\n${out.takeRight(1200)}")
    val line = finalLine(out)
    assert(line.contains("\"nq\":0"), line)
    assert(line.contains("\"nskipped\":3"), line)
    assert(line.contains("\"nfailed\":0"), line)
    // the contention-asterisk field is always present (r14 verdict #5)
    assert(line.contains("\"nsuspect\":"), line)
    assert(line.contains("\"suspect\":["), line)
  }

  test("a comfortable deadline measures everything and skips nothing") {
    val (rc, out) = runBench(Map(
      "SPARK_GRAFT_ONLY" -> "q01,q02",
      "SPARK_GRAFT_DEADLINE_SEC" -> "600",
      "SPARK_GRAFT_RERUN_BUDGET_SEC" -> "0")) // no child re-runs: fast gate
    assert(rc == 0, s"rc=$rc\n${out.takeRight(1200)}")
    val line = finalLine(out)
    assert(line.contains("\"nq\":2"), line)
    assert(line.contains("\"nskipped\":0"), line)
    assert(line.contains("\"nfailed\":0"), line)
    assert(line.contains("\"nsuspect\":"), line)
    // the per-query chunked map is present and parseable before the line
    assert(out.linesIterator.exists(_.startsWith("{\"detail\":\"queries-")),
      out.takeRight(1200))
  }
}
