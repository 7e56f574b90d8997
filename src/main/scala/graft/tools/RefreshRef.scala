package graft.tools

import scala.collection.mutable

/** Regenerates `bench_ref.json` so every committed reference time is
  * JUDGE-REPRODUCIBLE — the round-11 verdict measured several committed
  * entries 1.7–2.9× faster than its own fresh-JVM min-of-3 probes
  * (q34 0.376 committed vs 0.80–1.10 measured), which corrodes the
  * >2×-ref adjudication tripwire in [[graft.Bench]].
  *
  * Protocol (the double-confirmation the verdict asked for) — every
  * measurement is the JUDGE'S OWN probe shape: a SOLO fresh child JVM
  * running `graft.Bench` with `SPARK_GRAFT_ONLY=<one query>`,
  * `SPARK_GRAFT_CHILD=1`, min-of-3 in its own SparkContext. Batched
  * (multi-query-per-JVM) measurements were tried and rejected: a query
  * running after seven others sits on a JIT/codegen-warm JVM and reads
  * 3–5× faster than the judge's cold solo probe ever can — recording
  * warm numbers is precisely the committed optimism being fixed.
  *
  *  1. Each query is probed solo-fresh until TWO measurements agree
  *     within [[AgreeRatio]] (or both sit below [[TinySec]], where
  *     ratio noise is meaningless) — at least 2, at most 2+[[MaxSolo]]
  *     probes. The recorded value is the MAX of the agreeing pair: the
  *     conservative, reproducible choice.
  *  2. A query that never converges is recorded at the MEDIAN of all
  *     its measurements and listed under `"unstable"` so nobody
  *     mistakes it for a confirmed number.
  *  3. Lowering an existing entry by >1.5× is allowed only through the
  *     same double confirmation (always true by construction here) and
  *     is reported under `"lowered"` with the old value.
  *  4. The file is rewritten incrementally every [[FlushEvery]] queries
  *     (merged over prior entries), so an interrupted run still leaves
  *     a valid, partially-refreshed reference.
  *
  * The JSON header records the generation command, machine state
  * (loadavg + MemAvailable before/after), and this protocol, so a judge
  * can re-run the same thing. Query entries are emitted as
  * `"qNN":value` (no space — the exact shape `Bench.loadRef` parses).
  *
  * Run:
  * {{{
  * java -cp "target/scala-2.13/classes:/opt/spark/jars/ALL_JARS" \
  *   <add-opens from build.sbt> graft.tools.RefreshRef [out.json]
  * }}}
  * (ALL_JARS = the shell glob star; spelled out because Scala comments
  * nest and a literal slash-star would not parse.)
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32 — the driver runs Bench with
  * SPARK_GRAFT_CPUS=32, so reference times must come from the same
  * session shape).
  */
object RefreshRef {
  private val AgreeRatio = 1.3
  private val TinySec = 0.15
  private val MaxSolo = 3
  private val FlushEvery = 20

  private def machineState(): String = {
    def read(p: String): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
      catch { case _: Exception => "" }
    val load = read("/proc/loadavg").trim.split(" ").take(3).mkString(" ")
    val memKb = read("/proc/meminfo").linesIterator
      .find(_.startsWith("MemAvailable"))
      .flatMap(_.split("\\s+").lift(1)).getOrElse("?")
    s""""loadavg":"$load","mem_available_kb":"$memKb""""
  }

  /** One child `graft.Bench` JVM over `names`; returns full-name →
    * min-of-3 seconds parsed from the child's machine line. Same
    * process recipe as `Bench.freshProcessTime`: inherited classpath +
    * add-opens, SPARK_GRAFT_CHILD=1 so the child never recurses or
    * cleans scratch dirs.
    */
  private def childRun(names: Seq[String], sfDir: String,
      cpus: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val javaBin = sys.props("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xrunjdwp"))
    val cmd = (Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_ONLY", names.mkString(","))
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.environment().remove("SPARK_GRAFT_SHARED")
    pb.environment().put("SPARK_GRAFT_CHILD", "1")
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    try {
      val p = pb.start()
      // Drain stdout on its own thread — readAllBytes() on this thread
      // blocks until the child closes stdout, which made the waitFor
      // timeout below unreachable (a wedged child hung the refresh
      // forever instead of being destroyForcibly'd after 30 minutes).
      val outBuf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => {
        try p.getInputStream.transferTo(outBuf)
        catch { case _: Exception => () }
      })
      drain.setDaemon(true)
      drain.start()
      val done = p.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { p.destroyForcibly(); return Map.empty }
      drain.join(10000)
      if (p.exitValue() != 0) return Map.empty
      val out = outBuf.toString("UTF-8")
      // the full-names detail line carries "qNN_full_name":sec
      val re = """"(q[0-9]+_[a-z0-9_]+)":(-?[0-9.]+)""".r
      re.findAllMatchIn(out)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter { case (n, t) => names.contains(n) && t >= 0 }
        .toMap
    } catch { case _: Exception => Map.empty }
  }

  private def agree(a: Double, b: Double): Boolean =
    (a <= TinySec && b <= TinySec) ||
      (math.max(a, b) / math.max(math.min(a, b), 1e-9) <= AgreeRatio)

  /** First agreeing pair among the measurements, preferring the latest
    * (solo probes are the most trustworthy); None if no pair agrees.
    */
  private def confirmedValue(ms: Seq[Double]): Option[Double] = {
    val pairs = for {
      i <- ms.indices.reverse; j <- (0 until i).reverse
      if agree(ms(i), ms(j))
    } yield math.max(ms(i), ms(j))
    pairs.headOption
  }

  private def loadOld(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      """"(q[0-9]+)":\s*(-?[0-9.]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Exception => Map.empty }
  }

  private def shortKey(name: String): String = {
    val cut = name.indexOf('_')
    if (cut > 0) name.substring(0, cut) else name
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("bench_ref.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stateStart = machineState()
    // smoke-test knob: SPARK_GRAFT_REF_ONLY=q202,q206 refreshes a subset
    // (merged over the existing file, so a partial run never drops
    // entries); full runs leave it unset
    val only = sys.env.get("SPARK_GRAFT_REF_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    val old = loadOld(outPath)

    val unstable = mutable.ArrayBuffer.empty[String]
    val lowered = mutable.ArrayBuffer.empty[String]
    val failed = mutable.ArrayBuffer.empty[String]
    val done = mutable.LinkedHashMap.empty[String, Double]

    def strArr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    def flush(): Unit = {
      val stateEnd = machineState()
      // partial / subset runs merge over the existing entries; only a
      // COMPLETED full run replaces the file wholesale (so deleted
      // queries don't linger, but an interrupted run never drops any)
      val full = only.isEmpty && done.size == names.size
      val merged = if (full) done.toSeq else (old ++ done).toSeq
      val qJson = merged.sortBy(_._1)
        .map { case (k, t) => s""""$k":${BigDecimal(t).setScale(3, BigDecimal.RoundingMode.HALF_UP)}""" }
        .mkString("{", ",", "}")
      val json =
        s"""{
           |"source":"tools/RefreshRef: every value from SOLO fresh child JVMs (graft.Bench SPARK_GRAFT_ONLY=<query>, SPARK_GRAFT_CHILD=1, min-of-3, own SparkContext) probed until two measurements agree within ${AgreeRatio}x; recorded = MAX of the agreeing pair; <= ${2 + MaxSolo} probes per query; sf=$sfDir local[$cpus]",
           |"generated_by":"java -cp <classes:/opt/spark/jars/*> graft.tools.RefreshRef",
           |"generated_at":"${java.time.Instant.now()}",
           |"machine_start":{$stateStart},
           |"machine_end":{$stateEnd},
           |"complete":${done.size == names.size},
           |"unstable":${strArr(unstable.toSeq)},
           |"lowered":${strArr(lowered.toSeq)},
           |"failed":${strArr(failed.toSeq)},
           |"queries":$qJson
           |}""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        json.getBytes("UTF-8"))
    }

    names.zipWithIndex.foreach { case (name, idx) =>
      val k = shortKey(name)
      var ms = Seq.empty[Double]
      var value = Option.empty[Double]
      var probes = 0
      while (value.isEmpty && probes < 2 + MaxSolo) {
        probes += 1
        ms = ms ++ childRun(Seq(name), sfDir, cpus).get(name)
        if (ms.size >= 2) value = confirmedValue(ms)
      }
      val v = value.orElse {
        if (ms.isEmpty) { failed += k; None }
        else {
          unstable += k
          val s = ms.sorted
          Some(s(s.size / 2)) // median of what we saw
        }
      }
      v.foreach { t =>
        old.get(k).foreach { o =>
          if (o / math.max(t, 1e-9) > 1.5) lowered += s"$k:$o->${f"$t%.3f"}"
        }
        done += k -> t
      }
      System.err.println(s"[RefreshRef] ${idx + 1}/${names.size} $k: " +
        s"${ms.map(t => f"$t%.3f").mkString("/")} -> ${v.map(t => f"$t%.3f").getOrElse("FAILED")}" +
        (if (value.isEmpty && v.isDefined) " (UNSTABLE median)" else ""))
      if ((idx + 1) % FlushEvery == 0) flush()
    }
    flush()
    System.err.println(s"[RefreshRef] wrote ${done.size} entries to $outPath (unstable=${unstable.size}, lowered=${lowered.size}, failed=${failed.size})")
  }
}
