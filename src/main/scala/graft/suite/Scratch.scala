package graft.suite

/** Per-invocation scratch directories for suite queries that round-trip
  * through a materialized on-disk artifact (bucketed tables, format
  * sinks, the persisted minhash index).
  *
  * Each call returns a UNIQUE directory, so two concurrent harness runs
  * over the same dataset can never race on a shared path (the r9 advice
  * on q131: mode-overwrite while the other run reads). Directories still
  * live under java.io.tmpdir with the `graft_` prefix, so Bench's
  * startup cleanScratch reclaims anything a crashed JVM leaves behind.
  *
  * Cleanup is a JVM shutdown hook, not in the query builder: the builder
  * returns a LAZY plan that reads the directory, and the consumer forces
  * it only after the builder has returned — deleting inline would pull
  * the artifact out from under the plan.
  */
object Scratch {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      live.forEach(delete(_))
    }))

  /** A fresh empty directory under java.io.tmpdir, deleted at JVM exit. */
  def fresh(prefix: String): String = {
    hookInstalled
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    live.add(dir)
    dir.getAbsolutePath
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }
}
