package graft

/** Per-process scratch space for queries that write-then-read /tmp
  * data: unique per JVM (no cross-process overwrite races) and removed
  * on exit (no unbounded /tmp growth across bench/verify runs). */
object Scratch {
  private lazy val base: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
      finally walk.close()
    }
  }

  /** Absolute path `<process-temp>/<tag>` (not created — writers own
    * creation semantics, e.g. Spark's overwrite mode). */
  def path(tag: String): String = base.resolve(tag).toString

  /** Remove one scratch entry (recursively). For STATEFUL scratch data
    * — e.g. a signature table that accumulates appends — whose owner
    * must rebuild from a clean slate to stay deterministic across
    * reruns in one JVM. */
  def remove(tag: String): Unit = deleteRecursively(base.resolve(tag))

  private val clearHooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Register a hook run by [[clear]] — memo caches that hold paths
    * into the scratch space register here so clearing the files also
    * drops the pointers to them. */
  def onClear(hook: () => Unit): Unit = clearHooks.add(hook)

  /** Drop every scratch file and run the registered memo-invalidation
    * hooks. The explicit lifecycle hook for long-lived JVMs: memoized
    * materializations (components, signature tables) are keyed by
    * input content-version, so a REGENERATED input at the same path
    * gets a fresh memo automatically — clear() is for reclaiming the
    * space or forcing a cold start. */
  def clear(): Unit = {
    clearHooks.forEach(h => h())
    val dir = java.nio.file.Paths.get(base.toString)
    if (java.nio.file.Files.exists(dir)) {
      val walk = java.nio.file.Files.list(dir)
      try walk.forEach(deleteRecursively)
      finally walk.close()
    }
  }
}
