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
}
