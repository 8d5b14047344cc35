package graft

/** Shutdown-hook temp-dir janitor for specs that write parquet
  * fixtures under java.io.tmpdir (ADVICE r15: FusionCurveSpec /
  * UnigramSpec fixtures accumulated across test runs). deleteOnExit
  * can't remove non-empty directories, so a single JVM shutdown hook
  * walks each registered root deepest-first. */
object TestTmp {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(p => deleteRecursively(p))
  }, "graft-test-tmp-janitor"))

  /** Create a temp directory that is removed (recursively) at exit. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Register an externally-created path for exit-time removal (e.g.
    * a trained-artifact directory a test caused to be published). */
  def register(path: String): String = {
    dirs.add(java.nio.file.Paths.get(path))
    path
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
    } catch { case _: Throwable => () }
}
