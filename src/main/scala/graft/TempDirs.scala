package graft

/** Session-temp directory registry: operators that persist sidecars or
  * staged clones under `java.io.tmpdir` (the LSH band/delta-pair
  * indexes, cluster-label sidecars, staged-clone templates and final
  * clones) register their roots here, and ONE JVM shutdown hook removes
  * everything on exit — bounding temp-disk growth to the live session
  * instead of accumulating one tree per session forever. Registration
  * is idempotent and deletion is quiet (an eagerly-retired clone is
  * simply absent by then). Failure to clean costs disk, never
  * correctness — no engine state survives a session by design (the
  * in-memory path memos die with the JVM).
  */
object TempDirs {
  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(
    () => {
      val it = roots.iterator()
      while (it.hasNext)
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(it.next()))
    },
    "graft-tempdir-cleanup"))

  /** Register `path` for removal at JVM exit; returns it for chaining. */
  def register(path: String): String = {
    roots.add(path)
    path
  }
}
