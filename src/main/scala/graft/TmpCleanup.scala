package graft

/**
 * Recursive-delete shutdown hook for per-process temp artifacts (the
 * durable-index and JSONL-fixture query surfaces write real files),
 * registered at most once per path: eager deletion would yank files out
 * from under a returned lazy plan, so cleanup waits for JVM exit; a
 * crash leaves at most one pid's copy for tmp reapers.
 */
object TmpCleanup {
  private val paths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.forEach { p =>
        val dir = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }))

  def register(path: String): Unit = {
    hook
    paths.add(path)
  }

  /** Recursive delete of a temp artifact dir NOW (query surfaces rebuild
    * their per-process dirs on re-entry — bench warm-up + timed passes
    * must not re-append). One implementation instead of a copy per call
    * site; `Files.walk` is closed via Using (it holds DirectoryStream
    * fds — materialize inside, delete after). */
  def wipe(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.iterator().asScala.toSeq.reverse
      }.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Per-(process, key) temp dir path — the pid suffix keeps concurrent
    * graft processes on the same fixture from deleting each other's
    * artifacts mid-read; the fixed key-hash suffix makes repeated runs
    * within one process rebuild in place instead of leaking copies. */
  def perProcessDir(prefix: String, key: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      prefix + "-" + ProcessHandle.current().pid() + "-" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString).toString
}
