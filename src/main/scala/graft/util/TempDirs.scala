package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** JVM-exit cleanup for scratch directories (e.g. throwaway IVF index
  * layouts built inside a query). `File.deleteOnExit` cannot remove
  * non-empty directories, so registered paths are deleted recursively by
  * a single shutdown hook. Registration is idempotent; deletion failures
  * are swallowed (exit-path best effort).
  */
object TempDirs {
  private val registered = scala.collection.mutable.LinkedHashSet.empty[String]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))

  def register(dir: String): String = synchronized {
    hookInstalled
    registered += dir
    dir
  }

  private def deleteAll(): Unit = synchronized {
    registered.foreach { d =>
      try {
        val p = Paths.get(d)
        if (Files.exists(p)) {
          // the walk stream holds a directory handle — close it even on
          // the exit path (the hook may outlive many registered dirs)
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
          finally walk.close()
        }
      } catch { case _: Exception => () }
    }
    registered.clear()
  }
}
