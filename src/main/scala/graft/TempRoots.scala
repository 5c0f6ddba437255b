package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped scratch root for queries that must round-trip
  * through a filesystem sink (q83 CSV, q97 shards, q109 epochs).
  *
  * One UUID directory per JVM, removed by a shutdown hook: repeated
  * Bench/Verify invocations within a session overwrite the same
  * subdirectories instead of stranding a fresh copy per call, two
  * concurrent sessions on the same testdata can never race
  * overwrite-vs-read on a shared stable path, and the session leaves
  * `/tmp` clean on exit. */
object TempRoots {

  lazy val root: Path = {
    val p = Files.createTempDirectory("graft_session_")
    // Runs concurrently with Spark's own shutdown hooks (ordering is
    // unspecified): a file Spark is still flushing can vanish mid-walk,
    // so cleanup is strictly best-effort — never let the hook thread die
    // partway and strand the directory tree above the failure point.
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(p)
      catch { case _: Throwable => () }))
    p
  }

  /** Absolute path of `sub` under the session root (not created). */
  def path(sub: String): String = root.resolve(sub).toString

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
