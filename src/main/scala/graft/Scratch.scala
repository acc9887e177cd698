package graft

import java.nio.file.{Files, Path, Paths}

/** Temp-dir hygiene for the streaming/bench entries that stage parquet
  * copies or checkpoints under /tmp (t18, t27, t29, t30, t33, s22, the
  * bench export). r8 advice: these dirs were never deleted, so repeated
  * Verify/bench runs accumulated unbounded /tmp usage on the gate host.
  *
  * Every dir is registered with a single JVM shutdown hook that deletes
  * it recursively — shutdown-time (not eager) cleanup is deliberate:
  * several entries RETURN DataFrames that lazily read the staged files
  * or the state-store checkpoint (t29's `format("statestore")` load), so
  * the data must outlive the entry function but not the process. Entries
  * whose staging is fully consumed before they return can additionally
  * call [[drop]] for eager reclamation.
  */
object Scratch {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = registered.iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }, "graft-scratch-cleanup"))

  /** Create a temp directory that is deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  /** Eagerly delete a scratch dir whose contents are fully consumed. */
  def drop(dir: String): Unit = deleteRecursively(Paths.get(dir))

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try { Files.deleteIfExists(f); () }
            catch { case _: Throwable => () })
        finally walk.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
