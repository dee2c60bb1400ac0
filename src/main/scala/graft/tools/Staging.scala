package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

/** Lifecycle for the pattern-write roundtrip staging dirs (ADVICE r14):
  * graph_pattern_create / _delete / _detach_delete write their post-write
  * relations to parquet under java.io.tmpdir keyed by (dataset, pid) — a
  * REAL sink write, intentionally inside the timed bench pass (the
  * write→read cycle IS the operator under test) — but the dirs were
  * never removed, so every driver/bench/test process accumulated temp
  * data. Two mechanisms close the leak:
  *
  *  - every dir handed out by [[dir]] is registered with a JVM shutdown
  *    hook that removes it recursively on normal exit;
  *  - the FIRST [[dir]] call of a process prunes stale siblings: any
  *    `graft_pat_*_<pid>` under tmpdir whose pid is no longer alive is
  *    an orphan from a crashed/killed process and is deleted (a live
  *    concurrent process's dirs are left alone — the pid key exists
  *    precisely so concurrent sbt test / bench JVMs never clobber each
  *    other's in-flight writes).
  */
object Staging {
  private val registered = ConcurrentHashMap.newKeySet[String]()
  private val hooked = new AtomicBoolean(false)
  private val pruned = new AtomicBoolean(false)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      finally s.close()
    }

  /** The per-(kind, dataset, pid) staging dir, registered for cleanup. */
  def dir(kind: String, dataset: String): String = {
    if (pruned.compareAndSet(false, true)) pruneStale()
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        registered.forEach(d =>
          try deleteRecursively(Paths.get(d)) catch { case _: Throwable => () })))
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_pat_${kind}_" +
      s"${dataset.replaceAll("[^a-zA-Z0-9]", "_")}_${ProcessHandle.current().pid()}"
    registered.add(d)
    d
  }

  /** Remove graft_pat_* dirs whose trailing pid is dead (crash leftovers). */
  private def pruneStale(): Unit =
    try {
      val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
      val self = ProcessHandle.current().pid()
      val s = Files.list(tmp)
      try s.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("graft_pat_")) {
          val pid = name.substring(name.lastIndexOf('_') + 1)
          val alive =
            try pid.toLong == self || ProcessHandle.of(pid.toLong)
              .map[Boolean](_.isAlive).orElse(false)
            catch { case _: NumberFormatException => true } // not ours; leave it
          if (!alive)
            try deleteRecursively(p) catch { case _: Throwable => () }
        }
      } finally s.close()
    } catch { case _: Throwable => () }
}
