package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Versioned published artifacts under java.io.tmpdir — the lifecycle
  * layer above [[Staging.durableDir]] (VERDICT-r16 tasks 1/2 + the
  * serve-time-staleness ADVICE items).
  *
  * An artifact FAMILY is keyed by (token, dataset): `token` embeds every
  * BUILD PARAMETER (a parameter change must miss, never serve stale
  * state written under the old parameters) and `dataset` is the
  * normalized data-dir path. Within a family, each publish lands as a
  * new VERSION directory `graft_idx_<token>_<ds>__vNNNNN` — version N is
  * immutable once published (the atomic rename is the only mutation the
  * family ever sees), so version N+1 (a churn batch's re-publish, a
  * regenerated corpus) never touches N's bytes and a reader mid-serve on
  * N is undisturbed. Consumers select a version by CONTENT, not by
  * number: the caller matches each candidate's 1-row `meta` table
  * against a freshly recomputed corpus fingerprint, newest version
  * first, so
  *
  *  - a dataset regenerated in place under the same path simply misses
  *    every existing version (stale-serve ADVICE: the fingerprint is
  *    re-checked on EVERY first-serve-per-process, not only at build);
  *  - two processes racing the same publish land v1 and v2 with
  *    identical deterministic content — either serves;
  *  - a repair/churn publish (different fingerprint) coexists with the
  *    base build instead of clobbering it.
  *
  * Reclamation stays [[Staging]]'s: the `graft_idx_` prefix is
  * age-pruned (48 h) and never pid-pruned. Serving [[touch]]es the
  * version dir's mtime so an artifact in active use keeps renewing its
  * lease instead of being reaped under a long-lived process (ADVICE
  * r16); a consumer whose memoized dir vanished anyway (manual rm, a
  * concurrent prune) must re-resolve — callers guard with [[exists]].
  */
object Artifact {
  /** Normalized dataset key: the path with every non-alphanumeric
    * squashed, embeddable in a dir name and in parquet `ak` columns. */
  def dsKey(dataDir: String): String =
    Paths.get(dataDir).toAbsolutePath.normalize.toString
      .replaceAll("[^a-zA-Z0-9]", "_")

  /** Unique publication key, written into the artifact's `meta` (and any
    * row-level keying column) at stage time — publish-unique so a
    * DuckDB-side glob over the whole family can select exactly one
    * version's rows (`WHERE ak = (SELECT ak FROM meta ... LIMIT 1)`)
    * even when two versions share a fingerprint (identical content). */
  def newAk(ds: String): String =
    s"${ds}__p${ProcessHandle.current().pid()}_${System.nanoTime().toHexString}"

  private def tmp: Path = Paths.get(System.getProperty("java.io.tmpdir"))

  private def familyPrefix(token: String, ds: String): String =
    s"graft_idx_${token}_${ds}__v"

  /** All published versions of the family, newest first: (version, dir). */
  def versions(token: String, ds: String): Seq[(Int, String)] = {
    val pfx = familyPrefix(token, ds)
    if (!Files.exists(tmp)) return Nil
    val s = Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(pfx))
        .flatMap { p =>
          val v = p.getFileName.toString.stripPrefix(pfx)
          try Some((v.toInt, p.toString)) catch { case _: NumberFormatException => None }
        }
        .toSeq.sortBy(-_._1)
    } finally s.close()
  }

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir))

  /** Renew the age-based reclamation lease of a version being served. */
  def touch(dir: String): Unit =
    try Files.setLastModifiedTime(Paths.get(dir),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Throwable => () }

  /** First (newest) version whose meta the caller accepts — touched so
    * active artifacts keep their reclamation lease. */
  def resolve(token: String, ds: String)(metaMatches: String => Boolean): Option[String] =
    versions(token, ds).collectFirst {
      case (_, dir) if metaMatches(dir) => touch(dir); dir
    }

  /** Publish a new version: `write` fills a durable scratch dir, which
    * is then atomically renamed to the next free version slot. Losing a
    * rename race (another process landed that slot first) retries the
    * NEXT slot — never discards, because the racer may be publishing
    * different content (a repair vs a base build); content-level dedup
    * is the reader's fingerprint match, not the writer's. Returns the
    * final version dir. */
  def publish(token: String, ds: String)(write: String => Unit): String = {
    val stage = Staging.durableDir(s"${token}stage", ds)
    write(stage)
    var ver = versions(token, ds).headOption.map(_._1).getOrElse(0) + 1
    var out: String = null
    while (out == null) {
      val target = tmp.resolve(f"${familyPrefix(token, ds)}$ver%05d")
      try {
        Files.move(Paths.get(stage), target, StandardCopyOption.ATOMIC_MOVE)
        out = target.toString
      } catch {
        case _: java.io.IOException if Files.exists(target) => ver += 1
        case e: java.io.IOException =>
          // rename failed for a non-collision reason: clean the scratch
          deleteRecursively(Paths.get(stage)); throw e
      }
    }
    out
  }

  /** Retention for a family: delete every version the caller does NOT
    * recognize as serving live corpus state, provided it has also aged
    * past `graceMs` since its last serve (every serve [[touch]]es the
    * version dir, so the mtime IS the serve lease — a version another
    * long-lived process is actively reading keeps renewing itself and
    * is never reaped, the same discipline that protects artifacts from
    * [[Staging]]'s 48 h prune). Returns the reclaimed dirs. This is the
    * lifecycle's REAP step: publish → serve → churn re-publish → retain;
    * without it a 100 TB store accretes one superseded adjacency per
    * corpus regeneration forever. Callers pass the same content check
    * they serve with (fingerprint-match against the live corpus), e.g.
    * {{{ Artifact.retain(gsIdxToken, ds)(dir => fps.exists(gsMetaMatches(s, dir, _, n))) }}} */
  def retain(token: String, ds: String, graceMs: Long = 3600000L)(
      serving: String => Boolean): Seq[String] = {
    val cutoff = System.currentTimeMillis() - graceMs
    versions(token, ds).collect {
      case (_, dir) if !serving(dir) &&
          (try Files.getLastModifiedTime(Paths.get(dir)).toMillis < cutoff
           catch { case _: Throwable => false }) =>
        deleteRecursively(Paths.get(dir)); dir
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      finally s.close()
    }
}
