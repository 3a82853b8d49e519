package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Central /tmp staging for every driver-facing query that lands files.
  *
  * Two contracts:
  *   - [[dir]] hands out ONE directory per (corpus, name) per JVM, so
  *     repeated Bench/Verify/spec invocations overwrite in place instead of
  *     leaking a fresh copy per call;
  *   - every directory created here is removed by a JVM shutdown hook, so
  *     repeated *runs* leave no residue either (round-4 advice: the staged
  *     tables accumulated under java.io.tmpdir across runs).
  */
object Staging {

  private val keyed =
    new scala.collection.concurrent.TrieMap[(String, String), String]
  private val created =
    new scala.collection.concurrent.TrieMap[Path, Unit]
  // dirs eligible for PER-QUERY reclaim ([[cleanupSince]]): only the
  // per-call heavy stagers opt in via [[scratchDir]]. Memoized staging
  // (operator-level getOrElseUpdate caches) must survive the whole JVM
  // — several registry queries read a sibling query's staged tables —
  // so plain [[tempDir]] dirs are reclaimed only by the shutdown hook.
  private val scratch =
    new scala.collection.concurrent.TrieMap[Path, Unit]

  // registered once, on first staging request
  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.keys.foreach(deleteRecursively)))

  /** A fresh tracked temp directory (removed on JVM exit). */
  def tempDir(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    created.put(p, ())
    p.toString
  }

  /** A fresh temp directory that a bench/verify harness may reclaim as
    * soon as the CURRENT query finishes ([[cleanupSince]]). For call
    * sites that stage fresh state on EVERY invocation (rolling-state
    * lifecycles, streaming harnesses) — the /tmp accumulators. Never
    * use for memoized (once-per-JVM) staging. */
  def scratchDir(prefix: String): String = {
    val t = tempDir(prefix)
    scratch.put(Paths.get(t), ())
    t
  }

  /** Snapshot of the tracked dirs — pair with [[cleanupSince]] to
    * reclaim one query's scratch right after its timing instead of at
    * JVM exit (a bench suite otherwise runs its last queries against a
    * /tmp holding the residue of every earlier one). */
  def snapshot: Set[Path] = created.keySet.toSet

  /** Delete (and stop tracking) every [[scratchDir]] created since
    * `before`; keyed and memoized staging is exempt. */
  def cleanupSince(before: Set[Path]): Unit =
    scratch.keys.filterNot(before).foreach { p =>
      deleteRecursively(p)
      scratch.remove(p)
      created.remove(p): Unit
    }

  /** One staging path per (corpus, name) per JVM. The returned path is a
    * child of the temp dir and does not exist yet — writers create it. */
  def dir(sfDir: String, name: String, prefix: String = "graft_stage_"): String =
    keyed.getOrElseUpdate((sfDir, name), tempDir(prefix) + s"/$name")

  private def deleteRecursively(root: Path): Unit =
    try {
      val f = root.toFile
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm))
        x.delete(): Unit
      }
      rm(f)
    } catch { case _: Throwable => () } // best-effort: shutdown path
}
