package graft.sources

import java.nio.file.{Files, Path}

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
