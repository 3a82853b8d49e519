package graft

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Explicit release handle for the frames operators persist for
  * intra-query reuse (LSH signatures, shingle sets, edge lists …).
  *
  * The dedup/similarity operators persist a frame when two consumers in
  * the SAME query plan read it (e.g. both sides of a candidate self-join);
  * the cache must outlive plan CONSTRUCTION and drain during the caller's
  * materializing action, so the operator itself can never unpersist.
  * Verify/Bench release with a blanket `spark.catalog.clearCache()` per
  * query, but a library consumer embedding one operator in a larger job
  * must not nuke the whole application cache. This is the scoped
  * alternative:
  *
  * {{{
  *   val pairs = CacheScope.withScope {
  *     Dedup.ppjoin(spark, dir).collect()   // sized-frame cache drains here
  *   }                                       // … and is unpersisted here
  * }}}
  *
  * Outside any scope, `tracked` is persist-only — exactly the old
  * behavior, with the session owner's clearCache as the release. Scopes
  * nest (a scope releases only its own frames) and are thread-local,
  * matching Spark's thread-confined plan construction.
  */
object CacheScope {

  private val active = new ThreadLocal[mutable.Buffer[Dataset[_]]]

  /** Persist `ds` (MEMORY_AND_DISK — every tracked frame is an
    * intermediate far smaller than its input, but "memory only" would
    * silently recompute under pressure) and register it with the
    * innermost scope, if one is open. Designed for `.transform(...)`
    * chaining. */
  def tracked[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    Option(active.get()).foreach(_ += p)
    p
  }

  /** Run `body`; afterwards unpersist every frame tracked inside it
    * (blocking=false: release is async, correctness never depends on it).
    * Unpersisting a frame the body already released is a harmless
    * no-op, so iterative operators may still unpersist superseded
    * intermediates eagerly inside a scope. */
  def withScope[T](body: => T): T = {
    val outer = active.get()
    val buf = mutable.Buffer.empty[Dataset[_]]
    active.set(buf)
    try body
    finally {
      buf.foreach { ds =>
        try ds.unpersist() catch { case _: Throwable => () }
      }
      active.set(outer)
    }
  }
}
