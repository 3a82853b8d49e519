package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NearDupState
import graft.sources.{GraftLog, Sources, Staging}

/** Persisted rolling near-dup state (e20): twins flag against the
  * CURRENT state, the state advances by kept docs only, the sidecar
  * stays in steady state, and replays ledger-no-op. */
class NearDupStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rolling probe: twins flag, kept-only advance, idempotent replay") {
    val docs = Sources.testTable(spark, TestSpark.sf, "documents")
    val state = Staging.tempDir("graft_ndspec_") + "/bands"
    NearDupState.init(spark, docs.filter(col("doc_id") < 100), state)
    // batch 1: novel docs + exact twins of two seed docs
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
      .select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id").isin(3L, 7L))
        .select((col("doc_id") + 9000).as("doc_id"), col("text")))
    val v1 = NearDupState.probeAndAdvance(spark, state, b1, 0L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(v1(9003L) && v1(9007L), "seed twins must flag near-dup")
    // near-dup docs are NOT added: a twin OF THE TWIN still flags
    // against the seed original, not against two copies
    val sizeAfterB1 = GraftLog.read(spark, state)
      .select("doc_id").distinct().count()
    val b2 = docs.filter(col("doc_id").isin(120L, 3L))
      .select((col("doc_id") + 20000).as("doc_id"), col("text"))
    val v2 = NearDupState.probeAndAdvance(spark, state, b2, 1L)
      .collect().map(r =>
        r.getLong(1) -> (r.getBoolean(4), r.getLong(2))).toMap
    assert(v2(20120L)._1, "batch-1 novel doc's twin must flag (state advanced)")
    assert(v2(20003L)._1 && v2(20003L)._2 == 1L,
      "seed twin flags against exactly the ONE kept representative")
    // steady state: the sidecar at the current version, no rebuild
    val sc = NearDupState.loadSidecar(spark, state)
    assert(!sc.rebuilt, "steady-state load must not rebuild")
    // replay of an applied batch: verdicts recompute, state unmoved
    val vBefore = GraftLog.latestVersion(spark, state)
    NearDupState.probeAndAdvance(spark, state, b2, 1L).count()
    assert(GraftLog.latestVersion(spark, state) == vBefore,
      "ledger must reject the replayed batch")
    assert(GraftLog.read(spark, state).select("doc_id").distinct()
      .count() >= sizeAfterB1)
  }
}
