package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupState
import graft.sources.{GraftLog, Sources, Staging}

/** O(batch) rolling dedup state (e19): verdict correctness vs the
  * exact recomputation, the prefix-pruned probe plan, sidecar
  * steady-state (zero catch-up, zero rebuild per batch), the
  * catch-up fold after an out-of-band writer, and ledger idempotence. */
class DedupStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scansOf(df: org.apache.spark.sql.DataFrame)
      : Seq[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    // descend through AQE wrappers and materialized query stages — a
    // joined probe plan buries its scans inside both
    def all(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec => all(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(all)
    }
    all(df.queryExecution.executedPlan)
  }

  test("e19 verdicts equal the exact replay; probe plan file-prunes") {
    import spark.implicits._
    val sf = TestSpark.sf
    val docs = Sources.testTable(spark, sf, "documents")
    val out = DedupState.dedupStateScalable(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    // exact recomputation (the oracle's semantics, in Spark)
    val corpus = docs.filter(col("doc_id") < 300)
      .select(sha2(col("text"), 256).as("h")).distinct()
      .as[String].collect().toSet
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 450)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .unionByName(docs
        .filter(col("doc_id") < 300 && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000).as("doc_id"),
          sha2(col("text"), 256).as("h")))
      .as[(Long, String)].collect()
    val state1 = corpus ++ b1.map(_._2)
    val b2 = docs.filter(col("doc_id") >= 450)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .unionByName(docs
        .filter(col("doc_id") >= 300 && col("doc_id") < 450 &&
          col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000).as("doc_id"),
          sha2(col("text"), 256).as("h")))
      .as[(Long, String)].collect()
    val expected =
      b1.map { case (id, h) => (0L, id) -> corpus.contains(h) } ++
      b2.map { case (id, h) => (1L, id) -> state1.contains(h) }
    assert(out.size == expected.length)
    expected.foreach { case (k, v) =>
      assert(out(k) == v, s"verdict mismatch at $k") }
  }

  test("prefix-partitioned probe scans only candidate prefixes' files") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    val digests = spark.range(2000)
      .select(sha2(concat(lit("doc-"), col("id")), 256)
        .as("content_hash"))
    DedupState.init(spark, digests, state, prefixLen = 1)
    val total = GraftLog.snapshot(spark, state)._1.size
    // candidates: three known digests → at most 3 of 16 prefixes
    val candH = digests.limit(3).as[String].collect()
    val cand = candH.toSeq
      .map(h => (h, h.take(1))).toDF("content_hash", "h2")
    val probe = DedupState.presentProbe(spark, state, cand)
    val stateScans = scansOf(probe).filter(_.relation.location
      .rootPaths.exists(_.toString.contains("dstate_spec")))
    assert(stateScans.nonEmpty, "probe plan must scan the state table")
    val scanned = stateScans.map(_.metrics("numFiles").value).sum
    assert(scanned < total,
      s"prefix pruning must drop files: scanned $scanned of $total")
    assert(probe.count() == 3, "all three candidates are present")
  }

  test("sidecar steady state: no catch-up, no rebuild between batches") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    DedupState.init(spark, spark.range(500)
      .select(sha2(concat(lit("c-"), col("id")), 256).as("content_hash")),
      state, prefixLen = 1)
    val sc0 = DedupState.loadSidecar(spark, state)
    assert(sc0.catchupVersions == 0 && !sc0.rebuilt,
      "fresh init must load current")
    val batch = spark.range(100)
      .select(col("id").as("doc_id"),
        concat(lit("b-"), col("id")).as("text"))
    DedupState.probeAndAdvance(spark, state, batch, 0L)
    val sc1 = DedupState.loadSidecar(spark, state)
    assert(sc1.catchupVersions == 0 && !sc1.rebuilt,
      s"the advance must roll the sidecar forward in the same step: " +
        s"catchup=${sc1.catchupVersions} rebuilt=${sc1.rebuilt}")
    assert(sc1.inserted == sc0.inserted + 100,
      "novel digests fold into the running count")
  }

  test("out-of-band append: catch-up fold, then dup verdicts see it") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    DedupState.init(spark, spark.range(200)
      .select(sha2(concat(lit("c-"), col("id")), 256).as("content_hash")),
      state, prefixLen = 1)
    // an external writer lands digests WITHOUT touching the sidecar
    val oob = spark.range(5)
      .select(sha2(concat(lit("oob-"), col("id")), 256)
        .as("content_hash"))
      .withColumn("h2", substring(col("content_hash"), 1, 1))
    GraftLog.appendPartitioned(oob, state, Seq("h2"))
    val sc = DedupState.loadSidecar(spark, state)
    assert(sc.catchupVersions == 1 && !sc.rebuilt,
      s"one missing version must fold, not rebuild: $sc")
    // a batch duplicating the out-of-band digests is fully flagged
    val dupBatch = spark.range(5)
      .select(col("id").as("doc_id"),
        concat(lit("oob-"), col("id")).as("text"))
    val verdicts = DedupState
      .probeAndAdvance(spark, state, dupBatch, 0L).collect()
    assert(verdicts.length == 5 && verdicts.forall(_.getBoolean(2)),
      s"catch-up must surface out-of-band digests: " +
        verdicts.mkString(","))
  }

  test("re-delivered batch id is a ledger no-op (state version fixed)") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    DedupState.init(spark, spark.range(50)
      .select(sha2(concat(lit("c-"), col("id")), 256).as("content_hash")),
      state, prefixLen = 1)
    val batch = spark.range(10)
      .select(col("id").as("doc_id"),
        concat(lit("n-"), col("id")).as("text"))
    DedupState.probeAndAdvance(spark, state, batch, 7L)
    val v1 = GraftLog.latestVersion(spark, state)
    val n1 = GraftLog.read(spark, state).count()
    DedupState.probeAndAdvance(spark, state, batch, 7L) // replay
    assert(GraftLog.latestVersion(spark, state) == v1,
      "replayed batch must not commit")
    assert(GraftLog.read(spark, state).count() == n1)
  }
}
