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

  private def sidecarFiles(state: String): Seq[String] = {
    val d = new java.io.File(s"$state/_graft_sidecar")
    if (!d.exists) Seq.empty
    else d.listFiles.map(_.getName).filterNot(_.endsWith(".tmp")).toSeq
  }

  test("sidecar retention: saves prune superseded versions; vacuum sweeps") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    DedupState.init(spark, spark.range(100)
      .select(sha2(concat(lit("c-"), col("id")), 256).as("content_hash")),
      state, prefixLen = 1)
    (0 until 9).foreach { b =>
      DedupState.probeAndAdvance(spark, state, spark.range(20)
        .select(col("id").as("doc_id"),
          concat(lit(s"r$b-"), col("id")).as("text")), b.toLong)
    }
    // 10 saves happened (init + 9 advances) but only the newest 2 pairs
    // may remain — superseded bitsets are O(4x corpus) dead weight
    val files = sidecarFiles(state)
    assert(files.count(_.endsWith(".bin")) <= 2 &&
      files.count(_.endsWith(".meta")) <= 2,
      s"retention must cap sidecar versions: ${files.mkString(",")}")
    // the state table itself is rolling ingest: write-path auto-compact
    // (opted in by init) keeps the per-dir small-file count bounded —
    // without it, 10 commits x 16 prefix dirs accrete one file per
    // batch per dir forever
    assert(GraftLog.history(spark, state).select("operation")
      .collect().map(_.getString(0)).contains("autocompact"),
      "rolling state must engage write-path compaction")
    // per hive PARTITION (h2=x), not per staging dir — each commit
    // stages under its own uuid, so the partition value is the unit
    // the compactor (and a reader's pruning) cares about
    val perDir = GraftLog.snapshot(spark, state)._1
      .groupBy(_.split('/').find(_.startsWith("h2=")).getOrElse(""))
      .values.map(_.size)
    assert(perDir.max < 9,
      s"auto-compact must bound per-partition files: max ${perDir.max}")
    // the survivor is still the current one: next load is steady-state
    val sc = DedupState.loadSidecar(spark, state)
    assert(sc.catchupVersions == 0 && !sc.rebuilt)
    // vacuum sweeps residue the save path missed (crashed writers,
    // adopted tables): manufacture two stale pairs below the newest
    val dir = new java.io.File(s"$state/_graft_sidecar")
    Seq(1L, 2L).foreach { v =>
      java.nio.file.Files.write(java.nio.file.Paths.get(
        dir.getPath, f"dedup-bloom-v$v%020d.bin"), Array[Byte](1))
      java.nio.file.Files.write(java.nio.file.Paths.get(
        dir.getPath, f"dedup-bloom-v$v%020d.meta"), Array[Byte](1))
    }
    assert(sidecarFiles(state).size >= 6)
    GraftLog.vacuum(spark, state, retainVersions = 10)
    val after = sidecarFiles(state)
    assert(after.count(_.endsWith(".bin")) == 2 &&
      after.count(_.endsWith(".meta")) == 2,
      s"vacuum must sweep superseded sidecars: ${after.mkString(",")}")
    assert(!DedupState.loadSidecar(spark, state).rebuilt,
      "the current sidecar must survive vacuum")
  }

  test("concurrent writers: interleaved advances never lose digests") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    DedupState.init(spark, spark.range(100)
      .select(sha2(concat(lit("c-"), col("id")), 256).as("content_hash")),
      state, prefixLen = 1)
    // two writers race the same state with disjoint novel docs; each
    // carries its OWN appId (the ledger is monotonic per appId)
    def batchDf(tag: String) = spark.range(30)
      .select((col("id") + (if (tag == "A") 0L else 1000L)).as("doc_id"),
        concat(lit(s"$tag-"), col("id")).as("text"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = Seq("A", "B").map { tag =>
      new Thread(() =>
        try { DedupState.probeAndAdvance(spark, state, batchDf(tag), 0L,
          appId = s"writer-$tag").collect(): Unit }
        catch { case t: Throwable => errs.add(t): Unit })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent advance failed: ${errs.peek()}")
    // exact state contents: seed + both batches' digests, no duplicates
    val stateH = GraftLog.read(spark, state)
      .select("content_hash").as[String].collect().toSeq
    assert(stateH.distinct.size == stateH.size, "state must stay unique")
    assert(stateH.size == 100 + 60, s"both writers' novels must land")
    // verdict stability: re-probing both batches now flags EVERY doc —
    // a lost sidecar merge would miss the other writer's digests and
    // re-admit them as novel
    val reprobe = DedupState.probeAndAdvance(spark, state,
      batchDf("A").unionByName(batchDf("B"))
        .withColumn("doc_id", col("doc_id") + 5000L), 99L).collect()
    assert(reprobe.length == 60 && reprobe.forall(_.getBoolean(2)),
      "all re-probed docs are duplicates of the raced state")
    assert(GraftLog.read(spark, state).count() == 160,
      "the duplicate re-probe must append nothing")
    // replayed batchId within one appId stays a no-op
    val v = GraftLog.latestVersion(spark, state)
    DedupState.probeAndAdvance(spark, state, batchDf("A"), 0L,
      appId = "writer-A")
    assert(GraftLog.latestVersion(spark, state) == v)
    // retention holds under racing too
    assert(sidecarFiles(state).count(_.endsWith(".bin")) <= 2)
  }

  test("GDPR erase: prefix-pruned delete, sidecar re-mint, erased " +
      "text re-admits fresh, neighbors undisturbed, re-erase no-ops") {
    import spark.implicits._
    val state = Staging.tempDir("graft_dstate_spec_") + "/digests"
    DedupState.init(spark, spark.range(400)
      .select(sha2(concat(lit("c-"), col("id")), 256).as("content_hash")),
      state, prefixLen = 1)
    // one erasure subject + one untouched neighbor, with known texts
    val subjectH = spark.range(1).select(
      sha2(lit("c-42"), 256).as("content_hash")).as[String].head()
    val files0 = GraftLog.snapshot(spark, state)._1.toSet
    val v0 = GraftLog.latestVersion(spark, state).get
    DedupState.erase(spark, state,
      Seq(subjectH).toDF("content_hash"))
    // (1) pruned delete: every file the commit removed OR added lives
    // in the subject's prefix dir — untouched partitions' files are
    // carried by reference, never rewritten
    val files1 = GraftLog.snapshot(spark, state)._1.toSet
    val touched = (files0 -- files1) ++ (files1 -- files0)
    val dir = s"h2=${subjectH.take(1)}/"
    assert(touched.nonEmpty && touched.forall(_.contains(dir)),
      s"erase must rewrite only the candidate prefix dir: $touched")
    // (2) the digest is gone from the state
    assert(GraftLog.read(spark, state)
      .filter(col("content_hash") === subjectH).count() == 0)
    // (3) sidecar re-minted AT the delete version: next load is
    // steady-state (no catch-up, no rebuild)
    val sc = DedupState.loadSidecar(spark, state)
    assert(sc.version > v0 && sc.catchupVersions == 0 && !sc.rebuilt,
      s"erase must re-mint the sidecar at the delete version: $sc")
    // (4) the erased text re-admits FRESH; the untouched neighbor's
    // twin still flags duplicate
    val batch = Seq((1L, "c-42"), (2L, "c-43")).toDF("doc_id", "text")
    val verdicts = DedupState.probeAndAdvance(spark, state, batch, 0L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(!verdicts(1L), "the erased text must be admitted fresh")
    assert(verdicts(2L), "an untouched digest must keep flagging")
    // re-admitted means IN the state again: a second submission dups
    val again = DedupState.probeAndAdvance(spark, state,
      Seq((3L, "c-42")).toDF("doc_id", "text"), 1L).collect()
    assert(again.head.getBoolean(2),
      "the re-admitted text must flag duplicate on re-submission")
    // (5) re-erasing a no-longer-present digest rewrites nothing
    DedupState.erase(spark, state, Seq("0" * 64).toDF("content_hash"))
    val hist = GraftLog.history(spark, state)
      .orderBy(col("version").desc).limit(2).collect()
    val delRow = hist.find(_.getString(1) == "delete").get
    assert(delRow.getInt(3) == 0,
      s"an all-miss erase must remove zero files: $delRow")
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
