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

  test("sidecar retention caps band-bloom versions; race reconciles") {
    import spark.implicits._
    val docs = Sources.testTable(spark, TestSpark.sf, "documents")
    val state = Staging.tempDir("graft_ndspec_") + "/bands"
    NearDupState.init(spark, docs.filter(col("doc_id") < 60), state)
    (0 until 3).foreach { b =>
      NearDupState.probeAndAdvance(spark, state,
        docs.filter(col("doc_id") >= 60 + b * 20 &&
          col("doc_id") < 80 + b * 20)
          .select(col("doc_id"), col("text")), b.toLong).count()
    }
    val files = Option(new java.io.File(s"$state/_graft_sidecar")
      .listFiles).map(_.map(_.getName).toSeq).getOrElse(Seq.empty)
    assert(files.count(_.endsWith(".bin")) <= 2 &&
      files.count(_.endsWith(".meta")) <= 2,
      s"retention must cap sidecar versions: ${files.mkString(",")}")
    // interleaved writers (own appIds): near-dups of BOTH batches'
    // novel docs still flag afterwards — a lost sidecar merge would
    // false-negative the other writer's band keys
    def b(tag: String, lo: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < lo + 20)
      .select(col("doc_id") + (if (tag == "A") 0L else 500000L),
        col("text")).toDF("doc_id", "text")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = Seq(("A", 140L), ("B", 160L)).map { case (tag, lo) =>
      new Thread(() =>
        try { NearDupState.probeAndAdvance(spark, state, b(tag, lo),
          10L, appId = s"nd-$tag").collect(): Unit }
        catch { case t: Throwable => errs.add(t): Unit })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent advance failed: ${errs.peek()}")
    val twins = b("A", 140L).unionByName(b("B", 160L))
      .select((col("doc_id") + 700000L).as("doc_id"), col("text"))
    val verdicts = NearDupState.probeAndAdvance(spark, state, twins, 11L)
      .collect()
    assert(verdicts.length == 40 && verdicts.forall(_.getBoolean(4)),
      s"raced state must flag twins of both writers' docs: " +
        verdicts.filterNot(_.getBoolean(4)).mkString(","))
  }

  test("out-of-band append: CDF catch-up folds, no corpus rebuild") {
    val docs = Sources.testTable(spark, TestSpark.sf, "documents")
    val state = Staging.tempDir("graft_ndspec_") + "/bands"
    NearDupState.init(spark, docs.filter(col("doc_id") < 80), state)
    // an external writer lands banded rows WITHOUT touching the sidecar
    val oob = NearDupState.bandedForTest(
      docs.filter(col("doc_id") >= 80 && col("doc_id") < 90))
    GraftLog.appendPartitioned(oob.repartition(col("bp")), state,
      Seq("bp"))
    val sc = NearDupState.loadSidecar(spark, state)
    assert(sc.catchupVersions == 1 && !sc.rebuilt,
      s"one missing version must FOLD via CDF, not rebuild: $sc")
    // twins of the out-of-band docs now flag — the folded keys gate
    val twins = docs.filter(col("doc_id") >= 80 && col("doc_id") < 90)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
    val verdicts = NearDupState
      .probeAndAdvance(spark, state, twins, 50L).collect()
    assert(verdicts.length == 10 && verdicts.forall(_.getBoolean(4)),
      s"catch-up must surface out-of-band band keys: " +
        verdicts.filterNot(_.getBoolean(4)).mkString(","))
  }

  test("i30 streamed transport reproduces e20's verdicts; replay no-ops") {
    val streamed = NearDupState.nearDupStreamIngest(spark, TestSpark.sf)
      .collect()
    assert(streamed.forall(_.getBoolean(5)),
      "the out-of-band re-delivery must move neither ledger")
    val batch = NearDupState.nearDupStateRolling(spark, TestSpark.sf)
      .collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)), r.getBoolean(4))
    val (sm, bm) = (streamed.map(key).toMap, batch.map(key).toMap)
    assert(sm.size == bm.size && sm == bm,
      "streaming admission must not change a single verdict")
  }

  test("GDPR erase: band rows purged (bp-pruned with texts), sidecar " +
      "re-mint, twin of erased doc no longer flags, neighbors hold") {
    import spark.implicits._
    val docs = Sources.testTable(spark, TestSpark.sf, "documents")
    val state = Staging.tempDir("graft_ndspec_") + "/bands"
    NearDupState.init(spark, docs.filter(col("doc_id") < 100), state)
    val subject = docs.filter(col("doc_id") === 3L)
      .select(col("doc_id"), col("text"))
    // pre-erase: a twin of doc 3 flags near-dup
    val pre = NearDupState.probeAndAdvance(spark, state,
      subject.select((col("doc_id") + 9000).as("doc_id"), col("text")),
      0L).collect()
    assert(pre.head.getBoolean(4), "twin must flag before erasure")
    val files0 = GraftLog.snapshot(spark, state)._1.toSet
    val v0 = GraftLog.latestVersion(spark, state).get
    NearDupState.erase(spark, state,
      subject.select("doc_id"), texts = Some(subject))
    // (1) every band row of doc 3 is gone; neighbors' rows intact
    val left = GraftLog.read(spark, state)
    assert(left.filter(col("doc_id") === 3L).count() == 0,
      "erased doc's band rows must be purged")
    assert(left.filter(col("doc_id") === 4L).count() > 0,
      "neighbors' band rows must survive")
    // (2) text-derived bp pruning: every file the delete rewrote lives
    // in one of the subject's band-key partitions
    val files1 = GraftLog.snapshot(spark, state)._1.toSet
    val touched = (files0 -- files1) ++ (files1 -- files0)
    val bps = NearDupState.bandedForTest(subject)
      .select("bp").distinct().as[Int].collect().toSet
    assert(touched.nonEmpty && touched.forall(f =>
      bps.exists(bp => f.contains(s"bp=$bp/"))),
      s"erase must rewrite only the subject's bp dirs: $touched")
    // (3) sidecar re-minted at the delete version: steady next load
    val sc = NearDupState.loadSidecar(spark, state)
    assert(sc.version > v0 && sc.catchupVersions == 0 && !sc.rebuilt,
      s"erase must re-mint the sidecar at the delete version: $sc")
    // (4) the forgotten doc's twin is ADMITTED now (and joins the
    // state as the new representative); an untouched doc's twin
    // still flags
    val post = NearDupState.probeAndAdvance(spark, state,
      subject.select((col("doc_id") + 9500).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") === 7L)
          .select((col("doc_id") + 9500).as("doc_id"), col("text"))),
      1L).collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(!post(9503L), "the erased doc's twin must be admitted fresh")
    assert(post(9507L), "an untouched doc's twin must keep flagging")
    // (5) re-erasing the already-erased doc rewrites nothing
    NearDupState.erase(spark, state, subject.select("doc_id"),
      texts = Some(subject))
    val delRow = GraftLog.history(spark, state)
      .orderBy(col("version").desc).limit(1).collect().head
    assert(delRow.getString(1) == "delete" && delRow.getInt(3) == 0,
      s"re-erase must remove zero files: $delRow")
  }

  test("viral boilerplate: hot bands verify salted, answers unchanged") {
    // adversarial skew: 400 state docs share ONE text, so every band
    // key of that signature holds 400 entries — the degenerate corpus
    // that concentrates an unsalted bk join into one quadratic group
    val boiler = "the quick brown fox jumps over the lazy dog " +
      "click here to subscribe now for free daily updates"
    import spark.implicits._
    val stateDocs = spark.range(400)
      .select((col("id") + 50000).as("doc_id"), lit(boiler).as("text"))
      .unionByName(Sources.testTable(spark, TestSpark.sf, "documents")
        .filter(col("doc_id") < 50).select(col("doc_id"), col("text")))
    val batch = spark.range(20)
      .select((col("id") + 60000).as("doc_id"), lit(boiler).as("text"))
      .unionByName(Sources.testTable(spark, TestSpark.sf, "documents")
        .filter(col("doc_id") >= 200 && col("doc_id") < 210)
        .select(col("doc_id"), col("text")))
    def run(threshold: Int): Map[Long, (Boolean, Long, Any)] = {
      val st = Staging.tempDir("graft_ndskew_") + "/bands"
      NearDupState.init(spark, stateDocs, st)
      NearDupState.probeAndAdvance(spark, st, batch, 0L,
          hotBandThreshold = threshold, saltBuckets = 16)
        .collect().map(r => r.getLong(1) ->
          ((r.getBoolean(4), r.getLong(2), r.get(3)))).toMap
    }
    val unsalted = run(threshold = 1000000) // never hot: the reference
    val salted = run(threshold = 100)       // 400 > 100: salted path
    assert(salted == unsalted,
      s"salting changed answers: ${salted.toSeq.diff(unsalted.toSeq).take(3)}")
    // every boiler batch doc flags against all 400 state copies
    (60000L until 60020L).foreach { id =>
      assert(salted(id)._1 && salted(id)._2 == 400L, s"doc $id: ${salted(id)}")
    }
    // the bound the salt buys: the unsalted max band-key group is the
    // full 400; salted (bk, salt) groups stay near 400/16
    val st2 = Staging.tempDir("graft_ndskew_") + "/bands"
    NearDupState.init(spark, stateDocs, st2)
    val perKey = GraftLog.read(spark, st2)
      .groupBy(col("bk")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    val perSalt = GraftLog.read(spark, st2)
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16L)))
      .groupBy(col("bk"), col("salt")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    assert(perKey >= 400L, s"adversarial corpus lost its hot band: $perKey")
    assert(perSalt <= 80L,
      s"salted group must be ~400/16, got $perSalt (unsalted $perKey)")
  }
}
