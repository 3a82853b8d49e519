package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AggView
import graft.sources.{GraftLog, Staging}

/** Incremental materialized-view maintenance (i28): the delta-log fold
  * must equal a full recompute after every mutation class, replays must
  * ledger-no-op, and maintenance must stay change-bounded. */
class AggViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def srcDf(ids: Range) = ids
    .map(i => (i.toLong, s"g${i % 4}", (i % 17).toDouble)).toSeq
    .toDF("id", "g", "v")

  private def recompute(src: String): Map[String, (Long, Double)] =
    GraftLog.read(spark, src).groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Deterministic.sumExact(col("v"))
          .cast("double"), 6).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def viewNow(view: String): Map[String, (Long, Double)] =
    AggView.read(spark, view, "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("maintain folds inserts, deletes, and updates to the recompute") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/src", s"$root/view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    assert(AggView.maintain(spark, src, view, "id", "g", "v") == 1)
    assert(viewNow(view) == recompute(src), "seed fold")
    GraftLog.append(srcDf(100 until 150), src)                     // v1
    GraftLog.delete(spark, src, col("id") % 10 === 0)              // v2
    GraftLog.update(spark, src, col("id") % 3 === 0,
      Seq("v" -> (col("v") + 1.0)))                                // v3
    assert(AggView.maintain(spark, src, view, "id", "g", "v") == 3)
    assert(viewNow(view) == recompute(src),
      "incremental fold after append+delete+update")
    // replay: the ledger rejects every already-applied version
    assert(AggView.maintain(spark, src, view, "id", "g", "v") == 0)
    assert(viewNow(view) == recompute(src))
    // a group deleted to zero vanishes from the view
    GraftLog.delete(spark, src, col("g") === "g1")                 // v4
    assert(AggView.maintain(spark, src, view, "id", "g", "v") == 1)
    val m = viewNow(view)
    assert(!m.contains("g1"), s"emptied group must vanish: ${m.keySet}")
    assert(m == recompute(src))
    // crash-window twin: re-delivering an applied version's deltas
    // directly is rejected by the txn ledger (the atomicity seam)
    val fake = Seq(("g0", 999L,
      new java.math.BigDecimal(999))).toDF("g", "d_count", "d_value")
      .select(col("g"), col("d_count"),
        col("d_value").cast("decimal(38,10)").as("d_value"))
    assert(!GraftLog.txnAppend(fake, view, "graft-aggview", 4L),
      "ledger must reject a replayed source version")
    assert(m == viewNow(view))
  }

  test("maintenance property: random mutation lifecycles == recompute") {
    // seeded generator: 3 trials × 6 random ops (append / modular
    // delete / modular update), maintenance interleaved at random
    // points — the fold must equal the full recompute at the end of
    // every trial regardless of when maintenance ran
    val rnd = new scala.util.Random(20260816L)
    def mk(ids: Seq[Long]) = ids
      .map(i => (i, s"g${i % 5}", (i % 13).toDouble)).toDF("id", "g", "v")
    (0 until 3).foreach { trial =>
      val root = Staging.tempDir("graft_mvprop_")
      val (src, view) = (s"$root/src", s"$root/view")
      var nextId = 200L
      GraftLog.overwrite(mk(0L until 100L), src)
      AggView.maintain(spark, src, view, "id", "g", "v")
      (0 until 6).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val n = 10 + rnd.nextInt(30)
            GraftLog.append(mk(nextId until (nextId + n)), src)
            nextId += n
          case 1 =>
            val m = 2 + rnd.nextInt(9)
            GraftLog.delete(spark, src,
              col("id") % m === rnd.nextInt(m))
          case _ =>
            val m = 2 + rnd.nextInt(9)
            GraftLog.update(spark, src,
              col("id") % m === rnd.nextInt(m),
              Seq("v" -> (col("v") + rnd.nextInt(50))))
        }
        if (rnd.nextBoolean()) {
          AggView.maintain(spark, src, view, "id", "g", "v"); ()
        }
      }
      AggView.maintain(spark, src, view, "id", "g", "v")
      assert(viewNow(view) == recompute(src),
        s"trial $trial: maintained fold diverged from the recompute")
    }
  }

  test("MV auto-rewrite: fresh view serves the plan, stale falls back") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/rw_src", s"$root/rw_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    GraftLog.append(srcDf(100 until 140), src)                     // v1
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      def q = spark.read.format("graft").load(src)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
      def scans(df: org.apache.spark.sql.DataFrame, p: String) =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources
              .LogicalRelation(fs: org.apache.spark.sql.execution
              .datasources.HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.exists(_.toString == p)
          case _ => false
        }
      val fresh = q
      assert(scans(fresh, view) && !scans(fresh, src),
        "fresh view: the rewritten plan must scan the view, skip the fact")
      // the rewrite is invisible to the VALUES
      val expect = recompute(src)
      val got = fresh.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == expect, s"rewritten answer drifted: $got vs $expect")
      // a float sum must NOT rewrite (the view folds exact decimal)
      val floatQ = spark.read.format("graft").load(src)
        .groupBy(col("g")).agg(sum(col("v")).as("t"))
      assert(scans(floatQ, src) && !scans(floatQ, view),
        "a non-exact aggregate shape must keep the base plan")
      // deleted-to-zero groups must not resurface through the view
      GraftLog.delete(spark, src, col("g") === "g2")               // v2
      AggView.maintain(spark, src, view, "id", "g", "v")
      val afterDel = q
      assert(scans(afterDel, view), "re-maintained view serves again")
      assert(!afterDel.collect().map(_.getString(0)).contains("g2"),
        "emptied group must vanish from the rewritten answer")
      // stale: one unmaintained source commit → base plan
      GraftLog.append(srcDf(140 until 150), src)                   // v3
      val stale = q
      assert(scans(stale, src) && !scans(stale, view),
        "stale view: the SAME query text must fall back to the fact scan")
      assert(stale.collect().map(
        r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
        == recompute(src), "fallback answer = base recompute")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("join-MV: fact ⋈ dim aggregates serve from the key-grained view") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view, dimPath) =
      (s"$root/jn_src", s"$root/jn_view", s"$root/jn_dim")
    GraftLog.overwrite(srcDf(0 until 200)
      .withColumn("k", col("id") % 10), src)                       // v0
    GraftLog.delete(spark, src, col("id") % 7 === 0)               // v1
    GraftLog.update(spark, src, col("id") % 5 === 0,
      Seq("v" -> (col("v") + 1.0)))                                // v2
    AggView.maintainCols(spark, src, view, "id", Seq("k"), "v")
    AggView.registerForRewriteCols(src, view, Seq("k"), "v")
    (0L until 10L).map(k => (k, s"s${k % 3}")).toDF("k2", "seg")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    def scans(df: org.apache.spark.sql.DataFrame, p: String) =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(r =>
            r.toString == p || r.toUri.getPath == p)
        case _ => false
      }
    def baseJoin = {
      val f = spark.read.format("graft").load(src)
      f.join(dim, f("k") === dim("k2"))
    }
    def collectMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def q = baseJoin.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Deterministic.sumExact(col("v"))
          .cast("double"), 6).as("t"),
        round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
          .as("a"))
    try {
      val fresh = q
      assert(scans(fresh, view) && !scans(fresh, src),
        "join rewrite must scan view ⋈ dim, never the fact table")
      // the rewrite is invisible to the VALUES: compare against the
      // unregistered base plan at the same table state
      graft.sql.MvRegistry.unregister(src)
      val expect = collectMap(q)
      AggView.registerForRewriteCols(src, view, Seq("k"), "v")
      assert(collectMap(fresh) == expect,
        "rewritten star answer must equal the base join recompute")
      // scale shape: the groups-sized view leg BROADCASTS (the 100 TB
      // claim — the fact scan is gone and the join ships no fact rows)
      assert(fresh.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "the rewritten star must broadcast the view leg")
      // a DUPLICATE-key dim: the view row replicates once per matching
      // dim row — exactly the multiplicity each fact row would see
      val dupDim = dim.unionByName(dim.filter(col("k2") < 5))
      def qd = {
        val f = spark.read.format("graft").load(src)
        f.join(dupDim, f("k") === dupDim("k2")).groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            round(graft.functions.Deterministic.sumExact(col("v"))
              .cast("double"), 6).as("t"),
            round(avg(col("v").cast("decimal(38,10)")).cast("double"),
              6).as("a"))
      }
      val dupFresh = qd
      assert(scans(dupFresh, view) && !scans(dupFresh, src),
        "dup-key dim join must still serve from the view")
      graft.sql.MvRegistry.unregister(src)
      val dupExpect = collectMap(qd)
      AggView.registerForRewriteCols(src, view, Seq("k"), "v")
      assert(collectMap(dupFresh) == dupExpect,
        "replicated fold must equal the base dup-key join")
      // zombie keys: empty segment s1 (keys 1,4,7) entirely — its
      // net-zero delta rows still flow through the join but must not
      // resurface the group
      GraftLog.delete(spark, src, col("k") % 3 === 1)              // v3
      AggView.maintainCols(spark, src, view, "id", Seq("k"), "v")
      val afterDel = q
      assert(scans(afterDel, view),
        "re-maintained view serves the join again")
      assert(!afterDel.collect().map(_.getString(0)).contains("s1"),
        "fully-deleted segment must vanish from the rewritten answer")
      graft.sql.MvRegistry.unregister(src)
      val delExpect = collectMap(q)
      AggView.registerForRewriteCols(src, view, Seq("k"), "v")
      assert(collectMap(afterDel) == delExpect)
      // a dim-side filter above the join carries onto the rewritten
      // join — still served, same answer
      def fq = baseJoin.filter(col("seg") =!= "s0").groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("a"))
      val filtered = fq
      assert(scans(filtered, view) && !scans(filtered, src),
        "dim-column filter must not block the join rewrite")
      graft.sql.MvRegistry.unregister(src)
      val fExpect = collectMap(fq)
      AggView.registerForRewriteCols(src, view, Seq("k"), "v")
      assert(collectMap(filtered) == fExpect)
      // REFUSALS — each keeps the base plan:
      // (1) an aggregate over a DIM column (zombie replication would
      // corrupt it)
      val dimAgg = baseJoin.groupBy(col("seg"))
        .agg(max(col("k2")).as("m"))
      assert(scans(dimAgg, src) && !scans(dimAgg, view),
        "dim-side aggregate must refuse the join rewrite")
      // (2) a FACT-PRESERVED outer join SERVES (d42): unmatched view
      // keys null-extend once per delta row and fold sum(d_count) into
      // the NULL-dim group — exactly the base multiplicity. Keys 2 and
      // 5 are dropped from the dim so real rows land in the NULL
      // group; the zombie keys (1,4,7 — fully deleted above, key 1
      // also unmatched) contribute net zero wherever they land.
      val dimPartial = dim.filter(!col("k2").isin(1L, 2L, 5L))
      val f2 = spark.read.format("graft").load(src)
      def leftQ = f2
        .join(dimPartial, f2("k") === dimPartial("k2"), "left")
        .groupBy(col("seg")).agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
      def leftMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => Option(r.getString(0)).getOrElse("NULL") ->
          (r.getLong(1), r.getDouble(2))).toMap
      val leftPlan = leftQ
      assert(scans(leftPlan, view) && !scans(leftPlan, src),
        "a fact-preserved left-outer star must serve (d42)")
      val leftVals = leftMap(leftPlan)
      graft.sql.MvRegistry.unregister(src)
      val leftBase = leftMap(leftQ)
      AggView.registerForRewriteCols(src, view, Seq("k"), "v")
      assert(leftVals.contains("NULL"),
        "unmatched fact keys must fold into the NULL-dim group")
      assert(leftVals == leftBase,
        "the served left-outer star must equal the base answer exactly")
      // the DIM-preserved direction still refuses: an unmatched dim
      // row appears once in base but would join every net-zero delta
      // row of a fully-deleted key in the rewrite
      val f2b = spark.read.format("graft").load(src)
      val rightQ = f2b
        .join(dimPartial, f2b("k") === dimPartial("k2"), "right")
        .groupBy(col("seg")).agg(count(lit(1)).as("n"))
      assert(scans(rightQ, src) && !scans(rightQ, view),
        "a dim-preserved outer join must refuse")
      // (3) a dim column that shares the VALUE column's name must not
      // be served from the view's exact sum
      val dimV = dim.withColumn("v", col("k2").cast("double") * 10)
      val f3 = spark.read.format("graft").load(src)
      val collQ = f3.join(dimV, f3("k") === dimV("k2"))
        .groupBy(col("seg"))
        .agg(round(graft.functions.Deterministic.sumExact(dimV("v"))
          .cast("double"), 6).as("t"))
      assert(scans(collQ, src) && !scans(collQ, view),
        "dim column named like the value column must refuse")
      // (4) a row-level filter on the fact value column
      val rowQ = baseJoin.filter(col("v") > 3.0)
        .groupBy(col("seg")).agg(count(lit(1)).as("n"))
      assert(scans(rowQ, src) && !scans(rowQ, view),
        "fact row-level filter must refuse the join rewrite")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("two-fact join-MV: cross-weighted serve equals base; gates " +
      "refuse extrema, non-key joins, outer joins, mixed trees") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (s1, v1p) = (s"$root/tf_a", s"$root/tf_av")
    val (s2, v2p) = (s"$root/tf_b", s"$root/tf_bv")
    GraftLog.overwrite(srcDf(0 until 120)
      .withColumn("k", col("id") % 10), s1)
    GraftLog.delete(spark, s1, col("id") % 7 === 0) // removes churn
    AggView.maintainCols(spark, s1, v1p, "id", Seq("k"), "v")
    AggView.registerForRewriteCols(s1, v1p, Seq("k"), "v")
    GraftLog.overwrite(srcDf(0 until 90)
      .select(col("id").as("id2"), (col("id") % 10).as("k2"),
        (col("v") * 3).as("w")), s2)
    GraftLog.delete(spark, s2, col("id2") % 5 === 0)
    AggView.maintainCols(spark, s2, v2p, "id2", Seq("k2"), "w")
    AggView.registerForRewriteCols(s2, v2p, Seq("k2"), "w")
    def scans(df: org.apache.spark.sql.DataFrame, p: String) =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == p)
        case _ => false
      }
    def a = spark.read.format("graft").load(s1)
    def b = spark.read.format("graft").load(s2)
    def collectMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    def q = {
      val (fa, fb) = (a, b)
      fa.join(fb, fa("k") === fb("k2")).groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("tv"),
          round(graft.functions.Deterministic.sumExact(col("w"))
            .cast("double"), 6).as("tw"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("av"))
    }
    try {
      val fresh = q
      assert(scans(fresh, v1p) && scans(fresh, v2p) &&
        !scans(fresh, s1) && !scans(fresh, s2),
        "the two-fact plan must scan BOTH views and NEITHER fact")
      graft.sql.MvRegistry.unregister(s1)
      graft.sql.MvRegistry.unregister(s2)
      val expect = collectMap(q)
      AggView.registerForRewriteCols(s1, v1p, Seq("k"), "v")
      AggView.registerForRewriteCols(s2, v2p, Seq("k2"), "w")
      assert(collectMap(fresh) == expect,
        "cross-weighted fold must equal the base fact x fact join")
      // a view-group-column WHERE (whole-bucket predicate) still
      // serves — carried onto the key-grained pre-aggregates
      def fq = {
        val (fa, fb) = (a, b)
        fa.join(fb, fa("k") === fb("k2")).filter(col("k") =!= 3L)
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            round(graft.functions.Deterministic.sumExact(col("v"))
              .cast("double"), 6).as("tv"),
            round(graft.functions.Deterministic.sumExact(col("w"))
              .cast("double"), 6).as("tw"),
            round(avg(col("v").cast("decimal(38,10)")).cast("double"),
              6).as("av"))
      }
      val filteredQ = fq
      assert(scans(filteredQ, v1p) && scans(filteredQ, v2p) &&
        !scans(filteredQ, s1),
        "a group-column WHERE must not block the two-fact rewrite")
      graft.sql.MvRegistry.unregister(s1)
      graft.sql.MvRegistry.unregister(s2)
      val fExpect = collectMap(fq)
      AggView.registerForRewriteCols(s1, v1p, Seq("k"), "v")
      AggView.registerForRewriteCols(s2, v2p, Seq("k2"), "w")
      assert(collectMap(filteredQ) == fExpect,
        "filtered two-fact fold must equal the filtered base join")
      // REFUSALS — each keeps the base plan (both facts scanned):
      // (1) extrema: a key whose OTHER side was fully deleted must not
      // contribute its folded extremum — min/max refuse outright
      val (m1, m2) = (a, b)
      val mn = m1.join(m2, m1("k") === m2("k2"))
        .groupBy(col("k")).agg(max(col("v")).as("m"))
      assert(scans(mn, s1) && !scans(mn, v1p),
        "two-fact extrema must refuse")
      // (2) a join on a NON-view-group column (row identity, not key
      // granularity — the views cannot reproduce that multiplicity)
      val (r1, r2) = (a, b)
      val rowJoin = r1.join(r2, r1("id") === r2("id2"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(scans(rowJoin, s1) && !scans(rowJoin, v1p),
        "a non-group-column equi-join must refuse")
      // (3) outer two-fact join: inner-only by construction
      val (l1, l2) = (a, b)
      val leftJ = l1.join(l2, l1("k") === l2("k2"), "left")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(scans(leftJ, s1) && !scans(leftJ, v1p),
        "a left-outer two-fact join must refuse")
      // (4) fact ⋈ dim ⋈ fact: the two-fact shape is exactly the two
      // fact subtrees — a mixed tree refuses (compose d35 stars there)
      val dimPath = s"$root/tf_dim"
      (0L until 10L).map(x => (x, s"s${x % 3}")).toDF("kd", "seg")
        .write.mode("overwrite").parquet(dimPath)
      val dimDf = spark.read.parquet(dimPath)
      val (x1, x2) = (a, b)
      val mixed = x1.join(dimDf, x1("k") === dimDf("kd"))
        .join(x2, x1("k") === x2("k2"))
        .groupBy(col("seg")).agg(count(lit(1)).as("n"))
      assert(scans(mixed, s1) && scans(mixed, s2) &&
        !scans(mixed, v1p) && !scans(mixed, v2p),
        "a fact-dim-fact tree must refuse the two-fact rewrite")
      // (5) one stale side fails the WHOLE rewrite — never half-served
      GraftLog.append(srcDf(200 until 210)
        .select(col("id").as("id2"), (col("id") % 10).as("k2"),
          (col("v") * 3).as("w")), s2)
      val stale = q
      assert(scans(stale, s1) && scans(stale, s2) &&
        !scans(stale, v1p) && !scans(stale, v2p),
        "one stale side must fall the whole two-fact join back")
    } finally {
      graft.sql.MvRegistry.unregister(s1)
      graft.sql.MvRegistry.unregister(s2)
    }
  }

  test("MV rewrite: DISTINCT and FILTER aggregates refuse on every " +
      "path — never substituted inside the aggregate function") {
    // round-16 ADVICE (high): sum(DISTINCT cast(v)) used to fall
    // through to the generic recursion, leaving the fact's value attr
    // unresolved (analysis failure); count(DISTINCT <group col>) got
    // twin-substituted and silently counted zombie fully-deleted
    // buckets the delta log still carries. Both must REFUSE instead.
    val root = Staging.tempDir("graft_aggv_spec_")
    val (s1, v1p) = (s"$root/dk_a", s"$root/dk_av")
    val (s2, v2p) = (s"$root/dk_b", s"$root/dk_bv")
    GraftLog.overwrite(srcDf(0 until 120)
      .withColumn("k", col("id") % 10), s1)
    // fully delete one (g, k) bucket so the delta log carries zombie
    // net-zero rows — the distinct-count corruption fuel
    GraftLog.delete(spark, s1, col("g") === "g1" && col("k") === 1L)
    AggView.maintainCols(spark, s1, v1p, "id", Seq("g", "k"), "v")
    AggView.registerForRewriteCols(s1, v1p, Seq("g", "k"), "v")
    GraftLog.overwrite(srcDf(0 until 90)
      .select(col("id").as("id2"), (col("id") % 10).as("k2"),
        (col("v") * 3).as("w")), s2)
    AggView.maintainCols(spark, s2, v2p, "id2", Seq("k2"), "w")
    AggView.registerForRewriteCols(s2, v2p, Seq("k2"), "w")
    def scans(df: org.apache.spark.sql.DataFrame, p: String) =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == p)
        case _ => false
      }
    spark.sql("DROP TABLE IF EXISTS mv_distinct_t")
    spark.sql(
      s"CREATE TABLE mv_distinct_t USING graft OPTIONS (path '$s1')")
    try {
      // (1) single-fact count(DISTINCT <other group col>): the zombie
      // (g1, 1) bucket exists only in the delta log — a substituted
      // rewrite would count it. Must keep the base plan and the base
      // answer.
      def dq = spark.read.format("graft").load(s1)
        .groupBy(col("g"))
        .agg(count_distinct(col("k")).as("nk"))
      val dPlan = dq
      assert(scans(dPlan, s1) && !scans(dPlan, v1p),
        "count(DISTINCT group col) must refuse the rewrite")
      val served = dPlan.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.sql.MvRegistry.unregister(s1)
      val base = dq.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      AggView.registerForRewriteCols(s1, v1p, Seq("g", "k"), "v")
      assert(served == base,
        "the refused distinct count must serve the exact base answer")
      // (2) single-fact sum(DISTINCT cast(v)): previously an analysis
      // failure (unresolved value attr) — must refuse AND run
      val sd = spark.read.format("graft").load(s1)
        .groupBy(col("g"))
        .agg(sum_distinct(col("v").cast("decimal(38,10)")).as("sv"))
      assert(scans(sd, s1) && !scans(sd, v1p),
        "sum(DISTINCT cast(v)) must refuse the rewrite")
      assert(sd.collect().length == 4,
        "the refused distinct sum must execute cleanly")
      // (3) FILTER-clause aggregate (SQL surface): same fall-through
      val fq = spark.sql(
        "SELECT g, sum(CAST(v AS DECIMAL(38,10))) " +
          "FILTER (WHERE k = 0) AS sv FROM mv_distinct_t GROUP BY g")
      assert(scans(fq, s1) && !scans(fq, v1p),
        "a FILTER-clause aggregate must refuse the rewrite")
      assert(fq.collect().length == 4,
        "the refused filtered aggregate must execute cleanly")
      // (4) the two-fact path has the same fall-through: sum(DISTINCT)
      // over fact1 ⋈ fact2 must keep both base scans and run
      val (fa, fb) = (spark.read.format("graft").load(s1),
        spark.read.format("graft").load(s2))
      val tf = fa.join(fb, fa("k") === fb("k2")).groupBy(col("k"))
        .agg(sum_distinct(col("v").cast("decimal(38,10)")).as("sv"))
      assert(scans(tf, s1) && scans(tf, s2) &&
        !scans(tf, v1p) && !scans(tf, v2p),
        "two-fact sum(DISTINCT) must refuse the rewrite")
      assert(tf.collect().nonEmpty,
        "the refused two-fact distinct must execute cleanly")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mv_distinct_t")
      graft.sql.MvRegistry.unregister(s1)
      graft.sql.MvRegistry.unregister(s2)
    }
  }

  test("join-MV: stale view + CDF tail still serves the star, current") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view, dimPath) =
      (s"$root/jc_src", s"$root/jc_view", s"$root/jc_dim")
    GraftLog.overwrite(srcDf(0 until 150)
      .withColumn("k", col("id") % 8), src)                        // v0
    AggView.maintainCols(spark, src, view, "id", Seq("k"), "v")
    AggView.registerForRewriteCols(src, view, Seq("k"), "v",
      key = "id", compensate = true)
    (0L until 8L).map(k => (k, s"s${k % 3}")).toDF("k2", "seg")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    try {
      // the view now LAGS by an append AND a delete
      GraftLog.append(srcDf(150 until 180)
        .withColumn("k", col("id") % 8), src)                      // v1
      GraftLog.delete(spark, src, col("id") % 9 === 0)             // v2
      def q = {
        val f = spark.read.format("graft").load(src)
        f.join(dim, f("k") === dim("k2")).groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            round(graft.functions.Deterministic.sumExact(col("v"))
              .cast("double"), 6).as("t"))
      }
      val plan = q
      val leaves = plan.queryExecution.optimizedPlan.collectLeaves()
      def fileScan(p: String): Boolean = leaves.exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(r =>
            r.toString == p || r.toUri.getPath == p)
        case _ => false
      }
      assert(fileScan(view) && !fileScan(src),
        "compensated join rewrite must scan view + tail, never the fact")
      // the answer is CURRENT (folds the un-maintained v1 + v2)
      graft.sql.MvRegistry.unregister(src)
      val expect = q.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      AggView.registerForRewriteCols(src, view, Seq("k"), "v",
        key = "id", compensate = true)
      val got = plan.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == expect,
        s"compensated star answer must be current: $got vs $expect")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("join-MV serves SQL text: catalog fact JOIN parquet dim") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view, dimPath) =
      (s"$root/js_src", s"$root/js_view", s"$root/js_dim")
    GraftLog.overwrite(srcDf(0 until 120)
      .withColumn("k", col("id") % 6), src)
    AggView.maintainCols(spark, src, view, "id", Seq("k"), "v")
    AggView.registerForRewriteCols(src, view, Seq("k"), "v")
    (0L until 6L).map(k => (k, s"s${k % 2}")).toDF("k2", "seg")
      .write.mode("overwrite").parquet(dimPath)
    spark.sql("DROP TABLE IF EXISTS mvj_sql_t")
    spark.sql(s"CREATE TABLE mvj_sql_t USING graft OPTIONS (path '$src')")
    try {
      def scans(df: org.apache.spark.sql.DataFrame, p: String) =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources
              .LogicalRelation(fs: org.apache.spark.sql.execution
              .datasources.HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == p)
          case _ => false
        }
      // the SQL join shape, with a dim-side WHERE, plans through the
      // same rule — star dashboards written as plain SQL lose the
      // fact scan too
      def q = spark.sql(
        s"""SELECT d.seg, count(1) AS n,
           |  round(CAST(sum(CAST(f.v AS DECIMAL(38,10))) AS DOUBLE), 6)
           |    AS t
           |FROM mvj_sql_t f JOIN parquet.`$dimPath` d ON f.k = d.k2
           |WHERE d.seg <> 's0'
           |GROUP BY d.seg""".stripMargin)
      val plan = q
      assert(scans(plan, view) && !scans(plan, src),
        "SQL-text star aggregate must rewrite to the view join")
      graft.sql.MvRegistry.unregister(src)
      val expect = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      AggView.registerForRewriteCols(src, view, Seq("k"), "v")
      val got = plan.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == expect, s"SQL join rewrite drifted: $got vs $expect")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvj_sql_t")
      graft.sql.MvRegistry.unregister(src)
    }
  }

  test("union-MV: serves only the complete, fresh, unfiltered union") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (a, b, view) = (s"$root/un_a", s"$root/un_b", s"$root/un_view")
    GraftLog.overwrite(srcDf(0 until 80), a)
    GraftLog.overwrite(srcDf(100 until 160), b)
    AggView.maintainUnion(spark, Seq(a, b), view, "id", Seq("g"), "v")
    AggView.registerForRewriteUnion(Seq(a, b), view, Seq("g"), "v")
    def scans(df: org.apache.spark.sql.DataFrame, p: String) =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == p)
        case _ => false
      }
    def t(p: String) = spark.read.format("graft").load(p)
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Deterministic.sumExact(col("v"))
          .cast("double"), 6).as("t"))
    try {
      val q = agg(t(a).union(t(b)))
      assert(scans(q, view) && !scans(q, a) && !scans(q, b),
        "complete fresh union must serve from the view")
      graft.sql.MvRegistry.unregister(a)
      graft.sql.MvRegistry.unregister(b)
      val expect = agg(t(a).union(t(b))).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      AggView.registerForRewriteUnion(Seq(a, b), view, Seq("g"), "v")
      assert(q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap == expect,
        "union rewrite must be invisible to the values")
      // a group-column filter above the union still serves
      val fq = agg(t(a).union(t(b)).filter(col("g") =!= "g0"))
      assert(scans(fq, view) && !scans(fq, a),
        "group-column filter must carry onto the view")
      // REFUSALS — each keeps the base plan:
      // one leg only (the view folds BOTH sources' rows)
      val single = agg(t(a))
      assert(scans(single, a) && !scans(single, view),
        "a union-MV source must not serve a single-table aggregate")
      // duplicate leg (multiplicities differ from the view's fold)
      val dup = agg(t(a).union(t(b)).union(t(a)))
      assert(scans(dup, a) && !scans(dup, view),
        "a duplicated leg must refuse")
      // per-leg filter (a predicate on ONE leg is not one on the union)
      val legF = agg(t(a).filter(col("g") =!= "g0").union(t(b)))
      assert(scans(legF, a) && !scans(legF, view),
        "a per-leg filter must refuse")
      // row-level filter above the union
      val rowF = agg(t(a).union(t(b)).filter(col("v") > 2.0))
      assert(scans(rowF, a) && !scans(rowF, view),
        "a row-level filter must refuse")
      // POSITIONAL hazard: with two same-typed value columns, a
      // column-reordering leg feeds b.w into the union's v slot — a
      // base answer the view cannot represent; the rewrite must
      // refuse, not "serve"
      val (a2, b2, view2) =
        (s"$root/un_a2", s"$root/un_b2", s"$root/un_v2")
      def df2(ids: Range) = ids
        .map(i => (i.toLong, s"g${i % 3}", (i % 17).toDouble,
          (i % 5).toDouble)).toDF("id", "g", "v", "w")
      GraftLog.overwrite(df2(0 until 60), a2)
      GraftLog.overwrite(df2(100 until 150), b2)
      AggView.maintainUnion(spark, Seq(a2, b2), view2, "id",
        Seq("g"), "v")
      AggView.registerForRewriteUnion(Seq(a2, b2), view2, Seq("g"), "v")
      try {
        def t2(p: String) = spark.read.format("graft").load(p)
        val straight = agg(t2(a2).union(t2(b2)))
        assert(scans(straight, view2), "the straight union serves")
        val reordered = agg(
          t2(a2).select(col("id"), col("g"), col("v"), col("w"))
            .union(
              t2(b2).select(col("id"), col("g"), col("w"), col("v"))))
        assert(!scans(reordered, view2),
          "a reordering leg must refuse the union rewrite")
      } finally {
        graft.sql.MvRegistry.unregister(a2)
        graft.sql.MvRegistry.unregister(b2)
      }
      // one stale leg: commit to b without maintaining — whole union
      // falls back; re-maintaining serves again
      GraftLog.append(srcDf(160 until 170), b)
      val stale = agg(t(a).union(t(b)))
      assert(scans(stale, a) && scans(stale, b) && !scans(stale, view),
        "a single stale leg must fall the whole union back")
      AggView.maintainUnion(spark, Seq(a, b), view, "id", Seq("g"), "v")
      val again = agg(t(a).union(t(b)))
      assert(scans(again, view), "re-maintained union serves again")
    } finally {
      graft.sql.MvRegistry.unregister(a)
      graft.sql.MvRegistry.unregister(b)
    }
  }

  test("MV DDL: definition survives registry loss; refusals are loud") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/ddl_src", s"$root/ddl_view")
    GraftLog.overwrite(srcDf(0 until 100), src)
    spark.sql("DROP TABLE IF EXISTS mvddl_spec_t")
    spark.sql(s"CREATE TABLE mvddl_spec_t USING graft OPTIONS (path '$src')")
    def scans(df: org.apache.spark.sql.DataFrame, p: String) =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == p)
        case _ => false
      }
    val defSql =
      """SELECT g, count(1) AS n,
        |  round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE), 6) AS t
        |FROM mvddl_spec_t GROUP BY g""".stripMargin
    def q = spark.sql(defSql)
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW '$view' KEY id AS $defSql")
      assert(scans(q, view), "CREATE must register the rewrite")
      // a NEW session has no registry: simulate with a full clear —
      // the definition must live in the view's table properties
      graft.sql.MvRegistry.clear()
      assert(scans(q, src), "cleared registry: the text falls back")
      val applied = spark.sql(s"REFRESH MATERIALIZED VIEW '$view'")
        .collect()(0).getInt(0)
      assert(applied == 0, "already-current REFRESH must fold nothing")
      assert(scans(q, view),
        "REFRESH must re-register purely from table properties")
      // CREATE … COMPENSATE: the SQL-created view serves even while
      // STALE (view ∪ CDF tail — the d29 path through the DDL surface)
      val viewC = s"$root/ddl_view_c"
      spark.sql(s"DROP MATERIALIZED VIEW '$view'")
      spark.sql(
        s"CREATE MATERIALIZED VIEW '$viewC' KEY id COMPENSATE AS $defSql")
      GraftLog.append(srcDf(100 until 120), src) // un-refreshed commit
      val comp = q
      assert(scans(comp, viewC) && !scans(comp, src),
        "a COMPENSATE view must serve while stale via the CDF tail")
      // compare against the log-direct recompute: the CACHED catalog
      // relation is stale until REFRESH TABLE (Spark's own caching),
      // while the compensated plan is current by construction
      assert(comp.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
        == recompute(src), "the compensated answer must be CURRENT")
      // refusals, each loud: non-aggregate defining query; more than
      // one value column; REFRESH of a table that is not an MV
      intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/x' KEY id AS " +
          "SELECT * FROM mvddl_spec_t"))
      intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/y' KEY id AS " +
          "SELECT g, sum(CAST(v AS DECIMAL(38,10))) AS sv, " +
          "count(id) AS ci FROM mvddl_spec_t GROUP BY g"))
      intercept[Exception](
        spark.sql(s"REFRESH MATERIALIZED VIEW '$src'"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvddl_spec_t")
      graft.sql.MvRegistry.unregisterMatching(src)
    }
  }

  test("MV DDL guards: DROP refuses non-views; CREATE refuses " +
      "filtered/joined shapes") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val src = s"$root/guard_src"
    GraftLog.overwrite(srcDf(0 until 50), src)
    spark.sql("DROP TABLE IF EXISTS mvguard_spec_t")
    spark.sql(s"CREATE TABLE mvguard_spec_t USING graft OPTIONS (path '$src')")
    try {
      // DROP MATERIALIZED VIEW is the destructive statement — a
      // mistyped target (the FACT table, or any directory) must raise
      // `not a materialized view`, not recursively delete it
      val e1 = intercept[Exception](
        spark.sql(s"DROP MATERIALIZED VIEW '$src'"))
      assert(e1.getMessage.contains("not a materialized view"))
      assert(spark.read.format("graft").load(src).count() == 50,
        "the mistargeted table must survive the refused DROP")
      val stray = s"$root/stray_dir"
      new java.io.File(stray).mkdirs()
      new java.io.File(s"$stray/keep.txt").createNewFile()
      val e2 = intercept[Exception](
        spark.sql(s"DROP MATERIALIZED VIEW '$stray'"))
      assert(e2.getMessage.contains("not a materialized view"))
      assert(new java.io.File(s"$stray/keep.txt").exists(),
        "an arbitrary directory must survive the refused DROP")
      // CREATE with a WHERE or a join between the aggregate and the
      // scan: maintenance would silently drop it — refuse loudly
      val e3 = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/vf' KEY id AS " +
          "SELECT g, sum(CAST(v AS DECIMAL(38,10))) AS sv " +
          "FROM mvguard_spec_t WHERE v > 10 GROUP BY g"))
      assert(e3.getMessage.contains("unmaintainable shape"))
      val e4 = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/vj' KEY id AS " +
          "SELECT a.g, sum(CAST(a.v AS DECIMAL(38,10))) AS sv " +
          "FROM mvguard_spec_t a JOIN mvguard_spec_t b ON a.id = b.id " +
          "GROUP BY a.g"))
      assert(e4.getMessage.contains("unmaintainable shape"))
      // a COMPUTED projection rebinding the value column's name:
      // maintenance would read the RAW source `v` — the silently-wrong
      // view the guard exists to refuse (round-16 ADVICE)
      val e5 = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/vp' KEY id AS " +
          "SELECT g, sum(CAST(v AS DECIMAL(38,10))) AS sv " +
          "FROM (SELECT g, v * 2 AS v FROM mvguard_spec_t) GROUP BY g"))
      assert(e5.getMessage.contains("unmaintainable shape"))
      // an EXPRESSION aggregate argument: sum(v+1) resolves its
      // references to {v}, so the persisted definition would silently
      // maintain sum(v) — refuse loudly
      val e6 = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/va' KEY id AS " +
          "SELECT g, sum(CAST(v + 1 AS DECIMAL(38,10))) AS sv " +
          "FROM mvguard_spec_t GROUP BY g"))
      assert(e6.getMessage.contains("unmaintainable shape"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvguard_spec_t")
      graft.sql.MvRegistry.unregisterMatching(src)
    }
  }

  test("MV DDL: UNION lifecycle (CREATE/REFRESH/DESCRIBE per-leg) " +
      "and star-shape refusals") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (a, b, view) = (s"$root/un_a", s"$root/un_b", s"$root/un_view")
    GraftLog.overwrite(srcDf(0 until 80), a)
    GraftLog.overwrite(srcDf(80 until 140), b)
    spark.sql("DROP TABLE IF EXISTS mvddl_un_a")
    spark.sql("DROP TABLE IF EXISTS mvddl_un_b")
    spark.sql(s"CREATE TABLE mvddl_un_a USING graft OPTIONS (path '$a')")
    spark.sql(s"CREATE TABLE mvddl_un_b USING graft OPTIONS (path '$b')")
    def scans(df: org.apache.spark.sql.DataFrame, p: String) =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources
            .LogicalRelation(fs: org.apache.spark.sql.execution
            .datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == p)
        case _ => false
      }
    val defSql =
      """SELECT g, count(1) AS n,
        |  round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE), 6) AS t
        |FROM (SELECT id, g, v FROM mvddl_un_a
        |      UNION ALL SELECT id, g, v FROM mvddl_un_b) u
        |GROUP BY g""".stripMargin
    def q = spark.sql(defSql)
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW '$view' KEY id AS $defSql")
      assert(scans(q, view) && !scans(q, a) && !scans(q, b),
        "the union text must serve from the CREATE'd view")
      // DESCRIBE: fresh, zero behind
      val d0 = spark.sql(s"DESCRIBE MATERIALIZED VIEW '$view'")
        .collect().head
      assert(d0.getBoolean(4) && d0.getLong(5) == 0L,
        s"freshly created union view must describe fresh: $d0")
      // one leg advances → whole union stale, lag counted per leg
      GraftLog.append(srcDf(140 until 160), b)
      assert(scans(q, a) && scans(q, b) && !scans(q, view),
        "a stale leg must fall the union text back")
      val d1 = spark.sql(s"DESCRIBE MATERIALIZED VIEW '$view'")
        .collect().head
      assert(!d1.getBoolean(4) && d1.getLong(5) == 1L,
        s"stale union view must report the lagging leg: $d1")
      // REFRESH folds the lagging leg only; the text serves again
      val applied = spark.sql(s"REFRESH MATERIALIZED VIEW '$view'")
        .collect().head.getInt(0)
      assert(applied == 1, s"one leg one version behind: $applied")
      assert(scans(q, view), "refreshed union view must serve again")
      // the served answer is the recompute over both legs
      val got = q.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      graft.sql.MvRegistry.unregisterMatching(a)
      graft.sql.MvRegistry.unregisterMatching(b)
      val base = q.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got == base, "union view must serve the exact recompute")
      // refusals: COMPENSATE on a union; outer-join star; WHERE in a
      // star; a fact side that is not a graft table
      val eC = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/unc' KEY id COMPENSATE " +
          s"AS $defSql"))
      assert(eC.getMessage.contains("COMPENSATE"))
      val dimP = s"$root/st_dim"
      (0L until 4L).map(k => (s"g$k", s"s${k % 2}")).toDF("gk", "seg")
        .write.mode("overwrite").parquet(dimP)
      spark.sql("DROP TABLE IF EXISTS mvddl_st_dim")
      spark.sql(
        s"CREATE TABLE mvddl_st_dim USING parquet OPTIONS (path '$dimP')")
      val eL = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/stl' KEY id AS " +
          "SELECT d.seg, sum(CAST(f.v AS DECIMAL(38,10))) AS sv " +
          "FROM mvddl_un_a f LEFT JOIN mvddl_st_dim d ON f.g = d.gk " +
          "GROUP BY d.seg"))
      assert(eL.getMessage.contains("INNER"),
        s"outer star must refuse: ${eL.getMessage}")
      val eW = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/stw' KEY id AS " +
          "SELECT d.seg, sum(CAST(f.v AS DECIMAL(38,10))) AS sv " +
          "FROM mvddl_un_a f JOIN mvddl_st_dim d ON f.g = d.gk " +
          "WHERE f.v > 3 GROUP BY d.seg"))
      assert(eW.getMessage.contains("unmaintainable shape"))
      val eF = intercept[Exception](spark.sql(
        s"CREATE MATERIALIZED VIEW '$root/stf' KEY gk AS " +
          "SELECT f.g, count(d.seg) AS n " +
          "FROM mvddl_un_a f JOIN mvddl_st_dim d ON f.g = d.gk " +
          "GROUP BY f.g"))
      assert(eF.getMessage.contains("graft scan"),
        s"a non-graft fact must refuse: ${eF.getMessage}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvddl_un_a")
      spark.sql("DROP TABLE IF EXISTS mvddl_un_b")
      spark.sql("DROP TABLE IF EXISTS mvddl_st_dim")
      graft.sql.MvRegistry.unregisterMatching(a)
      graft.sql.MvRegistry.unregisterMatching(b)
    }
  }

  test("MV rewrite serves SQL text and derived averages") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/sql_src", s"$root/sql_view")
    GraftLog.overwrite(srcDf(0 until 120), src)
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    spark.sql("DROP TABLE IF EXISTS mv_sql_t")
    spark.sql(s"CREATE TABLE mv_sql_t USING graft OPTIONS (path '$src')")
    try {
      def scans(df: org.apache.spark.sql.DataFrame, p: String) =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources
              .LogicalRelation(fs: org.apache.spark.sql.execution
              .datasources.HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == p)
          case _ => false
        }
      // the SQL text surface plans through the same rule — including a
      // DERIVED average (sum/count inside ONE expression tree: both
      // aggregate functions substitute, the division carries verbatim)
      val q = spark.sql(
        """SELECT g, count(1) AS n,
          |  round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE)
          |    / count(1), 6) AS avg_v
          |FROM mv_sql_t GROUP BY g""".stripMargin)
      assert(scans(q, view) && !scans(q, src),
        "SQL-text aggregate must rewrite to the view scan")
      val expect = GraftLog.read(spark, src).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double") / count(lit(1)), 6).as("avg_v"))
        .collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == expect, s"SQL rewrite drifted: $got vs $expect")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mv_sql_t")
      graft.sql.MvRegistry.unregister(src)
    }
  }

  test("compensated rewrite: stale view + CDF tail = current answer") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/comp_src", s"$root/comp_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v",
      key = "id", compensate = true)
    try {
      // the view lags by an append AND a delete AND an update — the
      // tail deltas must fold all three change classes
      GraftLog.append(srcDf(100 until 130), src)                   // v1
      GraftLog.delete(spark, src, col("id") % 9 === 0)             // v2
      GraftLog.update(spark, src, col("id") % 4 === 0,
        Seq("v" -> (col("v") + 2.0)))                              // v3
      def q = spark.read.format("graft").load(src)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
      def scans(df: org.apache.spark.sql.DataFrame, p: String) =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources
              .LogicalRelation(fs: org.apache.spark.sql.execution
              .datasources.HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath.startsWith(p))
          case _ => false
        }
      val comp = q
      assert(scans(comp, view),
        "compensated plan must still fold the view's delta log")
      val got = comp.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == recompute(src),
        s"compensated answer must be CURRENT: $got vs ${recompute(src)}")
      // catching the view up makes the SAME text drop the tail leg
      AggView.maintain(spark, src, view, "id", "g", "v")
      val fresh = q
      assert(scans(fresh, view) && !scans(fresh, src),
        "fresh view: no compensation leg")
      assert(fresh.collect().map(
        r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
        == recompute(src))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  private def scansPath(df: org.apache.spark.sql.DataFrame,
      p: String): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case org.apache.spark.sql.execution.datasources
          .LogicalRelation(fs: org.apache.spark.sql.execution
          .datasources.HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.exists(_.toUri.getPath == p)
      case _ => false
    }

  test("MV rewrite serves avg and stddev from the maintained moments") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/avg_src", s"$root/avg_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    GraftLog.append(srcDf(100 until 150), src)                     // v1
    GraftLog.delete(spark, src, col("id") % 10 === 0)              // v2
    GraftLog.update(spark, src, col("id") % 3 === 0,
      Seq("v" -> (col("v") + 1.0)))                                // v3
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      val q = spark.read.format("graft").load(src)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("a"),
          round(stddev_samp(col("v")), 6).as("s"))
      assert(scansPath(q, view) && !scansPath(q, src),
        "avg+stddev aggregate must rewrite to the view scan")
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      val expect = GraftLog.read(spark, src).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("a"),
          round(stddev_samp(col("v")), 6).as("s"))
        .collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(got == expect,
        s"rewritten avg/stddev drifted: $got vs $expect")
      // a FLOAT avg (no exact-decimal cast) must keep the base plan
      val floatQ = spark.read.format("graft").load(src)
        .groupBy(col("g")).agg(avg(col("v")).as("a"))
      assert(scansPath(floatQ, src) && !scansPath(floatQ, view),
        "float avg must not rewrite")
      // a view WITHOUT d_sumsq cannot serve stddev: simulate by
      // registering a legacy two-column view
      val legacy = s"$root/avg_legacy"
      GraftLog.overwrite(GraftLog.read(spark, view)
        .select(col("g"), col("d_count"), col("d_value")), legacy)
      // (not ledger-maintained, so only the shape gate is exercised:
      // the stddev branch must refuse BEFORE any freshness read)
      val q2 = spark.read.format("graft").load(src)
        .groupBy(col("g")).agg(round(stddev_samp(col("v")), 6).as("s"))
      assert(scansPath(q2, view),
        "stddev alone rewrites against the d_sumsq-bearing view")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("group-column WHERE rewrites; row-level WHERE keeps base plan") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/where_src", s"$root/where_view")
    GraftLog.overwrite(srcDf(0 until 120), src)
    GraftLog.delete(spark, src, col("id") % 11 === 0)
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
      // a WHERE on the GROUP column selects whole groups — served
      // from the view with the predicate carried over
      val q = agg(spark.read.format("graft").load(src)
        .filter(col("g").isin("g0", "g2")))
      assert(scansPath(q, view) && !scansPath(q, src),
        "group-column WHERE must rewrite to a filtered view scan")
      val got = q.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val expect = agg(GraftLog.read(spark, src)
        .filter(col("g").isin("g0", "g2"))).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == expect && got.keySet == Set("g0", "g2"),
        s"filtered rewrite drifted: $got vs $expect")
      // a predicate on a NON-group column cannot be answered from the
      // rollup — the base plan must survive
      val rowQ = agg(spark.read.format("graft").load(src)
        .filter(col("id") % 2 === 0))
      assert(scansPath(rowQ, src) && !scansPath(rowQ, view),
        "row-level WHERE must keep the base plan")
      // mixed conjunction (group AND row column) also refuses
      val mixQ = agg(spark.read.format("graft").load(src)
        .filter(col("g") === "g1" && col("id") > 10))
      assert(scansPath(mixQ, src) && !scansPath(mixQ, view),
        "mixed-column WHERE must keep the base plan")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("HAVING and ORDER BY resolve over the rewritten aggregate") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/hav_src", s"$root/hav_view")
    GraftLog.overwrite(srcDf(0 until 120), src)
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    spark.sql("DROP TABLE IF EXISTS mv_hav_t")
    spark.sql(s"CREATE TABLE mv_hav_t USING graft OPTIONS (path '$src')")
    try {
      // parent plan nodes (HAVING filter, sort, limit) reference the
      // aggregate's output attributes — the rewrite preserves their
      // exprIds, so the whole statement resolves over the view scan
      val q = spark.sql(
        """SELECT g, count(1) AS n,
          |  round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE), 6)
          |    AS t
          |FROM mv_hav_t GROUP BY g HAVING count(1) > 25
          |ORDER BY t DESC LIMIT 3""".stripMargin)
      assert(scansPath(q, view) && !scansPath(q, src),
        "HAVING/ORDER BY/LIMIT statement must still rewrite to the view")
      val expect = GraftLog.read(spark, src).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
        .filter(col("n") > 25).orderBy(col("t").desc).limit(3)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val got = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect, s"HAVING rewrite drifted: $got vs $expect")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mv_hav_t")
      graft.sql.MvRegistry.unregister(src)
    }
  }

  test("compensated rewrite serves avg/stddev/var from view + CDF tail") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/cavg_src", s"$root/cavg_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v",
      key = "id", compensate = true)
    try {
      // the view LAGS by an append + update the tail must fold,
      // including the d_sumsq second-moment deltas
      GraftLog.append(srcDf(100 until 130), src)                   // v1
      GraftLog.update(spark, src, col("id") % 4 === 0,
        Seq("v" -> (col("v") + 3.0)))                              // v2
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("a"),
          round(stddev_samp(col("v")), 6).as("s"),
          round(var_samp(col("v")), 6).as("vv"))
      val q = shape(spark.read.format("graft").load(src))
      assert(scansPath(q, view),
        "compensated plan must fold the view's delta log")
      def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val got = toMap(q.collect())
      val expect = toMap(shape(GraftLog.read(spark, src)).collect())
      assert(got == expect,
        s"compensated avg/stddev/var must be CURRENT: $got vs $expect")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("time-traveled scans never rewrite to the current view") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/tt_src", s"$root/tt_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    GraftLog.append(srcDf(100 until 140), src)                     // v1
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
      // a historical read must keep its base plan AND its answer
      val hist = agg(spark.read.format("graft")
        .option("versionAsOf", "0").load(src))
      assert(scansPath(hist, src) && !scansPath(hist, view),
        "versionAsOf scan must NOT be served from the current view")
      assert(hist.agg(sum(col("n"))).head.getLong(0) == 100L,
        "historical answer must be the v0 state, not the current one")
      // a versionAsOf pinned AT the latest snapshot is the current
      // state — the rewrite stays sound and may fire
      val atLatest = agg(spark.read.format("graft")
        .option("versionAsOf", "1").load(src))
      assert(scansPath(atLatest, view),
        "versionAsOf == latest is the current snapshot; rewrite serves")
      assert(atLatest.agg(sum(col("n"))).head.getLong(0) == 140L)
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("nested truncating casts refuse the exact-decimal gate") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/cast_src", s"$root/cast_view")
    GraftLog.overwrite(srcDf(0 until 80)
      .withColumn("v", col("v") + 0.5), src)
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    spark.sql("DROP TABLE IF EXISTS mv_cast_t")
    spark.sql(s"CREATE TABLE mv_cast_t USING graft OPTIONS (path '$src')")
    try {
      // the inner CAST(v AS INT) truncates in the base plan — serving
      // the view's exact-decimal sum would change the answer
      val q = spark.sql(
        """SELECT g, sum(CAST(CAST(v AS INT) AS DECIMAL(38,10))) AS t
          |FROM mv_cast_t GROUP BY g""".stripMargin)
      assert(scansPath(q, src) && !scansPath(q, view),
        "sum over a nested truncating cast must keep the base plan")
      val direct = spark.sql(
        """SELECT g, sum(CAST(v AS DECIMAL(38,10))) AS t
          |FROM mv_cast_t GROUP BY g""".stripMargin)
      assert(scansPath(direct, view) && !scansPath(direct, src),
        "the direct exact-decimal cast still rewrites")
      // answers agree with their own base recomputes
      val baseTrunc = GraftLog.read(spark, src).groupBy(col("g"))
        .agg(sum(col("v").cast("int").cast("decimal(38,10)")).as("t"))
        .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
      val gotTrunc = q.collect()
        .map(r => r.getString(0) -> r.getDecimal(1)).toMap
      assert(gotTrunc == baseTrunc)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mv_cast_t")
      graft.sql.MvRegistry.unregister(src)
    }
  }

  test("freshness race: maintenance mid-gate never tears the answer") {
    // a maintenance commit landing between the gate's ledger read and
    // the view scan must not double-fold (view + CDF tail deriving the
    // same versions). Maintenance never changes the SOURCE, so the
    // rewritten answer must equal the base recompute regardless of
    // where in the gate the commit lands — the pinned-snapshot gate
    // guarantees it; the pre-pin code double-counted here.
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/race_src", s"$root/race_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v",
      key = "id", compensate = true)
    // the view LAGS by two commits the seam will fold mid-gate
    GraftLog.append(srcDf(100 until 130), src)                     // v1
    GraftLog.update(spark, src, col("id") % 4 === 0,
      Seq("v" -> (col("v") + 2.0)))                                // v2
    // the expected base answer, pinned BEFORE the seam is armed (the
    // source never changes below; only maintenance commits land)
    val expect = recompute(src)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.sql.GraftMvRewriteRule.raceSeam = () => {
      if (fired.incrementAndGet() == 1) {
        AggView.maintain(spark, src, view, "id", "g", "v"): Unit
      }
    }
    try {
      val q = spark.read.format("graft").load(src)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
      val got = q.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(fired.get() >= 1, "the seam must have run inside the gate")
      assert(scansPath(q, view), "the (now fresh) view serves the plan")
      assert(got == expect,
        s"mid-gate maintenance tore the answer: $got vs $expect")
    } finally {
      graft.sql.GraftMvRewriteRule.raceSeam = () => ()
      graft.sql.MvRegistry.unregister(src)
    }
  }

  test("DROP TABLE and RESTORE invalidate matching MV registrations") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/life_src", s"$root/life_view")
    GraftLog.overwrite(srcDf(0 until 50), src)
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    spark.sql("DROP TABLE IF EXISTS mv_life_t")
    spark.sql(s"CREATE TABLE mv_life_t USING graft OPTIONS (path '$src')")
    try {
      assert(graft.sql.MvRegistry.lookup(src).isDefined)
      // DROP TABLE on the SOURCE's catalog entry invalidates by path
      spark.sql("DROP TABLE mv_life_t")
      assert(graft.sql.MvRegistry.lookup(src).isEmpty,
        "DROP TABLE must unregister the MvDef keyed at the path")
      // re-register; RESTORE on the VIEW path also invalidates (the
      // rewound ledger no longer describes the delta log)
      AggView.registerForRewrite(src, view, "g", "v")
      GraftLog.restore(spark, view, 0L)
      assert(graft.sql.MvRegistry.lookup(src).isEmpty,
        "RESTORE of the view must unregister the MvDef")
      // and RESTORE on the SOURCE path, via the SQL statement surface
      AggView.registerForRewrite(src, view, "g", "v")
      GraftLog.append(srcDf(50 until 60), src)
      spark.sql(s"RESTORE '$src' TO VERSION AS OF 0")
      assert(graft.sql.MvRegistry.lookup(src).isEmpty,
        "SQL RESTORE of the source must unregister the MvDef")
      // a drop of an UNRELATED graft table leaves registrations alone
      AggView.registerForRewrite(src, view, "g", "v")
      val other = s"$root/life_other"
      GraftLog.overwrite(srcDf(0 until 5), other)
      spark.sql("DROP TABLE IF EXISTS mv_life_o")
      spark.sql(s"CREATE TABLE mv_life_o USING graft OPTIONS (path '$other')")
      spark.sql("DROP TABLE mv_life_o")
      assert(graft.sql.MvRegistry.lookup(src).isDefined,
        "unrelated DROP must not disturb other registrations")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mv_life_t")
      spark.sql("DROP TABLE IF EXISTS mv_life_o")
      graft.sql.MvRegistry.unregister(src)
    }
  }

  test("streaming CDF emits preimages only when asked") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val src = s"$root/pre_src"
    GraftLog.overwrite(srcDf(0 until 30), src)                     // v0
    GraftLog.update(spark, src, col("id") % 5 === 0,
      Seq("v" -> (col("v") + 1.0)))                                // v1
    def drainTypes(withPre: Boolean): Map[String, Long] = {
      val acc = new java.util.concurrent.ConcurrentHashMap[String,
        java.lang.Long]()
      val r = spark.readStream.format("graft")
        .option("readChangeFeed", "true").option("cdfKeys", "id")
      val q = (if (withPre) r.option("includePreimages", "true") else r)
        .load(src)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.groupBy(col("_change_type")).count().collect().foreach(x =>
            acc.merge(x.getString(0), x.getLong(1), (a, c) =>
              a + c))
          ()
        }
        .option("checkpointLocation",
          s"$root/ckpt_${withPre}_${System.nanoTime()}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      acc.asScala.map { case (k, v) => k -> v.longValue }.toMap
    }
    val without = drainTypes(withPre = false)
    assert(without.get("update_postimage").contains(6L) &&
      !without.contains("update_preimage"), s"default: $without")
    val withPre = drainTypes(withPre = true)
    assert(withPre.get("update_preimage").contains(6L) &&
      withPre.get("update_postimage").contains(6L), s"preimages: $withPre")
  }

  test("NULL-bearing value column: avg/stddev/var divide by d_vcount") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/null_src", s"$root/null_view")
    // v NULL on every 5th row, plus a group whose values are ALL NULL —
    // the base operators aggregate non-null rows only, so the rewrite's
    // divisor must be the maintained non-null count, never d_count
    val base = srcDf(0 until 100)
      .withColumn("v", when(col("id") % 5 === 0, lit(null)
        .cast("double")).otherwise(col("v")))
    val allNull = (100L until 105L).map(i => (i, "gn")).toSeq
      .toDF("id", "g").withColumn("v", lit(null).cast("double"))
    GraftLog.overwrite(base.unionByName(allNull), src)             // v0
    GraftLog.append(srcDf(200 until 230)
      .withColumn("v", when(col("id") % 7 === 0, lit(null)
        .cast("double")).otherwise(col("v"))), src)                // v1
    GraftLog.delete(spark, src, col("id") % 10 === 3)              // v2
    AggView.maintain(spark, src, view, "id", "g", "v")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
          .as("a"),
        round(stddev_samp(col("v")), 6).as("s"),
        round(var_samp(col("v")), 6).as("vv"))
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getString(0) -> (r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    // expected = the base plan, collected BEFORE registration
    val expect = toMap(shape(spark.read.format("graft").load(src))
      .collect())
    assert(expect("gn")._2.isEmpty && expect("gn")._3.isEmpty,
      s"all-NULL group must answer NULL in the base plan: $expect")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      val q = shape(spark.read.format("graft").load(src))
      assert(scansPath(q, view) && !scansPath(q, src),
        "a d_vcount-bearing view serves a nullable value column")
      val got = toMap(q.collect())
      assert(got == expect,
        s"NULL-safe rewrite must equal the base plan: $got vs $expect")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("non-deterministic scan filters refuse the rewrite") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/nd_src", s"$root/nd_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    AggView.maintain(spark, src, view, "id", "g", "v")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
      // rand() references no columns, so the group-column reference
      // check passes vacuously — but the predicate would evaluate once
      // per DELTA-LOG row instead of once per fact row: refuse
      val nd = agg(spark.read.format("graft").load(src)
        .filter(col("g") === "g1" && rand() < 2.0))
      assert(scansPath(nd, src) && !scansPath(nd, view),
        "non-deterministic filter must keep the base plan")
      // the deterministic twin still rewrites
      val det = agg(spark.read.format("graft").load(src)
        .filter(col("g") === "g1"))
      assert(scansPath(det, view) && !scansPath(det, src))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("second-moment overflow poisons stddev/var; sum/count/avg serve") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/of_src", s"$root/of_view")
    // |v| = 1e15 squares to 1e30 > decimal(38,10)'s 1e28 bound: the
    // per-row cast NULLs under non-ANSI mode and Sum would silently
    // skip it — maintenance must detect and poison the view instead
    val big = srcDf(0 until 60).withColumn("v",
      when(col("id") % 13 === 0, lit(1.0e15)).otherwise(col("v")))
    GraftLog.overwrite(big, src)                                   // v0
    AggView.maintain(spark, src, view, "id", "g", "v")
    assert(GraftLog.properties(spark, view)
      .get(AggView.SumsqOverflowProp).contains("true"),
      "maintenance must stamp the overflow poison property")
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      val sd = spark.read.format("graft").load(src).groupBy(col("g"))
        .agg(round(stddev_samp(col("v")), 6).as("s"))
      assert(scansPath(sd, src) && !scansPath(sd, view),
        "a poisoned view must never serve the second moment")
      // first-moment aggregates are unaffected by the dropped square
      val ok = spark.read.format("graft").load(src).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("a"))
      assert(scansPath(ok, view) && !scansPath(ok, src),
        "count/avg still serve from a sumsq-poisoned view")
      val expect = GraftLog.read(spark, src).groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
            .as("a"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2))).toSet
      val got = ok.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toSet
      assert(got == expect, s"$got vs $expect")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("subset grouping re-aggregates the finer view; global agg refuses") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/sub_src", s"$root/sub_view")
    val data = srcDf(0 until 200)
      .withColumn("b", col("id") % 3)
    GraftLog.overwrite(data, src)                                  // v0
    GraftLog.delete(spark, src, col("id") % 10 === 4)              // v1
    AggView.maintainCols(spark, src, view, "id", Seq("g", "b"), "v")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Deterministic.sumExact(col("v"))
          .cast("double"), 6).as("t"),
        round(avg(col("v").cast("decimal(38,10)")).cast("double"), 6)
          .as("a"),
        round(stddev_samp(col("v")), 6).as("s"))
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val expectFiltered = toMap(shape(spark.read.format("graft")
      .load(src).filter(col("b") === 1)).collect())
    val expectRollup = toMap(shape(spark.read.format("graft")
      .load(src)).collect())
    AggView.registerForRewriteCols(src, view, Seq("g", "b"), "v")
    try {
      // WHERE on the bucket column, GROUP BY the coarser key: served
      // by bucket-exact filtering + re-aggregation over the view
      val q = shape(spark.read.format("graft").load(src)
        .filter(col("b") === 1))
      assert(scansPath(q, view) && !scansPath(q, src),
        "bucket-filtered subset grouping must serve from the view")
      assert(toMap(q.collect()) == expectFiltered)
      // the unfiltered coarser rollup re-aggregates the same view —
      // count/sum/avg AND the second moment fold over finer buckets
      val roll = shape(spark.read.format("graft").load(src))
      assert(scansPath(roll, view) && !scansPath(roll, src),
        "subset re-aggregation must serve from the view")
      assert(toMap(roll.collect()) == expectRollup)
      // a GLOBAL aggregate refuses: after a full delete the liveness
      // filter would drop the one row a base global agg still returns
      val glob = spark.read.format("graft").load(src)
        .agg(count(lit(1)).as("n"))
      assert(scansPath(glob, src) && !scansPath(glob, view),
        "global aggregates must keep the base plan")
    } finally graft.sql.MvRegistry.unregister(src)
  }

  test("min/max serve while insert-only; any remove poisons them only") {
    val root = Staging.tempDir("graft_aggv_spec_")
    val (src, view) = (s"$root/mm_src", s"$root/mm_view")
    GraftLog.overwrite(srcDf(0 until 100), src)                    // v0
    GraftLog.append(srcDf(100 until 140), src)                     // v1
    AggView.maintain(spark, src, view, "id", "g", "v")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 6).as("mn"),
        round(max(col("v")), 6).as("mx"))
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val expect = toMap(shape(spark.read.format("graft").load(src))
      .collect())
    AggView.registerForRewrite(src, view, "g", "v")
    try {
      val q = shape(spark.read.format("graft").load(src))
      assert(scansPath(q, view) && !scansPath(q, src),
        "insert-only extrema must serve from the view")
      assert(toMap(q.collect()) == expect)
      // an UPDATE is a remove+insert — it must poison extrema too
      GraftLog.update(spark, src, col("id") % 9 === 0,
        Seq("v" -> (col("v") + 5.0)))                              // v2
      AggView.maintain(spark, src, view, "id", "g", "v")
      assert(GraftLog.properties(spark, view)
        .get(AggView.RemovesSeenProp).contains("true"))
      val after = shape(spark.read.format("graft").load(src))
      assert(scansPath(after, src) && !scansPath(after, view),
        "extrema must fall back once removes were folded")
      // the additive aggregates still serve from the same view
      val additive = spark.read.format("graft").load(src)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.sumExact(col("v"))
            .cast("double"), 6).as("t"))
      assert(scansPath(additive, view) && !scansPath(additive, src),
        "count/sum keep serving from a removes-poisoned view")
    } finally graft.sql.MvRegistry.unregister(src)
  }
}
