package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Deterministic.sumExact
import graft.sources.GraftLog

/** Incremental MATERIALIZED-VIEW maintenance over the change data feed —
  * the aggregate the reference's gold tier recomputes from scratch each
  * run (`financial_dl_gold.py` full-table rollups), maintained here from
  * per-commit deltas so the cost per refresh is bounded by the CHANGES,
  * never the fact table. At 100 TB a nightly full recompute of a
  * per-group rollup scans the lake; this maintains the same answer from
  * the file-bounded CDF of each commit ([[GraftLog.changesAt]] reads
  * only the files the commit touched).
  *
  * The view is a DELTA-LOG table, not a stored result: each source
  * version v lands ONE append of per-group (d_count, d_value) deltas —
  * inserts/update-postimages count +1/+value, deletes/update-preimages
  * −1/−value — stamped (appId, batchId = v) in the txn ledger, so
  * maintenance is exactly-once by the same mechanism streaming sinks
  * use: a replayed version is rejected by the ledger ATOMICALLY with the
  * data commit (no separate "applied-through" bookkeeping to desync
  * after a crash). Reading the view aggregates the delta log — a table
  * whose size is O(versions × groups), kept compact by the write-path
  * auto-compactor (the view opts into `graft.autoCompact`): decimal
  * sums are exact and order-independent, so folding deltas in any
  * grouping gives the recompute's answer bit-for-bit.
  *
  * This is the classic incremental-view-maintenance design (additive
  * aggregates over insert/delete deltas); COUNT and SUM maintain
  * directly, AVG derives, and the groups whose running count reaches 0
  * vanish on read. */
object AggView {

  private[graft] val AppId = "graft-aggview"

  /** Fold every source commit past the view's ledger high-water into
    * the delta log: one file-bounded CDF diff + one ledger-stamped
    * append per version. Returns the number of versions applied (0 on
    * a pure replay — the idempotence pin). Multi-column group keys
    * carry straight through (the reference's gold rollup is
    * year × month × ticker — `financial_dl_gold.py`). */
  def maintainCols(spark: SparkSession, src: String, view: String,
      key: String, groupCols: Seq[String], valueCol: String): Int =
    maintainColsAs(spark, src, view, key, groupCols, valueCol, AppId)

  /** d38 — maintain ONE view over SEVERAL fact sources (the medallion
    * fan-in: events_mobile ∪ events_web → one rollup): each source
    * folds under its own ledger app id, so per-source high-waters
    * advance independently and the union rewrite's freshness gate can
    * check every leg. Cost per refresh stays bounded by each source's
    * CHANGES. */
  def maintainUnion(spark: SparkSession, srcs: Seq[String],
      view: String, key: String, groupCols: Seq[String],
      valueCol: String): Int =
    srcs.map(s => maintainColsAs(spark, s, view, key, groupCols,
      valueCol, graft.sql.MvRegistry.unionAppId(AppId, s))).sum

  /** Register every source of a union-MV for the planner rewrite of
    * matching aggregates over their UNION ALL. */
  def registerForRewriteUnion(srcs: Seq[String], view: String,
      groupCols: Seq[String], valueCol: String): Unit = {
    val d = graft.sql.MvRegistry.MvDef(view, groupCols, valueCol,
      AppId, unionOf = srcs)
    srcs.foreach(s => graft.sql.MvRegistry.register(s, d))
  }

  private def maintainColsAs(spark: SparkSession, src: String,
      view: String, key: String, groupCols: Seq[String],
      valueCol: String, appId: String): Int = {
    require(groupCols.nonEmpty, "maintain needs at least one group col")
    val from = GraftLog.lastCommittedBatch(spark, view, appId)
      .getOrElse(-1L)
    var applied = 0
    GraftLog.versions(spark, src).filter(_ > from).foreach { v =>
      val cdf = GraftLog.changesAt(spark, src, Seq(key), v,
        preimages = true)
      val deltas = graft.CacheScope.tracked(
        cdf.select(groupCols.map(col) ++ Seq(
          when(col("_change_type").isin("insert", "update_postimage"),
            lit(1L)).otherwise(lit(-1L)).as("__sign"),
          col(valueCol).as("__v"),
          // second moment for the stddev rewrite: the square is taken
          // in DOUBLE (exactly the per-row value stddev_samp sees),
          // then summed in exact decimal — deterministic under any
          // partitioning, like d_value
          col(valueCol).cast("double").as("__vd")): _*)
        .withColumn("__sq",
          (col("__sign") * col("__vd") * col("__vd"))
            .cast("decimal(38,10)"))
        .groupBy(groupCols.map(col): _*)
        .agg(sum(col("__sign")).as("d_count"),
          sumExact(col("__sign") * col("__v")).as("d_value"),
          sum(col("__sq")).as("d_sumsq"),
          // NON-NULL value count: avg/stddev/var divide by the count
          // of non-null VALUES, not rows — d_count counts rows, so a
          // nullable value column needs this as the rewrite's n
          sum(col("__sign") *
            when(col("__v").isNull, 0L).otherwise(1L)).as("d_vcount"),
          // per-commit extrema over INSERTED rows: min/max fold over
          // the delta log (min of mins) while the table is
          // insert-only; any remove poisons them below — a deleted
          // row may have BEEN the minimum, and no delta can restore it
          min(when(col("__sign") === 1L, col("__v"))).as("d_min"),
          max(when(col("__sign") === 1L, col("__v"))).as("d_max"),
          // overflow sentinel: decimal(38,10) holds |x| < 1e28, so a
          // |value| ≥ ~1e14 squares to a NULL cast under non-ANSI
          // mode — indistinguishable from a NULL input after the Sum
          // skips it, which would silently corrupt the served moment
          max(col("__vd").isNotNull && col("__sq").isNull)
            .as("__sq_of"),
          max(col("__sign") === -1L).as("__rm")))
      val f = deltas
        .agg(max(col("__sq_of")).as("of"), max(col("__rm")).as("rm"))
        .head()
      val (poisoned, removes) =
        (!f.isNullAt(0) && f.getBoolean(0),
          !f.isNullAt(1) && f.getBoolean(1))
      if (GraftLog.txnAppend(deltas.drop("__sq_of", "__rm"), view,
          appId, v))
        applied += 1
      // poison AFTER the append (the view must exist); the rewrite
      // checks these properties and refuses the affected
      // decompositions — wrong-but-fast is never acceptable, and a
      // dropped square (or a vanished minimum) is a wrong answer. The
      // additive aggregates keep serving: d_value/d_count/d_vcount
      // fold exactly under removes.
      if (poisoned)
        GraftLog.setProperties(spark, view,
          Map(SumsqOverflowProp -> "true")): Unit
      if (removes)
        GraftLog.setProperties(spark, view,
          Map(RemovesSeenProp -> "true")): Unit
    }
    applied
  }

  /** Set on a view whose delta log dropped at least one second-moment
    * square to decimal overflow (|value| ≥ ~1e14): the stddev/var
    * rewrite refuses such a view; everything else still serves. */
  val SumsqOverflowProp = "graft.aggview.sumsqOverflow"

  /** Set once the maintained source has seen any DELETE or UPDATE:
    * min/max are not additive under removes (the removed row may have
    * been the extremum), so the min/max rewrite refuses such a view
    * while count/sum/avg/stddev keep serving — they fold signed
    * deltas exactly. */
  val RemovesSeenProp = "graft.aggview.removesSeen"

  def maintain(spark: SparkSession, src: String, view: String,
      key: String, groupCol: String, valueCol: String): Int =
    maintainCols(spark, src, view, key, Seq(groupCol), valueCol)

  /** The view's answer: fold the delta log. Groups whose running count
    * is zero no longer exist (all their rows were deleted). */
  def readCols(spark: SparkSession, view: String,
      groupCols: Seq[String]): DataFrame =
    GraftLog.read(spark, view)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("d_count")).as("n_events"),
        round(sum(col("d_value")).cast("double"), 6).as("total_value"))
      .filter(col("n_events") > 0)

  def read(spark: SparkSession, view: String, groupCol: String)
      : DataFrame = readCols(spark, view, Seq(groupCol))

  /** i28 — the registered lifecycle: seed → maintain → append + delete +
    * update on the SOURCE → maintain (three file-bounded diffs, no
    * source rescan) → replay-maintain (ledger no-ops, pinned). Oracle =
    * the full recompute over the source's final state — the incremental
    * fold must be bit-identical. */
  def incrementalAggView(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_aggv_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    maintain(spark, src, view, "event_id", "event_type", "value")
    // the view is itself a rolling-ingest table: opt into write-path
    // compaction so the delta log never accretes one file per version
    GraftLog.setProperties(spark, view, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.minNumFiles" -> "8"))
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    val applied = maintain(spark, src, view,
      "event_id", "event_type", "value")
    val replay = maintain(spark, src, view,
      "event_id", "event_type", "value")
    read(spark, view, "event_type")
      .withColumn("applied_incr", lit(applied))
      .withColumn("replay_noop", lit(replay == 0))
  }

  /** Register `view` (maintained by [[maintain]]) for planner
    * auto-rewrite of matching aggregates over `src` — see
    * [[graft.sql.GraftMvRewriteRule]] for the soundness gates. With
    * `compensate = true` (requires `key`, the CDF row identity) a
    * stale view still serves: the rewrite folds the view plus the
    * source's CDF tail, always-current at O(changes). */
  def registerForRewrite(src: String, view: String, groupCol: String,
      valueCol: String, key: String = "",
      compensate: Boolean = false): Unit =
    registerForRewriteCols(src, view, Seq(groupCol), valueCol, key,
      compensate)

  def registerForRewriteCols(src: String, view: String,
      groupCols: Seq[String], valueCol: String, key: String = "",
      compensate: Boolean = false): Unit =
    graft.sql.MvRegistry.register(src,
      graft.sql.MvRegistry.MvDef(view, groupCols, valueCol, AppId,
        key, compensate))

  /** d27 — MV auto-rewrite, the planner half of i28: the SAME
    * fact-table aggregate is written twice; while the view is FRESH
    * the planner serves it from the delta-log rollup (plan scans the
    * view, never the fact table), and one un-maintained source commit
    * later the SAME text falls back to the base plan. `used_view` /
    * `fell_back` pin both plan decisions in the result; the values are
    * the i28 recompute (the rewrite must be invisible to them). */
  def aggViewAutoRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvrw_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintain(spark, src, view, "event_id", "event_type", "value")
    registerForRewrite(src, view, "event_type", "value")
    try {
      def q = spark.read.format("graft").load(src)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sumExact(col("value")).cast("double"), 6)
            .as("total_value"))
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toString == path)
          case _ => false
        }
      val fresh = q // analyzed NOW, while the view is current
      val usedView = scans(fresh, view) && !scans(fresh, src)
      // one source commit the view has not folded → same text, base plan
      GraftLog.append(ev.filter(col("event_id") % 3 === 2)
        .limit(50), src)                                          // v4
      val stale = q
      val fellBack = scans(stale, src) && !scans(stale, view)
      // `fresh` executes lazily AFTER v4 landed: only the view rewrite
      // (whose table v4 never touched) keeps its values at the v3 state
      fresh.withColumn("used_view", lit(usedView))
        .withColumn("fell_back", lit(fellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d29 — DELTA-COMPENSATED rewrite, the stale half d27 falls back
    * on: registered with `compensate = true`, the SAME aggregate text
    * over a source the view lags by one commit plans as
    * view-delta-log ∪ CDF-tail-deltas → fold — the answer is CURRENT
    * (includes the un-maintained commit) at O(changes) extra cost,
    * never the fact scan and never a stale result. `used_view` /
    * `compensated` pin the plan shape (view scanned; source touched
    * only through the file-bounded CDF tail). */
  def aggViewCompensatedRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvcomp_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintain(spark, src, view, "event_id", "event_type", "value")
    registerForRewrite(src, view, "event_type", "value",
      key = "event_id", compensate = true)
    try {
      // the view now LAGS: one deterministic un-maintained commit
      GraftLog.append(ev.filter(col("event_id") % 11 === 0), src) // v4
      val q = spark.read.format("graft").load(src)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sumExact(col("value")).cast("double"), 6)
            .as("total_value"))
      val leaves = q.queryExecution.optimizedPlan.collectLeaves()
      def fileScan(path: String): Boolean = leaves.exists {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == path)
        case _ => false
      }
      // compensated = the view's file scan PLUS a second (non-file)
      // leaf — the CDF tail's row-level relation — and NO fact-root
      // scan (the fallback plan's signature)
      val usedView = fileScan(view)
      val compensated = usedView && !fileScan(src) && leaves.size > 1
      q.withColumn("used_view", lit(usedView))
        .withColumn("compensated", lit(compensated))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d30 — MULTI-COLUMN maintained rollup + rewrite: the reference's
    * gold tier groups by year × month × ticker
    * (`financial_dl_gold.py`), the canonical shape this generalizes
    * to. The view maintains (event_type, user-bucket) keys through the
    * same append/delete/update lifecycle as i28; the matching
    * two-column aggregate plans against the view (group order in the
    * QUERY deliberately differs from the registration — the rewrite
    * matches the SET, preserving the query's order). */
  def aggViewMultiCol(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvmc_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        pmod(col("user_id"), lit(4L)).as("ub"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintainCols(spark, src, view, "event_id",
      Seq("event_type", "ub"), "value")
    registerForRewriteCols(src, view, Seq("event_type", "ub"), "value")
    try {
      val q = spark.read.format("graft").load(src)
        .groupBy(col("ub"), col("event_type")) // reversed order
        .agg(count(lit(1)).as("n_events"),
          round(sumExact(col("value")).cast("double"), 6)
            .as("total_value"))
      val usedView = q.queryExecution.optimizedPlan.collectLeaves()
        .exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == view)
          case _ => false
        }
      q.withColumn("used_view", lit(usedView))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d31 — the reference's OWN gold-rollup shape served from the view:
    * `avg` + `stddev` (`financial_dl_etl.py:88-94` — AverageROI /
    * Volatility) over a maintained rollup, auto-rewritten by the
    * planner. The view's delta log carries (d_count, d_value, d_sumsq);
    * avg rebuilds as Average's own exact-decimal sum/count divide, and
    * stddev_samp as the exact second moment sqrt((Σx² − (Σx)²/n)/(n−1))
    * — only the final sqrt floats. `used_view` pins that the plan scans
    * the VIEW and never the fact table; the values are the recompute
    * over the source's post-lifecycle state (append + delete + update
    * folded). At 100 TB this turns the reference's nightly full-lake
    * gold recompute into a groups-sized view read. */
  def aggViewGoldRollupRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvavg_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintain(spark, src, view, "event_id", "event_type", "value")
    registerForRewrite(src, view, "event_type", "value")
    try {
      val q = spark.read.format("graft").load(src)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(avg(col("value").cast("decimal(38,10)")).cast("double"),
            6).as("average_roi"),
          round(stddev_samp(col("value")), 6).as("volatility"))
      def scans(path: String): Boolean =
        q.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      val usedView = scans(view) && !scans(src)
      q.withColumn("used_view", lit(usedView))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d32 — GROUP-COLUMN WHERE served from the view: the dashboard
    * point-query shape (`WHERE type IN (…) GROUP BY type`). A
    * predicate referencing group columns only selects whole groups, so
    * the rewrite carries it onto the view's per-group delta rows —
    * identical answer, still never the fact scan. A predicate touching
    * any OTHER column cannot be answered from the rollup and keeps the
    * base plan — both decisions pinned (`used_view` / `row_fell_back`).
    * At 100 TB this is the difference between a filtered groups-sized
    * view read and a full fact scan for every dashboard filter. */
  def aggViewFilteredRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvflt_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    maintain(spark, src, view, "event_id", "event_type", "value")
    registerForRewrite(src, view, "event_type", "value")
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def agg(df: DataFrame) = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sumExact(col("value")).cast("double"), 6)
            .as("total_value"))
      val q = agg(spark.read.format("graft").load(src)
        .filter(col("event_type").isin("click", "view")))
      val usedView = scans(q, view) && !scans(q, src)
      val rowQ = agg(spark.read.format("graft").load(src)
        .filter(col("value") > 0))
      val rowFellBack = scans(rowQ, src) && !scans(rowQ, view)
      q.withColumn("used_view", lit(usedView))
        .withColumn("row_fell_back", lit(rowFellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d33 — NON-GROUP-COLUMN WHERE served by a finer view: the round-13
    * boundary (a WHERE on a column outside the query's GROUP BY
    * refused) closed the production way — maintain the view at
    * (group, filter-column) granularity and let the rewrite
    * RE-AGGREGATE. Three plan decisions pinned: (1) `WHERE ub = 2
    * GROUP BY event_type` serves from the (event_type, ub) view — the
    * filter column is answered bucket-exactly, the coarser grouping by
    * folding buckets; (2) the unfiltered `GROUP BY event_type` rollup
    * serves from the SAME view (subset re-aggregation — one maintained
    * view answers the whole dashboard family); (3) a WHERE on a column
    * the view does not bucket (value) still refuses — the boundary
    * moved to exactly where the maintained granularity ends. At 100 TB
    * one (group, filter)-bucketed view of size O(groups × buckets)
    * replaces a full fact scan for every filtered dashboard variant. */
  def aggViewSubsetFilterRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvsub_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        pmod(col("user_id"), lit(4L)).as("ub"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    maintainCols(spark, src, view, "event_id",
      Seq("event_type", "ub"), "value")
    registerForRewriteCols(src, view, Seq("event_type", "ub"), "value")
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def agg(df: DataFrame) = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sumExact(col("value")).cast("double"), 6)
            .as("total_value"))
      // the dashboard shape: filter on ub (NOT in the query grouping)
      val q = agg(spark.read.format("graft").load(src)
        .filter(col("ub") === 2))
      val usedView = scans(q, view) && !scans(q, src)
      // the same view serves the coarser unfiltered rollup
      val roll = agg(spark.read.format("graft").load(src))
      val rollupUsedView = scans(roll, view) && !scans(roll, src)
      // a column the view does not bucket still refuses
      val rowQ = agg(spark.read.format("graft").load(src)
        .filter(col("value") > 0))
      val rowFellBack = scans(rowQ, src) && !scans(rowQ, view)
      q.withColumn("used_view", lit(usedView))
        .withColumn("rollup_used_view", lit(rollupUsedView))
        .withColumn("row_fell_back", lit(rowFellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d34 — maintained MIN/MAX rollup rewrite: the reference's silver
    * OHLC shape (`financial_dl_etl.py` high/low per day×ticker) served
    * from the view. Extrema fold over per-commit candidates (min of
    * mins) ONLY while the source is insert-only: a DELETE may remove
    * the current minimum and no delta can restore it, so the first
    * remove poisons min/max serving via a table property
    * ([[RemovesSeenProp]]) while count/sum/avg/stddev — which fold
    * signed deltas exactly — keep serving. Both plan decisions pinned
    * (`used_view` while insert-only, `minmax_fell_back` after the
    * delete); the returned values are the post-delete recompute. At
    * 100 TB an insert-only fact stream (the common append-only
    * telemetry shape) gets its high/low dashboard from a groups-sized
    * view; the first erasure wave degrades ONLY the extrema to fact
    * scans instead of serving them wrong. */
  def aggViewMinMaxRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvmm_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    maintain(spark, src, view, "event_id", "event_type", "value")
    registerForRewrite(src, view, "event_type", "value")
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def q = spark.read.format("graft").load(src)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(min(col("value")), 6).as("min_value"),
          round(max(col("value")), 6).as("max_value"))
      // insert-only: extrema serve from the view
      val usedView = scans(q, view) && !scans(q, src)
      // the first remove poisons min/max — the SAME text falls back
      GraftLog.delete(spark, src, col("event_id") % 7 === 0)       // v2
      maintain(spark, src, view, "event_id", "event_type", "value")
      val after = q
      val fellBack = scans(after, src) && !scans(after, view)
      after.withColumn("used_view", lit(usedView))
        .withColumn("minmax_fell_back", lit(fellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d35 — the JOIN-MV rewrite (eager aggregation): the star shape
    * `fact ⋈ dim GROUP BY dim.attr` — the reference's silver
    * enrichment joins against its gold rollups exactly like this —
    * served from a view maintained at fact-JOIN-KEY granularity. The
    * rewritten plan joins the groups-sized view to the dim table and
    * re-aggregates: each per-key delta row replicates once per
    * matching dim row, which is exactly the multiplicity every fact
    * row with that key would see, so counts/sums/averages fold to the
    * base plan's answer bit-for-bit (see
    * [[graft.sql.GraftMvRewriteRule]] for the zombie-key and NULL-key
    * arguments). Plan pins: `used_view` (the fresh plan scans the view
    * and the dim, never the fact root) and `fell_back` (one
    * un-maintained fact commit later the SAME text replans as the base
    * join). At 100 TB this turns every per-segment dashboard over a
    * fact ⋈ dim star into a |keys|-sized view join — the fact table is
    * never rescanned, and the view maintains at O(changes) per
    * commit. */
  def aggViewJoinRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvjn_")
    val (src, view, dimPath) = (s"$root/src", s"$root/view", s"$root/dim")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintainCols(spark, src, view, "event_id", Seq("user_id"), "value")
    registerForRewriteCols(src, view, Seq("user_id"), "value")
    // the dim: one row per user, derived deterministically from the
    // full corpus (a distinct-key parquet relation, like the
    // reference's listing/asset lookups)
    ev.select(col("user_id").as("uid")).distinct()
      .withColumn("segment",
        concat(lit("seg_"), pmod(col("uid"), lit(5L))))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def q = {
        val fact = spark.read.format("graft").load(src)
        fact.join(dim, fact("user_id") === dim("uid"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_events"),
            round(sumExact(col("value")).cast("double"), 6)
              .as("total_value"),
            round(avg(col("value").cast("decimal(38,10)"))
              .cast("double"), 6).as("avg_value"))
      }
      val fresh = q // analyzed NOW, while the view is current
      val usedView = scans(fresh, view) && !scans(fresh, src)
      // one un-maintained fact commit → the SAME text replans as the
      // base join (wrong-but-fast is never acceptable)
      GraftLog.append(ev.filter(col("event_id") % 3 === 2)
        .limit(50), src)                                          // v4
      val stale = q
      val fellBack = scans(stale, src) && !scans(stale, view)
      // `fresh` executes lazily AFTER v4 landed: only the view rewrite
      // (whose tables v4 never touched) keeps its values at v3 state
      fresh.withColumn("used_view", lit(usedView))
        .withColumn("fell_back", lit(fellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d42 — the LEFT-OUTER star served (the d35 gate relaxed to
    * FACT-PRESERVED outer joins): `fact LEFT JOIN dim GROUP BY
    * dim.attr` where some fact keys have no dim row. The rewritten
    * plan left-joins the key-grained view to the dim: an unmatched
    * view key null-extends once per delta row — exactly the base
    * multiplicity — so the NULL-dim group folds sum(d_count) to its
    * true row count, and zombie (fully-deleted) keys net zero wherever
    * they land, with an all-zombie NULL group dropped by the liveness
    * filter. The DIM-preserved direction stays refused (an unmatched
    * dim row would join net-zero delta rows the base join never
    * produces), as does the dim-side aggregate. The dim here drops one
    * user bucket in seven, so the NULL group carries real rows; it
    * surfaces as 'unmatched' (a post-aggregate coalesce — carried
    * verbatim above the rewrite). Pins as d35: `used_view` /
    * `fell_back`. */
  def aggViewOuterStarRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvos_")
    val (src, view, dimPath) = (s"$root/src", s"$root/view", s"$root/dim")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintainCols(spark, src, view, "event_id", Seq("user_id"), "value")
    registerForRewriteCols(src, view, Seq("user_id"), "value")
    // the PARTIAL dim: every seventh user bucket is missing, so those
    // users' events null-extend — the shape the inner-only gate used
    // to refuse
    ev.select(col("user_id").as("uid")).distinct()
      .filter(pmod(col("uid"), lit(7L)) =!= 0L)
      .withColumn("segment",
        concat(lit("seg_"), pmod(col("uid"), lit(5L))))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def q = {
        val fact = spark.read.format("graft").load(src)
        fact.join(dim, fact("user_id") === dim("uid"), "left")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_events"),
            round(sumExact(col("value")).cast("double"), 6)
              .as("total_value"),
            round(avg(col("value").cast("decimal(38,10)"))
              .cast("double"), 6).as("avg_value"))
          .withColumn("segment",
            coalesce(col("segment"), lit("unmatched")))
      }
      val fresh = q // analyzed NOW, while the view is current
      val usedView = scans(fresh, view) && !scans(fresh, src)
      // one un-maintained fact commit → the SAME text replans as the
      // base outer join
      GraftLog.append(ev.filter(col("event_id") % 3 === 2)
        .limit(50), src)                                          // v4
      val stale = q
      val fellBack = scans(stale, src) && !scans(stale, view)
      fresh.withColumn("used_view", lit(usedView))
        .withColumn("fell_back", lit(fellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d36 — the SNOWFLAKE join-MV rewrite: the d35 rule generalized to
    * an arbitrary inner-join tree — `fact ⋈ dimUser ⋈ dimCity GROUP BY
    * dimCity.region` locates the fact leaf anywhere in the tree,
    * swaps it for the key-grained view, substitutes fact refs in the
    * ancestor join conditions, and keeps every dim subtree (and the
    * dim-dim join condition) verbatim. The replication argument
    * composes transitively: each per-key delta row flows through the
    * SAME join chain as the fact rows it summarizes, so it picks up
    * exactly their multiplicity. Pins as d35: `used_view` (the fresh
    * plan scans view + both dims, never the fact), `fell_back` (one
    * un-maintained commit later the same text replans as the base
    * snowflake). At 100 TB the two dim legs are broadcast-able and the
    * fact leg is a |keys|-sized view — the canonical warehouse
    * dashboard query with the fact scan deleted from it. */
  def aggViewSnowflakeRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvsf_")
    val (src, view) = (s"$root/src", s"$root/view")
    val (duPath, dcPath) = (s"$root/dim_user", s"$root/dim_city")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    GraftLog.delete(spark, src, col("event_id") % 7 === 0)        // v2
    GraftLog.update(spark, src, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintainCols(spark, src, view, "event_id", Seq("user_id"), "value")
    registerForRewriteCols(src, view, Seq("user_id"), "value")
    // snowflake dims: user → city, city → region
    ev.select(col("user_id").as("uid")).distinct()
      .withColumn("city_id", pmod(col("uid"), lit(7L)))
      .write.mode("overwrite").parquet(duPath)
    spark.range(0, 7)
      .select(col("id").as("cid"),
        concat(lit("r"), pmod(col("id"), lit(3L))).as("region"))
      .write.mode("overwrite").parquet(dcPath)
    val (du, dc) = (spark.read.parquet(duPath), spark.read.parquet(dcPath))
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def q = {
        val fact = spark.read.format("graft").load(src)
        fact.join(du, fact("user_id") === du("uid"))
          .join(dc, du("city_id") === dc("cid"))
          .groupBy(col("region"))
          .agg(count(lit(1)).as("n_events"),
            round(sumExact(col("value")).cast("double"), 6)
              .as("total_value"))
      }
      val fresh = q // analyzed NOW, while the view is current
      val usedView = scans(fresh, view) && !scans(fresh, src) &&
        scans(fresh, duPath) && scans(fresh, dcPath)
      GraftLog.append(ev.filter(col("event_id") % 3 === 2)
        .limit(50), src)                                          // v4
      val stale = q
      val fellBack = scans(stale, src) && !scans(stale, view)
      fresh.withColumn("used_view", lit(usedView))
        .withColumn("fell_back", lit(fellBack))
    } finally graft.sql.MvRegistry.unregister(src)
  }

  /** d40 — the TWO-FACT join-MV rewrite (double eager aggregation):
    * `revenue ⋈ volume ON user key GROUP BY user` with BOTH sides
    * registered facts — the medallion "gold revenue × gold volume"
    * dashboard — served by joining the two views pre-aggregated to
    * key granularity and folding cross-weighted moments
    * (`sum(v1) = Σ_k sum1(k)·cnt2(k)` etc.; soundness in
    * [[graft.sql.GraftMvRewriteRule]]'s two-fact scaladoc). Pins:
    * `used_view` (the fresh plan scans BOTH views and NEITHER fact
    * root) and `fell_back` (one un-maintained commit to EITHER side
    * replans the same text as the base join — each side's gates hold
    * independently). At 100 TB this turns a fact×fact reconciliation
    * join — the worst shuffle in the warehouse — into a
    * |keys|×|keys| view join. */
  def aggViewTwoFactJoin(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mv2f_")
    val (src1, view1) = (s"$root/rev", s"$root/rev_view")
    val (src2, view2) = (s"$root/vol", s"$root/vol_view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    // fact 1 REVENUE: the %3==0 slice with delete + update churn
    val f1 = ev.filter(col("event_id") % 3 === 0)
    GraftLog.overwrite(f1.filter(col("event_id") % 2 === 0), src1) // v0
    GraftLog.append(f1.filter(col("event_id") % 2 === 1), src1)   // v1
    GraftLog.delete(spark, src1, col("event_id") % 7 === 0)       // v2
    GraftLog.update(spark, src1, col("event_id") % 5 === 0,
      Seq("value" -> (col("value") + 100)))                       // v3
    maintainCols(spark, src1, view1, "event_id", Seq("user_id"), "value")
    registerForRewriteCols(src1, view1, Seq("user_id"), "value")
    // fact 2 VOLUME: the %3==1 slice renamed (eid2, uid2, qty) with
    // its own churn — distinct column names keep the oracle readable;
    // the rewrite itself disambiguates by attribute, not name
    val f2 = ev.filter(col("event_id") % 3 === 1)
      .select(col("event_id").as("eid2"), col("user_id").as("uid2"),
        (col("value") * 2).as("qty"))
    GraftLog.overwrite(f2.filter(col("eid2") % 2 === 1), src2)    // v0
    GraftLog.append(f2.filter(col("eid2") % 2 === 0), src2)       // v1
    GraftLog.delete(spark, src2, col("eid2") % 11 === 0)          // v2
    maintainCols(spark, src2, view2, "eid2", Seq("uid2"), "qty")
    registerForRewriteCols(src2, view2, Seq("uid2"), "qty")
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def q = {
        val a = spark.read.format("graft").load(src1)
        val b = spark.read.format("graft").load(src2)
        a.join(b, a("user_id") === b("uid2"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            round(sumExact(col("value")).cast("double"), 6)
              .as("total_value"),
            round(sumExact(col("qty")).cast("double"), 6)
              .as("total_qty"),
            round(avg(col("value").cast("decimal(38,10)"))
              .cast("double"), 6).as("avg_value"))
      }
      val fresh = q // analyzed NOW, while both views are current
      val usedView = scans(fresh, view1) && scans(fresh, view2) &&
        !scans(fresh, src1) && !scans(fresh, src2)
      // one un-maintained commit to ONE side → the SAME text replans
      // as the base fact×fact join (either side's gates failing kills
      // the whole rewrite — never a half-served join)
      GraftLog.append(f2.limit(20), src2)                         // v3
      val stale = q
      val fellBack = scans(stale, src1) && scans(stale, src2) &&
        !scans(stale, view1) && !scans(stale, view2)
      // `fresh` executes lazily AFTER the v3 append: only the view
      // plan (whose tables that commit never touched) keeps the
      // pre-append values
      fresh.withColumn("used_view", lit(usedView))
        .withColumn("fell_back", lit(fellBack))
    } finally {
      graft.sql.MvRegistry.unregister(src1)
      graft.sql.MvRegistry.unregister(src2)
    }
  }

  /** d37 — the MV SQL LIFECYCLE surface: `CREATE MATERIALIZED VIEW …
    * KEY … AS SELECT`, `REFRESH MATERIALIZED VIEW`, `DROP MATERIALIZED
    * VIEW` (the Databricks/StarRocks statement family, parsed by
    * [[graft.sql.GraftSqlParser]]). CREATE derives (source, group
    * keys, value column) from the defining SELECT's analyzed plan,
    * seeds the view from the source's commit history, persists the
    * definition in view table properties (a FRESH session can REFRESH
    * it — no registry state needed), and registers the planner
    * rewrite. Four decisions pinned: the defining text serves from the
    * view after CREATE; DROP un-registers (the same text replans to
    * the fact — never a dropped rollup); an un-refreshed view falls
    * back after a source commit; REFRESH folds exactly the missing
    * versions and the text serves again with CURRENT values. */
  def mvSqlLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvddl_")
    val (src, view, view2) =
      (s"$root/src", s"$root/view", s"$root/view2")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    spark.sql("DROP TABLE IF EXISTS mvddl_src")
    spark.sql(s"CREATE TABLE mvddl_src USING graft OPTIONS (path '$src')")
    val defSql =
      s"""SELECT event_type, count(1) AS n_events,
         |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
         |    AS total_value
         |FROM mvddl_src GROUP BY event_type""".stripMargin
    def scans(df: DataFrame, path: String): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == path)
        case _ => false
      }
    def q = spark.sql(defSql)
    try {
      // CREATE + DROP round-trip on a throwaway view: the dropped
      // rollup must never serve again
      spark.sql(
        s"CREATE MATERIALIZED VIEW '$view2' KEY event_id AS $defSql")
      val viaView2 = scans(q, view2)
      spark.sql(s"DROP MATERIALIZED VIEW '$view2'")
      val dropFellBack = viaView2 && scans(q, src) && !scans(q, view2)
      // the real view: CREATE folds v0+v1 and the text serves
      spark.sql(
        s"CREATE MATERIALIZED VIEW '$view' KEY event_id AS $defSql")
      val usedView = scans(q, view) && !scans(q, src)
      // one source commit the view has not folded → same text, fact
      GraftLog.append(ev.filter(col("event_id") % 13 === 0), src) // v2
      val staleFellBack = scans(q, src) && !scans(q, view)
      // REFRESH folds exactly the missing version; the text serves
      // again with CURRENT values
      val applied = spark.sql(s"REFRESH MATERIALIZED VIEW '$view'")
        .collect()(0).getInt(0)
      val served = q
      val servedAgain = scans(served, view) && !scans(served, src)
      served
        .withColumn("used_view", lit(usedView && servedAgain))
        .withColumn("drop_fell_back", lit(dropFellBack))
        .withColumn("stale_fell_back", lit(staleFellBack))
        .withColumn("versions_applied", lit(applied))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvddl_src")
      graft.sql.MvRegistry.unregisterMatching(src)
    }
  }

  /** d41 — the STAR-MV SQL lifecycle: `CREATE MATERIALIZED VIEW` whose
    * defining SELECT is the d35 star (`fact ⋈ dim GROUP BY dim.attr`,
    * the reference's silver→gold join shape,
    * `financial_dl_etl.py:88-94` generalized). CREATE derives the FACT
    * and its join-key granularity from the analyzed join tree and
    * persists a fact-only definition — dims are never materialized;
    * the rewrite rejoins the query's own dim subtree to the key-grained
    * view at plan time — so a SQL-only user reaches the join-MV serving
    * that was previously API-only. The same four lifecycle pins as d37:
    * the defining text serves from the view after CREATE; DROP
    * un-registers (same text replans to the base join); an un-refreshed
    * fact commit falls back; REFRESH folds exactly the missing versions
    * and the text serves again with CURRENT values. */
  def mvStarSqlLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvstar_")
    val (src, dimPath, view, view2) =
      (s"$root/fact", s"$root/dim", s"$root/view", s"$root/view2")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    // user → segment dim: plain parquet — dims carry no commit log,
    // the rewrite keeps their subtree verbatim
    ev.select(col("user_id").as("uid")).distinct()
      .withColumn("segment",
        concat(lit("seg_"), (col("uid") % 5).cast("string")))
      .write.mode("overwrite").parquet(dimPath)
    spark.sql("DROP TABLE IF EXISTS mvstar_fact")
    spark.sql(s"CREATE TABLE mvstar_fact USING graft OPTIONS (path '$src')")
    spark.sql("DROP TABLE IF EXISTS mvstar_dim")
    spark.sql(
      s"CREATE TABLE mvstar_dim USING parquet OPTIONS (path '$dimPath')")
    val defSql =
      s"""SELECT d.segment, count(1) AS n_events,
         |  round(CAST(sum(CAST(f.value AS DECIMAL(38,10))) AS DOUBLE), 6)
         |    AS total_value
         |FROM mvstar_fact f JOIN mvstar_dim d ON f.user_id = d.uid
         |GROUP BY d.segment""".stripMargin
    def scans(df: DataFrame, path: String): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
          fs.location.rootPaths.exists(_.toUri.getPath == path)
        case _ => false
      }
    def q = spark.sql(defSql)
    try {
      // CREATE + DROP round-trip on a throwaway view
      spark.sql(
        s"CREATE MATERIALIZED VIEW '$view2' KEY event_id AS $defSql")
      val viaView2 = scans(q, view2) && !scans(q, src)
      spark.sql(s"DROP MATERIALIZED VIEW '$view2'")
      val dropFellBack = viaView2 && scans(q, src) && !scans(q, view2)
      // the real view: CREATE folds v0+v1 and the star text serves
      spark.sql(
        s"CREATE MATERIALIZED VIEW '$view' KEY event_id AS $defSql")
      val usedView = scans(q, view) && !scans(q, src)
      // one un-folded fact commit → same text, base join again
      GraftLog.append(ev.filter(col("event_id") % 13 === 0), src) // v2
      val staleFellBack = scans(q, src) && !scans(q, view)
      val applied = spark.sql(s"REFRESH MATERIALIZED VIEW '$view'")
        .collect()(0).getInt(0)
      val served = q
      val servedAgain = scans(served, view) && !scans(served, src)
      served
        .withColumn("used_view", lit(usedView && servedAgain))
        .withColumn("drop_fell_back", lit(dropFellBack))
        .withColumn("stale_fell_back", lit(staleFellBack))
        .withColumn("versions_applied", lit(applied))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvstar_fact")
      spark.sql("DROP TABLE IF EXISTS mvstar_dim")
      graft.sql.MvRegistry.unregisterMatching(src)
    }
  }

  /** d38 — the UNION-MV: one maintained rollup serves the aggregate
    * over the UNION ALL of its fact sources — the medallion fan-in
    * every multi-channel pipeline has (the reference's per-symbol CSV
    * ingests, `financial_dl_etl.py:102-108`, are exactly N sources
    * feeding one gold rollup). Both sources run independent commit
    * lifecycles and fold under per-source ledger app ids; the rewrite
    * serves the union aggregate from the ONE view only while EVERY
    * leg is fresh. Pins: `used_view` (view scanned, neither fact
    * root), `fell_back` (one un-maintained commit on ONE source and
    * the same text replans to the base union — a half-fresh view must
    * never serve). At 100 TB this collapses every multi-source
    * dashboard scan into one groups-sized read, with per-source
    * refresh costs bounded by that source's changes. */
  def aggViewUnionRewrite(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvun_")
    val (srcA, srcB, view) =
      (s"$root/mobile", s"$root/web", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val (evA, evB) =
      (ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1))
    // independent lifecycles per channel
    GraftLog.overwrite(evA.filter(col("event_id") % 3 =!= 2), srcA)
    GraftLog.append(evA.filter(col("event_id") % 3 === 2), srcA)
    GraftLog.delete(spark, srcA, col("event_id") % 7 === 0)
    GraftLog.overwrite(evB.filter(col("event_id") % 5 =!= 3), srcB)
    GraftLog.append(evB.filter(col("event_id") % 5 === 3), srcB)
    maintainUnion(spark, Seq(srcA, srcB), view, "event_id",
      Seq("event_type"), "value")
    registerForRewriteUnion(Seq(srcA, srcB), view,
      Seq("event_type"), "value")
    try {
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.collectLeaves().exists {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
            fs.location.rootPaths.exists(_.toUri.getPath == path)
          case _ => false
        }
      def q = spark.read.format("graft").load(srcA)
        .union(spark.read.format("graft").load(srcB))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sumExact(col("value")).cast("double"), 6)
            .as("total_value"))
      val fresh = q // analyzed NOW, while both legs are fresh
      val usedView = scans(fresh, view) && !scans(fresh, srcA) &&
        !scans(fresh, srcB)
      // ONE un-maintained commit on ONE source: the whole union must
      // fall back (a half-fresh view is a wrong answer)
      GraftLog.append(evB.filter(col("event_id") % 5 === 3)
        .limit(50), srcB)
      val stale = q
      val fellBack = scans(stale, srcA) && scans(stale, srcB) &&
        !scans(stale, view)
      fresh.withColumn("used_view", lit(usedView))
        .withColumn("fell_back", lit(fellBack))
    } finally {
      graft.sql.MvRegistry.unregister(srcA)
      graft.sql.MvRegistry.unregister(srcB)
    }
  }

  /** d39 — DESCRIBE MATERIALIZED VIEW through the lifecycle: the
    * freshness/lag introspection an operator consults before REFRESH —
    * created (fresh, 0 behind) → one source commit (stale, 1 behind) →
    * refreshed (fresh again). Metadata-only: properties + two
    * small-JSON ledger reads, no data scan at any stage. */
  def mvDescribeLifecycle(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_mvdesc_")
    val (src, view) = (s"$root/src", s"$root/view")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
    GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)    // v1
    spark.sql("DROP TABLE IF EXISTS mvdesc_src")
    spark.sql(s"CREATE TABLE mvdesc_src USING graft OPTIONS (path '$src')")
    try {
      spark.sql(s"""CREATE MATERIALIZED VIEW '$view' KEY event_id AS
        |SELECT event_type, count(1) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
        |    AS total_value
        |FROM mvdesc_src GROUP BY event_type""".stripMargin)
      def desc(stage: String) =
        spark.sql(s"DESCRIBE MATERIALIZED VIEW '$view'")
          .withColumn("stage", lit(stage))
      val created = desc("created")
      GraftLog.append(ev.filter(col("event_id") % 13 === 0), src)  // v2
      val stale = desc("stale")
      spark.sql(s"REFRESH MATERIALIZED VIEW '$view'").collect()
      val refreshed = desc("refreshed")
      created.unionByName(stale).unionByName(refreshed)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mvdesc_src")
      graft.sql.MvRegistry.unregisterMatching(src)
    }
  }

  private val stagedUnionStream = new scala.collection.concurrent
    .TrieMap[String, (String, Boolean, Boolean, Boolean, Boolean)]

  /** i31 — STREAMING union-MV maintenance: d38's multi-channel fan-in
    * driven by streams. Two channel tables each feed a CDF readStream
    * whose micro-batches fold into the ONE view under that channel's
    * union ledger app id — so the d38 rewrite serves the union
    * aggregate from a STREAM-maintained view between micro-batches,
    * and its per-source freshness gate reads the same ledgers the
    * streams stamp. Pins: `served_mid` (the rewrite fires on the
    * stream-maintained view), `fell_back` (three source commits land
    * before the next drains — the same text replans to the base
    * union), `served_after` (kill/resume drains fold them and the
    * text serves again), `replay_noop` (a full re-drain appends
    * nothing: version-keyed ledger, the i27 lesson). At 100 TB this
    * is the multi-channel dashboard: N ingest streams, one
    * groups-sized view, refresh latency one micro-batch per
    * channel. */
  def unionViewStream(spark: SparkSession, sfDir: String): DataFrame = {
    val (view, servedMid, fellBack, servedAfter, replayNoop) =
      stagedUnionStream.getOrElseUpdate(sfDir, {
        val root = graft.sources.Staging.tempDir("graft_aggvu_")
        val (srcA, srcB, vw) =
          (s"$root/mobile", s"$root/web", s"$root/view")
        val (ckA, ckB) = (s"$root/ckA", s"$root/ckB")
        val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
          .select(col("event_id"), col("event_type"), col("value"))
        val (evA, evB) =
          (ev.filter(col("event_id") % 2 === 0),
            ev.filter(col("event_id") % 2 === 1))
        GraftLog.overwrite(evA.filter(col("event_id") % 3 =!= 2), srcA)
        GraftLog.overwrite(evB.filter(col("event_id") % 5 =!= 3), srcB)
        def drain(src: String, ckpt: String): Unit = {
          val appId = graft.sql.MvRegistry.unionAppId(AppId, src)
          val q = spark.readStream.format("graft")
            .option("readChangeFeed", "true")
            .option("cdfKeys", "event_id")
            .option("includePreimages", "true")
            .load(src)
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              foldCdfMicroBatch(b, vw, appId)
            }
            .option("checkpointLocation", ckpt)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        drain(srcA, ckA); drain(srcB, ckB)        // v0 snapshot folds
        registerForRewriteUnion(Seq(srcA, srcB), vw,
          Seq("event_type"), "value")
        try {
          def scans(df: DataFrame, path: String): Boolean =
            df.queryExecution.optimizedPlan.collectLeaves().exists {
              case org.apache.spark.sql.execution.datasources
                  .LogicalRelation(fs: org.apache.spark.sql.execution
                  .datasources.HadoopFsRelation, _, _, _, _) =>
                fs.location.rootPaths.exists(_.toUri.getPath == path)
              case _ => false
            }
          def q = spark.read.format("graft").load(srcA)
            .union(spark.read.format("graft").load(srcB))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_events"),
              round(sumExact(col("value")).cast("double"), 6)
                .as("total_value"))
          val mid = q
          val servedMid = scans(mid, vw) && !scans(mid, srcA)
          // three source commits the streams have not yet delivered
          GraftLog.append(evA.filter(col("event_id") % 3 === 2), srcA)
          GraftLog.delete(spark, srcA, col("event_id") % 7 === 0)
          GraftLog.append(evB.filter(col("event_id") % 5 === 3), srcB)
          val stale = q
          val fellBack = scans(stale, srcA) && !scans(stale, vw)
          // kill/resume: FRESH stream instances on the same
          // checkpoints deliver exactly the missed versions
          drain(srcA, ckA); drain(srcB, ckB)
          val before = GraftLog.latestVersion(spark, vw)
          drain(srcA, ckA); drain(srcB, ckB)      // pure replay
          val replayNoop =
            GraftLog.latestVersion(spark, vw) == before
          val after = q
          val servedAfter = scans(after, vw) && !scans(after, srcA)
          (vw, servedMid, fellBack, servedAfter, replayNoop)
        } finally {
          graft.sql.MvRegistry.unregister(srcA)
          graft.sql.MvRegistry.unregister(srcB)
        }
      })
    read(spark, view, "event_type")
      .withColumn("served_mid", lit(servedMid))
      .withColumn("fell_back", lit(fellBack))
      .withColumn("served_after", lit(servedAfter))
      .withColumn("replay_noop", lit(replayNoop))
  }

  private val stagedJoinStream = new scala.collection.concurrent
    .TrieMap[String, (String, String, Boolean, Boolean, Boolean,
      Boolean, Boolean)]

  /** i32 — STREAMING join-MV maintenance: the d35 star served from a
    * view that STREAMS its maintenance. Fact commits arrive on a CDF
    * readStream whose micro-batches fold into the join-key-grained
    * view exactly-once (one version-keyed ledger append per delivered
    * commit — the i29/i31 discipline), dims stay static parquet, and
    * between micro-batches the d35 rewrite serves `fact ⋈ dim GROUP BY
    * dim.attr` from view ⋈ dim. Pins: `served_mid` (the star serves
    * from the stream-maintained view), `fell_back` (three fact commits
    * land before the next drain — the same text replans to the base
    * star), `served_after` (a FRESH stream instance on the same
    * checkpoint folds exactly the missed versions and the text serves
    * again), `replay_noop` (a further re-drain appends nothing),
    * `served_equals_base` (the served star's values equal the
    * unregistered base recompute at the same state). At 100 TB this is
    * the continuously-fresh dashboard star: refresh latency one
    * micro-batch, the fact table never rescanned by the dashboard. */
  def joinViewStream(spark: SparkSession, sfDir: String): DataFrame = {
    val (src, dimPath, servedMid, fellBack, servedAfter, replayNoop,
        servedEq) =
      stagedJoinStream.getOrElseUpdate(sfDir, {
        val root = graft.sources.Staging.tempDir("graft_aggvj_")
        val (srcP, vw, ck, dimP) =
          (s"$root/fact", s"$root/view", s"$root/ck", s"$root/dim")
        val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("value"))
        GraftLog.overwrite(ev.filter(col("event_id") % 4 =!= 3), srcP)
        ev.select(col("user_id").as("uid")).distinct()
          .withColumn("segment",
            concat(lit("seg_"), pmod(col("uid"), lit(5L))))
          .write.mode("overwrite").parquet(dimP)
        val dim = spark.read.parquet(dimP)
        def drain(): Unit = {
          val q = spark.readStream.format("graft")
            .option("readChangeFeed", "true")
            .option("cdfKeys", "event_id")
            .option("includePreimages", "true")
            .load(srcP)
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              foldCdfMicroBatch(b, vw, s"$AppId-jstream",
                Seq("user_id"), "value")
            }
            .option("checkpointLocation", ck)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        drain() // the v0 snapshot folds
        // register under the STREAM's ledger app id — the rewrite's
        // freshness gate must read the same ledger the stream stamps
        graft.sql.MvRegistry.register(srcP, graft.sql.MvRegistry
          .MvDef(vw, Seq("user_id"), "value", s"$AppId-jstream"))
        try {
          def scans(df: DataFrame, path: String): Boolean =
            df.queryExecution.optimizedPlan.collectLeaves().exists {
              case org.apache.spark.sql.execution.datasources
                  .LogicalRelation(fs: org.apache.spark.sql.execution
                  .datasources.HadoopFsRelation, _, _, _, _) =>
                fs.location.rootPaths.exists(_.toUri.getPath == path)
              case _ => false
            }
          def q = {
            val f = spark.read.format("graft").load(srcP)
            f.join(dim, f("user_id") === dim("uid"))
              .groupBy(col("segment"))
              .agg(count(lit(1)).as("n_events"),
                round(sumExact(col("value")).cast("double"), 6)
                  .as("total_value"))
          }
          def vals(df: DataFrame) = df.collect()
            .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
            .toMap
          val mid = q
          val servedMid = scans(mid, vw) && !scans(mid, srcP)
          // three fact commits the stream has not yet delivered
          GraftLog.append(ev.filter(col("event_id") % 4 === 3), srcP)
          GraftLog.delete(spark, srcP, col("event_id") % 9 === 0)
          GraftLog.update(spark, srcP, col("event_id") % 5 === 0,
            Seq("value" -> (col("value") + 100)))
          val stale = q
          val fellBack = scans(stale, srcP) && !scans(stale, vw)
          // kill/resume: a FRESH stream instance on the same
          // checkpoint delivers exactly the missed versions
          drain()
          val before = GraftLog.latestVersion(spark, vw)
          drain() // pure replay
          val replayNoop = GraftLog.latestVersion(spark, vw) == before
          val after = q
          val servedAfter = scans(after, vw) && !scans(after, srcP)
          val servedVals = vals(after)
          graft.sql.MvRegistry.unregister(srcP)
          val baseVals = vals(q)
          (srcP, dimP, servedMid, fellBack, servedAfter, replayNoop,
            servedVals == baseVals)
        } finally graft.sql.MvRegistry.unregister(srcP)
      })
    // post-staging the registration is gone: this is the plain base
    // star at the (stable) final fact state on every call
    val f = spark.read.format("graft").load(src)
    val dim = spark.read.parquet(dimPath)
    f.join(dim, f("user_id") === dim("uid"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6)
          .as("total_value"))
      .withColumn("served_mid", lit(servedMid))
      .withColumn("fell_back", lit(fellBack))
      .withColumn("served_after", lit(servedAfter))
      .withColumn("replay_noop", lit(replayNoop))
      .withColumn("served_equals_base", lit(servedEq))
  }

  private val stagedTwoFactStream = new scala.collection.concurrent
    .TrieMap[String, (String, String, Boolean, Boolean, Boolean,
      Boolean, Boolean)]

  /** i33 — STREAMING two-fact maintenance: d40's `revenue ⋈ volume`
    * reconciliation star with BOTH views driven by their own CDF
    * readStream (the i31 two-channel pattern over the i32 fold — one
    * stream, checkpoint, and ledger app id per fact), and the d40
    * cross-weighted rewrite serving BETWEEN micro-batches. Pins mirror
    * i32: `served_mid` (the fresh plan scans both views, neither
    * fact), `fell_back` (un-delivered commits on BOTH facts — delete+
    * update churn on one, delete on the other — replan the same text
    * as the base join; either side's staleness kills the whole
    * rewrite), `served_after` (fresh stream instances on the same
    * checkpoints fold exactly the missed versions), `replay_noop` (a
    * further re-drain of both channels appends nothing — the ledgers,
    * not the checkpoints, are the exactly-once authority),
    * `served_equals_base` (the served values equal the unregistered
    * recompute at the same state). At 100 TB: the fact×fact
    * reconciliation dashboard stays one |keys|×|keys| view join with
    * refresh latency of one micro-batch per channel. */
  def twoFactViewStream(spark: SparkSession, sfDir: String): DataFrame = {
    val (src1, src2, servedMid, fellBack, servedAfter, replayNoop,
        servedEq) =
      stagedTwoFactStream.getOrElseUpdate(sfDir, {
        val root = graft.sources.Staging.tempDir("graft_aggv2fs_")
        val (s1, v1, c1) = (s"$root/rev", s"$root/rev_view", s"$root/ck1")
        val (s2, v2, c2) = (s"$root/vol", s"$root/vol_view", s"$root/ck2")
        val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("value"))
        GraftLog.overwrite(ev.filter(col("event_id") % 3 === 0), s1)
        GraftLog.overwrite(ev.filter(col("event_id") % 3 === 1)
          .select(col("event_id").as("eid2"), col("user_id").as("uid2"),
            (col("value") * 2).as("qty")), s2)
        def drain(src: String, view: String, ck: String, key: String,
            groupCol: String, valueCol: String, appId: String): Unit = {
          val q = spark.readStream.format("graft")
            .option("readChangeFeed", "true")
            .option("cdfKeys", key)
            .option("includePreimages", "true")
            .load(src)
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              foldCdfMicroBatch(b, view, appId, Seq(groupCol), valueCol)
            }
            .option("checkpointLocation", ck)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        def drainBoth(): Unit = {
          drain(s1, v1, c1, "event_id", "user_id", "value",
            s"$AppId-2fs1")
          drain(s2, v2, c2, "eid2", "uid2", "qty", s"$AppId-2fs2")
        }
        drainBoth() // both v0 snapshots fold
        // register each fact under ITS stream's ledger app id — the
        // two-fact rewrite gates each side's freshness independently
        graft.sql.MvRegistry.register(s1, graft.sql.MvRegistry
          .MvDef(v1, Seq("user_id"), "value", s"$AppId-2fs1"))
        graft.sql.MvRegistry.register(s2, graft.sql.MvRegistry
          .MvDef(v2, Seq("uid2"), "qty", s"$AppId-2fs2"))
        try {
          def scans(df: DataFrame, path: String): Boolean =
            df.queryExecution.optimizedPlan.collectLeaves().exists {
              case org.apache.spark.sql.execution.datasources
                  .LogicalRelation(fs: org.apache.spark.sql.execution
                  .datasources.HadoopFsRelation, _, _, _, _) =>
                fs.location.rootPaths.exists(_.toUri.getPath == path)
              case _ => false
            }
          def q = {
            val a = spark.read.format("graft").load(s1)
            val b = spark.read.format("graft").load(s2)
            a.join(b, a("user_id") === b("uid2"))
              .groupBy(col("user_id"))
              .agg(count(lit(1)).as("n_pairs"),
                round(sumExact(col("value")).cast("double"), 6)
                  .as("total_value"),
                round(sumExact(col("qty")).cast("double"), 6)
                  .as("total_qty"),
                round(avg(col("value").cast("decimal(38,10)"))
                  .cast("double"), 6).as("avg_value"))
          }
          def vals(df: DataFrame) = df.collect()
            .map(r => r.getLong(0) ->
              (r.getLong(1), r.getDouble(2), r.getDouble(3),
                r.getDouble(4)))
            .toMap
          val mid = q
          val servedMid = scans(mid, v1) && scans(mid, v2) &&
            !scans(mid, s1) && !scans(mid, s2)
          // un-delivered churn on BOTH channels
          GraftLog.delete(spark, s1, col("event_id") % 7 === 0)
          GraftLog.update(spark, s1, col("event_id") % 5 === 0,
            Seq("value" -> (col("value") + 100)))
          GraftLog.delete(spark, s2, col("eid2") % 11 === 0)
          val stale = q
          val fellBack = scans(stale, s1) && scans(stale, s2) &&
            !scans(stale, v1) && !scans(stale, v2)
          // fresh stream instances on the same checkpoints deliver
          // exactly the missed versions of each channel
          drainBoth()
          val before =
            (GraftLog.latestVersion(spark, v1),
              GraftLog.latestVersion(spark, v2))
          drainBoth() // pure replay of both channels
          val replayNoop =
            (GraftLog.latestVersion(spark, v1),
              GraftLog.latestVersion(spark, v2)) == before
          val after = q
          val servedAfter = scans(after, v1) && scans(after, v2) &&
            !scans(after, s1) && !scans(after, s2)
          val servedVals = vals(after)
          graft.sql.MvRegistry.unregister(s1)
          graft.sql.MvRegistry.unregister(s2)
          val baseVals = vals(q)
          (s1, s2, servedMid, fellBack, servedAfter, replayNoop,
            servedVals == baseVals)
        } finally {
          graft.sql.MvRegistry.unregister(s1)
          graft.sql.MvRegistry.unregister(s2)
        }
      })
    // post-staging the registrations are gone: the plain base join at
    // the (stable) final fact states on every call
    val a = spark.read.format("graft").load(src1)
    val b = spark.read.format("graft").load(src2)
    a.join(b, a("user_id") === b("uid2"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sumExact(col("value")).cast("double"), 6)
          .as("total_value"),
        round(sumExact(col("qty")).cast("double"), 6)
          .as("total_qty"),
        round(avg(col("value").cast("decimal(38,10)"))
          .cast("double"), 6).as("avg_value"))
      .withColumn("served_mid", lit(servedMid))
      .withColumn("fell_back", lit(fellBack))
      .withColumn("served_after", lit(servedAfter))
      .withColumn("replay_noop", lit(replayNoop))
      .withColumn("served_equals_base", lit(servedEq))
  }

  private val stagedStream =
    new scala.collection.concurrent.TrieMap[String, (String, Boolean)]

  /** One delivered CDF micro-batch folded into the view's delta log:
    * one version-keyed ledger append per `_commit_version` present in
    * the batch, under `appId` — shared by the single-source stream
    * (i29) and the multi-channel union form (i31). The ledger, not
    * the stream checkpoint, is the exactly-once authority: replayed
    * versions are rejected atomically with the data commit. */
  private def foldCdfMicroBatch(b: DataFrame, view: String,
      appId: String, groupCols: Seq[String] = Seq("event_type"),
      valueCol: String = "value"): Unit = {
    val spark = b.sparkSession
    val vs = b.select(col("_commit_version")).distinct()
      .collect().map(_.getLong(0)).sorted
    vs.foreach { v =>
      val bv = b.filter(col("_commit_version") === v)
      val deltas = bv.select(groupCols.map(col) ++ Seq(
          when(col("_change_type")
              .isin("insert", "update_postimage"), lit(1L))
            .otherwise(lit(-1L)).as("__sign"),
          col(valueCol).as("__v"),
          col(valueCol).cast("double").as("__vd")): _*)
        .withColumn("__sq",
          (col("__sign") * col("__vd") * col("__vd"))
            .cast("decimal(38,10)"))
        .groupBy(groupCols.map(col): _*)
        .agg(sum(col("__sign")).as("d_count"),
          sumExact(col("__sign") * col("__v")).as("d_value"),
          sum(col("__sq")).as("d_sumsq"),
          sum(col("__sign") * when(col("__v").isNull, 0L)
            .otherwise(1L)).as("d_vcount"),
          max(col("__vd").isNotNull && col("__sq").isNull)
            .as("__sq_of"))
        .persist()
      val poisoned = deltas.filter(col("__sq_of") === true)
        .limit(1).count() > 0
      if (!deltas.isEmpty) {
        GraftLog.txnAppend(deltas.drop("__sq_of"), view, appId, v); ()
      }
      if (poisoned)
        GraftLog.setProperties(spark, view,
          Map(SumsqOverflowProp -> "true")): Unit
      deltas.unpersist(); ()
    }
  }

  /** i29 — the STREAMING form of [[maintain]]: the CDF readStream
    * (`includePreimages` — the fold needs the old value to subtract)
    * DELIVERS the changes and foreachBatch folds them, one
    * ledger-stamped delta append per source version exactly like the
    * batch path — so the view's exactly-once does NOT depend on the
    * stream's checkpoint: a kill/restart (pinned between the
    * append+delete wave and the update wave) re-delivers absorbed
    * versions as ledger no-ops, and even checkpoint LOSS would replay
    * harmlessly (version-keyed batch ids, the i27 lesson: engine
    * checkpoints are transport state; the ledger is table state). The
    * continuously-maintained dashboard rollup: refresh latency = one
    * micro-batch, refresh cost = that batch's file-bounded diffs. */
  def incrementalAggViewStream(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val (view, replayNoop) = stagedStream.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_aggvs_")
      val (src, vw, ckpt) = (s"$root/src", s"$root/view", s"$root/ckpt")
      val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
      GraftLog.overwrite(ev.filter(col("event_id") % 3 =!= 2), src) // v0
      def drain(): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("cdfKeys", "event_id")
          .option("includePreimages", "true")
          .load(src)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            foldCdfMicroBatch(b, vw, s"$AppId-stream")
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()                                           // v0 snapshot fold
      GraftLog.append(ev.filter(col("event_id") % 3 === 2), src)  // v1
      GraftLog.delete(spark, src, col("event_id") % 7 === 0)      // v2
      drain()                           // kill/restart: resumes past v0
      GraftLog.update(spark, src, col("event_id") % 5 === 0,
        Seq("value" -> (col("value") + 100)))                     // v3
      drain()
      val before = GraftLog.latestVersion(spark, vw)
      drain()                           // pure replay: ledger no-ops
      (vw, GraftLog.latestVersion(spark, vw) == before)
    })
    val maintained = GraftLog.history(spark, view)
      .filter(col("operation") === "streamingAppend").count().toInt
    read(spark, view, "event_type")
      .withColumn("maintained_versions", lit(maintained))
      .withColumn("replay_noop", lit(replayNoop))
  }
}
