package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join utilities for the shapes that matter at 100 TB (the reference never
  * tuned a join — SURVEY.md §2.5 notes no hints anywhere — so these are
  * engine-side affordances, not parity).
  *
  *   - [[bucketedTables]] (in Sinks) + a co-located join: two tables
  *     bucketed by the same key into the same bucket count join with NO
  *     exchange on either side — the pre-shuffled layout big fact-fact
  *     joins need.
  *   - [[saltedJoin]]: skew mitigation when one key dominates. AQE's skew
  *     handling splits oversized *partitions* at runtime; salting fixes the
  *     harder case where a single key exceeds one task's capacity, by
  *     spreading each hot key across `saltFactor` buckets and replicating
  *     the small side to every bucket.
  */
object Joins {

  /** Inner equi-join of a skewed large side against a small side with key
    * salting: large rows get a uniform salt in [0, saltFactor); the small
    * side is replicated once per salt value; the join key becomes
    * (key, salt) so one hot key fans out over saltFactor tasks. Result is
    * row-identical to the unsalted join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** j7 — [[saltedJoin]] registered against a DELIBERATELY skewed key:
    * `l_returnflag` takes a handful of values across the whole lineitem
    * table, so a plain shuffle join drops ~n/3 rows on three tasks — the
    * classic hot-key stall at scale (one straggler task holds the stage).
    * Salting fans each hot key over `saltFactor` buckets; the dimension
    * side (derived from the data, so the oracle needs no literals)
    * replicates once per salt. Result is row-identical to the plain
    * join, which is exactly what the oracle runs. */
  private val stagedDpp =
    new scala.collection.concurrent.TrieMap[String, String]

  /** j12 — DYNAMIC partition pruning through the graft FileIndex: the
    * fact (lineitem, hive-partitioned by return flag as a graft table)
    * joins a dimension whose SELECTIVE filter lives on the dim side
    * only — the fact scan carries no static partition predicate, yet
    * Spark's DPP inserts a runtime subquery filter (fed by the reused
    * broadcast of the dim) into the scan's partitionFilters, and the
    * [[graft.sources.GraftFileIndex]] prunes whole `l_returnflag=…`
    * dirs at EXECUTION time. At 100 TB this is the fact-dim idiom:
    * "WHERE dim.attr = x" touches only the partitions the dim rows
    * name, without the query ever filtering the fact. The spec pins
    * the dynamicpruning expression in the plan and the pruned file
    * count; the oracle is the plain filtered rollup (DPP must never
    * change the answer). */
  private[graft] def dppFact(spark: SparkSession, sfDir: String): String =
    stagedDpp.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_dpp_") + "/lineitem"
      graft.sources.GraftLog.overwritePartitioned(
        graft.sources.Sources.testTable(spark, sfDir, "lineitem")
          .select(col("l_quantity"), col("l_orderkey"),
            col("l_returnflag")),
        d, Seq("l_returnflag"))
      d
    })

  def dppFlagRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val factDir = dppFact(spark, sfDir)
    val fact = spark.read.format("graft").load(factDir)
    val dim = graft.sources.Sources.testTable(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag")).distinct()
      .withColumn("flag_name", concat(lit("FLAG_"), col("flag")))
      .filter(col("flag_name") === "FLAG_R") // dim-side-only filter
    fact.join(broadcast(dim), fact("l_returnflag") === dim("flag"))
      .groupBy(col("flag"), col("flag_name"))
      .agg(count(lit(1)).as("n_items"),
        round(graft.functions.Deterministic.sumExact(col("l_quantity"))
          .cast("double"), 6).as("total_qty"))
  }

  private val stagedStar =
    new scala.collection.concurrent.TrieMap[String, String]

  /** j13 — the 100 TB star-query composition: THREE pruning/placement
    * mechanisms in ONE plan, each carrying a different leg of a
    * customer × orders × lineitem star.
    *
    *   - **DPP** (the j12 machinery): the fact is the hive-partitioned
    *     lineitem graft table; the flag dimension's selective filter
    *     reaches the fact scan as a `dynamicpruningexpression` runtime
    *     subquery, and whole `l_returnflag=…` dirs never open.
    *   - **Bloom skipping** (the t18 machinery): orders is a graft
    *     table clustered by `o_orderpriority` and written
    *     [[graft.sources.GraftLog.overwriteIndexed]] — the STATIC
    *     point predicate consults the per-file Bloom bitmaps in the
    *     commit log, so only the files that actually contain
    *     '1-URGENT' are scanned (string column: min/max stats can't
    *     help, the Bloom is the only skip).
    *   - **Broadcast placement + parquet pushdown**: the selectively
    *     filtered customer dim rides to the join as a broadcast (CBO
    *     column stats provably cause this flip on a catalog twin —
    *     asserted in AnalyticsSpec with `spark.sql.cbo.enabled`), and
    *     its `c_mktsegment = 'BUILDING'` predicate reaches the parquet
    *     scan as a PushedFilter.
    *
    * The oracle is the plain three-way filtered join — none of the
    * three mechanisms may change the answer, only the bytes read and
    * rows moved. AnalyticsSpec pins all three in the SAME executed
    * plan. */
  private[graft] def starOrders(spark: SparkSession, sfDir: String)
      : String =
    stagedStar.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_star_") + "/orders"
      graft.sources.GraftLog.overwriteIndexed(
        graft.sources.Sources.testTable(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority"))
          .repartition(8, col("o_orderpriority")),
        d, Seq("o_orderpriority"))
      d
    })

  def starComposed(spark: SparkSession, sfDir: String): DataFrame = {
    val factDir = dppFact(spark, sfDir)
    val ordsDir = starOrders(spark, sfDir)
    val fact = spark.read.format("graft").load(factDir)
    val flags = graft.sources.Sources.testTable(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag")).distinct()
      .withColumn("flag_name", concat(lit("FLAG_"), col("flag")))
      .filter(col("flag_name") === "FLAG_R") // dim-side-only filter → DPP
    val ords = graft.sources.GraftFileIndex.read(spark, ordsDir)
      .filter(col("o_orderpriority") === "1-URGENT") // Bloom file skip
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .filter(col("c_mktsegment") === "BUILDING") // parquet PushedFilter
    fact.join(broadcast(flags), fact("l_returnflag") === flags("flag"))
      .join(ords, fact("l_orderkey") === ords("o_orderkey"))
      .join(broadcast(cust), ords("o_custkey") === cust("c_custkey"))
      .groupBy(col("flag"), col("flag_name"),
        col("o_orderpriority").as("priority"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_items"),
        round(graft.functions.Deterministic.sumExact(col("l_quantity"))
          .cast("double"), 6).as("total_qty"))
  }

  def saltedFlagRollup(spark: SparkSession, sfDir: String,
      saltFactor: Int = 8): DataFrame = {
    val large = graft.sources.Sources.testTable(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_quantity"))
    val dim = large.select(col("flag")).distinct()
      .withColumn("flag_name", concat(lit("FLAG_"), col("flag")))
    saltedJoin(large, dim, "flag", saltFactor)
      .groupBy(col("flag"), col("flag_name"))
      .agg(count(lit(1)).as("n_items"),
        round(graft.functions.Deterministic.sumExact(col("l_quantity"))
          .cast("double"), 6).as("total_qty"))
  }

  /** Broadcast-hint helper: the incremental-batch idiom (see
    * [[Incremental]]) as a reusable form. */
  def broadcastJoin(large: DataFrame, small: DataFrame, key: String,
      joinType: String = "inner"): DataFrame =
    large.join(broadcast(small), Seq(key), joinType)

  /** UNKEYED range join via RANGE BINNING — the shape [[sessionAttach]]'s
    * doc promises for the no-shared-key case, and the same optimization
    * engines ship natively (Databricks' range-join bin optimization,
    * Flink's interval join): a raw interval-containment join with no
    * equi-key plans as a broadcast nested loop — O(|points| ×
    * |intervals|), dead at scale. Binning makes it an EQUI-join: every
    * interval is exploded to the fixed-width bins it overlaps, every
    * point hashes to its one bin, the join key is the bin id, and the
    * true range predicate runs as a residual filter on the bin-local
    * pairs. Cost: one hash shuffle of each side + per-bin products —
    * bounded by bin occupancy, never table sizes. With `binWidth` ≥ the
    * longest interval each interval lands in ≤ 2 bins, so the
    * replication factor is ≤ 2; a point matches an interval in exactly
    * one bin (its own), so no post-join dedup is needed.
    *
    * Contract: emits (point, interval) pairs with `lo <= pt <= hi`,
    * inclusive on both ends (pre-adjust bounds for open ends). Bin ids
    * use integer division, so bounds must be non-negative longs (epoch
    * micros qualify). */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pts = points.withColumn("__bin",
      expr(s"`$ptCol` div $binWidth"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$loCol` div $binWidth"),
        expr(s"`$hiCol` div $binWidth"))))
    pts.join(iv, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** j11 — [[binnedRangeJoin]] registered as error-burst correlation:
    * every event (ANY user — no shared key exists) landing within five
    * minutes after an error event attaches to it; per error the query
    * counts followers, distinct affected users, and cascading errors.
    * The interval length equals the bin width, so interval replication
    * is ≤ 2 and the plan is two hash exchanges on the bin id — compare
    * the nested-loop product a naive `pts.us BETWEEN e.us AND e.us+300s`
    * join plans. The oracle runs exactly that naive theta join, pinning
    * that binning loses and invents nothing. */
  def errorBurst(spark: SparkSession, sfDir: String): DataFrame = {
    val W = 300000000L // 5 minutes in epoch micros = the bin width
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
    val points = ev.select(col("event_id"), col("user_id"),
      col("event_type"), col("us"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (col("us") + 1L).as("lo"), // strictly AFTER the error
        (col("us") + W).as("hi"))
    binnedRangeJoin(points, intervals, "us", "lo", "hi", W)
      .groupBy(col("error_id"))
      .agg(count(lit(1)).as("n_follow"),
        countDistinct(col("user_id")).as("n_users"),
        count(when(col("event_type") === "error", lit(1)))
          .as("n_cascade"))
  }

  /** Range (interval-containment) join, keyed: attach each event to the
    * session whose [start, end] interval contains it — the standard
    * enrichment that writes session ids back onto raw events. The
    * equi-key (user_id) carries the shuffle; the range predicate then
    * filters within each key group, so per-key cost is |events_u| ×
    * |sessions_u| — bounded by per-user activity, never the table sizes.
    * (An unkeyed range join would instead bin the range into buckets and
    * equi-join on the bucket id — same discipline, synthetic key; see
    * [[binnedRangeJoin]].)
    * Every event lands in exactly one session by construction, so the
    * output has one row per event — which the oracle checks for free. */
  def sessionAttach(spark: SparkSession, sfDir: String): DataFrame = {
    val sessions = graft.streaming.Streaming.sessionizeBatch(spark, sfDir)
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"))
    val events = graft.streaming.Streaming.eventsBatch(spark, sfDir)
      .select(col("user_id").as("e_user"), col("event_id"), col("ts"))
    events.join(sessions,
        col("e_user") === col("user_id") &&
        col("ts") >= col("session_start") &&
        col("ts") <= col("session_end"))
      .select(col("user_id"), col("event_id"), col("session_id"))
  }

  // ---- j14: storage-partitioned join over the V2 graft catalog ----

  private val stagedSpj =
    new scala.collection.concurrent.TrieMap[String, (String, String)]

  /** Stage orders and customer as graft tables hidden-bucketed on the
    * SAME key domain (custkey) into the SAME bucket count — the layout a
    * lake would maintain for its recurring fact-fact join. Memoized per
    * corpus (Bench reps re-join, they don't re-write). */
  private[graft] def spjTables(spark: SparkSession,
      sfDir: String): (String, String) =
    stagedSpj.getOrElseUpdate(sfDir, {
      val base = graft.sources.Staging.tempDir("graft_spj_")
      val ordersDir = base + "/orders"
      val custDir = base + "/customer"
      graft.sources.GraftLog.overwriteBucketTransform(
        graft.sources.Sources.testTable(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderpriority")),
        ordersDir, "o_custkey", 16)
      graft.sources.GraftLog.overwriteBucketTransform(
        graft.sources.Sources.testTable(spark, sfDir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
        custDir, "c_custkey", 16)
      (ordersDir, custDir)
    })

  /** Register the V2 [[graft.sources.GraftCatalog]] and flip on Spark's
    * storage-partitioned-join machinery. All three confs are
    * graft-scoped no-ops for every other query: the catalog resolves
    * only when named, and the v2.bucketing flags only affect V2 scans
    * that REPORT a partitioning — this catalog's are the only ones. */
  private[graft] def enableSpj(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.catalog.graft_spj",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
  }

  /** j14 — the 100 TB fact-fact join shape: orders ⋈ customer on
    * custkey where BOTH sides are graft tables hidden-bucketed by
    * `bucket(16, custkey)` and read through the DSv2
    * [[graft.sources.GraftCatalog]]. Each scan reports
    * `KeyGroupedPartitioning(bucket(16, key), …)` over per-bucket input
    * partitions, so EnsureRequirements proves co-partitioning and the
    * sort-merge join plans with ZERO exchanges below it (asserted in
    * GraftCatalogSpec; the `merge` hint keeps AQE from flipping the
    * small sf side to broadcast, which would hide the point). Contrast
    * j1/c1: the same join through V1 relations shuffles both sides —
    * at 1000 executors that is two full network passes over the fact
    * tables; here the only movement is the partition-local sort.
    *
    * The oracle is the plain join — bucketing must change COST, never
    * results. */
  def spjColocated(spark: SparkSession, sfDir: String): DataFrame = {
    enableSpj(spark)
    val (ordersDir, custDir) = spjTables(spark, sfDir)
    val o = spark.table(s"graft_spj.`$ordersDir`")
    val c = spark.table(s"graft_spj.`$custDir`")
    o.hint("merge")
      .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(graft.functions.Deterministic.sumExact(col("o_totalprice"))
          .cast("double"), 6).as("total_price"))
  }
}
