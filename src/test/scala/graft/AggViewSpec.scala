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
}
