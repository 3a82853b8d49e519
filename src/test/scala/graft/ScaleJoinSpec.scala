package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins
import graft.sources.{Sinks, Sources}

class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join with zero exchange on either side") {
    val li = Sources.testTable(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Sources.testTable(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_totalprice")
    Sinks.bucketed(li, "graft_b_lineitem", Seq("l_orderkey"), 8)
    Sinks.bucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_b_orders", Seq("l_orderkey"), 8)
    // disable broadcast so the planner must exploit the bucket layout
    // (at real fact-fact scale neither side fits a broadcast anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_b_lineitem")
        .join(spark.table("graft_b_orders"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join shuffled:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the rows of the plain join") {
    // skewed fixture: orders keyed to a dominant customer
    val large = Sources.testTable(spark, TestSpark.sf, "orders")
      .withColumn("k", when(col("o_orderkey") % 3 === 0, 0L)
        .otherwise(col("o_custkey")))
      .select(col("k"), col("o_orderkey"))
    val small = Sources.testTable(spark, TestSpark.sf, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val plain = large.join(small, Seq("k"))
      .select("k", "o_orderkey", "c_name")
      .collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(large, small, "k")
      .select("k", "o_orderkey", "c_name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("j7 salted rollup: salt reaches the exchange, result matches plain") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Joins.saltedFlagRollup(spark, TestSpark.sf)
      // the candidate-generation shuffle must partition on (flag, __salt) —
      // the hot key fans out instead of landing on one task
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"no salt in the exchange:\n$plan")
      val got = q.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val plain = Sources.testTable(spark, TestSpark.sf, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n_items"))
        .collect()
        .map(r => (r.getString(0), s"FLAG_${r.getString(0)}", r.getLong(1)))
        .toSet
      assert(got == plain && got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("g13 sketch estimate tracks g5 exact distinct counts") {
    import graft.operators.TextAnalysis
    val exact = TextAnalysis.corpusStats(spark, TestSpark.sf)
      .select("lang", "source", "n_distinct_tokens").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = TextAnalysis.corpusStatsSketch(spark, TestSpark.sf)
      .select("lang", "source", "distinct_tokens_est").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (k, e) =>
      val x = exact(k).toDouble
      // KMV with k=256: relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
      assert(math.abs(e - x) / x <= 0.25, s"$k: est $e vs exact $x")
    }
  }

  test("binned range join: row-identical to naive theta join, equi-plan") {
    val ev = graft.streaming.Streaming.eventsBatch(spark, TestSpark.sf)
      .withColumn("us", unix_micros(col("ts")))
    val points = ev.select(col("event_id"), col("us"))
    val intervals = ev.filter(col("event_type") === "error").limit(200)
      .select(col("event_id").as("iv_id"),
        (col("us") + 1L).as("lo"), (col("us") + 300000000L).as("hi"))
    val naive = points.join(intervals,
        col("us") >= col("lo") && col("us") <= col("hi"))
      .select("event_id", "iv_id").collect().map(_.toSeq).toSet
    val binned = Joins.binnedRangeJoin(points, intervals,
        "us", "lo", "hi", 300000000L)
      .select("event_id", "iv_id")
    assert(binned.collect().map(_.toSeq).toSet == naive && naive.nonEmpty)
    // the point of binning: the plan is an equi-join on the bin id, not
    // the broadcast nested loop the raw theta predicate would plan
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"), plan)
  }

  test("binned range join rejects non-positive bin width") {
    val df = spark.range(1).selectExpr("id AS us", "id AS lo", "id AS hi")
    intercept[IllegalArgumentException] {
      Joins.binnedRangeJoin(df, df, "us", "lo", "hi", 0L)
    }
  }

  test("session profiles: delta/iceberg absent -> parquet fallback engages") {
    import graft.sessions.Sessions
    assert(!Sessions.formatAvailable(Sessions.DeltaLake))
    assert(!Sessions.formatAvailable(Sessions.IcebergLake))
    assert(Sessions.formatAvailable(Sessions.ParquetLake))
    assert(graft.operators.Ddl.preferredFormat() == "parquet")
  }

  test("session pins the reference-parity semantics (SURVEY §4/§7.4)") {
    // ANSI off is load-bearing: Spark 4 defaults it on, which errors on
    // wraparound hash arithmetic and changes decimal overflow to throw
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("j12: dynamic partition pruning fires through the graft index") {
    import graft.operators.Joins
    val q = Joins.dppFlagRollup(spark, TestSpark.sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition filter:\n" +
        plan.take(2500))
    // the scan opened only the R partition's files (walk into AQE's
    // finalized plan and its query stages)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan)
      .find(_.relation.location.isInstanceOf[graft.sources.GraftFileIndex])
      .getOrElse(fail("no graft scan in plan"))
    val opened = scan.metrics("numFiles").value
    val total = scan.relation.location.inputFiles.length
    assert(opened < total,
      s"DPP should prune: opened $opened of $total files")
    // DPP never changes the answer
    val row = q.collect().head
    val expect = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_returnflag") === "R")
      .count()
    assert(row.getAs[Long]("n_items") == expect)
  }
}
