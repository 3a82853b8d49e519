package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins
import graft.sources.{GraftLog, Sources, Staging}

/** The DSv2 SPJ catalog: a join of two graft tables hidden-bucketed on
  * the same key must plan with ZERO shuffle exchanges below the join —
  * Spark's storage-partitioned join proving co-partitioning from the
  * scans' KeyGroupedPartitioning reports. Results always equal the V1
  * read's (layout is cost, never semantics). */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    Joins.enableSpj(s) // every test resolves through the catalog
    s
  }

  private lazy val dirs: (String, String) =
    Joins.spjTables(spark, TestSpark.sf)

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  /** Full traversal: AQE wraps materialized subtrees in QueryStageExec
    * LEAVES, which TreeNode.collect never descends into. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      flatten(q.plan)
    case _ => p.children.flatMap(flatten)
  })

  private def shufflesBelowJoin(plan: SparkPlan): Int = {
    val join = flatten(plan).collectFirst { case j: SortMergeJoinExec => j }
    assert(join.nonEmpty, s"expected a sort-merge join in:\n$plan")
    flatten(join.get).count {
      case _: ShuffleExchangeLike => true
      case _                      => false
    } - (join.get match { case _: ShuffleExchangeLike => 1; case _ => 0 })
  }

  test("bucketed fact-fact join plans with zero exchanges") {
    val (ordersDir, custDir) = dirs
    val o = spark.table(s"graft_spj.`$ordersDir`")
    val c = spark.table(s"graft_spj.`$custDir`")
    val joined = o.hint("merge")
      .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
    val plan = executed(joined)
    assert(shufflesBelowJoin(plan) == 0,
      s"SPJ must not shuffle either side:\n$plan")

    // identical rows to the V1 read path's join
    val oV1 = GraftLog.read(spark, ordersDir)
    val cV1 = GraftLog.read(spark, custDir)
    val expected = oV1.join(cV1, col("o_custkey") === col("c_custkey"))
      .count()
    assert(joined.count() == expected)
  }

  test("v1 control: the same join through format(\"graft\") shuffles") {
    val (ordersDir, custDir) = dirs
    val o = GraftLog.read(spark, ordersDir).hint("merge")
    val c = GraftLog.read(spark, custDir).hint("merge")
    val plan = executed(o.join(c, col("o_custkey") === col("c_custkey")))
    assert(shufflesBelowJoin(plan) == 2,
      s"the V1 control is expected to shuffle both sides:\n$plan")
  }

  test("groupBy on the bucket column is exchange-free") {
    val (ordersDir, _) = dirs
    val agg = spark.table(s"graft_spj.`$ordersDir`")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val plan = executed(agg)
    val shuffles = flatten(plan).collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"bucket(16, o_custkey) satisfies ClusteredDistribution(o_custkey):\n$plan")
    val viaV1 = GraftLog.read(spark, ordersDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    assert(agg.collect().toSet == viaV1.collect().toSet)
  }

  test("column pruning and bucket pruning reach the scan") {
    val (ordersDir, _) = dirs
    val t = spark.table(s"graft_spj.`$ordersDir`")
    // pruning: only requested columns in the scan's read schema
    val pruned = t.select(col("o_custkey"))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("o_custkey"))

    // an equality probe on the bucket source column keeps ONE bucket
    val key = t.select(col("o_custkey")).head().getLong(0)
    val probe = t.filter(col("o_custkey") === key)
    probe.collect()
    val probeScan = probe.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(probeScan.inputRDD.getNumPartitions <= 1,
      "equality on the bucket column must keep at most one bucket")
    // and never loses rows vs the full scan
    assert(probe.count() ==
      GraftLog.read(spark, ordersDir)
        .filter(col("o_custkey") === key).count())
  }

  test("refusals: DVs, column mapping, and hive layouts point at V1") {
    val d = Staging.tempDir("graft_spjref_") + "/hive"
    GraftLog.overwritePartitioned(
      Sources.testTable(spark, TestSpark.sf, "region"), d, Seq("r_name"))
    val e = intercept[Exception] {
      spark.table(s"graft_spj.`$d`").collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("format(\"graft\")"),
      s"hive layout must refuse loudly, got: ${e.getMessage}")
  }

  test("one-side shuffle: unbucketed frame re-buckets via the V2 function") {
    val (ordersDir, _) = dirs
    val prev = spark.conf.getOption(
      "spark.sql.sources.v2.bucketing.shuffle.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    try {
      val o = spark.table(s"graft_spj.`$ordersDir`")
      // an in-memory dim with NO layout: only IT may shuffle — Spark
      // hashes it with GraftBucketBound.produceResult to match the
      // scan's partitioning
      import spark.implicits._
      val dim = o.select(col("o_custkey")).distinct().as[Long].collect()
        .toSeq.toDF("k")
      val joined = o.hint("merge")
        .join(dim.hint("merge"), col("o_custkey") === col("k"))
      val plan = executed(joined)
      val n = shufflesBelowJoin(plan)
      assert(n <= 1, s"only the unbucketed side may shuffle:\n$plan")
      assert(joined.count() == o.count())
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.sources.v2.bucketing.shuffle.enabled", v)
      case None => spark.conf.unset(
        "spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("e21 contamination audit: the WHOLE plan is exchange-free") {
    val df = graft.operators.Dedup.contaminationSpj(spark, TestSpark.sf)
    val plan = executed(df)
    val shuffles = flatten(plan).collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"join AND per-digest agg must ride the bucket layout:\n$plan")
    assert(df.count() > 0, "the 600-699 overlap must surface")
  }

  test("V2 time travel: VERSION AS OF through the catalog") {
    val d = Staging.tempDir("graft_spjtt_") + "/t"
    import spark.implicits._
    GraftLog.overwrite((0 until 10).map(i => (i.toLong, "v0"))
      .toDF("id", "tag"), d)                                      // v0
    GraftLog.overwrite((0 until 3).map(i => (i.toLong, "v1"))
      .toDF("id", "tag"), d)                                      // v1
    assert(spark.sql(s"SELECT * FROM graft_spj.`$d` VERSION AS OF 0")
      .count() == 10)
    assert(spark.sql(s"SELECT * FROM graft_spj.`$d`").count() == 3)
  }

  test("flat (unbucketed) tables still read correctly, unpartitioned") {
    val d = Staging.tempDir("graft_spjflat_") + "/nation"
    val src = Sources.testTable(spark, TestSpark.sf, "nation")
    GraftLog.overwrite(src, d)
    val viaCat = spark.table(s"graft_spj.`$d`")
    assert(viaCat.collect().toSet == src.collect().toSet)
  }
}
