package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftFileIndex, GraftLog, Sources, Staging}

/** Planner-driven data skipping through the GraftFileIndex: pushed
  * filters must prune files (numFiles metric) without losing rows. */
class GraftFileIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // range-clustered staged table: 8 files with tight c_custkey ranges
  private lazy val dir: String = {
    val d = Staging.tempDir("graft_fidx_") + "/customer"
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "customer")
        .repartitionByRange(8, col("c_custkey")), d)
    d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
  }

  test("format(\"graft\") full read equals GraftLog.read") {
    val a = spark.read.format("graft").load(dir)
    val b = GraftLog.read(spark, dir)
    assert(a.schema == b.schema)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(a.count() > 0)
  }

  test("pushed range filter prunes files in the plan, loses no rows") {
    val q = spark.read.format("graft").load(dir)
      .filter(col("c_custkey") >= 10 && col("c_custkey") <= 40)
    val scan = scanOf(q)
    val total = new GraftFileIndex(spark, dir).inputFiles.length
    assert(scan.metrics("numFiles").value < total,
      s"expected pruning below $total files")
    val expect = GraftLog.read(spark, dir)
      .filter(col("c_custkey") >= 10 && col("c_custkey") <= 40)
    assert(q.exceptAll(expect).count() == 0 &&
      expect.exceptAll(q).count() == 0)
  }

  test("disjunctive ranges keep files on both sides (OR pruning)") {
    val lo = spark.read.format("graft").load(dir)
      .filter(col("c_custkey") <= 5)
    val hi = spark.read.format("graft").load(dir)
      .filter(col("c_custkey") >= 140)
    val both = spark.read.format("graft").load(dir)
      .filter(col("c_custkey") <= 5 || col("c_custkey") >= 140)
    assert(both.count() == lo.count() + hi.count())
    val nBoth = scanOf(both).metrics("numFiles").value
    val total = new GraftFileIndex(spark, dir).inputFiles.length
    assert(nBoth < total) // middle files pruned even under OR
  }

  test("filters on unstat'd columns keep every file (conservative)") {
    val q = spark.read.format("graft").load(dir)
      .filter(col("c_name").startsWith("Customer"))
    val scan = scanOf(q)
    val total = new GraftFileIndex(spark, dir).inputFiles.length
    assert(scan.metrics("numFiles").value == total)
  }

  test("versionAsOf time travel through the data source") {
    val d = Staging.tempDir("graft_fidx_") + "/tt"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    GraftLog.overwrite(cust.filter(col("c_custkey") < 50), d)  // v0
    GraftLog.overwrite(cust.filter(col("c_custkey") >= 50), d) // v1
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(d)
    val v1 = spark.read.format("graft").load(d)
    assert(v0.agg(max(col("c_custkey"))).collect().head.getLong(0) < 50)
    assert(v1.agg(min(col("c_custkey"))).collect().head.getLong(0) >= 50)
    assert(v0.count() + v1.count() == cust.count())
  }

  test("t10 registered query equals the explicit-API t8 pruning path") {
    // same staged table, same semantics: planner-driven skipping must
    // agree with GraftLog.readPruned for an equivalent single range
    val a = spark.read.format("graft").load(dir)
      .filter(col("c_custkey") >= 20 && col("c_custkey") <= 80)
      .select(col("c_custkey"))
    val b = GraftLog.readPruned(spark, dir, "c_custkey", 20.0, 80.0)
      .select(col("c_custkey"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
