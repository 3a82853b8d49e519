package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.sessions.Sessions
      .builder(appName = "graft-test", master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Scale-killer detector for the packing family: logical Window
    * nodes whose partition spec is a SINGLE expression run one task
    * per group value (one ~50 TB task for the majority language at the
    * 100 TB target). Exempt: a window whose subtree contains an
    * Aggregate — that is the tiny per-(partition, group) offsets frame
    * of the distributed prefix sum (≤ partitions × groups rows), not
    * corpus data. */
  def unboundedGroupWindows(df: org.apache.spark.sql.DataFrame)
      : Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.size < 2 && !w.child.exists(
            _.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.Aggregate]) =>
        w.partitionSpec.map(_.sql).mkString(",")
    }
}

class MedallionSpec extends AnyFunSuite {
  import graft.operators.Medallion
  lazy val spark = TestSpark.spark

  test("bronze: schema + row preservation + decimal casts") {
    val b = Medallion.bronze(spark, TestSpark.sf)
    assert(b.count() == 6000)
    val types = b.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("price") == "decimal(38,10)")
    assert(types("trade_date") == "date")
    assert(types("exchange") == "string")
  }

  test("silver asset perf: one row per (trade_date, ticker), OHLC invariants") {
    val s = Medallion.silverAssetPerf(spark, TestSpark.sf)
    val n = s.count()
    assert(n == s.select("trade_date", "ticker").distinct().count())
    // high >= low, high >= open/close >= low
    import org.apache.spark.sql.functions._
    val bad = s.filter(
      col("high_price") < col("low_price") ||
      col("open_price") > col("high_price") ||
      col("open_price") < col("low_price") ||
      col("close_price") > col("high_price") ||
      col("close_price") < col("low_price")).count()
    assert(bad == 0)
    assert(s.filter(col("is_active") && col("version") === 1).count() == n)
  }

  test("silver asset perf: min_by/max_by deterministic across runs") {
    val a = Medallion.silverAssetPerf(spark, TestSpark.sf).collect().toSet
    val b = Medallion.silverAssetPerf(spark, TestSpark.sf)
      .repartition(7).collect().toSet
    assert(a == b)
  }

  test("gold rollup: volatility null iff single-day month, avg within range") {
    import org.apache.spark.sql.functions._
    val g = Medallion.goldMonthlyRollup(spark, TestSpark.sf)
    assert(g.count() > 0)
    assert(g.filter(col("n_days") > 1 && col("volatility").isNull).count() == 0)
    assert(g.filter(col("n_days") === 1 && col("volatility").isNotNull).count() == 0)
    assert(g.filter(col("average_roi") <= 0).count() == 0)
  }

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ANSI-off semantic pin: DECIMAL(38,10) overflow yields silent null (SURVEY §7.5.4)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // two values near the decimal(38,10) cap; their sum overflows p=38
    val big = new java.math.BigDecimal("9" * 28 + "." + "9" * 10)
    val df = graft.sources.Sources.fromRows(spark,
      Seq(Row(big), Row(big)),
      StructType(Seq(StructField("v", DecimalType(38, 10)))))
    val out = df.agg(org.apache.spark.sql.functions.sum("v")).collect()(0)
    assert(out.isNullAt(0), // reference semantics: silent null, not error
      s"expected overflow->null under ANSI off, got ${out.get(0)}")
  }

  test("lake pipeline e2e: persisted gold equals directly-computed gold") {
    val dir = java.nio.file.Paths.get(
      graft.sources.Staging.tempDir("graft_lake_test_"))
    val fromLake = Medallion.lakePipeline(spark, TestSpark.sf, dir.toString)
      .collect().map(_.toSeq).toSet
    val direct = Medallion.goldMonthlyRollup(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(fromLake == direct)
    // bronze landed partitioned by ticker
    val bronzeDirs = new java.io.File(s"$dir/bronze_quotes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ticker="))
    assert(bronzeDirs.length >= 3)
  }
}
