package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ddl
import graft.sources.{Sinks, Sources}

class DdlSinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    graft.sources.Staging.tempDir("graft_sink_")

  test("ddl: create/drop database + table, show tables") {
    Ddl.createDatabase(spark, "graft_ddl_test")
    Ddl.createTable(spark, "graft_ddl_test.quotes",
      "trade_date DATE, ticker STRING, price DECIMAL(38,10)",
      partitionBy = Seq("trade_date"))
    val tables = Ddl.showTables(spark, Some("graft_ddl_test"))
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tables.contains("quotes"))
    Ddl.dropTable(spark, "graft_ddl_test.quotes")
    assert(Ddl.showTables(spark, Some("graft_ddl_test")).count() == 0)
    Ddl.dropDatabase(spark, "graft_ddl_test", cascade = true)
  }

  test("sinks: partitioned write prunes on partition filter") {
    val dir = tmp()
    val li = Sources.testTable(spark, TestSpark.sf, "lineitem")
      .withColumn("flag", col("l_returnflag"))
    Sinks.partitioned(li, dir, Seq("flag"))
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // partition pruning: only one partition dir scanned for flag='R'
    val pruned = back.filter(col("flag") === "R")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(flag"), scan)
  }

  test("sinks: dynamic partition overwrite replaces only matching partitions") {
    val dir = tmp()
    val li = Sources.testTable(spark, TestSpark.sf, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_quantity"))
    Sinks.partitioned(li, dir, Seq("flag"))
    val beforeNonR = spark.read.parquet(dir)
      .filter(col("flag") =!= "R").count()
    assert(beforeNonR > 0)
    // rewrite only flag='R' with a single row
    val one = li.filter(col("flag") === "R").limit(1)
    Sinks.overwritePartitions(one, dir, Seq("flag"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("flag") === "R").count() == 1)
    // every non-R partition survived untouched (a static overwrite would
    // have truncated them)
    assert(after.filter(col("flag") =!= "R").count() == beforeNonR)
  }

  test("sinks: singleFile writes exactly one data file") {
    val dir = tmp()
    Sinks.singleFile(
      Sources.testTable(spark, TestSpark.sf, "nation"), dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
  }

  test("sinks: delta format degrades to parquet when runtime absent") {
    val dir = tmp()
    val nation = Sources.testTable(spark, TestSpark.sf, "nation")
    Sinks.overwrite(nation, dir, format = "delta")
    assert(spark.read.parquet(dir).count() == 25)
    Sinks.overwriteMergeSchema(nation.withColumn("extra", lit(1)), dir,
      format = "delta")
    assert(spark.read.parquet(dir).columns.contains("extra"))
  }

  test("sinks: overwrite+mergeSchema evolves schema like Delta (K2)") {
    val dir = tmp()
    val nation = Sources.testTable(spark, TestSpark.sf, "nation")
    Sinks.overwrite(nation, dir, format = "parquet")
    // new frame ADDS a column and DROPS n_name: Delta's
    // overwrite+mergeSchema keeps the dropped column in the schema
    // (NULL for the new rows) and adds the new one
    val evolved = nation.drop("n_name")
      .withColumn("region_grp", col("n_regionkey") % 2)
    Sinks.overwriteMergeSchema(evolved, dir, format = "delta")
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("region_grp"), "added column present")
    assert(back.columns.contains("n_name"), "old-only column survives")
    assert(back.count() == 25, "data replaced, not appended")
    assert(back.filter(col("n_name").isNotNull).count() == 0,
      "old-only column is NULL for the new rows")
    assert(back.filter(col("region_grp").isNull).count() == 0)
    // K3 overwriteSchema: schema replaced wholesale, dropped column gone
    Sinks.overwriteNewSchema(evolved, dir, format = "delta")
    assert(!spark.read.parquet(dir).columns.contains("n_name"))
  }

  test("sources: profile fallback row-invariant, avro + literal-rows (S5/S6/S10)") {
    val sf = TestSpark.sf
    // S5: the session-factory dispatch must return identical rows
    // whichever profile is requested (jar absence degrades the format,
    // never the data)
    val byProfile = Seq("parquet", "delta", "iceberg").map { p =>
      val s = graft.sessions.Sessions.get(p)
      Sources.testTable(s, sf, "nation").collect().map(_.toSeq).toSet
    }
    assert(byProfile.distinct.size == 1, "profile choice changed the rows")
    // S10: round-trip rides real Avro container files when the classes
    // are present (spark-sql 4 bundles them), parquet otherwise
    val expected = if (Sources.avroAvailable) "avro" else "parquet"
    val back = Sources.avroRoundTrip(spark, sf)
    assert(back.select("interchange_format").distinct()
      .collect().map(_.getString(0)).toSeq == Seq(expected))
    assert(back.count() ==
      Sources.testTable(spark, sf, "supplier").count())
    // S6: the reference's literal fixture has a closed-form answer
    val fin = graft.operators.Incremental.literalRowsPipeline(spark)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(fin.toSeq == Seq((1, "Alice", 30, 52000), (2, "Bob", 29, 65000),
      (3, "Hari", 28, 47000), (4, "Dave", 40, 70000)))
  }

  test("lake pipeline layout: one bronze file per ticker, single-file rollups") {
    val dir = tmp()
    graft.operators.Medallion.lakePipeline(spark, TestSpark.sf, dir)
    def dataFiles(sub: String): Array[java.io.File] = {
      def walk(f: java.io.File): Array[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toArray.flatten.flatMap(walk)
        else Array(f)
      walk(new java.io.File(s"$dir/$sub"))
        .filter(_.getName.endsWith(".parquet"))
    }
    // bronze: repartition(ticker) before partitionBy — one file per ticker
    // value, not tasks x tickers (the write-amplification fix)
    val tickers = spark.read.parquet(s"$dir/bronze_quotes")
      .select("ticker").distinct().count()
    assert(dataFiles("bronze_quotes").length == tickers)
    assert(dataFiles("silver_asset_perf").length == 1)
    assert(dataFiles("gold_monthly_rollup").length == 1)
  }

  test("sessions: object-store seam applies s3a + committer config") {
    import graft.sessions.Sessions
    val keys = Seq("spark.hadoop.fs.s3a.endpoint",
      "spark.hadoop.fs.s3a.path.style.access",
      "spark.hadoop.fs.s3a.connection.ssl.enabled",
      "spark.hadoop.fs.s3a.impl",
      "spark.hadoop.fs.s3a.access.key", "spark.hadoop.fs.s3a.secret.key",
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
      "spark.hadoop.mapreduce.fileoutputcommitter.cleanup-failures.ignored")
    try {
      // getOrCreate on the live session layers the configs onto it (hadoop
      // confs are session-scoped, not static SQL confs)
      Sessions.withObjectStore(org.apache.spark.sql.SparkSession.builder(),
        endpoint = Some("http://localhost:9000"),
        accessKey = Some("test-access"), secretKey = Some("test-secret"),
        sslEnabled = false).getOrCreate()
      assert(spark.conf.get("spark.hadoop.fs.s3a.endpoint")
        == "http://localhost:9000")
      assert(spark.conf.get("spark.hadoop.fs.s3a.path.style.access") == "true")
      assert(spark.conf.get(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version") == "2")
    } finally keys.foreach(spark.conf.unset) // don't leak into other specs
    // no-op without an endpoint: the input builder comes back unchanged
    val b = org.apache.spark.sql.SparkSession.builder()
    assert(Sessions.withObjectStore(b, endpoint = None) eq b)
  }

  test("sources: csv round-trip, inferred and declared schema (S1/S2)") {
    val dir = tmp() + "/csv"
    val li = Sources.testTable(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(100)
    li.write.option("header", "true").csv(dir)
    val inferred = Sources.csvInferred(spark, dir)
    assert(inferred.count() == 100)
    assert(inferred.schema("l_orderkey").dataType.typeName == "integer" ||
      inferred.schema("l_orderkey").dataType.typeName == "long")
    val declared = Sources.csvDeclared(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL(
        "l_orderkey LONG, l_quantity DOUBLE, l_returnflag STRING"))
    assert(declared.count() == 100)
    assert(declared.schema("l_quantity").dataType.typeName == "double")
    // S7 scale form: whole-directory scan
    assert(Sources.csvDir(spark, dir).count() == 100)
  }
}
