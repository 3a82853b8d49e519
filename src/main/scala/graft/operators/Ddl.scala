package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DDL / catalog operators (SURVEY.md §2.3, D1-D4).
  *
  * The reference issues its DDL as SQL text against a Hive-backed Delta
  * catalog (`financial_dl_bronze.py:8-29`, `financial_dl_silver.py:8-59`,
  * `delta_lake_jenkins.py:39-123`). Under Spark 4 with no Delta jars the
  * same statements run with `USING PARQUET` (SURVEY.md §7.4): the format
  * clause is feature-detected via [[preferredFormat]].
  */
object Ddl {

  /** Best available table format: delta when its runtime is present,
    * parquet otherwise. */
  def preferredFormat(): String =
    if (graft.sessions.Sessions.formatAvailable(
      graft.sessions.Sessions.DeltaLake)) "delta" else "parquet"

  /** D1 — `CREATE DATABASE IF NOT EXISTS` (`financial_dl_bronze.py:8`). */
  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  /** D2 — `CREATE TABLE ... USING <fmt> [PARTITIONED BY] [LOCATION]`
    * (`financial_dl_bronze.py:14-29`). `cols` is SQL DDL text, e.g.
    * `"Date DATE, Ticker STRING, Open DECIMAL(38,10)"`. */
  def createTable(
      spark: SparkSession, name: String, cols: String,
      partitionBy: Seq[String] = Nil, location: Option[String] = None,
      format: String = preferredFormat()): Unit = {
    val part =
      if (partitionBy.nonEmpty) s" PARTITIONED BY (${partitionBy.mkString(", ")})"
      else ""
    val loc = location.fold("")(l => s" LOCATION '$l'")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $name ($cols) USING $format$part$loc")
  }

  /** CTAS convenience: drop-and-recreate a managed table from a frame —
    * the bronze-load shape (`financial_dl_etl.py:42-46`) without Delta. */
  def createTableAs(spark: SparkSession, name: String, df: DataFrame,
      format: String = preferredFormat()): Unit = {
    dropTable(spark, name)
    purgeManagedLocation(spark, name)
    df.write.format(format).saveAsTable(name)
  }

  /** Remove a managed table's on-disk location. The in-memory catalog dies
    * with the session but `spark-warehouse/` does not, so a fresh session's
    * `DROP TABLE IF EXISTS` (a no-op — the table isn't registered) followed
    * by CTAS would hit LOCATION_ALREADY_EXISTS on the stale directory. */
  def purgeManagedLocation(spark: SparkSession, name: String): Unit = {
    val parts = name.split('.')
    val (db, table) =
      if (parts.length == 2) (parts(0), parts(1)) else ("default", parts(0))
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    // the default database lives at the warehouse root, not default.db/
    val rel = if (db == "default") table else s"$db.db/$table"
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$rel")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** `USE <db>` — current-database switch (`delta_datalake.py`'s
    * `USE airbnb`); subsequent unqualified table names resolve there. */
  def useDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"USE $db")

  /** D3 — `DROP TABLE IF EXISTS` (`financial_dl_bronze.py:11`). */
  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  /** D3 — `DROP DATABASE IF EXISTS [CASCADE]` (`financial_dl_silver.py:57-59`). */
  def dropDatabase(spark: SparkSession, db: String, cascade: Boolean = false): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $db${if (cascade) " CASCADE" else ""}")

  /** D4 — `SHOW TABLES` (`delta_datalake.py:77`). */
  def showTables(spark: SparkSession, db: Option[String] = None): DataFrame =
    spark.sql(db.fold("SHOW TABLES")(d => s"SHOW TABLES IN $d"))

  /** Driver-visible D1-D4 + S4 + K5 round-trip: silver frame → managed
    * catalog table → catalog scan back. Values must survive the parquet
    * round-trip bit-exactly (decimal/date/long), so the a2 oracle applies
    * unchanged. */
  def catalogRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    createDatabase(spark, "graft_lake")
    createTableAs(spark, "graft_lake.silver_asset_perf",
      Medallion.silverAssetPerf(spark, sfDir))
    spark.table("graft_lake.silver_asset_perf")
  }

  private val stagedSqlT =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d5 — the SQL DDL surface over the transactional format: `CREATE
    * TABLE ... USING graft OPTIONS (path ...)` registers the log-backed
    * table in the session catalog, and plain `spark.sql` SELECTs run
    * through [[graft.sources.GraftFileIndex]] — catalog name resolution,
    * filter pushdown, and commit-log file skipping composing with zero
    * query-side API. The reference's `spark.sql` table DDL over Delta
    * (`financial_dl_bronze.py:14-29`), re-expressed. */
  def graftSqlTable(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedSqlT.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqlt_") + "/customer"
      graft.sources.GraftLog.overwrite(
        graft.sources.Sources.testTable(spark, sfDir, "customer")
          .repartitionByRange(8, org.apache.spark.sql.functions
            .col("c_custkey")), d)
      d
    })
    val t = s"graft_sql_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    spark.sql(
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         |FROM $t WHERE c_custkey BETWEEN 201 AND 500""".stripMargin)
  }

  private val stagedSqlM =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d6 — SQL `MERGE INTO` text against a `USING graft` table: the
    * parser produces Spark's MergeIntoTable plan, and the
    * [[graft.sql.GraftSparkSessionExtension]] post-hoc rule routes it to
    * the transactional [[graft.sources.GraftLog.merge]] — the Delta
    * `MERGE INTO` surface of the reference
    * (`spark_session_factory.py:70`, `financial_dl_etl.py` merge cycle)
    * with zero API calls in the query. Oracle: the same relational
    * upsert as t2/c4 (the SQL surface must not change the answer). */
  def graftSqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedSqlM.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqlm_") + "/customer"
      graft.sources.GraftLog.overwrite(
        graft.sources.Sources.testTable(spark, sfDir, "customer"), d)
      d
    })
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_sqlm_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    Incremental.incrementalBatch(spark, sfDir).selectExpr(
        "inc_custkey AS c_custkey", "inc_name AS c_name",
        "inc_nationkey AS c_nationkey", "inc_acctbal AS c_acctbal",
        "inc_mktsegment AS c_mktsegment")
      .createOrReplaceTempView(s"graft_sqlm_src_$tag")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING graft_sqlm_src_$tag AS src
         |ON tgt.c_custkey = src.c_custkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // temp views surface in every database's SHOW TABLES — drop after
    // the merge so the d3 lifecycle listing stays exact in any order
    spark.catalog.dropTempView(s"graft_sqlm_src_$tag")
    spark.table(t).select("c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment")
  }

  private val stagedSqlScd =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d20 — `ANALYZE TABLE … FOR COLUMNS`: one-pass per-column ndv
    * (KMV sketch, engine-portable hash — the estimate itself is
    * oracle-reproducible), min/max, and null counts, persisted as
    * log-carried `graft.stats.col.*` properties AND pushed to the
    * session catalog as CBO statistics (the broadcast-flip those
    * enable is pinned by AnalyticsSpec). Output = one row per column
    * read back from the STORED properties — proving the stats
    * round-trip through the log, not just the command result. */
  def graftSqlAnalyzeColumns(spark: SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val d = graft.sources.Staging.scratchDir("graft_anacol_") + "/cust"
    graft.sources.GraftLog.overwrite(
      graft.sources.Sources.testTable(spark, sfDir, "customer"), d)
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_anacol_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$d')")
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS " +
      "c_custkey, c_nationkey, c_mktsegment").collect()
    val props = graft.sources.GraftLog.properties(spark, d)
    val rows = props("graft.stats.rowCount").toLong
    import spark.implicits._
    Seq("c_custkey", "c_nationkey", "c_mktsegment").map { c =>
      (c, props(s"graft.stats.col.$c.ndv").toDouble,
        props.get(s"graft.stats.col.$c.min").orNull,
        props.get(s"graft.stats.col.$c.max").orNull,
        props(s"graft.stats.col.$c.nullCount").toLong, rows)
    }.toDF("col_name", "ndv_est", "min_v", "max_v", "null_count",
      "row_count")
  }

  /** d28 — INCREMENTAL stats refresh through the DML staleness guard:
    * ANALYZE once, then two MERGE waves each tripling-ish the key
    * domain (far past the 20% drift horizon). Each wave's post-DML
    * guard refreshes the stats INCREMENTALLY — exact
    * rowCount/nullCount and live-file min/max folded from commit
    * metadata, ndv by merging the persisted KMV sketch with a sketch
    * over only that wave's new files — so the log-carried stats read
    * back AFTER both waves must equal a from-scratch ANALYZE of the
    * final table (the oracle replays exactly that: KMV union over
    * disjoint inputs is the KMV of the union). The catalog
    * broadcast-flip this preserves is pinned by AnalyticsSpec. */
  def graftSqlStatsRefresh(spark: SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val d = graft.sources.Staging.scratchDir("graft_statsref_") + "/cust"
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
    graft.sources.GraftLog.overwrite(cust, d)
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_statsref_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$d')")
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS " +
      "c_custkey, c_acctbal, c_mktsegment").collect()
    Seq(10000000L, 20000000L).foreach { shift =>
      cust.withColumn("c_custkey", col("c_custkey") + shift)
        .createOrReplaceTempView(s"graft_statsref_src_$tag")
      spark.sql(
        s"""MERGE INTO $t AS t USING graft_statsref_src_$tag AS s
           |ON t.c_custkey = s.c_custkey
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    spark.catalog.dropTempView(s"graft_statsref_src_$tag")
    val props = graft.sources.GraftLog.properties(spark, d)
    val rows = props("graft.stats.rowCount").toLong
    import spark.implicits._
    Seq("c_custkey", "c_acctbal", "c_mktsegment").map { c =>
      (c, props(s"graft.stats.col.$c.ndv").toDouble,
        props.get(s"graft.stats.col.$c.min").orNull,
        props.get(s"graft.stats.col.$c.max").orNull,
        props(s"graft.stats.col.$c.nullCount").toLong, rows)
    }.toDF("col_name", "ndv_est", "min_v", "max_v", "null_count",
      "row_count")
  }

  /** d24 — extra MERGE ON conjuncts (the full Delta ON surface): the
    * statement `ON t.key = s.key AND t.segment = 'BUILDING'` updates
    * only BUILDING customers; a key-matching row that FAILS the extra
    * conjunct is NOT MATCHED, so the INSERT clause fires and legally
    * introduces a duplicate key — Delta's exact semantics, replayed by
    * the oracle. The key equalities remain the file-pruning anchor. */
  def graftSqlMergeOnExtra(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val d = graft.sources.Staging.scratchDir("graft_monex_") + "/cust"
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
    graft.sources.GraftLog.overwrite(cust, d)
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_monex_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$d')")
    cust.filter(col("c_custkey") % 4 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .createOrReplaceTempView(s"graft_monex_src_$tag")
    spark.sql(
      s"""MERGE INTO $t AS t USING graft_monex_src_$tag AS s
         |ON t.c_custkey = s.c_custkey AND t.c_mktsegment = 'BUILDING'
         |WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView(s"graft_monex_src_$tag")
    spark.table(t).select("c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment")
  }

  /** d23 — `COPY INTO`, the hourly lake-ingest statement: odd-key
    * customers seed the table, even-key customers land as parquet
    * files in an incoming directory and are loaded by the statement;
    * a SECOND run over the same directory ingests zero files / zero
    * rows (per-file ledger in the commit log, Delta's COPY INTO
    * idempotence contract) — pinned as result columns. At 100 TB the
    * re-run costs one metadata fold, no data files opened. */
  def graftSqlCopyInto(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val root = graft.sources.Staging.scratchDir("graft_copyinto_")
    val t = s"$root/cust"
    val incoming = s"$root/incoming"
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
    graft.sources.GraftLog.overwrite(
      cust.filter(col("c_custkey") % 2 === 1), t)
    cust.filter(col("c_custkey") % 2 === 0)
      .repartition(4).write.parquet(incoming)
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val tbl = s"graft_copy_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$t')")
    val first = spark.sql(
      s"COPY INTO $tbl FROM '$incoming' FILEFORMAT = PARQUET")
      .collect().head
    require(first.getLong(2) > 0, "first COPY INTO must ingest rows")
    val again = spark.sql(
      s"COPY INTO $tbl FROM '$incoming' FILEFORMAT = PARQUET")
      .collect().head
    spark.table(tbl)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("second_run_files", lit(again.getLong(1)))
      .withColumn("second_run_rows", lit(again.getLong(2)))
  }

  /** d26 — column DEFAULTs (standard SQL `ALTER COLUMN … SET DEFAULT`,
    * Delta's `defaults` writer feature): the table declares constant
    * fill expressions for `c_acctbal` and `c_mktsegment` in one
    * metadata commit each; an append that OMITS both columns gets them
    * filled at write time (supplied values always win — the second
    * append carries its own `c_acctbal` and keeps it). Omitting a
    * column with no default still refuses loudly (pinned in
    * GraftLogSpec). The oracle re-derives the fills as literals. */
  def graftSqlColumnDefaults(spark: SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val t = graft.sources.Staging.scratchDir("graft_defaults_") + "/cust"
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
    graft.sources.GraftLog.overwrite(cust, t)                     // v0
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN c_mktsegment " +
      "SET DEFAULT 'UNSPECIFIED'")                                // v1
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN c_acctbal " +
      "SET DEFAULT CAST(0.0 AS DOUBLE)")                          // v2
    // a narrow feed omitting BOTH defaulted columns
    graft.sources.GraftLog.append(
      cust.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          col("c_name")), t)                                      // v3
    // a feed carrying ONE of them: the supplied value wins
    graft.sources.GraftLog.append(
      cust.filter(col("c_custkey") % 10 === 3)
        .select((col("c_custkey") + 2000000).as("c_custkey"),
          col("c_name"), col("c_acctbal")), t)                    // v4
    graft.sources.GraftLog.read(spark, t)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
  }

  /** d25 — symlink-format manifest export (Delta's GENERATE +
    * `delta.compatibility.symlinkFormatManifest.enabled`): the bridge
    * to engines with NO graft-log reader. A partitioned customer table
    * exports one manifest text file per `c_mktsegment=` dir listing
    * that partition's LIVE file URIs; a DELETE then lands and the
    * post-commit hook re-exports WITHOUT an explicit GENERATE — the
    * query reads the table back exclusively THROUGH the manifest
    * (partition values reconstructed from the listed paths, one scan).
    * Freshness is pinned by the oracle itself: the deleted rows' files
    * still exist on disk (vacuum hasn't run), so a stale manifest would
    * read them back and fail the aggregate. */
  def graftSqlSymlinkManifest(spark: SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit,
      regexp_extract, round, sum, count}
    val root = graft.sources.Staging.scratchDir("graft_manifest_")
    val t = s"$root/cust"
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    graft.sources.GraftLog.overwritePartitioned(cust, t,
      Seq("c_mktsegment"))                                          // v0
    graft.sources.GraftLog.setProperties(spark, t,
      Map("graft.symlinkManifest.autoUpdate" -> "true"))            // v1
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE '$t'")
    graft.sources.GraftLog.delete(spark, t,
      col("c_custkey") % 10 === 0)                                  // v2 → hook re-exports
    // the manifest IS the table now: collect the listed URIs (metadata-
    // sized — one line per live file) and scan exactly those
    val paths = spark.read
      .textFile(s"$t/_symlink_format_manifest/*/manifest").collect()
    val nManifests = new java.io.File(s"$t/_symlink_format_manifest")
      .listFiles().count(_.isDirectory)
    val nSegs = cust.select("c_mktsegment").distinct().count().toInt
    spark.read.parquet(paths.toIndexedSeq: _*)
      .withColumn("c_mktsegment",
        regexp_extract(input_file_name(), "c_mktsegment=([^/]+)/", 1))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("c_acctbal").cast("decimal(38,10)")).cast("double"),
          6).as("total_acctbal"))
      .withColumn("manifest_per_partition", lit(nManifests == nSegs))
  }

  /** d21 — conditional & multi-clause SQL MERGE (the full Delta clause
    * surface): the reference's change-detection upsert
    * (`mage_demo/custom/increamental_dataload.py:49-53` updates only
    * rows whose values actually changed) expressed as ONE statement —
    * ordered `WHEN MATCHED AND …` clauses with first-match-wins
    * (delete-if-expired beats update-if-changed), column-level
    * `UPDATE SET c = expr`, and a trailing INSERT for novel keys.
    * Scale shape: the source broadcasts once; matched-clause conditions
    * join the touched-file probe, so files whose rows no clause changes
    * never rewrite. */
  def graftSqlMergeConditional(spark: SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    // fresh dir per call: the cascade (delete EXPIRED + insert novel)
    // is NOT idempotent over its own output — a cached dir would
    // resurrect deleted keys on a second run (d11's staging contract
    // requires idempotence; this statement's does not, so no cache)
    val dir = graft.sources.Staging.scratchDir("graft_mcond_") + "/customer"
    graft.sources.GraftLog.overwrite(
      graft.sources.Sources.testTable(spark, sfDir, "customer"), dir)
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_mcond_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
    // today's snapshot: keys %3<>0 — balances bumped where %5=0,
    // segment EXPIRED where %7=0 — plus novel keys far above the space
    val snap = cust.filter(col("c_custkey") % 3 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 500.0)
          .otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 7 === 0, lit("EXPIRED"))
          .otherwise(col("c_mktsegment")))
    val novel = cust.filter(col("c_custkey") % 100 === 2)
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
    snap.unionByName(novel)
      .createOrReplaceTempView(s"graft_mcond_src_$tag")
    spark.sql(
      s"""MERGE INTO $t AS t USING graft_mcond_src_$tag AS s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED AND s.c_mktsegment = 'EXPIRED' THEN DELETE
         |WHEN MATCHED AND s.c_acctbal <> t.c_acctbal
         |  THEN UPDATE SET c_acctbal = s.c_acctbal
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.catalog.dropTempView(s"graft_mcond_src_$tag")
    spark.table(t).select("c_custkey", "c_name",
      "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  /** d11 — SQL MERGE with the SCD close-out clause (`WHEN NOT MATCHED BY
    * SOURCE THEN DELETE`), the full-snapshot-compare pattern of the
    * reference's SCD-2 ETL (`financial_dl_etl.py:59-77`): today's
    * snapshot updates matched rows and CLOSES (here: deletes) target
    * rows absent from it. Deliberately NO `WHEN NOT MATCHED` insert
    * clause, so the source's novel keys must be ignored — pinning that
    * each clause family routes independently. Idempotent: the source
    * derives from the original parquet (not the mutated table), so
    * re-running the statement rewrites the same final state.
    *
    * Scale: delete-by-source probes files by anti-join on the broadcast
    * source keys — only files holding a to-close row rewrite; the
    * matched-update probe prunes independently (see GraftLog.mergeImpl).
    */
  def graftSqlMergeScd(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dir = stagedSqlScd.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_scd_") + "/customer"
      graft.sources.GraftLog.overwrite(
        graft.sources.Sources.testTable(spark, sfDir, "customer"), d)
      d
    })
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_scd_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
    // today's snapshot: 2/3 of the customers, re-balanced; plus novel
    // keys far above the key space (must NOT insert — no insert clause)
    val snapshot = cust.filter(col("c_custkey") % 3 =!= 0)
      .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
    val novel = cust.filter(col("c_custkey") % 100 === 1)
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
    snapshot.unionByName(novel)
      .createOrReplaceTempView(s"graft_scd_src_$tag")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING graft_scd_src_$tag AS src
         |ON tgt.c_custkey = src.c_custkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    spark.catalog.dropTempView(s"graft_scd_src_$tag")
    spark.table(t).select("c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment")
  }

  private val stagedSqlU =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d7 — SQL `UPDATE` + `DELETE FROM` text against a `USING graft`
    * table, routed to the file-pruned [[graft.sources.GraftLog.update]] /
    * `.delete` by the same extension. */
  def graftSqlUpdateDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedSqlU.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqlu_") + "/customer"
      graft.sources.GraftLog.overwrite(
        graft.sources.Sources.testTable(spark, sfDir, "customer"), d)
      d
    })
    val t = s"graft_sqlu_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    // the assignment is ABSOLUTE (not `c_acctbal + 100`), so re-running
    // the query inside a bench repetition is idempotent — the second
    // UPDATE writes the same values again
    spark.sql(
      s"""UPDATE $t SET c_acctbal = 100.0 + CAST(c_nationkey AS DOUBLE)
         |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    spark.sql(s"DELETE FROM $t WHERE c_custkey % 10 = 0")
    spark.table(t).select("c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment")
  }

  private val stagedSqlO =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d8 — SQL maintenance statements (`OPTIMIZE t FILES n`,
    * `VACUUM t RETAIN n VERSIONS`) via the injected
    * [[graft.sql.GraftSqlParser]] — the Delta SQL-surface analog for the
    * small-files problem: four append commits land four file sets, one
    * OPTIMIZE compacts them to exactly 2 files, VACUUM truncates the
    * pre-compaction versions. The read-back pins BOTH the rows and the
    * layout (n_files column, the k6 pattern). */
  def graftSqlMaintenance(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedSqlO.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqlo_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      (0 until 4).foreach { i =>
        graft.sources.GraftLog.append(
          cust.filter(org.apache.spark.sql.functions
            .col("c_custkey") % 4 === i), d)
      }
      d
    })
    val t = s"graft_sqlo_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    spark.sql(s"OPTIMIZE $t FILES 2")
    spark.sql(s"VACUUM $t RETAIN 1 VERSIONS")
    val nFiles = graft.sources.GraftLog.snapshot(spark, dir)._1.size
    spark.table(t)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("n_files", org.apache.spark.sql.functions.lit(nFiles))
  }

  private val stagedSqlExp =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d12 — wall-clock snapshot expiry: `VACUUM t RETAIN n HOURS`, the
    * time-based idiom BOTH formats ship (Delta's default VACUUM
    * retention, Iceberg's `expire_snapshots(older_than => …)`), next to
    * d8's version-count form. Three appends land three versions;
    * `RETAIN 0 HOURS` expires everything older than the live snapshot,
    * which is always pinned (`GraftLog.vacuumRetainHours` keeps ≥1).
    * The read-back pins rows AND the surviving version count, so the
    * oracle catches both an over-eager sweep (missing rows) and a
    * no-op (version count ≠ 1). Idempotent on re-run: the log is
    * already at one version and the vacuum keeps it. The cutoff
    * BOUNDARY (a commit exactly at `now - n hours` is retained) is
    * pinned with an injected clock in GraftLogSpec — wall-clock SQL
    * can't hit a millisecond boundary deterministically. */
  def graftSqlExpire(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = stagedSqlExp.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqle_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      (0 until 3).foreach { i =>
        graft.sources.GraftLog.append(
          cust.filter(col("c_custkey") % 3 === i), d)
      }
      d
    })
    val t = s"graft_sqle_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    // strict ts(latest commit) < now, so RETAIN 0 HOURS deterministically
    // retains exactly the live snapshot
    Thread.sleep(5)
    spark.sql(s"VACUUM $t RETAIN 0 HOURS")
    val nVersions = graft.sources.GraftLog.versions(spark, dir).size
    spark.table(t)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("n_versions", lit(nVersions))
  }

  private val stagedConv =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d13 — in-place table-format migration: a plain parquet directory
    * (4 part files, written by an ordinary non-transactional job)
    * becomes a graft table via `CONVERT TO GRAFT '<path>'` (Delta
    * `CONVERT TO DELTA` / Iceberg `add_files` analog, no data rewrite),
    * then immediately exercises the transactional surface it just
    * gained: a file-pruned SQL DELETE lands as commit v1. The read-back
    * pins rows AND the commit count (convert + delete = 2), so the
    * oracle catches a convert that rewrote/dropped rows and a DELETE
    * that did not commit. Staging (write → convert → delete) runs once
    * per (JVM, corpus); re-runs only read — idempotent under bench
    * repetition. */
  def graftSqlConvert(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val dir = stagedConv.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_conv_") + "/customer"
      graft.sources.Sources.testTable(spark, sfDir, "customer")
        .repartition(4).write.parquet(d)
      spark.sql(s"CONVERT TO GRAFT '$d'")                       // v0
      val tag = math.abs(sfDir.hashCode).toString.take(8)
      val t = s"graft_conv_cust_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$d')")
      spark.sql(s"DELETE FROM $t WHERE c_custkey % 7 = 0")      // v1
      d
    })
    val tag = math.abs(sfDir.hashCode).toString.take(8)
    val t = s"graft_conv_cust_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val nVersions = graft.sources.GraftLog.versions(spark, dir).size
    spark.table(t)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("n_versions", lit(nVersions))
  }

  private val stagedTags =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d14 — named refs (Iceberg tag analog) end-to-end: v0 (even
    * customers) is tagged `baseline`, v2 overwrites with the full
    * table, and a `RETAIN 1 VERSIONS` vacuum expires everything EXCEPT
    * the live snapshot and the tagged version — the expire_snapshots
    * retention contract. The read-back is `VERSION AS OF 'baseline'`
    * (the string-version read surface), with the surviving version
    * count and the live row count pinned as columns — so the oracle
    * catches a vacuum that broke the pin, a tag that resolved to the
    * wrong snapshot, and an over-retentive vacuum at once. Staging runs
    * once per (JVM, corpus); re-runs only read. */
  def graftSqlTags(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = stagedTags.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_tags_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwrite(
        cust.filter(col("c_custkey") % 2 === 0), d)            // v0
      graft.sources.GraftLog.createTag(spark, d, "baseline")   // v1 → v0
      graft.sources.GraftLog.overwrite(cust, d)                // v2
      graft.sources.GraftLog.vacuum(spark, d, 1)               // pins v0
      d
    })
    val t = s"graft_tags_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val nVersions = graft.sources.GraftLog.versions(spark, dir).size
    val latestRows = spark.table(t).count()
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'baseline'")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("latest_rows", lit(latestRows))
      .withColumn("n_versions", lit(nVersions))
  }

  private val stagedProps =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d15 — log-carried table properties (Delta's
    * `metaData.configuration`): `ALTER TABLE … SET TBLPROPERTIES` marks
    * the table append-only, a DELETE is refused loudly (the
    * `delta.appendOnly` contract), UNSET re-allows it, and the delete
    * then lands transactionally. `SHOW TBLPROPERTIES` reads the
    * configuration back through SQL. Output: the surviving rows plus
    * the property count after UNSET and the commit count — the oracle
    * proves the blocked delete removed nothing and the allowed one
    * removed exactly its match set.
    *
    * Scale: properties ride the commit the same way constraints do —
    * one small-JSON read resolves them, no replay, no data scan; the
    * appendOnly check adds one metadata read to each DML entry. */
  def graftSqlProperties(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = stagedProps.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_props_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwrite(cust, d)                // v0
      graft.sources.GraftLog.setProperties(spark, d,
        Map("graft.appendOnly" -> "true", "team" -> "curation")) // v1
      // the blocked attempt: if the guard ever fails to fire, these
      // rows vanish and the oracle's row set catches it
      try {
        graft.sources.GraftLog.delete(spark, d, col("c_custkey") % 10 === 0)
        throw new IllegalStateException(
          "appendOnly guard did not fire on DELETE")
      } catch { case _: UnsupportedOperationException => () }
      graft.sources.GraftLog.unsetProperties(spark, d,
        Seq("graft.appendOnly"))                               // v2
      graft.sources.GraftLog.delete(spark, d,
        col("c_custkey") % 10 === 0)                           // v3
      d
    })
    val t = s"graft_props_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val nProps = spark.sql(s"SHOW TBLPROPERTIES $t").count()
    val nVersions = graft.sources.GraftLog.versions(spark, dir).size
    spark.table(t)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("n_props", lit(nProps))
      .withColumn("n_versions", lit(nVersions))
  }

  private val stagedSqlInsert =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d16 — SQL `INSERT INTO … SELECT` / `INSERT OVERWRITE` on a
    * `USING graft` catalog table, routed through the COMMIT LOG (the
    * InsertableRelation path): the even-key half is seeded as v0, an
    * `INSERT INTO … SELECT` appends the odd half (v1), an
    * `INSERT OVERWRITE` replaces everything with the low-key slice
    * (v2), and a second `INSERT INTO` proves the statement sequence
    * keeps committing (v3) — the failure this pins is Spark's raw
    * InsertIntoHadoopFsRelationCommand fallback, which writes files no
    * commit references and truncates the directory (log included) on
    * overwrite. Every version stays time-travelable.
    *
    * Scale: each statement is one staged write + one put-if-absent
    * commit — identical dataflow to the programmatic append/overwrite
    * (same staging, stats, OCC), so the SQL surface inherits their
    * 100 TB behavior unchanged. */
  def graftSqlInsert(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val t = s"graft_ins_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    val dir = stagedSqlInsert.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqlins_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwrite(
        cust.filter(col("c_custkey") % 2 === 0), d)              // v0
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$d')")
      cust.filter(col("c_custkey") % 2 === 1)
        .createOrReplaceTempView("graft_ins_odd")
      spark.sql(s"INSERT INTO $t SELECT * FROM graft_ins_odd")   // v1
      cust.filter(col("c_custkey") <= 500)
        .createOrReplaceTempView("graft_ins_low")
      spark.sql(s"INSERT OVERWRITE $t SELECT * FROM graft_ins_low") // v2
      cust.filter(col("c_custkey") > 500 && col("c_custkey") <= 600)
        .createOrReplaceTempView("graft_ins_mid")
      spark.sql(s"INSERT INTO $t SELECT * FROM graft_ins_mid")   // v3
      // temp views appear in every database's SHOW TABLES — drop them
      // so the d3 lifecycle listing stays exact
      Seq("graft_ins_odd", "graft_ins_low", "graft_ins_mid")
        .foreach(spark.catalog.dropTempView(_))
      d
    })
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val nVersions = graft.sources.GraftLog.versions(spark, dir).size
    val v1Rows = graft.sources.GraftLog.readVersion(spark, dir, 1L).count()
    spark.table(t)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("v1_rows", lit(v1Rows))
      .withColumn("n_versions", lit(nVersions))
  }

  private val stagedAnalyze =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d17 — `ANALYZE TABLE … COMPUTE STATISTICS` WITHOUT a table scan:
    * rowCount folds from the commit log's per-file numRecords stats
    * and byte size from the logged file sizes; only the DV position
    * sidecar (orders of magnitude smaller than data) is read, so the
    * VISIBLE row count is exact after a merge-on-read delete. The
    * numbers land as `graft.stats.*` properties via one metadata-only
    * commit (readable by SHOW TBLPROPERTIES / any join planner). The
    * oracle pins the visible rowCount and the row set; bytes are
    * codec-dependent so only their positivity is pinned.
    *
    * Scale: at 100 TB this is a metadata walk (the stats rode each
    * write) — the alternative is re-scanning the lake to count it. */
  def graftSqlAnalyze(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = stagedAnalyze.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_analyze_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwrite(cust, d)                   // v0
      graft.sources.GraftLog.deleteVectors(spark, d,
        col("c_custkey") % 10 === 0)                              // v1
      d
    })
    // path target: a catalog CREATE TABLE would resolve the relation
    // through the FileIndex, which refuses DV-bearing tables (loud
    // over wrong); ANALYZE itself is pure log metadata either way
    val res =
      spark.sql(s"ANALYZE TABLE '$dir' COMPUTE STATISTICS").head
    val (rows, bytes) = (res.getLong(0), res.getLong(1))
    val props = graft.sources.GraftLog.properties(spark, dir)
    // merge-on-read: active DV masks apply via the library read (the
    // FileIndex path refuses DV tables by design — loud over wrong)
    graft.sources.GraftLog.read(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("stat_rows", lit(rows))
      .withColumn("stat_rows_prop",
        lit(props("graft.stats.rowCount").toLong))
      .withColumn("bytes_positive", lit(bytes > 0))
  }

  private val stagedMetaTables =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d18 — the METADATA TABLES ops surface: `SHOW PARTITIONS` (the
    * planner's pruning domain made visible) and the `files` metadata
    * read (`option("metadata","files")` — Iceberg's `t.files`): one
    * row per live file with log-carried size/rows/partition/stats,
    * ZERO data files opened. The oracle pins the partition-spec count
    * against the data's distinct partition values and the metadata
    * table's row-count SUM against the actual table count — the
    * metadata surface must agree exactly with the data it describes.
    *
    * Scale: both are commit-log folds — managing a 100 TB table
    * (which partitions are small-file-heavy, what OPTIMIZE should
    * target) costs metadata reads, not scans. */
  def graftMetadataTables(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, sum}
    val dir = stagedMetaTables.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_meta_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwritePartitioned(cust, d,
        Seq("c_mktsegment"))
      d
    })
    val nParts = spark.sql(s"SHOW PARTITIONS '$dir'").count().toInt
    val meta = spark.read.format("graft")
      .option("metadata", "files").load(dir)
      .transform(graft.CacheScope.tracked)
    val metaRows = meta.agg(sum(col("num_records"))).head.getLong(0)
    val sizesOk = meta.filter(col("size_bytes") <= 0).count() == 0
    graft.sources.GraftLog.read(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("n_partitions", lit(nParts))
      .withColumn("meta_rows", lit(metaRows))
      .withColumn("sizes_ok", lit(sizesOk))
  }

  private val stagedTruncate =
    new scala.collection.concurrent.TrieMap[String, (String, Long)]

  /** d19 — the MANAGED-table SQL lifecycle with a log-backed TRUNCATE:
    * CTAS creates a managed graft table (v0), `TRUNCATE TABLE` lands
    * as a metadata-only remove-all COMMIT (v1 — Spark's own command
    * would delete the warehouse dir's contents, commit log included),
    * and an `INSERT INTO … SELECT` refills a slice (v2). The pinned
    * outputs: the refilled row set, the pre-truncate snapshot still
    * time-travelable (`v0_rows`), and the three-commit history — the
    * whole statement sequence must have routed through the log.
    *
    * Scale: TRUNCATE is O(1) metadata (file references removed, bytes
    * reclaimed later by vacuum) — on a 100 TB table the alternative
    * recursive delete is both unrecoverable and hours long. */
  def graftSqlTruncate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val t = s"graft_trunc_${math.abs(sfDir.hashCode).toString.take(8)}"
    val (loc, v0Rows) = stagedTruncate.getOrElseUpdate(sfDir, {
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      spark.sql(s"DROP TABLE IF EXISTS default.$t")
      purgeManagedLocation(spark, t)
      cust.createOrReplaceTempView("graft_trunc_src")
      spark.sql(s"CREATE TABLE default.$t USING graft AS " +
        "SELECT * FROM graft_trunc_src")                        // v0
      val d = spark.sql(s"DESCRIBE EXTENDED default.$t").collect()
        .find(_.getString(0) == "Location").map(_.getString(1)).get
      spark.sql(s"TRUNCATE TABLE default.$t")                   // v1
      spark.sql(s"INSERT INTO default.$t " +
        "SELECT * FROM graft_trunc_src WHERE c_custkey <= 500") // v2
      spark.catalog.dropTempView("graft_trunc_src")
      (d, graft.sources.GraftLog.readVersion(spark, d, 0L).count())
    })
    graft.sources.GraftLog.read(spark, loc)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .withColumn("v0_rows", lit(v0Rows))
      .withColumn("n_versions",
        lit(graft.sources.GraftLog.versions(spark, loc).size))
  }

  private val stagedSqlTT =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d9 — SQL time travel + history over a `USING graft` table: the
    * Delta read surface the reference's session factory enables
    * (`spark_session_factory.py:70`) — `VERSION AS OF n` resolves via
    * the parse-time substitution in [[graft.sql.GraftTimeTravel]],
    * `TIMESTAMP AS OF` picks the latest commit at-or-before the given
    * instant, and `DESCRIBE HISTORY` lists one row per commit. Output:
    * version 0's rows, plus the latest row count (probed through a
    * future-dated TIMESTAMP AS OF) and the commit count — so the oracle
    * checks all three text surfaces at once. */
  def graftSqlTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = stagedSqlTT.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqltt_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwrite(
        cust.filter(col("c_custkey") % 2 === 0), d)            // v0
      graft.sources.GraftLog.append(
        cust.filter(col("c_custkey") % 2 === 1), d)            // v1
      d
    })
    val t = s"graft_tt_cust_${math.abs(sfDir.hashCode).toString.take(8)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$dir')")
    val latestRows = spark.sql(
      s"SELECT count(*) AS n FROM $t TIMESTAMP AS OF '2099-01-01'")
      .head.getLong(0)
    val nCommits = spark.sql(s"DESCRIBE HISTORY $t").count()
    spark.sql(s"SELECT c_custkey, c_name, c_acctbal FROM $t VERSION AS OF 0")
      .withColumn("latest_rows", lit(latestRows))
      .withColumn("n_commits", lit(nCommits))
  }

  private val stagedSqlCk =
    new scala.collection.concurrent.TrieMap[String, (String, Int)]

  /** d10 — CHECK / NOT NULL constraints via the SQL text surface
    * (Delta's `ALTER TABLE … ADD CONSTRAINT` contract): the constraint
    * lands in the commit log after a one-scan validation of existing
    * rows; every subsequent write validates the rows it writes in ONE
    * batch-sized aggregation pass (never a table scan). A violating
    * append is rejected whole — the count of rejected batches and the
    * constraint count are pinned as columns; the oracle re-derives the
    * surviving rows by applying the same predicates relationally. */
  def graftSqlConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (dir, nRejected) = stagedSqlCk.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_sqlck_") + "/customer"
      val cust = graft.sources.Sources.testTable(spark, sfDir, "customer")
      graft.sources.GraftLog.overwrite(cust, d)                    // v0
      spark.sql(s"ALTER TABLE '$d' ADD CONSTRAINT acct_floor " +
        "CHECK (c_acctbal >= -1000.0)")                            // v1
      spark.sql(s"ALTER TABLE '$d' ALTER COLUMN c_name SET NOT NULL") // v2
      // a violating batch is rejected WHOLE; the table is unchanged
      val bad = cust.limit(1).select(
        (col("c_custkey") + 900000L).as("c_custkey"), col("c_name"),
        col("c_nationkey"),
        lit(BigDecimal(-99999)).cast(cust.schema("c_acctbal").dataType)
          .as("c_acctbal"),
        col("c_mktsegment"))
      val rejected =
        try { graft.sources.GraftLog.append(bad, d); 0 }
        catch { case _: IllegalArgumentException => 1 }
      // the valid slice of the incremental insert batch lands
      val inserts = Incremental.incrementalBatch(spark, sfDir).select(
          col("inc_custkey").as("c_custkey"),
          col("inc_name").as("c_name"),
          col("inc_nationkey").as("c_nationkey"),
          col("inc_acctbal").as("c_acctbal"),
          col("inc_mktsegment").as("c_mktsegment"))
        .join(cust.select("c_custkey"), Seq("c_custkey"), "left_anti")
        .filter(col("c_acctbal") >= -1000.0 && col("c_name").isNotNull)
      graft.sources.GraftLog.append(inserts, d)                    // v3
      (d, rejected)
    })
    val nChecks =
      graft.sources.GraftLog.checkConstraints(spark, dir).size
    graft.sources.GraftLog.read(spark, dir)
      .withColumn("n_constraints", lit(nChecks))
      .withColumn("n_rejected", lit(nRejected))
  }

  /** K4 round-trip: DataFrameWriterV2 `createOrReplace` + catalog scan. */
  def writeToRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    createDatabase(spark, "graft_lake")
    graft.sources.Sinks.createOrReplace(
      Medallion.silverMarketTrend(spark, sfDir),
      "graft_lake.silver_market_trend")
    spark.table("graft_lake.silver_market_trend")
  }

  /** Driver-visible bucketed-layout round-trip: both fact tables written
    * `bucketBy(8, key)` + sorted, then joined and aggregated. Values must
    * survive the bucketed write bit-exactly (the plain-join oracle checks
    * that); the zero-exchange JOIN PLAN the layout buys is pinned
    * separately in ScaleJoinSpec — here AQE is free to broadcast at this
    * tiny scale. */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.Deterministic.sumExact
    createDatabase(spark, "graft_lake")
    graft.sources.Sinks.bucketed(
      graft.sources.Sources.testTable(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")),
      "graft_lake.lineitem_bucketed", Seq("l_orderkey"), 8)
    graft.sources.Sinks.bucketed(
      graft.sources.Sources.testTable(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
      "graft_lake.orders_bucketed", Seq("o_orderkey"), 8)
    spark.table("graft_lake.lineitem_bucketed")
      .join(spark.table("graft_lake.orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sumExact(col("l_quantity")).cast("double"), 6)
          .as("total_qty"))
  }

  /** Driver-visible D1-D4 lifecycle: create database, create two tables
    * (one PARTITIONED BY — the `financial_dl_bronze.py:14-29` shape), drop
    * one, SHOW TABLES. The surviving catalog row is a literal, so the
    * oracle is a constant SELECT. `sfDir` is unused — the query is pure
    * DDL — but kept for the uniform driver signature. */
  def ddlLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    createDatabase(spark, "graft_ddl_q")
    dropTable(spark, "graft_ddl_q.quotes_part")
    dropTable(spark, "graft_ddl_q.docs_tmp")
    // USE makes the rest of the lifecycle run unqualified, like the
    // reference's `USE airbnb` session flow — the ENTRY database is
    // restored afterwards so the shared session's resolution doesn't
    // leak across queries
    val entryDb = spark.catalog.currentDatabase
    useDatabase(spark, "graft_ddl_q")
    try {
      createTable(spark, "quotes_part",
        "trade_date DATE, ticker STRING, price DOUBLE",
        partitionBy = Seq("ticker"))
      createTable(spark, "docs_tmp", "doc_id BIGINT, text STRING")
      dropTable(spark, "docs_tmp")
      showTables(spark)
    } finally useDatabase(spark, entryDb)
  }
}
