package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink operators (SURVEY.md §2.2, K1-K6).
  *
  * The reference writes Delta by path with `overwrite` + schema-evolution
  * options (`custom/delta_table_write.py:72-75`, `financial_dl_etl.py:66,81,99`,
  * `delta_datalake.py:74`) and Iceberg via `writeTo(...).createOrReplace()`
  * (`custom/iceberg_demo_write.py:74-75`). Every writer here feature-detects
  * the requested format and degrades to parquet (SURVEY.md §7.4); the
  * schema-evolution options are only attached when the format understands
  * them (they are Delta writer options, not parquet ones).
  *
  * Scale notes:
  *   - [[singleFile]] (`coalesce(1)`, `increamental_dataload.py:73`) is kept
  *     for parity but is an anti-pattern beyond MB-scale output: one task
  *     writes everything. [[partitioned]] is the scale path — partition
  *     column cardinality, not file count, drives parallelism.
  *   - Overwrites of partitioned tables should use dynamic partition
  *     overwrite ([[overwritePartitions]]) so one late partition's rewrite
  *     doesn't truncate the whole table.
  */
object Sinks {

  private def resolve(format: String): String =
    if (format == "delta" && !graft.sessions.Sessions.formatAvailable(
      graft.sessions.Sessions.DeltaLake)) "parquet"
    else if (format == "iceberg" && !graft.sessions.Sessions.formatAvailable(
      graft.sessions.Sessions.IcebergLake)) "parquet"
    else format

  /** K1 — overwrite by path. */
  def overwrite(df: DataFrame, path: String, format: String = "delta"): Unit =
    df.write.format(resolve(format)).mode(SaveMode.Overwrite).save(path)

  /** K2 — overwrite + additive schema merge (`mergeSchema`,
    * `financial_dl_etl.py:66`). Delta's semantics: the DATA is replaced,
    * the SCHEMA becomes the union — columns that exist only in the old
    * table survive in the schema and are NULL for the new rows. On the
    * parquet fallback the same contract is implemented directly: read the
    * existing footer schema (metadata-only, no data scan), extend `df`
    * with typed nulls for the columns it lacks, then overwrite. Columns
    * sharing a name keep `df`'s type (Delta would attempt an upcast;
    * flagged here as the documented divergence). */
  def overwriteMergeSchema(df: DataFrame, path: String,
      format: String = "delta"): Unit = {
    val fmt = resolve(format)
    if (fmt == "delta") {
      df.write.format(fmt).mode(SaveMode.Overwrite)
        .option("mergeSchema", "true").save(path)
    } else {
      val spark = df.sparkSession
      val existing =
        try Some(spark.read.format(fmt).load(path).schema)
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      val dfCols = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val merged = existing match {
        case Some(old) =>
          old.fields
            .filterNot(f =>
              dfCols.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
            .foldLeft(df)((d, f) =>
              d.withColumn(f.name,
                org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
        case None => df
      }
      merged.write.format(fmt).mode(SaveMode.Overwrite).save(path)
    }
  }

  /** K3 — overwrite + full schema replacement (`overwriteSchema`,
    * `delta_datalake.py:73`). Parquet's plain overwrite already replaces
    * the schema wholesale, so the fallback is the unoptioned write — the
    * option only exists to lift Delta's schema-enforcement guard. */
  def overwriteNewSchema(df: DataFrame, path: String,
      format: String = "delta"): Unit = {
    val fmt = resolve(format)
    val w = df.write.format(fmt).mode(SaveMode.Overwrite)
    (if (fmt == "delta") w.option("overwriteSchema", "true") else w).save(path)
  }

  /** K4 — DataFrameWriterV2 create-or-replace into the catalog
    * (`custom/iceberg_demo_write.py:74-75`). The built-in V2 session catalog
    * does not stage REPLACE TABLE AS SELECT, so absent a real V2 catalog
    * (Iceberg/Delta) this degrades to drop + CTAS with the same visible
    * semantics. */
  def createOrReplace(df: DataFrame, table: String,
      format: String = "parquet"): Unit = {
    val fmt = resolve(format)
    val spark = df.sparkSession
    // The built-in V2 session catalog can never stage REPLACE TABLE AS
    // SELECT, so `writeTo(...).createOrReplace()` would throw on EVERY call
    // — detect it up front and go straight to DROP + CTAS rather than
    // paying an exception-driven double catalog round-trip per write.
    val catalogName =
      if (table.count(_ == '.') >= 2) table.takeWhile(_ != '.')
      else spark.catalog.currentCatalog()
    val builtinSession = catalogName == "spark_catalog" &&
      spark.conf.getOption("spark.sql.catalog.spark_catalog").isEmpty
    if (builtinSession) dropThenCtas(df, table, fmt)
    else {
      try df.writeTo(table).using(fmt).createOrReplace()
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          dropThenCtas(df, table, fmt)
      }
    }
  }

  private def dropThenCtas(df: DataFrame, table: String, fmt: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    graft.operators.Ddl.purgeManagedLocation(df.sparkSession, table)
    df.write.format(fmt).saveAsTable(table)
  }

  /** K5 — `saveAsTable` overwrite into the catalog. */
  def saveAsTable(df: DataFrame, table: String,
      format: String = "parquet"): Unit =
    df.write.format(resolve(format)).mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** K6 — single-output-file write (parity only; see scale note above). */
  def singleFile(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.coalesce(1).write.format(resolve(format))
      .mode(SaveMode.Overwrite).save(path)

  /** Driver-visible K2 — `mergeSchema` overwrite round-trip (ref
    * `financial_dl_etl.py:66,81,99`): v0 carries
    * (s_suppkey, s_name, s_acctbal); the merge-schema overwrite replaces
    * the DATA with (s_suppkey, s_nationkey) while the schema becomes the
    * union — the old-only columns survive as typed NULLs for every new
    * row, which is exactly what the read-back must show. */
  def mergeSchemaRoundTrip(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val dir = Staging.dir(sfDir, "supplier_k2")
    val sup = Sources.testTable(spark, sfDir, "supplier")
    overwrite(sup.select("s_suppkey", "s_name", "s_acctbal"), dir)
    overwriteMergeSchema(sup.select("s_suppkey", "s_nationkey"), dir)
    Sources.load(spark, dir)
  }

  /** Driver-visible K3 — `overwriteSchema` round-trip (ref
    * `delta_datalake.py:74`): seed with the full `supplier`, then
    * overwrite with a renamed/derived projection under the
    * schema-replacement contract; the read-back must carry ONLY the new
    * schema. */
  def overwriteSchemaRoundTrip(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val dir = Staging.dir(sfDir, "supplier_k3")
    val sup = Sources.testTable(spark, sfDir, "supplier")
    overwrite(sup, dir)
    overwriteNewSchema(
      sup.selectExpr("s_suppkey AS supp_id", "upper(s_name) AS supp_name"),
      dir)
    Sources.load(spark, dir)
  }

  /** Driver-visible K6 — `coalesce(1)` single-file write (ref
    * `increamental_dataload.py:73`). The read-back carries the actual
    * part-file count, so the oracle pins n_files = 1 — the layout
    * contract, not just the row set. (Parity only; see the scale note in
    * the object doc.) */
  def singleFileRoundTrip(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val dir = Staging.dir(sfDir, "region_k6")
    singleFile(Sources.testTable(spark, sfDir, "region"), dir)
    val n = Option(new java.io.File(dir)
        .listFiles((_, nm) => nm.startsWith("part-")))
      .fold(0)(_.length)
    spark.read.parquet(dir).withColumn("n_files", lit(n))
  }

  /** Scale path: partition-pruned layout (`PARTITIONED BY (Date)` analog,
    * `financial_dl_bronze.py:26`). */
  def partitioned(df: DataFrame, path: String, cols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.format(resolve(format)).mode(SaveMode.Overwrite)
      .partitionBy(cols: _*).save(path)

  /** Bucketed managed table: pre-shuffles the data into `numBuckets` by
    * `bucketCols` at write time so later equi-joins/aggregations on those
    * columns run with NO exchange — the layout investment that pays for
    * itself on every downstream fact-fact join at scale. (Bucketing only
    * exists for catalog tables; path-based writes can't carry the bucket
    * spec.) */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, format: String = "parquet"): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    graft.operators.Ddl.purgeManagedLocation(df.sparkSession, table)
    df.write.format(resolve(format))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Dynamic partition overwrite: replaces only the partitions present in
    * `df`, the idiom for incremental re-loads of a partitioned lake table. */
  def overwritePartitions(df: DataFrame, path: String, cols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.format(resolve(format)).mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).save(path)
}
