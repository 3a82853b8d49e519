package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Scan-side operators (SURVEY.md §2.1, S1–S7).
  *
  * The reference reads CSVs three ways — inferred schema
  * (`custom/delta_table_write.py:53`), explicit `StructType`
  * (`financial_dl_etl.py:19-30`), and a per-file directory loop
  * (`custom/delta_table_write.py:49-51`) — plus Delta/catalog scans and
  * literal-row frames (`increamental_dataload.py:25-31`).
  *
  * Scale note: S7's one-Spark-job-per-file loop is an anti-pattern at 100 TB
  * (job-submission overhead per file, no cross-file parallelism). We keep it
  * for parity but [[csvDir]] is the scale path: one multi-file scan whose
  * splits parallelize across the cluster.
  */
object Sources {

  /** S1 — CSV scan with schema inference (two passes over the data: one
    * sampling job for inference, one for the read; at scale prefer S2). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S2 — CSV scan with a declared schema (single pass; the scale path). */
  def csvDeclared(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S7 (scale form) — one scan over every CSV in a directory. Spark's file
    * index lists the dir once; splits parallelize across executors. */
  def csvDir(spark: SparkSession, dir: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(dir)
  }

  /** S3 — format scan by path, degrading delta→parquet when the Delta runtime
    * is absent (SURVEY.md §7.4). Delta tables store their data as parquet, so
    * the fallback reads the current files (without time travel). */
  def load(spark: SparkSession, path: String, format: String = "parquet"): DataFrame = {
    val fmt = if (format == "delta" &&
      !graft.sessions.Sessions.formatAvailable(graft.sessions.Sessions.DeltaLake))
      "parquet" else format
    spark.read.format(fmt).load(path)
  }

  /** S4/S5 — catalog table scan (`spark.table("db.tbl")`). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** S6 — local-collection source with a declared schema, the literal-row
    * fixture pattern of `increamental_dataload.py:25-45`. */
  def fromRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  /** Driver-testdata helper: one parquet file per table under sfDir. */
  def testTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize an event-time column to a canonical µs TIMESTAMP,
    * dispatching on the PHYSICAL type the scan produced rather than
    * assuming one encoding. The testdata has shipped `events.ts` two
    * ways across corpus refreshes — INT64 TIMESTAMP(NANOS), which Spark 4
    * only reads as a raw long (`spark.sql.legacy.parquet.nanosAsLong`,
    * see Sessions.builder), and plain `timestamp[us]`, which it reads as
    * TIMESTAMP_NTZ — and a production engine must not hard-code either.
    *
    *  - LongType: raw nanos → FLOOR-divide to µs (`div` alone truncates
    *    toward zero, diverging from DuckDB's ns→µs coercion for pre-1970
    *    values; subtracting `pmod` first makes the quotient floor for
    *    any sign).
    *  - TimestampNTZType: already µs — cast to session-TZ TimestampType
    *    (micros-identity under the UTC session TZ we pin) so downstream
    *    code sees one type regardless of encoding.
    *  - TimestampType: pass through.
    *  - anything else: fail loudly naming the drifted column and type,
    *    instead of 21 scattered analysis errors downstream.
    */
  def normalizeEventTs(df: DataFrame, column: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(column).dataType match {
      case LongType =>
        df.withColumn(column,
          expr(s"timestamp_micros(($column - pmod($column, 1000)) div 1000)"))
      case TimestampNTZType =>
        df.withColumn(column, col(column).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.$column: expected INT64 nanos, TIMESTAMP or TIMESTAMP_NTZ " +
          s"but the scan produced $other — testdata schema drifted; " +
          "extend Sources.normalizeEventTs for the new encoding")
    }
  }

  // one staging dir per (corpus, table) per JVM, shutdown-cleaned — see
  // graft.sources.Staging
  private def stageDir(sfDir: String, table: String): String =
    Staging.dir(sfDir, table, "graft_csv_")

  /** Driver-visible S1 round-trip: `nation` → CSV (header) → inferred-schema
    * scan, types normalized back to the parquet schema. CSV text survives
    * quoting and doubles round-trip through Java's toString/parse exactly,
    * so the result carries the plain `SELECT * FROM nation` oracle. */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dir = stageDir(sfDir, "nation")
    testTable(spark, sfDir, "nation")
      .write.mode("overwrite").option("header", "true").csv(dir)
    csvInferred(spark, dir)
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
  }

  /** Driver-visible JSONL round-trip — JSON-lines is THE training-data
    * interchange format, so the library proves documents survive it
    * verbatim: write (doc_id, lang, text) as JSONL, scan back with a
    * DECLARED schema (one pass; inference would cost a second). JSON
    * string escaping round-trips unicode and quotes exactly, so the
    * plain `SELECT` oracle applies. */
  def jsonlRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stageDir(sfDir, "documents_jsonl")
    testTable(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
      .write.mode("overwrite").json(dir)
    spark.read.schema(StructType.fromDDL(
        "doc_id LONG, lang STRING, text STRING"))
      .json(dir)
  }

  /** Driver-visible ORC round-trip (the third columnar format next to
    * parquet and the CSV/JSONL text forms): `part` through ORC verbatim.
    * ORC stores the same logical types, so values survive bit-exactly
    * and the plain `SELECT` oracle applies. */
  def orcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stageDir(sfDir, "part_orc")
    testTable(spark, sfDir, "part")
      .write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
  }

  /** Driver-visible S3 — format scan by path with the delta→parquet
    * degradation (ref `custom/delta_table_read.py:31`:
    * `spark.read.format("delta").load(path)`): `supplier` staged as the
    * table's data files, then read back through [[load]] with
    * format="delta", which feature-detects the absent Delta runtime and
    * resolves to the parquet reader over the same files. */
  def formatPathRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Staging.dir(sfDir, "supplier_s3")
    testTable(spark, sfDir, "supplier").write.mode("overwrite").parquet(dir)
    load(spark, dir, "delta")
  }

  /** Driver-visible S5 — the reference's session-factory dispatch
    * (`utils/spark_session_factory.py:83-89`) for the delta and iceberg
    * profiles: each profile's session is requested through
    * [[graft.sessions.Sessions.get]], feature detection degrades to the
    * parquet lakehouse when the format runtime is absent (this
    * environment ships neither jar set), and the same `nation` rows must
    * come back either way. The requested profile and the effective format
    * are surfaced as columns so the oracle pins the degradation decision
    * itself, not just the row set. */
  def profileFallback(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import graft.sessions.Sessions
    Seq(Sessions.DeltaLake, Sessions.IcebergLake)
      .map { p =>
        val s = Sessions.get(p.name, appName = "graft-profile")
        val eff = if (Sessions.formatAvailable(p)) p.name else "parquet"
        testTable(s, sfDir, "nation")
          .withColumn("requested_profile", lit(p.name))
          .withColumn("effective_format", lit(eff))
      }.reduce(_ unionByName _)
  }

  private val AvroFormatClass = "org.apache.spark.sql.avro.AvroFileFormat"

  /** True when the Avro file format is usable. Spark 4 bundles the
    * implementation classes in spark-sql, but only the external
    * spark-avro module registers the "avro" SHORT name — so availability
    * is the class, and [[avroRoundTrip]] addresses the source by its
    * fully-qualified class name (which `DataSource.lookupDataSource`
    * resolves directly, registration or not). */
  def avroAvailable: Boolean =
    try { Class.forName(AvroFormatClass); true }
    catch { case _: Throwable => false }

  /** Driver-visible S10 — Avro interchange round-trip (the reference
    * declares avro interchange deps: `mage_demo/requirements.txt:5,7`).
    * Feature-detected like Delta: with the Avro classes present the
    * `supplier` table REALLY rides Avro (row-oriented container files on
    * disk); absent, the round-trip degrades to parquet. Either way the
    * surfaced column says which, and the oracle pins it. */
  def avroRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (fmt, label) =
      if (avroAvailable) (AvroFormatClass, "avro") else ("parquet", "parquet")
    val dir = Staging.dir(sfDir, "supplier_avro")
    testTable(spark, sfDir, "supplier")
      .write.mode("overwrite").format(fmt).save(dir)
    spark.read.format(fmt).load(dir)
      .withColumn("interchange_format", lit(label))
  }

  /** Driver-visible S7 (scale form) + S2: `customer` split across 4 CSV
    * part-files, one declared-schema directory scan, aggregated per market
    * segment. The aggregate (exact decimal sum → double) proves the
    * multi-file scan saw every row bit-exactly. */
  def csvDirAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = stageDir(sfDir, "customer")
    testTable(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .repartition(4)
      .write.mode("overwrite").option("header", "true").csv(dir)
    csvDir(spark, dir, Some(StructType.fromDDL(
      "c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(graft.functions.Deterministic.sumExact(col("c_acctbal"))
          .cast("double"), 6).as("total_bal"))
  }
}
