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

  // one CSV staging dir per (corpus, table) per JVM — repeated Bench/
  // Verify/spec invocations overwrite in place instead of leaking a fresh
  // /tmp copy per call
  private val csvStage =
    new scala.collection.concurrent.TrieMap[(String, String), String]
  private def stageDir(sfDir: String, table: String): String =
    csvStage.getOrElseUpdate((sfDir, table), java.nio.file.Files
      .createTempDirectory("graft_csv_").toString + s"/$table")

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
