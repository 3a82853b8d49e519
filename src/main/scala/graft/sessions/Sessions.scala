package graft.sessions

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Re-expresses the reference's session-factory pattern
  * (`mage_demo/utils/spark_session_factory.py:6-89` — an ABC with Delta and
  * Iceberg concrete builders plus a `get_spark_session(type)` dispatcher) as a
  * single Scala builder object with named profiles.
  *
  * Deliberate semantic pins (see SURVEY.md §4, §7.4):
  *   - `spark.sql.ansi.enabled=false`: the reference ran Spark 3.4 with ANSI
  *     explicitly off (`financial_dl_etl.py:13`); Spark 4 defaults it ON, which
  *     changes DECIMAL overflow/cast behavior from silent-null to error. Parity
  *     requires the reference's silent-null semantics.
  *   - UTC session timezone: keeps date/timestamp functions stable against the
  *     DuckDB oracle regardless of host TZ.
  *   - `spark.sql.shuffle.partitions` sized to cores, not the 200 default:
  *     local[32] with 200 partitions means tiny shuffle blocks and scheduler
  *     overhead. On a real cluster this knob is sized to ~2-3× total cores (or
  *     left to AQE coalescing, which we enable).
  *   - AQE on: runtime shuffle-partition coalescing + skew-join splitting are
  *     the first line of defense at 100 TB where static tuning is impossible.
  */
object Sessions {

  sealed trait Profile { def name: String }
  /** Plain parquet lakehouse (the test/bench profile). */
  case object ParquetLake extends Profile { val name = "parquet" }
  /** Delta-format profile — only valid when delta jars are on the classpath.
    * Mirrors `DeltaSparkSession` (`spark_session_factory.py:53-81`). */
  case object DeltaLake extends Profile { val name = "delta" }
  /** Iceberg-format profile — only valid when iceberg jars are present.
    * Mirrors `IcebergSparkSession` (`spark_session_factory.py:16-51`). */
  case object IcebergLake extends Profile { val name = "iceberg" }

  /** True when the given table-format runtime is actually on the classpath. */
  def formatAvailable(profile: Profile): Boolean = profile match {
    case ParquetLake => true
    case DeltaLake   => classpathHas("io.delta.sql.DeltaSparkSessionExtension")
    case IcebergLake => classpathHas(
      "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
  }

  private def classpathHas(cls: String): Boolean =
    try { Class.forName(cls); true } catch { case _: Throwable => false }

  def builder(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int =
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      profile: Profile = ParquetLake): SparkSession.Builder = {
    var b = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // 128m file-split target: at 100 TB this yields ~800k input splits,
      // which a 1000-executor cluster digests without straggler-sized tasks.
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      // Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet (PARQUET_TYPE_ILLEGAL)
      // — read as raw nanos longs; graft.streaming converts to μs timestamps
      // (same truncation DuckDB applies reading TIMESTAMP_NS).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // graft's own session extension: SQL MERGE/UPDATE/DELETE text routed
    // to the transactional commit log (the Delta extension line of
    // `spark_session_factory.py:70`, for the graft format)
    val graftExt = "graft.sql.GraftSparkSessionExtension"
    profile match {
      case DeltaLake if formatAvailable(DeltaLake) =>
        b = b
          .config("spark.sql.extensions",
            s"io.delta.sql.DeltaSparkSessionExtension,$graftExt")
          .config("spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog")
      case IcebergLake if formatAvailable(IcebergLake) =>
        b = b
          .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions." +
              s"IcebergSparkSessionExtensions,$graftExt")
          .config("spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog")
          .config("spark.sql.catalog.local.type", "hadoop")
      case _ => // ParquetLake or requested format unavailable → plain parquet
        b = b.config("spark.sql.extensions", graftExt)
    }
    b
  }

  /** Object-store seam: the reference writes everything to `s3a://` with
    * endpoint/credential config and output-committer tuning
    * (`delta_datalake.py:19-26`, `spark_session_factory.py:74-81`,
    * hardcoded there; env-driven here so secrets never live in code).
    * Applying this makes every path-taking operator in the library work
    * unchanged against an S3-compatible store — paths are plain Hadoop FS
    * URIs throughout, nothing assumes the local filesystem. No-op when
    * `endpoint` is None (the sandbox case: no store to reach). */
  def withObjectStore(
      b: SparkSession.Builder,
      endpoint: Option[String] = sys.env.get("GRAFT_S3_ENDPOINT"),
      accessKey: Option[String] = sys.env.get("GRAFT_S3_ACCESS_KEY"),
      secretKey: Option[String] = sys.env.get("GRAFT_S3_SECRET_KEY"),
      sslEnabled: Boolean = sys.env.get("GRAFT_S3_SSL")
        .forall(v => v.equalsIgnoreCase("true") || v == "1")): SparkSession.Builder =
    endpoint.fold(b) { ep =>
      var c = b
        .config("spark.hadoop.fs.s3a.endpoint", ep)
        .config("spark.hadoop.fs.s3a.path.style.access", "true")
        .config("spark.hadoop.fs.s3a.connection.ssl.enabled",
          sslEnabled.toString)
        .config("spark.hadoop.fs.s3a.impl",
          "org.apache.hadoop.fs.s3a.S3AFileSystem")
        // v2 commit algorithm + ignore-cleanup-failures: task commits
        // rename directly to the destination, the pattern the reference
        // tuned for non-atomic-rename object stores
        // (`delta_datalake.py:25-26`). On Hadoop 3+ the S3A "magic"
        // committer is the stronger successor; v2 kept for parity.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
          "2")
        .config(
          "spark.hadoop.mapreduce.fileoutputcommitter.cleanup-failures.ignored",
          "true")
      accessKey.foreach(k =>
        c = c.config("spark.hadoop.fs.s3a.access.key", k))
      secretKey.foreach(k =>
        c = c.config("spark.hadoop.fs.s3a.secret.key", k))
      c
    }

  /** Dispatcher mirroring `get_spark_session(type)`
    * (`spark_session_factory.py:83-89`): pick the profile by name, fall back
    * to parquet when the format runtime is absent. Object-store config is
    * layered on when the GRAFT_S3_* env is present. */
  def get(profileName: String, appName: String = "graft"): SparkSession = {
    val p = profileName.toLowerCase match {
      case "delta"   => DeltaLake
      case "iceberg" => IcebergLake
      case _         => ParquetLake
    }
    withObjectStore(builder(appName, profile = p)).getOrCreate()
  }
}
