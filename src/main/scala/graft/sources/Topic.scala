package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Kafka-shaped, file-backed topic: partitioned append-only segment log
  * with an offsets ledger and consumer-group positions.
  *
  * The reference declares `confluent-kafka` as an ingest dependency
  * (`mage_demo/requirements.txt:3`) but never ships a broker in its
  * compose file — its pipelines land micro-batches as files. This module
  * gives that declared intent a working, offline shape with Kafka's
  * *semantics* (partition-by-key, per-partition monotonic offsets,
  * committed consumer positions, replayable segments) on plain parquet:
  *
  * {{{
  *   <topic>/data/partition=<p>/part-*.parquet  // append-only segments
  *   <topic>/_graft_log/offsets-<v>.json        // committed high-waters
  *   <topic>/_graft_log/group-<g>-<v>.json      // consumer positions
  * }}}
  *
  * == Semantics ==
  *  - A record's partition is a pure function of its key
  *    (`md5(key) % nPartitions` — the same reproducible hash family as
  *    [[graft.operators.TextAnalysis.hashSplit]], so a DuckDB oracle can
  *    re-derive the placement); all records for one key live on one
  *    partition in produce order, Kafka's ordering contract.
  *  - Offsets are per-partition monotonic: each produce assigns
  *    `high-water + rank(orderCol)` and commits the new high-waters with
  *    the same atomic put-if-absent protocol as [[GraftLog]]. Readers
  *    filter `offset < committed high`, so a producer that crashed after
  *    writing segment files but before its ledger commit is invisible —
  *    the read is ledger-consistent without ever locking the data dir.
  *  - One producer per topic (Kafka's per-partition leader): a ledger
  *    conflict surfaces as an error rather than retrying, because the
  *    segment rows were already written under the assumed offsets.
  *
  * == Scale ==
  * Produce is one hash shuffle on the partition key (exactly a Kafka
  * producer's placement) plus a per-partition rank — the sort is within
  * one partition's batch slice, never global. Segments are immutable;
  * a read opens only `partition=` dirs it needs (directory pruning) and
  * the `offset < high` / `offset >= from` filters push to parquet
  * row-group stats, which are tight because offsets are assigned in
  * write order. The ledger is metadata-sized (nPartitions longs per
  * version). At 100 TB the data dir is big; every control-plane
  * structure here stays KB-sized.
  */
object Topic {

  /** Kafka source column order: key, value, topic, partition, offset,
    * timestamp. */
  private val Shape =
    Seq("key", "value", "topic", "partition", "offset", "timestamp")

  private def ledgerName(v: Long) = f"offsets-$v%010d.json"
  private val LedgerRe = "offsets-(\\d{10})\\.json".r

  private def groupName(g: String, v: Long) = f"group-$g-$v%010d.json"

  /** Deterministic partition for a key — reproducible in ANSI SQL:
    * `('0x' || substr(md5(key),1,8))::UBIGINT % n`. */
  def partitionFor(key: Column, nPartitions: Int): Column =
    (conv(substring(md5(key), 1, 8), 16, 10).cast("long") % nPartitions)
      .cast(IntegerType)

  // ------------------------------------------------------------- ledger

  /** Latest committed (version, per-partition high-waters). Version -1 /
    * all-zero highs when the topic has never committed. */
  def highWaters(spark: SparkSession, dir: String,
      nPartitions: Int): (Long, Seq[Long]) = {
    val logDir = new HPath(dir, GraftLog.LogDirName)
    val f = GraftLog.fs(spark, dir)
    val latest =
      if (!f.exists(logDir)) None
      else f.listStatus(logDir).toSeq.map(_.getPath.getName)
        .collect { case LedgerRe(v) => v.toLong }.sorted.lastOption
    latest match {
      case None => (-1L, Seq.fill(nPartitions)(0L))
      case Some(v) =>
        val in = f.open(new HPath(logDir, ledgerName(v)))
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        (v, parseLongs(content))
    }
  }

  /** Ledger payload is one JSON array of longs — index = partition. */
  private def parseLongs(json: String): Seq[Long] =
    json.trim.stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim.toLong).toSeq

  private def renderLongs(xs: Seq[Long]): String =
    xs.mkString("[", ",", "]")

  // ------------------------------------------------------------ produce

  /** Append `records` (columns: key STRING, value STRING,
    * timestamp TIMESTAMP) to the topic. Partition is derived from the
    * key; offsets continue from the committed high-waters, ordered by
    * `orderCol` within this batch (the producer's send order made
    * explicit and deterministic). Returns the new ledger version. */
  def produce(spark: SparkSession, dir: String, records: DataFrame,
      nPartitions: Int, orderCol: Column): Long = {
    val (v, highs) = highWaters(spark, dir, nPartitions)
    val base = element_at(
      array(highs.map(lit): _*), col("partition") + 1)
    val w = Window.partitionBy(col("partition")).orderBy(orderCol)
    val assigned = records
      .withColumn("partition", partitionFor(col("key"), nPartitions))
      .withColumn("offset", base + row_number().over(w) - 1)
      .withColumn("topic", lit(new HPath(dir).getName))
      .select(Shape.map(col): _*)
    // One file per partition per produce — the window above already
    // shuffled by partition, so each partition's rows sit in one task and
    // partitionBy writes one segment per partition dir (a Kafka segment
    // roll per batch, not tasks×partitions fragments).
    assigned.write.mode("append")
      .partitionBy("partition").parquet(s"$dir/data")
    // New high-waters: old + this batch's per-partition counts. The
    // collect is nPartitions rows of metadata, never data.
    val counts = assigned.groupBy(col("partition")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val next = highs.indices.map(p => highs(p) + counts.getOrElse(p, 0L))
    if (!commitLedger(spark, dir, v + 1, next))
      throw new GraftLog.CommitConflictException(v + 1, dir)
    v + 1
  }

  /** Atomic put-if-absent of one ledger version; false = another writer
    * took it first (the produce that raced us must abort — its segment
    * offsets were assigned against a stale high-water). */
  private[graft] def commitLedger(spark: SparkSession, dir: String,
      version: Long, highs: Seq[Long]): Boolean =
    GraftLog.putIfAbsent(spark, dir, ledgerName(version), renderLongs(highs))

  // -------------------------------------------------------------- read

  /** The committed topic contents, Kafka-shaped. Rows beyond the
    * committed high-waters (a torn produce) are filtered out; the filter
    * is on the `offset` column, which parquet row-group stats prune
    * cheaply because offsets are written in order. */
  def read(spark: SparkSession, dir: String, nPartitions: Int): DataFrame = {
    val (_, highs) = highWaters(spark, dir, nPartitions)
    spark.read.option("basePath", s"$dir/data").parquet(s"$dir/data")
      .filter(col("offset") <
        element_at(array(highs.map(lit): _*), col("partition") + 1))
      .select(Shape.map(col): _*)
  }

  /** [[read]] restricted to `offset >= from(partition)` — a consumer
    * resuming from a committed position. */
  def readFrom(spark: SparkSession, dir: String, nPartitions: Int,
      from: Seq[Long]): DataFrame =
    read(spark, dir, nPartitions).filter(col("offset") >=
      element_at(array(from.map(lit): _*), col("partition") + 1))

  /** Streaming read over the segment log (file source; AvailableNow or
    * continuous micro-batches both work). The caller passes the data
    * schema — file streams require one — and gets the committed rows
    * only, same visibility rule as [[read]]. */
  def readStream(spark: SparkSession, dir: String,
      nPartitions: Int): DataFrame = {
    val (_, highs) = highWaters(spark, dir, nPartitions)
    val schema = spark.read.option("basePath", s"$dir/data")
      .parquet(s"$dir/data").schema
    val dataSchema =
      StructType(schema.filterNot(_.name == "partition"))
    spark.readStream.schema(dataSchema)
      .option("basePath", s"$dir/data").parquet(s"$dir/data")
      .filter(col("offset") <
        element_at(array(highs.map(lit): _*), col("partition") + 1))
      .select(Shape.map(col): _*)
  }

  // ----------------------------------------------------- consumer groups

  /** Commit a consumer group's position (next offset to read, per
    * partition). Versioned like the producer ledger; latest wins. */
  def commitGroup(spark: SparkSession, dir: String, group: String,
      offsets: Seq[Long]): Long = {
    val v = groupPositionVersion(spark, dir, group) + 1
    if (!GraftLog.putIfAbsent(spark, dir, groupName(group, v),
        renderLongs(offsets)))
      throw new GraftLog.CommitConflictException(v, s"$dir#$group")
    v
  }

  private def groupPositionVersion(spark: SparkSession, dir: String,
      group: String): Long = {
    val re = ("group-" + java.util.regex.Pattern.quote(group) +
      "-(\\d{10})\\.json").r
    val logDir = new HPath(dir, GraftLog.LogDirName)
    val f = GraftLog.fs(spark, dir)
    if (!f.exists(logDir)) -1L
    else f.listStatus(logDir).toSeq.map(_.getPath.getName)
      .collect { case re(v) => v.toLong }.sorted.lastOption.getOrElse(-1L)
  }

  /** The group's committed position, or per-partition zeros if it has
    * never committed (earliest — Kafka's auto.offset.reset=earliest). */
  def groupPosition(spark: SparkSession, dir: String, group: String,
      nPartitions: Int): Seq[Long] = {
    val v = groupPositionVersion(spark, dir, group)
    if (v < 0) Seq.fill(nPartitions)(0L)
    else {
      val logDir = new HPath(dir, GraftLog.LogDirName)
      val f = GraftLog.fs(spark, dir)
      val in = f.open(new HPath(logDir, groupName(group, v)))
      try parseLongs(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  // ------------------------------------------------------ driver fixture

  /** Partitions for the events fixture topic. */
  val FixturePartitions = 4

  /** Stage the events table as a topic, idempotently: two produces
    * (even event_ids, then odd — two distinguishable producer batches),
    * key = user_id, value = `event_id|event_type` (exact-typed fields
    * only, so the payload round-trips byte-identically through the
    * oracle's string parse). Re-entrant: once the ledger reaches version
    * 1 the staging is complete and later callers reuse it (s11 and i13
    * share one staged topic per JVM). */
  def ensureStaged(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = Staging.dir(sfDir, "topic_events", "graft_topic_")
    val (v, _) = highWaters(spark, dir, FixturePartitions)
    if (v < 1) {
      // normalize ts to a µs TIMESTAMP regardless of the parquet physical
      // encoding (raw nanos long vs timestamp[us] — Sources.normalizeEventTs
      // dispatches on the scanned type, matching DuckDB's coercion)
      val events = Sources.normalizeEventTs(
          spark.read.parquet(s"$sfDir/events.parquet"))
        .select(col("user_id").cast("string").as("key"),
          concat_ws("|", col("event_id"), col("event_type")).as("value"),
          col("ts").as("timestamp"), col("event_id"))
      if (v < 0)
        produce(spark, dir, events.filter(col("event_id") % 2 === 0),
          FixturePartitions, col("event_id"))
      produce(spark, dir, events.filter(col("event_id") % 2 === 1),
        FixturePartitions, col("event_id"))
    }
    dir
  }

  /** s11 — produce/consume round-trip: the staged events topic read back
    * and audited per partition: record count, high offset, distinct keys,
    * an exact payload checksum (sum of the event_ids parsed back out of
    * the value strings) and the latest timestamp. Every column is
    * re-derivable in ANSI SQL from the events table plus the documented
    * placement rule, so the oracle checks partitioning, offset
    * assignment, payload integrity and visibility in one query. */
  def produceConsume(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureStaged(spark, sfDir)
    read(spark, dir, FixturePartitions)
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n_records"),
        max(col("offset")).as("max_offset"),
        countDistinct(col("key")).as("n_keys"),
        sum(split(col("value"), "\\|").getItem(0).cast("long"))
          .as("id_checksum"),
        max(col("timestamp")).as("max_ts"))
  }
}
