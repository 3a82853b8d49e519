package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{GraftLog, Sources}

/** Driver-facing workload T — the transactional-table lifecycle the
  * reference runs on Delta (`scratchpads/financial_dl_etl.py:42,66,81,99`:
  * seed-overwrite, then repeated merge cycles; versioned reads are Delta's
  * `VERSION AS OF`), re-expressed through [[graft.sources.GraftLog]].
  *
  * One staged table per corpus per JVM:
  *   v0 = atomic overwrite with the full `customer` table,
  *   v1 = MERGE of the deterministic incremental batch
  *        ([[Incremental.incrementalBatch]] — even keys update, %7 keys
  *        insert above max(c_custkey)).
  * Every query then reads a PINNED version, so the three registered
  * entries are idempotent within and across calls:
  *   t1 — `VERSION AS OF 0` must reproduce `customer` bit-for-bit even
  *        though v1 has since rewritten matched files (time travel);
  *   t2 — version 1 must equal the relational upsert (the c4 oracle) —
  *        MERGE applies source values to every matched key, and matched
  *        keys whose fields didn't change get identical values back, so
  *        merge-all and changed-rows-only upsert agree by value;
  *   t3 — a separate table: overwrite then predicate DELETE, the latest
  *        version drops exactly the matching rows (file-pruned rewrite).
  */
object Transactions {

  private val stagedMerge =
    new scala.collection.concurrent.TrieMap[String, String]
  private val stagedDelete =
    new scala.collection.concurrent.TrieMap[String, String]

  private def customerCols = Seq("c_custkey", "c_name", "c_nationkey",
    "c_acctbal", "c_mktsegment")

  private def mergeTable(spark: SparkSession, sfDir: String): String =
    stagedMerge.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_gl"
      GraftLog.overwrite(Sources.testTable(spark, sfDir, "customer"), dir)
      val batch = Incremental.incrementalBatch(spark, sfDir).select(
        col("inc_custkey").as("c_custkey"),
        col("inc_name").as("c_name"),
        col("inc_nationkey").as("c_nationkey"),
        col("inc_acctbal").as("c_acctbal"),
        col("inc_mktsegment").as("c_mktsegment"))
      GraftLog.merge(batch, dir, Seq("c_custkey"))
      dir
    })

  private def deleteTable(spark: SparkSession, sfDir: String): String =
    stagedDelete.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_del"
      GraftLog.overwrite(Sources.testTable(spark, sfDir, "customer"), dir)
      GraftLog.delete(spark, dir, col("c_custkey") % 10 === 0)
      dir
    })

  private val stagedPartMerge =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Hive-partitioned twin of [[mergeTable]]: same table, same batch,
    * but the layout is `c_mktsegment=<seg>` dirs — MERGE must rewrite
    * only touched partitions' files (untouched ones are carried by
    * reference) and re-stage the rewrite partitioned, so the result is
    * value-identical to the flat merge. Reference analog: Delta MERGE on
    * the `PARTITIONED BY (Date)` bronze table
    * (`financial_dl_bronze.py:26`). */
  private def partMergeTable(spark: SparkSession, sfDir: String): String =
    stagedPartMerge.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_glp"
      GraftLog.overwritePartitioned(
        Sources.testTable(spark, sfDir, "customer"), dir,
        Seq("c_mktsegment"))
      val batch = Incremental.incrementalBatch(spark, sfDir).select(
        col("inc_custkey").as("c_custkey"),
        col("inc_name").as("c_name"),
        col("inc_nationkey").as("c_nationkey"),
        col("inc_acctbal").as("c_acctbal"),
        col("inc_mktsegment").as("c_mktsegment"))
      GraftLog.merge(batch, dir, Seq("c_custkey"))
      dir
    })

  /** t16 — MERGE on a hive-partitioned GraftLog table. Oracle: the same
    * relational upsert as t2 (layout must not change the answer). */
  def partitionedMerge(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.read(spark, partMergeTable(spark, sfDir))
      .select(customerCols.map(col): _*)

  private val stagedGenerated =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Events table with `event_date GENERATED ALWAYS AS (to_date(ts))`,
    * hive-partitioned by the generated column — neither write names it
    * (the log computes it), which is the Delta generated-column write
    * contract. */
  private def generatedTable(spark: SparkSession, sfDir: String): String =
    stagedGenerated.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/events_gen"
      val ev = Sources.testTable(spark, sfDir, "events")
      GraftLog.createGenerated(ev.filter(col("event_id") % 2 === 0), dir,
        Map("event_date" -> "to_date(ts)"), Seq("event_date"))
      GraftLog.appendPartitioned(ev.filter(col("event_id") % 2 === 1),
        dir, Seq("event_date"))
      dir
    })

  /** t28 — GENERATED partition columns end-to-end: the table is laid
    * out in `event_date=<day>` dirs the writers never populated, and
    * the read filters ONLY on `ts` — [[graft.sources.GraftFileIndex]]
    * derives the partition predicate from the base-column range through
    * the `to_date` generation shape (Delta's generated-column partition
    * pruning), so the scan opens only the in-range days' dirs. At
    * 100 TB this is the partition discipline that makes a time-ranged
    * query touch ~10 of ~3650 day-dirs with zero query-side awareness
    * of the layout. Oracle: the same ts-ranged daily aggregate computed
    * from the raw events table. */
  def generatedColumnsRead(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = generatedTable(spark, sfDir)
    val lo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    graft.sources.GraftFileIndex.read(spark, dir)
      .filter(col("ts") >= lo && col("ts") < hi)
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,10)")).cast("double"), 6)
          .as("total_value"))
  }

  /** t31 — `GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY
    * 2)`: the engine allocates surrogate keys the writers never name —
    * dense, distributed (count-per-partition prefix offsets + a second
    * stamping pass, no shuffle, no single-partition window), with the
    * high-water mark carried in the commit log so deletes/overwrites/
    * vacuum can never cause id reuse (Delta's
    * `delta.identity.highWaterMark` contract). Two commits (creation +
    * append) must yield one unbroken stepped sequence; the oracle pins
    * count, distinctness, both endpoints, and the step grid — all
    * derivable from the customer row count alone. */
  def identityColumnsRead(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.tempDir("graft_ident_")
    val t = s"$root/cust"
    val cust = Sources.testTable(spark, sfDir, "customer")
      .select(customerCols.map(col): _*)
    GraftLog.createGenerated(cust.filter(col("c_custkey") % 2 === 0), t,
      Map("row_id" -> "identity(1000, 2)"), Seq.empty)
    GraftLog.append(cust.filter(col("c_custkey") % 2 === 1), t)
    GraftLog.read(spark, t)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("row_id")).as("n_ids"),
        min(col("row_id")).as("min_id"),
        max(col("row_id")).as("max_id"),
        (count(when((col("row_id") - 1000) % 2 =!= 0, 1)) === 0)
          .as("all_on_grid"))
  }

  private val stagedBucketT =
    new scala.collection.concurrent.TrieMap[String, String]

  private def bucketTransformTable(spark: SparkSession,
      sfDir: String): String =
    stagedBucketT.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_pb"
      GraftLog.overwriteBucketTransform(
        Sources.testTable(spark, sfDir, "customer"), dir,
        "c_custkey", nBuckets = 8)
      dir
    })

  /** t19 — Iceberg-style HIDDEN bucket partitioning: the table is laid
    * out in 8 `bucket(8, c_custkey)` dirs the schema never mentions, and
    * a plain `c_custkey IN (...)` probe prunes to those keys' bucket
    * dirs inside the planner — the query names only the real column
    * (compare t11, where the partition column is user-visible). Oracle:
    * the same IN over the raw table; the spec pins the numFiles
    * pruning. */
  def bucketTransformProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = bucketTransformTable(spark, sfDir)
    graft.sources.GraftFileIndex.read(spark, dir)
      .filter(col("c_custkey").isin(421L, 77L, 1204L))
      .select(customerCols.map(col): _*)
  }

  private val stagedDv =
    new scala.collection.concurrent.TrieMap[String, String]

  private def dvTable(spark: SparkSession, sfDir: String): String =
    stagedDv.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_dv"
      GraftLog.overwrite(
        Sources.testTable(spark, sfDir, "customer")
          .repartitionByRange(8, col("c_custkey")), dir)
      GraftLog.deleteVectors(spark, dir, col("c_custkey") % 10 === 0)
      dir
    })

  private val stagedPartDv =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t21 — deletion vectors on a HIVE-PARTITIONED layout: the erasure
    * shape a date/segment-partitioned 100 TB lake actually runs. The
    * table is partitioned by `c_mktsegment`; the DV commit masks
    * `c_custkey % 10 = 0` positions across every partition WITHOUT
    * rewriting one data file (pinned as `n_files_rewritten`; compact
    * materializing while KEEPING the partition dirs is spec-pinned in
    * GraftLogSpec). Same answer as t3/t17 — layout must never change
    * the result. */
  def partitionedDvDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedPartDv.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_txn_") + "/customer_pdv"
      GraftLog.overwritePartitioned(
        Sources.testTable(spark, sfDir, "customer"), d,
        Seq("c_mktsegment"))                                      // v0
      GraftLog.deleteVectors(spark, d, col("c_custkey") % 10 === 0) // v1
      d
    })
    val f0 = GraftLog.snapshot(spark, dir, Some(0L))._1.toSet
    val f1 = GraftLog.snapshot(spark, dir, Some(1L))._1.toSet
    val rewritten = (f1 diff f0).size + (f0 diff f1).size
    GraftLog.read(spark, dir)
      .select(customerCols.map(col): _*)
      .withColumn("n_files_rewritten", lit(rewritten))
  }

  private val stagedErasure =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Stage the streaming-erasure pipeline once per (JVM, corpus): a
    * customer lake table, a topic of erasure requests (keys of every
    * c_custkey % 7 == 0 row, produced in two batches), a checkpointed
    * stream whose every micro-batch lands as ONE deletion-vector commit
    * ([[GraftLog.deleteVectorsMatching]] — no data file rewritten while
    * requests drain), and a final compaction that materializes the
    * vectors. */
  private def erasureTable(spark: SparkSession, sfDir: String): String =
    stagedErasure.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_gdpr_")
      val table = s"$root/cust"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(
        cust.repartitionByRange(8, col("c_custkey")), table)
      val topic = s"$root/topic"
      def requests(pred: org.apache.spark.sql.Column) = cust
        .filter(pred)
        .select(col("c_custkey").cast("string").as("key"),
          concat_ws("|", lit("erase"), col("c_custkey")).as("value"),
          expr("timestamp_micros(0)").as("timestamp"),
          col("c_custkey"))
      graft.sources.Topic.produce(spark, topic,
        requests(col("c_custkey") % 14 === 0), 4, col("c_custkey"))
      graft.sources.Topic.produce(spark, topic,
        requests(col("c_custkey") % 7 === 0 && col("c_custkey") % 14 =!= 0),
        4, col("c_custkey"))
      val q = graft.sources.Topic.readStream(spark, topic, 4)
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val keys = batch.select(
              split(col("value"), "\\|").getItem(1).cast("long")
                .as("c_custkey"))
            GraftLog.deleteVectorsMatching(batch.sparkSession, table,
              keys, Seq("c_custkey")): Unit
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      GraftLog.compact(spark, table, targetFiles = 2)
      table
    })

  /** i15 — streaming GDPR erasure end to end: topic of delete requests →
    * checkpointed stream → per-batch deletion-vector commits → compaction
    * materializes. The read-back pins the rows (every requested key gone,
    * nothing else touched) and that compaction cleared the vectors
    * (`n_dvs_left` = 0). Composes s11/i13 (topic), t17 (deletion
    * vectors) and t5 (compaction) into the erasure workflow a real lake
    * runs. */
  def streamingErasure(spark: SparkSession, sfDir: String): DataFrame = {
    val t = erasureTable(spark, sfDir)
    val dvsLeft = GraftLog.deletionVectors(spark, t).size
    GraftLog.read(spark, t)
      .select(customerCols.map(col): _*)
      .withColumn("n_dvs_left", lit(dvsLeft))
  }

  private val stagedBloom =
    new scala.collection.concurrent.TrieMap[String, String]

  private def bloomTable(spark: SparkSession, sfDir: String): String =
    stagedBloom.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_bf"
      GraftLog.overwriteIndexed(
        Sources.testTable(spark, sfDir, "customer").repartition(8),
        dir, Seq("c_name"))
      dir
    })

  /** t18 — Bloom-indexed point lookup: `c_name` is hash-distributed
    * across the 8 files, so min/max stats keep everything; the per-file
    * Bloom bitmaps in the commit log prune to the file(s) actually
    * holding the probed name inside `FileSourceScanExec` (spec pins the
    * numFiles metric; the oracle pins zero lost rows). The probe value
    * is derived relationally (the name of c_custkey 42) so the oracle
    * replays it as a scalar subquery. */
  def bloomPointLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = bloomTable(spark, sfDir)
    val probe = Sources.testTable(spark, sfDir, "customer")
      .filter(col("c_custkey") === 42).select("c_name")
      .collect().head.getString(0) // one-row metadata probe (g8 pattern)
    graft.sources.GraftFileIndex.read(spark, dir)
      .filter(col("c_name") === probe)
      .select(customerCols.map(col): _*)
  }

  /** t17 — merge-on-read DELETE via deletion vectors: the same predicate
    * as t3, but NO data file is rewritten — matching (file, row_index)
    * positions land in a `_dv/` parquet sidecar and the read masks them
    * with an anti-join on `_metadata`. The `n_files_rewritten` column
    * pins the merge-on-read contract itself (v0's and v1's live file
    * sets must be identical); the row set pins the answer. */
  def afterDvDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = dvTable(spark, sfDir)
    val f0 = GraftLog.snapshot(spark, dir, Some(0L))._1.toSet
    val f1 = GraftLog.snapshot(spark, dir, Some(1L))._1.toSet
    val rewritten = (f1 diff f0).size + (f0 diff f1).size
    GraftLog.read(spark, dir)
      .select(customerCols.map(col): _*)
      .withColumn("n_files_rewritten", lit(rewritten))
  }

  private val stagedRowCdf =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t36 — CDF keyed by the STABLE ROW ID ([[GraftLog.changesByRowId]]):
    * row-level lineage with no uniqueness assumption about the data —
    * the id IS the identity, which is what row tracking exists for.
    * The staging replays the t34 lifecycle (track, backfill, DV-delete
    * a tenth, append a shifted batch) and the query unions the row-id
    * diffs of the two data-changing commits: the DV commit yields
    * exactly the hidden tenth as `delete` rows still carrying the ids
    * those rows had in life, the append yields the shifted batch as
    * `insert` rows. A compact between them diffs EMPTY by contract
    * (ids survive materialization — OPTIMIZE is invisible to row-level
    * consumers), pinned by the spec.
    *
    * Scale: each diff reads only the commit's touched files at the two
    * adjacent versions (the [[GraftLog.changesAt]] bound) — a small
    * delete's lineage costs a few file reads on a 100 TB table. */
  def rowIdCdf(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.GraftLog
    val dir = stagedRowCdf.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_rowcdf_") + "/customer"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, d)                                   // v0
      GraftLog.setProperties(spark, d,
        Map("graft.enableRowTracking" -> "true"))                   // v1
      GraftLog.backfillRowIds(spark, d)                             // v2
      GraftLog.deleteVectors(spark, d, col("c_custkey") % 10 === 0) // v3
      GraftLog.append(
        cust.filter(col("c_custkey") <= 100)
          .withColumn("c_custkey", col("c_custkey") + 1000000L), d) // v4
      d
    })
    val outCols = Seq(col("c_custkey"), col("c_name"),
      col("_change_type"), col("_commit_version"))
    GraftLog.changesByRowId(spark, dir, 3L).select(outCols: _*)
      .unionByName(
        GraftLog.changesByRowId(spark, dir, 4L).select(outCols: _*))
  }

  private val stagedProtocol =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t35 — the TABLE-FEATURES protocol (Delta reader/writer features):
    * the first deletion-vector commit declares `deletionVectors` as a
    * reader feature (an engine that would ignore the masks must refuse
    * the table, not resurrect erased rows), ADD CONSTRAINT declares
    * `checkConstraints` as a writer feature (an unaware writer would
    * commit unchecked rows). The query reads the table THROUGH the
    * gate — its rows prove a supported declaration never blocks — and
    * pins the declared feature lists as columns. The refusal paths
    * (unknown feature → loud read/write failure) are spec-pinned
    * (ProtocolFeaturesSpec simulates a future engine's commit by hand).
    *
    * Scale: declarations ride the properties map — one small-JSON read
    * per gate check, no data touched; the introducing commit declares
    * atomically with first use, so no window exists where an old
    * engine could corrupt the table. */
  def protocolFeaturesRead(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.GraftLog
    val dir = stagedProtocol.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_proto_") + "/customer"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, d)                                   // v0
      GraftLog.deleteVectors(spark, d, col("c_custkey") % 10 === 0) // v1
      GraftLog.addConstraint(spark, d, "key_pos", "c_custkey > 0")  // v2
      d
    })
    val props = GraftLog.properties(spark, dir)
    GraftLog.read(spark, dir)
      .select(customerCols.map(col): _*)
      .withColumn("reader_features",
        lit(props.getOrElse("graft.protocol.readerFeatures", "")))
      .withColumn("writer_features",
        lit(props.getOrElse("graft.protocol.writerFeatures", "")))
      .withColumn("n_versions",
        lit(GraftLog.versions(spark, dir).size))
  }

  private val stagedRowTracking =
    new scala.collection.concurrent.TrieMap[String, (String, Long)]

  /** t34 — STABLE ROW IDS (the `delta.enableRowTracking` design): the
    * table is created untracked, tracking is enabled by property, a
    * metadata-only backfill assigns per-file bases (row_id = base +
    * row_index — nothing row-sized is stored), a DV delete hides a
    * tenth of the rows WITHOUT moving anyone's id, and compact
    * materializes the surviving ids as a physical column through the
    * rewrite. Pinned invariants (id VALUES are an engine-internal
    * allocation, so the oracle checks cardinalities, not numbers):
    * `n_ids` distinct ids == survivors, `n_in_range` all ids inside
    * [0, |customer|) (the backfill allocation window — nothing leaked
    * past the high water), `n_stable` == survivors (every id identical
    * before and after the compact rewrite), plus the surviving row set
    * itself.
    *
    * Scale: bases ride the per-file stats (`#rowbase`) — metadata, one
    * log read; the id column exists physically ONLY in compacted files;
    * the backfill is one commit with zero data movement. This is what
    * makes row-level lineage (CDC joins, audit trails, feedback
    * attribution) affordable on a 100 TB table: identity costs nothing
    * per row until a rewrite must carry it. */
  def rowTracking(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.GraftLog
    val (dir, nStable) = stagedRowTracking.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_rowtrack_") + "/customer"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, d)                                  // v0
      GraftLog.setProperties(spark, d,
        Map("graft.enableRowTracking" -> "true"))                  // v1
      GraftLog.backfillRowIds(spark, d)                            // v2
      GraftLog.deleteVectors(spark, d, col("c_custkey") % 10 === 0) // v3
      val pre = GraftLog.readWithRowIds(spark, d)
        .select(col("c_custkey").as("k"), col("_graft_row_id").as("pre_id"))
      GraftLog.compact(spark, d)                                   // v4
      val post = GraftLog.readWithRowIds(spark, d)
        .select(col("c_custkey").as("k"), col("_graft_row_id").as("post_id"))
      val stable = pre.join(post, "k")
        .filter(col("pre_id") === col("post_id")).count()
      (d, stable)
    })
    val total = Sources.testTable(spark, sfDir, "customer").count()
    val withIds = GraftLog.readWithRowIds(spark, dir)
      .transform(graft.CacheScope.tracked)
    val nIds = withIds.select(countDistinct(col("_graft_row_id")))
      .head.getLong(0)
    val nInRange = withIds.filter(col("_graft_row_id") >= 0 &&
      col("_graft_row_id") < total).count()
    withIds
      .select(customerCols.map(col): _*)
      .withColumn("n_ids", lit(nIds))
      .withColumn("n_in_range", lit(nInRange))
      .withColumn("n_stable", lit(nStable))
      .withColumn("n_versions",
        lit(GraftLog.versions(spark, dir).size))
  }

  private val stagedRowTrackingMerge =
    new scala.collection.concurrent.TrieMap[String,
      (String, Long, Boolean)]

  /** t43 — ROW IDS THROUGH MERGE (Delta's rowTrackingPreserved): the
    * t34 lifecycle extended through the one rewrite class that both
    * updates AND inserts in a single commit. Lifecycle: seed →
    * enableRowTracking → backfill → append (auto-allocated bases) →
    * compact (materializes ids) → MERGE that updates every %3 key and
    * inserts shifted twins of them. Pinned invariants: `n_stable` —
    * every pre-merge row keeps its id THROUGH the merge rewrite
    * (matched-updated rows included: an update changes values, never
    * identity); `fresh_monotone` — every inserted row's id is fresh
    * above the pre-merge high water (allocated base + row_index, so a
    * fresh id can never collide with a preserved one); `n_ids` — ids
    * stay globally distinct. The id VALUES are engine-internal, so the
    * oracle checks the row set + these cardinalities.
    *
    * Why it matters at 100 TB: CDC consumers and incremental-MV
    * maintenance key on row identity; without preservation every MERGE
    * wave re-keys the touched files and a downstream `changesByRowId`
    * reports millions of phantom delete+insert pairs. */
  def rowTrackingMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.GraftLog
    val (dir, nStable, freshOk) =
      stagedRowTrackingMerge.getOrElseUpdate(sfDir, {
        val d = graft.sources.Staging.tempDir("graft_rtmerge_") + "/cust"
        val cust = Sources.testTable(spark, sfDir, "customer")
        GraftLog.overwrite(cust.filter(col("c_custkey") % 2 === 0), d) // v0
        GraftLog.setProperties(spark, d,
          Map("graft.enableRowTracking" -> "true"))                   // v1
        GraftLog.backfillRowIds(spark, d)                             // v2
        GraftLog.append(cust.filter(col("c_custkey") % 2 === 1), d)   // v3
        GraftLog.compact(spark, d)                                    // v4
        val pre = GraftLog.readWithRowIds(spark, d)
          .select(col("c_custkey").as("k"),
            col("_graft_row_id").as("pre_id"))
          .transform(graft.CacheScope.tracked)
        val preMax = pre.agg(max(col("pre_id"))).head.getLong(0)
        val preCount = pre.count()
        val updates = cust.filter(col("c_custkey") % 3 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        val inserts = updates
          .withColumn("c_custkey", col("c_custkey") + 10000000L)
        GraftLog.merge(updates.unionByName(inserts), d,
          Seq("c_custkey"))                                           // v5
        val post = GraftLog.readWithRowIds(spark, d)
          .select(col("c_custkey").as("k"),
            col("_graft_row_id").as("post_id"))
          .transform(graft.CacheScope.tracked)
        val stable = pre.join(post, "k")
          .filter(col("pre_id") === col("post_id")).count()
        require(stable == preCount,
          s"merge moved ${preCount - stable} of $preCount row ids")
        val freshMin = post.filter(col("k") >= 10000000L)
          .agg(min(col("post_id"))).head.getLong(0)
        (d, stable, freshMin > preMax)
      })
    val withIds = GraftLog.readWithRowIds(spark, dir)
      .transform(graft.CacheScope.tracked)
    val nIds = withIds.select(countDistinct(col("_graft_row_id")))
      .head.getLong(0)
    withIds
      .select(customerCols.map(col): _*)
      .withColumn("n_stable", lit(nStable))
      .withColumn("fresh_monotone", lit(freshOk))
      .withColumn("all_ids_distinct", lit(nIds == withIds.count()))
  }

  /** t33 — NULL-COUNT data skipping (Delta's nullCount/numRecords
    * stats): a sparse enrichment column is populated only in the
    * low-key range of a range-clustered layout, and `IS NOT NULL`
    * prunes every all-null file in the PLANNER (the spec pins the
    * numFiles metric; min/max stats can say nothing about nullness).
    * The 100 TB case: an optional column populated for 1% of rows
    * clusters its non-nulls in few files — null counts are the only
    * stat that skips the other 99%. */
  def nullSkippingRead(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.tempDir("graft_nullskip_")
    val t = s"$root/cust"
    GraftLog.overwrite(
      Sources.testTable(spark, sfDir, "customer")
        .withColumn("c_note",
          when(col("c_custkey") <= 100,
            concat(lit("vip:"), col("c_name"))))
        .repartitionByRange(10, col("c_custkey")), t)
    spark.read.format("graft").load(t)
      .filter(col("c_note").isNotNull)
      .select(customerCols.map(col) :+ col("c_note"): _*)
  }

  /** t32 — `OPTIMIZE … WHERE`: partition-scoped compaction. Two
    * commits leave two files in every `c_mktsegment=…` dir; the SQL
    * statement compacts ONLY the BUILDING partition. Pins: full row
    * oracle (layout change, same rows), the BUILDING dir ends at one
    * file, every other partition's files carried by reference, and the
    * files outside the scope were not even read (`only_touched`). The
    * nightly-OPTIMIZE shape for a streaming-append 100 TB lake: target
    * yesterday's partition, not the table. */
  def compactWhereRead(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.tempDir("graft_optw_")
    val t = s"$root/cust"
    val cust = Sources.testTable(spark, sfDir, "customer")
    GraftLog.overwritePartitioned(
      cust.filter(col("c_custkey") % 2 === 0), t, Seq("c_mktsegment"))
    GraftLog.appendPartitioned(
      cust.filter(col("c_custkey") % 2 === 1), t, Seq("c_mktsegment"))
    val before = GraftLog.snapshot(spark, t)._1
    def building(f: String) = f.contains("c_mktsegment=BUILDING")
    spark.sql(s"OPTIMIZE '$t' WHERE c_mktsegment = 'BUILDING'")
    val after = GraftLog.snapshot(spark, t)._1
    val nBuildingFiles = after.count(building)
    val onlyTouched = (before.toSet -- after.toSet).forall(building) &&
      (after.toSet -- before.toSet).forall(building)
    val untouchedCarried =
      before.filterNot(building).toSet.subsetOf(after.toSet)
    spark.read.format("graft").load(t)
      .select(customerCols.map(col): _*)
      .withColumn("n_building_files", lit(nBuildingFiles))
      .withColumn("only_touched", lit(onlyTouched))
      .withColumn("untouched_carried", lit(untouchedCarried))
  }

  /** t30 — `REORG TABLE … APPLY (PURGE)`: Delta's targeted
    * deletion-vector materialization. A DV erasure masks rows in only
    * the low-key files of an 8-file range layout; REORG rewrites
    * EXACTLY those files (applying the masks) and drops the vectors —
    * the GDPR completion step that makes masked bytes physically
    * removable by the next vacuum. `only_touched` pins that every
    * removed file carried a mask, `untouched_carried` that every
    * unmasked file survives by reference (never read or rewritten —
    * on a 100 TB table REORG after a 0.1% erasure rewrites 0.1%,
    * where OPTIMIZE would rewrite everything), and `n_dvs_after` pins
    * the vectors are gone. Row oracle: the erasure predicate. */
  def reorgPurgeRead(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.tempDir("graft_reorg_")
    val t = s"$root/cust"
    GraftLog.overwrite(Sources.testTable(spark, sfDir, "customer")
      .repartitionByRange(8, col("c_custkey")), t)
    GraftLog.deleteVectors(spark, t,
      col("c_custkey") % 10 === 0 && col("c_custkey") <= 300)
    val before = GraftLog.snapshot(spark, t)._1
    val masked = spark.read.parquet(
        GraftLog.deletionVectors(spark, t)
          .map(f => s"$t/$f"): _*)
      .select("file_rel").distinct().collect().map(_.getString(0)).toSet
    spark.sql(s"REORG TABLE '$t' APPLY (PURGE)")
    val after = GraftLog.snapshot(spark, t)._1.toSet
    val onlyTouched = (before.toSet -- after).forall(masked)
    val untouchedCarried =
      before.filterNot(masked).toSet.subsetOf(after)
    val nDvsAfter = GraftLog.deletionVectors(spark, t).size
    spark.read.format("graft").load(t)
      .select(customerCols.map(col): _*)
      .withColumn("only_touched", lit(onlyTouched))
      .withColumn("untouched_carried", lit(untouchedCarried))
      .withColumn("n_dvs_after", lit(nDvsAfter))
  }

  private val stagedConcurrent =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t22 — SIX writers race the same table with no external
    * coordination: four blind appends (disjoint key-shifted slices) and
    * two predicate DELETEs (disjoint slices of the seed rows only — the
    * `<= max(c_custkey)` guard keeps every interleaving order-free).
    * Optimistic concurrency must converge them: appends COMMUTE (the
    * Delta AddFile-only conflict rule — a lost version race just
    * re-claims with the already-staged files), and a DELETE that loses
    * a race REBASES, recomputing its file-pruned rewrite against the
    * winner's snapshot (every writer commits at readVersion+1, so any
    * intervening commit collides — see the OCC note in GraftLog). */
  private def concurrentTable(spark: SparkSession, sfDir: String): String =
    stagedConcurrent.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_ccr"
      val cust = Sources.testTable(spark, sfDir, "customer")
        .select(customerCols.map(col): _*)
      val maxKey = cust.agg(max(col("c_custkey"))).collect().head.getLong(0)
      GraftLog.overwrite(cust, dir)
      val writers: Seq[() => Unit] =
        (0 until 4).map { i => () =>
          GraftLog.append(
            cust.filter(col("c_custkey") % 4 === i)
              .withColumn("c_custkey",
                col("c_custkey") + lit((i + 1L) * (maxKey + 1L))),
            dir)
          ()
        } ++ Seq(3L, 7L).map { m => () =>
          GraftLog.delete(spark, dir,
            col("c_custkey") % 10 === m && col("c_custkey") <= maxKey)
          ()
        }
      val pool =
        java.util.concurrent.Executors.newFixedThreadPool(writers.size)
      val start = new java.util.concurrent.CountDownLatch(1)
      val racing = writers.map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { start.await(); w() }
        })
      }
      start.countDown()
      try racing.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      finally pool.shutdown()
      dir
    })

  /** t22 — the converged table after the six-writer race, with the
    * commit count pinned: exactly one commit per writer (7 = seed + 6),
    * no lost update, no duplicated retry. */
  def concurrentWriters(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = concurrentTable(spark, sfDir)
    val nCommits = GraftLog.versions(spark, dir).size
    GraftLog.read(spark, dir)
      .select(customerCols.map(col): _*)
      .withColumn("n_commits", lit(nCommits))
  }

  /** t1 — time travel: `VERSION AS OF 0` after a later MERGE rewrote
    * files. Oracle: the untouched `customer` table. */
  def timeTravelV0(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.readVersion(spark, mergeTable(spark, sfDir), 0L)
      .select(customerCols.map(col): _*)

  /** t2 — the merged version 1. Oracle: the c4 relational upsert. */
  def mergedV1(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.readVersion(spark, mergeTable(spark, sfDir), 1L)
      .select(customerCols.map(col): _*)

  /** t3 — predicate DELETE through the log. Oracle: the anti-filter. */
  def afterDelete(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.readVersion(spark, deleteTable(spark, sfDir), 1L)
      .select(customerCols.map(col): _*)

  private val stagedCompact =
    new scala.collection.concurrent.TrieMap[String, String]

  private def compactTable(spark: SparkSession, sfDir: String): String =
    stagedCompact.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_cmp"
      val cust = Sources.testTable(spark, sfDir, "customer")
      // four appends land four separate staged file sets — the
      // small-files layout streaming ingest produces
      (0 until 4).foreach { i =>
        GraftLog.append(cust.filter(col("c_custkey") % 4 === i), dir)
      }
      GraftLog.compact(spark, dir, targetFiles = 2)
      dir
    })

  /** t5 — OPTIMIZE-style compaction: four appends rewritten into two
    * files; the committed row set must be byte-identical to the union of
    * the appends. Oracle: the plain customer table. */
  def afterCompact(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.read(spark, compactTable(spark, sfDir))
      .select(customerCols.map(col): _*)

  /** t6 — change data feed across the merge: row-level diff of v0→v1 of
    * the [[mergeTable]] with Delta CDF change types. Inserts are the
    * above-max-key batch rows; updates are matched keys whose VALUES
    * changed (merge writes source values to every matched key, but
    * value-identical rewrites are not changes); no deletes. Oracle
    * re-derives all three classes relationally from customer + the
    * deterministic batch definition. */
  def changeFeed(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.changes(spark, mergeTable(spark, sfDir),
      Seq("c_custkey"), 0L, 1L)

  /** t26 — the four-class CDF over the same MERGE commit: every update
    * emits BOTH its `update_preimage` (v0 values) and
    * `update_postimage` (v1 values) row, Delta CDF's full contract for
    * UPDATE/MERGE consumers (an SCD2 close-out needs the old row to
    * close and the new row to open). Oracle: join-replay of the two
    * adjacent versions — old values from customer, new values from the
    * deterministic batch, for exactly the value-changed matched keys. */
  def changeFeedWithPreimages(spark: SparkSession,
      sfDir: String): DataFrame =
    GraftLog.changes(spark, mergeTable(spark, sfDir),
      Seq("c_custkey"), 0L, 1L, preimages = true)

  /** t27 — BATCH change-feed read through the reader option surface
    * (Delta's `spark.read.option("readChangeFeed", true)` with a
    * version range): the MERGE commit's row-level diff served as an
    * ordinary DataFrame, each row stamped `_commit_version`. Same
    * classes as t6 (the oracle adds the constant version column). */
  def cdfBatchRead(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("cdfKeys", "c_custkey")
      .option("startingVersion", "1")
      .option("endingVersion", "1")
      .load(mergeTable(spark, sfDir))

  private val stagedTvf =
    new scala.collection.concurrent.TrieMap[String, String]

  /** d22 table: overwrite (v0) → MERGE (v1) → DV delete (v2) →
    * `graft.cdf.keys` property (v3) — the history the TVF reads. */
  private def tvfTable(spark: SparkSession, sfDir: String): String =
    stagedTvf.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") +
        "/customer_tvf"
      GraftLog.overwrite(Sources.testTable(spark, sfDir, "customer"), dir)
      val batch = Incremental.incrementalBatch(spark, sfDir).select(
        col("inc_custkey").as("c_custkey"),
        col("inc_name").as("c_name"),
        col("inc_nationkey").as("c_nationkey"),
        col("inc_acctbal").as("c_acctbal"),
        col("inc_mktsegment").as("c_mktsegment"))
      GraftLog.merge(batch, dir, Seq("c_custkey"))
      GraftLog.deleteVectors(spark, dir, col("c_custkey") % 10 === 0)
      // the TVF reads its classification keys from the table itself —
      // set once, log-carried (the delta.enableChangeDataFeed pattern)
      GraftLog.setProperties(spark, dir,
        Map("graft.cdf.keys" -> "c_custkey"))
      dir
    })

  /** d22 — the analyst-facing SQL CDF surface: `SELECT … FROM
    * table_changes('t', 0, 2)` across an overwrite + MERGE + DV-delete
    * history, four-class contract
    * (insert/update_preimage/update_postimage/delete) with
    * `_commit_version` attribution. The TVF is registered by the
    * session extension exactly the way Delta registers its own; each
    * version's rows come from the FILE-BOUNDED per-commit diff
    * (changesAt), never a whole-snapshot pass per version. */
  def tableChangesTvf(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         |  c_mktsegment, _change_type, _commit_version
         |FROM table_changes('${tvfTable(spark, sfDir)}', 0, 2)"""
        .stripMargin)

  private val stagedSkip =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Range-clustered GraftLog table: `repartitionByRange` before the
    * write gives each data file a tight contiguous key range — the
    * layout that makes min/max data skipping effective (random layout
    * would leave every file's range spanning the whole domain). */
  private def skipTable(spark: SparkSession, sfDir: String): String =
    stagedSkip.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_skip"
      GraftLog.overwrite(
        Sources.testTable(spark, sfDir, "customer")
          .repartitionByRange(8, col("c_custkey")), dir)
      dir
    })

  /** t8 — data skipping: a key-range read through the commit-log stats
    * opens only the files whose [min, max] intersect the range (the spec
    * pins the file count; the oracle pins that pruning loses no rows). */
  def rangeRead(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.readPruned(spark, skipTable(spark, sfDir),
      "c_custkey", 101.0, 400.0)
      .select(customerCols.map(col): _*)

  /** t10 — the same skipping through the [[graft.sources.GraftFileIndex]]
    * plan path: `spark.read.format("graft").load(dir)` + an ordinary
    * `.filter(...)` — no explicit (column, lo, hi) API. The pushed data
    * filters reach the index inside FileSourceScanExec, which opens only
    * the files whose commit-log [min, max] intersect the predicate (the
    * spec pins the scan's numFiles metric; the oracle pins zero row loss).
    * A disjoint second range proves OR-pruning keeps both sides. */
  def indexedRangeRead(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft").load(skipTable(spark, sfDir))
      .filter(col("c_custkey").between(701, 900) ||
        col("c_custkey").between(1101, 1200))
      .select(customerCols.map(col): _*)

  private val stagedPart =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Hive-partitioned GraftLog table (`PARTITIONED BY` analog, ref
    * `financial_dl_bronze.py:26`): customer split by market segment, an
    * overwrite plus an append so the live set spans two commits. */
  private def partTable(spark: SparkSession, sfDir: String): String =
    stagedPart.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_part"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwritePartitioned(
        cust.filter(col("c_custkey") % 2 === 0), dir, Seq("c_mktsegment"))
      GraftLog.appendPartitioned(
        cust.filter(col("c_custkey") % 2 === 1), dir, Seq("c_mktsegment"))
      dir
    })

  /** t11 — partition pruning through the planner: an equality filter on
    * the partition column reaches [[graft.sources.GraftFileIndex]] as a
    * partitionFilter and opens only that segment's `col=val` files (the
    * spec pins the numFiles metric at 2 of 10); partition values are
    * reconstructed from the paths, never stored in the data files. */
  def partitionedRead(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft").load(partTable(spark, sfDir))
      .filter(col("c_mktsegment") === "BUILDING")
      .select(customerCols.map(col): _*)

  /** t29 — Delta `replaceWhere`, the idempotent slice reload: one
    * segment of a mktsegment-partitioned customer table is atomically
    * replaced through
    * `write.format("graft").mode(Overwrite).option("replaceWhere", …)`
    * with a recomputed batch, in ONE commit. The scale contract is that
    * only the predicate's partition moves: `only_touched` pins that
    * every file the commit removed AND every file it added lives under
    * the BUILDING partition dir, and `untouched_carried` pins that all
    * other partitions' files are carried by reference (same paths,
    * never read or rewritten) — on a date-partitioned 100 TB table
    * this is what makes a daily re-run O(day), not O(table). The row
    * oracle is the CASE expression of the reload. */
  def replaceWhereReload(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.tempDir("graft_rw_")
    val t = s"$root/cust"
    val cust = Sources.testTable(spark, sfDir, "customer")
    GraftLog.overwritePartitioned(cust, t, Seq("c_mktsegment"))
    val before = GraftLog.snapshot(spark, t)._1.toSet
    val batch = cust.filter(col("c_mktsegment") === "BUILDING")
      .withColumn("c_acctbal",
        lit(1000.0) + col("c_nationkey").cast("double"))
    batch.write.format("graft").mode("overwrite")
      .option("replaceWhere", "c_mktsegment = 'BUILDING'").save(t)
    val after = GraftLog.snapshot(spark, t)._1.toSet
    def building(f: String) = f.contains("c_mktsegment=BUILDING")
    val onlyTouched = (before -- after).forall(building) &&
      (after -- before).forall(building)
    val untouchedCarried = before.filterNot(building).subsetOf(after)
    spark.read.format("graft").load(t)
      .select(customerCols.map(col): _*)
      .withColumn("only_touched", lit(onlyTouched))
      .withColumn("untouched_carried", lit(untouchedCarried))
  }

  private val stagedZ =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Z-order-clustered GraftLog table: customer laid out along the Morton
    * interleave of (c_custkey, c_acctbal), so BOTH columns' per-file
    * stats are tight (t8's single-column range clustering helps only the
    * range key). */
  private def zTable(spark: SparkSession, sfDir: String): String =
    stagedZ.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_z"
      GraftLog.overwrite(Sources.testTable(spark, sfDir, "customer"), dir)
      GraftLog.clusterBy(spark, dir, "c_custkey", "c_acctbal",
        targetFiles = 16)
      dir
    })

  /** t12 — skipping on the SECOND clustered dimension: a balance-range
    * read over the z-ordered layout opens a fraction of the files (the
    * spec pins the count), where a custkey-only range layout would open
    * all of them. Oracle pins zero row loss. */
  def zorderRead(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft").load(zTable(spark, sfDir))
      .filter(col("c_acctbal") >= 2000 && col("c_acctbal") <= 4000)
      .select(customerCols.map(col): _*)

  /** t13 — streaming read FROM the transactional format ("Delta table as
    * a stream source"): `spark.readStream.format("graft")` follows the
    * commit log, the offset IS the commit version, and the engine's
    * offset log makes restarts exactly-once with no extra bookkeeping.
    * Drive: append phase 1 → checkpointed drain to a parquet file sink →
    * "kill" → append phases 2 and 3 → resume (only the two new commits
    * are delivered). Exactly-once iff the sink's aggregate equals the
    * batch SQL over ALL events. */
  def streamingSource(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_src_")
    val (table, ckpt, out) = (s"$root/events_gl", s"$root/ckpt", s"$root/out")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(table)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
    drain() // phase 1, then "kill"
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 1), table)
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 2), table)
    drain() // restart: resumes past the committed offset (version 0)
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
  }

  /** i18 — BOUNDED BACKFILL: the admission-control knob driven
    * end-to-end. Five commits of events land first; then ONE
    * AvailableNow drain with `maxVersionsPerTrigger=2` catches up in
    * ceil(5/2)=3 bounded micro-batches instead of one giant batch — the
    * shape that keeps executor memory and state-store updates flat when
    * a stream is pointed at months of history. The result pins BOTH the
    * rows (aggregate equals batch SQL over all events — nothing lost or
    * duplicated across batch boundaries) and the batch count (the
    * admission contract itself, as an `n_batches` column). */
  def boundedBackfill(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_bbf_")
    val (table, ckpt, out) = (s"$root/events_gl", s"$root/ckpt", s"$root/out")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    (0 until 5).foreach { i =>
      GraftLog.append(ev.filter(pmod(col("event_id"), lit(5)) === i), table)
    }
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "2").load(table)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("n_batches", lit(nBatches))
  }

  /** i20 — BYTE-bounded backfill: `maxBytesPerTrigger` driven
    * end-to-end, the admission cap that actually bounds executor memory
    * at 100 TB (one commit can carry thousands of files; bytes are what
    * spill). Five commits land, then one AvailableNow drain with the
    * cap set to (total bytes - 1): the walk admits commits while their
    * summed footprint stays under the cap, so the first batch takes the
    * first four commits and the fifth lands alone — a deterministic
    * TWO-batch split for ANY size distribution (sum of first four =
    * total - size5 <= cap < total), which the oracle pins as
    * `n_batches` alongside the exactly-once aggregate. Footprints come
    * from commit-logged sizes — admission reads no data files. */
  def byteBoundedBackfill(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_bbb_")
    val (table, ckpt, out) = (s"$root/events_gl", s"$root/ckpt", s"$root/out")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    (0 until 5).foreach { i =>
      GraftLog.append(ev.filter(pmod(col("event_id"), lit(5)) === i), table)
    }
    val totalBytes = GraftLog.fileSizes(spark, table).values.sum
    val q = spark.readStream.format("graft")
      .option("maxBytesPerTrigger", (totalBytes - 1).toString).load(table)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("n_batches", lit(nBatches))
  }

  /** i22 — OPTIMIZE is INVISIBLE to live streams (Delta's
    * `dataChange=false` contract): maintenance and ingestion must be
    * independent on a 100 TB table, or every consumer would crash (or
    * re-ingest the whole rewritten table under `ignoreChanges`) each
    * time compaction runs. Sequence: two appends drain; OPTIMIZE
    * rewrites them into one file (v2, rewrite-only); a third append
    * lands (v3); the resumed stream must deliver ONLY v3's rows —
    * passing over v2 silently. The aggregate pins exactly-once (a
    * re-delivered compact batch would double every v0/v1 row and break
    * the hash), `n_batches_resume` pins that the resume produced ONE
    * data batch (the compact version contributed none), and a FRESH
    * stream over the full history — compact inside it — must also
    * drain to the same aggregate, pinned by `fresh_ok`. */
  def optimizeStreamSkip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_oss_")
    val (table, ckpt, out) = (s"$root/events_gl", s"$root/ckpt", s"$root/out")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    def drain(ck: String, dst: String): Int = {
      val q = spark.readStream.format("graft").load(table)
        .writeStream.format("parquet")
        .option("path", dst)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.count(_.numInputRows > 0)
    }
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 0), table)
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 1), table)
    drain(ckpt, out) // phase 1, then "kill"
    GraftLog.compact(spark, table)                       // v2: rewrite-only
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === 2), table)
    val nResume = drain(ckpt, out) // resume: v2 skipped, v3 delivered
    // a fresh stream (initial snapshot + incremental) over the same
    // history must agree — the compact commit inside the range is
    // passed over there too
    drain(s"$root/ckpt2", s"$root/out2")
    val freshOk = spark.read.parquet(s"$root/out2").count() == ev.count()
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("n_batches_resume", lit(nResume))
      .withColumn("fresh_ok", lit(freshOk))
  }

  /** i23 — `startingVersion`: the stream is a pure CHANGE TAIL, no
    * initial snapshot (Delta's start-position option). Three commits
    * land; a fresh stream with `startingVersion=1` must deliver
    * commits 1 and 2 ONLY — on a 100 TB table this is how a consumer
    * that already holds a copy subscribes to deltas without re-reading
    * the table. A second stream with `startingVersion="latest"` drains
    * NOTHING from the existing history, then exactly the one commit
    * that lands after it armed. Oracles: the two event slices. */
  def startingVersionTail(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_svt_")
    val table = s"$root/events_gl"
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    (0 until 3).foreach { i =>
      GraftLog.append(ev.filter(pmod(col("event_id"), lit(3)) === i), table)
    }
    def drain(opts: Map[String, String], tag: String): Unit = {
      val q = spark.readStream.format("graft").options(opts).load(table)
        .writeStream.format("parquet")
        .option("path", s"$root/out_$tag")
        .option("checkpointLocation", s"$root/ckpt_$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(Map("startingVersion" -> "1"), "sv1")
    // "latest": arms past the 3 existing commits → first drain delivers
    // nothing; after one more commit, the SAME checkpoint resumes and
    // delivers exactly that commit's rows
    drain(Map("startingVersion" -> "latest"), "latest")
    val latestEmpty =
      !new java.io.File(s"$root/out_latest").exists() ||
        spark.read.parquet(s"$root/out_latest").isEmpty
    val slice0 = ev.filter(pmod(col("event_id"), lit(3)) === 0)
    GraftLog.append(slice0, table)
    drain(Map("startingVersion" -> "latest"), "latest")
    val latestSawOnlyNew =
      spark.read.parquet(s"$root/out_latest").count() == slice0.count()
    spark.read.parquet(s"$root/out_sv1")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("latest_tail_empty", lit(latestEmpty))
      .withColumn("latest_saw_only_new", lit(latestSawOnlyNew))
  }

  /** i19 — the DIRECT streaming sink end-to-end:
    * `writeStream.format("graft")` relays a graft source table into a
    * graft sink table with one ledger-stamped transactional commit per
    * micro-batch and ZERO foreachBatch plumbing (the Delta streaming
    * sink shape). Two drains with a kill between them: the second
    * resumes past the committed offset and lands exactly one more
    * commit; a final no-new-data redrain adds none — so the pinned
    * commit count (2) is the exactly-once evidence, and the aggregate
    * equals the batch SQL over all events (nothing lost/duplicated
    * across the source→sink seam). */
  def directSink(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_dsink_")
    val (src, t, ckpt) = (s"$root/src", s"$root/t", s"$root/ckpt")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(t)
      q.awaitTermination()
    }
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(2)) === 0), src)
    drain() // phase 1, then "kill"
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(2)) === 1), src)
    drain() // resume: exactly one more sink commit
    drain() // no new data: NO commit (ledger idempotence)
    val nCommits = GraftLog.versions(spark, t).size
    GraftLog.read(spark, t)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("n_commits", lit(nCommits))
  }

  /** i24 — the direct streaming sink writing a HIVE-PARTITIONED
    * layout: `writeStream.format("graft").partitionBy("event_type")` —
    * the canonical 100 TB ingest shape (a partitioned event table fed
    * by a micro-batch stream). Each batch lands as ONE ledger-stamped
    * partitioned commit ([[GraftLog.txnAppendPartitioned]]), so
    * exactly-once holds across the kill-resume-replay sequence AND the
    * landed table is pruned at read time exactly like a batch-written
    * one (`n_dirs` pins the physical `event_type=…` layout; the extra
    * no-data drain pins ledger idempotence — no empty commit). */
  def directSinkPartitioned(spark: SparkSession,
      sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.tempDir("graft_dsinkp_")
    val (src, t, ckpt) = (s"$root/src", s"$root/t", s"$root/ckpt")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .partitionBy("event_type")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(t)
      q.awaitTermination()
    }
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(2)) === 0), src)
    drain() // phase 1, then "kill"
    GraftLog.append(ev.filter(pmod(col("event_id"), lit(2)) === 1), src)
    drain() // resume: exactly one more sink commit
    drain() // no new data: NO commit (ledger idempotence)
    val nCommits = GraftLog.versions(spark, t).size
    val nDirs = GraftLog.snapshot(spark, t)._1
      .flatMap(_.split('/').find(_.startsWith("event_type=")))
      .distinct.size
    GraftLog.read(spark, t)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("n_commits", lit(nCommits))
      .withColumn("n_dirs", lit(nDirs))
  }

  /** i27 — STREAMING COPY INTO (the Auto-Loader analog): new-file
    * discovery as a stream over a landing directory, composed with the
    * batch COPY ledger so exactly-once holds PER SOURCE FILE — not just
    * per offset. The file stream supplies discovery + admission caps
    * (`maxFilesPerTrigger`, the i20 ingest-throttle shape); each
    * micro-batch commits through [[GraftLog.append]] with its files'
    * ledger entries, so a re-delivered file is a no-op even when the
    * stream's OWN tracking is gone. The query stages three waves with
    * a kill between each drain, then deletes the CHECKPOINT and drains
    * again: the file source re-lists and re-delivers every file, and
    * the pinned `redelivery_noop` records that the ledger absorbed all
    * of it without a commit — the recovery mode no offset-tracking
    * stream has (checkpoint loss normally means re-ingest or data
    * loss; here the ledger is the durable source of truth, exactly
    * Auto-Loader's contract). `n_commits` pins the cap arithmetic:
    * 3 waves × 4 files at 2 files/trigger = 6 ingest commits + the
    * schema-seed overwrite. Oracle = the batch aggregate of the union
    * (what one giant batch COPY INTO would have landed). */
  def streamingCopyInto(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val root = graft.sources.Staging.scratchDir("graft_scopy_")
    val (landing, t, ckpt) = (s"$root/landing", s"$root/t", s"$root/ckpt")
    val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    GraftLog.overwrite(ev.limit(0), t) // v0: schema-only target
    def land(wave: Int): Unit =
      ev.filter(pmod(col("event_id"), lit(3)) === wave)
        .repartition(4).write.mode("append").parquet(landing)
    def drain(): Unit = {
      val q = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2) // admission cap: ≤2 files/batch
        .parquet(landing)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val spark2 = batch.sparkSession
          // per-file ledger gate: batch file names are metadata-sized
          // (≤ maxFilesPerTrigger); the row filter keeps only files no
          // commit has recorded — the copyInto discipline per batch
          val batchFiles = batch.select(input_file_name().as("f"))
            .distinct().collect().map(_.getString(0)).sorted.toSeq
          val ledger = GraftLog.copiedFiles(spark2, t)
          val fresh = batchFiles.filterNot(ledger)
          if (fresh.nonEmpty) {
            val rows = batch.filter(input_file_name().isin(fresh: _*))
            GraftLog.append(rows, t, copied = fresh,
              copiedBaseline = ledger): Unit
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(0); drain() // wave 1, then "kill"
    land(1); drain() // resume past the stream's committed offset
    land(2); drain() // wave 3
    // checkpoint LOSS: wipe the stream's file tracking; every landing
    // file re-delivers and the ledger must absorb all of it
    val nBefore = GraftLog.versions(spark, t).size
    val hfs = new org.apache.hadoop.fs.Path(ckpt).getFileSystem(
      spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    drain()
    val nAfter = GraftLog.versions(spark, t).size
    GraftLog.read(spark, t)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
      .withColumn("n_commits", lit(nBefore))
      .withColumn("redelivery_noop", lit(nAfter == nBefore))
  }

  /** i14 — the COMPOSED ingest path end-to-end: Kafka-shaped topic →
    * streaming consume (ledger-committed offsets only) → exactly-once
    * transactional append ([[GraftLog.txnAppend]] per micro-batch) →
    * table read-back. Each stage is individually oracle-checked
    * elsewhere (s11, i13, t4); this query pins their COMPOSITION — the
    * aggregate over the landed lake table must equal the aggregate the
    * pure streaming consume produces, i.e. nothing was lost, duplicated,
    * or reordered across the topic→stream→table seams. */
  def topicToLake(spark: SparkSession, sfDir: String): DataFrame = {
    val topicDir = graft.sources.Topic.ensureStaged(spark, sfDir)
    val root = graft.sources.Staging.tempDir("graft_t2l_")
    val (table, ckpt) = (s"$root/lake", s"$root/ckpt")
    val q = graft.sources.Topic.readStream(spark, topicDir,
        graft.sources.Topic.FixturePartitions)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        GraftLog.txnAppend(batch, table, "graft-topic-to-lake", id): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    GraftLog.read(spark, table)
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n_records"),
        max(col("offset")).as("max_offset"),
        sum(split(col("value"), "\\|").getItem(0).cast("long"))
          .as("id_checksum"))
  }

  private val stagedRestore =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t15 — RESTORE: overwrite (v0) → delete a slice (v1) → restore to
    * v0 (v2, metadata-only commit). The read must equal the original
    * table, AND v1 must stay time-travelable (spec-pinned) — restore
    * rewinds the live set, never the history. */
  def afterRestore(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedRestore.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_txn_") + "/customer_rst"
      GraftLog.overwrite(Sources.testTable(spark, sfDir, "customer"), d)
      GraftLog.delete(spark, d, col("c_custkey") % 10 === 0)
      GraftLog.restore(spark, d, 0L)
      d
    })
    GraftLog.read(spark, dir).select(customerCols.map(col): _*)
  }

  private val stagedWapi =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t14 — the DataFrameWriter surface: `df.write.format("graft")` with
    * SaveMode overwrite + append lands transactional commits through the
    * registered data source (no GraftLog API in user code at all), and
    * the read-back goes through the same format string. Re-runnable: the
    * overwrite resets the table before the append. */
  def writeApiRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedWapi.getOrElseUpdate(sfDir,
      graft.sources.Staging.tempDir("graft_txn_") + "/customer_wapi")
    val cust = Sources.testTable(spark, sfDir, "customer")
    cust.filter(col("c_custkey") % 2 === 0)
      .write.format("graft").mode("overwrite").save(dir)
    cust.filter(col("c_custkey") % 2 === 1)
      .write.format("graft").mode("append").save(dir)
    spark.read.format("graft").load(dir)
      .select(customerCols.map(col): _*)
  }

  private val stagedEvolve =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t20 — schema-evolution lifecycle (the reference exercises Delta
    * `mergeSchema` on every silver/gold write, `financial_dl_etl.py:66,
    * 81,99`): v0 writes a 3-column slice; v1 appends a WIDENED batch
    * through the `mergeSchema` write option (`GraftLog.appendMergeSchema`
    * — commit schema becomes the union); v2 is a metadata-only
    * `ALTER TABLE … ADD COLUMNS` through the injected parser. Data files
    * are immutable throughout — the schema-directed read backfills the
    * columns each file predates as typed NULLs, which is exactly what
    * the oracle asserts row-by-row. */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedEvolve.getOrElseUpdate(sfDir,
      graft.sources.Staging.tempDir("graft_txn_") + "/customer_evo")
    val cust = Sources.testTable(spark, sfDir, "customer")
    cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .write.format("graft").mode("overwrite").save(dir)         // v_n
    cust.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"))
      .write.format("graft").mode("append")
      .option("mergeSchema", "true").save(dir)                   // widened
    spark.sql(s"ALTER TABLE '$dir' ADD COLUMNS (c_flag STRING)") // metadata
    spark.read.format("graft").load(dir)
  }

  private val stagedVacuum =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Checkpoint + vacuum lifecycle. The staging deliberately reproduces
    * the log-truncation data-loss trap: appends are NOT self-contained
    * (each commit adds only its own files), so dropping their log entries
    * without a checkpoint would lose every pre-retention file from replay
    * even though vacuum correctly kept the files on disk. vacuum() writes
    * a checkpoint at the oldest retained version first, so the read after
    * truncation reconstructs the full live set from checkpoint + tail. */
  private def vacuumTable(spark: SparkSession, sfDir: String): String =
    stagedVacuum.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") + "/customer_vac"
      val cust = Sources.testTable(spark, sfDir, "customer")
      (0 until 4).foreach { i => // v0..v3: non-self-contained appends
        GraftLog.append(cust.filter(col("c_custkey") % 4 === i), dir)
      }
      GraftLog.delete(spark, dir, col("c_custkey") % 10 === 0) // v4
      GraftLog.vacuum(spark, dir, retainVersions = 2) // ckpt at v3, drop v0-2
      dir
    })

  /** t9 — read after vacuum truncated the appends' log entries: complete
    * iff checkpoint replay reconstructs the pre-truncation live set.
    * Oracle: the anti-filter over the full table (all four append slices
    * must survive, minus the deleted keys). */
  def afterVacuum(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.read(spark, vacuumTable(spark, sfDir))
      .select(customerCols.map(col): _*)

  private val stagedColumnarCkpt =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t25 — replay through the COLUMNAR (multi-part parquet) checkpoint:
    * twelve non-self-contained appends cross the auto-checkpoint cadence
    * at v10, whose columnar form the staging asserts on disk, then a
    * DELETE lands on top; the read reconstructs live state as
    * checkpoint-parquet scan + two-commit tail. Oracle: the modulo
    * anti-filter over the full table — complete iff the distributed
    * decode lost no add/stats/size row relative to the JSON encoding
    * (whose equivalence GraftLogSpec pins file-by-file). */
  def columnarCheckpointRead(spark: SparkSession, sfDir: String): DataFrame =
    GraftLog.read(spark,
      stagedColumnarCkpt.getOrElseUpdate(sfDir, {
        val dir =
          graft.sources.Staging.tempDir("graft_txn_") + "/customer_ckpt"
        val cust = Sources.testTable(spark, sfDir, "customer")
        (0 until 12).foreach { i => // v0..v11 cross the v10 auto-ckpt
          GraftLog.append(cust.filter(col("c_custkey") % 12 === i), dir)
        }
        val ckptDir = new java.io.File(
          s"$dir/_graft_log/00000000000000000010.checkpoint.parquet")
        require(ckptDir.isDirectory &&
          ckptDir.listFiles().exists(_.getName.endsWith(".parquet")),
          s"columnar checkpoint missing at $ckptDir")
        GraftLog.delete(spark, dir, col("c_custkey") % 7 === 0) // v12
        dir
      }))
      .select(customerCols.map(col): _*)

  /** Streaming ingest INTO the transactional format — the "streaming
    * write to a Delta table" piece of the reference's stack, and the one
    * place `foreachBatch` alone is not exactly-once: if the process dies
    * after the sink commit but before the checkpoint write, the restarted
    * query re-delivers the last batch. [[GraftLog.txnAppend]]'s
    * (appId, batchId) ledger makes the re-delivery a no-op.
    *
    * The steppable harness drives: land phase-1 files → drain a
    * checkpointed stream whose every batch is a `txnAppend` → "kill" →
    * restart with nothing new (no-op) → REPLAY the last delivered batch
    * out-of-band, simulating the crash-window re-delivery (ledger must
    * reject it) → land phase 2 → resume. Exactly-once iff the final
    * table aggregate equals the plain batch SQL over ALL events. */
  private[graft] final class GraftSinkHarness(
      spark: SparkSession, sfDir: String, mode: String = "append") {
    private val root = graft.sources.Staging.scratchDir("graft_sink_")
    private val (in, ckpt) = (s"$root/in", s"$root/ckpt")
    val table = s"$root/events_gl"
    private val appId = "graft-sink-harness"
    private val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
    // last batch foreachBatch delivered, kept so the spec/query can
    // replay it the way a crashed-then-restarted sink would
    @volatile private var lastBatch: Option[(DataFrame, Long)] = None

    /** One upsert row per key from a micro-batch: the latest event by
      * (us, event_id) — a unique, totally ordered pair, so the struct
      * max is deterministic. */
    private def mergeSource(batch: DataFrame): DataFrame =
      batch
        .select(col("user_id"), col("event_type"),
          struct(unix_micros(col("ts")).as("us"),
            col("event_id"), col("value")).as("evt"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(col("evt")).as("m"))
        .select(col("user_id"), col("event_type"),
          col("m.event_id").as("last_event_id"),
          col("m.value").as("last_value"))

    if (mode == "merge") // seed v0: typed empty table to merge into
      GraftLog.overwrite(
        mergeSource(ev).limit(0), table): Unit

    private def commit(df: DataFrame, batchId: Long): Boolean = mode match {
      case "append" => GraftLog.txnAppend(df, table, appId, batchId)
      case "merge" => GraftLog.txnMerge(mergeSource(df), table,
        Seq("user_id", "event_type"), appId, batchId) >= 0
    }

    def land(phase: Int): Unit =
      ev.filter(pmod(col("event_id"), lit(2)) === phase)
        .coalesce(2).write.mode("append").parquet(in)

    def runToDrain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          lastBatch.foreach(_._1.unpersist())
          lastBatch = Some((batch.persist(), batchId))
          commit(batch, batchId): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    /** Re-deliver the last batch (same data, same batch id) as a crashed
      * sink would on restart. Returns whether the ledger accepted it —
      * exactly-once demands false. */
    def replayLastBatch(): Boolean = {
      val (df, id) = lastBatch.getOrElse(
        throw new IllegalStateException("no batch delivered yet"))
      try commit(df, id)
      finally { df.unpersist(); () }
    }

    def tableFrame: DataFrame = GraftLog.read(spark, table)
  }

  /** t4 — the full kill/replay/resume cycle; returns the final table
    * aggregated by event_type (equal to the batch SQL over all events
    * iff every batch committed exactly once). */
  def streamingSink(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val h = new GraftSinkHarness(spark, sfDir)
    h.land(0); h.runToDrain() // phase 1, then "kill"
    h.runToDrain()            // restart, nothing new: no batch delivered
    require(!h.replayLastBatch(), // crash-window re-delivery must no-op
      "txn ledger accepted a duplicate batch")
    h.land(1); h.runToDrain() // resume over phase 2
    h.tableFrame
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sumExact(col("value")).cast("double"), 6).as("total_value"))
  }

  /** t7 — streaming MERGE INTO the transactional table: each micro-batch
    * upserts its per-key latest event through [[GraftLog.txnMerge]], with
    * the same kill/replay/resume cycle as t4. Batch 1 (odd event ids,
    * landed second) overwrites batch 0's row for every key it carries —
    * LAST BATCH WINS, regardless of event time — which is exactly Delta's
    * foreachBatch-MERGE semantics and what the oracle mirrors (phase
    * priority before in-phase recency). */
  def streamingMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val h = new GraftSinkHarness(spark, sfDir, mode = "merge")
    h.land(0); h.runToDrain()
    // The crash-window re-delivery reject IS the exactly-once invariant
    // and stays in the registered query. The empty-restart drain does
    // not: it re-pays full checkpoint/stream setup to deliver zero
    // batches (a third of t7's bench cost) and is pinned by
    // GraftLogSpec's steppable cycle instead.
    require(!h.replayLastBatch(),
      "txn ledger accepted a duplicate merge batch")
    h.land(1); h.runToDrain()
    h.tableFrame
  }

  private val stagedCdf =
    new scala.collection.concurrent.TrieMap[String, String]

  /** i16 — STREAMING CHANGE DATA FEED (`readStream.format("graft")
    * .option("readChangeFeed", true)`): the row-level change stream of
    * a transactional table, the Delta CDF streaming surface. Lineage:
    * v0 customer overwrite → v1 MERGE (updates + inserts) → v2
    * predicate DELETE. The stream is drained in TWO phases with a
    * shared checkpoint — the first sees v0's snapshot as `insert` rows
    * plus v1's merge diff; the restarted second resumes past the
    * committed offset and delivers ONLY v2's deletes — pinning both the
    * initial-snapshot semantics and exactly-once offset resume. Every
    * micro-batch is file-bounded ([[GraftLog.changesAt]]): commit v's
    * diff reads only the files v touched, never the table. */
  def cdfStream(spark: SparkSession, sfDir: String): DataFrame = {
    val out = stagedCdf.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_cdf_")
      val (table, ckpt, dest) =
        (s"$root/customer_cdf", s"$root/ckpt", s"$root/out")
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, table)                             // v0
      val batch = Incremental.incrementalBatch(spark, sfDir).select(
        col("inc_custkey").as("c_custkey"),
        col("inc_name").as("c_name"),
        col("inc_nationkey").as("c_nationkey"),
        col("inc_acctbal").as("c_acctbal"),
        col("inc_mktsegment").as("c_mktsegment"))
      GraftLog.merge(batch, table, Seq("c_custkey"))              // v1
      def drain(): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("cdfKeys", "c_custkey")
          .load(table)
          .writeStream.format("parquet")
          .option("path", dest)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // phase 1: initial snapshot (v0, inserts) + v1 merge diff
      GraftLog.delete(spark, table, col("c_custkey") % 10 === 0)  // v2
      drain() // restart: resumes at offset v1, delivers only v2 deletes
      dest
    })
    spark.read.parquet(out)
  }

  private val stagedApply =
    new scala.collection.concurrent.TrieMap[String, String]

  /** i25 — `applyChanges`: the CDF stream CONSUMED into a maintained
    * downstream table (Delta Live Tables' APPLY CHANGES INTO /
    * bronze→silver incremental materialization, the reference's
    * change-detection workload run continuously). The source table
    * mutates through its normal life (overwrite → MERGE → DELETE); the
    * target is maintained by the change feed ALONE:
    *
    *  - inserts/update_postimages of each commit version apply as ONE
    *    idempotent keyed merge ([[GraftLog.txnMerge]], appId fixed,
    *    batchId = the source commit version — deterministic across
    *    restarts, so a re-delivered batch is a ledger-rejected no-op)
    *  - deletes apply as a keyed rewrite delete (composable with the
    *    next batch's merge, unlike a DV mask, and idempotent in effect
    *    — a replayed delete finds nothing to remove)
    *  - versions inside one micro-batch apply in ascending order, so
    *    a delete can never be overtaken by the update it superseded
    *
    * The drain is two-phased with a kill/restart between the MERGE and
    * the DELETE commits (the i16 cycle): the restarted stream resumes
    * past the committed offset and applies ONLY the delete — pinning
    * exactly-once apply. Done = the target equals the source's final
    * state via the feed alone (the oracle replays that state). */
  def applyChangesStream(spark: SparkSession, sfDir: String): DataFrame = {
    val out = stagedApply.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_apply_")
      val (src, target, ckpt) =
        (s"$root/src", s"$root/target", s"$root/ckpt")
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, src)                               // v0
      val batch = Incremental.incrementalBatch(spark, sfDir).select(
        col("inc_custkey").as("c_custkey"),
        col("inc_name").as("c_name"),
        col("inc_nationkey").as("c_nationkey"),
        col("inc_acctbal").as("c_acctbal"),
        col("inc_mktsegment").as("c_mktsegment"))
      GraftLog.merge(batch, src, Seq("c_custkey"))                // v1
      GraftLog.overwrite(cust.limit(0), target) // empty, typed target
      def drain(): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("cdfKeys", "c_custkey")
          .load(src)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            val spark2 = b.sparkSession
            val vs = b.select(col("_commit_version")).distinct()
              .collect().map(_.getLong(0)).sorted
            vs.foreach { v =>
              val bv = b.filter(col("_commit_version") === v)
              val ups = bv.filter(col("_change_type")
                  .isin("insert", "update_postimage"))
                .drop("_change_type", "_commit_version")
              if (!ups.isEmpty)
                GraftLog.txnMerge(ups, target, Seq("c_custkey"),
                  "i25-apply", v)
              // deletes stay a FRAME end-to-end (GraftLog
              // .deleteMatching: semi-join probe + anti-join rewrite)
              // — a bulk GDPR batch never materializes its keys
              // driver-side the way a collected isin list would
              val delKeys = bv
                .filter(col("_change_type") === "delete")
                .select(col("c_custkey")).distinct()
              if (!delKeys.isEmpty)
                GraftLog.deleteMatching(spark2, target, delKeys,
                  Seq("c_custkey"))
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // phase 1: initial snapshot + the merge diff
      GraftLog.delete(spark, src, col("c_custkey") % 10 === 0)    // v2
      drain() // kill/restart: resumes past v1, applies only the delete
      target
    })
    GraftLog.read(spark, out)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
  }

  private val stagedCdfErase =
    new scala.collection.concurrent.TrieMap[String, String]

  /** i17 — streaming CDF over a GDPR-ERASURE sequence: v0 customer
    * overwrite → v1 deletion-vector erasure of a key batch
    * ([[GraftLog.deleteVectorsMatching]], the streaming-erasure shape:
    * each micro-batch of delete requests is one DV commit) → v2 DV
    * erasure by predicate. DV commits rewrite NO data files — the CDF
    * must still emit the newly-masked rows as `delete` changes, which
    * [[GraftLog.changesAt]] derives by diffing the DV-touched files'
    * VISIBLE rows across the adjacent versions (Delta CDF emits the
    * same deletes from its DV commits). Drained in two phases with a
    * restart between v1 and v2, pinning checkpoint resume over a
    * DV-only commit; v2's deletes must exclude rows v1 already erased
    * (they are invisible on the old side of the diff too).
    * Oracle: anti-join replay of the two erasure sets. */
  def cdfErasureStream(spark: SparkSession, sfDir: String): DataFrame = {
    val out = stagedCdfErase.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_cdfe_")
      val (table, ckpt, dest) =
        (s"$root/customer_cdfe", s"$root/ckpt", s"$root/out")
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, table)                             // v0
      GraftLog.deleteVectorsMatching(spark, table,                // v1
        cust.filter(col("c_custkey") % 10 === 3).select("c_custkey"),
        Seq("c_custkey"))
      def drain(): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("cdfKeys", "c_custkey")
          .load(table)
          .writeStream.format("parquet")
          .option("path", dest)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // phase 1: v0 snapshot inserts + v1 erasure deletes
      GraftLog.deleteVectors(spark, table,                        // v2
        col("c_mktsegment") === "BUILDING")
      drain() // restart past v1: only v2's still-visible deletes
      dest
    })
    spark.read.parquet(out)
  }

  private val stagedClone =
    new scala.collection.concurrent.TrieMap[String, (String, Int)]

  /** Stage the t23 clone lineage once per (JVM, corpus):
    * src v0 = customer overwrite, v1 = predicate delete (so the cloned
    * snapshot is not just the raw table); then the SQL surface
    * `CREATE TABLE '<dst>' SHALLOW CLONE '<src>'` — a zero-copy
    * metadata commit referencing src's live files absolutely — and an
    * independent append of the deterministic insert batch (the c4
    * NOT-EXISTS branch) to the CLONE only. Returns (clone dir, data
    * files under the clone's own root right after the clone commit —
    * the zero-copy contract, pinned as a column). Reference analog:
    * Delta's `SHALLOW CLONE` dev/test-sandbox flow on the same
    * transactional tables the reference stores
    * (`spark_session_factory.py:70`). */
  private def cloneTable(spark: SparkSession, sfDir: String)
      : (String, Int) =
    stagedClone.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_txn_")
      val src = root + "/customer_csrc"
      val dst = root + "/customer_clone"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, src)                              // v0
      GraftLog.delete(spark, src, col("c_custkey") % 10 === 0)   // v1
      spark.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$src'")
      def parquetsUnder(d: java.io.File): Int =
        if (!d.exists) 0
        else d.listFiles.toSeq.map { f =>
          if (f.isDirectory) parquetsUnder(f)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        }.sum
      val copied = parquetsUnder(new java.io.File(dst, "_data"))
      val inserts = Incremental.incrementalBatch(spark, sfDir).select(
          col("inc_custkey").as("c_custkey"),
          col("inc_name").as("c_name"),
          col("inc_nationkey").as("c_nationkey"),
          col("inc_acctbal").as("c_acctbal"),
          col("inc_mktsegment").as("c_mktsegment"))
        .join(cust.select("c_custkey"), Seq("c_custkey"), "left_anti")
      GraftLog.append(inserts.select(customerCols.map(col): _*), dst)
      (dst, copied)
    })

  private val stagedDeepClone =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t37 — DEEP CLONE independence: clone the v1 snapshot (post-delete)
    * with a physical distributed copy, then DESTROY the source (delete
    * everything + vacuum to one retained version). The clone must still
    * serve the full snapshot — the shallow-clone caveat (source vacuum
    * can strand a clone) closed by construction. `src_rows_now` pins
    * the source's destruction; `files_copied` pins that bytes actually
    * moved (the opposite pin of t23's zero-copy). */
  def deepCloneRead(spark: SparkSession, sfDir: String): DataFrame = {
    val dst = stagedDeepClone.getOrElseUpdate(sfDir, {
      val root = graft.sources.Staging.tempDir("graft_txn_")
      val src = root + "/customer_dcsrc"
      val d = root + "/customer_deep"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, src)                              // v0
      GraftLog.delete(spark, src, col("c_custkey") % 10 === 0)   // v1
      spark.sql(s"CREATE TABLE '$d' DEEP CLONE '$src'")
      // destroy the source: the deep clone must not notice
      GraftLog.delete(spark, src, lit(true))
      GraftLog.vacuum(spark, src, retainVersions = 1)
      d
    })
    def parquetsUnder(f: java.io.File): Int =
      if (!f.exists) 0
      else f.listFiles.toSeq.map { x =>
        if (x.isDirectory) parquetsUnder(x)
        else if (x.getName.endsWith(".parquet")) 1 else 0
      }.sum
    val copied = parquetsUnder(new java.io.File(dst, "_data"))
    val srcRows = GraftLog.read(spark,
      dst.stripSuffix("/customer_deep") + "/customer_dcsrc").count()
    GraftLog.read(spark, dst)
      .select(customerCols.map(col): _*)
      .withColumn("files_copied_positive", lit(copied > 0))
      .withColumn("src_rows_now", lit(srcRows))
  }

  private val stagedWiden =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t39 — TYPE WIDENING lifecycle: events land with an INT32 id (v0),
    * the column widens to BIGINT in one metadata-only commit (v1 —
    * `widen_files` pins that zero data files moved), and a batch whose
    * ids exceed int32 range appends WIDE (v2). The read proves the
    * Spark 4 parquet promotion path: v0's narrow pages decode under the
    * BIGINT schema next to v2's genuinely 64-bit values — the
    * "id column outgrew int" migration with no table rewrite. */
  def typeWidening(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedWiden.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_txn_") +
        "/events_widen"
      val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
        .select(col("event_id"), col("event_type"))
      GraftLog.overwrite(ev.filter(col("event_id") % 2 === 0)
        .withColumn("event_id", col("event_id").cast("int")), d)   // v0
      GraftLog.widenColumn(spark, d, "event_id",
        org.apache.spark.sql.types.LongType)                       // v1
      GraftLog.append(ev.filter(col("event_id") % 2 === 1)
        .withColumn("event_id", col("event_id") + 5000000000L), d) // v2
      d
    })
    val widenAdds = GraftLog.history(spark, dir)
      .filter(col("operation") === "widen_column")
      .select(col("n_added_files")).collect().head.getInt(0)
    GraftLog.read(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .withColumn("widen_files", lit(widenAdds))
  }

  private val stagedSpecEvolve =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t41 — PARTITION-SPEC EVOLUTION (Iceberg `REPLACE PARTITION
    * FIELD`): the even half of events lands under hidden `bucket(4,
    * event_id)` dirs (v0), ONE metadata-only commit evolves the current
    * spec to `bucket(8, event_id)` (v1), and the odd half appends under
    * the NEW spec (v2) — no data file moved. The read plans BOTH groups
    * in one scan: old files prune by their bucket(4) dir, new files by
    * bucket(8), per file (the numFiles pin lives in
    * GraftFileIndexSpec). `n_specs` pins the mixed layout actually
    * exists; the aggregate pins zero row loss across it. The
    * daily→hourly / bucket(16)→bucket(64) migration with zero
    * rewrite — the alternative IS the 100 TB scan. */
  def partitionEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedSpecEvolve.getOrElseUpdate(sfDir, {
      val d = graft.sources.Staging.tempDir("graft_txn_") +
        "/events_evolve"
      val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
      GraftLog.overwriteBucketTransform(
        ev.filter(col("event_id") % 2 === 0), d, "event_id", 4)   // v0
      GraftLog.evolveBucketSpec(spark, d, "event_id", 8)          // v1
      GraftLog.append(ev.filter(col("event_id") % 2 === 1), d)    // v2
      d
    })
    val specs = GraftLog.snapshot(spark, dir)._1
      .map(_.split('/').dropRight(1).filter(_.contains('='))
        .map(_.takeWhile(_ != '=')).mkString(","))
      .distinct.sorted
    GraftLog.read(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,10)")).cast("double"), 6)
          .as("total_value"))
      .withColumn("n_specs", lit(specs.size))
      .withColumn("spec_evolved",
        lit(specs == Seq("gfb4_event_id", "gfb8_event_id")))
  }

  private val stagedOptWrite =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t40 — OPTIMIZED WRITE (Delta `optimizeWrite`): two tables ingest
    * the SAME 32-task events batch partitioned by event_type. The
    * control table writes the batch's natural distribution — every task
    * slivers a file into every `event_type=` dir. The opted-in table
    * (`graft.optimizeWrite` = true) passes through an AQE REBALANCE on
    * the partition column first, so adaptive execution coalesces each
    * dir's rows into right-sized writers: ~one file per dir at this
    * scale. The pins: the optimized append commits ≤ 2× #dirs files
    * where the control commits ≥ 4× (prevention), and the row set is
    * IDENTICAL (layout-only — the oracle aggregates events directly).
    * The write-side complement of t38's auto-compaction repair. */
  def optimizedWrite(spark: SparkSession, sfDir: String): DataFrame = {
    val root = stagedOptWrite.getOrElseUpdate(sfDir, {
      val r = graft.sources.Staging.tempDir("graft_txn_")
      val ev = graft.streaming.Streaming.eventsBatch(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
      val batch = ev.repartition(32)
      for (t <- Seq("ow", "ctl")) {
        // v0: empty seed fixes schema + layout so the property can
        // exist BEFORE the measured write
        GraftLog.overwritePartitioned(ev.filter(col("event_id") < 0),
          s"$r/$t", Seq("event_type"))
        if (t == "ow") GraftLog.setProperties(spark, s"$r/$t",
          Map("graft.optimizeWrite" -> "true"))
        GraftLog.appendPartitioned(batch, s"$r/$t", Seq("event_type"))
      }
      r
    })
    def appendFiles(t: String): Int = GraftLog.history(spark, s"$root/$t")
      .filter(col("operation") === "append")
      .agg(max(col("n_added_files"))).collect().head.getInt(0)
    val nTypes = GraftLog.read(spark, s"$root/ow")
      .select(col("event_type")).distinct().count()
    val (owF, ctlF) = (appendFiles("ow"), appendFiles("ctl"))
    GraftLog.read(spark, s"$root/ow")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,10)")).cast("double"), 6)
          .as("total_value"))
      .withColumn("optimized_small", lit(owF <= 2 * nTypes))
      .withColumn("prevention_works", lit(owF < ctlF && ctlF >= 4 * nTypes))
  }

  private val stagedAutoCompact =
    new scala.collection.concurrent.TrieMap[String, String]

  /** t38 — write-path auto-compaction: a rolling ingest of 8 disjoint
    * customer slices into a table that opted into
    * `graft.autoCompact` (minNumFiles = 4). Each append lands ONE small
    * file; every fourth accumulation tips the threshold and the
    * post-commit hook folds the smalls into one rewrite-only
    * "autocompact" commit, so the live file count stays ≤ 4 FOREVER —
    * without the hook this layout grows one file per batch per hour
    * for the life of the pipeline (the small-files death spiral Delta's
    * autoCompact exists for). Pins: final live file count ≤ threshold
    * (`files_bounded`), ≥ 1 autocompact commit actually fired
    * (`compacted`), and row identity via the oracle (compaction must
    * never create, drop, or duplicate a row). */
  def autoCompactRolling(spark: SparkSession, sfDir: String): DataFrame = {
    val t = stagedAutoCompact.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_txn_") +
        "/customer_autoc"
      val cust = Sources.testTable(spark, sfDir, "customer")
        .select(customerCols.map(col): _*)
      GraftLog.overwrite(
        cust.filter(col("c_custkey") % 8 === 0).coalesce(1), dir) // v0
      GraftLog.setProperties(spark, dir, Map(
        "graft.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "4"))
      (1 until 8).foreach { i =>
        GraftLog.append(
          cust.filter(col("c_custkey") % 8 === i).coalesce(1), dir)
      }
      dir
    })
    val liveFiles = GraftLog.snapshot(spark, t)._1.size
    val compactions = GraftLog.history(spark, t)
      .filter(col("operation") === "autocompact").count()
    GraftLog.read(spark, t)
      .select(customerCols.map(col): _*)
      .withColumn("files_bounded", lit(liveFiles <= 4))
      .withColumn("compacted", lit(compactions >= 1))
  }

  private val stagedLiquid =
    new scala.collection.concurrent.TrieMap[String, (String, Long, Long)]

  /** t42 — LIQUID (incremental) clustering: orders lands in four waves
    * into a table declaring `graft.clusterBy = o_custkey`; an OPTIMIZE
    * after wave 2 clusters waves 1-2 into zcube A, an OPTIMIZE after
    * wave 4 clusters ONLY waves 3-4 into zcube B — the second run reads
    * none of zcube A's files (pinned: `second_run_files` = the wave-3/4
    * file count, not the table's). Contrast OPTIMIZE ZORDER (t21),
    * which rewrites the whole table every maintenance cycle — O(table)
    * per run vs this O(new data), the difference between a nightly
    * maintenance job that costs a constant and one that grows with the
    * lake. Row identity is the oracle (clustering must never create,
    * drop, or duplicate a row); file-level incrementality + probe
    * pruning are pinned in GraftLogSpec. */
  def liquidClustering(spark: SparkSession, sfDir: String): DataFrame = {
    val (t, firstRewrote, secondRewrote) =
      stagedLiquid.getOrElseUpdate(sfDir, {
        val dir = graft.sources.Staging.tempDir("graft_txn_") +
          "/orders_liquid"
        val ords = Sources.testTable(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"))
        def wave(i: Int) =
          ords.filter(col("o_orderkey") % 4 === i).coalesce(1)
        GraftLog.overwrite(wave(0), dir)                         // v0
        GraftLog.setProperties(spark, dir,
          Map("graft.clusterBy" -> "o_custkey"))                 // v1
        GraftLog.append(wave(1), dir)                            // v2
        val v3 = GraftLog.clusterIncremental(spark, dir,
          targetFiles = 2, minFiles = 1)
        val first = v3.map(v => GraftLog.history(spark, dir)
          .filter(col("version") === v).select("n_removed_files")
          .head().getInt(0).toLong).getOrElse(0L)
        GraftLog.append(wave(2), dir)                            // v4
        GraftLog.append(wave(3), dir)                            // v5
        val v6 = GraftLog.clusterIncremental(spark, dir,
          targetFiles = 2, minFiles = 1)
        val second = v6.map(v => GraftLog.history(spark, dir)
          .filter(col("version") === v).select("n_removed_files")
          .head().getInt(0).toLong).getOrElse(0L)
        (dir, first, second)
      })
    GraftLog.read(spark, t)
      .withColumn("first_run_files", lit(firstRewrote))
      .withColumn("second_run_files", lit(secondRewrote))
  }

  private val stagedCmap =
    new scala.collection.concurrent.TrieMap[String, (String, Int)]

  /** Stage the t24 column-mapping lineage once per (JVM, corpus):
    * v0 = customer overwrite; v1 = RENAME COLUMN c_name→cust_name and
    * v2 = DROP COLUMN c_mktsegment — both METADATA-ONLY commits (the
    * number of data files they add is captured and pinned at 0); v3 =
    * an append arriving with the new LOGICAL schema (staged under the
    * physical names, the Delta column-mapping write path); v4 = a
    * predicate DELETE resolving the logical names over the physical
    * scan. Returns (table dir, data files written by the two schema
    * commits). */
  private def cmapTable(spark: SparkSession, sfDir: String)
      : (String, Int) =
    stagedCmap.getOrElseUpdate(sfDir, {
      val dir =
        graft.sources.Staging.tempDir("graft_txn_") + "/customer_cmap"
      val cust = Sources.testTable(spark, sfDir, "customer")
      GraftLog.overwrite(cust, dir)                               // v0
      def parquetsUnder(d: java.io.File): Int =
        if (!d.exists) 0
        else d.listFiles.toSeq.map { f =>
          if (f.isDirectory) parquetsUnder(f)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        }.sum
      val before = parquetsUnder(new java.io.File(dir, "_data"))
      GraftLog.renameColumn(spark, dir, "c_name", "cust_name")    // v1
      GraftLog.dropColumn(spark, dir, "c_mktsegment")             // v2
      val metaAdded =
        parquetsUnder(new java.io.File(dir, "_data")) - before
      val inserts = Incremental.incrementalBatch(spark, sfDir).select(
          col("inc_custkey").as("c_custkey"),
          col("inc_name").as("cust_name"),
          col("inc_nationkey").as("c_nationkey"),
          col("inc_acctbal").as("c_acctbal"))
        .join(cust.select("c_custkey"), Seq("c_custkey"), "left_anti")
      GraftLog.append(inserts, dir)                               // v3
      GraftLog.delete(spark, dir, col("c_custkey") % 7 === 0)     // v4
      (dir, metaAdded)
    })

  /** t24 — column mapping: the table after a metadata-only RENAME +
    * DROP, a logical-schema append and a logical-name DELETE, with the
    * number of data files the two schema commits wrote pinned at 0.
    * Oracle re-derives the same rows relationally (rename = SQL alias,
    * drop = projection); `ColumnMappingSpec` additionally pins stats
    * keying, DV composition, compact materialization and restore. */
  def columnMappingRead(spark: SparkSession, sfDir: String): DataFrame = {
    val (dir, metaAdded) = cmapTable(spark, sfDir)
    GraftLog.read(spark, dir)
      .select(col("c_custkey"), col("cust_name"), col("c_nationkey"),
        col("c_acctbal"))
      .withColumn("n_meta_files", lit(metaAdded))
  }

  /** t23 — SHALLOW CLONE: the clone (source snapshot minus the deleted
    * keys, plus the insert batch appended to the clone alone) with the
    * number of data files the clone COPIED pinned at 0 — cloning is a
    * metadata commit, never a data move. Oracle re-derives the same
    * rows relationally; `ShallowCloneSpec` additionally pins source
    * independence, compact-detach, and vacuum safety. */
  def cloneRead(spark: SparkSession, sfDir: String): DataFrame = {
    val (dst, copied) = cloneTable(spark, sfDir)
    GraftLog.read(spark, dst)
      .select(customerCols.map(col): _*)
      .withColumn("n_copied_files", lit(copied))
  }
}
