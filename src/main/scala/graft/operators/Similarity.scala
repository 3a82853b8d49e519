package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Similarity search over the embedding column (BASELINE.json north star).
  *
  * Two tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *     batch against a single scan of the corpus, rank per query with a
  *     window. The corpus is never shuffled; per-query ranking parallelizes
  *     across queries. Exact baseline + DuckDB oracle.
  *   - [[lshTopK]] — random-hyperplane (SimHash-for-vectors) LSH: L
  *     signature tables of b bits; candidates are pairs sharing a table
  *     signature, then exact cosine re-ranking among candidates only. At
  *     100 TB the corpus signature table is computed once in a narrow pass
  *     and the probe is an equi-join on (table, signature) — sublinear
  *     candidate volume replaces the O(|Q|·n) score matrix.
  *
  * Vectors are float-from-parquet promoted to double; dot products are
  * strict left folds (see [[Dedup.dot]]) so scores are engine-portable.
  * Literature: random-hyperplane LSH (Charikar 2002, STOC); IVF coarse
  * quantization (Jegou/Douze/Schmid 2011, TPAMI — the inverted-file part,
  * without product quantization).
  */
object Similarity {

  /** The shared (vec_id, v, norm) frame every embedding operator builds
    * on — ONE definition (Dedup reuses it), so a normalization change
    * can't silently diverge between operators and their common oracle
    * CTE. Persisted: every consumer scans it at least twice. */
  private[operators] def normed(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
      .transform(graft.CacheScope.tracked)

  /** Exact cosine top-k neighbors for every query vector (vec_id <
    * numQueries), deterministic tiebreak (score desc, neighbor id asc). */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    val corpus = normed(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val scored = corpus.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** IVF-style ANN: coarse-quantize the corpus to `nCent` centroid cells
    * (centroids = the first nCent corpus vectors — deterministic and
    * relational, so the whole operator is DuckDB-oracle-checkable; a
    * k-means refinement would only move the centroids, not the plumbing),
    * then probe the `nprobe` cells nearest each query and re-rank
    * candidates with the exact cosine.
    *
    * Scale shape: assignment is a broadcast of nCent centroids over one
    * corpus scan (narrow, no corpus shuffle); the probe join is a
    * hash-partitioned equi-join on cent_id touching ~nprobe/nCent of the
    * corpus per query. The inverted-file layout would be persisted
    * (partitioned by cent_id) in a real deployment so probes prune files.
    */
  def ivfTopK(spark: SparkSession, sfDir: String, numQueries: Int = 10,
      k: Int = 5, nCent: Int = 16, nprobe: Int = 4): DataFrame = {
    val corpus = normed(spark, sfDir)
    val cents = seedCentroids(corpus, nCent)
    ivfSearch(corpus, cents, numQueries, k, nprobe)
  }

  /** f12 — FILTERED ANN: top-k among corpus vectors satisfying a
    * metadata predicate (here: sharing the query's `label` — the
    * tenant/language/split constraint every production vector search
    * carries). The predicate is applied to candidates INSIDE the probed
    * cells (pre-filter), not to the ranked answer (post-filter): a
    * post-filter over-fetches k·C candidates hoping enough survive and
    * still under-fills when the predicate is selective, while the
    * pre-filter ranks exactly the matching set — deterministic answer
    * size, no recall cliff.
    *
    * Scale shape: identical dataflow to [[ivfTopK]] (broadcast
    * centroids, one corpus scan, hash equi-join on cent_id) plus one
    * codegen'd equality on the candidate stream; over the f10 persisted
    * index the label filter additionally prunes row groups via parquet
    * min/max stats inside each probed `cent_id=<n>/` partition — the
    * two prunings compose multiplicatively. */
  def ivfFilteredTopK(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nCent: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val corpus = Sources.testTable(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
      .transform(graft.CacheScope.tracked)
    val cents = seedCentroids(corpus, nCent)
    val assigned = nearestCents(corpus, cents, "vec_id", 1)
      .select(col("vec_id"), col("cent_id"), col("v"), col("norm"),
        col("label"))
    val probes = nearestCents(
      corpus.filter(col("vec_id") < numQueries), cents, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"),
        col("label").as("qlabel"))
    val cand = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label") === col("qlabel"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("qlabel").as("label"),
        col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  private val stagedIvfIndex =
    new scala.collection.concurrent.TrieMap[String, String]

  /** Root of the staged f10 index for a corpus, if built (spec probe). */
  private[graft] def indexRootFor(sfDir: String): Option[String] =
    stagedIvfIndex.get(sfDir)

  /** f10 — the PERSISTED IVF index: a real 100 TB ANN deployment builds
    * its index once and queries it many times, so the inverted file is
    * MATERIALIZED as a graft table hive-partitioned by cell
    * (`cent_id=<n>/` — probing is literal partition pruning in the
    * planner) with the centroid table as a small sidecar graft table
    * (broadcast at query time, the codebook pattern). The query path
    * reads NOTHING but the sidecar and the probed cells: probe cells
    * are ranked from the broadcast centroids, the distinct probed-cell
    * set (≤ nprobe × numQueries ids — metadata-sized, the same
    * justified-driver-list shape as the DML probe pruning) becomes an
    * `isin` partition filter on the index table, and the exact-cosine
    * re-rank runs over those cells only. Same centroids, assignment,
    * and tiebreaks as [[ivfTopK]], so f10 shares f3's oracle verbatim —
    * the persisted index changes WHERE the bytes live, never the
    * answer.
    *
    * Measured (BenchOne 3-rep, sf0.1, local[32]): build+stage 7.1 s
    * once, then query-only 0.80-0.91 s vs f3's build-inclusive
    * 0.87-1.07 s warm. The margin is thin HERE because assigning 2000
    * vectors to 16 cells is a sub-second broadcast pass — at sandbox
    * scale both queries sit near the multi-job scheduling floor. The
    * term the persisted index deletes grows with the CORPUS (the
    * full-corpus assignment scan + per-vector window rank, the dominant
    * cost at 100 TB where the index is petabyte-shaped), while the
    * query path it keeps grows only with cells probed: the probed-cell
    * `isin` prunes whole `cent_id=<n>/` partitions in the planner, so
    * bytes read per query are |probed cells| / nCent of the index
    * regardless of corpus size. */
  def ivfIndexedTopK(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nCent: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import graft.sources.GraftLog
    val root = stagedIvfIndex.getOrElseUpdate(sfDir, {
      val dir = graft.sources.Staging.tempDir("graft_ivf_idx_")
      val corpus = normed(spark, sfDir)
      val cents = seedCentroids(corpus, nCent)
      // build ONCE: cell assignment partitioned by cell, codebook sidecar
      GraftLog.overwritePartitioned(
        nearestCents(corpus, cents, "vec_id", 1)
          .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
        s"$dir/cells", Seq("cent_id"))
      GraftLog.overwrite(cents, s"$dir/centroids")
      dir
    })
    val cents = broadcast(GraftLog.read(spark, s"$root/centroids"))
    val probes = nearestCents(
      normed(spark, sfDir).filter(col("vec_id") < numQueries),
      cents, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"))
      .transform(graft.CacheScope.tracked)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0)) // metadata-sized (≤ nprobe×queries)
    val cells = spark.read.format("graft").load(s"$root/cells")
      .filter(col("cent_id").isin(probedCells: _*))
    val cand = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** f14 — ERASURE-AWARE persisted index: deleted vectors LEAVE the
    * index as one transactional DML commit, no rebuild. A training-data
    * pipeline that honors deletion requests must erase embeddings from
    * its ANN index too — here the index IS a graft table, so
    * `GraftLog.delete` rewrites exactly the cell files holding erased
    * ids (file-pruned like every DML) and the probe path is untouched:
    * post-erasure answers are BIT-IDENTICAL to an index rebuilt without
    * the erased vectors (the oracle replays that rebuild), and a query
    * racing the erasure sees the old or the new index, never a torn
    * cell (snapshot isolation). At 100 TB this is the difference
    * between a petabyte index rebuild per erasure batch and one
    * pruned rewrite commit. `deleted_absent` pins the result-level
    * contract. */
  def ivfIndexDeleteTopK(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nCent: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import graft.sources.GraftLog
    val dir = graft.sources.Staging.scratchDir("graft_ivf_del_")
    val corpus = normed(spark, sfDir)
    val cents0 = seedCentroids(corpus, nCent)
    GraftLog.overwritePartitioned(
      nearestCents(corpus, cents0, "vec_id", 1)
        .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
      s"$dir/cells", Seq("cent_id"))
    GraftLog.overwrite(cents0, s"$dir/centroids")
    // the erasure wave: one file-pruned transactional DML on the index
    GraftLog.delete(spark, s"$dir/cells", col("vec_id") % 5 === 0)
    val cents = broadcast(GraftLog.read(spark, s"$dir/centroids"))
    val probes = nearestCents(
      normed(spark, sfDir).filter(col("vec_id") < numQueries),
      cents, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"))
      .transform(graft.CacheScope.tracked)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    val cells = spark.read.format("graft").load(s"$dir/cells")
      .filter(col("cent_id").isin(probedCells: _*))
    val cand = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val topk = cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
      .transform(graft.CacheScope.tracked)
    val leaked = topk.filter(col("neighbor_id") % 5 === 0).count()
    topk.withColumn("deleted_absent", lit(leaked == 0L))
  }

  private val stagedStreamErase =
    new scala.collection.concurrent.TrieMap[String, (String, Long, Boolean)]

  /** f15 — STREAMING GDPR erasure for the persisted ANN index: f14's
    * erasure arrives as a TOPIC of deletion requests drained by a
    * checkpointed stream, each micro-batch landing as ONE
    * deletion-vector commit on the index cells
    * ([[graft.sources.GraftLog.deleteVectorsMatching]] — no cell file
    * rewritten while requests drain; the final compaction
    * materializes), gated EXACTLY-ONCE by an erasure ledger: every
    * applied batch appends a ledger-stamped (appId, batchId) row to a
    * sidecar graft table, and a batch at-or-below the ledger
    * high-water — a crash-window re-delivery, or a full
    * checkpoint-LOSS redrain — is skipped entirely (the i30
    * double-ledger discipline: engine checkpoints are transport state,
    * the ledger is table state). The two waves split f14's erased set
    * (%10==0 then %10==5, union %5==0); wave 2 RESUMES the same
    * checkpoint (the kill/restart pin) and the post-drain redrain from
    * a fresh checkpoint must leave both the cells and the ledger at
    * their pre-redrain versions (`replay_noop`). Post-erasure answers
    * are BIT-IDENTICAL to an index rebuilt without the erased vectors
    * (f14's oracle, `n_erased`/`replay_noop` pinned on top). At 100 TB
    * this is a continuously-draining erasure SLA: cost per request
    * batch = the DV-masked rows' file probes, never an index rebuild,
    * and re-deliveries never double-commit. */
  def ivfIndexStreamingErasure(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nCent: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import graft.sources.GraftLog
    val (root, nErased, replayNoop) =
      stagedStreamErase.getOrElseUpdate(sfDir, {
        val dir = graft.sources.Staging.tempDir("graft_ivf_se_")
        val (cellsT, ledger, topic) =
          (s"$dir/cells", s"$dir/erase_ledger", s"$dir/topic")
        val corpus = normed(spark, sfDir)
        val cents0 = seedCentroids(corpus, nCent)
        GraftLog.overwritePartitioned(
          nearestCents(corpus, cents0, "vec_id", 1)
            .select(col("cent_id"), col("vec_id"), col("v"),
              col("norm")),
          cellsT, Seq("cent_id"))
        GraftLog.overwrite(cents0, s"$dir/centroids")
        val appId = "graft-ivf-erase"
        def requests(pred: org.apache.spark.sql.Column) = corpus
          .filter(pred)
          .select(col("vec_id").cast("string").as("key"),
            concat_ws("|", lit("erase"), col("vec_id")).as("value"),
            expr("timestamp_micros(0)").as("timestamp"), col("vec_id"))
        def drain(ckpt: String): Unit = {
          val q = graft.sources.Topic.readStream(spark, topic, 4)
            .writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              val sp = batch.sparkSession
              // the erasure ledger is the exactly-once gate: at or
              // below its high-water means this batch's DV commit
              // already landed — skip (re-delivery or redrain)
              if (!batch.isEmpty &&
                  !GraftLog.lastCommittedBatch(sp, ledger, appId)
                    .exists(_ >= batchId)) {
                val keys = batch.select(
                  split(col("value"), "\\|").getItem(1).cast("long")
                    .as("vec_id"))
                // rows this wave masks = live index rows matching the
                // requested keys (the read applies prior waves' DVs,
                // so a key erased twice counts once)
                val masked = GraftLog.read(sp, cellsT)
                  .join(broadcast(keys.distinct()), Seq("vec_id"),
                    "left_semi").count()
                GraftLog.deleteVectorsMatching(sp, cellsT,
                  keys, Seq("vec_id")): Unit
                GraftLog.txnAppend(
                  sp.range(1).select(lit(batchId).as("batch_id"),
                    lit(masked).as("n_masked")),
                  ledger, appId, batchId): Unit
              }
              ()
            }
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        graft.sources.Topic.produce(spark, topic,
          requests(col("vec_id") % 10 === 0), 4, col("vec_id"))
        drain(s"$dir/ckpt")                    // wave 1
        graft.sources.Topic.produce(spark, topic,
          requests(col("vec_id") % 10 === 5), 4, col("vec_id"))
        drain(s"$dir/ckpt")                    // wave 2: resume (kill/restart)
        val before = (GraftLog.latestVersion(spark, cellsT),
          GraftLog.latestVersion(spark, ledger))
        drain(s"$dir/ckpt_lost")               // checkpoint loss: full redrain
        val noop = before == (GraftLog.latestVersion(spark, cellsT),
          GraftLog.latestVersion(spark, ledger))
        GraftLog.compact(spark, cellsT, targetFiles = 2) // materialize DVs
        val erased = GraftLog.read(spark, ledger)
          .agg(sum(col("n_masked"))).head.getLong(0)
        (dir, erased, noop)
      })
    val cents = broadcast(GraftLog.read(spark, s"$root/centroids"))
    val probes = nearestCents(
      normed(spark, sfDir).filter(col("vec_id") < numQueries),
      cents, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"))
      .transform(graft.CacheScope.tracked)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    val cells = spark.read.format("graft").load(s"$root/cells")
      .filter(col("cent_id").isin(probedCells: _*))
    val cand = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val topk = cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
      .transform(graft.CacheScope.tracked)
    val leaked = topk.filter(col("neighbor_id") % 5 === 0).count()
    topk.withColumn("deleted_absent", lit(leaked == 0L))
      .withColumn("n_erased", lit(nErased))
      .withColumn("replay_noop", lit(replayNoop))
  }

  /** f11 — INCREMENTAL index update: new vectors join a live persisted
    * IVF index WITHOUT a rebuild. The index is built over the corpus
    * (vec_id < split) as in f10 — cells hive-partitioned, codebook
    * sidecar; the batch is then assigned against the BROADCAST codebook
    * alone and APPENDED into its cell partitions
    * ([[graft.sources.GraftLog.appendPartitioned]] routes each vector's
    * row into its `cent_id=<n>/` dir). Cost of the update is
    * O(batch × nCent) — the corpus is never re-read, re-assigned, or
    * re-shuffled, which is the property that lets a petabyte index
    * absorb a daily crawl in minutes. Centroids stay FIXED (the
    * standard IVF production posture; periodic re-train is a separate
    * offline job), so index state after the append is BIT-IDENTICAL to
    * a full rebuild over corpus+batch — the split is invisible in the
    * answer, and f11 shares f3's oracle verbatim. The transactional
    * append also means a query racing the update sees either the old
    * or the new index, never a torn cell. */
  def ivfIndexIncrementalTopK(spark: SparkSession, sfDir: String,
      split: Long = 350, numQueries: Int = 10, k: Int = 5,
      nCent: Int = 16, nprobe: Int = 4): DataFrame = {
    import graft.sources.GraftLog
    val dir = graft.sources.Staging.scratchDir("graft_ivf_inc_")
    val all = normed(spark, sfDir)
    val corpus = all.filter(col("vec_id") < split)
    // build over the corpus only (f10's shape)
    val cents = seedCentroids(corpus, nCent)
    GraftLog.overwritePartitioned(
      nearestCents(corpus, cents, "vec_id", 1)
        .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
      s"$dir/cells", Seq("cent_id"))
    GraftLog.overwrite(cents, s"$dir/centroids")
    // incremental: batch assigned against the sidecar codebook only,
    // appended into the cell partitions — one commit, no rebuild
    val cb = broadcast(GraftLog.read(spark, s"$dir/centroids"))
    GraftLog.appendPartitioned(
      nearestCents(all.filter(col("vec_id") >= split), cb, "vec_id", 1)
        .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
      s"$dir/cells", Seq("cent_id"))
    // query the updated index (f10's path)
    val probes = nearestCents(
      all.filter(col("vec_id") < numQueries), cb, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"))
      .transform(graft.CacheScope.tracked)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    val cells = spark.read.format("graft").load(s"$dir/cells")
      .filter(col("cent_id").isin(probedCells: _*))
    val cand = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** f13 — index maintenance: OCCUPANCY AUDIT + threshold-triggered
    * RETRAIN. f11's production posture (fixed centroids, incremental
    * appends) silently decays as the corpus drifts: new vectors crowd
    * into few cells, so probes either read bloated cells (cost) or
    * miss neighbors parked behind stale centroids (recall). This
    * operator closes the loop: a drifted batch (every component
    * shifted +1.0 — all newcomers pull toward one direction, the
    * adversarial shape for a fixed codebook) is appended the f11 way;
    * the AUDIT is one metadata-shaped aggregation over the index
    * (per-cell counts → skew = max/avg — at 100 TB this reads cell
    * row-counts, not vectors, and could come straight from the commit
    * log's per-file numRecords); when skew crosses the threshold the
    * index RETRAINS — one Lloyd sweep from the deterministic seed over
    * the index contents (the f4 machinery) — and both tables rewrite
    * via transactional overwrites, so a query racing the retrain sees
    * the old or the new index, never a torn one. The pre-retrain skew
    * and the trigger decision ride the result as pinned columns; the
    * spec pins post-retrain recall at/above the f3 band on the drifted
    * corpus. */
  def ivfRetrainTopK(spark: SparkSession, sfDir: String,
      split: Long = 350, numQueries: Int = 10, k: Int = 5,
      nCent: Int = 16, nprobe: Int = 4,
      skewThreshold: Double = 2.0): DataFrame = {
    import graft.sources.GraftLog
    val dir = graft.sources.Staging.scratchDir("graft_ivf_drift_")
    val base = normed(spark, sfDir)
    val corpus = base.filter(col("vec_id") < split)
    // f10 build over the pre-drift corpus
    val cents0 = seedCentroids(corpus, nCent)
    GraftLog.overwritePartitioned(
      nearestCents(corpus, cents0, "vec_id", 1)
        .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
      s"$dir/cells", Seq("cent_id"))
    GraftLog.overwrite(cents0, s"$dir/centroids")
    // drifted batch, appended with FIXED centroids (f11's posture)
    val drifted = base.filter(col("vec_id") >= split)
      .withColumn("v", transform(col("v"), x => x + lit(1.0)))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
    val cb = broadcast(GraftLog.read(spark, s"$dir/centroids"))
    GraftLog.appendPartitioned(
      nearestCents(drifted, cb, "vec_id", 1)
        .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
      s"$dir/cells", Seq("cent_id"))
    // occupancy audit: cell counts only — never vector payloads
    val occStats = spark.read.format("graft").load(s"$dir/cells")
      .groupBy(col("cent_id")).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("mx"), avg(col("cnt")).as("av"))
      .collect().head
    val skew = occStats.getLong(0).toDouble / occStats.getDouble(1)
    val retrain = skew > skewThreshold
    require(retrain,
      f"f13 expects the drift to trip the occupancy trigger " +
        f"(skew=$skew%.3f <= $skewThreshold)")
    // retrain: one Lloyd sweep from the deterministic seed over the
    // CURRENT index contents, then transactional index swap
    val full = spark.read.format("graft").load(s"$dir/cells")
      .select(col("vec_id"), col("v"), col("norm"))
      .transform(graft.CacheScope.tracked)
    val cents1 = lloydSweeps(full, seedCentroids(full, nCent), 1)
    GraftLog.overwritePartitioned(
      nearestCents(full, cents1, "vec_id", 1)
        .select(col("cent_id"), col("vec_id"), col("v"), col("norm")),
      s"$dir/cells", Seq("cent_id"))
    GraftLog.overwrite(cents1, s"$dir/centroids")
    // query the retrained index through the f10 path
    val cb1 = broadcast(GraftLog.read(spark, s"$dir/centroids"))
    val probes = nearestCents(
      full.filter(col("vec_id") < numQueries), cb1, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"))
      .transform(graft.CacheScope.tracked)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    val cells = spark.read.format("graft").load(s"$dir/cells")
      .filter(col("cent_id").isin(probedCells: _*))
    val cand = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
      .withColumn("occ_skew_pre", round(lit(skew), 6))
      .withColumn("retrained", lit(true))
  }

  /** Seed centroids = the first `nCent` corpus vectors — deterministic
    * and relational (shared by f3 and f4's iteration 0). */
  private[operators] def seedCentroids(corpus: DataFrame, nCent: Int): DataFrame =
    corpus.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"),
        col("norm").as("cnorm"))

  /** Nearest-centroid ranking (cosine argmax, cent_id tiebreak): a
    * broadcast of the centroid table over one scan of `df` — the
    * assignment step never shuffles the corpus. */
  private[operators] def nearestCents(df: DataFrame, cents: DataFrame,
      idCol: String, keep: Int): DataFrame = {
    val scored = df.join(broadcast(cents))
      .withColumn("csim",
        Dedup.dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("csim").desc, col("cent_id").asc)
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
  }

  /** Shared IVF probe/re-rank tail: assign the corpus to cells once, probe
    * the `nprobe` nearest cells per query, exact-cosine re-rank. */
  private def ivfSearch(corpus: DataFrame, cents: DataFrame,
      numQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val assigned = nearestCents(corpus, cents, "vec_id", 1)
      .select(col("vec_id"), col("cent_id"), col("v"), col("norm"))
    val probes = nearestCents(
      corpus.filter(col("vec_id") < numQueries), cents, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("v").as("qv"), col("norm").as("qnorm"))

    val cand = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** f9 — the recall-vs-nprobe CURVE (the quality/cost dial every IVF
    * deployment tunes): recall@k of [[ivfTopK]] against the exact
    * [[bruteForceTopK]] answer at each nprobe in `probeGrid`, one output
    * row per grid point. Monotone non-decreasing by construction (a
    * larger probe set is a superset of candidates), reaching 1.0 at
    * nprobe = nCent (probing every cell IS the exhaustive search) — so
    * the f3/f8 default (nprobe=4, recall≈0.94 on this corpus) is
    * driver-visible as one point on a curve, not an unexplained constant.
    *
    * Scale shape: cell assignment and the per-query probe RANKING are
    * computed ONCE (same broadcast-of-centroids pattern as f3); the grid
    * expands only the broadcast-sized probe frame (`crank <= nprobe`
    * theta join on ~numQueries·nCent rows), so the corpus is scanned
    * once regardless of grid size. */
  def ivfRecallCurve(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nCent: Int = 16,
      probeGrid: Seq[Int] = Seq(2, 4, 8, 16)): DataFrame = {
    import spark.implicits._
    val corpus = normed(spark, sfDir)
    val cents = seedCentroids(corpus, nCent)
    val assigned = nearestCents(corpus, cents, "vec_id", 1)
      .select(col("vec_id"), col("cent_id"), col("v"), col("norm"))
    // full probe ranking 1..nCent per query, once
    val probeRanks = nearestCents(
      corpus.filter(col("vec_id") < numQueries), cents, "vec_id", nCent)
      .select(col("vec_id").as("query_id"), col("cent_id"), col("crank"),
        col("v").as("qv"), col("norm").as("qnorm"))
    val probes = probeRanks.join(broadcast(probeGrid.toDF("nprobe")),
      col("crank") <= col("nprobe"))
    val cand = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val ivf = cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("nprobe"), col("query_id"),
        col("vec_id").as("neighbor_id"))
    val exact = bruteForceTopK(spark, sfDir, numQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    ivf.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("recall", round(
        col("n_hits").cast("double") / lit((numQueries * k).toDouble), 6))
  }

  /** f4 — [[ivfTopK]] with `iters` Lloyd (k-means) refinement sweeps over
    * the seed centroids before the probe: assign every vector to its
    * nearest centroid, recompute each centroid as the per-dimension MEAN
    * of its members, repeat. Better-centered cells raise recall at the
    * same nprobe (pinned in SimilaritySpec against f3).
    *
    * Scale + determinism shape of one sweep:
    *   - assignment: broadcast-centroids over one corpus scan (narrow);
    *   - mean: posexplode to (cent_id, dim) and aggregate with EXACT
    *     decimal sums ([[graft.functions.Deterministic.sumExact]]) — a
    *     double sum's value depends on partition order, which would make
    *     the refined centroids (and every downstream ranking) flaky; the
    *     decimal sum is associative, so the shuffle carries nCent·dim
    *     partial buffers and the result is bit-stable at any parallelism.
    *   Every step is relational, so the DuckDB oracle unrolls the sweeps
    *   as CTEs and reproduces the output exactly — empty cells drop out
    *   of the groupBy on both sides identically (standard Lloyd keeps
    *   them at their old position; dropping is the simpler contract and
    *   the next assignment redistributes their members).
    * Each sweep costs one scan + one (nCent·dim)-key shuffle; `iters`
    * stays a small constant (Lloyd converges fast; IVF needs centered
    * cells, not convergence). */
  /** `iters` Lloyd sweeps from `cents0` over `corpus` — assignment by
    * max cosine (deterministic tiebreak), per-dimension EXACT-decimal
    * mean cast back to double, identical expression tree to the
    * oracle's lloydCtes. Shared by f4 and the f13 retrain. */
  private[operators] def lloydSweeps(corpus: DataFrame,
      cents0: DataFrame, iters: Int): DataFrame = {
    import graft.functions.Deterministic.sumExact
    var cents = cents0
    for (_ <- 0 until iters) {
      val members = nearestCents(corpus, cents, "vec_id", 1)
        .select(col("cent_id"), col("v"))
      val dimMeans = members
        .select(col("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(sumExact(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .withColumn("m",
          col("sx").cast("double") / col("cnt").cast("double"))
      cents = dimMeans.groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), p => p.getField("m")).as("cv"))
        .withColumn("cnorm", sqrt(Dedup.dot(col("cv"), col("cv"))))
    }
    cents
  }

  def ivfKmeansTopK(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nCent: Int = 16, nprobe: Int = 4,
      iters: Int = 2): DataFrame = {
    val corpus = normed(spark, sfDir)
    val cents = lloydSweeps(corpus, seedCentroids(corpus, nCent), iters)
    ivfSearch(corpus, cents, numQueries, k, nprobe)
  }

  // Memoized per (sfDir, tables, bits) for the JVM lifetime. Assumption:
  // the embeddings file at sfDir is immutable while this JVM runs (true for
  // the driver-generated testdata). If a caller rewrites that path, cached
  // planes would silently diverge from the oracle's relational derivation —
  // such a caller must key on content (e.g. add file mtime to the key) or
  // drop the cache.
  private val planeCache = new scala.collection.concurrent.TrieMap[
    (String, Int, Int), Array[Array[Array[Double]]]]

  /** Data-derived deterministic hyperplanes: plane p = v_{2p} − v_{2p+1}
    * (element-wise difference of consecutive corpus vectors by vec_id),
    * p = t·bits + j. Differences of independent embedding vectors point in
    * "random" directions exactly like seeded gaussians — but unlike a JVM
    * RNG, any SQL engine can re-derive them relationally from the corpus,
    * which is what makes the LSH signatures (and so the f2/e6 queries)
    * DuckDB-oracle-checkable. The 2·tables·bits-row collect is tiny query
    * metadata (like the g8 contamination probes), memoized per corpus.
    * Requires vec_ids 0..2·tables·bits-1 to exist — throws rather than
    * silently diverging from the registered oracle. */
  private[operators] def dataPlanes(spark: SparkSession, sfDir: String,
      tables: Int, bits: Int): Array[Array[Array[Double]]] =
    planeCache.getOrElseUpdate((sfDir, tables, bits), {
      val need = 2 * tables * bits
      val byId = Sources.testTable(spark, sfDir, "embeddings")
        .filter(col("vec_id") < need)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // fail loudly rather than silently diverging from the registered
      // oracle: the relational plane derivation is part of the operator's
      // contract, and it needs vec_ids 0..2·tables·bits-1 present (keyed
      // by id, not collection position, so gaps can't mispair vectors)
      val missing = (0L until need.toLong).filterNot(byId.contains)
      require(missing.isEmpty,
        s"dataPlanes needs embeddings vec_id 0..${need - 1} " +
          s"(2·tables·bits) to derive hyperplanes relationally; " +
          s"missing: ${missing.take(5).mkString(",")}" +
          (if (missing.size > 5) ",…" else ""))
      Array.tabulate(tables, bits) { (t, j) =>
        val p = t * bits + j
        val a = byId(2L * p)
        val b = byId(2L * p + 1)
        Array.tabulate(a.length)(i => a(i) - b(i))
      }
    })

  // (all-tables signature computation lives in the fused native
  // HyperplaneSigs expression — bit j of table t = sign of <v, plane_tj>;
  // the expanded per-plane Column form generated ~100 sub-expressions and
  // paid seconds of codegen compile per plan)

  /** Approximate cosine top-k via multi-table hyperplane LSH with exact
    * re-ranking of candidates. Recall rises with `tables`, selectivity
    * with `bits`. Defaults (16×6) are tuned for weakly-similar corpora
    * (p_bit ≈ 0.63 at cos 0.4 → recall ≈ 0.65); strongly-similar corpora
    * (real near-dups, cos ≥ 0.9 → p_bit ≥ 0.9) reach recall ≥ 0.99 with
    * far fewer tables — tighten `bits` there for selectivity. */
  def lshTopK(spark: SparkSession, sfDir: String, numQueries: Int = 10,
      k: Int = 5, tables: Int = 16, bits: Int = 6): DataFrame = {
    val ps = dataPlanes(spark, sfDir, tables, bits)
    val corpus = normed(spark, sfDir)

    // one signature pass over the corpus (persisted); query signatures are
    // a filter of it rather than a second scan+sig computation
    val corpusSig = corpus.select(col("vec_id"), col("v"), col("norm"),
        posexplode(graft.functions.SketchExpressions
          .hyperplane_sigs(col("v"), ps)).as(Seq("t", "sig")))
      .transform(graft.CacheScope.tracked)
    val querySig = corpusSig.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("t"), col("sig"))

    val cand = corpusSig.join(broadcast(querySig), Seq("t", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("qnorm"),
        col("v"), col("norm"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** f5 — scalar (int8) quantization of the embedding corpus with a
    * reconstruction-error audit: per-dimension min/max train the
    * quantizer (a TINY stats table — dims rows — broadcast back), then
    * one narrow pass encodes `code = clamp(floor((v - min)/scale), 0,
    * 255)` and scores `recon = min + (code + 0.5)·scale`. This is the
    * compression step a 100 TB ANN stack runs before IVF/LSH (4× smaller
    * vectors, cache-resident cells); the emitted per-vector MSE is the
    * quality gate that decides 8 vs 16 bits. Shapes: train = one
    * partial+final agg over (dims × vectors) exploded rows; encode =
    * broadcast join + narrow arithmetic; audit = one shuffle by vec_id
    * with exact decimal error sums (Deterministic discipline — a double
    * sum over dims would be partition-order dependent).
    *
    * Every arithmetic step is IEEE-exact and mirrored in the oracle:
    * floor (not round — engines disagree on half-rounding), constant-dim
    * guard (scale = 0 → code 0, recon = min, zero error). */
  /** The shared quantize pipeline: per-(vec_id, pos) code + midpoint
    * reconstruction (see [[quantizeAudit]] for the arithmetic
    * contract). */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Sources.testTable(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "v")))
    val stats = e.groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("scale", (col("mx") - col("mn")) / 255.0)
    e.join(broadcast(stats), Seq("pos"))
      .withColumn("code",
        when(col("scale") === 0.0, lit(0L))
          .otherwise(least(lit(255L), greatest(lit(0L),
            floor((col("v") - col("mn")) / col("scale")))))
          .cast("int"))
      .withColumn("recon",
        col("mn") + (col("code") + 0.5) * col("scale"))
  }

  def quantizeAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val coded = quantized(spark, sfDir)
      .withColumn("err2",
        when(col("scale") === 0.0, 0.0)
          .otherwise((col("v") - col("recon")) * (col("v") - col("recon"))))
    coded.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        max(col("code")).as("max_code"),
        min(col("code")).as("min_code"),
        round(sumExact(col("err2")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mse"))
  }

  /** f7 — PRODUCT-QUANTIZATION ANN (Jegou/Douze/Schmid 2011, TPAMI —
    * completing the PQ half of the IVF+PQ pair; [[ivfTopK]] is the IVF
    * half). The embedding is cut into `m` subvectors; each subspace gets
    * a `ksub`-codeword codebook (codewords = the first ksub corpus
    * vectors' subvectors — the same deterministic, fully relational seed
    * rule as [[seedCentroids]], so the whole operator is
    * DuckDB-oracle-checkable). Every corpus vector compresses to m
    * small codes (64 dims × 8 bytes → 4 codes ≈ 64× smaller); a query is
    * answered with ASYMMETRIC DISTANCE COMPUTATION: precompute the
    * query's m×ksub table of subspace distances, then score each corpus
    * vector by summing m TABLE LOOKUPS — never touching the original
    * vectors.
    *
    * Determinism discipline: each subspace distance is one double
    * expression (strict-fold dot of the componentwise diff — identical
    * tree in the SQL oracle), but the ADC SUM across subspaces uses
    * EXACT DECIMAL accumulation ([[graft.functions.Deterministic
    * .sumExact]]): a double sum's value depends on aggregation order,
    * and the ADC ranking (and therefore the output) would be flaky at
    * any parallelism. Decimal addition is associative — bit-stable
    * map-side combines, engine-portable totals.
    *
    * Scale shape: codebook = m·ksub rows (broadcast); encoding is one
    * corpus scan against the broadcast codebook (the per-(vector,
    * subspace) argmin never shuffles the corpus — the row_number window
    * keys on (vec_id, m), which the posexplode already co-locates);
    * the query distance table is numQueries·m·ksub rows (broadcast);
    * ADC is a narrow lookup join + one (query, vec) groupBy whose
    * map-side combine folds the m partials before the shuffle.
    *
    * The ADC ranking is a SHORTLIST, not the answer: compressed
    * distances are lossy, so the operator follows the standard
    * deployment shape (FAISS's IndexPQ + refine) — ADC keeps the
    * `shortlist` best per query, real vectors are re-attached for those
    * rows only, and the exact cosine picks the final k. Compression
    * prunes the corpus scan; full precision only ever touches
    * shortlist·|Q| rows. */
  def pqTopK(spark: SparkSession, sfDir: String, numQueries: Int = 10,
      k: Int = 5, m: Int = 4, ksub: Int = 16,
      shortlist: Int = 50): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val corpus = normed(spark, sfDir)
    val subDim = 64 / m
    // (id, m, sub): the vector cut into m contiguous subvectors
    def subs(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, ${m - 1}),
           |  j -> slice(v, j * $subDim + 1, $subDim))""".stripMargin))
        .as(Seq("m", "sub")))
    // squared L2 distance with ONE expression tree shared with the
    // oracle: strict-fold dot of the componentwise difference
    def sq(a: Column, b: Column): Column = {
      val d = zip_with(a, b, (x, y) => x - y)
      Dedup.dot(d, d)
    }
    val corpusSubs = subs(corpus, "vec_id")
      .transform(graft.CacheScope.tracked)
    val wEnc = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("d2").asc, col("c").asc)
    // codebook training: seed codewords = the first ksub corpus vectors'
    // subvectors, then `iters` per-subspace Lloyd sweeps (assign every
    // subvector to its nearest codeword, recompute codewords as
    // per-dimension means) — f4's refinement discipline applied per
    // subspace: exact DECIMAL sums make the means bit-stable at any
    // parallelism, and every step is relational so the oracle unrolls
    // the sweeps as CTEs. Empty cells drop out of the groupBy on both
    // sides identically.
    val iters = 2
    var codebook = corpusSubs.filter(col("vec_id") < ksub)
      .select(col("m"), col("vec_id").cast("int").as("c"),
        col("sub").as("cw"))
    for (_ <- 0 until iters) {
      val members = corpusSubs.join(broadcast(codebook), Seq("m"))
        .withColumn("d2", sq(col("sub"), col("cw")))
        .withColumn("r", row_number().over(wEnc))
        .filter(col("r") === 1)
        .select(col("m"), col("c"), col("sub"))
      codebook = members
        .select(col("m"), col("c"), posexplode(col("sub"))
          .as(Seq("pos", "x")))
        .groupBy(col("m"), col("c"), col("pos"))
        .agg(sumExact(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .withColumn("mean",
          col("sx").cast("double") / col("cnt").cast("double"))
        .groupBy(col("m"), col("c"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mean"))))
          .as("pm"))
        .select(col("m"), col("c"),
          transform(col("pm"), p => p.getField("mean")).as("cw"))
    }
    // encode: nearest codeword per (vector, subspace), c-asc tiebreak
    val codes = corpusSubs.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", sq(col("sub"), col("cw")))
      .withColumn("r", row_number().over(wEnc))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("m"), col("c"))
    // the queries' ADC lookup tables: subspace distance to every codeword
    val dts = subs(corpus.filter(col("vec_id") < numQueries), "vec_id")
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(codebook), Seq("m"))
      .withColumn("dt", sq(col("sub"), col("cw")))
      .select(col("query_id"), col("m"), col("c"), col("dt"))
    // ADC: m table lookups per (query, vector), exact-decimal total
    val adc = codes.join(broadcast(dts), Seq("m", "c"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sumExact(col("dt")).as("adc_d2"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    val short = adc.withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= shortlist)
    // refine: real vectors re-attached for the shortlist only; the exact
    // cosine picks the final k (spec pins recall vs the float top-k)
    val qs = corpus.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val refined = short.join(corpus, Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    refined.withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("adc_d2").cast("double"), 6).as("adc_d2"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** f8 — IVFADC, the full Jegou/Douze/Schmid 2011 system: [[ivfTopK]]'s
    * coarse cells and [[pqTopK]]'s product quantizer COMPOSED, with the
    * codebooks trained on RESIDUALS (v − centroid) — the residual's
    * energy is a fraction of the vector's, so the same ksub codewords
    * quantize it far more finely, and the probe only scans `nprobe`
    * cells instead of the whole code table (pqTopK's ADC touches every
    * corpus vector; here the candidate set is the probed cells' inverted
    * lists — the property that makes billion-scale ANN serve from RAM).
    *
    * Per-cell wrinkle: ADC lookup tables depend on the probed cell (the
    * query's residual differs per cell), so `dts` carries
    * numQueries·nprobe·m·ksub rows — still broadcast-sized; the ADC join
    * keys on (cent_id, m, c), confining lookups to probed cells.
    *
    * Determinism discipline is f7's verbatim: seed codewords = first
    * ksub vectors' residual subvectors, exact-decimal Lloyd means and
    * ADC sums, every ranking tiebroken on ids — the DuckDB oracle
    * unrolls the identical relational pipeline.
    *
    * Round-8 profile (refreshed corpus): warm 4.5-5.6 s at sf0.1 vs the
    * r6 band's 3.2 s. Cell-occupancy skew was the suspected cause and
    * was MEASURED REFUTED — largest coarse cell holds 7.4% of the
    * 2000×64 corpus vs 6.25% uniform — so the ADC join is balanced and
    * the growth is corpus content/volume, not a plan pathology;
    * nCent/nprobe stay as registered (the oracle pins them). */
  def ivfPqTopK(spark: SparkSession, sfDir: String, numQueries: Int = 10,
      k: Int = 5, nCent: Int = 16, nprobe: Int = 4, m: Int = 4,
      ksub: Int = 16, shortlist: Int = 50): DataFrame = {
    import graft.functions.Deterministic.sumExact
    val corpus = normed(spark, sfDir)
    val cents = seedCentroids(corpus, nCent)
    val subDim = 64 / m
    def sq(a: Column, b: Column): Column = {
      val d = zip_with(a, b, (x, y) => x - y)
      Dedup.dot(d, d)
    }
    // residual subvectors, tagged with the owning cell
    def subsOf(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.select(keep :+ posexplode(expr(
        s"""transform(sequence(0, ${m - 1}),
           |  j -> slice(rv, j * $subDim + 1, $subDim))""".stripMargin))
        .as(Seq("m", "sub")): _*)

    val asg = nearestCents(corpus, cents, "vec_id", 1)
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("rv"))
    val corpusSubs = subsOf(asg, Seq(col("vec_id"), col("cent_id")))
      .transform(graft.CacheScope.tracked)

    val wEnc = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("d2").asc, col("c").asc)
    val iters = 2
    var codebook = corpusSubs.filter(col("vec_id") < ksub)
      .select(col("m"), col("vec_id").cast("int").as("c"),
        col("sub").as("cw"))
    for (_ <- 0 until iters) {
      val members = corpusSubs.join(broadcast(codebook), Seq("m"))
        .withColumn("d2", sq(col("sub"), col("cw")))
        .withColumn("r", row_number().over(wEnc))
        .filter(col("r") === 1)
        .select(col("m"), col("c"), col("sub"))
      codebook = members
        .select(col("m"), col("c"), posexplode(col("sub"))
          .as(Seq("pos", "x")))
        .groupBy(col("m"), col("c"), col("pos"))
        .agg(sumExact(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .withColumn("mean",
          col("sx").cast("double") / col("cnt").cast("double"))
        .groupBy(col("m"), col("c"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mean"))))
          .as("pm"))
        .select(col("m"), col("c"),
          transform(col("pm"), p => p.getField("mean")).as("cw"))
    }
    // inverted lists: (cell, vector, subspace code)
    val codes = corpusSubs.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", sq(col("sub"), col("cw")))
      .withColumn("r", row_number().over(wEnc))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("cent_id"), col("m"), col("c"))
    // per-(query, probed-cell) residuals → per-cell ADC lookup tables
    val probes = nearestCents(
      corpus.filter(col("vec_id") < numQueries), cents, "vec_id", nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("rv"))
    val dts = subsOf(probes, Seq(col("query_id"), col("cent_id")))
      .join(broadcast(codebook), Seq("m"))
      .withColumn("dt", sq(col("sub"), col("cw")))
      .select(col("query_id"), col("cent_id"), col("m"), col("c"),
        col("dt"))
    // ADC over probed cells only, exact-decimal totals
    val adc = codes.join(broadcast(dts), Seq("cent_id", "m", "c"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sumExact(col("dt")).as("adc_d2"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    val short = adc.withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= shortlist)
    val qs = corpus.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val refined = short.join(corpus, Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    refined.withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("adc_d2").cast("double"), 6).as("adc_d2"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** f6 — top-k search over the QUANTIZED corpus: rebuild each vector
    * from its int8 codes (midpoint reconstruction, sorted by dimension)
    * and run the exact brute-force ranking on the reconstructions — the
    * end-to-end answer to "what does 4× compression cost in ranking
    * quality" (spec: recall vs the float top-k). On a real deployment
    * the codes (not the reconstructions) ship to the executors and the
    * reconstruction is fused into the distance kernel; the dataflow —
    * tiny stats broadcast + narrow rebuild + the f1 search shape — is
    * identical. Deterministic: collect_list order is laundered through
    * array_sort on the (pos, recon) struct. */
  def quantizedTopK(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    val vecs = quantized(spark, sfDir)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("recon")))),
        x => x.getField("recon")).as("rv"))
      .withColumn("norm", sqrt(Dedup.dot(col("rv"), col("rv"))))
      .transform(graft.CacheScope.tracked)
    val queries = vecs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("rv").as("qv"),
        col("norm").as("qnorm"))
    val scored = vecs.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dot(col("qv"), col("rv")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cosine"), 6).as("cosine"))
  }
}
