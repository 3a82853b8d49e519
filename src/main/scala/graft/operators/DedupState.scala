package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.sources.GraftLog

/** O(batch) rolling dedup state — the scale successor to
  * [[Dedup.dedupStatePersisted]] (e18). e18's per-batch gate rebuilds
  * its Bloom from a FULL scan of the digest state table and probes the
  * exact state with an unpruned semi-join; both costs grow with corpus
  * HISTORY, not batch size. This module decouples them:
  *
  *   - **Versioned Bloom sidecar**: the corpus-membership Bloom persists
  *     under `<state>/_graft_sidecar/` stamped with the state table's
  *     commit version. Each batch loads the bitset (O(bloom bytes), zero
  *     state-file reads), folds in ONLY its own novel digests (a
  *     distributed `stat.bloomFilter` over the novel frame with the
  *     sidecar's exact (expectedItems, fpp) layout, so `mergeInPlace`
  *     is a bitwise OR — the driver never materializes digests), and
  *     re-persists at the new version. A sidecar left behind the table
  *     (external writer, crashed save) catches up by folding the CDF
  *     inserts of the missing versions — never a full rebuild unless the
  *     sidecar is absent or past capacity.
  *   - **Digest-prefix partitioning**: the state table is hive-
  *     partitioned by `h2 = substring(content_hash, 1, prefixLen)`, so
  *     the exact verification probe pushes a STATIC partition filter
  *     (`h2 IN (candidate prefixes)` — bounded by 16^prefixLen values,
  *     collected from the Bloom-filtered candidate set, never from raw
  *     keys) and scans only the matching dirs' files. A batch whose
  *     candidates touch 3 of 256 prefixes reads 3/256ths of the state.
  *
  * Correctness is never Bloom-dependent: false positives are
  * exact-verified by the pruned semi-join; false negatives cannot occur
  * because the sidecar version is reconciled against the table version
  * on every load (catch-up fold) before any probe. Capacity: the meta
  * sidecar tracks inserted-count; exceeding expectedItems triggers one
  * full rebuild at 4x size (amortized growth, same policy as a dynamic
  * array).
  *
  * Reference scope: the reference pipeline has no dedup operators
  * (survey §2); this is part of the training-data-pipeline surface the
  * brief adds. Delta parity: the sidecar plays the role Delta's
  * `autoCompact`-era aggregate sketches play for OPTIMIZE planning —
  * commit-versioned derived state beside the log, never inside it. */
/** Shared atomic sidecar IO: tmp + rename, so a reader that found the
  * meta never opens a half-written bin, and a crash mid-save leaves no
  * torn pair — losing the rename race to a concurrent saver of the same
  * version is a no-op (both wrote the same state; the GraftLog
  * checkpoint-writer convention). Used by [[DedupState]] and
  * [[NearDupState]]. */
private[operators] object SidecarIO {
  /** Superseded versions kept beside the newest on every save — grace
    * for a concurrent reader that listed the dir just before the save
    * (the GraftLog checkpoint-retention convention). */
  val KeepVersions = 2

  def write(f: FileSystem, dir: String, bin: HPath, meta: HPath,
      bloom: BloomFilter, metaBody: String): Unit = {
    f.mkdirs(new HPath(dir))
    val tmpB = new HPath(dir, s".bloom-${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmpB, true)
    try bloom.writeTo(out) finally out.close()
    if (!f.rename(tmpB, bin)) { f.delete(tmpB, false); () }
    val tmpM = new HPath(dir, s".meta-${java.util.UUID.randomUUID()}.tmp")
    val mo = f.create(tmpM, true)
    try mo.write(metaBody.getBytes("UTF-8")) finally mo.close()
    if (!f.rename(tmpM, meta)) { f.delete(tmpM, false); () }
  }

  /** Delete superseded sidecar versions of `prefix` (e.g.
    * `dedup-bloom-v`), keeping the newest [[KeepVersions]] complete
    * pairs. Without this, every batch leaves an O(4× corpus)-byte
    * bitset behind forever — a year of 5-minute batches is ~100k dead
    * bloom files beside the state table. Loaders only ever read the
    * newest version at-or-below the table version, so pruning behind
    * the grace window is invisible to them. */
  def pruneSuperseded(f: FileSystem, dir: String, prefix: String,
      keep: Int = KeepVersions): Unit = {
    val d = new HPath(dir)
    if (!f.exists(d)) return
    val versions = f.listStatus(d).map(_.getPath.getName).collect {
      case n if n.startsWith(prefix) && n.endsWith(".meta") =>
        n.stripPrefix(prefix).stripSuffix(".meta").toLong
    }.sorted
    versions.dropRight(keep).foreach { v =>
      f.delete(new HPath(d, f"$prefix$v%020d.bin"), false)
      f.delete(new HPath(d, f"$prefix$v%020d.meta"), false)
    }
  }
}

object DedupState {

  private val AppId = "graft-dedup-state-v2"

  /** Loaded sidecar + provenance: how it was brought current.
    * `catchupVersions` = CDF versions folded on load (0 in steady
    * state); `rebuilt` = true when a full digest scan was needed
    * (missing or over-capacity sidecar). */
  private[graft] final case class Sidecar(bloom: BloomFilter,
      version: Long, expected: Long, fpp: Double, inserted: Long,
      prefixLen: Int, catchupVersions: Int, rebuilt: Boolean)

  private def sidecarDir(state: String) = s"$state/_graft_sidecar"

  private def fsOf(spark: SparkSession, state: String): FileSystem =
    new HPath(state).getFileSystem(
      spark.sessionState.newHadoopConf())

  private def binPath(state: String, v: Long) =
    new HPath(sidecarDir(state), f"dedup-bloom-v$v%020d.bin")
  private def metaPath(state: String, v: Long) =
    new HPath(sidecarDir(state), f"dedup-bloom-v$v%020d.meta")

  /** Initialize the state table from a corpus digest frame
    * (`content_hash` column): hive layout partitioned by the
    * `prefixLen`-char digest prefix, plus the v0 Bloom sidecar sized
    * for 4x the corpus (growth headroom before the first rebuild). */
  def init(spark: SparkSession, digests: DataFrame, state: String,
      prefixLen: Int = 2, fpp: Double = 0.01): Unit = {
    val withPrefix = digests.select(col("content_hash"),
      substring(col("content_hash"), 1, prefixLen).as("h2")).distinct()
    GraftLog.overwritePartitioned(withPrefix, state, Seq("h2"))
    // the state is a rolling-ingest table: every batch lands small
    // files across the prefix dirs forever — opt into write-path
    // compaction so file count stays bounded (the i28 delta-log
    // discipline; compaction commits are rewrite-only, so the
    // sidecar's CDF catch-up sees them as empty diffs)
    GraftLog.setProperties(spark, state, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.minNumFiles" -> "8")): Unit
    val n = GraftLog.read(spark, state).count()
    val expected = math.max(n * 4, 1024L)
    val bloom = GraftLog.read(spark, state)
      .stat.bloomFilter("content_hash", expected, fpp)
    val v = GraftLog.latestVersion(spark, state).get
    saveSidecar(spark, state, v, bloom, expected, fpp, n, prefixLen)
  }

  /** Load the newest sidecar at-or-below the table's current version
    * and reconcile: fold CDF inserts of any missing versions into the
    * bitset (append-only state — inserts are the only change class the
    * ledger-stamped advance path produces). Missing sidecar or
    * inserted > expected → full rebuild at 4x. */
  private[graft] def loadSidecar(spark: SparkSession, state: String)
      : Sidecar = {
    val latest = GraftLog.latestVersion(spark, state).getOrElse(
      throw new IllegalStateException(s"$state is not a graft table"))
    val f = fsOf(spark, state)
    val dir = new HPath(sidecarDir(state))
    val found: Option[Long] =
      if (!f.exists(dir)) None
      else f.listStatus(dir).map(_.getPath.getName).collect {
        case n if n.startsWith("dedup-bloom-v") && n.endsWith(".meta") =>
          n.stripPrefix("dedup-bloom-v").stripSuffix(".meta").toLong
      }.filter(v => v <= latest && f.exists(binPath(state, v)))
        .sorted.lastOption
    found match {
      case Some(v) =>
        val meta = readMeta(f, metaPath(state, v))
        val expected = meta("expected").toLong
        val fpp = meta("fpp").toDouble
        var inserted = meta("inserted").toLong
        val prefixLen = meta("prefixLen").toInt
        val in = f.open(binPath(state, v))
        val bloom = try BloomFilter.readFrom(in) finally in.close()
        // catch-up: fold inserts of (v, latest] — CDF keeps this a
        // file-bounded read of just the missing commits' added files
        val missing = GraftLog.versions(spark, state)
          .count(x => x > v && x <= latest)
        if (missing > 0) {
          val catchup = spark.read.format("graft")
            .option("readChangeFeed", "true")
            .option("cdfKeys", "content_hash")
            .option("startingVersion", v + 1)
            .option("endingVersion", latest)
            .load(state)
            .filter(col("_change_type") === "insert")
            .select("content_hash").distinct()
          val nNew = catchup.count()
          if (inserted + nNew > expected)
            return rebuild(spark, state, latest, fpp, prefixLen)
          if (nNew > 0)
            bloom.mergeInPlace(
              catchup.stat.bloomFilter("content_hash", expected, fpp))
          inserted += nNew
          saveSidecar(spark, state, latest, bloom, expected, fpp,
            inserted, prefixLen)
        }
        // invariant: every save path keeps inserted <= expected (the
        // catch-up branch above rebuilds BEFORE overflowing), so no
        // re-check is needed here
        Sidecar(bloom, latest, expected, fpp, inserted, prefixLen,
          missing, rebuilt = false)
      case None =>
        // no sidecar (pre-existing table adopted into this flow):
        // bootstrap from one full digest scan — the LAST such scan
        val meta = probeMeta(spark, state)
        rebuild(spark, state, latest, meta._1, meta._2)
    }
  }

  private def probeMeta(spark: SparkSession, state: String)
      : (Double, Int) = (0.01, prefixLenOf(spark, state))

  /** Derive prefixLen from the table's own layout (`h2` values). */
  private def prefixLenOf(spark: SparkSession, state: String): Int =
    GraftLog.read(spark, state).select(length(col("h2")))
      .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(2)

  private def rebuild(spark: SparkSession, state: String, v: Long,
      fpp: Double, prefixLen: Int): Sidecar = {
    val digests = GraftLog.read(spark, state).select("content_hash")
    val n = digests.count()
    val expected = math.max(n * 4, 1024L)
    val bloom = digests.stat.bloomFilter("content_hash", expected, fpp)
    saveSidecar(spark, state, v, bloom, expected, fpp, n, prefixLen)
    Sidecar(bloom, v, expected, fpp, n, prefixLen, 0, rebuilt = true)
  }

  private def readMeta(f: FileSystem, p: HPath): Map[String, String] = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in).getLines()
      .flatMap { l => l.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      } }.toMap
    finally in.close()
  }

  private def saveSidecar(spark: SparkSession, state: String, v: Long,
      bloom: BloomFilter, expected: Long, fpp: Double, inserted: Long,
      prefixLen: Int): Unit = {
    val f = fsOf(spark, state)
    SidecarIO.write(f, sidecarDir(state),
      binPath(state, v), metaPath(state, v), bloom,
      s"expected=$expected\nfpp=$fpp\ninserted=$inserted\n" +
        s"prefixLen=$prefixLen\n")
    SidecarIO.pruneSuperseded(f, sidecarDir(state), "dedup-bloom-v")
  }

  /** The exact-verification probe: digests of `cand`
    * (`content_hash`, `h2`) semi-joined against the state with a STATIC
    * partition filter on the candidate prefixes (bounded by
    * 16^prefixLen values — a driver-side collect of the DISTINCT
    * PREFIX set, never of keys). Exposed for the spec's scanned-file
    * plan pin. */
  private[graft] def presentProbe(spark: SparkSession, state: String,
      cand: DataFrame): DataFrame = {
    val prefixes = cand.select("h2").distinct()
      .collect().map(_.getString(0)).toSeq
    GraftLog.read(spark, state)
      .filter(col("h2").isin(prefixes: _*))
      .join(broadcast(cand.select("content_hash")),
        Seq("content_hash"), "left_semi")
      .select("content_hash").distinct()
  }

  /** Bloom-gated, prefix-pruned membership probe: the subset of
    * `batchH`'s digests (`content_hash`, `h2`) present in the state.
    * The Bloom gate bounds the exact probe's candidate set by the
    * BATCH (a false positive costs one pruned lookup, never a wrong
    * answer); the prefix filter bounds the state read to the
    * candidates' partitions. Output is batch-bounded and exact.
    * Shared by [[probeAndAdvance]] and the e23 incremental pipeline
    * ([[Pipeline.trainingDataPipelineIncremental]]). */
  private[graft] def pruneProbe(spark: SparkSession, state: String,
      sc: Sidecar, batchH: DataFrame): DataFrame = {
    val bBloom = spark.sparkContext.broadcast(sc.bloom)
    val mightContain =
      udf((h: String) => bBloom.value.mightContainString(h))
    val cand = batchH.filter(mightContain(col("content_hash")))
      .select("content_hash", "h2").distinct()
      .transform(graft.CacheScope.tracked)
    presentProbe(spark, state, cand)
  }

  /** Ledger-stamped state advance: append `novel` (`content_hash`,
    * `h2`) under (appId, batchId) and roll the Bloom sidecar forward
    * by a bitwise fold of ONLY the novel digests. `sc = None` means a
    * fresh state (first wave; the table may not exist yet): the commit
    * creates the prefix-partitioned layout, opts into write-path
    * compaction, and the sidecar bootstraps from the (batch-sized)
    * state scan. A ledger-rejected (replayed) commit leaves the
    * sidecar untouched. */
  private[graft] def advance(spark: SparkSession, state: String,
      sc: Option[Sidecar], novel: DataFrame, appId: String,
      batchId: Long, prefixLen: Int = 2, fpp: Double = 0.01): Unit = {
    // co-locate each prefix dir's rows in one task before the hive
    // write — without this every task slivers a file into every dir
    // (the t40 lesson; 32 tasks × 16^prefixLen dirs of 10-row files
    // otherwise, and the write-path compactor then rewrites them)
    val novelC = novel.repartition(col("h2"))
      .transform(graft.CacheScope.tracked)
    val nNovel = novelC.count()
    val committed = GraftLog.txnAppendPartitioned(novelC, state, appId,
      batchId, Seq("h2"))
    if (!committed) return
    val v = GraftLog.latestVersion(spark, state).get
    sc match {
      case None =>
        GraftLog.setProperties(spark, state, Map(
          "graft.autoCompact" -> "true",
          "graft.autoCompact.minNumFiles" -> "8")): Unit
        // fresh state: the just-committed novel frame IS the state —
        // build the v0 sidecar from the (cached) frame instead of a
        // read-back rebuild scan
        val expected = math.max(nNovel * 4, 1024L)
        saveSidecar(spark, state,
          GraftLog.latestVersion(spark, state).get,
          novelC.stat.bloomFilter("content_hash", expected, fpp),
          expected, fpp, nNovel, prefixLen)
      case Some(s) if nNovel > 0 =>
        if (v != s.version + 1) {
          // a concurrent writer interleaved between our sidecar load
          // and our append: the locally-merged bitset would silently
          // MISS its digests (false negatives → duplicate state rows
          // and wrong verdicts downstream). Reconcile through the load
          // path — it folds the CDF of every version past the newest
          // persisted sidecar, covering theirs AND ours.
          loadSidecar(spark, state): Unit
        } else if (s.inserted + nNovel > s.expected) {
          rebuild(spark, state, v, s.fpp, s.prefixLen); ()
        } else {
          // steady state: fold ONLY the novel digests into the loaded
          // bitset (same layout → bitwise OR), stamp at the new version
          s.bloom.mergeInPlace(
            novelC.stat.bloomFilter("content_hash", s.expected, s.fpp))
          saveSidecar(spark, state, v, s.bloom, s.expected, s.fpp,
            s.inserted + nNovel, s.prefixLen)
        }
      case Some(s) =>
        // zero novel digests but the ledger advanced the version:
        // re-stamp the unchanged bitset so the next load stays
        // steady-state (no catch-up fold)
        if (v != s.version)
          saveSidecar(spark, state, v, s.bloom, s.expected, s.fpp,
            s.inserted, s.prefixLen)
    }
  }

  /** One rolling-ingest step: verdicts for `batch` (`doc_id`, `text`)
    * against the current state, then the state advances by the batch's
    * novel digests in one idempotent ledger-stamped commit and the
    * Bloom sidecar rolls forward by a bitwise merge. Per-batch cost:
    * sidecar load + batch-sized hashing + prefix-pruned exact probe +
    * O(novel) append — independent of corpus history.
    *
    * Multi-writer contract: the (appId, batchId) ledger is MONOTONIC
    * per appId, so each concurrent writer must carry its OWN `appId`
    * (its stream identity); batch ids stay idempotent within it.
    * Interleaved commits are reconciled on the sidecar save path — see
    * [[advance]]. */
  def probeAndAdvance(spark: SparkSession, state: String,
      batch: DataFrame, batchId: Long, appId: String = AppId)
      : DataFrame = {
    val sc = loadSidecar(spark, state)
    val batchH = batch
      .withColumn("content_hash", sha2(col("text"), 256))
      .withColumn("h2", substring(col("content_hash"), 1, sc.prefixLen))
      .transform(graft.CacheScope.tracked)
    val present = pruneProbe(spark, state, sc, batchH)
      .withColumn("__dup", lit(true))
      .transform(graft.CacheScope.tracked)
    val verdicts = batchH
      .join(broadcast(present), Seq("content_hash"), "left")
      .select(lit(batchId).as("batch_id"), col("doc_id"),
        coalesce(col("__dup"), lit(false)).as("is_duplicate"))
      // the verdict rows must outlive the state advance below (the
      // caller's plan executes later, against a mutated table) —
      // materialize now
      .transform(graft.CacheScope.tracked)
    verdicts.count()
    val novel = batchH
      .join(broadcast(present), Seq("content_hash"), "left_anti")
      .select("content_hash", "h2").distinct()
    advance(spark, state, Some(sc), novel, appId, batchId,
      sc.prefixLen, sc.fpp)
    verdicts
  }

  /** GDPR erasure through the rolling exact-dedup state (e25): delete
    * the given digests' state rows in ONE file-pruned transactional
    * commit, then RE-MINT the Bloom sidecar from the surviving state at
    * the delete version. Without this path, an erased document's digest
    * blocks re-admission of identical text FOREVER — retained derived
    * data a compliance pipeline must be able to purge (the f14/f15 ANN
    * erasure contract, applied to the dedup state).
    *
    * Scale shape: the erasure batch's digest-PREFIX set (bounded by
    * 16^prefixLen values — a metadata-sized collect, never of keys)
    * statically prunes the touched-file probe to the candidate
    * partitions, and only files actually holding matching digests are
    * rewritten ([[GraftLog.deleteMatching]] semantics); the key frame
    * itself stays distributed. The sidecar re-mint is a full state
    * scan — a Bloom cannot unset bits, and the erased digests' bits are
    * themselves retained derived data, so the compliance path pays
    * O(state) once per erasure batch (never per ingest batch; steady-
    * state advance cost is unchanged). Re-erasing already-erased keys
    * rewrites nothing.
    *
    * `digests` needs a `content_hash` column (erase by digest: the
    * state holds no doc ids — callers map doc → digest exactly the way
    * admission did, sha2(text, 256)). Returns the delete commit
    * version. */
  def erase(spark: SparkSession, state: String, digests: DataFrame)
      : Long = {
    val (fpp, pl) = probeMeta(spark, state)
    val keys = digests.select(col("content_hash")).distinct()
      .withColumn("h2", substring(col("content_hash"), 1, pl))
      .transform(graft.CacheScope.tracked)
    // candidate PREFIX set: metadata-sized (≤ 16^prefixLen values)
    val prefixes = keys.select("h2").distinct()
      .collect().map(_.getString(0)).toSeq
    val v = GraftLog.deleteMatching(spark, state, keys,
      Seq("content_hash"), prune = Some(col("h2").isin(prefixes: _*)))
    rebuild(spark, state,
      GraftLog.latestVersion(spark, state).getOrElse(v), fpp, pl)
    v
  }

  /** e25 — the erasure lifecycle as a registered query: seed + batch 1
    * (e19's shape), then GDPR-erase the twinned seed docs' digests, then
    * batch 2 re-submits the erased texts (admitted fresh), twins of
    * UNTOUCHED seed docs (still duplicates — erasure must not disturb
    * neighbors), and twins of batch 1's novel docs (still duplicates —
    * the advance survives the erase commit). The oracle replays the
    * same membership algebra: state2 = (corpus ∪ batch1) \ erased. */
  def dedupStateErasure(spark: SparkSession, sfDir: String,
      split: Long = 300, split2: Long = 450): DataFrame = {
    val docs = graft.sources.Sources.testTable(spark, sfDir, "documents")
    val state = graft.sources.Staging.scratchDir("graft_dserase_") +
      "/digests"
    init(spark, docs.filter(col("doc_id") < split)
      .select(sha2(col("text"), 256).as("content_hash")),
      state, prefixLen = 1)
    val b1 = docs.filter(col("doc_id") >= split && col("doc_id") < split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") < split && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000).as("doc_id"), col("text")))
    val v1 = probeAndAdvance(spark, state, b1, 0L)
    // the GDPR request: every %9==0 seed doc must be forgotten
    erase(spark, state, docs
      .filter(col("doc_id") < split && col("doc_id") % 9 === 0)
      .select(sha2(col("text"), 256).as("content_hash")))
    val b2 = docs.filter(col("doc_id") >= split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs // re-submission of the ERASED texts: admitted
        .filter(col("doc_id") < split && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 5000).as("doc_id"), col("text")))
      .unionByName(docs // twins of untouched seed docs: still dups
        .filter(col("doc_id") < split && col("doc_id") % 9 === 1)
        .select((col("doc_id") + 6000).as("doc_id"), col("text")))
      .unionByName(docs // twins of batch 1 novels: still dups
        .filter(col("doc_id") >= split && col("doc_id") < split2 &&
          col("doc_id") % 5 === 0)
        .select((col("doc_id") + 7000).as("doc_id"), col("text")))
    val v2 = probeAndAdvance(spark, state, b2, 1L)
    v1.unionByName(v2)
  }

  /** e19 — the registered-query form: same two-batch replay (and the
    * same oracle) as e18, run through the sidecar + prefix-partitioned
    * machinery. prefixLen 1 keeps the sandbox layout at 16 dirs; the
    * 100 TB setting is 2 (256 dirs). */
  def dedupStateScalable(spark: SparkSession, sfDir: String,
      split: Long = 300, split2: Long = 450): DataFrame = {
    val docs = graft.sources.Sources.testTable(spark, sfDir, "documents")
    val state = graft.sources.Staging.scratchDir("graft_dstate2_") +
      "/digests"
    init(spark, docs.filter(col("doc_id") < split)
      .select(sha2(col("text"), 256).as("content_hash")),
      state, prefixLen = 1)
    val b1 = docs.filter(col("doc_id") >= split && col("doc_id") < split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") < split && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000).as("doc_id"), col("text")))
    val b2 = docs.filter(col("doc_id") >= split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") >= split && col("doc_id") < split2 &&
          col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000).as("doc_id"), col("text")))
    val v1 = probeAndAdvance(spark, state, b1, 0L)
    val v2 = probeAndAdvance(spark, state, b2, 1L)
    v1.unionByName(v2)
  }
}
