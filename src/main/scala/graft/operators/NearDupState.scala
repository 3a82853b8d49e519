package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.sources.GraftLog

/** Persisted rolling NEAR-dup state — the LSH sibling of [[DedupState]]
  * (e19 holds exact digests; this holds MinHash BAND keys), closing the
  * last rolling-ingest gap: e17's incremental near-dup re-bands the
  * whole corpus per run, so its per-batch cost grows with history. Here
  * the corpus's banded signatures live as a transactional graft TABLE
  * and each batch probes + advances it in O(batch):
  *
  *   - **State rows** `(bk, band, doc_id, sig)` hive-partitioned by
  *     `bp = pmod(xxhash64(bk), 64)`: `bk` is the raw band slice
  *     rendered as text (the e3 discipline — reproducible verbatim in
  *     the DuckDB oracle), `sig` is the doc's full MinHash signature
  *     carried ON the band row, so verification reads ONLY the pruned
  *     candidate partitions — never a second corpus-wide signature
  *     fetch. The trade is deliberate and scaladoc'd: bands× storage
  *     (64-perm sig × 16 bands ≈ 8 KB/doc) buys per-batch IO bounded
  *     by the CANDIDATE set; the alternative (one sig row per doc in a
  *     flat side table) pays an O(corpus) scan per batch — e18's exact
  *     mistake, transposed.
  *   - **Bloom sidecar over band keys** (the e19 mechanism, key =
  *     `bk`): per-batch membership gating is O(bloom bytes) + O(batch)
  *     hashing, zero state-file reads. Steady-state advance folds only
  *     the batch's novel keys by bitwise merge; a missing/stale
  *     sidecar rebuilds from a key-only state scan (the versioned CDF
  *     catch-up refinement applies verbatim — see
  *     [[DedupState.loadSidecar]]).
  *   - **Verification = signature-estimated Jaccard** (matching
  *     positions / numPerm ≥ τ), the standard LSH-pipeline verify:
  *     exact shingle Jaccard would need the corpus TEXTS, which a
  *     rolling 100 TB pipeline cannot re-read per batch. The estimate
  *     is computed only for Bloom-positive, band-colliding pairs.
  *
  * Near-dup batch docs are NOT added to the state (a dedup pipeline
  * keeps one representative; e19 keeps the same rule for exact dups),
  * so state growth is bounded by the NOVEL corpus. The advance is one
  * idempotent ledger-stamped commit per batch — replay is a no-op. */
object NearDupState {

  private val AppId = "graft-neardup-state"
  private val NumPerm = 64
  private val Bands = 16
  private val Rows = NumPerm / Bands

  private def sidecarDir(state: String) = s"$state/_graft_sidecar"
  private def binPath(state: String, v: Long) =
    new HPath(sidecarDir(state), f"band-bloom-v$v%020d.bin")
  private def metaPath(state: String, v: Long) =
    new HPath(sidecarDir(state), f"band-bloom-v$v%020d.meta")
  private def fsOf(spark: SparkSession, state: String): FileSystem =
    new HPath(state).getFileSystem(spark.sessionState.newHadoopConf())

  /** `doc_id`, `sig` (full MinHash), exploded to one row per band with
    * the reproducible text band key and its hash-partition column. */
  private def banded(docs: DataFrame, n: Int): DataFrame = {
    val base = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    val sigs = base.select(col("doc_id"),
      graft.functions.SketchExpressions
        .shingle_minhash(col("toks"), n, NumPerm).as("sig"))
    sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws(":", (lit(b.toString) +: (0 until Rows).map(r =>
              col("sig").getItem(b * Rows + r).cast("string"))): _*)
              .as("bk"))
        }: _*)).as("x"))
      .select(col("x.bk").as("bk"), col("x.band").as("band"),
        col("doc_id"), col("sig"),
        pmod(xxhash64(col("x.bk")), lit(64L)).cast("int").as("bp"))
  }

  /** The banding projection, exposed for specs that simulate an
    * out-of-band writer landing state rows directly. */
  private[graft] def bandedForTest(docs: DataFrame): DataFrame =
    banded(docs, 3)

  /** Seed the state from a corpus frame (`doc_id`, `text`) and persist
    * the v0 band-key Bloom sized 4x for growth headroom. */
  def init(spark: SparkSession, docs: DataFrame, state: String,
      n: Int = 3, fpp: Double = 0.01): Unit = {
    // co-locate each bp dir's rows in one task before the hive write —
    // without this every task slivers a file into every dir (the t40
    // lesson, applied at the call site because the property cannot
    // predate the table's first commit)
    GraftLog.overwritePartitioned(
      banded(docs, n).repartition(col("bp")), state, Seq("bp"))
    // rolling-ingest table: bound the per-dir file count (see
    // [[DedupState.init]] — compaction commits diff empty in CDF, so
    // the sidecar machinery is unaffected)
    GraftLog.setProperties(spark, state, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.minNumFiles" -> "8")): Unit
    val keys = GraftLog.read(spark, state).select("bk")
    val cnt = keys.count()
    val expected = math.max(cnt * 4, 1024L)
    saveSidecar(spark, state, GraftLog.latestVersion(spark, state).get,
      keys.stat.bloomFilter("bk", expected, fpp), expected, fpp, cnt)
  }

  private def saveSidecar(spark: SparkSession, state: String, v: Long,
      bloom: BloomFilter, expected: Long, fpp: Double,
      inserted: Long): Unit = {
    // atomic tmp+rename via the shared helper: a concurrent loader that
    // found the meta must never open a half-written bin
    val f = fsOf(spark, state)
    SidecarIO.write(f, sidecarDir(state),
      binPath(state, v), metaPath(state, v), bloom,
      s"expected=$expected\nfpp=$fpp\ninserted=$inserted\n")
    SidecarIO.pruneSuperseded(f, sidecarDir(state), "band-bloom-v")
  }

  private[graft] final case class Sidecar(bloom: BloomFilter,
      version: Long, expected: Long, fpp: Double, inserted: Long,
      catchupVersions: Int, rebuilt: Boolean)

  /** Newest sidecar at-or-below the table version, reconciled: a
    * sidecar left behind the table (external writer, crashed save)
    * catches up by folding the CDF inserts' band keys of the missing
    * versions — a file-bounded read of just those commits' added
    * files, never a corpus scan (the [[DedupState.loadSidecar]]
    * mechanism, key = `bk`). Missing sidecar or over-capacity → one
    * key-only rebuild at 4x headroom. */
  private[graft] def loadSidecar(spark: SparkSession, state: String)
      : Sidecar = {
    val latest = GraftLog.latestVersion(spark, state).getOrElse(
      throw new IllegalStateException(s"$state is not a graft table"))
    val f = fsOf(spark, state)
    val dir = new HPath(sidecarDir(state))
    val found: Option[Long] =
      if (!f.exists(dir)) None
      else f.listStatus(dir).map(_.getPath.getName).collect {
        case nm if nm.startsWith("band-bloom-v") && nm.endsWith(".meta") =>
          nm.stripPrefix("band-bloom-v").stripSuffix(".meta").toLong
      }.filter(v => v <= latest && f.exists(binPath(state, v)))
        .sorted.lastOption
    found match {
      case Some(v) =>
        val meta = new String(readAll(f, metaPath(state, v)), "UTF-8")
          .linesIterator.map(_.split('=')).collect {
            case Array(k, x) => k -> x }.toMap
        val expected = meta("expected").toLong
        val fpp = meta("fpp").toDouble
        var inserted = meta("inserted").toLong
        val in = f.open(binPath(state, v))
        val bloom = try BloomFilter.readFrom(in) finally in.close()
        val missing = GraftLog.versions(spark, state)
          .count(x => x > v && x <= latest)
        if (missing > 0) {
          // fold only the missing commits' inserted band keys (rows
          // are unique by (bk, doc_id); rewrite-only commits diff
          // empty, so OPTIMIZE between sidecar saves is invisible)
          val catchup = spark.read.format("graft")
            .option("readChangeFeed", "true")
            .option("cdfKeys", "bk,doc_id")
            .option("startingVersion", v + 1)
            .option("endingVersion", latest)
            .load(state)
            .filter(col("_change_type") === "insert")
            .select("bk").distinct()
          val nNew = catchup.count()
          if (inserted + nNew > expected)
            return rebuild(spark, state, latest)
          if (nNew > 0)
            bloom.mergeInPlace(
              catchup.stat.bloomFilter("bk", expected, fpp))
          inserted += nNew
          saveSidecar(spark, state, latest, bloom, expected, fpp,
            inserted)
        }
        Sidecar(bloom, latest, expected, fpp, inserted,
          missing, rebuilt = false)
      case None => rebuild(spark, state, latest)
    }
  }

  /** One key-only corpus scan, 4x headroom — the bootstrap/overflow
    * path, never the steady state. */
  private def rebuild(spark: SparkSession, state: String, latest: Long)
      : Sidecar = {
    val keys = GraftLog.read(spark, state).select("bk")
    val cnt = keys.count()
    val expected = math.max(cnt * 4, 1024L)
    val bloom = keys.stat.bloomFilter("bk", expected, 0.01)
    saveSidecar(spark, state, latest, bloom, expected, 0.01, cnt)
    Sidecar(bloom, latest, expected, 0.01, cnt, 0, rebuilt = true)
  }

  private def readAll(f: FileSystem, p: HPath): Array[Byte] = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Signature-estimated Jaccard: matching positions / numPerm. */
  private def sigEst(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        when(x === y, lit(1)).otherwise(lit(0))),
      lit(0), (acc, x) => acc + x).cast("double") / lit(NumPerm)

  /** Bloom-gated, partition-pruned, hot-band-salted join of a banded
    * batch frame against the persisted band index: one row per
    * state×batch band-key match, `(bk, doc_a, sig_a, doc_b, sig_b)`
    * with the `_a` side from STATE. `b` needs columns
    * (bk, bp, doc_id, sig). The pair set is IDENTICAL to the unpruned,
    * unsalted join: the Bloom admits every present key (reconciled
    * sidecars have no false negatives; a false positive costs one
    * pruned lookup), `bp` pruning keeps every partition a matching key
    * lives in (bp is a function of bk), and the salted hot-band path
    * meets each state×batch pair on exactly one salt. Shared by
    * [[probeAndAdvance]] and the e23 incremental pipeline. */
  private[graft] def prunedBandJoin(spark: SparkSession, state: String,
      sc: Sidecar, b: DataFrame, hotBandThreshold: Int = 256,
      saltBuckets: Int = 16): DataFrame = {
    val bBloom = spark.sparkContext.broadcast(sc.bloom)
    val mightContain =
      udf((k: String) => bBloom.value.mightContainString(k))
    // Bloom gate: only band keys the state MIGHT contain become
    // candidates (exact band equality is re-checked by the join below)
    val cand = b.filter(mightContain(col("bk")))
      .select(col("bk"), col("bp"), col("doc_id").as("doc_b"),
        col("sig").as("sig_b"))
      .transform(graft.CacheScope.tracked)
    val bps = cand.select("bp").distinct()
      .collect().map(_.getInt(0)).toSeq
    // NOT cached: the pruned state side carries the 64-long signature
    // arrays, and materializing them into the cache costs more than
    // the one extra column-pruned parquet read the (rare) hot path
    // pays — the common no-hot path reads these partitions exactly
    // once either way (round-16 e23 shave).
    def stateSide = GraftLog.read(spark, state)
      .filter(col("bp").isin(bps: _*)) // static partition pruning
      .select(col("bk"), col("doc_id").as("doc_a"),
        col("sig").as("sig_a"))
    // HOT-BAND detection: one viral boilerplate string gives many
    // state docs the SAME band key, and an unsalted bk join puts
    // |state ∩ bk| × |batch ∩ bk| verify work in one key group. Band
    // keys above the threshold (counted over the PRUNED candidate
    // partitions only, via a KEY-ONLY column-pruned scan — cheap)
    // verify through a SALTED (bk, salt) join instead: state rows
    // salted by doc hash, candidate rows replicated across all
    // salts — the IDENTICAL pair set (each state×cand pair meets on
    // exactly one salt), with every join group bounded by
    // ~hotBandThreshold/saltBuckets state rows. j7's skew-join
    // discipline applied to the LSH band index.
    val hotKeys = GraftLog.read(spark, state)
      .filter(col("bp").isin(bps: _*))
      .select(col("bk"))
      .groupBy(col("bk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotBandThreshold)
      .select(col("bk"))
      .transform(graft.CacheScope.tracked)
    if (hotKeys.limit(1).count() == 0)
      stateSide.join(broadcast(cand), Seq("bk"))
    else {
      val cold = stateSide
        .join(broadcast(hotKeys), Seq("bk"), "left_anti")
        .join(broadcast(cand), Seq("bk"))
      val hotState = stateSide
        .join(broadcast(hotKeys), Seq("bk"), "left_semi")
        .withColumn("__salt",
          pmod(xxhash64(col("doc_a")), lit(saltBuckets.toLong))
            .cast("int"))
      val hotCand = cand
        .join(broadcast(hotKeys), Seq("bk"), "left_semi")
        .withColumn("__salt",
          explode(array((0 until saltBuckets).map(lit(_)): _*)))
      cold.unionByName(
        hotState.join(hotCand, Seq("bk", "__salt")).drop("__salt"))
    }
  }

  /** Ledger-stamped state advance: append `kept` band rows (any frame
    * carrying `bk` and the `bp` partition column) under
    * (appId, batchId) and roll the band-key Bloom sidecar forward.
    * `sc = None` means a fresh state (first wave): the commit creates
    * the bp-partitioned layout, opts into write-path compaction, and
    * the sidecar bootstraps from the (batch-sized) state scan. A
    * ledger-rejected commit leaves the sidecar untouched. */
  private[graft] def advance(spark: SparkSession, state: String,
      sc: Option[Sidecar], kept: DataFrame, appId: String,
      batchId: Long, fpp: Double = 0.01): Unit = {
    val keptC = kept.repartition(col("bp")) // one writer per dir
      .transform(graft.CacheScope.tracked)
    val keptKeys = keptC.select("bk")
      .transform(graft.CacheScope.tracked)
    val nKept = keptKeys.count()
    val committed = GraftLog.txnAppendPartitioned(keptC, state, appId,
      batchId, Seq("bp"))
    if (!committed) return
    val v = GraftLog.latestVersion(spark, state).get
    sc match {
      case None =>
        GraftLog.setProperties(spark, state, Map(
          "graft.autoCompact" -> "true",
          "graft.autoCompact.minNumFiles" -> "8")): Unit
        // fresh state: the just-committed kept frame IS the state —
        // build the v0 sidecar from the (cached) key frame instead of
        // a read-back rebuild scan
        val expected = math.max(nKept * 4, 1024L)
        saveSidecar(spark, state,
          GraftLog.latestVersion(spark, state).get,
          keptKeys.stat.bloomFilter("bk", expected, fpp), expected,
          fpp, nKept)
      case Some(s) =>
        if (v != s.version + 1) {
          // a concurrent writer interleaved between our sidecar load
          // and our append — the local bitset misses its band keys
          // (false negatives → missed near-dups). Reconcile via the
          // load path: this module's lean form rebuilds key-only at
          // the current version (the rare race, never steady state).
          loadSidecar(spark, state): Unit
        } else if (nKept == 0)
          // the ledger commit advanced the table with zero new keys —
          // re-stamp the unchanged bitset at the new version so the
          // next load stays steady-state
          saveSidecar(spark, state, v, s.bloom, s.expected, s.fpp,
            s.inserted)
        else if (s.inserted + nKept > s.expected) {
          val keys = GraftLog.read(spark, state).select("bk")
          val cnt = keys.count()
          val expected = math.max(cnt * 4, 1024L)
          saveSidecar(spark, state, v,
            keys.stat.bloomFilter("bk", expected, s.fpp), expected,
            s.fpp, cnt)
        } else {
          s.bloom.mergeInPlace(
            keptKeys.stat.bloomFilter("bk", s.expected, s.fpp))
          saveSidecar(spark, state, v, s.bloom, s.expected, s.fpp,
            s.inserted + nKept)
        }
    }
  }

  /** One rolling step: near-dup verdicts for `batch` (`doc_id`,
    * `text`) against the CURRENT state, then the state advances by the
    * non-duplicate docs' band rows in one ledger-stamped commit and
    * the sidecar rolls forward by bitwise merge. Per-batch cost:
    * sidecar IO + batch banding + candidate-partition-pruned verify +
    * O(kept) append.
    *
    * Multi-writer contract: the (appId, batchId) ledger is MONOTONIC
    * per appId — concurrent writers carry their own `appId`.
    * Interleaved commits reconcile on the save path (version check
    * below; [[DedupState.probeAndAdvance]] has the same guard).
    *
    * `verdictTable`: when set, verdicts land in that graft table as a
    * ledger-stamped (appId, batchId) commit BEFORE the state advances —
    * the streaming exactly-once seam. Order matters: a crash-window
    * re-delivery probes a state the original delivery already advanced,
    * so recomputed verdicts would flag the batch against its own band
    * rows; persisting first makes the verdict ledger the gate, and a
    * re-delivered batch REREADS its persisted verdicts (then re-attempts
    * the state advance, which the state ledger no-ops if it landed). */
  def probeAndAdvance(spark: SparkSession, state: String,
      batch: DataFrame, batchId: Long, n: Int = 3,
      threshold: Double = 0.5, appId: String = AppId,
      verdictTable: Option[String] = None,
      hotBandThreshold: Int = 256, saltBuckets: Int = 16): DataFrame = {
    val sc = loadSidecar(spark, state)
    val b = banded(batch, n).transform(graft.CacheScope.tracked)
    val replayed = verdictTable.exists(t =>
      GraftLog.lastCommittedBatch(spark, t, appId).exists(_ >= batchId))
    val verdicts = (if (replayed)
      GraftLog.read(spark, verdictTable.get)
        .filter(col("batch_id") === batchId)
    else {
      val joined = prunedBandJoin(spark, state, sc, b,
          hotBandThreshold, saltBuckets)
        .select(col("bk"), col("doc_a").as("doc_c"),
          col("sig_a").as("sig_c"), col("doc_b"), col("sig_b"))
      val verified = joined
        .withColumn("est", sigEst(col("sig_b"), col("sig_c")))
        .filter(col("est") >= threshold)
        .groupBy(col("doc_b").as("doc_id"))
        .agg(countDistinct(col("doc_c")).as("n_near_dups"),
          round(max(col("est")), 6).as("best_sim"))
      batch.select(col("doc_id"))
        .join(verified.withColumn("__hit", lit(true)), Seq("doc_id"), "left")
        .select(lit(batchId).as("batch_id"), col("doc_id"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
          col("best_sim"),
          coalesce(col("__hit"), lit(false)).as("is_near_dup"))
    }).transform(graft.CacheScope.tracked)
    verdicts.count() // verdicts must outlive the advance below
    if (!replayed) verdictTable.foreach { t =>
      GraftLog.txnAppend(verdicts, t, appId, batchId): Unit
    }
    val kept = b.join(
        verdicts.filter(col("is_near_dup")).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .select("bk", "band", "doc_id", "sig", "bp")
    advance(spark, state, Some(sc), kept, appId, batchId, sc.fpp)
    verdicts
  }

  /** GDPR erasure through the rolling near-dup state: delete every band
    * row of the given docs in ONE transactional commit, then RE-MINT the
    * band-key Bloom sidecar from the surviving state. Without this, an
    * erased document's MinHash signature lives on in its band rows —
    * retained derived data (signatures reconstruct similarity structure)
    * — and its band keys keep flagging future near-identical text
    * against a document the corpus no longer holds.
    *
    * Band keys SHARED with surviving docs stay in the re-minted sidecar
    * (they are the survivors' data); keys unique to the erased docs
    * vanish. Pass `texts` (doc_id, text) when available: the erased
    * docs' band rows live only in their band keys' `bp` partitions, so
    * banding the texts yields a static partition prune for the
    * touched-file probe — without it the probe is one key-semi-joined
    * scan (file rewrite stays bounded to touched files either way). The
    * sidecar re-mint is a key-only state scan — the compliance path
    * pays O(state) once per erasure batch, never per ingest batch.
    * Re-erasing already-erased docs rewrites nothing. Returns the
    * delete commit version. */
  def erase(spark: SparkSession, state: String, docIds: DataFrame,
      texts: Option[DataFrame] = None, n: Int = 3): Long = {
    val keys = docIds.select(col("doc_id")).distinct()
    val prune = texts.map { t =>
      // bp is a pure function of bk, which is a pure function of the
      // text (at the state's shingle width n) — the banding projection
      // reproduces exactly the partitions the doc's state rows landed
      // in. Metadata-sized collect (≤ 64).
      val bps = banded(t, n).select("bp").distinct()
        .collect().map(_.getInt(0)).toSeq
      col("bp").isin(bps: _*)
    }
    val v = GraftLog.deleteMatching(spark, state, keys, Seq("doc_id"),
      prune = prune)
    rebuild(spark, state,
      GraftLog.latestVersion(spark, state).getOrElse(v)): Unit
    v
  }

  /** e20 — the registered-query form: e19's two-batch replay shape
    * (corpus seed, then two batches carrying twins of EARLIER novel
    * docs) with NEAR-dup verdicts. Batch 2's twins duplicate batch 1's
    * novel documents, proving the state advanced between batches; batch
    * 1's twins duplicate the seed corpus. Twins share their source's
    * exact text → signature similarity 1.0, comfortably over τ; the
    * oracle replays the full MinHash/band/estimate pipeline in SQL. */
  def nearDupStateRolling(spark: SparkSession, sfDir: String,
      split: Long = 300, split2: Long = 450): DataFrame = {
    val docs = graft.sources.Sources.testTable(spark, sfDir, "documents")
    val state = graft.sources.Staging.scratchDir("graft_ndstate_") +
      "/bands"
    init(spark, docs.filter(col("doc_id") < split), state)
    val b1 = docs.filter(col("doc_id") >= split && col("doc_id") < split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") < split && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val b2 = docs.filter(col("doc_id") >= split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") >= split && col("doc_id") < split2 &&
          col("doc_id") % 5 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val v1 = probeAndAdvance(spark, state, b1, 0L)
    val v2 = probeAndAdvance(spark, state, b2, 1L)
    v1.unionByName(v2)
  }

  /** i30 — e20 under STREAMING admission: the rolling near-dup state
    * fed by a checkpointed file stream (the Auto-Loader ingest shape).
    * Waves land as parquet files; each micro-batch probes + advances
    * through [[probeAndAdvance]] with the verdicts persisted FIRST as a
    * ledger-stamped commit (see the verdictTable contract there), so
    * exactly-once holds across the kill/resume between the waves AND
    * the crash-window re-delivery this query replays out-of-band after
    * the final drain: both ledgers reject it, pinned by `replay_noop`.
    * Same doc phasing — and the same full-MinHash-replay oracle — as
    * e20; the transport changes, the verdicts cannot. */
  def nearDupStreamIngest(spark: SparkSession, sfDir: String,
      split: Long = 300, split2: Long = 450): DataFrame = {
    val docs = graft.sources.Sources.testTable(spark, sfDir, "documents")
    val root = graft.sources.Staging.scratchDir("graft_ndstream_")
    val (in, state, verd, ckpt) =
      (s"$root/in", s"$root/bands", s"$root/verdicts", s"$root/ckpt")
    init(spark, docs.filter(col("doc_id") < split), state)
    val appId = "graft-neardup-stream"
    val b1 = docs.filter(col("doc_id") >= split && col("doc_id") < split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") < split && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val b2 = docs.filter(col("doc_id") >= split2)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") >= split && col("doc_id") < split2 &&
          col("doc_id") % 5 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    def land(df: DataFrame): Unit =
      df.coalesce(2).write.mode("append").parquet(in)
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          probeAndAdvance(spark, state, batch, bid, appId = appId,
            verdictTable = Some(verd)).count(): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(b1); drain() // wave 1 = micro-batch 0, then "kill"
    drain()           // restart with nothing new: must be a no-op
    land(b2); drain() // resume picks up ONLY wave 2 = micro-batch 1
    // crash-window re-delivery of the last batch, out-of-band: the
    // verdict ledger re-serves batch 1's persisted verdicts and the
    // state ledger rejects the advance — nothing moves
    val (vs, vv) = (GraftLog.latestVersion(spark, state),
      GraftLog.latestVersion(spark, verd))
    probeAndAdvance(spark, state, b2, 1L, appId = appId,
      verdictTable = Some(verd)).count()
    val noop = GraftLog.latestVersion(spark, state) == vs &&
      GraftLog.latestVersion(spark, verd) == vv
    GraftLog.read(spark, verd)
      .select(col("batch_id"), col("doc_id"), col("n_near_dups"),
        col("best_sim"), col("is_near_dup"))
      .withColumn("replay_noop", lit(noop))
  }
}
