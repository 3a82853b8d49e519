package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{GraftLog, Sources, Staging}

/** e22/e23 — the TRAINING-DATA PIPELINE composed end-to-end across the
  * lake and LLM tiers, the staged run SURVEY §0's "training-data
  * pipeline" describes: INGEST (three commits into a graft bronze
  * table) → EXACT DEDUP (digest shuffle, first-occurrence winner) →
  * NEAR-DUP (MinHash 64-perm / 16-band LSH candidates,
  * signature-estimate verify, drop the younger of each pair) → QUALITY
  * GATE (the g2/g20 score) → MIXTURE SAMPLE (per-language content-hash
  * permille, g15) → SEQUENCE PACK (per-language 512-token bins, g16,
  * via the distributed prefix sum). Every stage is individually
  * oracle-checked elsewhere (d-queries, e1, e3/e20, g2, g15, g16);
  * e22 pins their COMPOSITION as one batch, e23 pins the SAME
  * composition run INCREMENTALLY over arriving commits — each stage's
  * surviving row count carried as an audit column, the per-stage
  * accounting a production curation run reports.
  *
  * The corpus is the documents table plus two deterministic injected
  * waves: exact twins (doc_id+10000 for %9 keys — caught by stage 1)
  * and near twins (doc_id+20000 for %7 keys with a 4-token suffix —
  * same shingle mass, caught by stage 2's LSH where long enough). A
  * pipeline whose dedup stages provably drop nothing would pin nothing.
  *
  * Dataflow at 100 TB (and why no stage recomputes a prior one): each
  * stage's output is consumed at least twice — once by the audit count,
  * once downstream (the signature frame three times: two band-join
  * sides + verification) — so every seam is persisted via CacheScope
  * (released when the query's scope drains). Stage costs: exact dedup
  * shuffles 32-byte digests; LSH candidates come from an equi-join on
  * band keys (never all-pairs) with verification confined to candidate
  * pairs; the quality/mixture gates are one codegen'd projection each
  * (zero exchanges); the pack is the PrefixSum distributed running sum
  * (range partition + broadcast offsets — no per-language task).
  * Reference anchor: the medallion chain
  * (`mage_demo/custom/financial_dl_etl.py`) runs bronze→silver→gold
  * the same way — this is that shape for LLM data curation. */
object Pipeline {

  private def tT[T](l: String)(f: => T): T =
    if (sys.env.contains("GRAFT_E23_T")) {
      val t0 = System.nanoTime(); val r = f
      println(f"  [e23] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    } else f

  private val Bands = 16
  private val Rows = 4

  /** MinHash signatures over the 3-token shingles of `docs` — one
    * (doc_id, sig) row per doc with ≥ 3 tokens. */
  private def minhashSigs(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(col("doc_id"), graft.functions.SketchExpressions
      .shingle_minhash(col("toks"), 3, Bands * Rows).as("sig"))

  /** `bk`: the band id plus its signature slice joined injectively —
    * band equality as ONE equi-join key, so a persisted band index and
    * an in-flight batch join identically. One exploded row per band. */
  private def bkCol: org.apache.spark.sql.Column =
    explode(array((0 until Bands).map { b =>
      concat_ws(":", (lit(b) +: (0 until Rows).map(r =>
        col("sig").getItem(b * Rows + r))): _*)
    }: _*)).as("bk")

  /** One row per (doc, band). */
  private def bandFrame(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), bkCol)

  /** Signature-estimated Jaccard for a pair of signature arrays —
    * ONE expression shared by the batch and incremental paths, so the
    * two runs' verify filters are bit-identical. */
  private def sigEstCol(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") /
      lit(Bands * Rows * 1.0)

  /** Verified near-dup drops among `cand` (doc_a < doc_b) pairs:
    * signature-estimated Jaccard ≥ 0.5 drops the LARGER id
    * (first-occurrence keeps, the e3/e20 discipline). */
  private def verifiedDrops(cand: DataFrame, allSigs: DataFrame)
      : DataFrame = cand
    .join(allSigs.select(col("doc_id").as("doc_a"),
      col("sig").as("sig_a")), Seq("doc_a"))
    .join(allSigs.select(col("doc_id").as("doc_b"),
      col("sig").as("sig_b")), Seq("doc_b"))
    .withColumn("est", sigEstCol(col("sig_a"), col("sig_b")))
    .filter(col("est") >= 0.5)
    .select(col("doc_b").as("doc_id")).distinct()

  /** [[bandFrame]] carrying the signature and the
    * [[NearDupState]]-convention partition key `bp = hash(bk) mod 64` —
    * the shape the persisted e23 band index stores and probes. */
  private def bandFrameSig(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"), bkCol)
      .withColumn("bp",
        pmod(xxhash64(col("bk")), lit(64L)).cast("int"))

  /** The g20 quality score as one codegen'd projection: keeps
    * (doc_id, lang, text, n_tokens, quality_score) plus any `keep`
    * pass-through columns (the curated pipeline carries `source`
    * through to the cap stage this way — no re-join). */
  private def scoreQuality(docs: DataFrame,
      keep: Seq[String] = Nil): DataFrame = {
    val toked = docs.select(col("doc_id") +: col("lang") +:
      col("text") +: split(lower(col("text")), " ").as("toks") +:
      keep.map(col): _*)
    val cntEn = size(filter(col("toks"),
      t => TextAnalysis.markers("en").map(t === lit(_)).reduce(_ || _)))
    val scored = toked.select(col("doc_id") +: col("lang") +:
      col("text") +: size(col("toks")).as("n_tokens") +:
      aggregate(transform(col("toks"), t => length(t)),
        lit(0), (a, x) => a + x).as("sum_len") +:
      cntEn.as("cnt_en") +: keep.map(col): _*)
    val stopR = col("cnt_en").cast("double") /
      col("n_tokens").cast("double")
    val lenSat =
      least(col("n_tokens").cast("double") / lit(100.0), lit(1.0))
    val avgLen = col("sum_len").cast("double") /
      col("n_tokens").cast("double")
    val lenShape = greatest(
      lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0), lit(0.0))
    scored.withColumn("quality_score",
        round(lit(0.5) * stopR + lit(0.3) * lenSat +
          lit(0.2) * lenShape, 6))
      .drop("sum_len", "cnt_en")
  }

  /** g15 mixture sample: per-language content-hash permille —
    * deterministic, engine-portable, no rand(). Keeps
    * (doc_id, lang, n_tokens). */
  private def mixtureSample(qualKept: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 1000
    val permille = TextAnalysis.mixturePermille.foldLeft(lit(0)) {
      case (acc, (l, p)) => when(col("lang") === l, lit(p)).otherwise(acc)
    }
    qualKept.filter(bucket < permille)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** Stage the e22/e23 bronze table: the corpus plus the two injected
    * twin waves, three commits (v0 overwrite, v1/v2 appends). */
  private def stageBronze(spark: SparkSession, sfDir: String,
      bronze: String): Unit = {
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    GraftLog.overwrite(base, bronze)                               // v0
    GraftLog.append(base.filter(col("doc_id") % 9 === 0)
      .withColumn("doc_id", col("doc_id") + 10000L), bronze)       // v1
    GraftLog.append(base.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 20000L)
      .withColumn("text",
        concat(col("text"), lit(" pipeline near twin suffix"))),
      bronze)                                                      // v2
  }

  def trainingDataPipeline(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = Staging.scratchDir("graft_pipe_")
    val bronze = s"$root/bronze"
    stageBronze(spark, sfDir, bronze)
    batchStages(spark, spark.read.format("graft").load(bronze))
  }

  /** Stages 1–5 of the batch run over an already-ingested corpus —
    * the REFERENCE SEMANTICS the incremental form must reproduce
    * bit-for-bit; exposed so the many-wave property spec can fold an
    * arbitrary commit history and compare. */
  private[graft] def batchStages(spark: SparkSession,
      ingestedIn: DataFrame): DataFrame = {
    // ---- stage 0: INGEST
    val ingested = ingestedIn
      .transform(graft.CacheScope.tracked)
    val nIngested = ingested.count()

    // ---- stage 1: EXACT DEDUP — digest shuffle, min-id winner (e1)
    val withH = ingested.withColumn("h", sha2(col("text"), 256))
    val winners = withH.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val exactKept = withH.join(winners, Seq("h"))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .transform(graft.CacheScope.tracked)
    val nExact = exactKept.count()

    // ---- stage 2: NEAR-DUP — MinHash LSH over the exact survivors
    // (filter-before-near-dup: why sketch rows stage 1 discards?).
    // Candidates by band-key equi-join, sig-estimate verify >= 0.5,
    // drop the LARGER doc_id of each verified pair.
    val sigs = minhashSigs(exactKept)
      .transform(graft.CacheScope.tracked)
    val banded = bandFrame(sigs)
    val cand = banded.as("x").join(banded.as("y"),
        col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val drops = verifiedDrops(cand, sigs)
    val nearKept = exactKept.join(drops, Seq("doc_id"), "left_anti")
      .transform(graft.CacheScope.tracked)
    val nNear = tT("near")(nearKept.count())

    // ---- stage 3: QUALITY GATE (g20 score, one codegen'd projection)
    val qualKept = scoreQuality(nearKept)
      .filter(col("quality_score") >= 0.4)
      .transform(graft.CacheScope.tracked)
    val nQuality = qualKept.count()

    // ---- stage 4: MIXTURE SAMPLE (g15 permille)
    val sampled = mixtureSample(qualKept)
      .transform(graft.CacheScope.tracked)
    val nSample = sampled.count()

    // ---- stage 5: SEQUENCE PACK — per-language 512-token bins (g16).
    // Distributed prefix sum, NOT Window.partitionBy(lang): at 100 TB
    // a corpus is ~half one language and the per-language window is a
    // single ~50 TB task; PrefixSum range-partitions on (lang, doc_id)
    // and runs the running sum partition-locally under broadcast
    // offsets — identical answers, bounded tasks.
    PrefixSum.runningSum(sampled, "lang", Seq(col("doc_id")),
        "n_tokens", "endt")
      .withColumn("prefix_tokens", col("endt") - col("n_tokens"))
      .withColumn("seq_id", expr("prefix_tokens DIV 512"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("n_ingested", lit(nIngested))
      .withColumn("n_after_exact", lit(nExact))
      .withColumn("n_after_neardup", lit(nNear))
      .withColumn("n_after_quality", lit(nQuality))
      .withColumn("n_after_sample", lit(nSample))
  }

  /** e23 — the INCREMENTAL composition: the same six stages advanced
    * per arriving bronze commit wave, so curation cost per refresh is
    * bounded by the NEW documents, never the corpus. The reference's
    * incremental scratchpad (`scratchpads/increamental_dataload.py`)
    * is this micro-batch pattern; at LLM scale the composition needs
    * per-stage STATE, each a transactional graft table advanced by a
    * ledger-stamped commit keyed by the bronze high-water it absorbed
    * (the AggView/i30 exactly-once discipline — a replayed wave is a
    * per-table ledger no-op):
    *
    *   - `st_digest` (content_hash, h2): every kept digest in the
    *     [[DedupState]] layout — hive-partitioned by the 2-char digest
    *     prefix with a versioned Bloom sidecar, so a wave's anti-join
    *     is a Bloom-gated, prefix-PRUNED probe reading only the state
    *     partitions its own candidates touch (at 100 TB: O(batch)
    *     probes, never a state rescan);
    *   - `st_band` (bk, doc_id, sig, bp): the e20/i30 LSH band index
    *     over ALL exact survivors — including near-dup DROPPED docs,
    *     deliberately: batch semantics drop any doc paired with ANY
    *     earlier survivor, so the probe side must see exactly the
    *     batch run's pair universe (state∪batch candidates = the batch
    *     run's pairs restricted to this wave's doc_b side). Stored in
    *     the [[NearDupState]] layout (bp-partitioned, band-key Bloom
    *     sidecar) and probed via its Bloom-gated pruned join with the
    *     hot-band salted verify; band rows CARRY their signature, so
    *     there is no separate signature state to scan;
    *   - `st_lang` (lang, d_tokens): per-language packed-token deltas —
    *     the packer's running offset continues from their fold, so a
    *     wave appends to the last OPEN sequence per language (partial
    *     bins re-aggregate: n_docs/seq_tokens sum, first/last min/max);
    *   - `st_pack`: the partial bins; `st_audit`: one per-stage count
    *     row per wave (committed LAST — the wave's high-water advances
    *     only after every state table landed).
    *
    * Quality and mixture are stateless projections (their verdict
    * depends only on the doc), so incremental = batch for free. The
    * two-wave result must equal [[trainingDataPipeline]] on the union
    * corpus BIT-FOR-BIT — same oracle, `n_batches`/`replay_noop`
    * pinned on top. Monotone doc_ids across waves make min-id
    * first-occurrence winners order-stable, exactly the property a
    * production ingest with monotone ingest keys has. */
  def trainingDataPipelineIncremental(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = Staging.scratchDir("graft_pipei_")
    val bronze = s"$root/bronze"
    tT("stageBronze")(stageBronze(spark, sfDir, bronze))
    // one cache scope PER WAVE: a wave's outputs are durably committed
    // to the state tables before it returns, so its cached seams
    // (full-text frames + 3.7M-row signature bands at sf0.1) must not
    // stay resident while the next wave runs — heap pressure there
    // shows up as across-the-board stage inflation, not a clean OOM
    tT("waveA")(graft.CacheScope.withScope(
      pipelineAdvance(spark, bronze, root, 0L))): Unit
    tT("waveB")(graft.CacheScope.withScope(
      pipelineAdvance(spark, bronze, root, 2L))): Unit
    val replayNoop = tT("replay")(graft.CacheScope.withScope(
      pipelineAdvance(spark, bronze, root, 2L)) == 0)
    foldResult(spark, root, replayNoop)
  }

  /** Digest-prefix length of the e23 exact-dedup state: 1 hex char =
    * 16 partitions, [[DedupState]]'s sandbox setting (e19 documents
    * the 100 TB setting as 2 = 256 dirs; at sf-scale waves, 256 dirs
    * of 10-row files cost more in file handles + compaction than the
    * pruning saves — measured 28→20 s per wave going 256→16). The
    * pruning spec pins the probe to a partition subset either way. */
  private[graft] val DigestPrefixLen = 1

  /** One incremental advance of the composed pipeline over bronze
    * versions (high-water, target]; state tables live under `root`.
    * Returns 0 when the target is already absorbed (the replay pin).
    *
    * Per-wave state cost is O(batch), never O(corpus): the exact-dedup
    * probe routes through [[DedupState.pruneProbe]] (Bloom sidecar
    * gate + digest-prefix static partition pruning) and the band-index
    * probe through [[NearDupState.prunedBandJoin]] (band-key Bloom
    * gate + `bp` partition pruning + hot-band salted verify), so a
    * wave reads only the state partitions its own candidates touch —
    * the e19/e20 rolling-state discipline applied to the composed
    * pipeline. Band rows carry their signature, so verification needs
    * no separate signature-state scan at all. */
  private[graft] def pipelineAdvance(spark: SparkSession,
      bronze: String, root: String, target: Long): Int = {
    val (stDigest, stBand) = (s"$root/st_digest", s"$root/st_band")
    val stPack = s"$root/st_pack"
    val appId = "graft-pipeline-incr"

    def stateOr(path: String, empty: => DataFrame): DataFrame =
      if (GraftLog.versions(spark, path).nonEmpty)
        GraftLog.read(spark, path) else empty

    // st_pack is the wave's ledger GATE: it carries the audit sentinel
    // row and commits LAST, so a torn advance re-runs the wave and the
    // earlier state appends no-op their replays (round-16 shave: the
    // audit and per-language offset tables used to be two more commits
    // per wave; the audit now rides the pack commit and the offsets
    // fold from the pack bins themselves)
    val from = GraftLog.lastCommittedBatch(spark, stPack, appId)
      .getOrElse(-1L)
    val vs = GraftLog.versions(spark, bronze)
      .filter(v => v > from && v <= target)
    if (vs.isEmpty) return 0
    val newDocs = vs.map(v =>
        GraftLog.changesAt(spark, bronze, Seq("doc_id"), v)
          .filter(col("_change_type") === "insert")
          .select(col("doc_id"), col("lang"), col("source"),
            col("text")))
      .reduce(_ unionByName _)
      .transform(graft.CacheScope.tracked)
    val nIn = tT("ingest")(newDocs.count())

    // exact dedup: min-id winner WITHIN the wave, then the digest
    // state drops anything any earlier wave kept — probed via the
    // Bloom-gated, prefix-pruned machinery, never a whole-state scan
    val withH = newDocs
      .withColumn("content_hash", sha2(col("text"), 256))
    val winners = withH.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"))
    val waveWinners = withH.join(winners, Seq("content_hash"))
      .filter(col("doc_id") === col("keep_id"))
      .withColumn("h2",
        substring(col("content_hash"), 1, DigestPrefixLen))
      .transform(graft.CacheScope.tracked)
    val scD = tT("loadScD")(if (GraftLog.versions(spark, stDigest).nonEmpty)
      Some(DedupState.loadSidecar(spark, stDigest)) else None)
    val exactKept = (scD match {
        case Some(sc) =>
          val present =
            DedupState.pruneProbe(spark, stDigest, sc, waveWinners)
          waveWinners.join(broadcast(present), Seq("content_hash"),
            "left_anti")
        case None => waveWinners
      })
      .select(col("content_hash"), col("h2"), col("doc_id"),
        col("lang"), col("text"))
      .transform(graft.CacheScope.tracked)
    val nEx = tT("exact")(exactKept.count())

    // near-dup: the wave's band rows probe the persisted band index
    // (Bloom gate + bp pruning + hot-band salting — identical pair
    // set to the full join) AND themselves; state doc_ids are always
    // the smaller (earlier) side, so the drop discipline matches the
    // batch run exactly. Stored band rows carry `sig`, so both pair
    // sides arrive with their signatures attached — no signature
    // state table, no second state scan.
    val sigs = minhashSigs(exactKept)
      .transform(graft.CacheScope.tracked)
    val banded = bandFrameSig(sigs)
      .transform(graft.CacheScope.tracked)
    val scB = tT("loadScB")(if (GraftLog.versions(spark, stBand).nonEmpty)
      Some(NearDupState.loadSidecar(spark, stBand)) else None)
    val candState = scB match {
      case Some(sc) =>
        NearDupState.prunedBandJoin(spark, stBand, sc, banded)
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            col("sig_a"), col("sig_b"))
      case None =>
        banded.select(col("doc_id").as("doc_a"),
          col("doc_id").as("doc_b"), col("sig").as("sig_a"),
          col("sig").as("sig_b")).limit(0)
    }
    // state-side pairs arrive with both sigs attached (pruned probe);
    // wave-internal pairs come from a THIN (doc_id, bk) self-join —
    // shuffling 64-long signatures through the candidate join would
    // inflate it 16x — with sigs re-attached per distinct pair (the
    // e22 verify). The two pair sources are disjoint (monotone ids:
    // every state doc precedes every wave doc), so verifying them
    // per-branch and unioning the drops equals the joint verify.
    val dropsState = candState
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est", sigEstCol(col("sig_a"), col("sig_b")))
      .filter(col("est") >= 0.5)
      .select(col("doc_b").as("doc_id"))
    val thin = banded.select(col("doc_id"), col("bk"))
    val candWave = thin.as("x").join(thin.as("y"),
        col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .distinct()
    val drops = dropsState.unionByName(verifiedDrops(candWave, sigs))
      .distinct()
    val nearKept = exactKept.join(drops, Seq("doc_id"), "left_anti")
      .transform(graft.CacheScope.tracked)
    val nNear = tT("near")(nearKept.count())

    // quality + mixture: stateless projections
    val qualKept = scoreQuality(nearKept)
      .filter(col("quality_score") >= 0.4)
      .transform(graft.CacheScope.tracked)
    val nQ = tT("qual")(qualKept.count())
    val sampled = mixtureSample(qualKept)
      .transform(graft.CacheScope.tracked)
    val nS = tT("sample")(sampled.count())

    // pack: the per-language running offset folds from the PACK BINS
    // already committed (Σ seq_tokens per language ≡ the old st_lang
    // delta table — one state table and one commit per wave fewer),
    // materialized BEFORE this wave's append so the plan can never
    // read its own commit
    val offs = stateOr(stPack,
        sampled.groupBy(col("lang"))
          .agg(sum(col("n_tokens")).as("seq_tokens")).limit(0))
      .filter(col("lang") =!= AuditLang)
      .groupBy(col("lang"))
      .agg(sum(col("seq_tokens")).as("lang_start"))
      .transform(graft.CacheScope.tracked)
    tT("offs")(offs.count()): Unit
    val bins = PrefixSum.runningSum(sampled, "lang",
        Seq(col("doc_id")), "n_tokens", "endt_local")
      .join(broadcast(offs), Seq("lang"), "left_outer")
      .withColumn("endt",
        coalesce(col("lang_start"), lit(0L)) + col("endt_local"))
      .withColumn("prefix_tokens", col("endt") - col("n_tokens"))
      .withColumn("seq_id", expr("prefix_tokens DIV 512"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

    // state advance, every table ledger-stamped at the same bronze
    // high-water; the PACK commit (carrying the audit sentinel) lands
    // LAST — it is the wave gate, so a torn advance re-runs the wave
    // and each landed table no-ops its replayed append. The digest/
    // band advances roll their Bloom sidecars forward in the same
    // step.
    tT("advanceDigest")(DedupState.advance(spark, stDigest, scD,
      exactKept.select("content_hash", "h2"), appId, target,
      DigestPrefixLen))
    tT("advanceBand")(NearDupState.advance(spark, stBand, scB,
      banded.select("bk", "doc_id", "sig", "bp"), appId, target))
    // the audit sentinel: one row per wave under the reserved language
    // key, its per-stage counts in the audit columns (NULL on bin
    // rows) — a wave with an empty sample still lands its sentinel,
    // so the high-water always advances
    val nullL = lit(null).cast("long")
    val binsAudited = bins
      .select(col("lang"), col("seq_id"), col("n_docs"),
        col("seq_tokens"), col("first_doc"), col("last_doc"),
        nullL.as("n_in"), nullL.as("n_ex"), nullL.as("n_near"),
        nullL.as("n_q"), nullL.as("n_s"))
      .unionByName(spark.range(1).select(lit(AuditLang).as("lang"),
        lit(target).as("seq_id"), lit(0L).as("n_docs"),
        lit(0L).as("seq_tokens"), lit(0L).as("first_doc"),
        lit(0L).as("last_doc"), lit(nIn).as("n_in"),
        lit(nEx).as("n_ex"), lit(nNear).as("n_near"),
        lit(nQ).as("n_q"), lit(nS).as("n_s")))
    tT("pack")(
      GraftLog.txnAppend(binsAudited, stPack, appId, target)): Unit
    1
  }

  /** Reserved `lang` key of the per-wave audit sentinel row in the
    * pack state (no real language collides with it). */
  private[graft] val AuditLang = "__audit"

  // ------------------------------------------------------------- e26
  // The CURATED pipeline: e23's staged composition plus the two gates
  // a production curation run adds — eval-set CONTAMINATION (g8) and
  // PER-SOURCE frequency capping (g25). Both in incremental-friendly
  // form: the probe shingles are fixed query metadata evaluated as a
  // broadcast-free codegen'd projection (stateless — incremental =
  // batch for free), and the source cap keeps a per-source RUNNING
  // admit count as one more state table, admitting by arrival order.
  // With monotone ingest ids (the production ingest-key property the
  // incremental form already assumes for min-id dedup winners),
  // first-N-by-arrival is exactly the batch run's
  // smallest-N-by-doc_id — the oracle's plain per-source window.

  /** Per-source admission budget of the curated pipeline — small
    * enough to BIND at every test SF (the documents corpus spreads 25
    * docs over each of 20 sources; post-gate samples run ~7/source),
    * so the capped result actually exercises the cut. */
  private[graft] val SrcCap = 6
  private val CapSalts = 4

  /** The contamination gate: drop docs sharing any probe shingle with
    * the eval set (g8's padded-contains form — no shingle
    * materialization, no join; `probes` are tiny fixed metadata). */
  private def decontaminate(docs: DataFrame, probes: Seq[String])
      : DataFrame =
    if (probes.isEmpty) docs
    else {
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      docs.filter(!probes.map(p => padded.contains(s" $p "))
        .reduce(_ || _))
    }

  /** Mixture sample keeping the `source` column (the cap stage needs
    * it); otherwise g15's permille verbatim. */
  private def mixtureSampleSrc(qualKept: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 1000
    val permille = TextAnalysis.mixturePermille.foldLeft(lit(0)) {
      case (acc, (l, p)) => when(col("lang") === l, lit(p)).otherwise(acc)
    }
    qualKept.filter(bucket < permille)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
  }

  /** Admit ≤ `allowed(source)` docs per source by doc_id order, via
    * g25's salted two-level rank — no per-source single task: level 1
    * ranks within (source, doc_id mod salts) and keeps ≤ SrcCap per
    * slice (any doc admitted globally is also top-SrcCap in its slice,
    * since allowed ≤ SrcCap and slice-local superiors are a subset of
    * global superiors); level 2 ranks the ≤ salts×SrcCap survivors
    * exactly. */
  private def capBySource(sampled: DataFrame, prior: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window
      .partitionBy(col("source"),
        pmod(col("doc_id"), lit(CapSalts.toLong)))
      .orderBy(col("doc_id").asc)
    val surv = sampled.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= SrcCap).drop("__r1")
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("doc_id").asc)
    surv.withColumn("__r", row_number().over(w2))
      .join(broadcast(prior), Seq("source"), "left")
      .filter(col("__r") <=
        lit(SrcCap.toLong) - coalesce(col("n_admitted"), lit(0L)))
      .drop("__r", "n_admitted")
  }

  /** The batch reference semantics of the curated pipeline — the
    * e22 stages with contamination after near-dup and the source cap
    * after the mixture sample; the spec folds arbitrary commit
    * histories through [[curatedAdvance]] and compares to this. */
  private[graft] def batchStagesCurated(spark: SparkSession,
      ingestedIn: DataFrame, probes: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ingested = ingestedIn.transform(graft.CacheScope.tracked)
    val nIngested = ingested.count()
    val withH = ingested.withColumn("h", sha2(col("text"), 256))
    val winners = withH.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val exactKept = withH.join(winners, Seq("h"))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .transform(graft.CacheScope.tracked)
    val nExact = exactKept.count()
    val sigs = minhashSigs(exactKept)
      .transform(graft.CacheScope.tracked)
    val banded = bandFrame(sigs)
    val cand = banded.as("x").join(banded.as("y"),
        col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val drops = verifiedDrops(cand, sigs)
    val nearKept = exactKept.join(drops, Seq("doc_id"), "left_anti")
      .transform(graft.CacheScope.tracked)
    val nNear = nearKept.count()
    val contamKept = decontaminate(nearKept, probes)
    val nContam = contamKept.count()
    val qualKept = scoreQuality(contamKept, keep = Seq("source"))
      .filter(col("quality_score") >= 0.4)
      .transform(graft.CacheScope.tracked)
    val nQuality = qualKept.count()
    val sampled = mixtureSampleSrc(qualKept)
      .transform(graft.CacheScope.tracked)
    val nSample = sampled.count()
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("doc_id").asc)
    val capped = sampled.withColumn("__r", row_number().over(w2))
      .filter(col("__r") <= SrcCap).drop("__r")
      .transform(graft.CacheScope.tracked)
    val nCap = capped.count()
    PrefixSum.runningSum(capped.select("doc_id", "lang", "n_tokens"),
        "lang", Seq(col("doc_id")), "n_tokens", "endt")
      .withColumn("prefix_tokens", col("endt") - col("n_tokens"))
      .withColumn("seq_id", expr("prefix_tokens DIV 512"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("n_ingested", lit(nIngested))
      .withColumn("n_after_exact", lit(nExact))
      .withColumn("n_after_neardup", lit(nNear))
      .withColumn("n_after_contam", lit(nContam))
      .withColumn("n_after_quality", lit(nQuality))
      .withColumn("n_after_sample", lit(nSample))
      .withColumn("n_after_cap", lit(nCap))
  }

  /** e26 — the curated composition advanced incrementally: e23's
    * state tables plus `st_src` (source, d_admits), the per-source
    * running admit counts the cap stage continues from. Same ledger
    * discipline: every table stamped at the wave's bronze high-water,
    * the pack commit (carrying the audit sentinel) last. */
  def trainingDataPipelineCurated(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = Staging.scratchDir("graft_pipec_")
    val bronze = s"$root/bronze"
    stageBronze(spark, sfDir, bronze)
    val probes = TextAnalysis.contaminationProbes(spark, sfDir, 5)
    // per-wave cache scopes — see trainingDataPipelineIncremental
    graft.CacheScope.withScope(
      curatedAdvance(spark, bronze, root, 0L, probes)): Unit
    graft.CacheScope.withScope(
      curatedAdvance(spark, bronze, root, 2L, probes)): Unit
    val replayNoop = graft.CacheScope.withScope(
      curatedAdvance(spark, bronze, root, 2L, probes)) == 0
    foldCurated(spark, root, replayNoop)
  }

  /** One curated advance over bronze (high-water, target]. Returns 0
    * when already absorbed. Per-wave state cost is O(batch) exactly as
    * [[pipelineAdvance]]: the two new stages add one broadcast of the
    * (tiny) per-source admit counts and zero extra scans. */
  private[graft] def curatedAdvance(spark: SparkSession,
      bronze: String, root: String, target: Long,
      probes: Seq[String]): Int = {
    val (stDigest, stBand) = (s"$root/st_digest", s"$root/st_band")
    val (stSrc, stPack) = (s"$root/st_src", s"$root/st_pack")
    val appId = "graft-pipeline-curated"

    def stateOr(path: String, empty: => DataFrame): DataFrame =
      if (GraftLog.versions(spark, path).nonEmpty)
        GraftLog.read(spark, path) else empty

    val from = GraftLog.lastCommittedBatch(spark, stPack, appId)
      .getOrElse(-1L)
    val vs = GraftLog.versions(spark, bronze)
      .filter(v => v > from && v <= target)
    if (vs.isEmpty) return 0
    val newDocs = vs.map(v =>
        GraftLog.changesAt(spark, bronze, Seq("doc_id"), v)
          .filter(col("_change_type") === "insert")
          .select(col("doc_id"), col("lang"), col("source"),
            col("text")))
      .reduce(_ unionByName _)
      .transform(graft.CacheScope.tracked)
    val nIn = tT("c.ingest")(newDocs.count())

    val withH = newDocs
      .withColumn("content_hash", sha2(col("text"), 256))
    val winners = withH.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"))
    val waveWinners = withH.join(winners, Seq("content_hash"))
      .filter(col("doc_id") === col("keep_id"))
      .withColumn("h2",
        substring(col("content_hash"), 1, DigestPrefixLen))
      .transform(graft.CacheScope.tracked)
    val scD = if (GraftLog.versions(spark, stDigest).nonEmpty)
      Some(DedupState.loadSidecar(spark, stDigest)) else None
    val exactKept = (scD match {
        case Some(sc) =>
          val present =
            DedupState.pruneProbe(spark, stDigest, sc, waveWinners)
          waveWinners.join(broadcast(present), Seq("content_hash"),
            "left_anti")
        case None => waveWinners
      })
      .select(col("content_hash"), col("h2"), col("doc_id"),
        col("lang"), col("source"), col("text"))
      .transform(graft.CacheScope.tracked)
    val nEx = tT("c.exact")(exactKept.count())

    val sigs = minhashSigs(exactKept)
      .transform(graft.CacheScope.tracked)
    val banded = bandFrameSig(sigs)
      .transform(graft.CacheScope.tracked)
    val scB = if (GraftLog.versions(spark, stBand).nonEmpty)
      Some(NearDupState.loadSidecar(spark, stBand)) else None
    val candState = scB match {
      case Some(sc) =>
        NearDupState.prunedBandJoin(spark, stBand, sc, banded)
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            col("sig_a"), col("sig_b"))
      case None =>
        banded.select(col("doc_id").as("doc_a"),
          col("doc_id").as("doc_b"), col("sig").as("sig_a"),
          col("sig").as("sig_b")).limit(0)
    }
    val dropsState = candState
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est", sigEstCol(col("sig_a"), col("sig_b")))
      .filter(col("est") >= 0.5)
      .select(col("doc_b").as("doc_id"))
    val thin = banded.select(col("doc_id"), col("bk"))
    val candWave = thin.as("x").join(thin.as("y"),
        col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .distinct()
    val drops = dropsState.unionByName(verifiedDrops(candWave, sigs))
      .distinct()
    val nearKept = exactKept.join(drops, Seq("doc_id"), "left_anti")
      .transform(graft.CacheScope.tracked)
    val nNear = tT("c.near")(nearKept.count())

    // contamination: a cheap 5-contains filter over the CACHED
    // near-dup survivors — deliberately NOT cached itself (a second
    // full-text cache of the corpus thrashes the heap; consumers read
    // through the nearKept cache)
    val contamKept = decontaminate(nearKept, probes)
    val nContam = tT("c.contam")(contamKept.count())

    val qualKept = scoreQuality(contamKept, keep = Seq("source"))
      .filter(col("quality_score") >= 0.4)
      .transform(graft.CacheScope.tracked)
    val nQ = tT("c.qual")(qualKept.count())
    val sampled = mixtureSampleSrc(qualKept)
      .transform(graft.CacheScope.tracked)
    val nS = tT("c.sample")(sampled.count())

    // source cap: prior admits fold from st_src, materialized BEFORE
    // this wave's append
    val prior = stateOr(stSrc,
        sampled.groupBy(col("source"))
          .agg(sum(lit(0L)).as("d_admits")).limit(0))
      .groupBy(col("source"))
      .agg(sum(col("d_admits")).as("n_admitted"))
      .transform(graft.CacheScope.tracked)
    tT("c.prior")(prior.count()): Unit
    val capped = capBySource(sampled, prior)
      .transform(graft.CacheScope.tracked)
    val nCap = tT("c.cap")(capped.count())

    val offs = stateOr(stPack,
        capped.groupBy(col("lang"))
          .agg(sum(col("n_tokens")).as("seq_tokens")).limit(0))
      .filter(col("lang") =!= AuditLang)
      .groupBy(col("lang"))
      .agg(sum(col("seq_tokens")).as("lang_start"))
      .transform(graft.CacheScope.tracked)
    offs.count(): Unit
    val bins = PrefixSum.runningSum(
        capped.select("doc_id", "lang", "n_tokens"), "lang",
        Seq(col("doc_id")), "n_tokens", "endt_local")
      .join(broadcast(offs), Seq("lang"), "left_outer")
      .withColumn("endt",
        coalesce(col("lang_start"), lit(0L)) + col("endt_local"))
      .withColumn("prefix_tokens", col("endt") - col("n_tokens"))
      .withColumn("seq_id", expr("prefix_tokens DIV 512"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

    tT("c.advanceDigest")(DedupState.advance(spark, stDigest, scD,
      exactKept.select("content_hash", "h2"), appId, target,
      DigestPrefixLen))
    tT("c.advanceBand")(NearDupState.advance(spark, stBand, scB,
      banded.select("bk", "doc_id", "sig", "bp"), appId, target))
    tT("c.src")(GraftLog.txnAppend(capped.groupBy(col("source"))
      .agg(count(lit(1)).as("d_admits")), stSrc, appId, target)): Unit
    val nullL = lit(null).cast("long")
    val binsAudited = bins
      .select(col("lang"), col("seq_id"), col("n_docs"),
        col("seq_tokens"), col("first_doc"), col("last_doc"),
        nullL.as("n_in"), nullL.as("n_ex"), nullL.as("n_near"),
        nullL.as("n_ct"), nullL.as("n_q"), nullL.as("n_s"),
        nullL.as("n_cap"))
      .unionByName(spark.range(1).select(lit(AuditLang).as("lang"),
        lit(target).as("seq_id"), lit(0L).as("n_docs"),
        lit(0L).as("seq_tokens"), lit(0L).as("first_doc"),
        lit(0L).as("last_doc"), lit(nIn).as("n_in"),
        lit(nEx).as("n_ex"), lit(nNear).as("n_near"),
        lit(nContam).as("n_ct"), lit(nQ).as("n_q"),
        lit(nS).as("n_s"), lit(nCap).as("n_cap")))
    tT("c.pack")(
      GraftLog.txnAppend(binsAudited, stPack, appId, target)): Unit
    1
  }

  /** Fold the curated pack state into the e26 result shape. */
  private[graft] def foldCurated(spark: SparkSession, root: String,
      replayNoop: Boolean): DataFrame = {
    val stPack = s"$root/st_pack"
    val packed = GraftLog.read(spark, stPack)
      .transform(graft.CacheScope.tracked)
    val a = packed.filter(col("lang") === AuditLang)
      .agg(sum(col("n_in")), sum(col("n_ex")), sum(col("n_near")),
        sum(col("n_ct")), sum(col("n_q")), sum(col("n_s")),
        sum(col("n_cap")), count(lit(1)))
      .head()
    packed.filter(col("lang") =!= AuditLang)
      .groupBy(col("lang"), col("seq_id"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("seq_tokens")).as("seq_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
      .withColumn("n_ingested", lit(a.getLong(0)))
      .withColumn("n_after_exact", lit(a.getLong(1)))
      .withColumn("n_after_neardup", lit(a.getLong(2)))
      .withColumn("n_after_contam", lit(a.getLong(3)))
      .withColumn("n_after_quality", lit(a.getLong(4)))
      .withColumn("n_after_sample", lit(a.getLong(5)))
      .withColumn("n_after_cap", lit(a.getLong(6)))
      .withColumn("n_batches", lit(a.getLong(7)))
      .withColumn("replay_noop", lit(replayNoop))
  }

  /** Fold the pack state (bins + per-wave audit sentinels) into the
    * e23 result shape. */
  private[graft] def foldResult(spark: SparkSession, root: String,
      replayNoop: Boolean): DataFrame = {
    val stPack = s"$root/st_pack"
    val packed = GraftLog.read(spark, stPack)
      .transform(graft.CacheScope.tracked)
    val a = packed.filter(col("lang") === AuditLang)
      .agg(sum(col("n_in")), sum(col("n_ex")), sum(col("n_near")),
        sum(col("n_q")), sum(col("n_s")), count(lit(1)))
      .head()
    packed.filter(col("lang") =!= AuditLang)
      .groupBy(col("lang"), col("seq_id"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("seq_tokens")).as("seq_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
      .withColumn("n_ingested", lit(a.getLong(0)))
      .withColumn("n_after_exact", lit(a.getLong(1)))
      .withColumn("n_after_neardup", lit(a.getLong(2)))
      .withColumn("n_after_quality", lit(a.getLong(3)))
      .withColumn("n_after_sample", lit(a.getLong(4)))
      .withColumn("n_batches", lit(a.getLong(5)))
      .withColumn("replay_noop", lit(replayNoop))
  }
}
