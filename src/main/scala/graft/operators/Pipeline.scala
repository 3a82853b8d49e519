package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{GraftLog, Sources, Staging}

/** e22 — the TRAINING-DATA PIPELINE composed end-to-end across the lake
  * and LLM tiers, the staged run SURVEY §0's "training-data pipeline"
  * describes: INGEST (three commits into a graft bronze table) → EXACT
  * DEDUP (digest shuffle, first-occurrence winner) → NEAR-DUP (MinHash
  * 64-perm / 16-band LSH candidates, signature-estimate verify, drop
  * the younger of each pair) → QUALITY GATE (the g2/g20 score) →
  * MIXTURE SAMPLE (per-language content-hash permille, g15) → SEQUENCE
  * PACK (per-language greedy 512-token bins, g16). Every stage is
  * individually oracle-checked elsewhere (d-queries, e1, e3/e20, g2,
  * g15, g16); this query pins their COMPOSITION, with each stage's
  * surviving row count carried as an audit column — the per-stage
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
  * raw signature slices (never all-pairs) with verification confined to
  * candidate pairs; the quality/mixture gates are one codegen'd
  * projection each (zero exchanges); the pack is one hash exchange on
  * lang + a per-partition running sum. Reference anchor: the medallion
  * chain (`mage_demo/custom/financial_dl_etl.py`) runs bronze→silver→
  * gold the same way — this is that shape for LLM data curation. */
object Pipeline {

  def trainingDataPipeline(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val root = Staging.scratchDir("graft_pipe_")
    val bronze = s"$root/bronze"
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))

    // ---- stage 0: INGEST — three commits into the bronze lake table
    GraftLog.overwrite(base, bronze)                               // v0
    GraftLog.append(base.filter(col("doc_id") % 9 === 0)
      .withColumn("doc_id", col("doc_id") + 10000L), bronze)       // v1
    GraftLog.append(base.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 20000L)
      .withColumn("text",
        concat(col("text"), lit(" pipeline near twin suffix"))),
      bronze)                                                      // v2
    val ingested = spark.read.format("graft").load(bronze)
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
    // Candidates by band-slice equi-join, sig-estimate verify >= 0.5,
    // drop the LARGER doc_id of each verified pair (first-occurrence
    // keeps, the e3/e20 discipline).
    val (bands, rows) = (16, 4)
    val sigs = exactKept
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), graft.functions.SketchExpressions
        .shingle_minhash(col("toks"), 3, bands * rows).as("sig"))
      .transform(graft.CacheScope.tracked)
    val keyCols = "band" +: (0 until rows).map(r => s"s$r")
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct((lit(b).as("band") +: (0 until rows).map(r =>
          col("sig").getItem(b * rows + r).as(s"s$r"))): _*)
      }: _*)).as("bk"))
      .select(col("doc_id") +: keyCols.map(c => col(s"bk.$c")): _*)
    val bandEq = keyCols.map(c => col(s"x.$c") === col(s"y.$c"))
      .reduce(_ && _)
    val cand = banded.as("x").join(banded.as("y"),
        bandEq && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val est = cand
      .join(sigs.select(col("doc_id").as("doc_a"),
        col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"),
        col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("est", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (a, v) => a + v).cast("double") / lit(64.0))
    val drops = est.filter(col("est") >= 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearKept = exactKept.join(drops, Seq("doc_id"), "left_anti")
      .transform(graft.CacheScope.tracked)
    val nNear = nearKept.count()

    // ---- stage 3: QUALITY GATE — the g20 score (stopword ratio +
    // length saturation + token-shape), one codegen'd projection
    val toked = nearKept.select(col("doc_id"), col("lang"),
      col("source"), col("text"),
      split(lower(col("text")), " ").as("toks"))
    val cntEn = size(filter(col("toks"),
      t => TextAnalysis.markers("en").map(t === lit(_)).reduce(_ || _)))
    val scored = toked.select(col("doc_id"), col("lang"), col("source"),
      col("text"), size(col("toks")).as("n_tokens"),
      aggregate(transform(col("toks"), t => length(t)),
        lit(0), (a, x) => a + x).as("sum_len"),
      cntEn.as("cnt_en"))
    val quality = {
      val stopR = col("cnt_en").cast("double") /
        col("n_tokens").cast("double")
      val lenSat =
        least(col("n_tokens").cast("double") / lit(100.0), lit(1.0))
      val avgLen = col("sum_len").cast("double") /
        col("n_tokens").cast("double")
      val lenShape = greatest(
        lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0), lit(0.0))
      round(lit(0.5) * stopR + lit(0.3) * lenSat + lit(0.2) * lenShape, 6)
    }
    val qualKept = scored.withColumn("quality_score", quality)
      .filter(col("quality_score") >= 0.4)
      .transform(graft.CacheScope.tracked)
    val nQuality = qualKept.count()

    // ---- stage 4: MIXTURE SAMPLE — per-language content-hash
    // permille (g15): deterministic, engine-portable, no rand()
    val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 1000
    val permille = TextAnalysis.mixturePermille.foldLeft(lit(0)) {
      case (acc, (l, p)) => when(col("lang") === l, lit(p)).otherwise(acc)
    }
    val sampled = qualKept.filter(bucket < permille)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
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
}
