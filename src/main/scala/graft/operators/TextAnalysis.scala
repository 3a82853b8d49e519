package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.{GraftLog, Sources}

/** Text-analysis operators for LLM training-data pipelines (BASELINE.json
  * north star): token statistics, quality scoring, marker-based language
  * ID, and document fingerprinting. All narrow codegen'd projections over
  * the scan — no shuffle anywhere, trivially linear at 100 TB.
  *
  * Oracle discipline: every score is built from exact integer counts with
  * a fixed double expression shape (+,-,*,/, abs, least/greatest only — no
  * libm functions whose rounding could differ across engines).
  */
object TextAnalysis {

  private def toks = split(lower(col("text")), " ")

  /** Token statistics per document: counts are exact ints; the mean token
    * length is the fixed int-sum / int-count double division. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        toks.as("toks"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        aggregate(transform(col("toks"), t => length(t)),
          lit(0), (a, x) => a + x).as("sum_token_len"))
      .withColumn("avg_token_len",
        round(col("sum_token_len").cast("double") /
          col("n_tokens").cast("double"), 6))
      .withColumn("ttr",
        round(col("n_distinct_tokens").cast("double") /
          col("n_tokens").cast("double"), 6))

  /** g18 — smoothed bigram language-model scoring (the CCNet/Wenzek 2020
    * LM-quality-filter stage, with the 5-gram KenLM swapped for a
    * corpus-trained bigram model): per document, the mean smoothed
    * conditional likelihood of its bigrams,
    * score = avg over (w1,w2) of (c(w1 w2) + 1) / (c(w1) + V).
    * Laplace smoothing over the corpus vocabulary V; the statistic is
    * kept LINEAR (no log) deliberately — every factor is an exact count,
    * so the per-bigram term is one double division with a fixed shape and
    * the aggregate follows the [[graft.functions.Deterministic]] decimal
    * discipline, engine-portable where a log-likelihood would ride libm
    * rounding. Monotone-equivalent uses (rank thresholds, top/bottom
    * percentile gates) are unaffected.
    *
    * Scale shape: the two count tables are vocabulary-sized aggregates
    * (token-keyed shuffles with map-side combine); each doc's bigram
    * instances join them by token key — hash equi-joins all the way, no
    * corpus pairs, no driver state. */
  def bigramLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Deterministic.dec
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    // one row per bigram INSTANCE: (doc_id, first token, bigram string)
    val inst = base.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(
          element_at(col("toks"), i + 1).as("w1"),
          concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2)).as("bg")))))
      .select(col("doc_id"), col("col.w1").as("w1"), col("col.bg").as("bg"))
    val uni = Sources.testTable(spark, sfDir, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = inst.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    inst
      .join(bi, Seq("bg"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("term",
        (col("cb") + lit(1.0)) / (col("cu") + col("v")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(dec(col("term"))).as("sum_dec"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_dec").cast("double") / col("n_bigrams"), 6)
          .as("lm_score"))
  }

  /** g19 — DSIR-style importance scoring (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how target-like its HASHED-BIGRAM feature profile
    * is, where "target" is a relationally-defined slice of the corpus
    * (here lang = 'en' — DSIR's target would be a curated corpus; the
    * plumbing is identical). Two Laplace-smoothed hashed-ngram models
    * are trained in one aggregation each — target counts t_b and corpus
    * counts q_b over `buckets` md5-slice feature buckets — and each
    * doc's score is the MEAN per-occurrence likelihood ratio
    *
    *   score(d) = (1/n) Σ_bigram  ((t_b + 1)(Q + B)) / ((q_b + 1)(T + B))
    *
    * The paper uses the log-likelihood ratio; the linear mean-ratio form
    * keeps the statistic engine-portable (no libm — log differs across
    * engines, the e18/g18 discipline) and ranks target-affinity the same
    * way; `selected` = score >= 1 (above corpus-average affinity), the
    * resampling gate. Numerators/denominators are exact integer
    * products (< 2^53 by corpus-size bound); the per-doc mean uses exact
    * decimal accumulation.
    *
    * Scale shape: feature hashing bounds both models at `buckets` rows
    * (broadcastable at any corpus size — DSIR's point); the per-doc pass
    * is one bucket-keyed equi-join + one doc-keyed aggregation. */
  def dsirScore(spark: SparkSession, sfDir: String,
      buckets: Int = 1024): DataFrame = {
    import graft.functions.Deterministic.dec
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    // one row per bigram occurrence, hashed into its feature bucket
    val inst = base.select(col("doc_id"), col("lang"),
      explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => conv(substring(md5(concat_ws(" ",
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2))), 1, 15), 16, 10)
          .cast("long") % buckets)).as("b"))
      .transform(graft.CacheScope.tracked)
    val corpusCounts = inst.groupBy(col("b")).agg(count(lit(1)).as("qb"))
    val targetCounts = inst.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tb"))
    val totals = inst.agg(
      count(lit(1)).as("qtot"),
      count(when(col("lang") === "en", 1)).as("ttot"))
    inst
      .join(corpusCounts, Seq("b"))
      .join(targetCounts, Seq("b"), "left_outer")
      .crossJoin(broadcast(totals))
      .withColumn("term",
        ((coalesce(col("tb"), lit(0L)) + 1L) *
          (col("qtot") + buckets)).cast("double") /
          ((col("qb") + 1L) * (col("ttot") + buckets)).cast("double"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(dec(col("term"))).as("sum_dec"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_dec").cast("double") / col("n_bigrams"), 6)
          .as("dsir_score"))
      .withColumn("selected", col("dsir_score") >= 1.0)
  }

  /** Stopword markers per language for [[langId]] and [[qualityScore]]:
    * tiny profiles of high-frequency function words (the classic
    * stopword-profile heuristic; an n-gram model would use the same
    * argmax plumbing with bigger profiles). */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def markerCount(lang: String): Column =
    size(filter(toks, t => markers(lang).map(t === lit(_)).reduce(_ || _)))

  /** Heuristic quality score in [0,1]: weighted mix of stopword ratio,
    * length saturation, and mean-word-length proximity to 5 chars. The
    * formula uses only IEEE-exact ops so the oracle matches bit-for-bit. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        size(toks).as("n_tokens"),
        markerCount("en").as("n_stop"),
        aggregate(transform(toks, t => length(t)),
          lit(0), (a, x) => a + x).as("sum_len"))
      .withColumn("stopword_ratio",
        round(col("n_stop").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("quality_score", {
        val stopR = col("n_stop").cast("double") / col("n_tokens").cast("double")
        val lenSat = least(col("n_tokens").cast("double") / lit(100.0), lit(1.0))
        val avgLen = col("sum_len").cast("double") / col("n_tokens").cast("double")
        val lenShape = greatest(
          lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0), lit(0.0))
        round(lit(0.5) * stopR + lit(0.3) * lenSat + lit(0.2) * lenShape, 6)
      })
      .drop("n_stop", "sum_len")

  /** Marker-profile language ID: argmax of per-language marker counts with
    * a fixed en>es>de>fr preference on ties. On this corpus (English-ish
    * synthetic vocabulary) it exposes the mismatch with the random `lang`
    * labels — exactly what a lang-ID quality gate does in a real pipeline. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val langs = Seq("en", "es", "de", "fr")
    val withCounts = Sources.testTable(spark, sfDir, "documents")
      .select(Seq(col("doc_id"), col("lang").as("declared_lang"),
        size(toks).as("n_tokens")) ++
        langs.map(l => markerCount(l).as(s"cnt_$l")): _*)
    // argmax with explicit CASE chain (same shape as the oracle SQL)
    val c = (l: String) => col(s"cnt_$l")
    val predicted =
      when(c("en") >= c("es") && c("en") >= c("de") && c("en") >= c("fr"), "en")
        .when(c("es") >= c("de") && c("es") >= c("fr"), "es")
        .when(c("de") >= c("fr"), "de")
        .otherwise("fr")
    withCounts
      .withColumn("predicted_lang", predicted)
      .withColumn("confidence", round(
        greatest(langs.map(c): _*).cast("double") /
          greatest(col("n_tokens").cast("double"), lit(1.0)), 6))
      .select("doc_id", "declared_lang", "predicted_lang", "confidence",
        "n_tokens")
  }

  /** Corpus statistics rollup per (lang, source) slice: doc counts, exact
    * token totals, and exact distinct-token cardinality — the reporting
    * query a curation pipeline runs after every filter stage. The distinct
    * count shuffles (lang, source, token) triples — the right answer for
    * the exactness-required report, the wrong default at 100 TB.
    * [[corpusStatsSketch]] (g13) is the production default: same output
    * shape with a sketch-sized shuffle. */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        Dedup.tokens(col("text")).as("toks"))
    val stats = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks"))).as("total_tokens"))
    val distinctToks = base
      .select(col("lang"), col("source"), explode(col("toks")).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(countDistinct(col("tok")).as("n_distinct_tokens"))
    stats.join(distinctToks, Seq("lang", "source"))
  }

  /** g13 — [[corpusStats]] with the distinct-token cardinality carried by
    * the KMV sketch ([[graft.functions.KMinValues]]) instead of an exact
    * `countDistinct`: the production default at scale. The exact path
    * shuffles every (lang, source, token) triple; here the shuffle
    * carries one k-long buffer per group per partition (partial
    * aggregation merges sketches map-side), so the reduce volume is
    * groups × k × 8 bytes regardless of corpus size. The md5-slice hash
    * keeps the sketch a pure function of the token set, so the estimate —
    * an approximation of the cardinality — is itself EXACTLY reproducible
    * by the DuckDB oracle (the g11 discipline, applied per group). */
  def corpusStatsSketch(spark: SparkSession, sfDir: String,
      k: Int = 256): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        Dedup.tokens(col("text")).as("toks"))
    val stats = base.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks"))).as("total_tokens"))
    val est = base
      .select(col("lang"), col("source"), explode(col("toks")).as("tok"))
      .select(col("lang"), col("source"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          .as("hv"))
      .groupBy(col("lang"), col("source"))
      .agg(graft.functions.KMinValues.kmv_sketch(col("hv"), k).as("kmv"))
      .select(col("lang"), col("source"),
        round(
          when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
              element_at(col("kmv"), k).cast("double")), 6)
          .as("distinct_tokens_est"))
    stats.join(est, Seq("lang", "source"))
  }

  /** Quality gate: keep documents whose [[qualityScore]] clears the
    * threshold — the filter stage those scores exist for. Narrow
    * projection + filter, pushed to the scan. */
  def qualityFilter(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame =
    qualityScore(spark, sfDir)
      .filter(col("quality_score") >= threshold)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("quality_score"))

  /** PII scrubbing: redact emails, URLs, and phone-number-shaped spans —
    * the standard pre-training redaction stage. Patterns are RE2-safe (no
    * backrefs/lookahead) so Java-regex Spark and RE2 DuckDB agree; a
    * narrow codegen'd projection, linear at any scale. The test corpus
    * contains no PII (the spec proves redaction on literal fixtures); the
    * oracle still pins the mechanics end-to-end. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRe   = "https?://[^ ]+"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    piiScrubFrame(Sources.testTable(spark, sfDir, "documents"))

  /** Reusable over any frame with (doc_id, lang, text). */
  def piiScrubFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        PhoneRe, "<PHONE>").as("clean_text"),
      (regexp_count(col("text"), lit(EmailRe)) +
        regexp_count(col("text"), lit(UrlRe)) +
        regexp_count(col("text"), lit(PhoneRe))).as("n_redactions"))

  /** Benchmark-contamination screen: flag documents sharing any probe
    * shingle with a probe document (doc_id 0 stands in for a benchmark
    * set; probes = its 5 lexicographically-smallest 3-gram shingles so the
    * set is deterministic). At scale the probe set broadcasts and the scan
    * stays single-pass — the shape of every decontamination pass. */
  def contamination(spark: SparkSession, sfDir: String,
      nProbes: Int = 5): DataFrame = {
    // the probe set is tiny query metadata (like the LSH hyperplanes):
    // one document's 3-gram shingles, computed driver-side (collecting one
    // row and shingling in Scala — running the shingle expression through
    // a Spark job costs seconds of codegen for a single-row input). Then
    // "probe appears as a shingle of doc d" ⇔ "space-padded text contains
    // the space-padded probe", so the corpus scan needs no shingle
    // materialization, no explode, and no join — one codegen'd projection
    // (12.4s → ~0.6s at sf0.1).
    val probes = contaminationProbes(spark, sfDir, nProbes)
    val docs = Sources.testTable(spark, sfDir, "documents")
    if (probes.isEmpty) {
      // no probe doc / too short for a shingle: nothing can be flagged
      docs.select(col("doc_id"), lit(0L).as("n_probe_hits")).filter(lit(false))
    } else {
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      val hits = probes.map(p =>
          when(padded.contains(s" $p "), 1).otherwise(0))
        .reduce(_ + _)
      docs.select(col("doc_id"), hits.cast("long").as("n_probe_hits"))
        .filter(col("n_probe_hits") > 0)
    }
  }

  private val probeCache =
    new scala.collection.concurrent.TrieMap[(String, Int), Seq[String]]

  /** Probe shingles of doc 0, derived driver-side with semantics matched
    * to the engine/oracle pair: split keeps trailing empties (Spark
    * split/DuckDB string_split do), lowercase is locale-independent
    * (Locale.ROOT, like Spark's lower()), and ordering is UTF-8 byte
    * order (DuckDB ORDER BY / Spark sort), not Java's UTF-16 order.
    * Memoized per (sfDir, n): the collect scan runs once per corpus. */
  private[graft] def contaminationProbes(spark: SparkSession,
      sfDir: String, nProbes: Int): Seq[String] =
    probeCache.getOrElseUpdate((sfDir, nProbes), {
      val utf8Order: Ordering[String] = new Ordering[String] {
        def compare(a: String, b: String): Int = {
          val x = a.getBytes("UTF-8")
          val y = b.getBytes("UTF-8")
          val n = math.min(x.length, y.length)
          var i = 0
          var r = 0
          while (i < n && r == 0) {
            r = (x(i) & 0xFF) - (y(i) & 0xFF)
            i += 1
          }
          if (r != 0) r else x.length - y.length
        }
      }
      Sources.testTable(spark, sfDir, "documents")
        .filter(col("doc_id") === 0).select(col("text"))
        .collect().headOption.map(_.getString(0)) match {
        case None => Seq.empty
        case Some(text) =>
          text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq
            .sliding(3).filter(_.size == 3).map(_.mkString(" "))
            .toSeq.distinct.sorted(utf8Order).take(nProbes)
      }
    })

  /** BPE-ish token counting: alongside the whitespace count, a
    * subword-flavored regex lexer — letter runs | digit runs | punctuation
    * runs (the shape of GPT-2's pretokenizer, simplified to an RE2-safe
    * pattern whose alternatives are disjoint character classes, so Java
    * regex and RE2 tokenize identically). chars-per-token is the standard
    * budget estimator a training pipeline derives from it. */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def tokenCountRegex(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(toks).as("n_ws_tokens"),
        regexp_count(col("text"), lit(BpeTokenRe)).cast("int")
          .as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        when(col("n_bpe_tokens") > 0,
          round(col("n_chars").cast("double") /
            col("n_bpe_tokens").cast("double"), 6))
          .otherwise(lit(null).cast("double")))

  /** Distinct-token cardinality per language via the native KMV sketch
    * aggregate ([[graft.functions.KMinValues]]): the shuffle carries at
    * most k longs per (group, partition) instead of every distinct token
    * — the sketch-sized distinct-count rollup g5 documents as the 100 TB
    * swap, here as a real operator. Because the sketch is a pure
    * function of the hashed input set (no RNG, engine-portable md5-slice
    * hash), the DuckDB oracle reproduces sketch AND estimate exactly;
    * the exact count rides along to exhibit the approximation error. */
  def kmvDistinctTokens(spark: SparkSession, sfDir: String,
      k: Int = 256): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(col("lang"), explode(Dedup.tokens(col("text"))).as("tok"))
      .select(col("lang"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          .as("hv"))
      .groupBy(col("lang"))
      .agg(graft.functions.KMinValues.kmv_sketch(col("hv"), k).as("kmv"),
        countDistinct(col("hv")).as("exact_distinct"))
      .select(col("lang"), col("exact_distinct"),
        round(
          when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
              element_at(col("kmv"), k).cast("double")), 6)
          .as("kmv_estimate"))

  /** Vocabulary build: the K most frequent tokens with a deterministic
    * (count desc, token asc) tie-break — the table a tokenizer/stopword
    * pipeline derives first. Counting is partial+final hash aggregation
    * on the token; the top-K is `orderBy().limit(k)`, which Catalyst
    * plans as TakeOrderedAndProject — each partition keeps its own k
    * best and only those reach the driver-side merge, so there is NO
    * global sort of the distinct-token table (a billion-row full sort
    * at 100 TB). The rank window then runs over exactly k rows. */
  def vocabTopK(spark: SparkSession, sfDir: String,
      k: Int = 100): DataFrame = {
    val counts = Sources.testTable(spark, sfDir, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
    val topk = counts
      .orderBy(col("n_occurrences").desc, col("token").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("token").asc)
    topk.withColumn("rank", row_number().over(w))
  }

  /** Deterministic train/validation split by content hash — the standard
    * technique for reproducible dataset splits that survive re-runs,
    * re-partitioning, and corpus growth (a row's split depends only on
    * its text, never on RNG or row order). The bucket is an md5 slice mod
    * 100, reproducible in any engine (same primitive as the dedup
    * sketches), so unlike `sample()`/`sampleBy()` (Spark-internal RNG
    * stream) this carries an exact oracle. */
  def hashSplit(spark: SparkSession, sfDir: String,
      valPct: Int = 10): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"),
        (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
          % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < valPct, "val").otherwise("train"))

  /** Document fingerprints: whole-text rolling hash (native codegen'd
    * [[graft.functions.RollingHash]] expression; Karp-Rabin 1987) plus a
    * winnowing-style minimum over 4-gram shingle hashes (Schleimer/
    * Wilkerson/Aiken 2003, SIGMOD). Both hashes are engine-portable by
    * construction (mod-p polynomial; 60-bit md5 slice, always positive so
    * signed and unsigned min agree), so unlike the xxhash64 form this is
    * fully oracle-checkable in DuckDB. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        GraftFunctions.rolling_hash(lower(col("text"))).as("fingerprint"),
        array_min(transform(Dedup.shinglesOf(col("toks"), 4),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
          .as("winnow_min"))

  /** g14 — repetition screening (the Gopher quality rules, Rae et al.
    * 2021 §A1.1, token-count form): fraction of bigram occurrences taken
    * by the single most frequent bigram, and fraction of trigram
    * occurrences that are repeats of an already-seen trigram. Boilerplate
    * and crawler-loop pages score high on both; the flag thresholds are
    * the Gopher-ish 0.20 / 0.30. A narrow codegen'd projection: per-doc
    * n-gram counting runs inside higher-order functions over the token
    * array (docs are KB-sized — the per-doc distinct×occurrences scan is
    * bounded), so the operator stays shuffle-free and linear at 100 TB. */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val grams2 = Dedup.shinglesOf(col("toks"), 2) // distinct bigrams
    // occurrence lists (NOT distinct): shinglesOf dedups, so recompute raw
    def occ(n: Int): Column =
      when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("toks"), i + k + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), occ(2).as("g2"), occ(3).as("g3"),
        grams2.as("d2"))
      .select(col("doc_id"),
        size(col("g2")).as("n_bigrams"),
        when(size(col("g2")) > 0,
          array_max(transform(col("d2"),
            g => size(filter(col("g2"), x => x === g)))))
          .otherwise(lit(0)).as("top_bigram_count"),
        size(col("g3")).as("n_trigrams"),
        (size(col("g3")) - size(array_distinct(col("g3"))))
          .as("dup_trigram_count"))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0, round(
          col("top_bigram_count").cast("double") /
            col("n_bigrams").cast("double"), 6)).otherwise(lit(0.0)))
      .withColumn("dup_trigram_frac",
        when(col("n_trigrams") > 0, round(
          col("dup_trigram_count").cast("double") /
            col("n_trigrams").cast("double"), 6)).otherwise(lit(0.0)))
      .withColumn("repetitive",
        col("top_bigram_frac") > 0.2 || col("dup_trigram_frac") > 0.3)
  }

  /** Per-language keep rate (permille) for [[mixtureSample]]: the target
    * corpus mixture a pre-training run dials in (upsample English + code,
    * downsample the tail — here: keep all en, 3/4 zh, half de/es, quarter
    * fr). */
  val mixturePermille: Map[String, Int] =
    Map("en" -> 1000, "zh" -> 750, "de" -> 500, "es" -> 500, "fr" -> 250)

  /** g15 — deterministic source-mixture sampling: each doc is kept iff
    * its CONTENT-hash bucket (md5 slice mod 1000, the g10 primitive)
    * falls under its language's target permille. No RNG: the decision is
    * a pure function of the text, so the sample is reproducible across
    * re-runs, re-partitioning, and engines (`sample()`/`sampleBy()` use
    * Spark-internal RNG streams and carry no oracle). Returns the
    * per-(lang, source) audit the pipeline operator would log: target
    * vs realized keep rate. One narrow projection + one partial+final
    * aggregation — mixture resampling at 100 TB is a single pass. */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 1000
    val permille = mixturePermille.foldLeft(lit(0)) {
      case (acc, (l, p)) => when(col("lang") === l, lit(p)).otherwise(acc)
    }
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        bucket.as("bucket"), permille.as("target_permille"))
      .withColumn("kept", col("bucket") < col("target_permille"))
      .groupBy(col("lang"), col("source"), col("target_permille"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_frac", round(
        col("n_kept").cast("double") / col("n_docs").cast("double"), 6))
  }

  /** g21 — sliding-window CHUNKING with overlap: each document becomes
    * ceil((n - overlap) / stride) token windows of `window` tokens with
    * `overlap` tokens shared between neighbors — the RAG-indexing /
    * long-context-training preprocessing step (every embedding-index
    * build and packed-pretraining shard runs exactly this shape).
    * Window starts are the arithmetic grid 0, stride, 2·stride … <
    * max(n - overlap, 1), so a short document yields one whole-doc
    * chunk and the final window keeps at least `overlap` fresh tokens.
    *
    * Scale shape: one codegen'd projection — split, a `sequence` array
    * of starts, posexplode, `slice` — zero joins, zero shuffles, zero
    * UDFs; output size is corpus size × (1 + overlap/stride) and each
    * task chunks only its own partition's documents. */
  def chunkOverlap(spark: SparkSession, sfDir: String,
      window: Int = 64, overlap: Int = 16): DataFrame = {
    val stride = window - overlap
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0),
          greatest(col("n") - overlap, lit(1)) - 1, lit(stride))))
      .withColumnRenamed("col", "start")
      .select(col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        col("start"),
        size(slice(col("toks"), col("start") + 1, lit(window)))
          .as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** g16 — sequence packing: concatenate documents in a deterministic
    * order until a token budget fills, then start the next sequence (the
    * standard concat-and-wrap packing every pre-training loader runs;
    * see e.g. the T5 / GPT-NeoX input pipelines). A doc's sequence id is
    * `floor(prefix_tokens / budget)` — the running token count BEFORE
    * the doc — so assignment is a prefix-sum, not an iterative loop.
    * Packing runs PER LANGUAGE, but NOT as a per-language window (a
    * real corpus is ~half one language, so `Window.partitionBy(lang)`
    * is one ~50 TB task at the 100 TB target): the running count comes
    * from [[PrefixSum.runningSum]] — range-partition on
    * (lang, doc_id), per-partition subtotals, broadcast offsets,
    * partition-local windows — identical answers, bounded tasks.
    * Emits one row per packed sequence with its fill statistics. */
  def sequencePack(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    val toked = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).as("n_tokens"))
    PrefixSum.runningSum(toked, "lang", Seq(col("doc_id")),
        "n_tokens", "endt")
      .withColumn("prefix_tokens", col("endt") - col("n_tokens"))
      // DIV, not cast(x/y): double-cast would round-vs-truncate drift
      // between engines (driver-gate decimal trap discipline)
      .withColumn("seq_id", expr(s"prefix_tokens DIV $budget"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** g24 — TOKEN-BUDGETED QUALITY SELECTION: the "best N tokens per
    * language" curation step every pretraining mix runs — rank
    * documents by quality (the g2/g20 score), take the quality-ordered
    * prefix while the running token total stays within the per-language
    * budget. Deterministic order (quality desc, doc_id asc tiebreak),
    * INCLUSIVE prefix rule (a doc is selected iff its own running
    * total fits), so both engines replay the identical selection.
    * Output per language: docs/tokens selected vs available, the
    * selection's minimum admitted quality (the effective per-language
    * quality bar a fixed token budget implies — the number mixture
    * designers actually want).
    *
    * Scale shape: one narrow codegen'd scoring projection + a
    * distributed running sum ([[PrefixSum.runningSum]] — range
    * partition on (lang, quality desc, doc_id), broadcast offsets,
    * partition-local windows; never a single task per language) + a
    * partial-combined aggregate; at 100 TB the selection is
    * scan-bound exactly like the packer. */
  def tokenBudgetSelect(spark: SparkSession, sfDir: String,
      budget: Long = 10000L): DataFrame = {
    val toked = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), " ").as("toks"))
    val cntEn = size(filter(col("toks"),
      t => markers("en").map(t === lit(_)).reduce(_ || _)))
    val scored = toked.select(col("doc_id"), col("lang"),
      size(col("toks")).cast("long").as("n_tokens"),
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
    val qscored = scored.withColumn("quality_score", quality)
      .drop("sum_len", "cnt_en")
    PrefixSum.runningSum(qscored, "lang",
        Seq(col("quality_score").desc, col("doc_id").asc),
        "n_tokens", "running_tokens")
      .withColumn("selected", col("running_tokens") <= budget)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_available"),
        sum(col("n_tokens")).as("tokens_available"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("selected"), col("n_tokens")).otherwise(0L))
          .as("tokens_selected"),
        round(min(when(col("selected"), col("quality_score"))), 6)
          .as("quality_bar"))
  }

  /** g25 — PER-SOURCE FREQUENCY CAPPING: the C4 (Raffel et al. 2020) /
    * RefinedWeb (Penedo et al. 2023) host-cap curation stage — no
    * single domain may dominate the corpus. Keep the best `cap`
    * documents per source under the g2 quality order (score desc,
    * doc_id tiebreak), reporting each survivor's in-source rank and
    * the source's pre-cap size.
    *
    * Scale shape: the naive form is ONE row_number window per source —
    * a single task holding the hottest domain's full row set at 100 TB
    * (the round-13 packer lesson, in window form). This runs the
    * bounded two-level top-N instead: (1) rank within
    * (source, doc_id mod salts) — window groups are 1/salts of a
    * source, and any globally-top-`cap` doc is also top-`cap` within
    * its salt slice (its salt-local rank never exceeds its global
    * rank, since its salt-local superiors are a subset of its global
    * superiors); (2) exact ranks over the ≤ salts × cap survivors per
    * source — bounded by construction, not by data. The answer is
    * salt-invariant, so the oracle is the plain per-source window. */
  def sourceCap(spark: SparkSession, sfDir: String, cap: Int = 10,
      salts: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks).as("n_tokens"),
        markerCount("en").as("n_stop"),
        aggregate(transform(toks, t => length(t)),
          lit(0), (a, x) => a + x).as("sum_len"))
      .withColumn("quality_score", {
        val stopR = col("n_stop").cast("double") /
          col("n_tokens").cast("double")
        val lenSat =
          least(col("n_tokens").cast("double") / lit(100.0), lit(1.0))
        val avgLen = col("sum_len").cast("double") /
          col("n_tokens").cast("double")
        val lenShape = greatest(
          lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0), lit(0.0))
        round(lit(0.5) * stopR + lit(0.3) * lenSat + lit(0.2) * lenShape,
          6)
      })
      .select(col("source"), col("doc_id"), col("quality_score"))
    val counts = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source_docs"))
    val w1 = Window
      .partitionBy(col("source"), pmod(col("doc_id"), lit(salts.toLong)))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val survivors = scored
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= cap).drop("__r1")
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    survivors.withColumn("src_rank", row_number().over(w2))
      .filter(col("src_rank") <= cap)
      .join(broadcast(counts), Seq("source"))
  }

  /** g26 — COUNT-MIN-SKETCH token frequency (Cormode & Muthukrishnan
    * 2005): `depth` rows × `width` buckets of exact counter sums — the
    * mergeable fixed-size sketch that answers "how often does token X
    * occur" over a 100 TB corpus with one depth×width-CELL shuffle
    * (map-side combined: each task emits at most depth×width partial
    * cells regardless of corpus size) instead of a vocabulary-sized
    * one; the estimate (min over rows of the colliding bucket sums)
    * only ever OVER-counts. Cells from disjoint corpus shards ADD —
    * the property that lets every ingest batch maintain the sketch
    * incrementally (spec-pinned). The hash family is the
    * engine-portable md5 slice with the row index salted into the
    * preimage, so DuckDB reproduces every bucket and the oracle checks
    * the ESTIMATES exactly, not just their floor. Output: the top-`k`
    * exact tokens with exact count, CMS estimate, and the collision
    * overestimate (≥ 0 always; the spec pins the invariant corpus-wide
    * and the oracle pins the exact collision values at this width). */
  /** The per-row bucket array for a `token` column: row index salted
    * into the md5 preimage — `depth` independent engine-portable
    * hashes. */
  private[graft] def cmsBuckets(depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      pmod(conv(substring(md5(concat(lit(s"$r:"), col("token"))), 1, 15),
        16, 10).cast("long"), lit(width.toLong))): _*)

  /** The sketch itself: (row, bucket) → exact counter sum over a
    * `token`-column frame. Cells from disjoint shards ADD (counter
    * sums) — the merge property the spec pins. */
  private[graft] def cmsCells(tokens: DataFrame, depth: Int,
      width: Int): DataFrame =
    tokens.select(posexplode(cmsBuckets(depth, width)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))

  def cmsTokenFrequency(spark: SparkSession, sfDir: String,
      depth: Int = 4, width: Int = 512, k: Int = 20): DataFrame = {
    val tokens = Sources.testTable(spark, sfDir, "documents")
      .select(explode(Dedup.tokens(col("text"))).as("token"))
    cmsEstimates(cmsCells(tokens, depth, width), tokens, depth, width, k)
  }

  /** Top-`k` exact tokens of `tokens` with their estimates from
    * `cells` (min over row buckets) and the collision overestimate. */
  private def cmsEstimates(cells: DataFrame, tokens: DataFrame,
      depth: Int, width: Int, k: Int): DataFrame = {
    val top = tokens.groupBy(col("token"))
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("token").asc).limit(k)
    val probes = top.select(col("token"), col("exact_count"),
      posexplode(cmsBuckets(depth, width)).as(Seq("r", "b")))
    probes.join(cells, Seq("r", "b"))
      .groupBy(col("token"), col("exact_count"))
      .agg(min(col("c")).as("cms_estimate"))
      .withColumn("overestimate",
        col("cms_estimate") - col("exact_count"))
  }

  private val CmsAppId = "graft-cms"

  /** Fold every source commit past the sketch's ledger high-water into
    * the cells table: CMS is a LINEAR sketch (cells are plain counter
    * sums), so it maintains under inserts, deletes, AND updates by the
    * same signed-delta fold the MV tier uses — +1 per token of an
    * inserted/post-update text, −1 per token of a deleted/pre-update
    * text — one ledger-stamped append per source version (exactly-once
    * by the txn ledger; a replayed version is rejected atomically).
    * Returns the number of versions applied (0 on a pure replay). */
  private[graft] def cmsMaintain(spark: SparkSession, src: String,
      cellsTable: String, depth: Int, width: Int): Int = {
    val from = GraftLog.lastCommittedBatch(spark, cellsTable, CmsAppId)
      .getOrElse(-1L)
    var applied = 0
    GraftLog.versions(spark, src).filter(_ > from).foreach { v =>
      val cdf = GraftLog.changesAt(spark, src, Seq("doc_id"), v,
        preimages = true)
      val deltas = cdf.select(
          when(col("_change_type").isin("insert", "update_postimage"),
            lit(1L)).otherwise(lit(-1L)).as("__sign"),
          explode(Dedup.tokens(col("text"))).as("token"))
        .select(col("__sign"),
          posexplode(cmsBuckets(depth, width)).as(Seq("r", "b")))
        .groupBy(col("r"), col("b")).agg(sum(col("__sign")).as("c"))
      if (GraftLog.txnAppend(deltas, cellsTable, CmsAppId, v))
        applied += 1
    }
    applied
  }

  /** The maintained sketch's answer: fold the cell delta log. Buckets
    * whose running count reaches 0 no longer exist (every contributing
    * token occurrence was deleted) — identical to a fresh build. */
  private[graft] def cmsRead(spark: SparkSession, cellsTable: String)
      : DataFrame =
    GraftLog.read(spark, cellsTable)
      .groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))
      .filter(col("c") > 0)

  /** g27 — INCREMENTALLY MAINTAINED CMS: the sketch-state tier's third
    * member (e18 keeps exact digests, e20 the LSH band index; this
    * keeps the frequency sketch) — and the cleanest one, because CMS
    * is LINEAR: sketch(corpus ∪ batch) = sketch(corpus) + sketch(batch)
    * and deletes subtract exactly, so per-commit CDF deltas maintain
    * the sketch bit-identically to a from-scratch rebuild (the
    * `cells_match_batch` pin computes both and compares — no tolerance).
    * The staged corpus runs the canonical lifecycle (seed, append,
    * delete, text UPDATE — the update folds −preimage +postimage
    * tokens); refresh cost is the CHANGED documents' tokens into
    * ≤ depth×width cells, never the corpus. At 100 TB this is how a
    * heavy-hitter monitor tracks a continuously-ingesting lake: the
    * sketch table is KB-sized, each commit folds in one file-bounded
    * CDF read, and replays are ledger no-ops. */
  def cmsIncremental(spark: SparkSession, sfDir: String,
      depth: Int = 4, width: Int = 512, k: Int = 20): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_cms_")
    val (src, cellsTable) = (s"$root/src", s"$root/cells")
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    GraftLog.overwrite(docs.filter(col("doc_id") % 3 =!= 2), src)  // v0
    cmsMaintain(spark, src, cellsTable, depth, width)
    GraftLog.append(docs.filter(col("doc_id") % 3 === 2), src)     // v1
    GraftLog.delete(spark, src, col("doc_id") % 7 === 0)           // v2
    GraftLog.update(spark, src, col("doc_id") % 11 === 0,
      Seq("text" -> concat(col("text"), lit(" extra"))))           // v3
    val applied = cmsMaintain(spark, src, cellsTable, depth, width)
    val replay = cmsMaintain(spark, src, cellsTable, depth, width)
    // linearity pin: the maintained fold equals a from-scratch build
    // over the source's final state, cell for cell
    val tokens = spark.read.format("graft").load(src)
      .select(explode(Dedup.tokens(col("text"))).as("token"))
    val maintained = cmsRead(spark, cellsTable)
    val batch = cmsCells(tokens, depth, width)
    val cellsMatch = maintained.withColumnRenamed("c", "cm")
      .join(batch, Seq("r", "b"), "full_outer")
      .filter(col("cm").isNull || col("c").isNull ||
        col("cm") =!= col("c"))
      .isEmpty
    cmsEstimates(maintained, tokens, depth, width, k)
      .withColumn("applied_incr", lit(applied))
      .withColumn("replay_noop", lit(replay == 0))
      .withColumn("cells_match_batch", lit(cellsMatch))
  }

  /** g28 — CORPUS DRIFT REPORT: per-commit, per-language document and
    * token deltas over a versioned corpus — the dataset-card audit
    * trail every training-data pipeline owes its consumers ("what
    * changed between corpus v7 and v9, and in which languages?"). One
    * batch CDF read (startingVersion 0, preimages on) delivers every
    * version's row-level changes version-stamped; the report is one
    * grouped fold: inserts/update-postimages count as added,
    * deletes/update-preimages as removed, token deltas from the same
    * rows. A text UPDATE therefore shows as equal doc add/remove with
    * the exact token delta — the accounting a reproducibility review
    * needs.
    *
    * Scale shape: the CDF read is file-bounded per version (only the
    * files each commit touched), the fold is one partial-combined
    * aggregate keyed (version, lang) — report size O(versions ×
    * languages), never a corpus rescan. */
  def corpusDriftReport(spark: SparkSession, sfDir: String): DataFrame = {
    val root = graft.sources.Staging.scratchDir("graft_drift_")
    val src = s"$root/src"
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    GraftLog.overwrite(docs.filter(col("doc_id") % 3 =!= 2), src)  // v0
    GraftLog.append(docs.filter(col("doc_id") % 3 === 2), src)     // v1
    GraftLog.delete(spark, src, col("doc_id") % 7 === 0)           // v2
    GraftLog.update(spark, src, col("doc_id") % 11 === 0,
      Seq("text" -> concat(col("text"), lit(" extra"))))           // v3
    val cdf = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("cdfKeys", "doc_id")
      .option("includePreimages", "true")
      .option("startingVersion", "0")
      .load(src)
    val ins = col("_change_type").isin("insert", "update_postimage")
    val nToks = size(Dedup.tokens(col("text"))).cast("long")
    cdf.groupBy(col("_commit_version").as("version"), col("lang"))
      .agg(sum(when(ins, 1L).otherwise(0L)).as("docs_added"),
        sum(when(ins, 0L).otherwise(1L)).as("docs_removed"),
        sum(when(ins, nToks).otherwise(0L)).as("tokens_added"),
        sum(when(ins, 0L).otherwise(nToks)).as("tokens_removed"))
  }

  /** g23 — SEQUENCE PACKING WITH DOCUMENT SPLITTING: the real
    * pretraining packer. g16 bins whole documents greedily (a document
    * never crosses a bin), which wastes the tail of every bin; actual
    * packed-pretraining shards split documents across fixed-size
    * sequences so every sequence but each stream's last carries
    * EXACTLY `budget` tokens. Per language: the running token offset
    * places each doc at [start, end); the doc contributes a fragment
    * to every `budget`-token grid bin its interval overlaps
    * (`sequence(start DIV b, (end-1) DIV b)` exploded — pure integer
    * arithmetic, engine-portable), with fragment size = the overlap
    * length. Output per (lang, seq_id): fragment count, whole-doc
    * count, packed tokens (== budget except the final bin — the
    * zero-waste invariant the oracle pins), first/last doc.
    *
    * Scale shape: a distributed running sum ([[PrefixSum.runningSum]]
    * — range partition on (lang, doc_id), broadcast offsets,
    * partition-local windows; never a single task per language) + a
    * narrow codegen'd explode whose fan-out is 1 + tokens/budget per
    * doc — no joins beyond the broadcast offsets, no second shuffle
    * beyond the final partial-combined aggregate. At 100 TB the packer
    * is scan-bound, exactly like the g16 form, while eliminating the
    * per-bin padding waste a whole-doc packer ships to the trainer. */
  def sequencePackSplit(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    val b = lit(budget.toLong)
    val toked = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
    PrefixSum.runningSum(toked, "lang", Seq(col("doc_id")),
        "n_tokens", "endt")
      .withColumn("start", col("endt") - col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        expr(s"start DIV $budget"), expr(s"(endt - 1) DIV $budget"))))
      .withColumn("take",
        least(col("endt"), (col("seq_id") + 1) * b) -
          greatest(col("start"), col("seq_id") * b))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_frags"),
        sum(when(col("start") >= col("seq_id") * b &&
          col("endt") <= (col("seq_id") + 1) * b, 1L).otherwise(0L))
          .as("n_whole"),
        sum(col("take")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** g22 — deterministic SHARD SHUFFLE: the global-permutation step of
    * training-data prep (every pretraining run wants examples in a
    * reproducible pseudo-random order, sharded for parallel loaders)
    * WITHOUT a total sort. Shard = 60-bit md5 slice of the doc id mod
    * `nShards`; order within a shard = a second, independent md5 slice
    * (salted `'p'||id`) — two independent hashes give a permutation
    * that is deterministic across runs and engines (the corpus md5
    * discipline) yet uncorrelated with ingest order.
    *
    * Scale shape: ONE hash-partitioned exchange keyed by shard plus a
    * per-shard local sort for the position — the plan a 100 TB shuffle
    * wants (each output shard is one writer's stream; no global
    * ordering, no skew beyond hash variance). A total `ORDER BY
    * rand()` would be a full-corpus range sort; this is
    * embarrassingly parallel by construction. */
  def shardShuffle(spark: SparkSession, sfDir: String,
      nShards: Int = 16): DataFrame = {
    val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("long") % nShards).cast("int")
    val sortKey = conv(substring(
      md5(concat(lit("p"), col("doc_id").cast("string"))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("sort_key"), col("doc_id"))
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).as("n_tokens"))
      .withColumn("shard", shard)
      .withColumn("sort_key", sortKey)
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"))
  }

  /** g20 — the CURATION PIPELINE composed end-to-end (the FineWeb /
    * CCNet shape): lang-ID gate → quality gate → exact first-occurrence
    * dedup → per-source report. Each stage is individually
    * oracle-checked elsewhere (g3, g2/g6, e1, g5); this query pins
    * their COMPOSITION — the per-source survivor counts and token
    * totals after all three gates must match the oracle's replay of
    * the same chain. The input is the corpus plus a re-keyed slice of
    * itself (deterministic injected duplicates — this corpus is
    * exact-dup-free, and a dedup stage that provably drops nothing
    * would pin nothing). Dataflow: gates are one narrow codegen'd
    * projection (zero exchanges, evaluated in the scan stage); dedup
    * shuffles 32-byte digests of the SURVIVORS only — filter-before-
    * dedup is itself the scale discipline (why pay a corpus-wide
    * shuffle for rows the gates discard?); the report is a partial-
    * combined aggregate over (source). */
  def curationPipeline(spark: SparkSession, sfDir: String,
      qThreshold: Double = 0.4): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val docs = base.unionByName(base
      .filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("source"),
        col("text")))
    val langs = Seq("en", "es", "de", "fr")
    def cnt(l: String): Column =
      size(filter(toks, t => markers(l).map(t === lit(_)).reduce(_ || _)))
    val scored = docs.select(
      Seq(col("doc_id"), col("source"), col("text"),
        size(toks).as("n_tokens"),
        aggregate(transform(toks, t => length(t)),
          lit(0), (a, x) => a + x).as("sum_len")) ++
        langs.map(l => cnt(l).as(s"cnt_$l")): _*)
    val c = (l: String) => col(s"cnt_$l")
    val predicted =
      when(c("en") >= c("es") && c("en") >= c("de") && c("en") >= c("fr"),
        "en")
        .when(c("es") >= c("de") && c("es") >= c("fr"), "es")
        .when(c("de") >= c("fr"), "de")
        .otherwise("fr")
    val quality = {
      val stopR = c("en").cast("double") / col("n_tokens").cast("double")
      val lenSat =
        least(col("n_tokens").cast("double") / lit(100.0), lit(1.0))
      val avgLen = col("sum_len").cast("double") /
        col("n_tokens").cast("double")
      val lenShape = greatest(
        lit(1.0) - abs(avgLen - lit(5.0)) / lit(10.0), lit(0.0))
      round(lit(0.5) * stopR + lit(0.3) * lenSat + lit(0.2) * lenShape, 6)
    }
    val gated = scored
      .withColumn("quality_score", quality)
      .filter(predicted === "en" && col("quality_score") >= qThreshold)
    // first-occurrence winner per content digest among the SURVIVORS
    val winners = gated
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    gated.withColumn("h", sha2(col("text"), 256))
      .join(winners, Seq("h"))
      .filter(col("doc_id") === col("keep_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(graft.functions.Deterministic.sumExact(
          col("quality_score")).cast("double") / count(lit(1)), 6)
          .as("avg_quality"))
  }
}
