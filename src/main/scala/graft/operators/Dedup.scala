package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Deduplication operators for LLM training-data pipelines (BASELINE.json
  * north star; not present in the reference, which only needed
  * `dropDuplicates`-free workloads). Five escalating strategies:
  *
  *   1. [[exact]] — content-hash groupBy. The 100 TB shape: shuffle a 32-byte
  *      digest, never the document body.
  *   2. [[ngramJaccard]] — exact word-n-gram Jaccard over bounded pairs
  *      (the verification oracle for the approximate methods).
  *   3. [[minhashLsh]] — shingle → minhash signature → banded LSH bucket
  *      join → exact-Jaccard verification. The scale path: candidate
  *      generation is a hash-partitioned equi-join on (band, bandHash), so
  *      cost tracks the number of colliding pairs, not n².
  *   4. [[simhash]] — 64-bit SimHash + pigeonhole chunk join for
  *      Hamming-distance candidates.
  *   5. [[embeddingCosine]] — exact cosine near-dup pairs over embeddings
  *      (brute-force form; the LSH-bucketed scale variant lives in
  *      [[Similarity]]).
  *
  * Everything is built-in `functions._` plus graft's native sketch
  * expressions — no UDFs, no collect. See SURVEY.md §7.6. Literature:
  * MinHash resemblance sketches (Broder 1997, "On the resemblance and
  * containment of documents"); banded LSH (Leskovec/Rajaraman/Ullman,
  * Mining of Massive Datasets, ch. 3); SimHash (Charikar 2002, STOC;
  * Hamming-chunk candidate generation per Manku/Jain/Sarma, WWW 2007).
  */
object Dedup {

  // ---------------------------------------------------------------- shared

  /** Lower-cased whitespace tokens. */
  def tokens(c: Column): Column = split(lower(c), " ")

  /** Distinct word n-gram shingles from a *materialized* token-array
    * column; empty array when the doc is shorter than n tokens (sequence()
    * would otherwise run descending).
    *
    * PERF: `toks` must be a column reference, not an inline `split(...)`
    * expression — lambda bodies don't share subexpressions, so an inline
    * split would re-tokenize the whole document for every element_at in
    * every shingle (measured 9s of a 12s query at sf0.1). Keeping the
    * tokens in their own projection makes each access an O(1) array read;
    * CollapseProject leaves the boundary alone because the attribute is
    * referenced many times. */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Convenience form for literal fixtures/specs; production paths
    * materialize tokens first (see [[shinglesOf]] perf note). */
  def shingles(c: Column, n: Int): Column = shinglesOf(tokens(c), n)

  /** documents → (doc_id, sh) with tokens materialized in their own
    * projection — the shared front end of every shingle-based operator.
    * Uses the native [[graft.functions.ShingleSet]] (same string set as
    * [[shinglesOf]], one fused pass instead of a Catalyst HOF tree per
    * window — the HOF form measurably dominated e2/e7). */
  private[operators] def shingled(spark: SparkSession, sfDir: String, n: Int,
      maxDocId: Long = Long.MaxValue): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "documents")
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    base.select(col("doc_id"),
        graft.functions.SketchExpressions.shingle_set(col("toks"), n).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Exact Jaccard between two distinct-element arrays, as a double with
    * the fixed |A∩B| / (|A|+|B|-|A∩B|) expression shape. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  // ---------------------------------------------------------------- exact

  /** Exact dedup via content hash: one output row per distinct text,
    * keeping the smallest doc_id. GroupBy key is sha256(text) — at 100 TB
    * the shuffle carries 32-byte digests, not document bodies, and the
    * aggregate is partial-combined map-side. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- n-gram

  /** Exact n-gram Jaccard pairs (j >= threshold) over a bounded id range,
    * via an INVERTED SHINGLE INDEX: explode distinct shingles, equi-join
    * on the shingle, count co-occurrences per pair = |A∩B|, then derive
    * Jaccard from the set sizes. Pairs sharing no shingle never
    * materialize (their Jaccard is 0 < threshold — `threshold` must be
    * positive), so cost tracks co-occurring pairs, not n²: the same
    * exact answer as the naive all-pairs array-intersect join at a
    * fraction of the work, and every join is a hash-partitioned
    * equi-join. The id bound is SURFACED in the result (`max_doc_id`
    * column) so a consumer can never mistake a capped run for full-corpus
    * coverage; the registered e7 twin runs uncapped. The default cap
    * exists so the e2 DuckDB oracle (which IS all-pairs) stays cheap;
    * [[minhashLsh]] is the approximate scale path when even the inverted
    * index is too much. */
  def ngramJaccard(spark: SparkSession, sfDir: String, n: Int = 3,
      threshold: Double = 0.1, maxDocId: Long = 200): DataFrame = {
    require(threshold > 0.0,
      "threshold must be positive: zero-overlap pairs never materialize")
    // sizes and the index both consume the shingles — compute once.
    // Persist contract (here and in the LSH/similarity operators): frames
    // stay cached for intra-query reuse and are registered with
    // graft.CacheScope — a consumer wraps the materializing action in
    // CacheScope.withScope for scoped release; Verify/Bench additionally
    // call spark.catalog.clearCache() per query.
    val docs = shingled(spark, sfDir, n, maxDocId)
      .transform(graft.CacheScope.tracked)
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    inv.as("x").join(inv.as("y"),
        col("x.shingle") === col("y.shingle") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("nb")),
        Seq("doc_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"),
        lit(maxDocId).as("max_doc_id"))
  }

  /** e7 — [[ngramJaccard]] without the id cap: full-corpus exact n-gram
    * dedup through the inverted index. Same plan shape (the cap was an
    * oracle-cost concession, not a scale requirement); `max_doc_id`
    * carries the Long.MaxValue sentinel meaning "uncapped". */
  def ngramJaccardFull(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccard(spark, sfDir, maxDocId = Long.MaxValue)

  /** e13 — directional CONTAINMENT dedup: the "quoted / subset document"
    * case symmetric Jaccard under-scores (a short doc fully embedded in
    * a long one has low Jaccard but containment ≈ 1), a real
    * training-data concern — boilerplate, quotations, page-of-a-book
    * extracts. c(a ⊆ b) = |S(a) ∩ S(b)| / |S(a)|: same inverted shingle
    * index and co-occurrence counting as e7, only the NORMALIZER
    * changes, which makes the measure directional — both directions are
    * emitted when both clear the threshold. At 100 TB the bucketed
    * variant of this exact form is the LSH Ensemble (Zhu et al.,
    * VLDB 2016): partition the index by set size and tune bands per
    * partition; the exact form stays the bounded audit, like e7 vs e3. */
  def containment(spark: SparkSession, sfDir: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0,
      "threshold must be positive: zero-overlap pairs never materialize")
    val docs = shingled(spark, sfDir, n, Long.MaxValue)
      .transform(graft.CacheScope.tracked)
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    inv.as("x").join(inv.as("y"),
        col("x.shingle") === col("y.shingle") &&
        col("x.doc_id") =!= col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_in"), col("y.doc_id").as("doc_out"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_in"), col("sz").as("na")),
        Seq("doc_in"))
      .withColumn("containment",
        col("inter").cast("double") / col("na").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("doc_in"), col("doc_out"),
        round(col("containment"), 6).as("containment"))
  }

  // --------------------------------------------- bucketed containment

  /** Size-partition lower bounds for [[containmentBucketed]]: partition p
    * covers distinct-shingle counts [bounds(p), bounds(p+1)) (last
    * unbounded). Geometric, so a partition's worst-case size asymmetry is
    * fixed and the per-partition-pair overlap bound below stays useful. */
  private[graft] val ContainBounds: Seq[Int] =
    Seq(1, 8, 16, 32, 64, 128, 256, 512, 1024)

  /** Spark CASE expression assigning a size to its partition index. */
  private def containPartOf(sz: Column): Column =
    ContainBounds.tail.zipWithIndex.foldRight(
      lit(ContainBounds.length - 1): Column) {
      case ((bound, idx), rest) => when(sz < bound, lit(idx)).otherwise(rest)
    }

  /** The same partition CASE as DuckDB SQL text (oracle twin). */
  private[graft] def containPartSql(szExpr: String): String =
    ContainBounds.tail.zipWithIndex
      .map { case (b, i) => s"WHEN $szExpr < $b THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${ContainBounds.length - 1} END")

  /** The per-bucket minimum-overlap bound k(p) = max(1, ceil(t·lo_p))
    * as a CASE over the partition index — shared shape with the oracle
    * (generated from the same [[containCombos]] constants). */
  private def containKOf(part: Column, threshold: Double): Column =
    ContainBounds.indices.init.foldRight(
      lit(math.max(1, math.ceil(threshold * ContainBounds.last).toInt))
        : Column) { (p, rest) =>
      when(part === p,
        lit(math.max(1, math.ceil(threshold * ContainBounds(p)).toInt)))
        .otherwise(rest)
    }

  /** The same k(part) CASE as DuckDB SQL text (oracle twin). */
  private[graft] def containKSql(partExpr: String,
      threshold: Double): String =
    ContainBounds.indices.init
      .map(p => s"WHEN $partExpr = $p THEN " +
        s"${math.max(1, math.ceil(threshold * ContainBounds(p)).toInt)}")
      .mkString("CASE ", " ",
        s" ELSE ${math.max(1,
          math.ceil(threshold * ContainBounds.last).toInt)} END")

  /** e14 — size-bucketed containment dedup, the 100 TB production twin
    * of [[containment]] (e13). The partitioning idea is LSH Ensemble's
    * (Zhu et al., VLDB 2016: containment search must bucket the indexed
    * sets by SIZE, because the containment→Jaccard mapping collapses
    * under size asymmetry); the per-bucket filter here is the
    * DETERMINISTIC prefix filter rather than banded MinHash, because a
    * self-join dedup workload probes every bucket pair — the r=1 band
    * tiers the asymmetric pairs would need make near-everything collide,
    * while the prefix filter keeps exact recall with a bounded index:
    *
    *   - partition docs by distinct-shingle count into geometric buckets
    *     ([[ContainBounds]]); for a pair whose smaller side sits in
    *     bucket p, any max-direction containment >= t forces
    *     |A∩B| >= k(p) = ceil(t·lo_p);
    *   - prefix-filter lemma: two sets with |A∩B| >= k share an element
    *     in BOTH (sz−k+1)-prefixes of the global hash order (witness:
    *     the k-th largest common element). So the SMALL side (lower
    *     bucket) indexes its (sz − k(own bucket) + 1)-prefix ONCE, and
    *     the large side indexes its full sorted array ONCE with element
    *     POSITIONS — the pair's prefix bound on the large side,
    *     pos <= sz_l − k(part_s) + 1, is a residual FILTER on the
    *     hash-partitioned equi-join, not an index replication. (A
    *     per-bucket-pair index replays each doc's postings ~P times and
    *     measured 62× at the ×10 point; this form carries each posting
    *     at most twice.)
    *   - the exact directional normalizer (|A∩B| / |A|, both
    *     directions) verifies each candidate pair once via the
    *     codegen'd sorted-intersection count.
    *
    * Recall is EXACT (supseteq of e13's pairs at the same threshold by
    * construction — spec-pinned equal on the corpus), unlike a banded
    * sketch; cost is candidate-pair-bound like e8. Everything runs in
    * the 64-bit hash domain (fused ShingleHashSet, sorted arrays) — no
    * shingle strings materialize; the DuckDB oracle replays the
    * identical pipeline collision-for-collision. */
  def containmentBucketed(spark: SparkSession, sfDir: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "containment threshold must be in (0, 1]")
    val sized = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), graft.functions.SketchExpressions
        .shingle_hash_set(col("toks"), n).as("hsh"))
      .select(col("doc_id"), col("hsh"), size(col("hsh")).as("sz"))
      .withColumn("part", containPartOf(col("sz")))
      .withColumn("k", containKOf(col("part"), threshold))
      .transform(graft.CacheScope.tracked)

    // small role: own-bucket prefix, indexed once
    val smallIdx = sized.select(col("doc_id"), col("part"), col("k"),
      explode(slice(col("hsh"), lit(1), col("sz") - col("k") + 1))
        .as("hs"))
    // large role: full sorted array with positions, indexed once
    val largeIdx = sized.select(col("doc_id"), col("part"), col("sz"),
      posexplode(col("hsh")).as(Seq("pos", "hs")))

    val cand = smallIdx.as("x").join(largeIdx.as("y"),
        col("x.hs") === col("y.hs") &&
        (col("x.part") < col("y.part") ||
          (col("x.part") === col("y.part") &&
            col("x.doc_id") < col("y.doc_id"))) &&
        // the pair's k is the SMALL side's; posexplode is 0-based, so
        // prefix membership pos+1 <= sz_l − k + 1 is pos <= sz_l − k
        col("y.pos") <= col("y.sz") - col("x.k"))
      .select(col("x.doc_id").as("doc_lo"), col("y.doc_id").as("doc_hi"))
      .distinct()

    // verification: attach both docs' sorted hash arrays once per pair,
    // count the intersection with the codegen'd two-pointer walk, and
    // PROJECT THE ARRAYS AWAY before persisting — the cached frame is
    // five primitive columns per pair. (Caching the arrays alongside
    // measured GBs of block-store pressure at the ×10 point, where the
    // true pair set grows ~1000× via replica twins; a posting-list
    // count join was measured even worse — its pair×posting
    // intermediate is the candidate volume times average set size.)
    val verified = cand
      .join(sized.select(col("doc_id").as("doc_lo"), col("hsh").as("h_lo"),
        col("sz").as("n_lo")), Seq("doc_lo"))
      .join(sized.select(col("doc_id").as("doc_hi"), col("hsh").as("h_hi"),
        col("sz").as("n_hi")), Seq("doc_hi"))
      .select(col("doc_lo"), col("doc_hi"),
        graft.functions.SortedIntersectCount
          .sorted_intersect_count(col("h_lo"), col("h_hi")).as("inter"),
        col("n_lo"), col("n_hi"))
      .transform(graft.CacheScope.tracked)

    verified.select(col("doc_lo").as("doc_in"), col("doc_hi").as("doc_out"),
        (col("inter").cast("double") / col("n_lo").cast("double"))
          .as("containment"))
      .unionByName(verified.select(col("doc_hi").as("doc_in"),
        col("doc_lo").as("doc_out"),
        (col("inter").cast("double") / col("n_hi").cast("double"))
          .as("containment")))
      .filter(col("containment") >= threshold)
      .select(col("doc_in"), col("doc_out"),
        round(col("containment"), 6).as("containment"))
  }

  /** e15 — EXACT repeated-substring spans (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): the
    * document-level dedups above keep one copy of a NEAR-duplicate doc,
    * but the biggest duplication mass in web corpora is repeated
    * SUBSTRINGS — boilerplate, licenses, templated headers — inside
    * otherwise-distinct documents. The paper removes every substring of
    * >= 50 tokens that appears more than once in the corpus (via a
    * corpus-level suffix array); this operator computes the same span
    * set relationally, sized for the harness at `spanLen` tokens:
    *
    *   - every doc emits its OCCURRENCE windows of `spanLen` tokens
    *     (positions kept — unlike the shingle sets, repeats matter);
    *   - a window hash occurring in >= 2 DISTINCT docs marks a
    *     cross-doc duplicated window (the suffix array's "appears
    *     elsewhere" test, as a hash-partitioned groupBy instead of a
    *     giant sort — the standard distributed reformulation);
    *   - per doc, duplicated window positions merge into maximal
    *     contiguous covered spans (windows at distance <= spanLen
    *     chain), and the covered-token count integrates
    *     min(gap, spanLen) over consecutive positions — pure integer
    *     array arithmetic, replayed verbatim in the oracle.
    *
    * Output per affected doc: window/span counts, covered-token count
    * and fraction — the removal plan a pipeline applies with one
    * substring surgery pass. Scale shape: one narrow window-hash
    * projection (no strings shuffle — 64-bit md5 slices), one groupBy
    * on the hash, one groupBy on doc_id; cost tracks corpus size +
    * duplicated-window volume. */
  def substringSpans(spark: SparkSession, sfDir: String,
      spanLen: Int = 8): DataFrame = {
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= spanLen)
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
    // occurrence windows: position + 64-bit md5-slice hash of the
    // spanLen-token window (the engine-portable hash family of g4/e7)
    val winHashes = transform(
      sequence(lit(0), col("n_toks") - spanLen),
      i => conv(substring(md5(
        concat_ws(" ", slice(col("toks"), i + 1, lit(spanLen)))), 1, 15),
        16, 10).cast("long"))
    val wins = docs
      .select(col("doc_id"), col("n_toks"),
        posexplode(winHashes).as(Seq("pos", "h")))
      .transform(graft.CacheScope.tracked)
    val dupHashes = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val perDoc = wins.join(dupHashes, Seq("h"))
      .groupBy(col("doc_id"), col("n_toks"))
      .agg(count(lit(1)).as("n_dup_windows"),
        sort_array(collect_list(col("pos"))).as("ps"))
    // consecutive position gaps drive span merging and coverage
    val diffs = zip_with(
      slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0))),
      slice(col("ps"), lit(1), greatest(size(col("ps")) - 1, lit(0))),
      (a, b) => a - b)
    perDoc
      .withColumn("diffs", diffs)
      .select(col("doc_id"), col("n_toks"), col("n_dup_windows"),
        (size(filter(col("diffs"), d => d > spanLen)) + 1)
          .as("n_dup_spans"),
        (aggregate(col("diffs"), lit(0L),
          (acc, d) => acc + least(d, lit(spanLen.toLong))) + spanLen)
          .as("dup_tokens"))
      .withColumn("dup_fraction",
        round(col("dup_tokens").cast("double") /
          col("n_toks").cast("double"), 6))
  }

  /** e24 — EXACT-SUBSTRING CUT: e15 measures duplicated spans; this is
    * the REMOVER half of Lee et al. 2022's ExactSubstr (the paper cuts
    * every repeated substring, keeping one occurrence). Every
    * spanLen-token window occurring ≥ 2 times in the corpus (within- or
    * cross-document) keeps exactly its canonical first occurrence — the
    * lexicographic minimum (doc_id, pos), elected as one groupBy
    * struct-min on the window hash, so no document-length or doc_id
    * bound (Spark orders structs field-by-field natively) — and is cut
    * everywhere else. Per document: cut windows merge into spans by the
    * e15 gap fold, giving the exact token count the cleaned corpus
    * drops and keeps.
    *
    * Scale shape: identical to e15 — an inverted window-hash index
    * (hash-partitioned groupBy over 64-bit md5 slices, map-side
    * combined) elects keepers, one equi-join maps electors back to
    * occurrences, one per-doc fold merges spans. Never all-pairs,
    * nothing driver-side; a boilerplate hash with millions of
    * occurrences is one combiner-reduced group of longs, and the join
    * fans out only that hash's occurrence list.
    * (Ref: `scratchpads/delta_datalake.py` has no dedup at all — this
    * tier is the north-star LLM-pipeline extension.) */
  def substringCut(spark: SparkSession, sfDir: String,
      spanLen: Int = 8): DataFrame =
    substringCutDocs(Sources.testTable(spark, sfDir, "documents"),
      spanLen)

  private[graft] def substringCutDocs(docsIn: DataFrame,
      spanLen: Int): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= spanLen)
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
    val winHashes = transform(
      sequence(lit(0), col("n_toks") - spanLen),
      i => conv(substring(md5(
        concat_ws(" ", slice(col("toks"), i + 1, lit(spanLen)))), 1, 15),
        16, 10).cast("long"))
    val wins = docs
      .select(col("doc_id"), col("n_toks"),
        posexplode(winHashes).as(Seq("pos", "h")))
      .transform(graft.CacheScope.tracked)
    // keeper election: the lexicographic minimum (doc_id, pos) among
    // ≥ 2 occurrences of each window hash — a struct min, so no
    // packed-long bound on document length or doc_id range (a packed
    // doc_id·2²⁰+pos key would silently alias past 2²⁰ windows)
    val keepers = wins.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("keep"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("h"), col("keep"))
    val cut = wins.join(keepers, Seq("h"))
      .filter(col("doc_id") =!= col("keep.doc_id") ||
        col("pos") =!= col("keep.pos"))
    val perDoc = cut
      .groupBy(col("doc_id"), col("n_toks"))
      .agg(count(lit(1)).as("n_cut_windows"),
        sort_array(collect_list(col("pos"))).as("ps"))
    val diffs = zip_with(
      slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0))),
      slice(col("ps"), lit(1), greatest(size(col("ps")) - 1, lit(0))),
      (a, b) => a - b)
    perDoc
      .withColumn("diffs", diffs)
      .select(col("doc_id"), col("n_toks"), col("n_cut_windows"),
        (aggregate(col("diffs"), lit(0L),
          (acc, d) => acc + least(d, lit(spanLen.toLong))) + spanLen)
          .as("cut_tokens"))
      .withColumn("kept_tokens", col("n_toks") - col("cut_tokens"))
      .withColumn("cut_fraction",
        round(col("cut_tokens").cast("double") /
          col("n_toks").cast("double"), 6))
  }

  /** e8 — EXACT near-duplicate join with prefix + size filtering, the
    * AllPairs/PPJoin family (Bayardo/Ma/Srikant, WWW 2007; Xiao et al.,
    * WWW 2008; MapReduce formulation per Vernica/Carey/Li, SIGMOD 2010).
    * Same answer as the plain inverted index at the same threshold
    * (spec-pinned), indexing only each doc's PREFIX: a pair can be a
    * true match only if the two prefixes share a shingle, so the
    * candidate join touches 2/3 of the postings and the size filter
    * prunes cross-length pairs before verification.
    *
    * Canonical order: the filter is exact under ANY global total order
    * of shingles. The classic heuristic order is
    * document-frequency-ascending, but deriving it costs a df
    * aggregation, an equi-join, and a per-doc ranking window BEFORE any
    * filtering pays off (measured: those three shuffles cost more than
    * they saved on this corpus — 113 s vs e7's 71 s at the ×10 point).
    * Here the ENTIRE pipeline runs in the hash domain instead: each
    * doc's shingle set becomes a SORTED array of 64-bit md5 slices
    * (fused native [[graft.functions.ShingleHashSet]] — no shingle
    * strings ever materialize), so the canonical order is the hash value
    * itself, the prefix is a plain `slice` of the sorted array, the
    * candidate join keys on a LONG (cheaper to hash/shuffle/compare than
    * trigram strings), and verification intersects long arrays. Zero
    * extra shuffles for the order; every per-element comparison is
    * primitive.
    *
    * Exactness caveat of the hash domain: two distinct shingles colliding
    * in 64 bits would fuse (P < 1e-13 per doc pair at these set sizes —
    * and the spec pins equality with the string-domain inverted index on
    * the test corpus; a certainty-grade deployment uses the full 128-bit
    * digest, same plan). The DuckDB oracle replays the identical hash
    * pipeline, so the differential gate is collision-for-collision exact.
    *
    * Correctness of the filters at threshold t (here t = 1/2):
    *  - size: J ≥ t ⟹ |A∩B| ≥ t·max(na,nb) and |A∩B| ≤ min(na,nb)
    *    ⟹ min ≥ t·max, i.e. na ≤ 2nb ∧ nb ≤ 2na.
    *  - prefix: keep each doc's first p = sz − ⌈sz·t/(1+t)⌉ + 1 shingles
    *    in the canonical order (t/(1+t) = 1/3, integer-exact as
    *    ⌈sz/3⌉ = (sz+2) div 3 in BOTH engines — no float ceil drift).
    *    If a pair shares NO prefix element, every common shingle lies in
    *    one of the two suffixes, so |A∩B| ≤ (⌈na/3⌉−1)+(⌈nb/3⌉−1)
    *    < (na+nb)/3 = t/(1+t)·(na+nb) ≤ |A∩B| for J ≥ t — contradiction.
    *    Hence candidates from the prefix-index self-join are a superset
    *    of all true pairs, and the exact verification keeps the answer
    *    identical.
    *
    * Scale shape: one narrow prefix projection, one hash-partitioned
    * equi-join on the shingle, exact verification on candidate pairs
    * only. This is the exact-dedup path you CAN afford at 100 TB when
    * the near-dup threshold is high (t=0.5); e3 remains the approximate
    * path for low thresholds. */
  def ppjoin(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame = {
    // fused native front end (ShingleHashSet): tokens → sorted distinct
    // 64-bit window hashes in one pass, no shingle strings materialized —
    // the string-HOF front end alone cost more than every join in this
    // query combined (measured 7 s of a 12 s sf0.1 run)
    val sized = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), graft.functions.SketchExpressions
        .shingle_hash_set(col("toks"), n).as("hsh"))
      .select(col("doc_id"), col("hsh"), size(col("hsh")).as("sz"))
      .transform(graft.CacheScope.tracked)
    val prefix = sized.select(col("doc_id"), col("sz"),
      explode(slice(col("hsh"), lit(1), expr("sz - (sz + 2) DIV 3 + 1")))
        .as("hs"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.hs") === col("y.hs") &&
        col("x.doc_id") < col("y.doc_id") &&
        col("x.sz") <= col("y.sz") * 2 &&
        col("y.sz") <= col("x.sz") * 2)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sized.select(col("doc_id").as("doc_a"), col("hsh").as("ha"),
        col("sz").as("na")), Seq("doc_a"))
      .join(sized.select(col("doc_id").as("doc_b"), col("hsh").as("hb"),
        col("sz").as("nb")), Seq("doc_b"))
      // ShingleHashSet arrays are sorted+distinct, so the intersection
      // COUNT is a codegen'd two-pointer walk (no intersection array
      // allocated per pair, unlike size(array_intersect))
      .withColumn("inter", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("ha"), col("hb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** e9 — near-duplicate CLUSTERS from pair evidence: connected
    * components of the e3 pair graph, labeled by each component's minimum
    * doc_id (the canonical "keep this one, drop the rest" assignment —
    * the step that turns pairwise dedup output into an actionable
    * keep-set; cf. the cluster stage of C4/RefinedWeb-style pipelines).
    *
    * Algorithm: min-label propagation to a fixpoint — labels start as
    * each node's own id; every round each node takes the min of its own
    * and its neighbors' labels; converged when a round changes nothing.
    * Each round is ONE hash-partitioned equi-join + one groupBy over the
    * EDGE list (own and neighbor labels meet in the same aggregation,
    * which yields both the update and the previous label for the
    * convergence check); the driver sees one scalar count per round (the
    * convergence check — justified driver-side control for an iterative
    * fixpoint, same pattern as f4's Lloyd loop). Near-dup components are
    * cliques and short chains, so rounds ≈ 2-3; a graph with
    * pathological diameter would want the large-star/small-star
    * variant (Kiveris et al. 2014) — same relational kernel, fewer
    * rounds. Throws rather than returning a partial labeling if maxIter
    * is hit (determinism over silent approximation).
    *
    * Round-9 fix of the round-8 `weak` flag (warm 8-13 s vs the r07
    * record's 4.7 s): the cost over e3 was not executors but the
    * DRIVER — every loop action re-analyzed and re-optimized the full
    * e3 lineage (explode, candidate join, verification join) because
    * caching a Dataset shortcuts execution, not planning: the logical
    * plan under each round still carried the whole upstream tree, and
    * grew by one join+agg per round on top of it. Profiled per stage
    * (sf0.1, local[32], warm): the round-2 convergence count took
    * 2.36 s and a count() of the already-cached 233-row result 2.14 s
    * — pure Catalyst re-planning of a ~1000-node tree. The fix is
    * LINEAGE TRUNCATION: `localCheckpoint()` on the pair list and on
    * each round's label frame, the standard treatment for iterative
    * fixpoints (GraphX's Pregel does the same) — each round then plans
    * a 3-node tree over materialized blocks, and the e3 stage runs and
    * plans exactly once. Measured after (BenchOne 3-rep): warm
    * 2.6-2.9 s, vs e3 alone 1.9-2.4 s — the loop's true cost is the
    * ~0.5 s its two small joins deserve. The executor-loss-recompute
    * caveat of localCheckpoint is acceptable here: the frames are
    * bounded (edge list + one row per doc), and a lost block fails the
    * query loudly rather than silently corrupting the fixpoint.
    *
    * The measured pair graph at sf0.1 is 256 edges / 233 components /
    * largest component 4 / fixpoint after ONE round, so the iterative
    * part contributes two small joins regardless of corpus. */
  def dedupClusters(spark: SparkSession, sfDir: String,
      maxIter: Int = 50): DataFrame = {
    // e3 runs (and is PLANNED) exactly once: localCheckpoint eagerly
    // materializes the pair list and replaces its logical plan with a
    // leaf over the stored blocks — downstream rounds never re-plan it
    val pairs = minhashLsh(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .transform(graft.CacheScope.tracked)
    // Initial labels fold propagation round 1 into the same aggregation
    // that deduplicates the node set: label₀ = min(own id, neighbor ids).
    // Identical-doc components are CLIQUES, whose members all touch the
    // component minimum — they converge here, and the loop's first pass
    // is already the confirming round.
    var labels = edges
      .select(col("src").as("doc"), col("dst").as("label"))
      .unionByName(edges.select(col("src").as("doc"),
        col("src").as("label")))
      .groupBy(col("doc")).agg(min(col("label")).as("label"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // ONE shuffle join + ONE aggregation per round (r4 ran three joins):
      // neighbor labels and each node's own label flow into the same
      // groupBy, where min over everything is the update and min over the
      // self row recovers the previous label. localCheckpoint both
      // materializes the round (the convergence count below reads
      // blocks, not lineage) and keeps every round's plan CONSTANT
      // size — without it the tree grows by one join+agg per round and
      // driver planning time compounds.
      val contributions = edges
        .join(labels, edges("dst") === labels("doc"))
        .select(col("src").as("doc"), col("label"),
          lit(false).as("self"))
        .unionByName(labels.select(col("doc"), col("label"),
          lit(true).as("self")))
      val stepped = contributions.groupBy(col("doc"))
        .agg(min(col("label")).as("label"),
          min(when(col("self"), col("label"))).as("prev"))
        .localCheckpoint()
      val changed = stepped.filter(col("label") =!= col("prev")).count()
      labels = stepped.select(col("doc"), col("label"))
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"label propagation did not converge within $maxIter rounds")
    labels.select(col("doc").as("doc_id"), col("label").as("cluster_id"))
  }

  // ------------------------------------------------------------- minhash

  /** MinHash + banded LSH near-dup detection, verified with exact Jaccard.
    *
    * Pipeline: shingle → 64-long signature → `bands` band keys per doc →
    * self-equi-join on (band, hash(band slice)) → distinct candidate pairs →
    * exact-Jaccard verification join → pairs with j >= threshold.
    *
    * Scale shape: the only joins are hash-partitioned equi-joins; signature
    * computation is a narrow codegen'd projection. With b bands of r rows,
    * P(candidate) = 1-(1-j^r)^b — at r=4, b=16 the curve crosses 50% near
    * j≈0.3, so j>=0.35 pairs are found w.h.p. while the ~0.001-avg-Jaccard
    * bulk (measured on this corpus) almost never collides. */
  def minhashLsh(spark: SparkSession, sfDir: String, n: Int = 3,
      threshold: Double = 0.2, numPerm: Int = 64, bands: Int = 16): DataFrame =
    minhashLshDocs(Sources.testTable(spark, sfDir, "documents"), n,
      threshold, numPerm, bands)

  /** [[minhashLsh]] over an arbitrary (doc_id, text) frame — the seam
    * the adversarial-skew spec drives with a viral-boilerplate corpus
    * (one text duplicated across many doc_ids → one giant band group;
    * AQE's skew-join split keeps the candidate join's task sizes
    * bounded with the identical pair set). */
  private[graft] def minhashLshDocs(docsIn: DataFrame, n: Int = 3,
      threshold: Double = 0.2, numPerm: Int = 64, bands: Int = 16): DataFrame = {
    // bands must tile the signature exactly: rows=0 would hash an empty
    // slice (every doc collides in every band → O(n²)), and a non-dividing
    // bands count silently ignores trailing permutations
    require(bands >= 1 && bands <= numPerm && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val rows = numPerm / bands
    val base = docsIn
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    // fused token->shingle-hash->minhash (no shingle strings materialized);
    // persisted because the band explode reuses it
    val sigs = base
      .select(col("doc_id"), graft.functions.SketchExpressions
        .shingle_minhash(col("toks"), n, numPerm).as("sig"))
      .transform(graft.CacheScope.tracked)

    // band key = the raw signature slice itself (band index + its `rows`
    // sig values), not a hash of it: candidate generation stays an
    // equi-join with the same shuffle shape, and the key is reproducible
    // verbatim in the DuckDB oracle (Spark's murmur3 `hash()` is not)
    val keyCols = "band" +: (0 until rows).map(r => s"s$r")
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until bands).map { bIdx =>
        struct((lit(bIdx).as("band") +: (0 until rows).map(r =>
          col("sig").getItem(bIdx * rows + r).as(s"s$r"))): _*)
      }: _*)).as("bk"))
      .select(col("doc_id") +: keyCols.map(c => col(s"bk.$c")): _*)

    val bandKeyEq = keyCols
      .map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _)
    val cand = banded.as("x").join(banded.as("y"),
        bandKeyEq && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact-Jaccard verification: true distinct shingle sets, but computed
    // ONLY for docs that appear in a candidate pair — the candidate set is
    // orders of magnitude smaller than the corpus at scale
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shFrame = base.join(broadcast(candIds), Seq("doc_id"))
      .select(col("doc_id"), shinglesOf(col("toks"), n).as("sh"))
    cand
      .join(shFrame.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(shFrame.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over shingle hashes: per bit, sum +1/-1 votes across
    * shingles, bit set iff the vote is positive. Native codegen'd
    * [[graft.functions.SimHash64]] — no explode, no shuffle. */
  def simhashCol(sh: Column): Column =
    graft.functions.SketchExpressions.simhash64(
      transform(sh, s => xxhash64(s)))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, candidates
    * from a pigeonhole chunk join: 8 chunks of 8 bits — any pair within
    * distance 7 shares at least one exact chunk, so recall is guaranteed
    * for maxDist <= 7 and the join stays an equi-join at scale. */
  def simhash(spark: SparkSession, sfDir: String, n: Int = 3,
      maxDist: Int = 7): DataFrame = {
    // fused token->shingle-hash->simhash; persisted because the 8-chunk
    // explode and the self-join would otherwise recompute it up to 16x
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), graft.functions.SketchExpressions
        .shingle_simhash(col("toks"), n).as("simhash"))
      .transform(graft.CacheScope.tracked)

    val chunked = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 8).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 8).bitwiseAND(0xFFL).as("ck"))
      }: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.chunk"), col("ch.ck"))

    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Thresholded (banded) Levenshtein: Spark 4's 3-child Catalyst
    * `Levenshtein` computes the O(len·k) diagonal band and early-exits
    * with -1 once the distance provably exceeds `k` — the functions API
    * only exposes a constant-Int threshold, so the per-row (length-
    * relative) bound is built on the expression directly. */
  private def levenshteinWithin(l: Column, r: Column, k: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Levenshtein(
        ColumnBridge.expression(l), ColumnBridge.expression(r),
        Some(ColumnBridge.expression(k.cast("int")))))
  }

  /** e12 — SimHash candidates verified by EDIT DISTANCE (the Manku/
    * Jain/Sarma 2007 web-crawl near-dup pattern: sketch-bucket candidate
    * generation, then an exact, expensive verifier on candidates only).
    * Pairs within Hamming ≤ `maxDist` of each other's 64-bit SimHash are
    * re-checked with Levenshtein distance; a pair survives iff
    * dist ≤ `maxRatio` × max(len) — a LENGTH-RELATIVE bound, so short
    * docs aren't over-matched and long docs aren't under-matched.
    *
    * Scale shape: candidate volume is e4's (pigeonhole chunk equi-join,
    * recall guaranteed for d ≤ 7), and the verifier never pays full
    * O(len²) DP per candidate:
    *   1. a 32-byte sha256 digest joins onto the candidate frame first —
    *      byte-identical pairs (the dominant mass in any crawl corpus)
    *      emit `edit_dist = 0` with no text shuffle and no DP at all;
    *   2. remaining pairs whose LENGTHS already differ by more than the
    *      bound are rejected before the text join (|len_a − len_b| is a
    *      Levenshtein lower bound);
    *   3. only genuinely-near-miss pairs reach [[levenshteinWithin]] —
    *      the banded O(len·k) form with early exit, k = ⌊maxRatio·maxlen⌋.
    * Semantics are unchanged from the full-DP form (0 for identical
    * texts; banded result is exact whenever dist ≤ k, and dist > k rows
    * are filtered either way), so the verifier stays oracle-exact. */
  def editDistanceDedup(spark: SparkSession, sfDir: String,
      maxDist: Int = 7, maxRatio: Double = 0.25): DataFrame = {
    val pairs = simhash(spark, sfDir, maxDist = maxDist)
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // skinny per-doc frame: digest + length, never the body
    val dig = docs.select(col("doc_id"),
      sha2(col("text"), 256).as("dg"), length(col("text")).as("len"))
    val withDig = pairs
      .join(dig.select(col("doc_id").as("doc_a"), col("dg").as("dga"),
        col("len").as("la")), Seq("doc_a"))
      .join(dig.select(col("doc_id").as("doc_b"), col("dg").as("dgb"),
        col("len").as("lb")), Seq("doc_b"))
      .withColumn("maxlen", greatest(col("la"), col("lb")))
      .withColumn("k", floor(lit(maxRatio) * col("maxlen")))
    val identical = withDig.filter(col("dga") === col("dgb"))
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        lit(0L).as("edit_dist"),
        round(lit(0.0) / col("maxlen"), 6).as("edit_ratio"))
    val nearMiss = withDig
      .filter(col("dga") =!= col("dgb") &&
        abs(col("la") - col("lb")) <= col("k"))
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        Seq("doc_b"))
      .withColumn("edit_dist",
        levenshteinWithin(col("ta"), col("tb"), col("k")).cast("long"))
      .filter(col("edit_dist") >= 0L &&
        col("edit_dist") <= lit(maxRatio) * col("maxlen"))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("edit_dist"),
        round(col("edit_dist").cast("double") / col("maxlen"), 6)
          .as("edit_ratio"))
    identical.unionByName(nearMiss)
  }

  // ----------------------------------------------------------- embeddings

  /** Exact cosine near-dup pairs (cos >= threshold) over the embeddings
    * table — float vectors promoted to double, dot products computed as a
    * strict left fold so the value is engine-independent (matches DuckDB's
    * list_dot_product bit-for-bit). Brute-force O(n²) self-join: correct
    * baseline and oracle; [[embeddingCosineLsh]] is the production path.
    *
    * The theta join (`vec_a < vec_b`) plans as a nested-loop over the
    * FULL corpus — deliberate for a verification baseline, a scale-killer
    * as a default. The registered query therefore BOUNDS the id range
    * (`maxVecId`, surfaced in the `max_vec_id` column): the oracle role
    * is intact on the bounded slice, and the blast radius of running it
    * against a 100 TB corpus is capped at the bound, not the corpus. */
  def embeddingCosine(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4, maxVecId: Long = 4096): DataFrame = {
    // single theta join carrying the vectors: candidates + verification
    // fused — the right shape for the exact baseline, where every pair is
    // scored anyway
    val e = Similarity.normed(spark, sfDir).filter(col("vec_id") < maxVecId)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"),
        lit(maxVecId).as("max_vec_id"))
  }

  /** Exact-cosine verification of candidate (vec_a, vec_b) pairs: attach
    * vectors/norms from the shared normalized frame, keep pairs scoring
    * >= threshold. */
  private def verifyCosine(cand: DataFrame, normed: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(normed.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("norm").as("na")), Seq("vec_a"))
      .join(normed.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("norm").as("nb")), Seq("vec_b"))
      .withColumn("cosine",
        dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))

  /** Scale path for embedding near-dup detection — the e3 pattern applied
    * to vectors: hyperplane-LSH signature bucketing (candidates = pairs
    * sharing a (table, signature) cell) + exact-cosine verification of
    * candidates only. [[embeddingCosine]] stays the exact all-pairs
    * baseline/oracle; this is the operator a 100 TB corpus runs, where
    * the only joins are hash-partitioned equi-joins on the signature and
    * the verification cost tracks colliding pairs, not n².
    *
    * Defaults (8 tables × 12 bits): unrelated pairs (cos ≈ 0) collide in
    * a table w.p. ≈ 2^-12, so candidate volume ≈ n²·8/4096 — a ~500×
    * reduction — while cos ≥ 0.9 near-dups are caught w.p. ≈ 0.74 per the
    * (1−(1−p_bit^bits)^tables) curve; recall rises with `tables` at
    * linear cost. Planes are data-derived ([[Similarity.dataPlanes]]), so
    * the whole operator — candidates included — is reproducible
    * relationally in the DuckDB oracle. */
  def embeddingCosineLsh(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4, tables: Int = 8, bits: Int = 12): DataFrame = {
    val ps = Similarity.dataPlanes(spark, sfDir, tables, bits)
    val e = Similarity.normed(spark, sfDir)
    // id-only signature table: the self-join shuffles (t, sig, vec_id)
    // triples, never the vectors; persisted so both join sides read one
    // signature pass instead of recomputing scan+norm+sigs
    val sig = e.select(col("vec_id"),
      posexplode(graft.functions.SketchExpressions
        .hyperplane_sigs(col("v"), ps)).as(Seq("t", "sig")))
      .transform(graft.CacheScope.tracked)
    val cand = sig.as("x").join(sig.as("y"),
        col("x.t") === col("y.t") && col("x.sig") === col("y.sig") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    // vectors re-attached for candidates only
    verifyCosine(cand, e, threshold)
  }

  /** e11 — SemDeDup-style SEMANTIC dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, then search
    * for near-duplicate pairs only WITHIN each cluster — the observation
    * being that semantic duplicates land in the same cell of any
    * reasonable coarse quantization, so the all-pairs O(n²) cosine scan
    * shrinks to Σ|cluster|², tunable via the cluster count. Keeps, per
    * duplicate group, the smallest vec_id; emits one row per DROPPED
    * vector with its keeper and the cosine to that keeper.
    *
    * Shares the IVF plumbing with [[Similarity.ivfTopK]]: deterministic
    * data-derived centroids (first `nCent` corpus vectors), assignment =
    * broadcast of centroids over one corpus scan — which also makes the
    * whole operator, candidates included, relationally reproducible in
    * the DuckDB oracle (the paper's k-means would only move the
    * centroids, not the dataflow).
    *
    * Scale shape: assignment never shuffles the corpus (centroid
    * broadcast); the within-cluster self-join is a hash-partitioned
    * equi-join on cent_id. At 100 TB, `nCent` grows with the corpus
    * (n/⟨cluster size⟩ — SemDeDup used 50k clusters for LAION-440M) so
    * per-cluster pair volume stays bounded; a skewed giant cluster is the
    * known failure mode, handled the same way as any skewed join:
    * AQE's skew-join split (demonstrated on the banded LSH join against
    * a viral-boilerplate corpus — identical pair set, `skew=true`
    * markers — in DedupSpec's adversarial spec), or the salted
    * (key, salt) join the rolling form uses
    * ([[NearDupState.prunedBandJoin]]). */
  def semanticDedup(spark: SparkSession, sfDir: String,
      nCent: Int = 16, tau: Double = 0.4): DataFrame = {
    val corpus = Similarity.normed(spark, sfDir)
    val cents  = Similarity.seedCentroids(corpus, nCent)
    val assigned = Similarity.nearestCents(corpus, cents, "vec_id", 1)
      .select(col("vec_id"), col("cent_id"), col("v"), col("norm"))
    val a = assigned.select(col("cent_id"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("norm").as("na"))
    val b = assigned.select(col("cent_id"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("cent_id"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= tau)
      .groupBy(col("cent_id"), col("vec_b").as("vec_id"))
      .agg(
        min(col("vec_a")).as("keeper_id"),
        round(min_by(col("cosine"), col("vec_a")), 6).as("keeper_cosine"))
      .select(col("cent_id"), col("vec_id"), col("keeper_id"),
        col("keeper_cosine"))
  }

  /** Strict sequential double fold dot product: sum_i a[i]*b[i], left to
    * right — deterministic and engine-portable (unlike a parallel sum).
    * Backed by the native codegen'd [[graft.functions.DotProduct]]
    * expression; semantically identical to the HOF fold
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` but ~10× faster. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  // ------------------------------------------------- segment-level exact

  /** e10 — SEGMENT-level exact dedup (the CCNet/FineWeb "line dedup"
    * stage: drop every line whose exact content already appeared anywhere
    * in the corpus, keeping the first occurrence). This corpus's documents
    * are single-line, so the segmenter cuts fixed `chunkTokens`-token
    * windows instead of newlines — the dataflow is identical, only the
    * splitter differs. Output is one row per document: chunk counts and
    * the surviving text with duplicated segments removed, in original
    * order.
    *
    * Scale shape (the reason this isn't a corpus-wide window):
    *   - segmentation is a narrow per-row HOF (`transform` over a
    *     `sequence`), no shuffle;
    *   - the first-occurrence winner per distinct segment is a groupBy on
    *     the segment's md5 — the shuffle carries 16-byte digests plus a
    *     (doc_id, chunk_idx) struct, never segment text, and the `min`
    *     partial-combines map-side (a `row_number` over a corpus-wide
    *     hash partition would sort; `min` doesn't);
    *   - survivors re-aggregate to documents on the doc_id key, and the
    *     in-order reassembly sorts WITHIN each document's collected
    *     chunks (array_sort over ≤ chunks-per-doc elements), never
    *     globally.
    * At 100 TB both shuffles are key-hashed equi-shuffles; the segment
    * digest domain is uniform (no skew), and memory per group is one
    * struct. */
  def segmentDedup(docs: DataFrame, chunkTokens: Int): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(toks) - 1) div $chunkTokens),
           |  i -> concat_ws(' ',
           |    slice(toks, i * $chunkTokens + 1, $chunkTokens)))"""
          .stripMargin)).as(Seq("chunk_idx", "chunk")))
    // one winner per distinct segment content: the lexicographically
    // smallest (doc_id, chunk_idx) — min over a struct, partial-combined
    val winners = chunks
      .groupBy(md5(col("chunk")).as("h"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("w"))
    chunks.withColumn("h", md5(col("chunk")))
      .join(winners, "h")
      .withColumn("keep",
        col("w.doc_id") === col("doc_id") &&
          col("w.chunk_idx") === col("chunk_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // in-order reassembly: collect (idx, chunk) structs for kept
        // chunks only (collect_list drops the nulls the `when` emits),
        // sort within the doc, strip the index
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("chunk_idx"), col("chunk"))))),
          x => x("chunk"))).as("kept_text"))
  }

  /** [[segmentDedup]] over the documents table (driver query e10). */
  def segmentDedup(spark: SparkSession, sfDir: String): DataFrame =
    segmentDedup(Sources.testTable(spark, sfDir, "documents"),
      chunkTokens = 20)

  // --------------------------------------------- incremental (vs corpus)

  /** e16 — INCREMENTAL exact dedup: classify a NEW batch against an
    * EXISTING corpus (the production shape — dedup today's crawl
    * against the accumulated corpus, not the corpus against itself)
    * without ever joining batch×corpus at corpus scale. Three stages:
    *
    *   1. one corpus pass folds its content digests into a BLOOM
    *      FILTER (`DataFrameStatFunctions.bloomFilter` — a
    *      treeAggregate of fixed-size bitmaps, broadcast-sized at any
    *      corpus cardinality: ~1.2 GB at 1e9 docs / 1% fpp);
    *   2. the broadcast Bloom prefilters the batch map-side: a MISS is
    *      definitively novel (no false negatives) and never joins —
    *      at a typical few-percent dup rate, ~99% of the batch is
    *      settled with zero shuffle;
    *   3. only Bloom-POSITIVE digests (true dups + the fpp) probe the
    *      corpus, as a broadcast semi-join AGAINST the corpus scan —
    *      the corpus itself never shuffles — and the confirmed set
    *      (broadcast again) stamps the verdict.
    *
    * The Bloom is a prefilter, not the answer: stage 3 makes the
    * result EXACT, so the fpp trades join size against nothing but
    * candidate count. The probe UDF is the one seam where no built-in
    * exists (Spark's own runtime bloom joins do the same probe
    * internally); it evaluates against a broadcast bitmap, no state.
    * The batch here is the high-id documents plus a re-keyed slice of
    * corpus docs — deterministic injected duplicates, since this
    * corpus is exact-dup-free. */
  /** e17 — INCREMENTAL near-dup detection: classify a new batch
    * against the corpus with MinHash-LSH, asymmetrically — the
    * fuzzy-dedup production shape (FineWeb/CCNet dedup each crawl
    * snapshot against the accumulated index, not all-pairs over
    * everything). Same deterministic sketch as e3 ([[minhashLsh]]:
    * fused shingle→minhash, band keys = raw signature slices), but
    * candidates come from `bandedBatch ⋈ bandedCorpus` — batch×batch
    * and corpus×corpus collisions never materialize, and at scale the
    * corpus side of the join is the PERSISTED index built once per
    * corpus generation, re-probed by every batch. Exact-Jaccard
    * verification runs only on candidate docs; output is one verdict
    * row per batch doc (n matches, best score), so the downstream
    * filter is a plain column predicate. LSH recall is the designed
    * trade (band parameters bound the miss probability), and the
    * DuckDB oracle replicates the same sketch, so the gate pins the
    * full pipeline bit-exactly. */
  def incrementalNearDup(spark: SparkSession, sfDir: String,
      split: Long = 350, n: Int = 3, threshold: Double = 0.2,
      numPerm: Int = 64, bands: Int = 16): DataFrame = {
    require(bands >= 1 && bands <= numPerm && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val rows = numPerm / bands
    val docs = Sources.testTable(spark, sfDir, "documents")
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    val sigs = base
      .select(col("doc_id"), graft.functions.SketchExpressions
        .shingle_minhash(col("toks"), n, numPerm).as("sig"))
      .transform(graft.CacheScope.tracked)
    val keyCols = "band" +: (0 until rows).map(r => s"s$r")
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until bands).map { bIdx =>
        struct((lit(bIdx).as("band") +: (0 until rows).map(r =>
          col("sig").getItem(bIdx * rows + r).as(s"s$r"))): _*)
      }: _*)).as("bk"))
      .select(col("doc_id") +: keyCols.map(c => col(s"bk.$c")): _*)
    val bandKeyEq = keyCols
      .map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _)
    val cand = banded.filter(col("doc_id") >= split).as("x")
      .join(banded.filter(col("doc_id") < split).as("y"), bandKeyEq)
      .select(col("x.doc_id").as("doc_b"), col("y.doc_id").as("doc_c"))
      .distinct()
    val candIds = cand.select(col("doc_b").as("doc_id"))
      .union(cand.select(col("doc_c").as("doc_id"))).distinct()
    val shFrame = base.join(broadcast(candIds), Seq("doc_id"))
      .select(col("doc_id"), shinglesOf(col("toks"), n).as("sh"))
    val verified = cand
      .join(shFrame.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .join(shFrame.select(col("doc_id").as("doc_c"), col("sh").as("sh_c")),
        Seq("doc_c"))
      .withColumn("jaccard", jaccard(col("sh_b"), col("sh_c")))
      .filter(col("jaccard") >= threshold)
    val perDoc = verified.groupBy(col("doc_b").as("doc_id"))
      .agg(count(lit(1)).as("n_near_dups"),
        round(max(col("jaccard")), 6).as("best_jaccard"))
    docs.filter(col("doc_id") >= split).select(col("doc_id"))
      .join(perDoc.withColumn("__hit", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("best_jaccard"),
        coalesce(col("__hit"), lit(false)).as("is_near_dup"))
  }

  /** e18 — PERSISTED dedup state, the rolling-ingest form of e16 (the
    * same rung f10/f11 added for ANN): the corpus's content digests
    * live as a transactional graft TABLE, each arriving batch dedupes
    * against it and appends its novel digests in one idempotent
    * ledger-stamped commit — so dedup state survives restarts, is
    * time-travelable, and query cost decouples from corpus history.
    *
    * Scale shape: the per-batch gate is a Bloom built from a
    * DIGEST-ONLY scan of the state table (64 bytes/doc — at 100 TB of
    * corpus the state table is ~0.1% of it), positives exact-verify by
    * broadcast semi-join against the same digest scan, the corpus
    * BODIES are never re-read, and the state append is O(novel). Two
    * batches run through ONE state table here: batch 2 carries
    * injected duplicates of batch 1's NOVEL documents, so its verdicts
    * prove the state actually advanced between batches (the rolling
    * property e16's per-run Bloom cannot express). Within-batch
    * duplicate pairs are intentionally out of scope (state-level
    * dedup; e1 is the in-batch form) — the oracle mirrors that. */
  def dedupStatePersisted(spark: SparkSession, sfDir: String,
      split: Long = 300, split2: Long = 450): DataFrame = {
    import graft.sources.GraftLog
    val docs = Sources.testTable(spark, sfDir, "documents")
    val state = graft.sources.Staging.scratchDir("graft_dstate_") +
      "/digests"
    GraftLog.overwrite(docs.filter(col("doc_id") < split)
      .select(sha2(col("text"), 256).as("content_hash")).distinct(),
      state)
    def runBatch(batch: DataFrame, batchId: Long): DataFrame = {
      // snapshot pinned at call time: the verdict plan stays bound to
      // the pre-append state even though it executes later
      val stateDf = GraftLog.read(spark, state)
      val n = math.max(stateDf.count(), 1L)
      val bloom = stateDf.stat.bloomFilter("content_hash", n, 0.01)
      val bBloom = spark.sparkContext.broadcast(bloom)
      val mightContain =
        udf((h: String) => bBloom.value.mightContainString(h))
      val batchH = batch.withColumn("content_hash",
        sha2(col("text"), 256))
      val candDigests = batchH.filter(mightContain(col("content_hash")))
        .select("content_hash").distinct()
      val present = stateDf
        .join(broadcast(candDigests), Seq("content_hash"), "left_semi")
        .distinct()
        .withColumn("__dup", lit(true))
      val verdicts = batchH
        .join(broadcast(present), Seq("content_hash"), "left")
        .select(lit(batchId).as("batch_id"), col("doc_id"),
          coalesce(col("__dup"), lit(false)).as("is_duplicate"))
      // advance the state: novel digests land as one idempotent commit
      // (re-delivery of the same batch id is a ledger-rejected no-op)
      GraftLog.txnAppend(
        batchH.join(broadcast(present), Seq("content_hash"), "left_anti")
          .select("content_hash").distinct(),
        state, "e18-dedup-state", batchId)
      verdicts
    }
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
    val v1 = runBatch(b1, 0L)
    val v2 = runBatch(b2, 1L)
    v1.unionByName(v2)
  }

  def incrementalDedup(spark: SparkSession, sfDir: String,
      split: Long = 350): DataFrame = {
    val docs = Sources.testTable(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < split)
    val batch = docs.filter(col("doc_id") >= split)
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") < split && col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val corpusHashes =
      corpus.select(sha2(col("text"), 256).as("content_hash"))
    val nCorpus = math.max(corpusHashes.count(), 1L)
    val bloom = corpusHashes.stat
      .bloomFilter("content_hash", nCorpus, 0.01)
    val bBloom = spark.sparkContext.broadcast(bloom)
    val mightContain =
      udf((h: String) => bBloom.value.mightContainString(h))
    val batchH =
      batch.withColumn("content_hash", sha2(col("text"), 256))
    val candDigests = batchH
      .filter(mightContain(col("content_hash")))
      .select("content_hash").distinct()
    val present = corpusHashes
      .join(broadcast(candDigests), Seq("content_hash"), "left_semi")
      .distinct()
      .withColumn("__dup", lit(true))
    batchH
      .join(broadcast(present), Seq("content_hash"), "left")
      .select(col("doc_id"),
        coalesce(col("__dup"), lit(false)).as("is_duplicate"))
  }

  // ---- e21: corpus-vs-corpus contamination, zero exchanges ----

  private val stagedContam =
    new scala.collection.concurrent.TrieMap[String, (String, String)]

  /** Stage train/eval digest tables hidden-bucketed by their digest
    * into the SAME bucket count — the layout a lake maintains for a
    * RECURRING cross-corpus audit. Memoized per corpus. */
  private def contamTables(spark: SparkSession,
      sfDir: String): (String, String) =
    stagedContam.getOrElseUpdate(sfDir, {
      import graft.sources.GraftLog
      val docs = Sources.testTable(spark, sfDir, "documents")
      val base = graft.sources.Staging.tempDir("graft_contam_")
      val trainDir = base + "/train"
      val evalDir = base + "/eval"
      // corpus-relative split: train = first 70%, eval = last 40% — the
      // 60-70% band overlaps by construction (same integer floor-div
      // bounds in the oracle SQL)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      GraftLog.overwriteBucketTransform(
        docs.filter(col("doc_id") < maxId * 7 / 10)
          .select(sha2(col("text"), 256).as("content_hash")),
        trainDir, "content_hash", 8)
      GraftLog.overwriteBucketTransform(
        docs.filter(col("doc_id") >= maxId * 6 / 10)
          .select(sha2(col("text"), 256).as("eval_hash")),
        evalDir, "eval_hash", 8)
      (trainDir, evalDir)
    })

  /** e21 — train-vs-eval CONTAMINATION audit as a fully exchange-free
    * plan: both digest corpora live hidden-bucketed by their digest
    * (`bucket(8, hash)`), read through the DSv2 SPJ catalog (see
    * [[graft.sources.GraftCatalog]]), so the equi-join on the digest is
    * storage-partitioned (zero shuffles) AND the per-digest pair count
    * groups on the same bucket column (ClusteredDistribution satisfied
    * by the key-grouped scan) — the WHOLE audit moves no rows between
    * executors beyond the partition-local sorts. Contrast e16/g-series
    * contamination, which broadcast one side: that shape dies when both
    * corpora are 100 TB-class; this one's cost is two pruned columnar
    * scans, at any pair of sizes, forever. The 60-70% doc_id band
    * overlaps by construction — the oracle is the plain digest join. */
  def contaminationSpj(spark: SparkSession, sfDir: String): DataFrame = {
    Joins.enableSpj(spark)
    val (trainDir, evalDir) = contamTables(spark, sfDir)
    val t = spark.table(s"graft_spj.`$trainDir`")
    val e = spark.table(s"graft_spj.`$evalDir`")
    t.hint("merge")
      .join(e.hint("merge"), col("content_hash") === col("eval_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
