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
  * Everything is built-in `functions._` (codegen'd higher-order functions) —
  * no UDFs, no collect. See SURVEY.md §7.6.
  */
object Dedup {

  // ---------------------------------------------------------------- shared

  /** Lower-cased whitespace tokens. */
  def tokens(c: Column): Column = split(lower(c), " ")

  /** Distinct word n-gram shingles; empty array when the doc is shorter
    * than n tokens (sequence() would otherwise run descending). */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
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

  /** Exact n-gram Jaccard pairs (j >= threshold) over a bounded id range.
    * All-pairs exact Jaccard is O(n²) — this operator is the *oracle*
    * (bounded to `maxDocId` docs); [[minhashLsh]] is the scale path. */
  def ngramJaccard(spark: SparkSession, sfDir: String, n: Int = 3,
      threshold: Double = 0.1, maxDocId: Long = 200): DataFrame = {
    val docs = Sources.testTable(spark, sfDir, "documents")
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------- minhash

  /** Deterministic 64-permutation MinHash signature of a shingle array:
    * sig[i] = min over shingle hashes h of (a_i * h + b_i), with odd
    * multipliers derived from the golden-ratio constant (public
    * splitmix64 mixing constant, 0x9E3779B97F4A7C15). */
  private def minhashSig(sh: Column, numPerm: Int): Column = {
    val hashes = transform(sh, s => xxhash64(s))
    val perms = (0 until numPerm).map { i =>
      val a = 2L * i + 1
      val b = i * 0x9E3779B97F4A7C15L
      array_min(transform(hashes, h => h * a + b))
    }
    array(perms: _*)
  }

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
      threshold: Double = 0.2, numPerm: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numPerm / bands
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSig(col("sh"), numPerm))

    val banded = docs.select(col("doc_id"),
      explode(array((0 until bands).map { bIdx =>
        struct(lit(bIdx).as("band"),
          hash(slice(col("sig"), bIdx * rows + 1, rows)).as("bh"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))

    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val withSh = docs.select(col("doc_id"), col("sh"))
    cand
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over shingle hashes: per bit, sum +1/-1 votes across
    * shingles, bit set iff the vote is positive. Pure codegen'd
    * fold (aggregate/zip_with) — no explode, no shuffle. */
  def simhashCol(sh: Column): Column = {
    val hashes = transform(sh, s => xxhash64(s))
    def bitsOf(h: Column): Column = array((0 until 64).map { i =>
      when(shiftright(h, i).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L))
    }: _*)
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitsOf(h), (a, v) => a + v))
    // sum of disjoint per-bit masks == bitwise OR
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, m) => acc + m)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, candidates
    * from a pigeonhole chunk join: 8 chunks of 8 bits — any pair within
    * distance 7 shares at least one exact chunk, so recall is guaranteed
    * for maxDist <= 7 and the join stays an equi-join at scale. */
  def simhash(spark: SparkSession, sfDir: String, n: Int = 3,
      maxDist: Int = 7): DataFrame = {
    val docs = Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("simhash", simhashCol(col("sh")))
      .select(col("doc_id"), col("simhash"))

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

  // ----------------------------------------------------------- embeddings

  /** Exact cosine near-dup pairs (cos >= threshold) over the embeddings
    * table — float vectors promoted to double, dot products computed as a
    * strict left fold so the value is engine-independent (matches DuckDB's
    * list_dot_product bit-for-bit). Brute-force O(n²) self-join: correct
    * baseline and oracle; [[Similarity.lshTopK]] is the sublinear path. */
  def embeddingCosine(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val e = Sources.testTable(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Strict sequential double fold dot product: sum_i a[i]*b[i], left to
    * right — deterministic and engine-portable (unlike a parallel sum). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
}
