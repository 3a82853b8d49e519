package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact dedup: one row per distinct text, copies sum to corpus size") {
    val d = Dedup.exact(spark, TestSpark.sf)
    val total = d.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == 500)
    assert(d.count() == d.select("content_hash").distinct().count())
  }

  test("minhash LSH finds every high-Jaccard pair the exact oracle finds") {
    // exact pairs at j >= 0.35 within doc_id < 200 (LSH r=4/b=16 → ~98%
    // per-pair collision prob at 0.35; these must all surface)
    val exact = Dedup.ngramJaccard(spark, TestSpark.sf,
        threshold = 0.35, maxDocId = 200)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain at least one near-dup pair")
    val lsh = Dedup.minhashLsh(spark, TestSpark.sf, threshold = 0.2)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh),
      s"LSH missed high-jaccard pairs: ${exact.diff(lsh)}")
  }

  test("viral boilerplate: AQE skew-split bounds the batch band join, " +
      "answers unchanged") {
    import org.apache.spark.sql.DataFrame
    // adversarial corpus: a real document slice plus ONE boilerplate
    // text duplicated across 600 doc_ids — every copy shares every
    // band, so the candidate self-join meets one giant band group
    // (the e3/e22-stage-3 hazard a viral string creates at 100 TB)
    val base = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 150)
    val viral = spark.range(600).select(
      (col("id") + 100000L).as("doc_id"),
      lit("breaking news subscribe to our channel for more updates " +
        "and hit the bell icon now thanks for watching").as("text"))
    val docs = base.unionByName(viral)
    def pairs(df: DataFrame) = df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def withConfs[T](cs: (String, String)*)(f: => T): T = {
      val olds = cs.map { case (k, _) =>
        k -> spark.conf.getOption(k) }
      cs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // skew-split run: thresholds lowered so the fixture-sized giant
    // partition qualifies, broadcast off so the candidate join is the
    // sort-merge join AQE can split
    val (skewPairs, skewPlanned) = withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val out = Dedup.minhashLshDocs(docs)
      // execute OUT itself (a derived .select would leave out's own
      // adaptive plan un-finalized and the markers unset), then read
      // its final plan
      val p = out.collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      // the EXPLAIN pin: the executed candidate join carries AQE's
      // skew markers — the giant band group was split across tasks
      (p, out.queryExecution.executedPlan.toString.contains("skew=true"))
    }
    assert(skewPlanned,
      "AQE must mark the band self-join's skewed partitions (skew=true)")
    assert(skewPairs.exists(_._1 >= 100000L),
      "the viral copies must surface as near-dup pairs")
    // reference run with the skew optimization off: the IDENTICAL set
    val plainPairs = withConfs(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      pairs(Dedup.minhashLshDocs(docs))
    }
    assert(skewPairs == plainPairs,
      "skew-split must change task bounds, never the answer")
  }

  test("minhash LSH output is verified: every pair truly >= threshold") {
    val lsh = Dedup.minhashLsh(spark, TestSpark.sf, threshold = 0.2)
    assert(lsh.filter(col("jaccard") < 0.2).count() == 0)
  }

  test("native ShingleSet equals the HOF shinglesOf on the corpus") {
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val both = docs.select(col("doc_id"),
      graft.functions.SketchExpressions.shingle_set(col("toks"), 3).as("a"),
      Dedup.shinglesOf(col("toks"), 3).as("b"))
    // same SET per doc (native preserves first-occurrence order too, but
    // the set is the contract the oracles rely on)
    val bad = both.filter(
      size(array_except(col("a"), col("b"))) > 0 ||
      size(array_except(col("b"), col("a"))) > 0 ||
      size(col("a")) =!= size(col("b"))).count()
    assert(bad == 0)
  }

  test("ppjoin equals the unfiltered inverted index at the same threshold") {
    // the prefix/size filters must be EXACT: identical pair set (and
    // identical rounded jaccards) as the full inverted index filtered to
    // j >= 0.5 — any false negative from a too-short prefix shows here
    val pp = Dedup.ppjoin(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val ref = Dedup.ngramJaccardFull(spark, TestSpark.sf)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(_.toSeq).toSet
    assert(pp == ref)
  }

  test("dedup clusters: valid component labeling of the pair graph") {
    val pairs = Dedup.minhashLsh(spark, TestSpark.sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    // every paired doc is labeled; endpoints of every pair share a label
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split")
    }
    // each cluster's label is its minimum member (and itself a member)
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
    // reference labeling via union-find on the driver must agree exactly
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.toList.map(x => x -> find(x)).toMap
    assert(clusters == expect)
  }

  test("substring spans: exact-copy docs are fully covered, bounds hold") {
    import org.apache.spark.sql.functions._
    val out = Dedup.substringSpans(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nToks, nWin, nSpans, dupToks, frac) =
        (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4),
          r.getDouble(5))
      assert(nWin >= nSpans, "windows can only merge, not split")
      assert(dupToks >= 8 && dupToks <= nToks,
        s"coverage $dupToks out of bounds for $nToks tokens")
      assert(frac > 0 && frac <= 1.0 + 1e-9)
    }
    // cross-operator invariant: every EXACT duplicate document (>= 8
    // tokens) repeats all of its windows corpus-wide, so it must show
    // up fully covered (dup_fraction == 1)
    val copies = Dedup.exact(spark, TestSpark.sf)
      .filter(col("n_copies") >= 2).select("keep_doc_id")
      .collect().map(_.getLong(0)).toSet
    val byDoc = out.map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val longEnough = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
      .filter(size(split(lower(col("text")), " ")) >= 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    copies.intersect(longEnough).foreach { id =>
      assert(byDoc.get(id).exists(f => math.abs(f - 1.0) < 1e-9),
        s"exact-copy doc $id should be fully covered, got ${byDoc.get(id)}")
    }
  }

  test("substring cut: keeps one occurrence, cuts the rest, conserves") {
    import org.apache.spark.sql.functions._
    val out = Dedup.substringCut(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nToks, nWin, cutToks, keptToks, frac) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      assert(cutToks >= 8 && cutToks <= nToks,
        s"cut $cutToks out of bounds for $nToks tokens")
      assert(keptToks == nToks - cutToks, "conservation per doc")
      assert(nWin >= 1 && frac > 0 && frac <= 1.0 + 1e-9)
    }
    // the keeper contract on a constructed fixture: doc 1 and doc 2
    // are exact copies (doc 1 keeps, doc 2 is fully cut); doc 3
    // repeats an 8-token span internally (second occurrence cut,
    // first kept); doc 4 is unique (never appears)
    import spark.implicits._
    val span = (0 until 8).map(i => s"dup$i").mkString(" ")
    val fillerA = (0 until 6).map(i => s"fa$i").mkString(" ")
    val fillerB = (0 until 6).map(i => s"fb$i").mkString(" ")
    val fixture = Seq(
      (1L, s"$span $fillerA"),
      (2L, s"$span $fillerA"),
      (3L, s"$span $fillerB $span"),
      (4L, (0 until 20).map(i => s"uniq$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cut = Dedup.substringCutDocs(fixture, 8).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(3), r.getDouble(5))).toMap
    assert(!cut.contains(1L), "the keeper copy must not be cut")
    assert(!cut.contains(4L), "a unique doc must not be cut")
    assert(cut(2L)._2 == 14L && math.abs(cut(2L)._3 - 1.0) < 1e-9,
      s"the non-keeper exact copy must be fully cut: ${cut.get(2L)}")
    // doc 3: the span's corpus-wide keeper lives in doc 1, so BOTH of
    // doc 3's occurrences are cut (two merged 8-token spans = 16); the
    // filler between them survives
    assert(cut(3L)._1 == 22 && cut(3L)._2 == 16L,
      s"both non-keeper span occurrences must be cut: ${cut.get(3L)}")
    // conservation on the real corpus: kept + cut == total per doc
    val sums = out.map(r => (r.getLong(3), r.getLong(4), r.getInt(1)))
    assert(sums.forall { case (c, k, n) => c + k == n })
  }

  test("simhash: identical docs collide at distance 0, output bounded") {
    import spark.implicits._
    // identical texts → identical shingles → identical simhash, for both
    // the HOF form and the fused native expression (the production path)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different document about spark and catalyst"))
      .toDF("doc_id", "text")
    val withSim = docs.select(col("doc_id"),
      Dedup.simhashCol(Dedup.shingles(col("text"), 3)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withSim(1L) == withSim(2L))
    assert(withSim(1L) != withSim(3L))
    val fused = docs.select(col("doc_id"),
      graft.functions.SketchExpressions
        .shingle_simhash(Dedup.tokens(col("text")), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused(1L) == fused(2L))
    assert(fused(1L) != fused(3L))
  }

  test("simhash near-dup query runs and respects the distance bound") {
    val s = Dedup.simhash(spark, TestSpark.sf)
    assert(s.filter(col("hamming") > 7).count() == 0)
  }

  test("embedding cosine pairs are symmetric-free and within [threshold, 1]") {
    val e = Dedup.embeddingCosine(spark, TestSpark.sf)
    assert(e.count() > 0)
    assert(e.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(e.filter(col("cosine") < 0.4 || col("cosine") > 1.0).count() == 0)
  }

  test("bucketed embedding dedup: verified subset of the exact pair set") {
    val exact = Dedup.embeddingCosine(spark, TestSpark.sf)
      .select("vec_a", "vec_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.embeddingCosineLsh(spark, TestSpark.sf)
      .select("vec_a", "vec_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "LSH buckets should surface at least one pair")
    // every LSH pair is real (exact-cosine verified, identical score) —
    // precision 1 by construction; recall is the tunable approximation
    lsh.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"$pair not in exact pair set")
      assert(exact(pair) == cos)
    }
  }

  test("segment dedup drops repeated segments, keeps first occurrence in order") {
    import spark.implicits._
    // 4-token chunks; doc 1 and doc 2 share an exact chunk ("a b c d"),
    // doc 3 repeats a chunk internally, doc 4 is all-original
    val docs = Seq(
      (1L, "a b c d e f g h"),       // chunks: [a b c d] [e f g h]
      (2L, "a b c d x y z w"),       // [a b c d] duplicates doc 1's
      (3L, "p q r s p q r s"),       // second [p q r s] duplicates its own
      (4L, "k l m n")                // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, chunkTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f g h")))  // first occurrence wins
    assert(out(2L) == ((2L, 1L, "x y z w")))          // shared chunk dropped
    assert(out(3L) == ((2L, 1L, "p q r s")))          // self-repeat dropped
    assert(out(4L) == ((1L, 1L, "k l m n")))
  }

  test("segment dedup: ragged final chunk survives and reassembles exactly") {
    import spark.implicits._
    val docs = Seq((7L, "a b c d e f g h i j k")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, chunkTokens = 4).collect()(0)
    // 11 tokens → chunks of 4,4,3; all kept; reassembly is the identity
    assert(out.getLong(1) == 3 && out.getLong(2) == 3)
    assert(out.getString(3) == "a b c d e f g h i j k")
  }

  test("incremental near-dup: batch-only verdicts, scores within bounds") {
    val out = Dedup.incrementalNearDup(spark, TestSpark.sf).collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) >= 350))
    out.foreach { r =>
      val hit = r.getBoolean(3)
      if (hit) {
        assert(r.getLong(1) > 0)
        val j = r.getDouble(2)
        assert(j >= 0.2 && j <= 1.0)
      } else assert(r.getLong(1) == 0 && r.isNullAt(2))
    }
  }

  test("incremental dedup: Bloom prefilter + exact verify vs naive join") {
    val out = Dedup.incrementalDedup(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // batch = high-id docs (all novel in this dup-free corpus) plus the
    // re-keyed corpus slice (all duplicates by construction)
    assert(out.nonEmpty)
    assert(out.forall { case (id, dup) =>
      if (id >= 1000) dup else !dup })
    // every injected duplicate is present and flagged
    val injected = out.keys.filter(_ >= 1000)
    assert(injected.nonEmpty && injected.forall(out(_)))
  }

  test("persisted dedup state advances between batches") {
    val out = Dedup.dedupStatePersisted(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    // batch 1's injected corpus duplicates (+2000) flag against the
    // INITIAL state
    val inj1 = out.keys.filter { case (b, id) => b == 0 && id >= 2000 }
    assert(inj1.nonEmpty && inj1.forall(out(_)))
    // batch 2's injected BATCH-1 duplicates (+3000) flag only because
    // batch 1's novel digests were appended — the rolling property
    val inj2 = out.keys.filter { case (b, id) => b == 1 && id >= 3000 }
    assert(inj2.nonEmpty && inj2.forall(out(_)),
      "state must have advanced between batches")
    // organic batch-1 docs (novel at their first appearance) pass
    val organic1 = out.keys.filter { case (b, id) =>
      b == 0 && id < 2000 }
    assert(organic1.nonEmpty && organic1.forall(!out(_)))
  }
}
