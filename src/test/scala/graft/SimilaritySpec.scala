package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("brute force: exactly k neighbors per query, ranks contiguous, no self") {
    val r = Similarity.bruteForceTopK(spark, TestSpark.sf)
    val perQuery = r.groupBy("query_id").count().collect()
    assert(perQuery.length == 10 && perQuery.forall(_.getLong(1) == 5))
    assert(r.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val ranks = r.filter(col("query_id") === 0)
      .orderBy("rank").collect().map(_.getInt(2)).toSeq
    assert(ranks == Seq(1, 2, 3, 4, 5))
    // scores non-increasing by rank
    val scores = r.filter(col("query_id") === 0)
      .orderBy("rank").collect().map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("LSH top-k: recall against exact top-k is useful and re-ranking exact") {
    val exact = Similarity.bruteForceTopK(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"LSH recall@5 = $recall")
    assert(recall >= 0.3, s"recall $recall too low")
    // every approx score must equal the exact cosine (re-ranking is exact):
    // any (q,n) pair present in both must carry the same rounded score
    val exactScores = Similarity.bruteForceTopK(spark, TestSpark.sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val mismatches = Similarity.lshTopK(spark, TestSpark.sf).collect()
      .flatMap { r =>
        val key = (r.getLong(0), r.getLong(1))
        exactScores.get(key).filter(_ != r.getDouble(3)).map(e => (key, e))
      }
    assert(mismatches.isEmpty, s"score drift: ${mismatches.take(3).toSeq}")
  }

  test("IVF top-k: k rows per query, scores exact, useful recall") {
    val ivf = Similarity.ivfTopK(spark, TestSpark.sf)
    val perQuery = ivf.groupBy("query_id").count().collect()
    assert(perQuery.length == 10 && perQuery.forall(_.getLong(1) == 5))
    val exact = Similarity.bruteForceTopK(spark, TestSpark.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val pairs = ivf.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    val recall = pairs.count(p => exact.contains(p._1)).toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.2) // 4/16 cells probed on near-random vectors
    // candidate scores must be the exact cosine
    val drift = pairs.filter(p => exact.get(p._1).exists(_ != p._2))
    assert(drift.isEmpty)
  }

  test("persisted IVF index answers exactly like the build-per-run IVF") {
    val indexed = Similarity.ivfIndexedTopK(spark, TestSpark.sf)
    val direct = Similarity.ivfTopK(spark, TestSpark.sf)
    assert(indexed.exceptAll(direct).count() == 0 &&
      direct.exceptAll(indexed).count() == 0)
    // second call hits the staged index (no rebuild) — same answer
    val again = Similarity.ivfIndexedTopK(spark, TestSpark.sf)
    assert(again.exceptAll(direct).count() == 0)
    // the index table is genuinely cell-partitioned and probing prunes
    // in the PLANNER: a one-cell filter over the index opens strictly
    // fewer files than the 16-cell table holds
    val idxDir = graft.operators.Similarity.indexRootFor(TestSpark.sf)
      .getOrElse(fail("index not staged"))
    val one = spark.read.format("graft").load(s"$idxDir/cells")
      .filter(org.apache.spark.sql.functions.col("cent_id") === 0L)
    one.collect()
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan in the pruned plan"))
    val all = spark.read.format("graft").load(s"$idxDir/cells")
      .inputFiles.length
    assert(scan.metrics("numFiles").value < all,
      s"pruned ${scan.metrics("numFiles").value} of $all")
  }

  test("IVF k-means refinement: recall improves on the seed centroids") {
    // 50 queries (250 truth pairs) — the default 10 is too small a sample
    // to separate the centroid qualities; the whole pipeline is
    // deterministic, so these recalls are exact constants of the corpus
    val nq = 50
    val exact = Similarity.bruteForceTopK(spark, TestSpark.sf,
        numQueries = nq).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .count(exact.contains).toDouble / exact.size
    val seed = recallOf(Similarity.ivfTopK(spark, TestSpark.sf,
      numQueries = nq))
    val refined = recallOf(Similarity.ivfKmeansTopK(spark, TestSpark.sf,
      numQueries = nq))
    info(s"IVF recall@5: seed=$seed refined=$refined")
    // Lloyd re-centers the cells: measured 0.62 -> 0.656 on this corpus
    assert(refined > seed, s"refined $refined !> seed $seed")
    // every emitted query still gets exactly k ranked rows
    val perQuery = Similarity.ivfKmeansTopK(spark, TestSpark.sf,
        numQueries = nq)
      .groupBy("query_id").count().collect()
    assert(perQuery.length == nq && perQuery.forall(_.getLong(1) == 5))
  }

  test("quantize audit: codes bounded, every dim covered, error within cell") {
    val q = graft.operators.Similarity.quantizeAudit(spark, TestSpark.sf)
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getLong(1) == 64) // n_dims
      assert(r.getInt(2) <= 255 && r.getInt(3) >= 0) // max/min code
      assert(r.getDouble(4) >= 0.0) // mse
    }
    // midpoint reconstruction: per-dim error <= scale/2, so per-vector
    // mse <= max_dim(scale^2)/4 (+ rounding slack)
    val emb = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "v")))
    val maxScale = emb.groupBy("pos")
      .agg(((max(col("v")) - min(col("v"))) / 255.0).as("s"))
      .agg(max(col("s"))).collect()(0).getDouble(0)
    val bound = maxScale * maxScale / 4.0 + 1e-9
    assert(q.forall(_.getDouble(4) <= bound))
  }

  test("quantized top-k: high recall vs the float top-k, exact shape") {
    val exact = graft.operators.Similarity
      .bruteForceTopK(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = graft.operators.Similarity
      .quantizedTopK(spark, TestSpark.sf)
      .collect()
    assert(quant.nonEmpty)
    // per query exactly k rows with contiguous ranks
    val byQ = quant.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
    }
    val qPairs = quant.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(qPairs).size.toDouble / exact.size
    // int8 midpoint reconstruction barely moves cosines; demand most of
    // the float ranking survives
    assert(recall >= 0.7, s"recall $recall")
  }

  test("PQ ADC: trained codebooks + shortlist refine recover the exact top-k") {
    val exact = graft.operators.Similarity
      .bruteForceTopK(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.operators.Similarity.pqTopK(spark, TestSpark.sf).collect()
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      // contiguous ranks, and the refine step really ordered by cosine
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      val cosByRank = rs.sortBy(_.getInt(2)).map(_.getDouble(4))
      assert(cosByRank.zip(cosByRank.tail).forall { case (a, b) => a >= b })
    }
    val pairs = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(pairs).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall")
    // 64× compression scanning only codes; the 50-row shortlist refine
    // must recover most of the float ranking (observed: 0.64 on the
    // sf0.001 embedding draw, 0.76 on sf0.01 — deterministic per corpus)
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVFADC: residual codebooks, cell-confined ADC, recall vs PQ") {
    val exact = graft.operators.Similarity
      .bruteForceTopK(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = graft.operators.Similarity.ivfPqTopK(spark, TestSpark.sf)
      .collect()
    // shape: ≤ k ranked rows per query, ranks contiguous from 1,
    // refine really ordered by cosine
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      val cosByRank = rs.sortBy(_.getInt(2)).map(_.getDouble(4))
      assert(cosByRank.zip(cosByRank.tail).forall { case (a, b) => a >= b })
    }
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfadcRecall = exact.intersect(pairs).size.toDouble / exact.size
    // candidates are confined to probed cells, so every IVFADC result
    // must already be an IVF candidate: recall is bounded by f3's, and
    // at equal shortlist the residual codebooks must not lose to the
    // raw-vector codebooks of f7 by more than the cell-pruning cost —
    // the VERDICT bar is recall >= f7's at equal shortlist AMONG the
    // probed-cell candidates, which cell-recall times pq-recall gives
    val ivfPairs = graft.operators.Similarity.ivfTopK(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = exact.intersect(ivfPairs).size.toDouble / exact.size
    info(s"IVFADC recall@5 = $ivfadcRecall (IVF ceiling $ivfRecall)")
    // residual PQ inside probed cells must essentially match the IVF
    // ceiling: the 50-row shortlist + exact refine recovers what the
    // cells admit (deterministic constants of the corpus)
    assert(ivfadcRecall >= ivfRecall - 0.05,
      s"IVFADC $ivfadcRecall fell below its IVF ceiling $ivfRecall")
    assert(pairs.subsetOf(
      // every result vector shares a probed cell with its query — the
      // inverted-list confinement that makes the scan sublinear
      graft.operators.Similarity.ivfTopK(spark, TestSpark.sf,
        k = 1000000, nprobe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  test("recall curve: monotone in nprobe, exact at nprobe = nCent") {
    val rows = Similarity.ivfRecallCurve(spark, TestSpark.sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8, 16))
    // a larger probe set is a candidate superset — recall cannot drop
    rows.sliding(2).foreach { case Array((_, lo), (_, hi)) =>
      assert(hi >= lo, s"recall regressed along the curve: $rows")
    }
    // probing every cell IS the exhaustive search
    assert(rows.last._2 == 1.0, s"full probe must be exact: $rows")
    // the f3 default (nprobe=4) sits on this curve
    assert(rows.find(_._1 == 4).exists(_._2 > 0.5))
  }

  test("incremental IVF update equals the full-build answer") {
    val inc = Similarity.ivfIndexIncrementalTopK(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Similarity.ivfTopK(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // fixed centroids: append-after-build is bit-identical to rebuild
    assert(inc == full)
  }

  test("brute force broadcasts the query side (no corpus shuffle join)") {
    val plan = Similarity.bruteForceTopK(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("f13 retrain: drift trips the trigger, recall holds the IVF band") {
    val out = Similarity.ivfRetrainTopK(spark, TestSpark.sf).collect()
    // 10 queries x 5 ranked rows, trigger decision pinned on every row
    assert(out.length == 50)
    assert(out.forall(_.getBoolean(5)))
    val skew = out.head.getDouble(4)
    assert(skew > 2.0, s"drift should skew occupancy well past 2.0: $skew")
    // exact top-5 on the SAME drifted corpus (reconstructed with the
    // identical +1.0 component shift)
    val base = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val drifted = base.filter(col("vec_id") < 350)
      .unionByName(base.filter(col("vec_id") >= 350)
        .withColumn("v", transform(col("v"), x => x + lit(1.0))))
      .withColumn("norm",
        sqrt(aggregate(zip_with(col("v"), col("v"), _ * _),
          lit(0.0), _ + _)))
    val q = drifted.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val scored = drifted.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        aggregate(zip_with(col("qv"), col("v"), _ * _), lit(0.0), _ + _)
          / (col("qnorm") * col("norm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val exact = scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1)))
    val recall = got.count(exact.contains).toDouble / exact.size
    info(s"f13 post-retrain recall@5 on drifted corpus = $recall")
    assert(recall >= 0.2, s"recall $recall below the f3 band")
    // trigger boundary: an unreachable threshold refuses to retrain
    // loudly rather than silently skipping the maintenance
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfRetrainTopK(spark, TestSpark.sf,
        skewThreshold = 1e9)
    }
    assert(e.getMessage.contains("occupancy trigger"))
  }

  test("f15 streaming erasure: ledger-gated waves, redrain no-op, clean") {
    CacheScope.withScope {
      val rows = graft.operators.Similarity
        .ivfIndexStreamingErasure(spark, TestSpark.sf).collect()
      assert(rows.nonEmpty)
      val r = rows.head
      assert(r.getAs[Boolean]("deleted_absent"),
        "an erased vector must never surface as a neighbor")
      assert(r.getAs[Boolean]("replay_noop"),
        "a checkpoint-loss redrain must leave cells+ledger versions put")
      // every %5==0 corpus vector masked exactly once across the two
      // waves (the ledger accounts each row once, waves never overlap)
      val expected = spark.read
        .parquet(s"${TestSpark.sf}/embeddings.parquet")
        .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 0)
        .count()
      assert(r.getAs[Long]("n_erased") == expected,
        s"ledger-accounted erasures ${r.getAs[Long]("n_erased")} " +
          s"!= $expected")
      // no surviving neighbor is an erased id, in EVERY row
      assert(rows.forall(x => x.getAs[Long]("neighbor_id") % 5 != 0))
    }
  }
}
