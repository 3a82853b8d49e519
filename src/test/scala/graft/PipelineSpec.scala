package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** e22 — the composed training-data pipeline: stage accounting must be
  * monotone (each gate only removes), the injected twin waves must be
  * caught by their own stage, and the stage seams must be PERSISTED so
  * no stage recomputes a prior stage's frame. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stage counts are monotone and each dedup wave catches its twins") {
    CacheScope.withScope {
      val out = Pipeline.trainingDataPipeline(spark, sf)
      val r = out.limit(1).collect().head
      val nIngest = r.getAs[Long]("n_ingested")
      val nExact = r.getAs[Long]("n_after_exact")
      val nNear = r.getAs[Long]("n_after_neardup")
      val nQual = r.getAs[Long]("n_after_quality")
      val nSamp = r.getAs[Long]("n_after_sample")
      val base = spark.read.parquet(s"$sf/documents.parquet").count()
      val nExactTwins = spark.read.parquet(s"$sf/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") % 9 === 0)
        .count()
      assert(nIngest > base, "ingest must include the twin waves")
      // exact dedup removes EXACTLY the injected exact twins (the
      // corpus itself is exact-dup-free by construction)
      assert(nIngest - nExact == nExactTwins,
        s"exact stage dropped ${nIngest - nExact}, expected $nExactTwins")
      // near-dup removes at least one injected near twin, never grows
      assert(nNear < nExact, "near-dup stage must drop injected twins")
      assert(nQual <= nNear && nSamp <= nQual, "gates only remove")
      // the pack conserves the sampled docs exactly
      val packed = out.agg(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.col("n_docs"))).head.getLong(0)
      assert(packed == nSamp,
        s"pack must conserve docs: $packed packed vs $nSamp sampled")
    }
  }

  test("stage 5 packs via the distributed prefix sum, no per-lang window") {
    CacheScope.withScope {
      val out = Pipeline.trainingDataPipeline(spark, sf)
      val bad = TestSpark.unboundedGroupWindows(out)
      assert(bad.isEmpty,
        s"e22 stage 5 funnels each language through one task on: $bad")
    }
  }

  test("stage seams are persisted: no stage recomputes a prior frame") {
    CacheScope.withScope {
      val out = Pipeline.trainingDataPipeline(spark, sf)
      // every multi-consumed stage output sits behind an
      // InMemoryRelation in the final plan (ingest, exact, near,
      // quality survivors feed both their audit count and the next
      // stage; the final plan reads the SAMPLED cache, not the lake)
      val plan = out.queryExecution.optimizedPlan
      val inMem = plan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(inMem.nonEmpty,
        s"final plan must read a persisted stage seam:\n$plan")
      // and it must NOT re-scan the bronze parquet files — the lake
      // read happened once, upstream of the cache
      val parquetLeaves = plan.collectLeaves().collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.relation.toString.contains("graft_pipe_") => lr
      }
      assert(parquetLeaves.isEmpty,
        "the packed report must not re-scan the bronze table")
    }
  }

  test("incremental composition equals the batch run; replay no-ops") {
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getAs[Long]("n_ingested"), r.getAs[Long]("n_after_exact"),
      r.getAs[Long]("n_after_neardup"), r.getAs[Long]("n_after_quality"),
      r.getAs[Long]("n_after_sample"))
    val batch = CacheScope.withScope {
      Pipeline.trainingDataPipeline(spark, sf).collect().map(key).toSet
    }
    val (incr, nb, noop) = CacheScope.withScope {
      val rows = Pipeline.trainingDataPipelineIncremental(spark, sf)
        .collect()
      (rows.map(key).toSet, rows.head.getAs[Long]("n_batches"),
        rows.head.getAs[Boolean]("replay_noop"))
    }
    assert(nb == 2L, s"expected two absorbed waves, got $nb")
    assert(noop, "re-delivering absorbed waves must be a ledger no-op")
    assert(incr == batch,
      s"incremental != batch: only-incr=${(incr -- batch).take(3)} " +
        s"only-batch=${(batch -- incr).take(3)}")
  }
}
