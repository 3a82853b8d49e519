package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Sources

/** Ad-hoc stage profiler for the dedup hot spots (run explicitly:
  * testOnly graft.ProfileHarness). Not part of the regression suite. */
class ProfileHarness extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.1"

  def profilingEnabled: Boolean = sys.env.contains("GRAFT_PROFILE")

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  test("profile g8 contamination", org.scalatest.Tag("profile")) {
    assume(profilingEnabled, "set GRAFT_PROFILE=1 to run")
    val probesDf = Sources.testTable(spark, sf, "documents")
      .filter(col("doc_id") === 0)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesOf(col("toks"), 3).as("sh"))
      .select(explode(col("sh")).as("probe")).distinct()
      .orderBy(col("probe")).limit(5)
    time("probes only (pre-filtered)")(probesDf.collect())
    val viaShingled = {
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.contamination(spark, sf).count()
      (System.nanoTime()-t0)/1e9
    }
    info(f"g8 cold: $viaShingled%.2f s")
    time("g8 warm")(graft.operators.TextAnalysis.contamination(spark, sf).count())
  }

  test("profile media features warm", org.scalatest.Tag("profile")) {
    assume(profilingEnabled, "set GRAFT_PROFILE=1 to run")
    val f = graft.operators.Multimodal.extractFeatures(spark, sf)
    time("h2 cold")(f.count())
    time("h2 warm")(graft.operators.Multimodal.extractFeatures(spark, sf).count())
    time("h2 warm2")(graft.operators.Multimodal.extractFeatures(spark, sf).count())
    time("mediaTable only")(graft.operators.Multimodal.mediaTable(spark, sf).count())
  }

  test("profile minhash stages", org.scalatest.Tag("profile")) {
    assume(profilingEnabled, "set GRAFT_PROFILE=1 to run")
    val base = Sources.testTable(spark, sf, "documents")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val sigs = base.select(col("doc_id"), graft.functions.SketchExpressions
      .shingle_minhash(col("toks"), 3, 64).as("sig"))
    time("fused sig compute")(info(s"rows=" + sigs.count()))
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until 16).map { bIdx =>
        struct(lit(bIdx).as("band"),
          hash(slice(col("sig"), bIdx * 4 + 1, 4)).as("bh"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    time("banded")(banded.count())
    val cand = banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(info(s"cand=" + cand.count()))
    time("full minhash")(info(s"pairs=" + Dedup.minhashLsh(spark, sf).count()))
  }

  test("profile simhash stages", org.scalatest.Tag("profile")) {
    assume(profilingEnabled, "set GRAFT_PROFILE=1 to run")
    val docs = Sources.testTable(spark, sf, "documents")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles only")(docs.count())
    val withSim = docs
      .withColumn("simhash", Dedup.simhashCol(col("sh")))
      .select("doc_id", "simhash")
      .persist()
    time("simhash compute")(withSim.count())
    val chunked = withSim.select(col("doc_id"), col("simhash"),
      explode(array((0 until 8).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 8).bitwiseAND(0xFFL).as("ck"))
      }: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.chunk"), col("ch.ck"))
    val cand = chunked.as("x").join(chunked.as("y"),
      col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
        col("x.doc_id") < col("y.doc_id"))
    time("candidate pairs")(info(s"n_cand=${cand.count()}"))
    val dist = cand
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb")).distinct()
    time("distinct")(info(s"n_dist=${dist.count()}"))
    time("full query")(Dedup.simhash(spark, sf).count())
    withSim.unpersist()
  }

  test("profile e23 wave cost vs state growth",
      org.scalatest.Tag("profile")) {
    assume(profilingEnabled, "set GRAFT_PROFILE=1 to run")
    // equal 500-doc waves against a state that grows 3500 → 4000 →
    // 4500 kept docs: the pruned probes keep per-wave cost flat
    // (wave 3 ≈ wave 1) where a whole-state scan would climb
    import graft.sources.{GraftLog, Staging}
    val root = Staging.tempDir("graft_pipei_prof_")
    val bronze = s"$root/bronze"
    val base = Sources.testTable(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    GraftLog.overwrite(base.filter(col("doc_id") < 3500), bronze)
    Seq(3500L, 4000L, 4500L).foreach { lo =>
      GraftLog.append(base.filter(col("doc_id") >= lo &&
        col("doc_id") < lo + 500), bronze): Unit }
    (0 to 3).foreach { k =>
      val t0 = System.nanoTime()
      CacheScope.withScope {
        graft.operators.Pipeline.pipelineAdvance(
          spark, bronze, root, k.toLong): Unit }
      info(f"wave $k (${if (k == 0) "seed 3500 docs"
        else s"500 docs vs ${3000 + k * 500} kept"}): " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
