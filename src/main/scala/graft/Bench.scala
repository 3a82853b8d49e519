package graft
import java.nio.file.{Files, Paths}
/** Benchmark main: times every SparkEntry query at local[N] and emits ONE
  * JSON metric line. Round-1's driver failed to parse the line out of
  * sbt-wrapped stdout (`BENCH_r01.json parsed: null`), so the JSON now
  * (a) goes to stdout unwrapped (build.sbt sets `run / outputStrategy :=
  * StdoutOutput`), and (b) is also written to BENCH_LOCAL.json in the
  * working directory as a driver-readable fallback. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the driver contract is local[32]; SPARK_GRAFT_CPUS only narrows it
    // for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sessions.Sessions
      .builder(appName = "graft-bench", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail fast, named, if the corpus drifted (see TestdataContract)
    graft.sources.TestdataContract.validate(spark, sfDir)
    // Warm the JVM before timing (codegen compiler, parquet reader/writer,
    // shuffle machinery, catalog) so the first measured query doesn't
    // absorb seconds of class-loading that belongs to no query. Standard
    // bench practice; recorded baselines in BASELINE.md use the same
    // harness.
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val warmDir = Files.createTempDirectory("graft_warm_")
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .write.mode("overwrite").parquet(s"$warmDir/t")
      spark.sql("DROP TABLE IF EXISTS graft_warm")
      graft.operators.Ddl.purgeManagedLocation(spark, "graft_warm")
      spark.read.parquet(s"$warmDir/t").write.saveAsTable("graft_warm")
      spark.sql("DROP TABLE IF EXISTS graft_warm")
      // the micro-batch engine (offset log, checkpoint IO, foreachBatch
      // plumbing) class-loads seconds of machinery on first use; without
      // this, that cost lands on whichever STREAMING query the map
      // happens to order first and misattributes it
      val q = spark.readStream
        .schema(spark.read.parquet(s"$warmDir/t").schema)
        .parquet(s"$warmDir/t")
        .writeStream
        .option("checkpointLocation", s"$warmDir/ckpt")
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally { // no /tmp residue per run
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(warmDir.toFile)
    }
    // host-load context: a loaded gate machine inflates shuffle-parallel
    // queries 2-10x while leaving light ones alone (round-8 adjudication
    // burned five BenchOne sessions proving exactly that); recording the
    // 1-min loadavg at start and end makes the next inflated record
    // self-diagnosing
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg
    def timed(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // CacheScope releases the operator-persisted frames once the count
      // drains; clearCache stays as the belt for anything untracked
      val ok = try { CacheScope.withScope { fn(spark, sfDir).count() }; true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // a failed query must not masquerade as a fast one
      if (ok) dt else -1.0
    }
    // WARM second reps for every query whose cold rep crossed the
    // threshold (supersedes the old end-of-run slowest-10 loop): the
    // first rep of a heavy query absorbs staging IO and any transient
    // host contention; the warm rep is the number BenchOne
    // re-measurements reproduce, so the record carries its own
    // adjudication evidence. Running warm IMMEDIATELY after cold — and
    // deleting the query's staging right after — keeps /tmp holding at
    // most ONE query's residue: the end-of-run loop ran its warm reps
    // against the tmpfs residue of the entire suite (RAM stolen from
    // the page cache), which made staging-bound lifecycle queries the
    // only ones whose warm reps measured SLOWER than cold.
    val warmThreshold = 5.0
    val warmAcc = scala.collection.mutable.ListBuffer[(String, Double)]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val before = graft.sources.Staging.snapshot
      val cold = timed(fn)
      // per-REP reclaim (the BenchOne pattern): reclaim the COLD rep's
      // staging BEFORE the warm rep runs — a lifecycle query's warm rep
      // must measure the query, not the cold rep's hive-dir/sidecar/
      // checkpoint residue (the round-12 gate carried e19 warm 47.5 s
      // vs 17.1 cold for exactly this reason). Keyed cross-query
      // staging is exempt from cleanupSince, so warm reps of staged
      // queries still reuse their corpus.
      graft.sources.Staging.cleanupSince(before)
      if (cold >= warmThreshold) {
        val beforeWarm = graft.sources.Staging.snapshot
        warmAcc += (name -> timed(fn))
        graft.sources.Staging.cleanupSince(beforeWarm)
      }
      name -> cold
    }
    val warm = warmAcc.toList
    val loadEnd = loadavg
    def fmt(entries: Iterable[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // total covers successful queries; failures stay visible as -1 entries
    val total = results.values.filter(_ >= 0).sum
    // a ScaleUp replica carries its source-corpus fingerprint — copy it
    // into the record so a scale measurement names the corpus content it
    // was taken against (and staleness is detectable from the JSON alone)
    val scaleMarker = {
      val m = new java.io.File(s"$sfDir/_SCALE_SOURCE.json")
      if (!m.exists) ""
      else {
        val txt = new String(
          java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim
        "," + txt.stripPrefix("{").stripSuffix("}")
      }
    }
    def line(qs: String, extra: String) =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":${results.count(_._2 < 0)},"loadavg":[$loadStart%.2f,$loadEnd%.2f],"warm":${fmt(warm)}$extra$scaleMarker,"queries":$qs,"sf":"$sfDir"}"""
    // The driver keeps only the LAST ~2000 chars of output; the full
    // 81-entry map is ~2.9k and got truncated into unparseable JSON in
    // rounds 2-3 (BENCH_r0{2,3}.json "parsed": null). Stdout gets a
    // compact line — headline totals plus the slowest queries, which is
    // what the judge compares against BASELINE.md — and the complete
    // per-query map goes to BENCH_LOCAL.json (committed with the round).
    val slowest = results.toSeq.sortBy(-_._2).take(12)
    // failed queries carry -1.0 and sort out of the slowest-12 window, so
    // name them explicitly — the judge-visible stdout line must show WHICH
    // queries failed, not only how many
    val failedNames = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(line(fmt(slowest),
      s""","failed_queries":$failedNames,"queries_full":"BENCH_LOCAL.json""""))
    try Files.writeString(Paths.get("BENCH_LOCAL.json"),
      line(fmt(results), "") + "\n")
    catch { case _: Throwable => () } // stdout line is the primary channel
    spark.stop()
  }
}
