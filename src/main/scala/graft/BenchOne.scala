package graft

/** Time a single registered query (iteration aid; the recorded surface is
  * [[Bench]]). Usage: `runMain graft.BenchOne <queryName> <sfDir> [reps]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <queryName> <sfDir> [reps]")
    val (name, sfDir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val spark = graft.sessions.Sessions
      .builder(appName = "graft-bench-one", master = "local[32]",
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("sum(id)").collect() // JVM warm
    (1 to reps).foreach { i =>
      val staged = graft.sources.Staging.snapshot
      val t0 = System.nanoTime()
      val n = CacheScope.withScope { fn(spark, sfDir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // per-rep scratch reclaim, matching Bench — a lifecycle query's
      // rep N must not run against reps 1..N-1's staging residue
      graft.sources.Staging.cleanupSince(staged)
      println(f"BENCHONE $name rep$i: $dt%.2f s, $n rows")
    }
    spark.stop()
  }
}
