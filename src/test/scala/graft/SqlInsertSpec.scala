package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftLog

/** SQL `INSERT INTO` / `INSERT OVERWRITE` on `USING graft` catalog
  * tables: rows must land as LOG COMMITS (InsertableRelation path),
  * never as raw parquet under the table root — the raw
  * InsertIntoHadoopFsRelationCommand fallback would write files no
  * commit references (silently invisible rows) and, in Overwrite mode,
  * truncate the directory INCLUDING the commit log. */
class SqlInsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(name: String): String = {
    val d = graft.sources.Staging.tempDir("graft_sqlins_") + "/t"
    Seq((1L, "a")).toDF("id", "tag").write.format("graft")
      .option("path", d).save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$d')")
    d
  }

  test("INSERT INTO commits to the log; rows visible immediately") {
    val d = mk("si_a")
    spark.sql("INSERT INTO si_a VALUES (2, 'b'), (3, 'c')")
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L))
    assert(GraftLog.history(spark, d).collect()
      .map(_.getString(1)).contains("append"))
    assert(spark.table("si_a").count() == 3)
    // no orphan files in the table root (everything under _data/_graft_log)
    val stray = new java.io.File(d).listFiles()
      .map(_.getName).filterNot(n => n == "_data" || n == "_graft_log")
    assert(stray.isEmpty, s"raw files escaped the log: ${stray.toSeq}")
  }

  test("statement sequences keep routing through the log") {
    val d = mk("si_b")
    spark.sql("INSERT INTO si_b VALUES (2, 'b')")
    spark.sql("INSERT OVERWRITE si_b VALUES (9, 'z')")
    spark.sql("INSERT INTO si_b VALUES (10, 'w')")
    // the round-7-style disaster mode: the second statement resolving
    // through a stale cached relation truncated the dir, log included
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L, 2L, 3L))
    assert(spark.table("si_b").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((9L, "z"), (10L, "w")))
    // time travel still reaches the pre-overwrite state
    assert(GraftLog.readVersion(spark, d, 1L).count() == 2)
  }

  test("INSERT INTO a hive-partitioned table keeps the layout") {
    val d = graft.sources.Staging.tempDir("graft_sqlins_") + "/p"
    GraftLog.overwritePartitioned(
      Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "v", "part"),
      d, Seq("part"))
    spark.sql(s"DROP TABLE IF EXISTS si_p")
    spark.sql(s"CREATE TABLE si_p USING graft OPTIONS (path '$d')")
    spark.sql("INSERT INTO si_p VALUES (3, 'z', 'b'), (4, 'w', 'c')")
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L))
    // every file landed under its part=… dir; the new partition exists
    val files = GraftLog.snapshot(spark, d)._1
    assert(files.forall(_.contains("part=")), files.toString)
    assert(files.exists(_.contains("part=c")))
    // rows and partition values intact through the positional re-key
    assert(spark.table("si_p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "b"), (4L, "w", "c")))
  }

  test("CTAS creates a committed graft table") {
    val d = graft.sources.Staging.tempDir("graft_sqlins_") + "/ctas"
    spark.sql(s"DROP TABLE IF EXISTS si_c")
    spark.sql(s"CREATE TABLE si_c USING graft LOCATION '$d' " +
      "AS SELECT 1 AS id, 'a' AS tag")
    assert(spark.table("si_c").count() == 1)
    assert(GraftLog.versions(spark, d).nonEmpty,
      "CTAS must produce a commit log, not raw parquet")
  }

  test("INSERT INTO a SELECT source lands one append commit") {
    val d = mk("si_d")
    spark.sql("INSERT INTO si_d SELECT id + 100, tag FROM si_d")
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L))
    assert(spark.table("si_d").count() == 2)
  }
}
