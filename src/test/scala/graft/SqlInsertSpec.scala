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
    // explicitly default-db-qualified: the current database is
    // session-global state another suite's USE can move mid-run
    spark.sql(s"DROP TABLE IF EXISTS default.$name")
    spark.sql(s"CREATE TABLE default.$name USING graft OPTIONS (path '$d')")
    d
  }

  test("INSERT INTO commits to the log; rows visible immediately") {
    val d = mk("si_a")
    spark.sql("INSERT INTO default.si_a VALUES (2, 'b'), (3, 'c')")
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L))
    assert(GraftLog.history(spark, d).collect()
      .map(_.getString(1)).contains("append"))
    assert(spark.table("default.si_a").count() == 3)
    // no orphan files in the table root (everything under _data/_graft_log)
    val stray = new java.io.File(d).listFiles()
      .map(_.getName).filterNot(n => n == "_data" || n == "_graft_log")
    assert(stray.isEmpty, s"raw files escaped the log: ${stray.toSeq}")
  }

  test("statement sequences keep routing through the log") {
    val d = mk("si_b")
    spark.sql("INSERT INTO default.si_b VALUES (2, 'b')")
    spark.sql("INSERT OVERWRITE default.si_b VALUES (9, 'z')")
    spark.sql("INSERT INTO default.si_b VALUES (10, 'w')")
    // the round-7-style disaster mode: the second statement resolving
    // through a stale cached relation truncated the dir, log included
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L, 2L, 3L))
    assert(spark.table("default.si_b").collect()
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
    spark.sql("DROP TABLE IF EXISTS default.si_p")
    spark.sql(s"CREATE TABLE default.si_p USING graft OPTIONS (path '$d')")
    spark.sql("INSERT INTO default.si_p VALUES (3, 'z', 'b'), (4, 'w', 'c')")
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L))
    // every file landed under its part=… dir; the new partition exists
    val files = GraftLog.snapshot(spark, d)._1
    assert(files.forall(_.contains("part=")), files.toString)
    assert(files.exists(_.contains("part=c")))
    // rows and partition values intact through the positional re-key
    assert(spark.table("default.si_p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "b"), (4L, "w", "c")))
  }

  test("CTAS creates a committed graft table") {
    val d = graft.sources.Staging.tempDir("graft_sqlins_") + "/ctas"
    spark.sql(s"DROP TABLE IF EXISTS default.si_c")
    spark.sql(s"CREATE TABLE default.si_c USING graft LOCATION '$d' " +
      "AS SELECT 1 AS id, 'a' AS tag")
    assert(spark.table("default.si_c").count() == 1)
    assert(GraftLog.versions(spark, d).nonEmpty,
      "CTAS must produce a commit log, not raw parquet")
  }

  test("TRUNCATE TABLE is a log commit, never a directory wipe") {
    spark.sql("DROP TABLE IF EXISTS default.si_t")
    // the in-memory catalog forgets managed tables across JVMs while
    // the warehouse dir persists — purge the stale location first
    graft.operators.Ddl.purgeManagedLocation(spark, "si_t")
    spark.sql("CREATE TABLE default.si_t USING graft AS SELECT 1 AS id, 'a' AS tag")
    val loc = spark.sql("DESCRIBE EXTENDED default.si_t").collect()
      .find(_.getString(0) == "Location").map(_.getString(1)).get
    spark.sql("TRUNCATE TABLE default.si_t")
    // the statement Spark would otherwise run deletes the location's
    // contents, commit log included; ours lands a remove-all commit
    assert(GraftLog.versions(spark, loc) == Seq(0L, 1L))
    assert(spark.table("default.si_t").count() == 0)
    // history preserved: the pre-truncate snapshot still time-travels
    assert(GraftLog.readVersion(spark, loc, 0L).count() == 1)
    // and the table keeps working afterwards
    spark.sql("INSERT INTO default.si_t VALUES (2, 'b')")
    assert(spark.table("default.si_t").count() == 1)
  }

  test("INSERT INTO a SELECT source lands one append commit") {
    val d = mk("si_d")
    spark.sql("INSERT INTO default.si_d SELECT id + 100, tag FROM default.si_d")
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L))
    assert(spark.table("default.si_d").count() == 2)
  }
}
