package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftLog

/** Log-carried table properties (the Delta `metaData.configuration`
  * analog): set/unset commits, inheritance across ordinary commits,
  * checkpoint carriage, clone copy, the `graft.appendOnly` enforcement
  * contract, the `graft.checkpointInterval` cadence override, and the
  * SQL surface (ALTER TABLE SET/UNSET TBLPROPERTIES,
  * SHOW TBLPROPERTIES, RETAIN-less VACUUM). */
class TablePropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    graft.sources.Staging.tempDir("graft_props_spec_") + "/t"

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  test("set/unset roundtrip; ordinary commits inherit") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 5, "a"), t)
    assert(GraftLog.properties(spark, t).isEmpty)
    GraftLog.setProperties(spark, t,
      Map("owner" -> "graft", "graft.checkpointInterval" -> "5"))
    assert(GraftLog.properties(spark, t) ==
      Map("owner" -> "graft", "graft.checkpointInterval" -> "5"))
    // an ordinary append inherits the map unchanged
    GraftLog.append(df(5 until 8, "b"), t)
    assert(GraftLog.properties(spark, t)("owner") == "graft")
    // merge semantics: a second SET overlays, leaving other keys
    GraftLog.setProperties(spark, t, Map("owner" -> "etl"))
    assert(GraftLog.properties(spark, t) ==
      Map("owner" -> "etl", "graft.checkpointInterval" -> "5"))
    GraftLog.unsetProperties(spark, t, Seq("graft.checkpointInterval",
      "missing-key-is-tolerated"))
    assert(GraftLog.properties(spark, t) == Map("owner" -> "etl"))
    // historical versions keep the configuration in force at the time
    assert(GraftLog.properties(spark, t, Some(0L)).isEmpty)
  }

  test("appendOnly blocks destructive ops, append keeps working") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 10, "a"), t)
    GraftLog.setProperties(spark, t, Map("graft.appendOnly" -> "true"))
    // appends are the one thing an append-only table is FOR
    GraftLog.append(df(10 until 12, "b"), t)
    assert(GraftLog.read(spark, t).count() == 12)
    import org.apache.spark.sql.functions.{col, lit}
    intercept[UnsupportedOperationException] {
      GraftLog.delete(spark, t, col("id") < 2)
    }
    intercept[UnsupportedOperationException] {
      GraftLog.update(spark, t, col("id") === 0, Seq("tag" -> lit("x")))
    }
    intercept[UnsupportedOperationException] {
      GraftLog.merge(df(0 until 2, "m"), t, Seq("id"))
    }
    intercept[UnsupportedOperationException] {
      GraftLog.overwrite(df(0 until 1, "o"), t)
    }
    intercept[UnsupportedOperationException] {
      GraftLog.deleteVectors(spark, t, col("id") === 1)
    }
    // replaceWhere removes the slice's rows — equally blocked
    intercept[UnsupportedOperationException] {
      GraftLog.replaceWhere(df(0 until 2, "r"), t, col("id") < 2)
    }
    // the streaming upsert sink path bypasses merge() — its own guard
    intercept[UnsupportedOperationException] {
      GraftLog.txnMerge(df(0 until 2, "s"), t, Seq("id"), "app", 0L)
    }
    // restore can drop post-restore appends — blocked too
    intercept[UnsupportedOperationException] {
      GraftLog.restore(spark, t, 0L)
    }
    // nothing was lost while blocked
    assert(GraftLog.read(spark, t).count() == 12)
    // unset re-allows
    GraftLog.unsetProperties(spark, t, Seq("graft.appendOnly"))
    GraftLog.delete(spark, t, col("id") < 2)
    assert(GraftLog.read(spark, t).count() == 10)
  }

  test("graft.checkpointInterval overrides the auto-checkpoint cadence") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 2, "a"), t) // v0
    GraftLog.setProperties(spark, t,
      Map("graft.checkpointInterval" -> "3")) // v1
    (0 until 5).foreach(i => GraftLog.append(df(i to i, "b"), t)) // v2..v6
    val ckpts = GraftLog.checkpointVersions(spark, t)
    assert(ckpts.contains(3L) && ckpts.contains(6L),
      s"expected auto-checkpoints at 3 and 6, got $ckpts")
  }

  test("checkpoint carries props; clone copies them") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 4, "a"), t)
    GraftLog.setProperties(spark, t, Map("pii" -> "scrubbed"))
    GraftLog.checkpoint(spark, t)
    // a truncating vacuum leaves replay anchored at the checkpoint —
    // the configuration must survive it
    GraftLog.append(df(4 until 6, "b"), t)
    GraftLog.vacuum(spark, t, 1)
    assert(GraftLog.properties(spark, t)("pii") == "scrubbed")
    val dst = tmp()
    GraftLog.cloneShallow(spark, t, dst)
    assert(GraftLog.properties(spark, dst)("pii") == "scrubbed")
  }

  test("SQL surface: SET/UNSET/SHOW TBLPROPERTIES on a path target") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 3, "a"), t)
    spark.sql(s"ALTER TABLE '$t' SET TBLPROPERTIES (" +
      "'graft.appendOnly' = 'true', 'team' = 'data-eng')")
    val shown = spark.sql(s"SHOW TBLPROPERTIES '$t'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("graft.appendOnly" -> "true",
      "team" -> "data-eng"))
    // the DML path hits the same guard (SQL DELETE targets catalog
    // tables; the engine entry point is shared either way)
    import org.apache.spark.sql.functions.col
    val e = intercept[UnsupportedOperationException] {
      GraftLog.delete(spark, t, col("id") === 0)
    }
    assert(e.getMessage.contains("append-only"))
    spark.sql(
      s"ALTER TABLE '$t' UNSET TBLPROPERTIES ('graft.appendOnly')")
    GraftLog.delete(spark, t, col("id") === 0)
    assert(GraftLog.read(spark, t).count() == 2)
  }

  test("ANALYZE folds visible rowCount from log metadata") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    GraftLog.overwrite(df(0 until 10, "a"), t)
    GraftLog.deleteVectors(spark, t, col("id") >= 7)
    val (rows, bytes) = GraftLog.analyzeTable(spark, t)
    // visible = physical minus DV-masked positions
    assert(rows == 7 && bytes > 0)
    val p = GraftLog.properties(spark, t)
    assert(p("graft.stats.rowCount") == "7")
    assert(p("graft.stats.sizeInBytes").toLong == bytes)
    // the SQL form returns the same numbers
    val viaSql = spark.sql(s"ANALYZE TABLE '$t' COMPUTE STATISTICS")
      .head
    assert(viaSql.getLong(0) == 7 && viaSql.getLong(1) == bytes)
    // a CATALOG target additionally lands table-level CBO stats in the
    // session catalog (the broadcast-threshold input); compact first —
    // the catalog relation reads through the DV-refusing FileIndex
    GraftLog.compact(spark, t)
    spark.sql("DROP TABLE IF EXISTS props_analyze_t")
    spark.sql(s"CREATE TABLE props_analyze_t USING graft " +
      s"OPTIONS (path '$t')")
    val viaCat = spark
      .sql("ANALYZE TABLE props_analyze_t COMPUTE STATISTICS").head
    val st = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("props_analyze_t"))
      .stats
    assert(st.exists(_.rowCount.contains(BigInt(7))),
      s"catalog stats missing rowCount: $st")
    // bytes moved under the compact — compare against THIS run's result
    assert(st.exists(_.sizeInBytes == BigInt(viaCat.getLong(1))))
    spark.sql("DROP TABLE props_analyze_t")
  }

  test("files metadata table and SHOW PARTITIONS") {
    import org.apache.spark.sql.functions.col
    val t = tmp()
    GraftLog.overwritePartitioned(
      Seq((1L, "x", "a"), (2L, "y", "a"), (3L, "z", "b"))
        .toDF("id", "v", "part"), t, Seq("part"))
    // SHOW PARTITIONS: the hive specs, sorted
    val parts = spark.sql(s"SHOW PARTITIONS '$t'").collect()
      .map(_.getString(0)).toSeq
    assert(parts == Seq("part=a", "part=b"))
    // the files metadata table: one row per live file, log-carried
    // size and row counts, zero data files opened
    val meta = spark.read.format("graft")
      .option("metadata", "files").load(t)
    assert(meta.count() == GraftLog.snapshot(spark, t)._1.size)
    assert(meta.agg(org.apache.spark.sql.functions.sum(col("num_records")))
      .head.getLong(0) == 3L)
    assert(meta.filter(col("size_bytes") <= 0).count() == 0)
    assert(meta.filter(col("partition") === "part=a").count() >= 1)
    // a flat table refuses SHOW PARTITIONS loudly (Spark parity)
    val flat = tmp()
    GraftLog.overwrite(df(0 until 3, "a"), flat)
    intercept[IllegalArgumentException] {
      spark.sql(s"SHOW PARTITIONS '$flat'").collect()
    }
  }

  test("RETAIN-less VACUUM uses graft.deletedFileRetentionHours") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 3, "a"), t)
    GraftLog.overwrite(df(0 until 2, "b"), t)
    // default 168h retention: both commits are recent → nothing swept
    assert(spark.sql(s"VACUUM '$t' DRY RUN").collect().isEmpty)
    // retention 0 hours → only the latest version's window is kept
    GraftLog.setProperties(spark, t,
      Map("graft.deletedFileRetentionHours" -> "0"))
    spark.sql(s"VACUUM '$t'")
    // v0's files are gone, latest still reads
    assert(GraftLog.read(spark, t).count() == 2)
    assert(GraftLog.versions(spark, t).size < 4)
  }
}
