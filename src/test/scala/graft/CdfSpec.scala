package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftLog

/** File-bounded per-commit CDF (changesAt) and the streaming change
  * feed source (i16). */
class CdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def root(): String =
    graft.sources.Staging.tempDir("graft_cdf_spec_")

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def types(d: org.apache.spark.sql.DataFrame) =
    d.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("changesAt classifies append / merge / delete / metadata commits") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 20, "a"), t)              // v0
    GraftLog.append(df(20 until 25, "b"), t)                // v1
    GraftLog.merge(Seq((3L, "up"), (40L, "new")).toDF("id", "tag"),
      t, Seq("id"))                                         // v2
    GraftLog.delete(spark, t, col("id") < 2)                // v3
    GraftLog.addConstraint(spark, t, "c", "id >= 0")        // v4 (meta)
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 0)) ==
      Map("insert" -> 20L))
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 1)) ==
      Map("insert" -> 5L))
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 2)) ==
      Map("update_postimage" -> 1L, "insert" -> 1L))
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 3)) ==
      Map("delete" -> 2L))
    assert(GraftLog.changesAt(spark, t, Seq("id"), 4).count() == 0)
    // the merge diff carries postimage values
    val up = GraftLog.changesAt(spark, t, Seq("id"), 2)
      .filter($"_change_type" === "update_postimage").head
    assert(up.getAs[String]("tag") == "up")
  }

  test("changesAt on a PARTITIONED rewrite opens the swapped-out files") {
    // regression: the subset FileIndex used to intersect with the
    // CURRENT snapshot, so the old side of a partitioned rewrite's diff
    // read empty and every carried row misclassified as `insert`
    val t = root() + "/t"
    val seed = (0 until 30).map(i => (i.toLong, s"g${i % 3}", s"r$i"))
      .toDF("id", "grp", "tag")
    GraftLog.overwritePartitioned(seed, t, Seq("grp"))
    // partitioned DELETE rewrites the touched partition's files
    val v = GraftLog.delete(spark, t, $"grp" === "g1" && $"id" < 10)
    val ch = GraftLog.changesAt(spark, t, Seq("id"), v)
    val byType = ch.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 1,4,7 deleted; the carried g1 rows must NOT appear at all
    assert(byType == Map("delete" -> 3L))
  }

  test("preimages: updates emit both images, other classes unchanged") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 20, "a"), t)              // v0
    GraftLog.merge(
      Seq((3L, "up3"), (7L, "up7"), (40L, "new"), (5L, "a"))
        .toDF("id", "tag"), t, Seq("id"))                   // v1
    // value-identical rewrite of id=5 is NOT a change; 3/7 update
    val feed = GraftLog.changesAt(spark, t, Seq("id"), 1, preimages = true)
    assert(types(feed) == Map("insert" -> 1L,
      "update_preimage" -> 2L, "update_postimage" -> 2L))
    // pre rows carry v0 values, post rows v1 values, per key
    val byType = feed.filter($"id" === 3L).collect()
      .map(r => r.getAs[String]("_change_type") ->
        r.getAs[String]("tag")).toMap
    assert(byType == Map("update_preimage" -> "a",
      "update_postimage" -> "up3"))
    // the four-class feed replays v0 -> v1 exactly: v0 + feed = v1
    val v0 = GraftLog.readVersion(spark, t, 0L)
    val replayed = v0
      .join(feed.filter($"_change_type" === "update_postimage")
        .select($"id", $"tag".as("new_tag")), Seq("id"), "left")
      .select($"id", coalesce($"new_tag", $"tag").as("tag"))
      .unionByName(feed.filter($"_change_type" === "insert")
        .select($"id", $"tag"))
    val v1 = GraftLog.readVersion(spark, t, 1L)
    assert(replayed.exceptAll(v1).count() == 0 &&
      v1.exceptAll(replayed).count() == 0)
    // version-range form agrees with the per-commit form
    val ranged = GraftLog.changes(spark, t, Seq("id"), 0L, 1L,
      preimages = true)
    assert(types(ranged) == types(feed))
    // preimages of deletes do not exist (delete rows carry last-known
    // values already) — a pure delete commit emits delete rows only
    GraftLog.delete(spark, t, $"id" < 2)                    // v2
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 2,
      preimages = true)) == Map("delete" -> 2L))
  }

  test("batch CDF read: version range, _commit_version, preimages opt") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 10, "a"), t)              // v0
    GraftLog.merge(Seq((3L, "up"), (40L, "new")).toDF("id", "tag"),
      t, Seq("id"))                                         // v1
    GraftLog.delete(spark, t, $"id" < 2)                    // v2
    def read(opts: (String, String)*) = {
      val base = spark.read.format("graft")
        .option("readChangeFeed", "true").option("cdfKeys", "id")
      opts.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load(t)
    }
    // single-version window equals the per-commit API, stamped
    val v1 = read("startingVersion" -> "1", "endingVersion" -> "1")
    assert(types(v1) == Map("insert" -> 1L, "update_postimage" -> 1L))
    assert(v1.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // default range = full retained history
    val full = read()
    assert(types(full) == Map("insert" -> 11L,
      "update_postimage" -> 1L, "delete" -> 2L))
    // preimages upgrade only the update class
    val pre = read("startingVersion" -> "1", "endingVersion" -> "2",
      "includePreimages" -> "true")
    assert(types(pre) == Map("insert" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 2L))
    intercept[Exception] {
      read("startingVersion" -> "2", "endingVersion" -> "1").collect()
    }
  }

  test("timestamp reader options: timestampAsOf, CDF timestamp bounds") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 10, "a"), t)              // v0
    Thread.sleep(5)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    GraftLog.append(df(10 until 15, "b"), t)                // v1
    // batch read: state AS OF the instant = latest at-or-before = v0
    val asOf = spark.read.format("graft")
      .option("timestampAsOf", mid.toString).load(t)
    assert(asOf.count() == 10)
    intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", mid.toString)
        .option("versionAsOf", "1").load(t).collect()
    }
    // batch CDF: startingTimestamp = changes since = v1's inserts only
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("cdfKeys", "id")
      .option("startingTimestamp", mid.toString).load(t)
    assert(types(feed) == Map("insert" -> 5L))
    // endingTimestamp = at-or-before = v0's window only
    val head = spark.read.format("graft")
      .option("readChangeFeed", "true").option("cdfKeys", "id")
      .option("endingTimestamp", mid.toString).load(t)
    assert(types(head) == Map("insert" -> 10L))
  }

  test("DV commit streams deletes; materializing compact diffs empty") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 30, "a"), t)              // v0
    GraftLog.deleteVectors(spark, t, col("id") % 3 === 0)   // v1
    GraftLog.compact(spark, t)                              // v2
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 1)) ==
      Map("delete" -> 10L))
    assert(GraftLog.changesAt(spark, t, Seq("id"), 2).count() == 0,
      "pure layout change (DV materialization) must diff empty")
  }

  test("restore CDF is the row-level rewind effect") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 10, "a"), t)              // v0
    GraftLog.delete(spark, t, col("id") < 4)                // v1
    GraftLog.restore(spark, t, 0L)                          // v2
    assert(types(GraftLog.changesAt(spark, t, Seq("id"), 2)) ==
      Map("insert" -> 4L))
  }

  test("fresh CDF stream anchors at the retained snapshot after vacuum") {
    val r = root(); val t = s"$r/t"; val out = s"$r/out"
    GraftLog.overwrite(df(0 until 12, "a"), t)              // v0
    GraftLog.delete(spark, t, col("id") < 2)                // v1
    GraftLog.checkpoint(spark, t)
    GraftLog.vacuum(spark, t, 1)                            // v0 gone
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("cdfKeys", "id")
      .load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$r/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(types(got) == Map("insert" -> 10L),
      "fresh stream = oldest retained snapshot as inserts")
  }

  test("i17: streaming CDF over DV erasure equals the anti-join replay") {
    val got = graft.operators.Transactions
      .cdfErasureStream(spark, TestSpark.sf)
    val cust = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "customer")
    assert(got.filter(col("_change_type") === "insert")
      .filter(col("_commit_version") === 0).count() == cust.count())
    val v1 = got.filter(col("_commit_version") === 1)
    assert(types(v1) == Map("delete" ->
      cust.filter(col("c_custkey") % 10 === 3).count()))
    // v2 deletes only the rows v1 had not already erased
    val v2 = got.filter(col("_commit_version") === 2)
    assert(types(v2) == Map("delete" ->
      cust.filter(col("c_mktsegment") === "BUILDING" &&
        col("c_custkey") % 10 =!= 3).count()))
    // postimage values of an erased row survive in the delete record
    val probe = cust.filter(col("c_custkey") % 10 === 3)
      .select("c_custkey", "c_name").collect().head
    assert(v1.filter(col("c_custkey") === probe.getLong(0))
      .select("c_name").collect().head.getString(0) == probe.getString(1))
  }

  test("CDF stream honors maxVersionsPerTrigger") {
    val r = root(); val (t, ckpt, out) = (s"$r/t", s"$r/ckpt", s"$r/out")
    GraftLog.overwrite(df(0 until 10, "a"), t)               // v0
    GraftLog.append(df(10 until 20, "b"), t)                 // v1
    GraftLog.delete(spark, t, col("id") < 2)                 // v2
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("cdfKeys", "id")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one commit per micro-batch: snapshot, append, delete
    assert(q.recentProgress.count(_.numInputRows > 0) == 3)
    val got = spark.read.parquet(out)
    assert(types(got) ==
      Map("insert" -> 20L, "delete" -> 2L))
    assert(got.groupBy("_commit_version").count().count() == 3)
  }

  test("cdfKeys is validated and column-mapped tables are refused") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 5, "a"), t)
    assertThrows[IllegalArgumentException](
      new graft.sources.GraftCdfStreamSource(spark, t, Seq.empty))
    assertThrows[IllegalArgumentException](
      new graft.sources.GraftCdfStreamSource(spark, t, Seq("nope")))
    GraftLog.renameColumn(spark, t, "tag", "label")
    assertThrows[IllegalArgumentException](
      new graft.sources.GraftCdfStreamSource(spark, t, Seq("id")))
    assertThrows[IllegalArgumentException](
      GraftLog.changesAt(spark, t, Seq("id"), 1))
  }

  test("table_changes TVF: version and timestamp bounds, four classes") {
    val r = root(); val t = s"$r/t"
    GraftLog.overwrite(df(0 until 20, "a"), t)              // v0
    GraftLog.merge(Seq((3L, "up"), (40L, "new")).toDF("id", "tag"),
      t, Seq("id"))                                         // v1
    GraftLog.deleteVectors(spark, t, col("id") < 2)         // v2 (DV)
    // keys come from the table, not the call site (TVF args are
    // Delta-parity: name + bounds only)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM table_changes('$t', 0)").collect()
    }
    assert(e.getMessage.contains("graft.cdf.keys"))
    GraftLog.setProperties(spark, t, Map("graft.cdf.keys" -> "id")) // v3
    val all = spark.sql(s"SELECT * FROM table_changes('$t', 0, 2)")
    assert(types(all) == Map("insert" -> 21L,
      "update_preimage" -> 1L, "update_postimage" -> 1L, "delete" -> 2L))
    // _commit_version attribution and timestamp column present
    assert(all.filter(col("_commit_version") === 2)
      .select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet == Set("delete"))
    assert(all.columns.contains("_commit_timestamp"))
    // sub-range: only the merge commit
    val one = spark.sql(s"SELECT * FROM table_changes('$t', 1, 1)")
    assert(types(one) == Map("insert" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L))
    // catalog-name resolution + composability with plain SQL (compact
    // first: a catalog relation reads through the FileIndex, which
    // refuses active DVs — the CDF of the already-retained versions is
    // unaffected by the materializing commit)
    GraftLog.compact(spark, t)
    spark.sql("DROP TABLE IF EXISTS cdf_tvf_t")
    spark.sql(s"CREATE TABLE cdf_tvf_t USING graft OPTIONS (path '$t')")
    val n = spark.sql(
      """SELECT count(*) FROM table_changes('cdf_tvf_t', 0, 2)
        |WHERE _change_type = 'insert'""".stripMargin)
      .collect().head.getLong(0)
    assert(n == 21L)
    spark.sql("DROP TABLE cdf_tvf_t")
  }
}
