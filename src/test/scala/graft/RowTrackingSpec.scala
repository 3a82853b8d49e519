package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sources.GraftLog

/** Stable row ids (the `delta.enableRowTracking` design): per-file
  * bases in the log for fresh files, metadata-only backfill for
  * pre-tracking files, materialization through compact, DV-delete
  * stability, and monotone never-reused id allocation. */
class RowTrackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    graft.sources.Staging.tempDir("graft_rowid_spec_") + "/t"

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def idsOf(t: String): Map[Long, Long] =
    GraftLog.readWithRowIds(spark, t)
      .select(col("id"), col("_graft_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends allocate disjoint contiguous bases; ids are unique") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 4, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    GraftLog.append(df(4 until 9, "b"), t)
    GraftLog.append(df(9 until 12, "c"), t)
    val ids = idsOf(t)
    assert(ids.size == 12)
    assert(ids.values.toSeq.distinct.size == 12, "row ids must be unique")
    assert(ids.values.min == 0 && ids.values.max == 11,
      s"expected a contiguous 0..11 allocation, got ${ids.values.toSeq.sorted}")
  }

  test("backfill is metadata-only and streams/CDF-invisible") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 6, "a"), t)           // v0, pre-tracking
    val filesBefore = GraftLog.snapshot(spark, t)._1.toSet
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))         // v1
    val v = GraftLog.backfillRowIds(spark, t)           // v2
    assert(v == 2L)
    // no data moved: the live file set is unchanged
    assert(GraftLog.snapshot(spark, t)._1.toSet == filesBefore)
    // idempotent: a second backfill finds nothing
    assert(GraftLog.backfillRowIds(spark, t) == -1L)
    // every row now has an id
    assert(idsOf(t).size == 6)
    // CDF across the backfill version reports no row changes
    assert(GraftLog.changesAt(spark, t, Seq("id"), v).count() == 0)
  }

  test("compact materializes ids; they survive the rewrite") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 5, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    GraftLog.append(df(5 until 8, "b"), t)
    val before = idsOf(t)
    GraftLog.compact(spark, t)
    val after = idsOf(t)
    assert(after == before,
      s"compact must preserve row ids: before=$before after=$after")
  }

  test("DV delete keeps survivors' ids; freed ids are never reused") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 6, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    val before = idsOf(t)
    GraftLog.deleteVectors(spark, t, col("id") >= 4)
    val after = idsOf(t)
    assert(after == before.filter(_._1 < 4),
      "DV delete must not move surviving rows' ids")
    // new rows allocate ABOVE the deleted ids (high water is monotone)
    GraftLog.append(df(6 until 8, "b"), t)
    val fresh = idsOf(t) -- after.keys
    val deletedIds = before.filter(_._1 >= 4).values.toSet
    assert(fresh.values.forall(id => !deletedIds.contains(id)),
      s"freed ids $deletedIds must never be reissued, got $fresh")
  }

  test("row-id CDF: DV delete → deletes, append → inserts, update → update") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 6, "a"), t)                     // v0
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))                   // v1
    GraftLog.backfillRowIds(spark, t)                             // v2
    val idsBefore = idsOf(t)
    GraftLog.deleteVectors(spark, t, col("id") >= 4)              // v3
    val del = GraftLog.changesByRowId(spark, t, 3L)
      .select(col("id"), col("_change_type"), col("_graft_row_id"))
      .collect()
    assert(del.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((4L, "delete"), (5L, "delete")))
    // the delete rows carry the STABLE ids the rows had in life
    assert(del.map(r => r.getLong(0) -> r.getLong(2)).toMap ==
      idsBefore.filter(_._1 >= 4))
    GraftLog.append(df(6 until 8, "b"), t)                        // v4
    val ins = GraftLog.changesByRowId(spark, t, 4L)
      .select(col("id"), col("_change_type")).collect()
    assert(ins.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((6L, "insert"), (7L, "insert")))
    // compact (rewrite-only, ids preserved) diffs EMPTY — the contract
    // that makes OPTIMIZE invisible to row-level consumers
    GraftLog.compact(spark, t)                                    // v5
    assert(GraftLog.changesByRowId(spark, t, 5L).count() == 0)
  }

  test("DELETE and UPDATE rewrites preserve survivors' ids") {
    import org.apache.spark.sql.functions.lit
    val t = tmp()
    GraftLog.overwrite(df(0 until 8, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    val before = idsOf(t)
    // file-rewriting DELETE: kept rows of touched files keep their ids
    GraftLog.delete(spark, t, col("id") >= 6)
    assert(idsOf(t) == before.filter(_._1 < 6),
      "DELETE rewrite must materialize survivors' ids")
    // UPDATE: values change, identity does not
    GraftLog.update(spark, t, col("id") === 2, Seq("tag" -> lit("upd")))
    assert(idsOf(t) == before.filter(_._1 < 6),
      "UPDATE rewrite must keep every row's id")
    assert(GraftLog.read(spark, t).filter(col("tag") === "upd")
      .count() == 1)
    // the update's row-id CDF shows exactly one update, same identity
    val v = GraftLog.versions(spark, t).last
    val ch = GraftLog.changesByRowId(spark, t, v).collect()
    assert(ch.length == 1 && ch.head.getAs[String]("_change_type")
      == "update_postimage")
  }

  test("MERGE preserves matched ids; inserts get fresh monotone ids") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 6, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    val before = idsOf(t)
    // upsert: update id 0-1, insert 6-7 — one mixed rewrite
    GraftLog.merge(df(0 until 2, "m").unionByName(df(6 until 8, "m")),
      t, Seq("id"))
    val after = idsOf(t)
    assert(after.size == 8)
    assert(after.values.toSeq.distinct.size == 8)
    // preservation (Delta rowTrackingPreserved): EVERY pre-merge row —
    // matched-updated AND carried neighbors — keeps its exact id; an
    // update changes values, never identity
    before.foreach { case (k, id) =>
      assert(after.get(k).contains(id),
        s"merge moved row $k: ${before.get(k)} -> ${after.get(k)}")
    }
    // inserted rows are FRESH, above the old high water
    val hw = before.values.max
    Seq(6L, 7L).foreach(k => assert(after(k) > hw,
      s"insert $k got a non-fresh id ${after(k)} (hw $hw)"))
    // the values themselves updated (identity stable ≠ data stable)
    val tags = GraftLog.read(spark, t).select(col("id"), col("tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags(0L) == "m" && tags(1L) == "m" && tags(2L) == "a")
  }

  test("multi-clause MERGE preserves ids through the CASE cascade") {
    import GraftLog.MergeClause._
    val t = tmp()
    GraftLog.overwrite(df(0 until 8, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    val before = idsOf(t)
    // conditional cascade: matched %2 keys update, matched others
    // DELETE, novel keys insert — all three classes in one commit
    GraftLog.mergeClauses(
      df(0 until 4, "m").unionByName(df(10 until 12, "n")), t,
      Seq("id"),
      matched = Seq(
        Update(Some(org.apache.spark.sql.functions.expr("t.id % 2 = 0")),
          Seq("tag" -> org.apache.spark.sql.functions.lit("upd"))),
        Delete(None)),
      notMatched = Seq(Insert(None, Nil)))
    val after = idsOf(t)
    // survivors: 0,2 updated; 1,3 deleted; 4-7 carried; 10,11 inserted
    assert(after.keySet ==
      Set(0L, 2L, 4L, 5L, 6L, 7L, 10L, 11L))
    (before -- Seq(1L, 3L)).foreach { case (k, id) =>
      assert(after.get(k).contains(id),
        s"clause merge moved row $k: ${before.get(k)} -> ${after.get(k)}")
    }
    val hw = before.values.max
    Seq(10L, 11L).foreach(k => assert(after(k) > hw,
      s"clause-merge insert $k must get a fresh id above $hw"))
    assert(after.values.toSeq.distinct.size == after.size)
  }

  test("MERGE id preservation survives a later compact + second wave") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 10, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    GraftLog.append(df(10 until 14, "b"), t)
    GraftLog.compact(spark, t)
    val before = idsOf(t)
    GraftLog.merge(df(3 until 6, "m").unionByName(df(20 until 23, "n")),
      t, Seq("id"))
    GraftLog.compact(spark, t)
    val mid = idsOf(t)
    GraftLog.merge(df(20 until 22, "m2"), t, Seq("id"))
    val after = idsOf(t)
    assert(after.size == 17 &&
      after.values.toSeq.distinct.size == 17)
    // wave-1 survivors hold through merge+compact+merge; wave-2
    // updates of wave-1's own INSERTS keep those fresh ids too
    (before ++ mid).foreach { case (k, id) =>
      assert(after.get(k).contains(id),
        s"row $k drifted across merge/compact waves")
    }
  }

  test("shallow clone of a tracked table reads the source's ids") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 5, "a"), t)
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    GraftLog.backfillRowIds(spark, t)
    val srcIds = idsOf(t)
    val dst = tmp()
    GraftLog.cloneShallow(spark, t, dst)
    // the clone references the SOURCE's files absolutely; bases must
    // still join (scan paths come out _data/-relative)
    val cloneIds = GraftLog.readWithRowIds(spark, dst)
      .select(col("id"), col("_graft_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cloneIds == srcIds,
      s"clone must see the source's row ids: src=$srcIds clone=$cloneIds")
  }

  test("untracked tables are unaffected; reader demands tracking") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 3, "a"), t)
    intercept[IllegalArgumentException] {
      GraftLog.readWithRowIds(spark, t)
    }
    // normal reads never see the machinery
    assert(!GraftLog.read(spark, t).columns.contains("_graft_row_id"))
  }

  test("row tracking refuses partitioned layouts at enable time") {
    val t = tmp()
    GraftLog.overwritePartitioned(df(0 until 6, "a"), t, Seq("tag"))
    // the partitioned compact/rewrite branches restage files without
    // materializing ids — enabling tracking there would silently
    // discard row identity later, so the enable itself must refuse
    val e = intercept[IllegalArgumentException] {
      GraftLog.setProperties(spark, t,
        Map("graft.enableRowTracking" -> "true"))
    }
    assert(e.getMessage.contains("partition"))
  }
}
