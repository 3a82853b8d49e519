package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sources.GraftLog

/** COPY INTO — idempotent directory ingest: per-file ledger, second
  * run is a no-op, new files load incrementally, the ledger survives
  * checkpoints, FORCE re-ingests, and the SQL statement surface. */
class CopyIntoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def root(): String =
    graft.sources.Staging.tempDir("graft_copy_spec_")

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  test("second COPY INTO of the same directory adds zero rows") {
    val r = root(); val t = s"$r/t"; val src = s"$r/incoming"
    GraftLog.overwrite(df(0 until 5, "base"), t)
    df(100 until 110, "a").coalesce(1).write.parquet(src)
    val (v1, nf1, nr1) = GraftLog.copyInto(spark, t, src)
    assert(v1 >= 0 && nf1 >= 1 && nr1 == 10)
    assert(GraftLog.read(spark, t).count() == 15)
    // idempotent: the same directory again is a no-op, no new commit
    val (v2, nf2, nr2) = GraftLog.copyInto(spark, t, src)
    assert(v2 == -1 && nf2 == 0 && nr2 == 0)
    assert(GraftLog.read(spark, t).count() == 15)
    assert(GraftLog.latestVersion(spark, t).get == v1)
    // new files in the directory load, old ones stay skipped
    df(200 until 203, "b").coalesce(1).write.mode("append").parquet(src)
    val (v3, nf3, nr3) = GraftLog.copyInto(spark, t, src)
    assert(v3 == v1 + 1 && nf3 >= 1 && nr3 == 3)
    assert(GraftLog.read(spark, t).count() == 18)
  }

  test("ingest ledger survives a checkpoint (no re-load after fold)") {
    val r = root(); val t = s"$r/t"; val src = s"$r/incoming"
    GraftLog.overwrite(df(0 until 2, "base"), t)
    df(10 until 15, "a").coalesce(1).write.parquet(src)
    GraftLog.copyInto(spark, t, src)
    // checkpoint subsumes the commit carrying the ledger entries
    GraftLog.checkpoint(spark, t)
    assert(GraftLog.copiedFiles(spark, t).nonEmpty)
    val (v, nf, _) = GraftLog.copyInto(spark, t, src)
    assert(v == -1 && nf == 0,
      "checkpoint-folded ledger must still dedupe source files")
    assert(GraftLog.read(spark, t).count() == 7)
  }

  test("FORCE re-ingests; schema-directed read; csv format") {
    val r = root(); val t = s"$r/t"; val src = s"$r/csvdir"
    GraftLog.overwrite(df(0 until 2, "base"), t)
    df(50 until 53, "c").coalesce(1).write
      .option("header", "true").csv(src)
    val (_, _, nr) = GraftLog.copyInto(spark, t, src, format = "csv",
      options = Map("header" -> "true"))
    assert(nr == 3)
    // the read is schema-directed: id came back as LONG, not string
    assert(GraftLog.read(spark, t).schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    val (vF, nfF, nrF) = GraftLog.copyInto(spark, t, src,
      format = "csv", options = Map("header" -> "true"), force = true)
    assert(vF >= 0 && nfF >= 1 && nrF == 3,
      "FORCE bypasses the ledger")
    assert(GraftLog.read(spark, t).count() == 8)
  }

  test("headerless CSV + defaults: positional mapping never misaligns") {
    // the presence probe is by-NAME only for named formats; headerless
    // CSV infers _c0.._cN, so a name probe would drop every
    // default-bearing column from the read schema and the positional
    // read would replace real file values with defaults
    val r = root(); val t = s"$r/t"; val src = s"$r/csvnohdr"
    GraftLog.overwrite(Seq((1L, "a", "A")).toDF("id", "nm", "seg"), t)
    spark.sql(s"ALTER TABLE '$t' ALTER COLUMN seg SET DEFAULT 'X'")
    // (a) the file CARRIES all three columns → file values must win
    Seq((2L, "b", "B"), (3L, "c", "C")).toDF("id", "nm", "seg")
      .coalesce(1).write.csv(src)
    val (v1, _, nr1) = GraftLog.copyInto(spark, t, src, format = "csv")
    assert(v1 >= 0 && nr1 == 2)
    val segs = GraftLog.read(spark, t).orderBy("id")
      .select("seg").collect().map(_.getString(0)).toSeq
    assert(segs == Seq("A", "B", "C"),
      s"file-carried seg values must survive, got $segs")
    // (b) a trailing default-bearing column omitted → default fills
    val src2 = s"$r/csvprefix"
    Seq((4L, "d")).toDF("id", "nm").coalesce(1).write.csv(src2)
    val (v2, _, nr2) = GraftLog.copyInto(spark, t, src2, format = "csv")
    assert(v2 >= 0 && nr2 == 1)
    assert(GraftLog.read(spark, t).filter(col("id") === 4L)
      .select("seg").collect().head.getString(0) == "X")
    // (c) a dropped trailing column WITHOUT a default refuses loudly
    val r3 = root(); val t3 = s"$r3/t"; val src3 = s"$r3/csvshort"
    GraftLog.overwrite(Seq((1L, "a", "A")).toDF("id", "nm", "seg"), t3)
    spark.sql(s"ALTER TABLE '$t3' ALTER COLUMN nm SET DEFAULT 'n'")
    Seq(Tuple1(9L)).toDF("id").coalesce(1).write.csv(src3)
    val e = intercept[IllegalArgumentException] {
      GraftLog.copyInto(spark, t3, src3, format = "csv")
    }
    assert(e.getMessage.contains("DEFAULT"),
      s"positional short read without defaults must refuse: $e")
  }

  test("SQL COPY INTO statement: result row and no-op re-run") {
    val r = root(); val t = s"$r/t"; val src = s"$r/incoming"
    GraftLog.overwrite(df(0 until 3, "base"), t)
    df(70 until 76, "s").coalesce(1).write.parquet(src)
    spark.sql("DROP TABLE IF EXISTS copy_sql_t")
    spark.sql(s"CREATE TABLE copy_sql_t USING graft OPTIONS (path '$t')")
    val first = spark.sql(
      s"COPY INTO copy_sql_t FROM '$src' FILEFORMAT = PARQUET")
      .collect().head
    assert(first.getLong(1) >= 1 && first.getLong(2) == 6)
    val again = spark.sql(
      s"COPY INTO copy_sql_t FROM '$src' FILEFORMAT = PARQUET")
      .collect().head
    assert(again.getLong(0) == -1 && again.getLong(2) == 0)
    assert(spark.table("copy_sql_t").count() == 9)
    spark.sql("DROP TABLE copy_sql_t")
  }

  test("FORMAT_OPTIONS values containing ')' parse quote-aware") {
    val r = root(); val t = s"$r/t"; val src = s"$r/csvdir"
    GraftLog.overwrite(df(0 until 1, "base"), t)
    // a quoted option VALUE holding ')' (a regex-ish char) must not
    // truncate the option list or break the statement parse
    df(30 until 33, "q(x)").coalesce(1).write
      .option("header", "true").csv(src)
    spark.sql("DROP TABLE IF EXISTS copy_opts_t")
    spark.sql(s"CREATE TABLE copy_opts_t USING graft OPTIONS (path '$t')")
    val row = spark.sql(
      s"""COPY INTO copy_opts_t FROM '$src' FILEFORMAT = CSV
         |FORMAT_OPTIONS ('header' = 'true', 'comment' = ')')"""
        .stripMargin).collect().head
    assert(row.getLong(2) == 3, s"3 rows expected, got $row")
    assert(spark.table("copy_opts_t").count() == 4)
    spark.sql("DROP TABLE copy_opts_t")
  }

  test("nested source directories refuse loudly (partition-value loss)") {
    val r = root(); val t = s"$r/t"; val src = s"$r/nested"
    GraftLog.overwrite(df(0 until 2, "base"), t)
    // a hive-partitioned landing dir: flat file reads would silently
    // drop the dir-encoded partition values
    df(0 until 4, "x").withColumn("part",
        org.apache.spark.sql.functions.col("id") % 2)
      .write.partitionBy("part").parquet(src)
    val e = intercept[IllegalArgumentException] {
      GraftLog.copyInto(spark, t, src)
    }
    assert(e.getMessage.contains("FLAT directories"))
    assert(GraftLog.read(spark, t).count() == 2, "nothing part-loaded")
  }

  test("constraints and schema enforcement apply to copied batches") {
    val r = root(); val t = s"$r/t"; val src = s"$r/incoming"
    GraftLog.overwrite(df(0 until 3, "base"), t)
    GraftLog.addConstraint(spark, t, "pos_id", "id >= 0")
    df(-5 until -2, "bad").coalesce(1).write.parquet(src)
    intercept[IllegalArgumentException] {
      GraftLog.copyInto(spark, t, src)
    }
    // the failed batch recorded nothing: rows AND ledger unchanged —
    // partial failure does not poison the retry path
    assert(GraftLog.read(spark, t).count() == 3)
    assert(GraftLog.copiedFiles(spark, t).isEmpty)
    // corrected data under a fresh directory loads cleanly
    val src2 = s"$r/incoming2"
    df(5 until 8, "good").coalesce(1).write.parquet(src2)
    val (v, _, nr) = GraftLog.copyInto(spark, t, src2)
    assert(v >= 0 && nr == 3)
    assert(GraftLog.read(spark, t).count() == 6)
  }
}
