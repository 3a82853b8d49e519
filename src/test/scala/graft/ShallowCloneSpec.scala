package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftLog

/** SHALLOW CLONE (t23): zero-copy semantics, source independence,
  * compact-detach, vacuum safety, and deletion-vector carry. */
class ShallowCloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def root(): String =
    graft.sources.Staging.tempDir("graft_clone_spec_")

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def parquetsUnder(d: java.io.File): Int =
    if (!d.exists) 0
    else d.listFiles.toSeq.map { f =>
      if (f.isDirectory) parquetsUnder(f)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    }.sum

  test("clone is zero-copy and value-identical to the source snapshot") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 100, "a"), src)
    GraftLog.append(df(100 until 120, "b"), src)
    GraftLog.cloneShallow(spark, src, dst)
    assert(parquetsUnder(new java.io.File(dst, "_data")) == 0,
      "clone must not copy data files")
    val back = GraftLog.read(spark, dst)
    assert(back.count() == 120)
    assert(back.filter($"tag" === "b").count() == 20)
    // commit-logged sizes carried: no per-file status fallback needed
    assert(GraftLog.fileSizes(spark, dst).nonEmpty)
  }

  test("clone at VERSION AS OF pins the historical snapshot") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 50, "v0"), src)
    GraftLog.overwrite(df(0 until 7, "v1"), src)
    GraftLog.cloneShallow(spark, src, dst, Some(0L))
    assert(GraftLog.read(spark, dst).count() == 50)
  }

  test("clone evolves independently of the source (both directions)") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 40, "a"), src)
    GraftLog.cloneShallow(spark, src, dst)
    GraftLog.append(df(40 until 60, "c"), dst)
    GraftLog.delete(spark, dst, col("id") < 10)
    // clone sees its own lineage…
    assert(GraftLog.read(spark, dst).count() == 50)
    // …the source is untouched…
    assert(GraftLog.read(spark, src).count() == 40)
    // …and source-side writes after the clone don't leak into it
    GraftLog.append(df(1000 until 1100, "z"), src)
    assert(GraftLog.read(spark, dst).count() == 50)
  }

  test("SQL surface: CREATE TABLE … SHALLOW CLONE … VERSION AS OF") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 30, "v0"), src)
    GraftLog.overwrite(df(0 until 5, "v1"), src)
    spark.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$src' VERSION AS OF 0")
    assert(GraftLog.read(spark, dst).count() == 30)
    assert(parquetsUnder(new java.io.File(dst, "_data")) == 0)
  }

  test("compact detaches the clone; source files can then vanish") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 80, "a"), src)
    GraftLog.cloneShallow(spark, src, dst)
    GraftLog.compact(spark, dst, targetFiles = 1)
    // every live entry is now clone-local (relative)
    val (files, _) = GraftLog.snapshot(spark, dst)
    assert(files.forall(f => !f.startsWith("/")), files.mkString(","))
    // deleting the source wholesale no longer affects the clone
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(src))
    assert(GraftLog.read(spark, dst).count() == 80)
  }

  test("vacuum on the clone never deletes source-owned files") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 60, "a"), src)
    GraftLog.cloneShallow(spark, src, dst)
    // rewrite the clone so the absolute references become unreferenced
    GraftLog.overwrite(df(0 until 9, "b"), dst)
    GraftLog.vacuum(spark, dst, retainVersions = 1)
    // the source's data files are intact even though the clone no
    // longer references them
    val (srcFiles, _) = GraftLog.snapshot(spark, src)
    srcFiles.foreach(f =>
      assert(Files.exists(Paths.get(s"$src/$f")), s"vacuum ate $f"))
    assert(GraftLog.read(spark, src).count() == 60)
    assert(GraftLog.read(spark, dst).count() == 9)
  }

  test("active deletion vectors are carried into the clone") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 100, "a"), src)
    GraftLog.deleteVectors(spark, src, col("id") % 10 === 0)
    GraftLog.cloneShallow(spark, src, dst)
    assert(GraftLog.read(spark, dst).count() == 90)
    // materializing on the clone keeps the mask and detaches
    GraftLog.compact(spark, dst, targetFiles = 1)
    assert(GraftLog.read(spark, dst).count() == 90)
    assert(GraftLog.deletionVectors(spark, dst).isEmpty)
  }

  test("cloning a hive-partitioned source keeps partition semantics") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    val base = (0 until 90).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("id", "seg")
    GraftLog.overwritePartitioned(base, src, Seq("seg"))
    GraftLog.cloneShallow(spark, src, dst)
    val back = GraftLog.read(spark, dst)
    assert(back.count() == 90)
    assert(back.filter($"seg" === "s1").count() == 30)
  }

  test("clone refuses an existing target and a bogus source") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 10, "a"), src)
    GraftLog.cloneShallow(spark, src, dst)
    intercept[IllegalArgumentException] {
      GraftLog.cloneShallow(spark, src, dst)
    }
    intercept[IllegalArgumentException] {
      GraftLog.cloneShallow(spark, s"$r/nope", s"$r/dst2")
    }
  }

  test("DEEP CLONE copies files; source vacuum cannot break it") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    GraftLog.overwrite(df(0 until 80, "a"), src)
    GraftLog.append(df(80 until 100, "b"), src)
    GraftLog.cloneDeep(spark, src, dst)
    // files physically present under the CLONE's root
    assert(parquetsUnder(new java.io.File(dst, "_data")) > 0,
      "deep clone must copy data files")
    assert(GraftLog.read(spark, dst).count() == 100)
    // skipping stats and sizes re-keyed to the clone's paths
    assert(GraftLog.fileSizes(spark, dst).keys.forall(!_.startsWith("file:")))
    // the shallow-clone caveat is CLOSED: mutate + vacuum the source
    // to nothing, the deep clone still reads fully
    GraftLog.delete(spark, src, lit(true))
    GraftLog.vacuum(spark, src, retainVersions = 1)
    assert(GraftLog.read(spark, dst).count() == 100)
    // and the clone evolves independently
    GraftLog.append(df(100 until 110, "c"), dst)
    assert(GraftLog.read(spark, dst).count() == 110)
    assert(GraftLog.read(spark, src).count() == 0)
  }

  test("DEEP CLONE carries DVs and partitions; SQL surface works") {
    val r = root(); val src = s"$r/src"; val dst = s"$r/dst"
    val dst2 = s"$r/dst2"
    GraftLog.overwrite(df(0 until 30, "a"), src)
    GraftLog.deleteVectors(spark, src, col("id") < 5)
    GraftLog.cloneDeep(spark, src, dst)
    assert(GraftLog.read(spark, dst).count() == 25,
      "DV masks must survive the deep copy (position keys re-keyed)")
    // deep clone OF a shallow clone resolves the absolute references
    val sh = s"$r/shallow"
    GraftLog.cloneShallow(spark, src, sh)
    GraftLog.cloneDeep(spark, sh, dst2)
    assert(GraftLog.read(spark, dst2).count() == 25)
    assert(parquetsUnder(new java.io.File(dst2, "_data")) > 0)
    // SQL form
    val dst3 = s"$r/dst3"
    spark.sql(s"CREATE TABLE '$dst3' DEEP CLONE '$src'")
    assert(GraftLog.read(spark, dst3).count() == 25)
    // partitioned source keeps its hive layout in the copy
    val psrc = s"$r/psrc"; val pdst = s"$r/pdst"
    GraftLog.overwritePartitioned(
      Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "v", "part"),
      psrc, Seq("part"))
    GraftLog.cloneDeep(spark, psrc, pdst)
    assert(GraftLog.read(spark, pdst)
      .filter(col("part") === "a").count() == 1)
  }
}
