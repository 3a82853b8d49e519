package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sources.GraftLog
import java.nio.file.{Files, Paths}

/** Table-features protocol (the Delta reader/writer-features design):
  * introducing commits declare the features they depend on, and an
  * engine that does not implement a declared feature refuses the table
  * loudly instead of corrupting it silently. */
class ProtocolFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    graft.sources.Staging.tempDir("graft_proto_spec_") + "/t"

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def features(t: String, key: String): Set[String] =
    GraftLog.properties(spark, t).get(key).toSet[String]
      .flatMap(_.split(",")).filter(_.nonEmpty)

  test("introducing ops declare their features atomically") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 8, "a"), t)
    assert(features(t, "graft.protocol.readerFeatures").isEmpty)
    GraftLog.deleteVectors(spark, t, col("id") === 0)
    assert(features(t, "graft.protocol.readerFeatures")
      == Set("deletionVectors"))
    GraftLog.renameColumn(spark, t, "tag", "label")
    assert(features(t, "graft.protocol.readerFeatures")
      == Set("columnMapping", "deletionVectors"))
    GraftLog.addConstraint(spark, t, "pos_id", "id >= 0")
    assert(features(t, "graft.protocol.writerFeatures")
      == Set("checkConstraints"))
    GraftLog.setProperties(spark, t,
      Map("graft.enableRowTracking" -> "true"))
    assert(features(t, "graft.protocol.writerFeatures")
      == Set("checkConstraints", "rowTracking"))
    // declared-and-supported features never block this engine
    assert(GraftLog.read(spark, t).count() == 7)
    GraftLog.append(Seq((100L, "b")).toDF("id", "label"), t)
    assert(GraftLog.read(spark, t).count() == 8)
  }

  /** Simulate a commit from a FUTURE engine version: hand-write a
    * syntactically valid commit whose props declare a feature this
    * engine has never heard of. */
  private def injectFutureFeature(t: String, key: String): Unit = {
    val vs = GraftLog.versions(spark, t)
    val schemaDdl = GraftLog.snapshot(spark, t)._2.toDDL
      .replace("\"", "\\\"")
    val v = vs.last + 1
    val json = s"""{"version":$v,"operation":"set_properties",""" +
      s""""add":[],"remove":[],"schemaDdl":"$schemaDdl",""" +
      s""""timestampMs":${System.currentTimeMillis()},""" +
      s""""props":{"$key":"futureMagic"}}"""
    Files.writeString(
      Paths.get(f"$t/_graft_log/$v%020d.json"), json)
  }

  test("unknown reader feature blocks reads AND writes, loudly") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 5, "a"), t)
    injectFutureFeature(t, "graft.protocol.readerFeatures")
    val er = intercept[UnsupportedOperationException] {
      GraftLog.read(spark, t).count()
    }
    assert(er.getMessage.contains("futureMagic"))
    // a writer reads first: unknown reader features block commits too
    val ew = intercept[UnsupportedOperationException] {
      GraftLog.append(df(5 until 6, "b"), t)
    }
    assert(ew.getMessage.contains("futureMagic"))
    // the protocol resolves PER SNAPSHOT (Delta's contract): time
    // travel to a version BEFORE the feature was enabled stays
    // readable — the escape hatch the error message itself advises
    assert(GraftLog.readVersion(spark, t, 0L).count() == 5)
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(t).count() == 5)
    // and the table becomes readable at HEAD again once a future
    // engine removes the feature — simulated by a manual unset commit
    val vs = GraftLog.versions(spark, t)
    val schemaDdl = GraftLog.snapshot(spark, t)._2.toDDL
      .replace("\"", "\\\"")
    Files.writeString(
      Paths.get(f"$t/_graft_log/${vs.last + 1}%020d.json"),
      s"""{"version":${vs.last + 1},"operation":"unset_properties",""" +
        s""""add":[],"remove":[],"schemaDdl":"$schemaDdl",""" +
        s""""timestampMs":${System.currentTimeMillis()}}""")
    assert(GraftLog.read(spark, t).count() == 5)
  }

  test("format(\"graft\") reads hit the same reader gate") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 4, "a"), t)
    injectFutureFeature(t, "graft.protocol.readerFeatures")
    val e = intercept[UnsupportedOperationException] {
      spark.read.format("graft").load(t).count()
    }
    assert(e.getMessage.contains("futureMagic"))
  }

  test("unknown writer feature blocks commits but not reads") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 5, "a"), t)
    injectFutureFeature(t, "graft.protocol.writerFeatures")
    // reads are safe: the feature only constrains writers
    assert(GraftLog.read(spark, t).count() == 5)
    val e = intercept[UnsupportedOperationException] {
      GraftLog.append(df(5 until 6, "b"), t)
    }
    assert(e.getMessage.contains("futureMagic"))
  }

  test("clone carries the feature declarations") {
    val t = tmp()
    GraftLog.overwrite(df(0 until 6, "a"), t)
    GraftLog.deleteVectors(spark, t, col("id") === 0)
    GraftLog.compact(spark, t) // clone sources must be DV-free
    val dst = tmp()
    GraftLog.cloneShallow(spark, t, dst)
    assert(features(dst, "graft.protocol.readerFeatures")
      == Set("deletionVectors"))
  }
}
