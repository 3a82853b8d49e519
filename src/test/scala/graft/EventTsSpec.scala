package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Pins [[Sources.normalizeEventTs]]'s schema dispatch against BOTH
  * physical encodings `events.ts` has shipped with (raw INT64 nanos read
  * as long, and timestamp[us] read as TIMESTAMP_NTZ) — the round-7
  * testdata refresh flipped the encoding and broke every events-derived
  * query because the conversion was hard-coded; this spec makes the next
  * drift a single red test with a clear name instead.
  */
class EventTsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def micros(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val n = Sources.normalizeEventTs(df)
    assert(n.schema("ts").dataType == TimestampType,
      s"normalized type is ${n.schema("ts").dataType}")
    n.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("long-nanos fixture: ns→µs with FLOOR (pre-1970 included)") {
    import spark.implicits._
    // -1500 ns floors to -2 µs (truncation toward zero would give -1)
    val df = Seq(0L, 999L, 1000L, 1999L, -1L, -1500L, 1723500000123456789L)
      .toDF("ts")
    assert(micros(df) == Seq(-2L, -1L, 0L, 0L, 1L, 1L, 1723500000123456L))
  }

  test("timestamp-µs fixture: pass-through, micros-identity under UTC") {
    import spark.implicits._
    val us = Seq(0L, 1L, -1L, 1723500000123456L)
    val ntz = us.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    assert(micros(ntz) == us.sorted)
    val tz = us.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(micros(tz) == us.sorted)
  }

  test("parquet round-trip: scanned encoding normalizes to the same µs") {
    import spark.implicits._
    val us = Seq(0L, 1723500000123456L, -62135596800000000L)
    val dir = graft.sources.Staging.dir(TestSpark.sf, "ts_fixture", "graft_ts_")
    us.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(dir)
    assert(micros(spark.read.parquet(dir)) == us.sorted)
  }

  test("unknown encoding fails loudly, naming the column") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Sources.normalizeEventTs(Seq("2024-01-01").toDF("ts"))
    }
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("StringType"))
  }

  test("live testdata contract: events.ts normalizes on every SF dir") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val ev = Sources.testTable(spark, s"/root/testdata/$sf", "events")
      val n = Sources.normalizeEventTs(ev)
      assert(n.schema("ts").dataType == TimestampType)
      assert(n.limit(1).count() == 1)
    }
  }
}
