package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals the batch plan on the same input") {
    val batch = Streaming.windowedAggBatch(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val stream = Streaming.windowedAggStream(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("stream-static enrichment equals the batch plan on the same input") {
    val batch = Streaming.streamEnrichBatch(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val stream = Streaming.streamEnrich(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("streaming dedup emits exactly the distinct key set") {
    val keys = Streaming.streamDedupKeys(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val expect = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "events")
      .select("user_id", "event_type").distinct()
      .collect().map(_.toSeq).toSet
    assert(keys == expect)
  }

  test("stream-stream click-error join equals the batch join") {
    val batch = Streaming.clickErrorJoinBatch(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val stream = Streaming.clickErrorJoinStream(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("stateful sessionize equals the window-function sessionize") {
    val a = Streaming.sessionizeBatch(spark, TestSpark.sf)
      .select("user_id", "session_id", "n_events", "duration_us")
      .collect().map(_.toSeq).toSet
    val b = Streaming.sessionizeStateful(spark, TestSpark.sf)
      .select("user_id", "session_id", "n_events", "duration_us")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("sessions: events partition into sessions completely, gaps respected") {
    val s = Streaming.sessionizeBatch(spark, TestSpark.sf)
    val totalEvents = s.agg(sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents == 1000) // sf0.001 events row count
    // session ids contiguous from 1 per user
    val bad = s.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
    assert(s.filter(col("duration_us") < 0).count() == 0)
  }

  test("windowed agg: windows are hour-aligned and counts sum to input") {
    val w = Streaming.windowedAggBatch(spark, TestSpark.sf)
    assert(w.agg(sum("n_events")).collect()(0).getLong(0) == 1000)
    val misaligned = w.filter(
      minute(col("window_start")) =!= 0 || second(col("window_start")) =!= 0)
      .count()
    assert(misaligned == 0)
  }
}
