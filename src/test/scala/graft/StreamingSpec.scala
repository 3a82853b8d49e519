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

  test("sliding agg: stream equals batch; each event lands in 2 windows") {
    val batch = Streaming.slidingAggBatch(spark, TestSpark.sf)
    val stream = Streaming.slidingAggStream(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch.collect().map(_.toSeq).toSet)
    // duration/slide = 2 → every event contributes to exactly 2 windows
    assert(batch.agg(sum("n_events")).collect()(0).getLong(0) == 2000)
    // window length always 1h, starts 30-min aligned
    assert(batch.filter(
      unix_micros(col("window_end")) - unix_micros(col("window_start"))
        =!= 3600L * 1000000L).count() == 0)
    assert(batch.filter(minute(col("window_start")) % 30 =!= 0 ||
      second(col("window_start")) =!= 0).count() == 0)
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

  test("bounded-state dedup (withinWatermark) covers the distinct key set") {
    val keys = Streaming.streamDedupKeysBounded(spark, TestSpark.sf)
      .collect().map(_.toSeq)
    val expect = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "events")
      .select("user_id", "event_type").distinct()
      .collect().map(_.toSeq).toSet
    // Invariants that hold regardless of micro-batch boundaries: every
    // distinct key appears, and nothing outside the distinct set does.
    assert(keys.toSet == expect)
    // With the finite input inside one watermark window, no state is
    // evicted mid-stream, so nothing re-emits: exact distinct cardinality.
    assert(keys.length == expect.size)
  }

  test("stream-stream click-error join equals the batch join") {
    val batch = Streaming.clickErrorJoinBatch(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val stream = Streaming.clickErrorJoinStream(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("checkpointed file-sink stream resumes exactly-once after kill") {
    val ev = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "events")
    val phase1 = ev.filter(pmod(col("event_id"), lit(2)) === 0).count()
    val total = ev.count()

    val h = new Streaming.RestartHarness(spark, TestSpark.sf)
    h.land(0); h.runToDrain()
    assert(h.sinkFrame.count() == phase1) // phase 1 fully committed

    h.runToDrain() // restart with no new data
    assert(h.sinkFrame.count() == phase1) // idempotent: zero reprocessing

    h.land(1); h.runToDrain() // resume over newly landed files
    assert(h.sinkFrame.count() == total) // every row exactly once
    assert(h.sinkFrame.select("event_id").distinct().count() == total)
  }

  test("partitioned direct sink: layout lands; Complete+partitionBy refused") {
    import spark.implicits._
    val root = graft.sources.Staging.tempDir("graft_psink_spec_")
    val (src, t, ckpt) = (s"$root/src", s"$root/t", s"$root/ckpt")
    graft.sources.GraftLog.append(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
        .toDF("id", "kind", "v"), src)
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft").partitionBy("kind")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(t)
    q.awaitTermination()
    val files = graft.sources.GraftLog.snapshot(spark, t)._1
    assert(files.forall(_.contains("kind=")),
      s"sink must write the hive layout: $files")
    assert(graft.sources.GraftLog.read(spark, t).count() == 3)
    // Complete + partitionBy would rewrite the layout per batch — loud
    val e = intercept[Exception] {
      spark.readStream.format("graft").load(src)
        .groupBy($"kind").count()
        .writeStream.format("graft").partitionBy("kind")
        .outputMode("complete")
        .option("checkpointLocation", s"$root/ckpt2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(s"$root/t2")
    }
    assert(e.getMessage.contains("partitionBy") ||
      e.getCause != null && e.getCause.getMessage.contains("partitionBy"))
  }

  test("as-of semantics: most recent view, NULL before any view, tie by id") {
    import spark.implicits._
    // (user, event_id, us, is_view)
    val tagged = Seq(
      (1L, 10L, 100L, true),  // view
      (1L, 12L, 120L, true),  // more recent view
      (1L, 11L, 150L, false), //   click → view 12 (most recent wins)
      (1L, 13L, 200L, false), //   click → view 12 still
      (2L, 20L, 50L, false),  //   click with NO preceding view → NULL
      (3L, 30L, 300L, true),  // tie: view id < click id at equal ts
      (3L, 31L, 300L, false), //   click → view 30 (gap 0)
      (3L, 33L, 300L, true),  // tie: view id > click id at equal ts
      (3L, 32L, 300L, false)  //   click → still view 30 (33 is "after")
    ).toDF("user_id", "event_id", "us", "is_view")
    val out = graft.operators.AsOf.lastViewCore(tagged)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
         Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(11L) == (Some(12L), Some(30L)))
    assert(out(13L) == (Some(12L), Some(80L)))
    assert(out(20L) == (None, None))
    assert(out(31L) == (Some(30L), Some(0L)))
    assert(out(32L) == (Some(30L), Some(0L)))
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
