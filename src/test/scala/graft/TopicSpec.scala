package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Topic

class TopicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val nParts = Topic.FixturePartitions

  private def freshTopic(): String =
    graft.sources.Staging.tempDir("graft_topic_spec_") + "/t"

  private def sampleRecords(fromId: Int, toId: Int) = {
    import spark.implicits._
    (fromId until toId)
      .map(i => (s"user${i % 7}", s"$i|payload$i",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), i.toLong))
      .toDF("key", "value", "timestamp", "event_id")
  }

  test("produce assigns key-stable partitions and contiguous offsets") {
    val dir = freshTopic()
    Topic.produce(spark, dir, sampleRecords(0, 40), nParts, col("event_id"))
    val t = Topic.read(spark, dir, nParts).cache()
    try {
      assert(t.count() == 40)
      // a key lives on exactly one partition (Kafka's ordering contract)
      assert(t.groupBy("key")
        .agg(countDistinct("partition").as("np"))
        .filter(col("np") > 1).count() == 0)
      // offsets are 0..n-1 per partition, no holes, no duplicates
      val perPart = t.groupBy("partition")
        .agg(count(lit(1)).as("n"), min("offset").as("lo"),
          max("offset").as("hi"), countDistinct("offset").as("d"))
        .collect()
      perPart.foreach { r =>
        assert(r.getAs[Long]("lo") == 0L)
        assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
        assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
      }
    } finally { t.unpersist(); () }
  }

  test("second produce continues from committed high-waters") {
    val dir = freshTopic()
    Topic.produce(spark, dir, sampleRecords(0, 30), nParts, col("event_id"))
    val (v1, highs1) = Topic.highWaters(spark, dir, nParts)
    Topic.produce(spark, dir, sampleRecords(30, 50), nParts, col("event_id"))
    val (v2, highs2) = Topic.highWaters(spark, dir, nParts)
    assert(v2 == v1 + 1 && highs2.sum == 50 && highs1.sum == 30)
    val t = Topic.read(spark, dir, nParts)
    // still contiguous per partition after the second batch
    val bad = t.groupBy("partition")
      .agg(count(lit(1)).as("n"), max("offset").as("hi"))
      .filter(col("hi") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("a torn produce (segments without ledger commit) is invisible") {
    val dir = freshTopic()
    Topic.produce(spark, dir, sampleRecords(0, 20), nParts, col("event_id"))
    val before = Topic.read(spark, dir, nParts).count()
    // simulate the crash window: segment rows beyond the committed highs
    // land in the data dir, but no ledger version is ever written
    val (_, highs) = Topic.highWaters(spark, dir, nParts)
    import spark.implicits._
    Seq(("ghost", "999|ghost", new java.sql.Timestamp(0L), "t",
        highs.max + 50))
      .toDF("key", "value", "timestamp", "topic", "offset")
      .withColumn("partition", lit(0))
      .write.mode("append").partitionBy("partition").parquet(s"$dir/data")
    assert(Topic.read(spark, dir, nParts).count() == before)
    assert(Topic.read(spark, dir, nParts)
      .filter(col("key") === "ghost").count() == 0)
  }

  test("consumer group: earliest default, committed position, exactly-once") {
    val dir = freshTopic()
    Topic.produce(spark, dir, sampleRecords(0, 40), nParts, col("event_id"))
    assert(Topic.groupPosition(spark, dir, "g1", nParts) ==
      Seq.fill(nParts)(0L))
    // chunk 1: consume everything committed so far, commit the position
    val chunk1 = Topic.readFrom(spark, dir, nParts,
      Topic.groupPosition(spark, dir, "g1", nParts)).cache()
    val (_, highsAfter1) = Topic.highWaters(spark, dir, nParts)
    Topic.commitGroup(spark, dir, "g1", highsAfter1)
    // chunk 2: a new batch lands; resuming reads ONLY the new rows
    Topic.produce(spark, dir, sampleRecords(40, 55), nParts, col("event_id"))
    val chunk2 = Topic.readFrom(spark, dir, nParts,
      Topic.groupPosition(spark, dir, "g1", nParts)).cache()
    try {
      assert(chunk1.count() == 40 && chunk2.count() == 15)
      // disjoint and complete: exactly-once over the two chunks
      assert(chunk1.select("partition", "offset")
        .intersect(chunk2.select("partition", "offset")).count() == 0)
      assert(chunk1.unionByName(chunk2).count() ==
        Topic.read(spark, dir, nParts).count())
    } finally { chunk1.unpersist(); chunk2.unpersist(); () }
  }

  test("ledger commit is put-if-absent: a taken version loses, never overwrites") {
    val dir = freshTopic()
    Topic.produce(spark, dir, sampleRecords(0, 10), nParts, col("event_id"))
    // two writers race for version 1 — first wins, second loses (this is
    // the primitive produce() turns into CommitConflictException)
    assert(Topic.commitLedger(spark, dir, 1L, Seq(9L, 9L, 9L, 9L)))
    assert(!Topic.commitLedger(spark, dir, 1L, Seq(8L, 8L, 8L, 8L)))
    // the winner's content survives — the loser did not clobber it
    assert(Topic.highWaters(spark, dir, nParts)._2 == Seq(9L, 9L, 9L, 9L))
  }

  test("streaming consume agrees with the batch consume") {
    val sfDir = TestSpark.sf
    val batch = graft.sources.Topic.produceConsume(spark, sfDir)
      .drop("n_keys", "max_ts")
    val stream = graft.streaming.Streaming.topicConsumeStream(spark, sfDir)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }
}
