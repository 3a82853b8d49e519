package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rolling_hash: codegen and interpreted paths agree, SQL registration works") {
    import spark.implicits._
    val df = Seq("hello world", "", "★ unicode · text", "hello world")
      .toDF("text")
    val codegen = df.select(GraftFunctions.rolling_hash(col("text")))
      .collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try df.select(GraftFunctions.rolling_hash(col("text")))
        .collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(codegen == interp)
    assert(codegen(0) == codegen(3)) // equal text, equal fingerprint
    assert(codegen(0) != codegen(2))
    assert(codegen(1) == 0L) // empty string
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash('hello world')")
      .collect()(0).getLong(0)
    assert(viaSql == codegen(0))
  }

  test("all graft native expressions are SQL-registered and agree with Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  simhash64(array(7L, 7L, 7L)) AS sh,
        |  minhash_sig(array(5L, 9L), 4) AS ms,
        |  shingle_simhash(array('a','b','c','d'), 3) AS ss,
        |  shingle_minhash(array('a','b','c','d'), 3, 8) AS sm
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 7L) // all votes from identical hashes
    assert(r.getSeq[Long](2).length == 4)
    assert(r.getSeq[Long](4).length == 8)
    // shingle_simhash of identical token lists is stable
    val again = spark.sql(
      "SELECT shingle_simhash(array('a','b','c','d'), 3)").collect()(0).getLong(0)
    assert(again == r.getLong(3))
  }

  test("rolling_hash prefix-composition: h(ab) = (h(a)*131^|b| + h(b)) mod p") {
    import spark.implicits._
    val Mod = graft.functions.RollingHash.Mod
    val r = Seq(("spark", " sql")).toDF("a", "b")
      .select(
        GraftFunctions.rolling_hash(concat(col("a"), col("b"))).as("hab"),
        GraftFunctions.rolling_hash(col("a")).as("ha"),
        GraftFunctions.rolling_hash(col("b")).as("hb"),
        length(col("b")).as("lb"))
      .collect()(0)
    val pow = (0 until r.getInt(3))
      .foldLeft(1L)((p, _) => p * graft.functions.RollingHash.Base % Mod)
    assert(r.getLong(0) == (r.getLong(1) * pow + r.getLong(2)) % Mod)
  }

  test("fingerprint query: deterministic across runs and shuffle-free") {
    val a = TextAnalysis.fingerprint(spark, TestSpark.sf).collect().toSet
    val b = TextAnalysis.fingerprint(spark, TestSpark.sf).collect().toSet
    assert(a == b && a.nonEmpty)
    val plan = TextAnalysis.fingerprint(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("lang id: predictions drawn from profile set, confidence in [0,1]") {
    val r = TextAnalysis.langId(spark, TestSpark.sf)
    val langs = r.select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr")))
    assert(r.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
  }

  test("pii scrub redacts emails, urls, phones on fixture rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "contact bob.smith+x@example.co.uk for details"),
      (2L, "en", "see https://spark.apache.org/docs/latest for info"),
      (3L, "en", "call +1 (555) 123-4567 now"),
      (4L, "en", "nothing sensitive here at all"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.piiScrubFrame(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getInt(3))).toMap
    assert(out(1L)._1 == "contact <EMAIL> for details" && out(1L)._2 == 1)
    assert(out(2L)._1 == "see <URL> for info" && out(2L)._2 == 1)
    assert(out(3L)._1 == "call <PHONE> now" && out(3L)._2 == 1)
    assert(out(4L)._1 == "nothing sensitive here at all" && out(4L)._2 == 0)
  }

  test("contamination screen: probe doc flags itself, hits bounded by probe count") {
    val c = TextAnalysis.contamination(spark, TestSpark.sf)
    val hits = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(0L), "the probe document must flag itself")
    assert(hits(0L) == 5L)
    assert(hits.values.forall(h => h >= 1 && h <= 5))
  }

  test("repetition stats: fixture doc with known repeats scores exactly") {
    import spark.implicits._
    // "a b a b a b" → bigrams [ab, ba, ab, ba, ab]: top=3/5; trigrams
    // [aba, bab, aba, bab]: 4 total, 2 distinct → dup 2/4
    val df = Seq((1L, "a b a b a b"), (2L, "w x y z"))
      .toDF("doc_id", "text").createOrReplaceTempView("fixture_docs")
    val out = graft.operators.TextAnalysis.repetitionStats(spark,
      TestSpark.sf) // corpus run: just bounds + no-crash
    assert(out.filter(col("top_bigram_frac") > 1.0 ||
      col("dup_trigram_frac") > 1.0).count() == 0)
    // fixture arithmetic via the same column expressions
    val fix = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val toks = split(lower(col("text")), " ")
    val g2 = when(size(toks) >= 2, transform(
      sequence(lit(0), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val r = fix.select(size(g2).as("n"),
      array_max(transform(array_distinct(g2),
        g => size(filter(g2, x => x === g)))).as("top")).head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 3)
  }

  test("mixture sample: kept fraction tracks the target permille per lang") {
    val m = graft.operators.TextAnalysis.mixtureSample(spark, TestSpark.sf)
      .groupBy("lang").agg(
        sum("n_kept").as("kept"), sum("n_docs").as("docs"),
        max("target_permille").as("p"))
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (kept, docs, p) = (r.getLong(1), r.getLong(2), r.getInt(3))
      assert(kept <= docs)
      if (p == 1000) assert(kept == docs) // en keeps everything
      // content-hash buckets are uniform-ish; at spec scale just bound
      // the realized rate loosely around the target
      else assert(math.abs(kept.toDouble / docs - p / 1000.0) < 0.35)
    }
  }

  test("sequence pack: budget respected, every doc packed exactly once") {
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
    val total = docs.count()
    val s = graft.operators.TextAnalysis.sequencePack(spark, TestSpark.sf)
    assert(s.agg(sum("n_docs")).collect()(0).getLong(0) == total)
    // every doc is <=99 tokens (< budget), so each sequence crosses the
    // 512 boundary at most once: seq_tokens in (budget - max_doc,
    // budget + max_doc) except a language's last sequence, and ids are
    // dense from 0 per lang
    import org.apache.spark.sql.expressions.Window
    val lastPerLang = s.withColumn("mx",
      max(col("seq_id")).over(Window.partitionBy(col("lang"))))
    assert(lastPerLang.filter(col("seq_id") =!= col("mx") &&
      (col("seq_tokens") < 512 - 99 || col("seq_tokens") > 512 + 99))
      .count() == 0)
    val dense = s.groupBy("lang").agg(
      min("seq_id").as("mn"), max("seq_id").as("mx"),
      count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(dense.count() == 0)
  }

  test("chunk overlap: coverage, bounds, overlap, and shuffle-free plan") {
    val r = TextAnalysis.chunkOverlap(spark, TestSpark.sf)
      .cache()
    // every document with >=1 token appears, chunk 0 starts at 0
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents").count()
    assert(r.filter(col("chunk_idx") === 0 && col("start") === 0)
      .count() == docs)
    // no chunk exceeds the window; only the final chunk may be short
    assert(r.filter(col("n_chunk_tokens") > 64).count() == 0)
    import org.apache.spark.sql.expressions.{Window => W}
    val notLast = r.withColumn("last",
      col("chunk_idx") === max(col("chunk_idx"))
        .over(W.partitionBy(col("doc_id"))))
      .filter(!col("last"))
    assert(notLast.filter(col("n_chunk_tokens") =!= 64).count() == 0)
    // neighbors share exactly the 16-token overlap: next start = +48
    val gaps = r.groupBy(col("doc_id")).agg(
      countDistinct(col("start")).as("n"),
      max(col("start")).as("mx"))
    assert(gaps.filter(col("mx") =!= (col("n") - 1) * 48).count() == 0)
    // one projection: no exchange anywhere in the plan
    val plan = TextAnalysis.chunkOverlap(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    r.unpersist()
    ()
  }

  test("shard shuffle: permutation properties and one-exchange plan") {
    // plan first — a cached call would plan as InMemoryTableScan
    val plan = TextAnalysis.shardShuffle(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(400))
    assert(!plan.contains("rangepartitioning"),
      "a range sort would be a total-order shuffle")
    val r = TextAnalysis.shardShuffle(spark, TestSpark.sf).cache()
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents").count()
    // a permutation: every doc exactly once
    assert(r.count() == docs)
    assert(r.select("doc_id").distinct().count() == docs)
    // positions within a shard are 1..n with no gaps
    val bad = r.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
    // hash balance: no shard more than 3x the uniform share
    val mx = r.groupBy(col("shard")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(mx <= 3 * docs / 16,
      s"shard skew: max $mx of $docs across 16 shards")
    r.unpersist()
    ()
  }

  test("media features: every format really decoded, shuffle-free") {
    val f = Multimodal.extractFeatures(spark, TestSpark.sf)
    assert(f.count() == 500)
    // dispatch: all four formats through their real parsers — stub
    // fraction 0 — doc_id % 4 assigns 125 each at sf0.001
    val byDecoder = f.groupBy("decoder").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDecoder == Map(
      "real-png" -> 125L, "real-wav" -> 125L, "real-jpeg" -> 125L,
      "real-mp4" -> 125L))
    assert(f.filter(col("thumb_w") > 64 || col("thumb_h") > 64).count() == 0)
    assert(f.filter(col("n_frames") > 4 || col("n_frames") < 1).count() == 0)
    assert(f.filter(col("first_offset") =!= 0L ||
      col("last_offset") < col("first_offset")).count() == 0)
    assert(f.filter(col("mean_byte") < 0 || col("mean_byte") > 255).count() == 0)
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    val a = f.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = Multimodal.extractFeatures(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("wav parser: chunk walking skips unknown chunks, rejects malformed") {
    import graft.operators.Multimodal.{parseWav, synthWav}
    val m = parseWav(5L, synthWav(5L))
    assert(m.channels == 1 && m.bits_per_sample == 8)
    assert(m.sample_rate == 8000 + 5 * 1000)
    assert(m.n_samples == 64 + 5)
    // inject an unknown LIST chunk between fmt and data: a chunk-walking
    // parser must skip it; a fixed-44-byte-offset parser would break
    val wav = synthWav(5L)
    val extra = java.nio.ByteBuffer
      .allocate(wav.length + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 36) // RIFF..fmt chunk end
    extra.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
    extra.put(wav, 36, wav.length - 36)
    // patch the RIFF size for the inserted 12 bytes
    val bytes = extra.array()
    val riffSize = java.nio.ByteBuffer.wrap(bytes, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riffSize.putInt(riffSize.getInt(4) + 12)
    assert(parseWav(5L, bytes) == m)
    intercept[IllegalArgumentException] {
      parseWav(0L, "JUNKJUNKJUNKJUNK".getBytes("US-ASCII"))
    }
    // negative chunk size must RAISE (a backwards seek would loop forever)
    val neg = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    neg.put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("WAVE".getBytes("US-ASCII"))
      .put("XXXX".getBytes("US-ASCII")).putInt(-8)
    intercept[IllegalArgumentException] { parseWav(0L, neg.array()) }
    // truncated data chunk must raise the contract exception too
    intercept[IllegalArgumentException] {
      parseWav(5L, synthWav(5L).dropRight(10))
    }
  }

  test("jpeg parser: marker walk, variable structure, rejects malformed") {
    import graft.operators.Multimodal.{parseJpeg, synthJpeg}
    // id%3==0 drops the COM segment; the walker must handle both shapes
    val noCom = parseJpeg(3L, synthJpeg(3L))
    val withCom = parseJpeg(4L, synthJpeg(4L))
    assert(noCom.n_segments == 3 && withCom.n_segments == 4)
    assert(withCom.width == 16 + 4 && withCom.height == 16 + 4)
    assert(withCom.bit_depth == 8 && withCom.n_components == 3)
    // a standalone RST marker (no length field) must not derail the walk
    val j = synthJpeg(4L)
    val withRst = j.take(2) ++ Array(0xFF.toByte, 0xD0.toByte) ++ j.drop(2)
    assert(parseJpeg(4L, withRst) == withCom)
    // rejects: no SOI; truncation mid-segment; length overrun; no SOF
    intercept[IllegalArgumentException] { parseJpeg(0L, Array[Byte](1, 2, 3, 4)) }
    intercept[IllegalArgumentException] { parseJpeg(4L, j.dropRight(8)) }
    val overrun = j.clone()
    overrun(4) = 0x7F // APP0 length now exceeds the payload
    intercept[IllegalArgumentException] { parseJpeg(4L, overrun) }
    intercept[IllegalArgumentException] {
      parseJpeg(0L, Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte))
    }
  }

  test("mp4 parser: ISO-BMFF box walk, variable structure, rejects malformed") {
    import graft.operators.Multimodal.{parseMp4, synthMp4}
    // id 3: odd → audio trak too; 3%3==0 → no free box; u32 mdat size
    val two = parseMp4(3L, synthMp4(3L))
    assert(two.n_tracks == 2 && two.major_brand == "isom")
    assert(two.width == (3 % 16 + 1) * 64 && two.height == (3 % 9 + 1) * 64)
    assert(two.timescale == 603 && two.duration_ms == 4000L)
    assert(two.n_boxes == 8) // ftyp moov mvhd 2×(trak tkhd) mdat
    // id 10: single track; free box to skip; 64-bit largesize mdat
    val one = parseMp4(10L, synthMp4(10L))
    assert(one.n_tracks == 1 && one.n_boxes == 7)
    assert(one.mdat_bytes == 16 + 10 % 32)
    // size==0 escape: the last box may run to EOF
    val b = synthMp4(7L)
    val m7 = parseMp4(7L, b)
    val mdatOff = b.length - (8 + m7.mdat_bytes.toInt)
    val toEof = b.clone()
    (0 until 4).foreach(i => toEof(mdatOff + i) = 0)
    assert(parseMp4(7L, toEof) == m7)
    // rejects: no ftyp magic; no mvhd; truncation; size overrun
    intercept[IllegalArgumentException] { parseMp4(0L, Array[Byte](1, 2, 3)) }
    val ftypOnly = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("ftypisomXXXX".getBytes("US-ASCII")).array()
    intercept[IllegalArgumentException] { parseMp4(0L, ftypOnly) }
    intercept[IllegalArgumentException] { parseMp4(7L, b.dropRight(5)) }
    val overrun = b.clone(); overrun(0) = 0x7F
    intercept[IllegalArgumentException] { parseMp4(7L, overrun) }
  }

  test("png parser: full decode round-trip, CRC + structure enforced") {
    import graft.operators.Multimodal.{parsePng, synthPng}
    val m = parsePng(17L, synthPng(17L))
    assert(m.width == 4 + 17 % 13 && m.height == 3 + 17 % 7)
    assert(m.bit_depth == 8 && m.color_type == 0)
    assert(m.n_pixels == m.width.toLong * m.height)
    // decoded pixels must equal the synth formula (proves inflate +
    // Sub-filter reconstruction, not just header parsing)
    val expSum = (for {
      y <- 0 until m.height; x <- 0 until m.width
    } yield (7L * x + 31L * y + 17L) % 256).sum
    assert(m.pix_sum == expSum)

    val png = synthPng(17L)
    // ancillary chunk between IHDR and IDAT is skipped (CRC still checked)
    val ihdrEnd = 8 + 12 + 13
    val text = {
      val data = "graft".getBytes("US-ASCII")
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put("tEXt".getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt).array()
    }
    val withAncillary = java.nio.ByteBuffer
      .allocate(png.length + text.length)
      .put(png, 0, ihdrEnd).put(text)
      .put(png, ihdrEnd, png.length - ihdrEnd).array()
    assert(parsePng(17L, withAncillary) == m)

    // single corrupted payload byte → CRC mismatch, must raise
    val corrupt = png.clone()
    corrupt(ihdrEnd + 20) = (corrupt(ihdrEnd + 20) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] { parsePng(17L, corrupt) }
    assert(e.getMessage.contains("CRC"))

    // not a PNG; truncated tail; trailing garbage after IEND
    intercept[IllegalArgumentException] {
      parsePng(0L, "definitely not a png".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { parsePng(17L, png.dropRight(6)) }
    intercept[IllegalArgumentException] { parsePng(17L, png :+ 0x00.toByte) }

    // oversized declared chunk length must raise, not read past the buffer
    val oversize = png.clone()
    java.nio.ByteBuffer.wrap(oversize, 8, 4).putInt(1 << 20)
    intercept[IllegalArgumentException] { parsePng(17L, oversize) }
  }

  test("media table: payload is a real binary column matching text bytes") {
    val m = Multimodal.mediaTable(spark, TestSpark.sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.select(col("payload"), col("n_bytes")).head()
    assert(row.getAs[Array[Byte]](0).length == row.getLong(1))
  }
}
