package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Multimodal-column plumbing for LLM training-data pipelines
  * (BASELINE.json north star): media as opaque `binary` columns with typed
  * metadata, and decode / feature-extract / resize / frame-sample stages as
  * per-partition batch transforms.
  *
  * The registered feature stage dispatches through [[RealDecoder]], and
  * every format gets a REAL JDK-only parse — zero stub rows remain:
  * [[parseWav]] chunk-walks RIFF/WAVE PCM (h3), [[parsePng]] fully
  * decodes grayscale PNGs including CRC verification, zlib inflate and
  * scanline unfiltering (h4), [[parseJpeg]] walks the marker stream
  * (h5), and [[parseMp4]] walks the ISO-BMFF box tree (h6).
  * [[FakeDecoder]] remains only as the documented deployment seam for
  * binding a native codec library behind [[DecodeBackend]]. Everything
  * Spark-side is real and tested: the binary+struct schema, the typed
  * `Dataset[MediaRow]` encoder, the `mapPartitions` batch shape (one
  * backend instance per partition, streaming iterator — the Scala analog
  * of PySpark's `mapInPandas` batching), and the partitioning contract
  * (narrow transform, no shuffle; scale comes from input splits). All
  * oracle-checked.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the schema a real pipeline
    * would carry for images/audio/video). */
  final case class MediaRow(
      doc_id: Long, format: String, width: Int, height: Int,
      n_bytes: Long, payload: Array[Byte])

  /** Decoded features per media item. `decoder` audits which backend
    * produced the row — "real-wav"/"real-png" for the JDK-only parsers,
    * "stub" for formats with no in-container codec — so the stub
    * fraction of any pipeline run is a one-line groupBy. */
  final case class MediaFeatures(
      doc_id: Long, format: String, mean_byte: Double,
      frame_offsets: Seq[Long], thumb_w: Int, thumb_h: Int,
      decoder: String)

  /** The codec seam. A real deployment binds an image/audio library here
    * (one instance per partition — expensive native init amortizes across
    * the batch). The container ships no codecs, so [[FakeDecoder]] stands
    * in deterministically. */
  trait DecodeBackend extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic stand-in for the absent codec libraries: "decodes" the
    * payload as byte statistics, "frame-samples" at fixed stride, and
    * "resizes" by halving until <= 64px. Replace with a real codec-backed
    * DecodeBackend in deployment. */
  object FakeDecoder extends DecodeBackend {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.payload
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / bytes.length
      val stride = math.max(1L, row.n_bytes / 4)
      val offsets = (0L until row.n_bytes by stride).take(4).toSeq
      var (w, h) = (row.width, row.height)
      while (w > 64 || h > 64) { w /= 2; h /= 2 }
      MediaFeatures(row.doc_id, row.format, mean, offsets, w, h, "stub")
    }
  }

  /** Production dispatch for the codec seam — every format has a
    * JDK-only REAL parse: wav through [[parseWav]] (features from
    * decoded PCM samples), png through [[parsePng]] (features from
    * decoded, unfiltered pixels), jpeg through [[parseJpeg]] (features
    * from the marker stream: the quantization-table mean is the classic
    * no-decode JPEG quality signal, segments stand in for frames), mp4
    * through [[parseMp4]] (features from the decoded mdat byte stream;
    * thumbs from the tkhd presentation size). The per-row `decoder`
    * column keeps the stub fraction auditable — now 0%. */
  object RealDecoder extends DecodeBackend {
    def decode(row: MediaRow): MediaFeatures = row.format match {
      case "wav" =>
        val m = parseWav(row.doc_id, row.payload)
        val stride = math.max(1L, m.n_samples / 4)
        val offsets = (0L until m.n_samples by stride).take(4).toSeq
        MediaFeatures(row.doc_id, row.format,
          m.sample_sum.toDouble / m.n_samples, offsets, 0, 0, "real-wav")
      case "png" =>
        val m = parsePng(row.doc_id, row.payload)
        // frames = strided scanline start offsets into the decoded raster
        val stride = math.max(1L, m.height.toLong / 4)
        val offsets = (0L until m.height.toLong by stride).take(4)
          .map(_ * m.width).toSeq
        var (w, h) = (m.width, m.height)
        while (w > 64 || h > 64) { w /= 2; h /= 2 }
        MediaFeatures(row.doc_id, row.format,
          m.pix_sum.toDouble / m.n_pixels, offsets, w, h, "real-png")
      case "jpeg" =>
        val m = parseJpeg(row.doc_id, row.payload)
        val stride = math.max(1L, m.n_segments / 4)
        val offsets = (0L until m.n_segments by stride).take(4).toSeq
        var (w, h) = (m.width, m.height)
        while (w > 64 || h > 64) { w /= 2; h /= 2 }
        MediaFeatures(row.doc_id, row.format,
          m.qtable_sum.toDouble / 64.0, offsets, w, h, "real-jpeg")
      case "mp4" =>
        val m = parseMp4(row.doc_id, row.payload)
        // frames = strided offsets into the decoded mdat byte stream
        val stride = math.max(1L, m.mdat_bytes / 4)
        val offsets = (0L until m.mdat_bytes by stride).take(4).toSeq
        var (w, h) = (m.width, m.height)
        while (w > 64 || h > 64) { w /= 2; h /= 2 }
        MediaFeatures(row.doc_id, row.format,
          m.mdat_sum.toDouble / m.mdat_bytes, offsets, w, h, "real-mp4")
      case _ => FakeDecoder.decode(row)
    }
  }

  /** Synthesize the media table from `documents`: payload = UTF-8 bytes of
    * the text (deterministic fake), metadata derived arithmetically. This
    * is the ingest shape — binary column + typed metadata struct. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          (col("doc_id") % 4 + 1).cast("int")).as("format"),
        ((col("doc_id") % 16 + 1) * 64).cast("int").as("width"),
        ((col("doc_id") % 9 + 1) * 64).cast("int").as("height"),
        // byte length of the payload, not character count — they differ
        // for multi-byte text
        octet_length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Metadata projection (oracle-checked): everything except the decode. */
  def mediaMetadata(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).drop("payload")

  /** Payload-TRUE media table for the feature stage: every row carries a
    * real synthesized payload ([[synthWav]]/[[synthPng]]/[[synthJpeg]]/
    * [[synthMp4]] — valid byte streams any tool could parse). Metadata
    * mirrors the payload where the format defines it (png/jpeg/mp4 dims;
    * wav has none, 0×0). [[mediaTable]] stays the ingest MANIFEST shape
    * (h1): claimed metadata before any payload is opened — the usual
    * split in a real media pipeline. */
  def realMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val fmt = Seq("png", "jpeg", "wav", "mp4")((id % 4).toInt)
        val payload = fmt match {
          case "wav" => synthWav(id)
          case "png" => synthPng(id)
          case "jpeg" => synthJpeg(id)
          case _ => synthMp4(id)
        }
        val (w, h) = fmt match {
          case "png" => (4 + (id % 13).toInt, 3 + (id % 7).toInt)
          case "jpeg" => (16 + (id % 240).toInt, 16 + (id % 120).toInt)
          case "wav" => (0, 0)
          case _ => (((id % 16) + 1).toInt * 64, ((id % 9) + 1).toInt * 64)
        }
        MediaRow(id, fmt, w, h, payload.length.toLong, payload)
      }
  }

  /** The decode/feature stage: per-partition batch transform through the
    * backend seam. Narrow (no shuffle); each task streams its partition
    * through one backend instance.
    *
    * The driver-facing frame flattens `frame_offsets` to scalar columns
    * (`n_frames`, `first_offset`, `last_offset`): array columns are
    * unhashable in the driver's pandas harness (round-1 h2 crash), and
    * FakeDecoder's strided offsets are fully determined by those three
    * scalars anyway. [[extractFeaturesRaw]] keeps the full array for
    * downstream consumers. */
  def extractFeaturesRaw(spark: SparkSession, sfDir: String,
      backend: DecodeBackend = RealDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media: Dataset[MediaRow] = realMediaTable(spark, sfDir)
    media.mapPartitions { it: Iterator[MediaRow] =>
      // one backend per partition: codec init cost amortizes over the batch
      val b = backend
      it.map(b.decode)
    }
  }

  def extractFeatures(spark: SparkSession, sfDir: String,
      backend: DecodeBackend = RealDecoder): DataFrame =
    extractFeaturesRaw(spark, sfDir, backend).toDF()
      .select(col("doc_id"), col("format"),
        round(col("mean_byte"), 6).as("mean_byte"),
        size(col("frame_offsets")).as("n_frames"),
        element_at(col("frame_offsets"), 1).as("first_offset"),
        element_at(col("frame_offsets"), -1).as("last_offset"),
        col("thumb_w"), col("thumb_h"), col("decoder"))

  // ------------------------------------------------------------------ WAV

  /** REAL binary decode, no codec library needed: canonical RIFF/WAVE
    * PCM is pure byte arithmetic, so this corner of the multimodal
    * pipeline runs an actual format parser end-to-end — synthesize a
    * valid WAV per document (deterministic: every field derives from
    * doc_id), then parse it back through the same mapPartitions seam the
    * stubbed decoder uses. The parser is not a toy: it validates the
    * RIFF/WAVE magic and WALKS the chunk list (skipping unknown chunks,
    * honoring the word-aligned padding rule) rather than assuming the
    * canonical 44-byte layout. */
  final case class WavMeta(
      doc_id: Long, channels: Int, sample_rate: Int, bits_per_sample: Int,
      n_samples: Long, peak: Int, sample_sum: Long)

  /** 8-bit mono PCM: rate = 8000 + (doc_id%8)·1000, n = 64 + (doc_id%128)
    * samples, sample(i) = (7i + doc_id) mod 256. */
  private[graft] def synthWav(docId: Long): Array[Byte] = {
    val rate = 8000 + (docId % 8).toInt * 1000
    val n = 64 + (docId % 128).toInt
    val pad = n & 1 // RIFF chunks are word-aligned: pad odd data sizes
    val bb = java.nio.ByteBuffer.allocate(44 + n + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n + pad)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate) // byte rate = rate (8-bit mono)
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) { bb.put(((7L * i + docId) % 256).toByte); i += 1 }
    bb.array() // allocate() zero-fills, so the pad byte (if any) is 0
  }

  /** Chunk-walking RIFF parser. Throws on malformed input — a real
    * pipeline routes failures to a quarantine, not to silent nulls. */
  private[graft] def parseWav(docId: Long, bytes: Array[Byte]): WavMeta = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", "not a RIFF file")
    bb.getInt // riff size
    require(ascii(4) == "WAVE", "not a WAVE file")
    var channels, rate, bits = -1
    var nSamples = -1L
    var peak = 0
    var sum = 0L
    while (bb.remaining() >= 8) {
      val id = ascii(4)
      val size = bb.getInt
      // malformed sizes must RAISE, not hang or underflow: a negative
      // size would seek backwards (infinite loop), an oversized one past
      // the buffer
      require(size >= 0 && size <= bb.remaining(),
        s"chunk '$id' declares $size bytes, ${bb.remaining()} remain")
      // chunks are word-aligned; clamp for writers that omit the final pad
      val next = math.min(bb.position() + size + (size & 1), bb.limit())
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          require(bb.getShort() == 1, "not PCM")
          channels = bb.getShort()
          rate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          bits = bb.getShort()
        case "data" =>
          require(channels > 0 && bits == 8, "fmt must precede 8-bit data")
          nSamples = size.toLong / channels
          var i = 0
          while (i < size) {
            val s = bb.get() & 0xFF
            peak = math.max(peak, s)
            sum += s
            i += 1
          }
        case _ => // skip unknown chunk
      }
      bb.position(next)
    }
    require(nSamples >= 0, "no data chunk")
    WavMeta(docId, channels, rate, bits, nSamples, peak, sum)
  }

  /** The h3 query: synthesize → REALLY parse. Plain `map` — unlike
    * [[extractFeatures]] there is no per-partition codec init to
    * amortize, so the simpler narrow transform is the honest shape. */
  def wavDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => parseWav(id, synthWav(id)))
      .toDF()
      .withColumn("duration_ms",
        round(col("n_samples").cast("double") * 1000.0 /
          col("sample_rate").cast("double"), 6))
  }

  // ------------------------------------------------------------------ PNG

  /** Second REAL binary decode: PNG needs no codec library either — the
    * container's JDK ships zlib (`java.util.zip.Deflater`/`Inflater`) and
    * CRC32, which is everything the format requires for grayscale. The
    * synthesized images are REAL PNGs (signature, CRC-carrying chunks,
    * zlib-compressed filtered scanlines — any image viewer would open
    * them), and the parser is a full decoder: it verifies the 8-byte
    * signature, walks the chunk list CHECKING EACH CRC32, parses IHDR,
    * concatenates multi-chunk IDAT, inflates, and UNFILTERS scanlines
    * (None/Sub/Up). Pixel stats come from decoded pixels, so the query is
    * green only if compression, checksums, and filtering all round-trip. */
  final case class PngMeta(
      doc_id: Long, width: Int, height: Int, bit_depth: Int,
      color_type: Int, n_pixels: Long, pix_sum: Long, peak: Int)

  /** Deterministic grayscale-8 image: w = 4 + doc_id%13, h = 3 + doc_id%7,
    * pixel(x,y) = (7x + 31y + doc_id) mod 256. Scanline filters alternate
    * None (even rows) and Sub (odd rows) so the parser's unfiltering is
    * actually exercised; IDAT is split into two chunks so concatenation
    * is too. */
  private[graft] def synthPng(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 13).toInt
    val h = 3 + (docId % 7).toInt
    def pix(x: Int, y: Int): Int = ((7L * x + 31L * y + docId) % 256).toInt

    // raw scanlines: 1 filter byte + w pixel bytes per row
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      val base = y * (1 + w)
      val filter = y & 1 // 0 = None, 1 = Sub
      raw(base) = filter.toByte
      var x = 0
      while (x < w) {
        val v = pix(x, y)
        raw(base + 1 + x) =
          (if (filter == 1) v - (if (x == 0) 0 else pix(x - 1, y)) else v).toByte
        x += 1
      }
      y += 1
    }

    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = deflater.deflate(zbuf)
    require(deflater.finished(), "deflate buffer undersized")
    deflater.`end`()
    val idat = java.util.Arrays.copyOf(zbuf, zlen)

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }

    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val split = idat.length / 2 // two IDAT chunks: parser must concatenate
    java.nio.ByteBuffer
      .allocate(8 + 12 + 13 + 2 * 12 + idat.length + 12)
      .put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      .put(chunk("IHDR", ihdr))
      .put(chunk("IDAT", java.util.Arrays.copyOfRange(idat, 0, split)))
      .put(chunk("IDAT", java.util.Arrays.copyOfRange(idat, split, idat.length)))
      .put(chunk("IEND", Array.emptyByteArray))
      .array()
  }

  /** Full PNG decode for grayscale-8 (the synth profile; depth/color
    * combinations outside it are rejected, not mis-decoded). Throws on any
    * malformation — bad signature, CRC mismatch, truncated or misdeclared
    * chunk, unknown filter, inflated-size mismatch — same quarantine
    * philosophy as [[parseWav]]. */
  private[graft] def parsePng(docId: Long, bytes: Array[Byte]): PngMeta = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // PNG ints are big-endian
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    require(bytes.length >= 8 &&
      java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, 8), sig),
      "not a PNG signature")
    bb.position(8)

    var w, h, depth, color = -1
    val idat = new java.io.ByteArrayOutputStream()
    var seenIhdr = false
    var seenIend = false
    while (!seenIend) {
      require(bb.remaining() >= 12, "truncated chunk header")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining() - 8,
        s"chunk declares $len bytes, ${bb.remaining() - 8} remain")
      val typeAndData = new Array[Byte](4 + len)
      bb.get(typeAndData)
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      val stored = bb.getInt & 0xFFFFFFFFL
      require(crc.getValue == stored,
        s"CRC mismatch in chunk ${new String(typeAndData, 0, 4, "US-ASCII")}")
      val typ = new String(typeAndData, 0, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(len == 13, s"IHDR length $len")
          val ib = java.nio.ByteBuffer.wrap(typeAndData, 4, 13)
          w = ib.getInt; h = ib.getInt
          depth = ib.get() & 0xFF; color = ib.get() & 0xFF
          require(w > 0 && h > 0, "non-positive dimensions")
          require(depth == 8 && color == 0,
            s"unsupported depth/color $depth/$color (grayscale-8 only)")
          require((ib.get() | ib.get() | ib.get()) == 0,
            "nonzero compression/filter/interlace method")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(typeAndData, 4, len)
        case "IEND" =>
          require(len == 0, "IEND carries data")
          seenIend = true
        case _ => // ancillary chunk: CRC checked above, content skipped
      }
    }
    require(bb.remaining() == 0, "trailing bytes after IEND")

    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    val got = inflater.inflate(raw)
    require(got == raw.length && inflater.finished(),
      s"inflated $got bytes, expected ${raw.length}")
    inflater.`end`()

    // unfilter in place (prev scanline is already reconstructed)
    var sum = 0L
    var peak = 0
    var y = 0
    while (y < h) {
      val base = y * (1 + w)
      val filter = raw(base) & 0xFF
      var x = 0
      while (x < w) {
        val i = base + 1 + x
        val recon = filter match {
          case 0 => raw(i) & 0xFF
          case 1 => (raw(i) + (if (x == 0) 0 else raw(i - 1) & 0xFF)) & 0xFF
          case 2 => (raw(i) +
            (if (y == 0) 0 else raw(i - (1 + w)) & 0xFF)) & 0xFF
          case f => throw new IllegalArgumentException(
            s"unsupported scanline filter $f")
        }
        raw(i) = recon.toByte
        sum += recon
        if (recon > peak) peak = recon
        x += 1
      }
      y += 1
    }
    PngMeta(docId, w, h, depth, color, w.toLong * h, sum, peak)
  }

  /** The h4 query: synthesize real PNGs → really decode them. */
  def pngDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => parsePng(id, synthPng(id)))
      .toDF()
      .withColumn("mean_pixel",
        round(col("pix_sum").cast("double") /
          col("n_pixels").cast("double"), 6))
  }

  // ----------------------------------------------------------------- JPEG

  /** REAL binary parse #3 — the JPEG MARKER STREAM (ITU T.81 syntax):
    * entropy-coded image data needs a codec, but the container metadata
    * every media pipeline actually triages on (dimensions, precision,
    * component count) lives in plain marker segments. The parser walks
    * the marker list the way the spec defines it — SOI, then FF-prefixed
    * segments with big-endian u16 lengths, standalone markers (TEM,
    * RSTn) length-free, frame geometry from any SOF0-SOF3 header — and
    * rejects truncation, overruns, and frameless streams. Synthesized
    * payloads are structurally valid JPEG header streams (a real decoder
    * would accept them up to the missing scan). */
  final case class JpegMeta(
      doc_id: Long, width: Int, height: Int, bit_depth: Int,
      n_components: Int, n_segments: Long, qtable_sum: Long)

  /** Valid JPEG header stream, every field arithmetic in doc_id:
    * w = 16+(id%240), h = 16+(id%120); a COM segment appears iff
    * id%3 != 0 (variable structure the walker must skip); DQT entries
    * q(i) = (i+id)%255 + 1; SOF0 = 8-bit, 3 components. */
  private[graft] def synthJpeg(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 240).toInt
    val h = 16 + (docId % 120).toInt
    val hasCom = docId % 3 != 0
    val comLen = 4 + (docId % 16).toInt
    val out = new java.io.ByteArrayOutputStream()
    def u8(x: Int): Unit = out.write(x & 0xFF)
    def u16(x: Int): Unit = { u8(x >> 8); u8(x) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    marker(0xE0) // APP0/JFIF
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    if (hasCom) {
      marker(0xFE); u16(comLen + 2)
      (0 until comLen).foreach(j => u8(((docId + j) % 256).toInt))
    }
    marker(0xDB) // DQT: one 8-bit table
    u16(67); u8(0)
    (0 until 64).foreach(i => u8(((i + docId) % 255 + 1).toInt))
    marker(0xC0) // SOF0 baseline
    u16(8 + 3 * 3); u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(0x22); u8(0) // Y  2x2 sampling
    u8(2); u8(0x11); u8(0) // Cb
    u8(3); u8(0x11); u8(0) // Cr
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Marker-stream walk; throws on anything structurally wrong. */
  private[graft] def parseJpeg(docId: Long, bytes: Array[Byte]): JpegMeta = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8)
      fail("not a JPEG (missing SOI)")
    var i = 2
    var (segs, qsum) = (0L, 0L)
    var (width, height, depth, ncomp) = (-1, -1, -1, -1)
    var done = false
    while (!done) {
      if (i + 1 >= bytes.length) fail("truncated before EOI")
      if (u8(i) != 0xFF) fail(s"expected marker at offset $i")
      val m = u8(i + 1)
      i += 2
      if (m == 0xD9) done = true // EOI
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) () // TEM/RSTn
      else {
        if (i + 1 >= bytes.length) fail("truncated segment length")
        val len = u16(i)
        if (len < 2 || i + len > bytes.length) fail("segment overrun")
        segs += 1
        if (m >= 0xC0 && m <= 0xC3) { // SOF0-SOF3 frame header
          depth = u8(i + 2); height = u16(i + 3)
          width = u16(i + 5); ncomp = u8(i + 7)
        } else if (m == 0xDB) { // sum the 8-bit table entries
          var j = i + 3
          while (j < i + len) { qsum += u8(j); j += 1 }
        }
        i += len
      }
    }
    if (width < 0) fail("no SOF frame header")
    JpegMeta(docId, width, height, depth, ncomp, segs, qsum)
  }

  /** h5 — synthesize + parse back one JPEG header stream per document. */
  def jpegDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => parseJpeg(id, synthJpeg(id)))
      .toDF()
      .withColumn("aspect",
        round(col("width").cast("double") / col("height"), 6))
  }

  // ----------------------------------------------------------------- MP4

  final case class Mp4Meta(
      doc_id: Long, major_brand: String, timescale: Long, duration_ms: Long,
      n_tracks: Int, width: Int, height: Int, n_boxes: Long,
      mdat_bytes: Long, mdat_sum: Long)

  /** Valid ISO-BMFF (MPEG-4 Part 12) box stream, every field arithmetic
    * in doc_id: ftyp(isom) · [free iff id%3≠0 — variable structure the
    * walker must skip] · moov( mvhd(timescale=600+id%1000,
    * duration=timescale·(1+id%60)) · trak(tkhd 16.16 dims = the h1
    * manifest's (id%16+1)·64 × (id%9+1)·64) · [audio trak iff id%2=1] )
    * · mdat(16+id%32 bytes, 64-bit largesize form iff id%5=0 — the
    * size==1 escape real muxers emit past 4 GiB). */
  private[graft] def synthMp4(docId: Long): Array[Byte] = {
    val w = ((docId % 16) + 1).toInt * 64
    val h = ((docId % 9) + 1).toInt * 64
    val timescale = 600L + (docId % 1000)
    val duration = timescale * (1 + (docId % 60))
    val nMdat = 16 + (docId % 32).toInt
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
        .put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def full(body: java.nio.ByteBuffer => Unit, size: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(size); body(bb); bb.array()
    }
    val unityMatrix = Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val mvhd = box("mvhd", full({ bb =>
      bb.putInt(0)               // version 0 + flags
        .putInt(0).putInt(0)     // ctime, mtime
        .putInt(timescale.toInt).putInt(duration.toInt)
        .putInt(0x00010000)      // rate 1.0
        .putShort(0x0100.toShort)// volume 1.0
        .putShort(0).putInt(0).putInt(0) // reserved
      unityMatrix.foreach(bb.putInt)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(3)               // next_track_ID
    }, 100))
    def tkhd(trackId: Int, tw: Int, th: Int, audio: Boolean) =
      box("tkhd", full({ bb =>
        bb.putInt(7)             // version 0 + flags: enabled|in-movie
          .putInt(0).putInt(0)   // ctime, mtime
          .putInt(trackId).putInt(0)
          .putInt(duration.toInt)
          .putInt(0).putInt(0)   // reserved
          .putShort(0).putShort(0) // layer, alternate_group
          .putShort(if (audio) 0x0100.toShort else 0).putShort(0)
        unityMatrix.foreach(bb.putInt)
        bb.putInt(tw << 16).putInt(th << 16) // 16.16 fixed point
      }, 84))
    val traks = Seq(box("trak", tkhd(1, w, h, audio = false))) ++
      (if (docId % 2 == 1) Seq(box("trak", tkhd(2, 0, 0, audio = true)))
       else Seq.empty)
    val moov = box("moov", mvhd ++ traks.flatten)
    val ftyp = box("ftyp", full({ bb =>
      bb.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
    }, 16))
    val free =
      if (docId % 3 != 0)
        box("free", Array.tabulate(8 + (docId % 16).toInt)(j =>
          ((docId + j) % 251).toByte))
      else Array.emptyByteArray
    val mdatPayload = Array.tabulate(nMdat)(j => ((docId + j) % 256).toByte)
    val mdat =
      if (docId % 5 == 0) full({ bb => // 64-bit largesize form
        bb.putInt(1).put("mdat".getBytes("US-ASCII"))
          .putLong(16L + nMdat).put(mdatPayload)
      }, 16 + nMdat)
      else box("mdat", mdatPayload)
    ftyp ++ free ++ moov ++ mdat
  }

  /** ISO-BMFF box walk (the same shape as [[parseJpeg]]'s marker walk):
    * u32 size + 4cc type, size==1 → 64-bit largesize, size==0 → box runs
    * to EOF; container boxes (moov/trak/mdia/minf/stbl/edts) recurse.
    * Extracts the movie header (timescale/duration), per-track tkhd dims
    * (the video track's are the presentation size), and decodes mdat's
    * byte stream into count+sum. Throws on anything structurally wrong —
    * quarantine, not silent nulls. */
  private[graft] def parseMp4(docId: Long, bytes: Array[Byte]): Mp4Meta = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"doc $docId: $msg")
    def u8(i: Long): Int = bytes(i.toInt) & 0xFF
    def u32(i: Long): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def cc4(i: Long): String =
      new String(bytes, i.toInt, 4, "US-ASCII")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var (width, height) = (0, 0)
    var boxes = 0L
    var (mdatBytes, mdatSum) = (0L, 0L)
    def walk(start: Long, end: Long): Unit = {
      var i = start
      while (i < end) {
        if (i + 8 > end) fail(s"truncated box header at offset $i")
        var size = u32(i)
        var hdr = 8L
        val tpe = cc4(i + 4)
        if (size == 1) {
          if (i + 16 > end) fail("truncated largesize header")
          size = u64(i + 8); hdr = 16
        } else if (size == 0) size = end - i // last box runs to EOF
        if (size < hdr || i + size > end)
          fail(s"box $tpe overruns (size $size at offset $i)")
        boxes += 1
        tpe match {
          case "ftyp" =>
            if (size < hdr + 8) fail("ftyp too short")
            brand = cc4(i + hdr)
          case "mvhd" =>
            val v = u8(i + hdr)
            if (v == 0) {
              timescale = u32(i + hdr + 12); duration = u32(i + hdr + 16)
            } else { // version 1: 64-bit times
              timescale = u32(i + hdr + 20); duration = u64(i + hdr + 24)
            }
          case "tkhd" =>
            nTracks += 1
            val v = u8(i + hdr)
            val off = i + hdr + (if (v == 0) 76L else 88L)
            val (tw, th) = ((u32(off) >> 16).toInt, (u32(off + 4) >> 16).toInt)
            if (tw > 0 && th > 0) { width = tw; height = th }
          case "mdat" =>
            var j = i + hdr
            while (j < i + size) { mdatSum += u8(j); mdatBytes += 1; j += 1 }
          case t if containers(t) => walk(i + hdr, i + size)
          case _ => ()
        }
        i += size
      }
    }
    if (bytes.length < 8 || cc4(4) != "ftyp") fail("not ISO-BMFF (no ftyp)")
    walk(0, bytes.length.toLong)
    if (timescale <= 0) fail("no mvhd movie header")
    if (nTracks == 0) fail("no tracks")
    Mp4Meta(docId, brand, timescale, duration * 1000L / timescale,
      nTracks, width, height, boxes, mdatBytes, mdatSum)
  }

  /** h6 — synthesize + parse back one ISO-BMFF stream per document. */
  def mp4Decode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.testTable(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => parseMp4(id, synthMp4(id)))
      .toDF()
      .withColumn("aspect",
        round(col("width").cast("double") / col("height"), 6))
  }
}
