package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata structs, processed per-partition in batches (the Scala analog of
  * pandas-batched UDFs: one iterator pass per partition, no per-row JVM
  * boundary crossing).
  *
  * Image metadata decode is REAL and codec-free: PNG / GIF / BMP / JPEG
  * store their dimensions in plain header bytes, so `decodeImageMeta`
  * parses width/height/channels directly from the payload — no imaging
  * library involved. Payloads in none of those formats fall back to a
  * deterministic pseudo-decode tagged `format = "fake"` (kept so text-bytes
  * stand-ins still flow through the pipeline shape); full pixel decode /
  * resample would slot into the same mapPartitions seam with a codec lib.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach an opaque binary payload column (here: utf-8 bytes of a text
    * column, standing in for image/audio bytes read from object storage). */
  def withPayload(df: DataFrame, sourceCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(sourceCol).cast("binary"))

  // ------------------------------------------------------------ header parse

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def startsWith(b: Array[Byte], magic: Int*): Boolean =
    b.length >= magic.length && magic.indices.forall(i => u8(b, i) == magic(i))

  // byte WRITERS for the synthetic fixture builders
  private def be32b(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
    (v >>> 8).toByte, v.toByte)
  private def le32b(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
    (v >>> 16).toByte, (v >>> 24).toByte)
  private def be16b(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def le16b(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

  /** Parse (width, height, channels, format) from real image header bytes.
    * Supports PNG (IHDR), GIF (logical screen descriptor), BMP (BITMAPINFO),
    * JPEG (SOF marker scan). None when the payload is not a recognized
    * image. Pure function over the leading bytes — safe to call per row. */
  def imageHeader(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (b == null) None
    // PNG: 8-byte signature, then IHDR chunk: len(4) "IHDR" W(4 BE) H(4 BE)
    // bitdepth(1) colortype(1); channels from the color type
    else if (startsWith(b, 0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        && b.length >= 26 && new String(b, 12, 4, "US-ASCII") == "IHDR") {
      val channels = u8(b, 25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => 0
      }
      Some((be32(b, 16), be32(b, 20), channels, "png"))
    }
    // GIF87a/GIF89a: screen width/height LE16 at offsets 6/8; palette RGB
    else if (b.length >= 10 && (startsWith(b, 'G', 'I', 'F', '8', '7', 'a')
        || startsWith(b, 'G', 'I', 'F', '8', '9', 'a')))
      Some((le16(b, 6), le16(b, 8), 3, "gif"))
    // BMP: "BM", BITMAPINFOHEADER width LE32@18, height LE32@22 (signed —
    // negative means top-down), bits-per-pixel LE16@28
    else if (b.length >= 30 && startsWith(b, 'B', 'M'))
      Some((le32(b, 18), math.abs(le32(b, 22)), math.max(1, le16(b, 28) / 8), "bmp"))
    // JPEG: FFD8, then scan segment markers for a start-of-frame (C0–CF
    // minus DHT C4 / JPG C8 / DAC CC): height BE16@+5, width BE16@+7,
    // component count @+9
    else if (b.length >= 4 && startsWith(b, 0xFF, 0xD8)) {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xFF) {
        val marker = u8(b, i + 1)
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 < b.length)
            return Some((be16(b, i + 7), be16(b, i + 5), u8(b, i + 9), "jpeg"))
          return None
        }
        // standalone markers (RSTn, TEM) carry no length field
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
        else i += 2 + be16(b, i + 2)
      }
      None
    } else None
  }

  val audioMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Parse (sampleRate, channels, bitsPerSample, nSamples, format) from a
    * real RIFF/WAVE header by walking its chunks (fmt + data; unknown
    * chunks skipped, word-aligned). None when the payload is not a WAV.
    * Codec-free like [[imageHeader]]: everything needed lives in plain
    * header bytes. */
  def audioHeader(b: Array[Byte]): Option[(Int, Int, Int, Long, String)] = {
    if (b == null || b.length < 20) None
    else if (!(startsWith(b, 'R', 'I', 'F', 'F') && b.length >= 12 &&
        new String(b, 8, 4, "US-ASCII") == "WAVE")) None
    else {
      // Long cursor: a hostile chunk size must neither overflow Int (index
      // exception) nor stall the walk — corrupt payloads yield None, never
      // a hung or failed task
      var i = 12L
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var dataSize = -1L
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val p = i.toInt
        val id = new String(b, p, 4, "US-ASCII")
        val sz = le32(b, p + 4).toLong & 0xFFFFFFFFL
        // fmt must DECLARE the 16 PCM bytes we read — buffer bounds alone
        // would let a truncated fmt chunk read the next chunk's header
        if (id == "fmt " && sz >= 16 && p + 24 <= b.length)
          fmt = Some((le16(b, p + 10), le32(b, p + 12), le16(b, p + 22)))
        else if (id == "data") dataSize = sz
        i += 8L + sz + (sz & 1L) // chunks are word-aligned; always advances
      }
      fmt.flatMap { case (ch, rate, bits) =>
        val blockAlign = ch.toLong * bits / 8
        if (dataSize < 0 || ch <= 0 || bits <= 0 || blockAlign == 0) None
        else Some((rate, ch, bits, dataSize / blockAlign, "wav"))
      }
    }
  }

  /** Shared per-partition batched decode plumbing: payload binary ->
    * nullable metadata struct via `parse`. mapPartitions so a full codec
    * would amortize its init once per partition (the mapInPandas-shaped
    * contract); null payloads yield null meta. */
  private def decodeMeta(df: DataFrame, payloadCol: String, metaCol: String,
      metaType: StructType)(parse: Array[Byte] => Row): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(metaCol, metaType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition init would go here (codec contexts, model handles, ...)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else parse(bytes)))
      }
    }
  }

  /** Batched audio-metadata decode; null meta for non-WAV payloads. */
  def decodeAudioMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "audio_meta"): DataFrame =
    decodeMeta(df, payloadCol, metaCol, audioMetaType)(bytes =>
      audioHeader(bytes)
        .map { case (sr, ch, bits, n, f) => Row(sr, ch, bits, n, f) }.orNull)

  val pcmStatsType: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** FULL sample decode for 16-bit PCM mono WAV (the audio analog of
    * [[pngPixelStats]]): walk to the data chunk and fold every sample into
    * exact integer sums; mean and RMS come from ONE double division (plus
    * one sqrt) at the end, so the stats hash identically on any engine
    * that sums the same integers. Strictness over guessing: non-PCM,
    * multi-channel, non-16-bit, truncated-data, or empty payloads yield
    * None — tagged undecodable, same policy as every decode here. */
  def wavPcm16Stats(b: Array[Byte]): Option[(Long, Double, Double)] =
    wavPcm16Data(b).map { case (dataOff, n) =>
      var sum = 0L
      var sumSq = 0L
      var j = 0L
      while (j < n) {
        val p = (dataOff + 2 * j).toInt
        val v = (((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)).toShort.toLong
        sum += v; sumSq += v * v
        j += 1
      }
      (n, sum.toDouble / n, math.sqrt(sumSq.toDouble / n))
    }

  /** The shared PCM16 chunk-walk behind [[wavPcm16Stats]] and
    * [[wavPcm16Decimate]]: `(dataOffset, nSamples)` for mono 16-bit PCM
    * WAVs, None otherwise (same support envelope as before). */
  private def wavPcm16Data(b: Array[Byte]): Option[(Long, Long)] = {
    if (b == null || b.length < 20) None
    else if (!(startsWith(b, 'R', 'I', 'F', 'F') && b.length >= 12 &&
        new String(b, 8, 4, "US-ASCII") == "WAVE")) None
    else {
      var i = 12L
      var fmtOk = false
      var dataOff = -1L
      var dataSize = -1L
      while (i + 8 <= b.length && (!fmtOk || dataOff < 0)) {
        val p = i.toInt
        val id = new String(b, p, 4, "US-ASCII")
        val sz = le32(b, p + 4).toLong & 0xFFFFFFFFL
        if (id == "fmt " && sz >= 16 && p + 24 <= b.length)
          // PCM (audioFormat 1), mono, 16-bit — everything else is None
          fmtOk = le16(b, p + 8) == 1 && le16(b, p + 10) == 1 && le16(b, p + 22) == 16
        else if (id == "data") { dataOff = i + 8; dataSize = sz }
        i += 8L + sz + (sz & 1L)
      }
      if (!fmtOk || dataOff < 0 || dataSize < 2 ||
          dataOff + dataSize > b.length) None // truncated data: undecodable
      else Some((dataOff, dataSize / 2))
    }
  }

  /** Voice-activity segmentation of a mono PCM16 stream — the VAD-lite
    * of audio curation (drop dead air, cut long recordings at natural
    * pauses, per-utterance dedup): a maximal run of ≥ `minRun` samples
    * with `|v| < ampThreshold` is a PAUSE; the voiced segments are the
    * maximal intervals between pauses (short quiet runs inside them do
    * not split). Segments are TRIMMED to their voiced extent — start is
    * the first voiced sample, end one past the last, so leading and
    * trailing quiet never pad a segment on either side. Integer rule
    * end to end, so any engine replaying the samples draws the same
    * cuts — the audio sibling of [[mp4ShotBoundaries]], and like it,
    * codec-free by construction (a real decoder slots in ahead of the
    * same rule). Returns `(segIx, startSample, endSample)` half-open
    * voiced intervals — empty Seq for an all-silent payload; None
    * outside the PCM16 support envelope. */
  def wavSilenceSegments(b: Array[Byte], ampThreshold: Int,
      minRun: Int): Option[Seq[(Int, Long, Long)]] = {
    require(ampThreshold >= 1 && minRun >= 1,
      s"need ampThreshold, minRun >= 1; got $ampThreshold, $minRun")
    wavPcm16Data(b).map { case (dataOff, n) =>
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      var segStart = -1L // first voiced sample of the open segment
      var lastVoiced = -1L
      var quiet = 0L // length of the current quiet run
      var j = 0L
      def close(): Unit =
        if (segStart >= 0) {
          segs += ((segs.length, segStart, lastVoiced + 1))
          segStart = -1L
        }
      while (j < n) {
        val p = (dataOff + 2 * j).toInt
        val v = (((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)).toShort.toInt
        if (math.abs(v) < ampThreshold) {
          quiet += 1
          // the segment closes (trimmed to its last voiced sample) the
          // moment the quiet run proves to be a pause
          if (quiet == minRun) close()
        } else {
          if (segStart < 0) segStart = j
          lastVoiced = j
          quiet = 0L
        }
        j += 1
      }
      close()
      segs.toSeq
    }
  }

  /** Decimate a mono PCM16 stream: every `k`-th sample starting at 0 —
    * the frame/sample-sampling primitive of audio featurization (naive
    * decimation, no anti-alias filter; a windowed resampler would slot
    * into the same decoded-samples seam). Exactly auditable: output j is
    * input `j·k`. Returns `(nInputSamples, decimated)` from ONE chunk
    * walk. */
  def wavPcm16Decimate(b: Array[Byte], k: Int): Option[(Long, Array[Int])] = {
    require(k >= 1, s"decimation factor must be >= 1, got $k")
    wavPcm16Data(b).map { case (dataOff, n) =>
      val m = ((n + k - 1) / k).toInt
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val p = (dataOff + 2L * j * k).toInt
        out(j) = (((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)).toShort.toInt
        j += 1
      }
      (n, out)
    }
  }

  private val vadType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("segments", ArrayType(StructType(Seq(
      StructField("seg_ix", IntegerType, nullable = false),
      StructField("start_sample", LongType, nullable = false),
      StructField("end_sample", LongType, nullable = false))),
      containsNull = false), nullable = true)))

  /** Batched silence segmentation ([[wavSilenceSegments]]);
    * `undecodable` (null segments) for non-PCM16. */
  def decodeWavSegments(df: DataFrame, ampThreshold: Int, minRun: Int,
      payloadCol: String = "payload",
      outCol: String = "vad"): DataFrame =
    decodeMeta(df, payloadCol, outCol, vadType) { bytes =>
      wavSilenceSegments(bytes, ampThreshold, minRun) match {
        case Some(segs) =>
          Row("wav", segs.map { case (ix, st, en) => Row(ix, st, en) })
        case None => Row("undecodable", null)
      }
    }

  /** [[syntheticWavPcm16]] with PLANTED quiet runs: sample `i` inside
    * any `(start, len)` window is `(id + i) mod 7 − 3` (|v| ≤ 3),
    * elsewhere the m5 closed form — both replayable byte for byte. */
  def syntheticWavPcm16Silence(rate: Int, id: Long, n: Int,
      silences: Seq[(Int, Int)]): Array[Byte] = {
    val base = syntheticWavPcm16(rate, id, n)
    val dataOff = base.length - n * 2
    silences.foreach { case (start, len) =>
      var i = math.max(0, start)
      while (i < math.min(n, start + len)) {
        val v = ((id + i) % 7 - 3).toShort
        base(dataOff + 2 * i) = (v & 0xFF).toByte
        base(dataOff + 2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
    }
    base
  }

  private val decimateType = StructType(Seq(
    StructField("n_in", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  /** Batched decimation; `undecodable` (null samples) for non-PCM16. */
  def decodeWavDecimate(df: DataFrame, k: Int,
      payloadCol: String = "payload",
      outCol: String = "decimated"): DataFrame =
    decodeMeta(df, payloadCol, outCol, decimateType) { bytes =>
      wavPcm16Decimate(bytes, k) match {
        case Some((nIn, samples)) => Row(nIn, "wav", samples.toSeq)
        case None => Row(0L, "undecodable", null)
      }
    }

  /** Batched full-PCM decode; null stats for undecodable payloads. */
  def decodeWavPcmStats(df: DataFrame, payloadCol: String = "payload",
      statsCol: String = "pcm_stats"): DataFrame =
    decodeMeta(df, payloadCol, statsCol, pcmStatsType)(bytes =>
      wavPcm16Stats(bytes).map { case (n, mean, rms) => Row(n, mean, rms) }.orNull)

  /** A playable mono 16-bit PCM WAV whose samples follow a deterministic
    * closed form — sample(i) = ((id·131 + i·31) mod 65536) − 32768 — so an
    * oracle reproduces the decoded statistics with integer arithmetic. */
  def syntheticWavPcm16(rate: Int, id: Long, n: Int): Array[Byte] = {
    val header = syntheticWavBytes(rate, 1, 16, n)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (((id * 131 + i.toLong * 31) % 65536) - 32768).toShort
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    header ++ data
  }

  val videoMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Parse (width, height, durationMs, format) from a real MP4 (ISO-BMFF)
    * header by walking boxes: `moov/mvhd` carries timescale+duration,
    * `moov/trak/tkhd` carries track dimensions as 16.16 fixed-point (the
    * video track is the one with non-zero width). Codec-free — container
    * metadata only, version-0 boxes (the common case). None when the
    * payload is not MP4. ISO-BMFF size specials are honored so a
    * non-faststart file (huge mdat before moov) still parses: size==1
    * means a 64-bit largesize follows; size==0 means the box extends to
    * the end of the enclosing scope. */
  def videoHeader(b: Array[Byte]): Option[(Int, Int, Long, String)] = {
    if (b == null || b.length < 12 ||
        new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    var timescale = 0L
    var duration = -1L
    var w = 0
    var h = 0
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (i + 8 <= end) {
        val sz0 = be32(b, i).toLong & 0xFFFFFFFFL
        val sz: Long =
          if (sz0 == 1L && i + 16 <= end) // largesize: 64-bit follows type
            ((be32(b, i + 8).toLong & 0xFFFFFFFFL) << 32) |
              (be32(b, i + 12).toLong & 0xFFFFFFFFL)
          else if (sz0 == 0L) (end - i).toLong // box runs to end of scope
          else sz0
        if (sz < 8) return
        val boxEnd = math.min(end.toLong, math.min(i.toLong + sz, Int.MaxValue.toLong)).toInt
        if (boxEnd <= i) return // corrupt size: refuse to stall or rewind
        new String(b, i + 4, 4, "US-ASCII") match {
          case "moov" | "trak" => walk(i + 8, boxEnd)
          case "mvhd" if boxEnd >= i + 32 && u8(b, i + 8) == 0 =>
            // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
            timescale = be32(b, i + 20).toLong & 0xFFFFFFFFL
            duration = be32(b, i + 24).toLong & 0xFFFFFFFFL
          case "tkhd" if boxEnd >= i + 92 && u8(b, i + 8) == 0 =>
            // v0: ...layer/volume/matrix... width 16.16 @+76, height @+80
            val tw = be32(b, i + 84) >>> 16
            val th = be32(b, i + 88) >>> 16
            if (tw > 0 && th > 0) { w = tw; h = th } // video track wins
          case _ => ()
        }
        i = boxEnd
      }
    }
    walk(0, b.length)
    if (timescale <= 0 || duration < 0 || w <= 0) None
    else Some((w, h, duration * 1000L / timescale, "mp4"))
  }

  /** Batched video-metadata decode; null meta for non-MP4 payloads. */
  def decodeVideoMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "video_meta"): DataFrame =
    decodeMeta(df, payloadCol, metaCol, videoMetaType)(bytes =>
      videoHeader(bytes).map { case (w, h, d, f) => Row(w, h, d, f) }.orNull)

  /** Fallback pseudo-decode for payloads that are not recognized images
    * (e.g. text bytes standing in for media): deterministic arithmetic on
    * the payload length, tagged `"fake"` so downstream filters can tell. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val n = bytes.length
    (n % 640 + 1, (n * 7) % 480 + 1, 3, "fake")
  }

  /** Batched image-metadata decode: real header parse (PNG/GIF/BMP/JPEG),
    * `"fake"` fallback for unrecognized payloads. */
  def decodeImageMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "media_meta"): DataFrame =
    decodeMeta(df, payloadCol, metaCol, mediaMetaType) { bytes =>
      val (w, h, c, f) = imageHeader(bytes).getOrElse(fakeDecode(bytes))
      Row(w, h, c, f)
    }

  /** STUB frame sampling: one row per sampled "frame" index (every
    * `stride`-th byte position stands in for a decoded video frame).
    * Demonstrates the explode/generator shape of frame extraction. */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
      stride: Int = 100): DataFrame =
    df.withColumn("frame_no",
        explode(sequence(lit(0),
          floor((length(col(payloadCol)) - 1) / lit(stride)).cast("int"))))
      .withColumn("frame_offset", col("frame_no") * stride)

  // ------------------------------------------------------ PNG pixel decode

  val pixelStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("mean", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("std", ArrayType(DoubleType, containsNull = false), nullable = true)))

  /** Full PNG pixel decode — completes the multimodal story past header
    * metadata using ONLY the JDK: chunk walk → concatenated IDAT →
    * `java.util.zip.Inflater` → per-scanline unfilter (all five PNG filter
    * types: None/Sub/Up/Average/Paeth) → per-channel mean and population
    * stddev. Supports the bulk-corpus case: 8-bit truecolor (RGB) and
    * truecolor+alpha (RGBA), non-interlaced. Returns None for anything
    * else (palette, 16-bit, interlaced, non-PNG) — callers tag and fall
    * back rather than guessing.
    *
    * std uses max(E[v²]−mean², 0) under the sqrt so floating-point rounding
    * can never produce NaN; sums are exact 64-bit integers, so the stats
    * are deterministic and reproducible in plain SQL by an auditor. */
  def pngPixelStats(b: Array[Byte]): Option[(Int, Int, Int, Array[Double], Array[Double])] =
    pngDecode(b).map { case (w, h, channels, pixels) =>
      val sum = new Array[Long](channels)
      val sumSq = new Array[Long](channels)
      var i = 0
      while (i < pixels.length) {
        val v = pixels(i) & 0xFF
        val c = i % channels
        sum(c) += v
        sumSq(c) += v.toLong * v
        i += 1
      }
      val n = w.toLong * h
      val mean = new Array[Double](channels)
      val std = new Array[Double](channels)
      var c = 0
      while (c < channels) {
        mean(c) = sum(c).toDouble / n
        std(c) = math.sqrt(math.max(sumSq(c).toDouble / n - mean(c) * mean(c), 0.0))
        c += 1
      }
      (w, h, channels, mean, std)
    }

  /** The shared PNG decoder behind [[pngPixelStats]] and
    * [[pngResizeNearest]]: chunk walk → inflate → unfilter, returning
    * the raw channel-interleaved pixel bytes. Same support envelope
    * (8-bit RGB/RGBA, non-interlaced, bounded size) and None-on-anything-
    * else contract. */
  private[operators] def pngDecode(b: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (b == null || b.length < 45 ||
        !startsWith(b, 0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) return None
    var w = 0; var h = 0; var channels = 0
    var ok = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var stop = false
    while (!stop && i + 8 <= b.length) {
      val len = be32(b, i)
      // Long math: a crafted length near Int.MaxValue would overflow an
      // Int compare and throw in the IDAT copy (decoder totality)
      if (len < 0 || i + 12L + len > b.length) return None // corrupt length
      val tpe = new String(b, i + 4, 4, "US-ASCII")
      tpe match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(b, i + 8); h = be32(b, i + 12)
          val bitDepth = u8(b, i + 16); val colorType = u8(b, i + 17)
          val interlace = u8(b, i + 20)
          channels = colorType match { case 2 => 3; case 6 => 4; case _ => 0 }
          ok = bitDepth == 8 && channels > 0 && interlace == 0 && w > 0 && h > 0 &&
            w.toLong * h * channels < (1L << 28) // bound memory per row
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => stop = true
        case _ => // ancillary chunk: skip
      }
      i += 12 + len
    }
    if (!ok || idat.size() == 0) return None
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place into `pixels`; PNG filters operate on bytes, with
    // `left` meaning the byte one PIXEL (bpp bytes) to the left
    val pixels = new Array[Byte](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val filter = u8(raw, y * (stride + 1))
      if (filter > 4) return None
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = u8(raw, rowIn + x)
        val left = if (x >= bpp) u8(pixels, rowOut + x - bpp) else 0
        val above = if (y > 0) u8(pixels, rowOut - stride + x) else 0
        val upLeft = if (y > 0 && x >= bpp) u8(pixels, rowOut - stride + x - bpp) else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + above
          case 3 => cur + ((left + above) >> 1)
          case 4 => // Paeth predictor
            val p = left + above - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - above)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft
            cur + pred
        }
        pixels(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, channels, pixels))
  }

  /** Nearest-neighbor resize to `(outW, outH)` on the decoded pixels:
    * source index `(x·w) div outW` / `(y·h) div outH` — pure integer
    * arithmetic, so every output pixel is exactly replayable by an
    * auditor (and by the m8 oracle) from the source dimensions alone.
    * NN is the resize used for thumbnail dedup and patch sampling where
    * value EXACTNESS matters more than smoothness; an interpolating
    * kernel would slot into the same decoded-pixels seam. Returns
    * channel-interleaved ints in [0, 255]. */
  def pngResizeNearest(b: Array[Byte], outW: Int, outH: Int)
      : Option[(Int, Int, Int, Array[Int])] = {
    require(outW > 0 && outH > 0, s"resize target must be positive, got ${outW}x$outH")
    pngDecode(b).map { case (w, h, channels, pixels) =>
      val out = new Array[Int](outW * outH * channels)
      var yo = 0
      while (yo < outH) {
        val ys = (yo.toLong * h / outH).toInt
        var xo = 0
        while (xo < outW) {
          val xs = (xo.toLong * w / outW).toInt
          var c = 0
          while (c < channels) {
            out((yo * outW + xo) * channels + c) =
              pixels((ys * w + xs) * channels + c) & 0xFF
            c += 1
          }
          xo += 1
        }
        yo += 1
      }
      (w, h, channels, out)
    }
  }

  /** Audio gradient fingerprint — dHash's PCM sibling: decimate the WAV's
    * 16-bit samples by `k` (the m9 kernel), then one bit per consecutive
    * decimated-sample gradient over the first ≤65 values, packed as
    * unsigned 32-bit halves. Amplitude-shift invariant for the same
    * reason dHash is brightness-invariant (a constant offset cancels in
    * every comparison); short clips simply contribute fewer bits (the
    * rest stay 0). Integer end-to-end — replayable in closed form from
    * the decimated samples. */
  def wavPcm16Fingerprint(b: Array[Byte], k: Int): Option[(Long, Long, Long)] =
    wavPcm16Decimate(b, k).map { case (nIn, samples) =>
      var hi = 0L; var lo = 0L
      val m = math.min(64, samples.length - 1)
      var j = 0
      while (j < m) {
        if (samples(j) < samples(j + 1)) {
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
        j += 1
      }
      (nIn, hi, lo)
    }

  private val audioFpType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_in", LongType, nullable = true),
    StructField("hash_hi", LongType, nullable = true),
    StructField("hash_lo", LongType, nullable = true)))

  /** Batched audio fingerprint; null fields (format `"undecodable"`) for
    * non-WAV payloads. */
  def decodeWavFingerprint(df: DataFrame, k: Int,
      payloadCol: String = "payload", fpCol: String = "afp"): DataFrame = {
    require(k >= 1, s"decimation factor must be >= 1, got $k")
    decodeMeta(df, payloadCol, fpCol, audioFpType) { bytes =>
      wavPcm16Fingerprint(bytes, k) match {
        case Some((n, hi, lo)) => Row("wav", n, hi, lo)
        case None => Row("undecodable", null, null, null)
      }
    }
  }

  /** Perceptual difference hash (dHash) of a PNG payload: decode →
    * 9×8 nearest-neighbor grayscale thumbnail → one bit per horizontal
    * gradient (`gray(x,y) < gray(x+1,y)`). Returned as two unsigned
    * 32-bit halves `(hi, lo)` so any engine reproduces them with plain
    * shifts — no signed-64 overflow edge. Integer arithmetic end-to-end
    * (the grayscale is the ITU-R 601 299/587/114 integer combination),
    * so the hash replays in closed form from the thumbnail pixels.
    *
    * dHash is gradient-based: adding a constant brightness to every
    * pixel leaves the hash unchanged — the invariance that makes it the
    * standard cheap near-dup key for image corpora (group by hash, or
    * band the 64 bits like simhash for Hamming-distance candidates). */
  def pngDHash(b: Array[Byte]): Option[(Long, Long)] =
    pngResizeNearest(b, 9, 8).map { case (_, _, channels, px) =>
      def gray(x: Int, y: Int): Int = {
        val i = (y * 9 + x) * channels
        (299 * px(i) + 587 * px(i + 1) + 114 * px(i + 2)) / 1000
      }
      var hi = 0L; var lo = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(x, y) < gray(x + 1, y)) {
            val bit = y * 8 + x
            if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
          }
          x += 1
        }
        y += 1
      }
      (hi, lo)
    }

  /** dHash over an already-decoded interleaved pixel array (the format-
    * independent core under [[pngDHash]]'s PNG path and the PDF image
    * path): nearest-neighbor resize to 9×8 with the [[pngResizeNearest]]
    * index mapping, ITU-601 integer grayscale (identity for 1-channel
    * input), one bit per horizontal gradient, packed as unsigned 32-bit
    * halves — all integer, replayable in closed form. */
  def dhashFromPixels(w: Int, h: Int, channels: Int,
      px: Array[Int]): (Long, Long) = {
    require(w > 0 && h > 0 && px.length >= w * h * channels,
      s"bad pixel buffer: ${w}x$h x$channels vs ${px.length}")
    // 2-channel (gray+alpha) layouts would read past a pixel's samples
    // in the RGB gray path — refuse loudly rather than hash garbage
    require(channels == 1 || channels >= 3,
      s"need 1 (gray) or >=3 (RGB-leading) channels; got $channels")
    def gray(x: Int, y: Int): Int = {
      val sx = (x.toLong * w / 9).toInt
      val sy = (y.toLong * h / 8).toInt
      val i = (sy * w + sx) * channels
      if (channels == 1) px(i) & 0xFF
      else (299 * (px(i) & 0xFF) + 587 * (px(i + 1) & 0xFF) +
        114 * (px(i + 2) & 0xFF)) / 1000
    }
    var hi = 0L; var lo = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x, y) < gray(x + 1, y)) {
          val bit = y * 8 + x
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  private val dhashType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("hash_hi", LongType, nullable = true),
    StructField("hash_lo", LongType, nullable = true)))

  /** Batched dHash over PNG payloads; null halves (format
    * `"undecodable"`) for unsupported bytes. Executor-side mapPartitions
    * like every decode here. */
  def decodePngDHash(df: DataFrame, payloadCol: String = "payload",
      hashCol: String = "dhash"): DataFrame =
    decodeMeta(df, payloadCol, hashCol, dhashType) { bytes =>
      pngDHash(bytes) match {
        case Some((hi, lo)) => Row("png", hi, lo)
        case None => Row("undecodable", null, null)
      }
    }

  /** Batched dHash over JPEG payloads — baseline AND progressive
    * (the [[jpegDecodeInterleaved]] SOF dispatch) through the shared
    * format-independent [[dhashFromPixels]] kernel, so a progressive
    * re-encode lands in its baseline twin's cluster. `format` reports
    * the frame type ("jpeg" | "jpeg_progressive"); null halves outside
    * the decode envelope. Executor-side mapPartitions like every codec
    * here. */
  def decodeJpegDHash(df: DataFrame, payloadCol: String = "payload",
      hashCol: String = "dhash"): DataFrame =
    decodeMeta(df, payloadCol, hashCol, dhashType) { bytes =>
      jpegDecodeInterleaved(bytes) match {
        case Some((w, h, c, px)) =>
          val fmt = if (jpegIsProgressive(bytes)) "jpeg_progressive"
            else "jpeg"
          val (hi, lo) = dhashFromPixels(w, h, c, px)
          Row(fmt, hi, lo)
        case None => Row("undecodable", null, null)
      }
    }

  /** Marker walk to the frame header: true iff the payload's SOF is
    * SOF2 (progressive). Skips 0xFF fill bytes exactly like the
    * decoders do, so the format label always matches the path that
    * decoded. Total — false on anything malformed. */
  private def jpegIsProgressive(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4 || (b(0) & 0xFF) != 0xFF ||
        (b(1) & 0xFF) != 0xD8) return false
    var i = 2
    while (i < b.length && (b(i) & 0xFF) == 0xFF) {
      // legal fill padding: any run of 0xFF precedes the marker byte
      while (i < b.length && (b(i) & 0xFF) == 0xFF) i += 1
      if (i >= b.length) return false
      val marker = b(i) & 0xFF; i += 1
      if (marker == 0xC2) return true
      if ((marker >= 0xC0 && marker <= 0xCF) && marker != 0xC4 &&
          marker != 0xC8 && marker != 0xCC) return false // another SOF
      if (marker == 0xD9 || marker == 0xDA) return false
      if (marker >= 0xD0 && marker <= 0xD7) {
        // stray RST: no length field
      } else {
        if (i + 2 > b.length) return false
        val len = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
        if (len < 2 || i + 0L + len > b.length) return false
        i += len
      }
    }
    false
  }

  private val exifType = StructType(Seq(
    StructField("orientation", IntegerType, nullable = true),
    StructField("date_time", StringType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true),
    StructField("has_gps", BooleanType, nullable = false),
    StructField("lat_micro", LongType, nullable = true),
    StructField("lon_micro", LongType, nullable = true)))

  /** Batched EXIF decode over JPEG payloads
    * ([[graft.functions.ExifImpl]]): orientation/timestamp/device
    * strings as curation signals, GPS presence + signed microdegree
    * coordinates as the LOCATION-PII flag corpus release must act on.
    * Null meta for payloads without a well-formed APP1 Exif segment.
    * Executor-side mapPartitions like every codec here. */
  def decodeExifMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "exif"): DataFrame =
    decodeExifMeta(df, payloadCol, metaCol, statusCol = null)

  /** With `statusCol` set, also appends the parse-walk status
    * ("ok" | "no_exif" | "bad_tiff" | "not_jpeg" | "walk_failed") so a
    * null meta is attributable: genuinely Exif-free versus a payload
    * whose walk failed and may carry unreadable Exif/GPS (quarantine
    * class). The meta struct stays null for everything but "ok" —
    * downstream isNull checks keep working. */
  def decodeExifMeta(df: DataFrame, payloadCol: String,
      metaCol: String, statusCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema0 = inSchema.add(StructField(metaCol, exifType, nullable = true))
    val outSchema =
      if (statusCol == null) outSchema0
      else outSchema0.add(StructField(statusCol, StringType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (meta, status) =
          if (bytes == null) (null, null)
          else {
            val (parsed, st) = graft.functions.ExifImpl.parseWithStatus(bytes)
            (parsed match {
              case Some(e) => Row(
                e.orientation.map(Int.box).orNull, e.dateTime.orNull,
                e.make.orNull, e.model.orNull, e.hasGps,
                e.latMicro.map(Long.box).orNull,
                e.lonMicro.map(Long.box).orNull)
              case None => null
            }, st)
          }
        if (statusCol == null) Row.fromSeq(r.toSeq :+ meta)
        else Row.fromSeq(r.toSeq ++ Seq(meta, status))
      }
    }
  }

  /** The GPS-PII scrub ([[graft.functions.ExifImpl.stripWithStatus]]):
    * every APP1 Exif segment removed by byte surgery, entropy stream
    * untouched — pixels decode identically, location metadata is gone.
    * Non-JPEG or Exif-free payloads pass through unchanged
    * (reference-equal). Appends `outCol` BINARY plus `statusCol`
    * ("scrubbed" | "clean" | "not_jpeg" | "walk_failed") — the
    * tri-state a release pipeline filters on: ONLY "scrubbed"/"clean"
    * ship; "walk_failed" payloads may still carry GPS the walker could
    * not reach and must be quarantined (they are returned unchanged,
    * indistinguishable from clean without the status). */
  def stripExif(df: DataFrame, payloadCol: String = "payload",
      outCol: String = "payload_clean",
      statusCol: String = "scrub_status"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField(outCol, BinaryType, nullable = true))
      .add(StructField(statusCol, StringType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else {
          val (clean, status) = graft.functions.ExifImpl.stripWithStatus(bytes)
          Row.fromSeq(r.toSeq ++ Seq(clean, status))
        }
      }
    }
  }

  /** Apply an EXIF display transform (orientation 1–8, TIFF/EXIF
    * semantics: the transform that shows the STORED samples upright) to
    * an interleaved pixel buffer — the normalization that makes a
    * physically-rotated copy and its upright original hash identically.
    * Orientations 5–8 swap the output dims. Unknown orientation values
    * are refused loudly (a silent identity would un-normalize a cluster
    * without a trace). */
  def orientPixels(w: Int, h: Int, channels: Int, px: Array[Byte],
      orientation: Int): (Int, Int, Array[Byte]) = {
    require(px.length >= w * h * channels,
      s"bad pixel buffer: ${w}x$h x$channels vs ${px.length}")
    require(orientation >= 1 && orientation <= 8,
      s"EXIF orientation must be 1..8, got $orientation")
    if (orientation == 1) return (w, h, px)
    val swap = orientation >= 5
    val wu = if (swap) h else w
    val hu = if (swap) w else h
    val out = new Array[Byte](wu * hu * channels)
    var y = 0
    while (y < hu) {
      var x = 0
      while (x < wu) {
        // source coordinate in the STORED image for upright (x, y)
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)          // flip horizontal
          case 3 => (w - 1 - x, h - 1 - y)  // rotate 180
          case 4 => (x, h - 1 - y)          // flip vertical
          case 5 => (y, x)                  // transpose
          case 6 => (y, h - 1 - x)          // rotate 90 CW
          case 7 => (w - 1 - y, h - 1 - x)  // transverse
          case _ => (w - 1 - y, x)          // 8: rotate 270 CW
        }
        val si = (sy * w + sx) * channels
        val di = (y * wu + x) * channels
        var c = 0
        while (c < channels) { out(di + c) = px(si + c); c += 1 }
        x += 1
      }
      y += 1
    }
    (wu, hu, out)
  }

  /** Orientation-normalized dHash over a pixel table
    * `(wCol, hCol, channelsCol, pxCol, orientCol)` — the composition a
    * camera-image dedup pass runs after [[decodeExifMeta]] +
    * a pixel decode: [[orientPixels]] then the shared
    * [[dhashFromPixels]], so a phone photo stored rotated (EXIF
    * orientation 6 is the most common camera output) lands in its
    * upright twin's cluster. Null pixels yield null hashes.
    * mapPartitions like every pixel kernel here. */
  def orientedDHash(df: DataFrame, wCol: String, hCol: String,
      channelsCol: String, pxCol: String, orientCol: String,
      hashCol: String = "dhash"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(hashCol, dhashType, nullable = true))
    val wi = inSchema.fieldIndex(wCol); val hi = inSchema.fieldIndex(hCol)
    val ci = inSchema.fieldIndex(channelsCol)
    val pi = inSchema.fieldIndex(pxCol); val oi = inSchema.fieldIndex(orientCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val px = r.getAs[Array[Byte]](pi)
        val meta =
          if (px == null) null
          else {
            val (wu, hu, up) = orientPixels(
              r.getInt(wi), r.getInt(hi), r.getInt(ci), px, r.getInt(oi))
            val ints = new Array[Int](up.length)
            var i = 0
            while (i < up.length) { ints(i) = up(i) & 0xff; i += 1 }
            val (hihash, lo) = dhashFromPixels(wu, hu, r.getInt(ci), ints)
            Row("oriented", hihash, lo)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** End-to-end orientation-normalized dedup over REAL JPEG payloads —
    * the composition [[orientedDHash]] (m24) proved at the kernel
    * level, now run from bytes the way a crawl pipeline sees them:
    * parse the EXIF orientation ([[graft.functions.ExifImpl]]; 1 when
    * absent), decode the pixels ([[jpegDecodeInterleaved]] — baseline
    * or progressive), apply the display transform ([[orientPixels]]),
    * hash through the shared [[dhashFromPixels]]. Appends an
    * `orientation` column and the dhash struct (format
    * "jpeg_oriented"); undecodable payloads and out-of-range planted
    * orientations keep their rows with null hashes and a telling
    * format — visible, never dropped, never a task-killing throw on
    * untrusted bytes. Executor-side mapPartitions like every codec. */
  def exifOrientedJpegDHash(df: DataFrame, payloadCol: String = "payload",
      hashCol: String = "dhash"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("orientation", IntegerType, nullable = true))
      .add(StructField(hashCol, dhashType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (orient: Any, meta: Any) =
          if (bytes == null) (null, null)
          else {
            val o = graft.functions.ExifImpl.parse(bytes)
              .flatMap(_.orientation).getOrElse(1)
            jpegDecodeInterleaved(bytes) match {
              case Some((w, h, c, px)) if o >= 1 && o <= 8 =>
                val pb = new Array[Byte](w * h * c)
                var i = 0
                while (i < pb.length) { pb(i) = px(i).toByte; i += 1 }
                val (wu, hu, up) = orientPixels(w, h, c, pb, o)
                val ints = new Array[Int](up.length)
                i = 0
                while (i < ints.length) { ints(i) = up(i) & 0xff; i += 1 }
                val (hi, lo) = dhashFromPixels(wu, hu, c, ints)
                (Int.box(o), Row("jpeg_oriented", hi, lo))
              case Some(_) => (Int.box(o), Row("bad_orientation", null, null))
              case None => (Int.box(o), Row("undecodable", null, null))
            }
          }
        Row.fromSeq(r.toSeq ++ Seq(orient, meta))
      }
    }
  }

  /** Batched dHash over WEB image payloads — GIF and WebP-VP8L
    * ([[graft.functions.ImageCodecs]]), the two formats that dominate
    * real crawled images next to PNG/JPEG: sniff the container, decode
    * to pixels, hash through the shared format-independent
    * [[dhashFromPixels]] so GIF/WebP copies land in the SAME clusters
    * as their PNG/JPEG/PDF originals. `format` ∈ {"gif", "webp",
    * "undecodable"}; null hash halves outside the decode envelope.
    * Executor-side mapPartitions like every codec here. */
  def decodeWebImageDHash(df: DataFrame, payloadCol: String = "payload",
      hashCol: String = "dhash"): DataFrame =
    decodeMeta(df, payloadCol, hashCol, dhashType) { bytes =>
      import graft.functions.ImageCodecs
      val decoded =
        if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F') ImageCodecs.gifDecode(bytes).map(("gif", _))
        else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F')
          ImageCodecs.webpDecode(bytes).map(("webp", _))
        else None
      decoded match {
        case Some((fmt, (w, h, ch, px))) =>
          val ints = new Array[Int](px.length)
          var i = 0
          while (i < px.length) { ints(i) = px(i) & 0xff; i += 1 }
          val (hi, lo) = dhashFromPixels(w, h, ch, ints)
          Row(fmt, hi, lo)
        case None => Row("undecodable", null, null)
      }
    }

  private val webpMetaType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("extended", BooleanType, nullable = false),
    StructField("canvas_w", IntegerType, nullable = true),
    StructField("canvas_h", IntegerType, nullable = true),
    StructField("version", IntegerType, nullable = true),
    StructField("y_ac_qi", IntegerType, nullable = true),
    StructField("y_dc_delta", IntegerType, nullable = true),
    StructField("uv_ac_delta", IntegerType, nullable = true),
    StructField("filter_type", IntegerType, nullable = true),
    StructField("filter_level", IntegerType, nullable = true),
    StructField("sharpness", IntegerType, nullable = true),
    StructField("token_partitions", IntegerType, nullable = true),
    StructField("has_exif", BooleanType, nullable = false),
    StructField("exif_orientation", IntegerType, nullable = true),
    StructField("exif_has_gps", BooleanType, nullable = true),
    StructField("exif_lat_micro", LongType, nullable = true),
    StructField("exif_lon_micro", LongType, nullable = true)))

  /** Container-level WebP metadata
    * ([[graft.functions.ImageCodecs.webpMeta]]) — the layer that sees
    * EVERY WebP including the lossy-VP8 majority whose pixels stay
    * outside the decode envelope: kind, frame dims (VP8L header or
    * VP8 key-frame header), VP8X canvas, and for lossy stills the
    * quantizer index + loop-filter setup — `y_ac_qi` is a direct
    * compression-quality signal for curation filters. Null meta for
    * non-WebP/malformed payloads. Executor-side mapPartitions like
    * every codec here. */
  def decodeWebpMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "webp_meta"): DataFrame =
    decodeMeta(df, payloadCol, metaCol, webpMetaType) { bytes =>
      graft.functions.ImageCodecs.webpMeta(bytes) match {
        case Some(m) =>
          val l = m.lossy
          Row(m.kind, m.width, m.height, m.extended,
            if (m.canvasW > 0) Int.box(m.canvasW) else null,
            if (m.canvasH > 0) Int.box(m.canvasH) else null,
            l.map(x => Int.box(x.version)).orNull,
            l.map(x => Int.box(x.yAcQi)).orNull,
            l.map(x => Int.box(x.yDcDelta)).orNull,
            l.map(x => Int.box(x.uvAcDelta)).orNull,
            l.map(x => Int.box(x.filterType)).orNull,
            l.map(x => Int.box(x.filterLevel)).orNull,
            l.map(x => Int.box(x.sharpness)).orNull,
            l.map(x => Int.box(x.tokenPartitions)).orNull,
            m.exif.isDefined,
            m.exif.flatMap(_.orientation).map(Int.box).orNull,
            m.exif.map(e => Boolean.box(e.hasGps)).orNull,
            m.exif.flatMap(_.latMicro).map(Long.box).orNull,
            m.exif.flatMap(_.lonMicro).map(Long.box).orNull)
        case None => null
      }
    }

  /** GPS-PII scrub for WebP payloads
    * ([[graft.functions.ImageCodecs.stripWebpExif]]): EXIF/XMP chunks
    * removed by container byte surgery, VP8X feature flags cleared,
    * frame chunks untouched — pixels decode identically. Appends
    * `outCol` BINARY + `statusCol`
    * ("scrubbed" | "clean" | "not_webp" | "walk_failed" — the same
    * release-gate tri-state as [[stripExif]]: only scrubbed/clean
    * ship, walk_failed payloads may still carry GPS and quarantine). */
  def stripWebpExif(df: DataFrame, payloadCol: String = "payload",
      outCol: String = "payload_clean",
      statusCol: String = "scrub_status"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField(outCol, BinaryType, nullable = true))
      .add(StructField(statusCol, StringType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null))
        else {
          val (clean, status) =
            graft.functions.ImageCodecs.stripWebpExif(bytes)
          Row.fromSeq(r.toSeq ++ Seq(clean, status))
        }
      }
    }
  }

  private val gifMetaType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("animated", BooleanType, nullable = false),
    StructField("total_delay_cs", LongType, nullable = false),
    StructField("loop_count", IntegerType, nullable = true)))

  /** GIF animation metadata ([[graft.functions.ImageCodecs.gifMeta]]):
    * frame count, summed Graphic Control delays and the Netscape loop
    * count — the signals that separate stills from animations and
    * memes from videos-as-GIFs in a crawled image corpus. Null meta
    * for non-GIF payloads; no pixel decode (block-wise walk). */
  def decodeGifMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "gif_meta"): DataFrame =
    decodeMeta(df, payloadCol, metaCol, gifMetaType) { bytes =>
      graft.functions.ImageCodecs.gifMeta(bytes) match {
        case Some(m) => Row(m.width, m.height, m.frames, m.animated,
          m.totalDelayCs,
          if (m.loopCount >= 0) Int.box(m.loopCount) else null)
        case None => null
      }
    }

  private val mp3MetaType = StructType(Seq(
    StructField("version", StringType, nullable = false),
    StructField("layer", IntegerType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("vbr", BooleanType, nullable = false),
    StructField("has_id3", BooleanType, nullable = false)))

  /** MP3 stream metadata ([[graft.functions.Mp3]]): the exact
    * frame-walk count and duration plus the curation fields a crawled
    * audio corpus filters on (bitrate as a quality signal, sample
    * rate, channel mode, VBR, ID3 presence). Null meta for non-MP3 /
    * non-Layer-III payloads. Executor-side mapPartitions like every
    * codec here. */
  def decodeMp3Meta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "mp3_meta"): DataFrame =
    decodeMeta(df, payloadCol, metaCol, mp3MetaType) { bytes =>
      graft.functions.Mp3.parse(bytes) match {
        case Some(m) => Row(m.version, m.layer, m.bitrateKbps,
          m.sampleRate, m.channels, m.frames, m.durationMs, m.vbr,
          m.hasId3)
        case None => null
      }
    }

  /** PDF embedded-image extraction + perceptual hashing: each payload's
    * image XObjects ([[graft.functions.PdfImpl.images]]) explode to one
    * row per image — `(image_ix, width, height, channels, filter,
    * hash_hi, hash_lo)` appended to the input row — with the dHash
    * computed from the ACTUAL samples: FlateDecode/raw payloads are
    * interleaved 8-bit samples hashed directly, DCTDecode payloads run
    * through the baseline JPEG decoder ([[jpegDecodeInterleaved]] —
    * exactly the from-scratch decoder the standalone JPEG path uses).
    * Rows whose samples can't be hashed (unsupported filter/colorspace,
    * truncated data, undecodable JPEG) keep the dictionary metadata with
    * null hashes — visible, never dropped; payloads with NO images emit
    * nothing (there is no image row to represent). Executor-side
    * mapPartitions like every codec here — the per-row state is one
    * image's samples, bounded by the image itself. */
  def decodePdfImages(df: DataFrame, payloadCol: String = "payload")
      : DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("image_ix", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("filter", StringType, nullable = false),
      StructField("hash_hi", LongType, nullable = true),
      StructField("hash_lo", LongType, nullable = true)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Iterator.empty
        else graft.functions.PdfImpl.images(bytes).iterator.zipWithIndex
          .map { case (im, ix) =>
            val hash: Option[(Long, Long)] = im.filter match {
              case "flate" | "raw"
                  if im.data != null && im.width > 0 && im.height > 0 &&
                    im.channels >= 1 && im.bitsPerComponent == 8 &&
                    im.data.length >= im.width * im.height * im.channels =>
                Some(dhashFromPixels(im.width, im.height, im.channels,
                  im.data.map(b => b & 0xFF)))
              case "dct" =>
                jpegDecodeInterleaved(im.data).map { case (w, h, c, px) =>
                  dhashFromPixels(w, h, c, px)
                }
              case _ => None
            }
            Row.fromSeq(r.toSeq ++ Seq(ix, im.width, im.height, im.channels,
              im.filter,
              hash.map(x => java.lang.Long.valueOf(x._1)).orNull,
              hash.map(x => java.lang.Long.valueOf(x._2)).orNull))
          }
      }
    }
  }

  private val resizeType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))

  /** Batched decode→resize: each PNG payload becomes `(width, height,
    * channels, format, pixels)` with `pixels` the `outW×outH` nearest-
    * neighbor thumbnail (channel-interleaved, row-major). Executor-side
    * mapPartitions like every decode here — bounded memory per row, no
    * driver involvement; `format = "undecodable"` (null pixels) for
    * unsupported payloads. */
  def decodePngResize(df: DataFrame, outW: Int, outH: Int,
      payloadCol: String = "payload",
      resizedCol: String = "resized"): DataFrame =
    decodeMeta(df, payloadCol, resizedCol, resizeType) { bytes =>
      pngResizeNearest(bytes, outW, outH) match {
        case Some((w, h, c, px)) => Row(w, h, c, "png", px.toSeq)
        case None => Row(0, 0, 0, "undecodable", null)
      }
    }

  /** Batched PNG pixel decode: real inflate+unfilter stats for 8-bit
    * RGB/RGBA PNGs, `format = "undecodable"` (null stats) otherwise. */
  def decodePngPixels(df: DataFrame, payloadCol: String = "payload",
      statsCol: String = "pixel_stats"): DataFrame =
    decodeMeta(df, payloadCol, statsCol, pixelStatsType) { bytes =>
      pngPixelStats(bytes) match {
        case Some((w, h, c, mean, std)) => Row(w, h, c, "png", mean.toSeq, std.toSeq)
        case None => Row(0, 0, 0, "undecodable", null, null)
      }
    }

  // ----------------------------------------------------- JPEG pixel decode

  /** Zigzag position → natural (row-major) coefficient index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Stack-trace-free control-flow throwable: malformed/unsupported entropy
    * data unwinds to the `None` fallback without the fill-in cost. */
  private object JpegFormat extends RuntimeException("malformed jpeg") {
    override def fillInStackTrace(): Throwable = this
  }

  /** JPEG entropy bit reader with 0xFF00 unstuffing; any bare marker inside
    * entropy data throws (restart markers are consumed byte-aligned by the
    * MCU loop, never through here). */
  private final class JpegBits(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) throw JpegFormat
        val v = b(pos) & 0xFF; pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) throw JpegFormat
          if ((b(pos) & 0xFF) == 0x00) pos += 1 // stuffed data byte
          else throw JpegFormat
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(t: Int): Int = {
      var v = 0; var i = 0
      while (i < t) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def byteAlign(): Unit = n = 0
  }

  /** Canonical Huffman table (ITU T.81 F.2.2.3 sequential decode). */
  private final class JpegHuff(counts: Array[Int], vals: Array[Int]) {
    private val mincode = new Array[Int](17)
    private val maxcode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valptr(l) = k; mincode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxcode(l) = code - 1
        code <<= 1
        l += 1
      }
    }
    def decode(br: JpegBits): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        code = (code << 1) | br.bit()
        if (counts(l - 1) > 0 && code <= maxcode(l))
          return vals(valptr(l) + code - mincode(l))
        l += 1
      }
      throw JpegFormat
    }
  }

  /** ITU T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value. */
  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable 2-D IDCT basis: IdctCos(x)(u) = C(u)/2 · cos((2x+1)uπ/16). */
  private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Dequantized natural-order coefficients → level-shifted clamped samples. */
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += IdctCos(x)(u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += IdctCos(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        val p = math.round(s).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** Full baseline JPEG pixel decode — ONLY the JDK, no codec library:
    * marker walk (DQT/DHT/SOF0/SOS/DRI, APPn/COM skipped) → canonical
    * Huffman entropy decode with 0xFF00 unstuffing and byte-aligned restart
    * markers → dequantize in zigzag order → separable double-precision IDCT
    * with round + level shift + clamp → per-channel mean and population
    * stddev over the w×h crop (MCU padding excluded). 3-component scans
    * convert YCbCr→RGB (ITU round-half-up on the standard coefficients).
    *
    * Supported: sequential baseline (SOF0) AND progressive (SOF2, via
    * [[jpegDecodeProgressive]]), 8-bit, 1 or 3 components, sampling
    * factors 1..2 per component — grayscale, 4:4:4, 4:2:2, 4:4:0
    * and the web/camera-dominant 4:2:0, with nearest-neighbor chroma
    * upsampling (T.81 A.2.3 MCU interleave, per-component subsampled
    * planes). Arithmetic coding, 12-bit, hierarchical, and factors
    * above 2 return None — callers tag `undecodable` and fall back rather
    * than guessing, same contract as [[pngPixelStats]]. Sums are exact
    * 64-bit integers, so the stats are deterministic and SQL-reproducible. */
  def jpegPixelStats(b: Array[Byte]): Option[(Int, Int, Int, Array[Double], Array[Double])] =
    jpegDecodeInterleaved(b).map { case (w, h, channels, px) =>
      val sum = new Array[Long](channels)
      val sumSq = new Array[Long](channels)
      var i = 0
      while (i < px.length) {
        val c = i % channels
        val v = px(i)
        sum(c) += v; sumSq(c) += v.toLong * v
        i += 1
      }
      val n = w.toLong * h
      val mean = new Array[Double](channels)
      val std = new Array[Double](channels)
      var c = 0
      while (c < channels) {
        mean(c) = sum(c).toDouble / n
        std(c) = math.sqrt(math.max(sumSq(c).toDouble / n - mean(c) * mean(c), 0.0))
        c += 1
      }
      (w, h, channels, mean, std)
    }

  /** The decode under [[jpegPixelStats]], exposing the full
    * channel-interleaved pixel array (row-major, 0..255 ints) — the seam
    * [[dhashFromPixels]] and the PDF DCTDecode path consume. Same
    * support envelope and None contract as the stats wrapper. */
  def jpegDecodeInterleaved(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    try {
      val quantZig = new Array[Array[Int]](4) // zigzag order, as stored
      val dcTabs = new Array[JpegHuff](4)
      val acTabs = new Array[JpegHuff](4)
      var w = 0; var h = 0; var nComp = 0
      var compQ: Array[Int] = null
      var compIds: Array[Int] = null
      var compH: Array[Int] = null
      var compV: Array[Int] = null
      var restartInterval = 0
      var scanDc: Array[Int] = null
      var scanAc: Array[Int] = null
      var pos = 2
      var sosAt = -1
      // a corrupt segment length (< 2) would stall `pos` — every
      // length-consuming branch goes through this guard
      def segLen(at: Int): Int = {
        val len = be16(b, at)
        if (len < 2) throw JpegFormat
        len
      }
      while (sosAt < 0) {
        // expect a marker (fill 0xFF bytes allowed before it)
        if (pos >= b.length || (b(pos) & 0xFF) != 0xFF) return None
        while (pos < b.length && (b(pos) & 0xFF) == 0xFF) pos += 1
        if (pos >= b.length) return None
        val marker = b(pos) & 0xFF; pos += 1
        marker match {
          case 0xD9 => return None // EOI before any scan
          case m if m >= 0xD0 && m <= 0xD7 => // RST outside a scan: ignore
          case 0xC0 => // baseline SOF
            val len = segLen(pos)
            if (u8(b, pos + 2) != 8) return None // 12-bit precision
            h = be16(b, pos + 3); w = be16(b, pos + 5)
            nComp = u8(b, pos + 7)
            if ((nComp != 1 && nComp != 3) || w <= 0 || h <= 0 ||
                w.toLong * h * nComp >= (1L << 28)) return None
            compIds = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            compH = new Array[Int](nComp)
            compV = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compIds(c) = u8(b, pos + 8 + c * 3)
              compH(c) = u8(b, pos + 9 + c * 3) >> 4
              compV(c) = u8(b, pos + 9 + c * 3) & 0x0F
              // factors 1..2 cover 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 — the
              // real-world baseline space; anything else is undecodable
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
                return None
              compQ(c) = u8(b, pos + 10 + c * 3)
              c += 1
            }
            // grayscale scans must be 1x1; chroma may not outsample luma
            // (a Y=1x1 / C=2x2 layout is legal T.81 but outside the
            // supported set — it must tag undecodable, not half-res luma)
            if (nComp == 1 && (compH(0) != 1 || compV(0) != 1))
              return None
            if (nComp == 3 && (1 until 3).exists(c =>
                compH(0) < compH(c) || compV(0) < compV(c)))
              return None
            pos += len
          case 0xC2 => // progressive SOF: the multi-scan decoder owns it
            return jpegDecodeProgressive(b)
          case m if (m >= 0xC1 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC =>
            return None // arithmetic / hierarchical / 12-bit SOFs
          case 0xC4 => // DHT: one or more tables
            val len = segLen(pos)
            var p = pos + 2
            while (p < pos + len) {
              val tc = u8(b, p) >> 4; val th = u8(b, p) & 0x0F
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => u8(b, p + 1 + i))
              val total = counts.sum
              val vals = Array.tabulate(total)(i => u8(b, p + 17 + i))
              val tab = new JpegHuff(counts, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
            pos += len
          case 0xDB => // DQT: one or more tables (8-bit only)
            val len = segLen(pos)
            var p = pos + 2
            while (p < pos + len) {
              val pq = u8(b, p) >> 4; val tq = u8(b, p) & 0x0F
              if (pq != 0 || tq > 3) return None
              quantZig(tq) = Array.tabulate(64)(i => u8(b, p + 1 + i))
              p += 65
            }
            pos += len
          case 0xDD => // DRI
            restartInterval = be16(b, pos + 2)
            pos += segLen(pos)
          case 0xDA => // SOS
            val len = segLen(pos)
            val ns = u8(b, pos + 2)
            if (ns != nComp) return None
            scanDc = new Array[Int](nComp)
            scanAc = new Array[Int](nComp)
            var c = 0
            while (c < ns) {
              val cid = u8(b, pos + 3 + c * 2)
              val idx = compIds.indexOf(cid)
              if (idx < 0) return None
              scanDc(idx) = u8(b, pos + 4 + c * 2) >> 4
              scanAc(idx) = u8(b, pos + 4 + c * 2) & 0x0F
              c += 1
            }
            sosAt = pos + len
          case _ => // APPn / COM / others: length-skip
            pos += segLen(pos)
        }
      }
      if (w == 0) return None
      var c = 0
      while (c < nComp) {
        if (quantZig(compQ(c)) == null || dcTabs(scanDc(c)) == null ||
            acTabs(scanAc(c)) == null) return None
        c += 1
      }
      var hMax = 1; var vMax = 1
      c = 0
      while (c < nComp) {
        if (compH(c) > hMax) hMax = compH(c)
        if (compV(c) > vMax) vMax = compV(c)
        c += 1
      }
      // MCU grid over the full image; each component's plane is its own
      // (possibly subsampled) resolution, padded to whole MCUs
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      val planeWs = Array.tabulate(nComp)(c => mcusX * 8 * compH(c))
      val planes = Array.tabulate(nComp)(c =>
        new Array[Int](planeWs(c) * mcusY * 8 * compV(c)))
      val br = new JpegBits(b, sosAt)
      val dcPred = new Array[Int](nComp)
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.byteAlign()
          if (br.pos + 1 >= b.length || (b(br.pos) & 0xFF) != 0xFF ||
              ((b(br.pos + 1) & 0xFF) < 0xD0 || (b(br.pos + 1) & 0xFF) > 0xD7))
            throw JpegFormat
          br.pos += 2
          java.util.Arrays.fill(dcPred, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        c = 0
        while (c < nComp) {
          // T.81 A.2.3 interleave: compH(c) x compV(c) blocks per MCU,
          // row-major within the MCU
          var bv = 0
          while (bv < compV(c)) {
            var bu = 0
            while (bu < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val q = quantZig(compQ(c))
              val t = dcTabs(scanDc(c)).decode(br)
              if (t > 15) throw JpegFormat
              dcPred(c) += jpegExtend(br.receive(t), t)
              coef(0) = dcPred(c) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = acTabs(scanAc(c)).decode(br)
                val r = rs >> 4; val s = rs & 0x0F
                if (s == 0) {
                  if (r == 15) k += 16 else eob = true // ZRL vs EOB
                } else {
                  k += r
                  if (k > 63) throw JpegFormat
                  coef(ZigZag(k)) = jpegExtend(br.receive(s), s) * q(k)
                  k += 1
                }
              }
              idct8x8(coef, block)
              val plane = planes(c)
              val pw = planeWs(c)
              val ox = (mx * compH(c) + bu) * 8
              val oy = (my * compV(c) + bv) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  plane((oy + yy) * pw + ox + xx) = block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bu += 1
            }
            bv += 1
          }
          c += 1
        }
        mcu += 1
      }
      // stats over the w×h crop; 3-component scans convert YCbCr→RGB
      val channels = nComp
      val px = new Array[Int](w * h * channels)
      // nearest-neighbor chroma upsampling: component c's sample for image
      // pixel (x, y) lives at (x*compH(c)/hMax, y*compV(c)/vMax)
      def sample(c: Int, x: Int, y: Int): Int =
        planes(c)((y * compV(c) / vMax) * planeWs(c) + (x * compH(c) / hMax))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (nComp == 1) {
            px(y * w + x) = planes(0)(y * planeWs(0) + x)
          } else {
            val yv = sample(0, x, y)
            val cb = sample(1, x, y) - 128
            val cr = sample(2, x, y) - 128
            def clamp(d: Double): Int = {
              val r = math.round(d).toInt
              if (r < 0) 0 else if (r > 255) 255 else r
            }
            val i = (y * w + x) * 3
            px(i) = clamp(yv + 1.402 * cr)
            px(i + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
            px(i + 2) = clamp(yv + 1.772 * cb)
          }
          x += 1
        }
        y += 1
      }
      Some((w, h, channels, px))
    } catch {
      case JpegFormat => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Progressive JPEG (SOF2) pixel decode — T.81 Annex G, Huffman
    * coding: spectral selection (per-scan [Ss, Se] coefficient bands)
    * and successive approximation (point transform Al with refinement
    * scans Ah = Al+1) over the same quantize/IDCT/upsample machinery
    * the baseline path uses. All scans accumulate into per-component
    * UNQUANTIZED coefficient stores (zigzag order); dequantization and
    * the IDCT run once at EOI, so any legal scan script — DC-first +
    * refinements, per-component AC bands, EOB runs spanning blocks,
    * restart intervals — lands on identical pixels to a baseline
    * encoding of the same quantized coefficients (ProgressiveJpegSpec
    * pins that equivalence). Support envelope mirrors baseline: 8-bit,
    * 1 or 3 components, sampling factors 1..2; a partial progression
    * (EOI before every band arrived) decodes what it has, the
    * progressive-rendering contract. Dispatched from
    * [[jpegDecodeInterleaved]] on the SOF2 marker. */
  private def jpegDecodeProgressive(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    try {
      val quantZig = new Array[Array[Int]](4)
      val dcTabs = new Array[JpegHuff](4)
      val acTabs = new Array[JpegHuff](4)
      var w = 0; var h = 0; var nComp = 0
      var compQ: Array[Int] = null
      var compIds: Array[Int] = null
      var compH: Array[Int] = null
      var compV: Array[Int] = null
      var restartInterval = 0
      var mcusX = 0; var mcusY = 0; var hMax = 1; var vMax = 1
      // per component: padded block-grid dims and the zigzag-order
      // unquantized coefficient store (nBlocks × 64)
      var blockW: Array[Int] = null
      var blockH: Array[Int] = null
      var coefs: Array[Array[Int]] = null
      var pos = 2
      def segLen(at: Int): Int = {
        val len = be16(b, at)
        if (len < 2) throw JpegFormat
        len
      }
      var sawEoi = false
      while (!sawEoi) {
        if (pos >= b.length || (b(pos) & 0xFF) != 0xFF) return None
        while (pos < b.length && (b(pos) & 0xFF) == 0xFF) pos += 1
        if (pos >= b.length) return None
        val marker = b(pos) & 0xFF; pos += 1
        marker match {
          case 0xD9 => sawEoi = true
          case m if m >= 0xD0 && m <= 0xD7 => // stray RST between scans
          case 0xC2 =>
            if (coefs != null) return None // second frame
            val len = segLen(pos)
            if (u8(b, pos + 2) != 8) return None // 12-bit precision
            h = be16(b, pos + 3); w = be16(b, pos + 5)
            nComp = u8(b, pos + 7)
            if ((nComp != 1 && nComp != 3) || w <= 0 || h <= 0 ||
                w.toLong * h * nComp >= (1L << 28)) return None
            compIds = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            compH = new Array[Int](nComp)
            compV = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compIds(c) = u8(b, pos + 8 + c * 3)
              compH(c) = u8(b, pos + 9 + c * 3) >> 4
              compV(c) = u8(b, pos + 9 + c * 3) & 0x0F
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
                return None
              compQ(c) = u8(b, pos + 10 + c * 3)
              c += 1
            }
            if (nComp == 1 && (compH(0) != 1 || compV(0) != 1)) return None
            if (nComp == 3 && (1 until 3).exists(c =>
                compH(0) < compH(c) || compV(0) < compV(c))) return None
            c = 0
            while (c < nComp) {
              if (compH(c) > hMax) hMax = compH(c)
              if (compV(c) > vMax) vMax = compV(c)
              c += 1
            }
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            blockW = Array.tabulate(nComp)(c => mcusX * compH(c))
            blockH = Array.tabulate(nComp)(c => mcusY * compV(c))
            coefs = Array.tabulate(nComp)(c =>
              new Array[Int](blockW(c) * blockH(c) * 64))
            pos += len
          case m if (m >= 0xC0 && m <= 0xCF) && m != 0xC2 && m != 0xC4 &&
              m != 0xC8 && m != 0xCC =>
            return None // baseline/arithmetic/hierarchical frame here
          case 0xC4 =>
            val len = segLen(pos)
            var p = pos + 2
            while (p < pos + len) {
              val tc = u8(b, p) >> 4; val th = u8(b, p) & 0x0F
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => u8(b, p + 1 + i))
              val total = counts.sum
              val vals = Array.tabulate(total)(i => u8(b, p + 17 + i))
              val tab = new JpegHuff(counts, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
            pos += len
          case 0xDB =>
            val len = segLen(pos)
            var p = pos + 2
            while (p < pos + len) {
              val pq = u8(b, p) >> 4; val tq = u8(b, p) & 0x0F
              if (pq != 0 || tq > 3) return None
              quantZig(tq) = Array.tabulate(64)(i => u8(b, p + 1 + i))
              p += 65
            }
            pos += len
          case 0xDD =>
            restartInterval = be16(b, pos + 2)
            pos += segLen(pos)
          case 0xDA =>
            if (coefs == null) return None // scan before the frame header
            val len = segLen(pos)
            val ns = u8(b, pos + 2)
            if (ns < 1 || ns > nComp) return None
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cid = u8(b, pos + 3 + c * 2)
              val idx = compIds.indexOf(cid)
              if (idx < 0) return None
              scanComp(c) = idx
              scanDc(c) = u8(b, pos + 4 + c * 2) >> 4
              scanAc(c) = u8(b, pos + 4 + c * 2) & 0x0F
              c += 1
            }
            val ss = u8(b, pos + 3 + ns * 2)
            val se = u8(b, pos + 4 + ns * 2)
            val ahAl = u8(b, pos + 5 + ns * 2)
            val ah = ahAl >> 4; val al = ahAl & 0x0F
            // T.81 G.1.1.1.1: DC scans are [0,0] and may interleave;
            // AC scans are single-component bands inside [1,63]
            if (ss == 0 && se != 0) return None
            if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
            if (al > 13 || ah > 14) return None
            val br = new JpegBits(b, pos + len)
            pos = decodeProgressiveScan(b, br, coefs, blockW,
              scanComp, scanDc, scanAc, ss, se, ah, al,
              dcTabs, acTabs, compH, compV, mcusX, mcusY, hMax, vMax,
              w, h, restartInterval)
          case _ =>
            pos += segLen(pos)
        }
      }
      if (coefs == null) return None
      var c = 0
      while (c < nComp) {
        if (quantZig(compQ(c)) == null) return None
        c += 1
      }
      // dequantize + IDCT every padded block into per-component planes,
      // then the baseline path's crop/upsample/color conversion
      val planeWs = Array.tabulate(nComp)(c => blockW(c) * 8)
      val planes = Array.tabulate(nComp)(c =>
        new Array[Int](planeWs(c) * blockH(c) * 8))
      val coefNat = new Array[Int](64)
      val block = new Array[Int](64)
      c = 0
      while (c < nComp) {
        val q = quantZig(compQ(c))
        val store = coefs(c)
        val bw = blockW(c)
        var bi = 0
        val nBlocks = bw * blockH(c)
        while (bi < nBlocks) {
          var k = 0
          while (k < 64) {
            coefNat(ZigZag(k)) = store(bi * 64 + k) * q(k)
            k += 1
          }
          idct8x8(coefNat, block)
          val plane = planes(c); val pw = planeWs(c)
          val ox = (bi % bw) * 8; val oy = (bi / bw) * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              plane((oy + yy) * pw + ox + xx) = block(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bi += 1
        }
        c += 1
      }
      val channels = nComp
      val px = new Array[Int](w * h * channels)
      def sample(c: Int, x: Int, y: Int): Int =
        planes(c)((y * compV(c) / vMax) * planeWs(c) + (x * compH(c) / hMax))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (nComp == 1) {
            px(y * w + x) = planes(0)(y * planeWs(0) + x)
          } else {
            val yv = sample(0, x, y)
            val cb = sample(1, x, y) - 128
            val cr = sample(2, x, y) - 128
            def clamp(d: Double): Int = {
              val r = math.round(d).toInt
              if (r < 0) 0 else if (r > 255) 255 else r
            }
            val i = (y * w + x) * 3
            px(i) = clamp(yv + 1.402 * cr)
            px(i + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
            px(i + 2) = clamp(yv + 1.772 * cb)
          }
          x += 1
        }
        y += 1
      }
      Some((w, h, channels, px))
    } catch {
      case JpegFormat => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** One progressive scan's entropy data (T.81 G.1.2) into the
    * coefficient stores; returns the byte position after the scan.
    * Handles all four scan kinds: DC first (diffs at point transform
    * Al, possibly interleaved), DC refinement (one raw bit per block),
    * AC first (band [Ss,Se] with EOB runs), AC refinement (correction
    * bits for nonzero history + new ±1<<Al insertions). Restart
    * markers reset DC predictors AND the EOB run. */
  private def decodeProgressiveScan(b: Array[Byte], br: JpegBits,
      coefs: Array[Array[Int]], blockW: Array[Int],
      scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      dcTabs: Array[JpegHuff], acTabs: Array[JpegHuff],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      hMax: Int, vMax: Int, w: Int, h: Int,
      restartInterval: Int): Int = {
    val ns = scanComp.length
    val dcPred = new Array[Int](ns)
    var eobrun = 0
    def restart(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.byteAlign()
        if (br.pos + 1 >= b.length || (b(br.pos) & 0xFF) != 0xFF ||
            ((b(br.pos + 1) & 0xFF) < 0xD0 || (b(br.pos + 1) & 0xFF) > 0xD7))
          throw JpegFormat
        br.pos += 2
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }
    // ---- DC band ----
    def dcFirst(c: Int, store: Array[Int], base: Int): Unit = {
      val t = dcTabs(scanDc(c)).decode(br)
      if (t > 15) throw JpegFormat
      dcPred(c) += jpegExtend(br.receive(t), t)
      store(base) = dcPred(c) << al
    }
    def dcRefine(store: Array[Int], base: Int): Unit =
      if (br.bit() == 1) store(base) |= 1 << al
    // ---- AC band (T.81 G.1.2.2 / G.1.2.3) ----
    def acFirst(ac: JpegHuff, store: Array[Int], base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      var done = false
      while (!done && k <= se) {
        val rs = ac.decode(br)
        val r = rs >> 4; val s = rs & 0x0F
        if (s == 0) {
          if (r < 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            done = true
          } else k += 16 // ZRL
        } else {
          k += r
          if (k > se) throw JpegFormat
          store(base + k) = jpegExtend(br.receive(s), s) << al
          k += 1
        }
      }
    }
    def acRefine(ac: JpegHuff, store: Array[Int], base: Int): Unit = {
      val p1 = 1 << al; val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = ac.decode(br)
          var r = rs >> 4; val s = rs & 0x0F
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              done = true // remaining nonzeros corrected below
            }
            // r == 15: skip over 16 zero-history coefficients
          } else {
            if (s != 1) throw JpegFormat // refinements insert only ±1
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!done) {
            var placed = false
            while (!placed && k <= se) {
              val cur = store(base + k)
              if (cur != 0) {
                // correction bit for already-nonzero history
                if (br.bit() == 1 && (cur & p1) == 0)
                  store(base + k) = cur + (if (cur >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newVal != 0) store(base + k) = newVal
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) throw JpegFormat // ran past Se
          }
        }
      }
      if (eobrun > 0) {
        // inside an EOB run only correction bits for nonzero history
        while (k <= se) {
          val cur = store(base + k)
          if (cur != 0) {
            if (br.bit() == 1 && (cur & p1) == 0)
              store(base + k) = cur + (if (cur >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }
    if (ss == 0) {
      // DC scan: interleaved over MCUs when ns > 1, else the
      // component's own (non-padded) block raster
      if (ah == 0 && scanDc.exists(i => dcTabs(i) == null)) throw JpegFormat
      if (ns > 1) {
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          restart(mcu)
          val mx = mcu % mcusX; val my = mcu / mcusX
          var c = 0
          while (c < ns) {
            val comp = scanComp(c)
            val store = coefs(comp)
            var bv = 0
            while (bv < compV(comp)) {
              var bu = 0
              while (bu < compH(comp)) {
                val bx = mx * compH(comp) + bu
                val by = my * compV(comp) + bv
                val base = (by * blockW(comp) + bx) * 64
                if (ah == 0) dcFirst(c, store, base)
                else dcRefine(store, base)
                bu += 1
              }
              bv += 1
            }
            c += 1
          }
          mcu += 1
        }
      } else {
        val comp = scanComp(0)
        val store = coefs(comp)
        val bw = (((w * compH(comp) + hMax - 1) / hMax) + 7) / 8
        val bh = (((h * compV(comp) + vMax - 1) / vMax) + 7) / 8
        var bi = 0
        while (bi < bw * bh) {
          restart(bi)
          val base = ((bi / bw) * blockW(comp) + (bi % bw)) * 64
          if (ah == 0) dcFirst(0, store, base)
          else dcRefine(store, base)
          bi += 1
        }
      }
    } else {
      // AC scan: always one component, its own block raster
      val comp = scanComp(0)
      val ac = acTabs(scanAc(0))
      if (ac == null) throw JpegFormat
      val store = coefs(comp)
      val bw = (((w * compH(comp) + hMax - 1) / hMax) + 7) / 8
      val bh = (((h * compV(comp) + vMax - 1) / vMax) + 7) / 8
      var bi = 0
      while (bi < bw * bh) {
        restart(bi)
        val base = ((bi / bw) * blockW(comp) + (bi % bw)) * 64
        if (ah == 0) acFirst(ac, store, base)
        else acRefine(ac, store, base)
        bi += 1
      }
    }
    br.pos
  }

  /** Batched baseline-JPEG pixel decode: real Huffman+IDCT stats for
    * sequential 8-bit 1/3-component JPEGs with sampling factors 1..2
    * (grayscale, 4:4:4, 4:2:2, 4:4:0 and the web/camera-dominant 4:2:0),
    * `format = "undecodable"` (null stats) otherwise — the same
    * executor-side mapPartitions shape as [[decodePngPixels]]. */
  def decodeJpegPixels(df: DataFrame, payloadCol: String = "payload",
      statsCol: String = "pixel_stats"): DataFrame =
    decodeMeta(df, payloadCol, statsCol, pixelStatsType) { bytes =>
      jpegPixelStats(bytes) match {
        case Some((w, h, c, mean, std)) => Row(w, h, c, "jpeg", mean.toSeq, std.toSeq)
        case None => Row(0, 0, 0, "undecodable", null, null)
      }
    }

  // --------------------------------------------------- synthetic fixtures

  /** Deterministic synthetic image HEADERS (valid PNG / GIF / BMP / JPEG
    * header bytes with the given dimensions, no pixel data) for fixtures
    * and tests. Fixed sizes: png=33, gif=13, bmp=54, jpeg=21 bytes. */
  def syntheticImageBytes(format: String, w: Int, h: Int): Array[Byte] = {
    format match {
      case "png" => // signature + IHDR (color type 6 = RGBA), dummy CRC
        Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
          be32b(13) ++ "IHDR".getBytes("US-ASCII") ++ be32b(w) ++ be32b(h) ++
          Array[Byte](8, 6, 0, 0, 0) ++ be32b(0)
      case "gif" => // GIF89a + logical screen descriptor
        "GIF89a".getBytes("US-ASCII") ++ le16b(w) ++ le16b(h) ++
          Array[Byte](0, 0, 0)
      case "bmp" => // BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24bpp
        "BM".getBytes("US-ASCII") ++ le32b(54) ++ le32b(0) ++ le32b(54) ++
          le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
          Array.fill[Byte](24)(0)
      case "jpeg" => // SOI + SOF0 with 3 components
        Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xC0.toByte) ++
          be16b(17) ++ Array[Byte](8) ++ be16b(h) ++ be16b(w) ++ Array[Byte](3) ++
          Array[Byte](1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
  }

  /** Deterministic COMPLETE PNG (signature, IHDR, one zlib-deflated IDAT,
    * IEND, real CRCs) with pixel value `(seed + x*3 + y*5 + c*11) mod 256`
    * — closed-form arithmetic an oracle can reproduce in SQL. Each scanline
    * cycles through filter type `y mod 5`, so decoding exercises every PNG
    * filter (None/Sub/Up/Average/Paeth), while the decoded pixels stay
    * filter-independent. colorType 2 (RGB) or 6 (RGBA), 8-bit. */
  def syntheticPngPixelBytes(seed: Long, w: Int, h: Int, colorType: Int): Array[Byte] = {
    require(colorType == 2 || colorType == 6, "colorType must be 2 (RGB) or 6 (RGBA)")
    val channels = if (colorType == 2) 3 else 4
    val stride = w * channels
    def v(x: Int, y: Int, c: Int): Int =
      (((seed + x * 3 + y * 5 + c * 11) % 256 + 256) % 256).toInt
    val raw = new Array[Byte]((stride + 1) * h)
    val prev = new Array[Int](stride) // unfiltered previous row
    val curRow = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < stride) { curRow(x) = v(x / channels, y, x % channels); x += 1 }
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      x = 0
      while (x < stride) {
        val left = if (x >= channels) curRow(x - channels) else 0
        val above = if (y > 0) prev(x) else 0
        val upLeft = if (y > 0 && x >= channels) prev(x - channels) else 0
        val enc = filter match {
          case 0 => curRow(x)
          case 1 => curRow(x) - left
          case 2 => curRow(x) - above
          case 3 => curRow(x) - ((left + above) >> 1)
          case 4 =>
            val p = left + above - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - above)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft
            curRow(x) - pred
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      System.arraycopy(curRow, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idatData = out.toByteArray
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val typeBytes = tpe.getBytes("US-ASCII")
      crc.update(typeBytes); crc.update(data)
      be32b(data.length) ++ typeBytes ++ data ++ be32b(crc.getValue.toInt)
    }
    Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", be32b(w) ++ be32b(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
      chunk("IDAT", idatData) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** ITU T.81 Annex K typical Huffman tables (luminance): the public
    * baseline tables every encoder ships. (counts per code length 1..16,
    * then the symbol list). */
  private val StdDcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array.range(0, 12)
  private val StdAcCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** symbol → (code, length), canonical assignment (same order the decoder
    * reconstructs from the DHT segment). */
  private def canonicalCodes(counts: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = Map.newBuilder[Int, (Int, Int)]
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) { m += vals(k) -> ((code, l)); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.result()
  }

  /** One COMPLETE deterministic baseline JPEG per doc for fixtures: every
    * 8×8 block is FLAT at value `16 + ((seed + bx·3 + by·5) mod 224)` —
    * encoded in the frequency domain as a DC-only quantized coefficient
    * with an all-8s quant table, so `dequant/8` is integral and the decoded
    * pixels equal the closed form EXACTLY (lossless by construction despite
    * a real lossy pipeline: real Annex-K Huffman codes, real byte stuffing,
    * real IDCT on the decode side). `color=true` emits a 3-component 4:4:4
    * scan with flat chroma (Cb=Cr=128 → R=G=B=Y under any correct YCbCr
    * rounding), so the oracle's closed form covers color too. */
  def syntheticJpegDcBytes(seed: Long, w: Int, h: Int, color: Boolean): Array[Byte] =
    syntheticJpegDcBytes(seed, w, h, color, subsample420 = false)

  /** `subsample420=true` (implies color) emits a 4:2:0 scan — luma 2×2,
    * chroma 1×1, the web/camera-dominant layout — with the SAME closed-form
    * flat luma blocks on the 8-pixel grid and flat chroma, so the decoded
    * pixels stay exact under ANY correct upsampling (flat 128 chroma
    * upsamples to 128 everywhere). */
  def syntheticJpegDcBytes(seed: Long, w: Int, h: Int, color: Boolean,
      subsample420: Boolean): Array[Byte] =
    syntheticJpegDcBytesWith(w, h, color, subsample420) { (bx, by) =>
      16 + (((seed + bx * 3 + by * 5) % 224 + 224) % 224).toInt
    }

  /** [[syntheticJpegDcBytes]] with CALLER-CHOSEN per-block luma values
    * (each must be 0..255): the fixture seam for images whose
    * flat-block layout is derived — e.g. an EXIF-rotated copy of a
    * closed-form upright image, where the stored block grid is the
    * display transform's inverse of the upright grid. Same exact-decode
    * construction: DC-only quantized coefficients under the all-8s
    * table. */
  def syntheticJpegDcBytesWith(w: Int, h: Int, color: Boolean,
      subsample420: Boolean)(blockVal: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "dims must be positive")
    require(!subsample420 || color, "4:2:0 requires a color scan")
    val out = new java.io.ByteArrayOutputStream()
    def wr(bs: Int*): Unit = bs.foreach(v => out.write(v & 0xFF))
    def seg(marker: Int, payload: Array[Int]): Unit = {
      wr(0xFF, marker); wr((payload.length + 2) >> 8, payload.length + 2)
      payload.foreach(v => out.write(v & 0xFF))
    }
    wr(0xFF, 0xD8) // SOI
    seg(0xE0, Array(0x4A, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // JFIF
    seg(0xDB, 0 +: Array.fill(64)(8)) // DQT table 0, all 8s
    val nComp = if (color) 3 else 1
    val lumaSampling = if (subsample420) 0x22 else 0x11
    seg(0xC0, Array(8, h >> 8, h, w >> 8, w, nComp) ++
      (1 to nComp).flatMap(c =>
        Seq(c, if (c == 1) lumaSampling else 0x11, 0))) // SOF0, qtable 0
    seg(0xC4, 0x00 +: (StdDcCounts ++ StdDcVals)) // DHT DC 0
    seg(0xC4, 0x10 +: (StdAcCounts ++ StdAcVals)) // DHT AC 0
    seg(0xDA, Array(nComp) ++ (1 to nComp).flatMap(c => Seq(c, 0x00)) ++
      Array(0, 63, 0)) // SOS
    val dcCodes = canonicalCodes(StdDcCounts, StdDcVals)
    val acCodes = canonicalCodes(StdAcCounts, StdAcVals)
    var acc = 0; var nbits = 0
    def emit(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    val dcPred = new Array[Int](nComp)
    def emitBlock(c: Int, s: Int): Unit = {
      val diff = s - dcPred(c); dcPred(c) = s
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (dcCode, dcLen) = dcCodes(t)
      emit(dcCode, dcLen)
      if (t > 0) emit(if (diff >= 0) diff else diff - 1 + (1 << t), t)
      val (eobCode, eobLen) = acCodes(0x00)
      emit(eobCode, eobLen) // all ACs zero
    }
    if (!subsample420) {
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          var c = 0
          while (c < nComp) {
            // quantized DC: dequant s*8, IDCT flat s, +128 = target value
            emitBlock(c, if (c == 0) blockVal(bx, by) - 128 else 0)
            c += 1
          }
          bx += 1
        }
        by += 1
      }
    } else {
      // T.81 A.2.3 interleave: per MCU, 2x2 luma blocks (row-major on the
      // 8-pixel luma grid) then one Cb and one Cr block
      val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var bv = 0
          while (bv < 2) {
            var bu = 0
            while (bu < 2) {
              emitBlock(0, blockVal(mx * 2 + bu, my * 2 + bv) - 128)
              bu += 1
            }
            bv += 1
          }
          emitBlock(1, 0)
          emitBlock(2, 0)
          mx += 1
        }
        my += 1
      }
    }
    if (nbits > 0) { // pad with 1s
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
    }
    wr(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE (SOF2) twin of [[syntheticJpegDcBytes]]: the SAME
    * closed-form DC-only flat blocks, re-encoded as a full progressive
    * scan script — interleaved DC first scan at point transform Al=1,
    * DC refinement delivering bit 0, then per-component AC band scans
    * [1,63] at Al=1 and their refinements at Al=0, each a pure EOB-run
    * stream over a CUSTOM AC table that carries the EOBn symbols
    * (0x00..0xE0 at length 4 — Annex K has no EOBn codes, so run
    * sharing across blocks needs its own DHT). Because the quantized
    * coefficients are identical to the baseline twin's, the decoded
    * pixels are bit-identical — the m25 gate joins the two through the
    * shared dHash. Supports grayscale, 4:4:4 color and 4:2:0. */
  def syntheticJpegProgressiveBytes(seed: Long, w: Int, h: Int,
      color: Boolean, subsample420: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "dims must be positive")
    require(!subsample420 || color, "4:2:0 requires a color scan")
    val out = new java.io.ByteArrayOutputStream()
    def wr(bs: Int*): Unit = bs.foreach(v => out.write(v & 0xFF))
    def seg(marker: Int, payload: Array[Int]): Unit = {
      wr(0xFF, marker); wr((payload.length + 2) >> 8, payload.length + 2)
      payload.foreach(v => out.write(v & 0xFF))
    }
    wr(0xFF, 0xD8)
    seg(0xE0, Array(0x4A, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xDB, 0 +: Array.fill(64)(8))
    val nComp = if (color) 3 else 1
    val lumaSampling = if (subsample420) 0x22 else 0x11
    seg(0xC2, Array(8, h >> 8, h, w >> 8, w, nComp) ++
      (1 to nComp).flatMap(c =>
        Seq(c, if (c == 1) lumaSampling else 0x11, 0))) // SOF2
    seg(0xC4, 0x00 +: (StdDcCounts ++ StdDcVals)) // DHT DC 0 (Annex K)
    // custom AC table: EOB0..EOB14 (0x00, 0x10, ..., 0xE0), length 4
    val eobnVals = (0 to 14).map(_ << 4).toArray
    val eobnCounts = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    seg(0xC4, 0x10 +: (eobnCounts ++ eobnVals))
    val dcCodes = canonicalCodes(StdDcCounts, StdDcVals)
    val acCodes = canonicalCodes(eobnCounts, eobnVals)
    // bit emitter shared across scans; flush() pads the tail with 1s
    var acc = 0; var nbits = 0
    def emit(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
    def blockVal(bx: Int, by: Int): Int =
      16 + (((seed + bx * 3 + by * 5) % 224 + 224) % 224).toInt
    // quantized DC per component over its PADDED block grid — the
    // baseline twin's construction verbatim
    val hMaxL = if (subsample420) 2 else 1
    val mcusX = (w + 8 * hMaxL - 1) / (8 * hMaxL)
    val mcusY = (h + 8 * hMaxL - 1) / (8 * hMaxL)
    def dcOf(c: Int, bx: Int, by: Int): Int =
      if (c == 0) blockVal(bx, by) - 128 else 0
    def sosHeader(comps: Seq[Int], ssV: Int, seV: Int, ahV: Int,
        alV: Int): Unit =
      seg(0xDA, Array(comps.length) ++
        comps.flatMap(c => Seq(c + 1, 0x00)) ++ Array(ssV, seV,
          (ahV << 4) | alV))
    // --- scan 1: DC first, interleaved, Al=1 (diffs of dc >> 1) ---
    sosHeader(0 until nComp, 0, 0, 0, 1)
    val dcPred = new Array[Int](nComp)
    def emitDcFirst(c: Int, s: Int): Unit = {
      val v = s >> 1 // arithmetic: (v << 1) | (s & 1) == s
      val diff = v - dcPred(c); dcPred(c) = v
      val t = if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(t)
      emit(code, len)
      if (t > 0) emit(if (diff >= 0) diff else diff - 1 + (1 << t), t)
    }
    def forEachInterleavedBlock(f: (Int, Int, Int) => Unit): Unit =
      if (!subsample420) {
        val bw = (w + 7) / 8; val bh = (h + 7) / 8
        for (by <- 0 until bh; bx <- 0 until bw; c <- 0 until nComp)
          f(c, bx, by)
      } else {
        for (my <- 0 until mcusY; mx <- 0 until mcusX) {
          for (bv <- 0 until 2; bu <- 0 until 2)
            f(0, mx * 2 + bu, my * 2 + bv)
          f(1, mx, my); f(2, mx, my)
        }
      }
    forEachInterleavedBlock((c, bx, by) => emitDcFirst(c, dcOf(c, bx, by)))
    flush()
    // --- scan 2: DC refinement, Al=0 (raw bit 0 of each dc) ---
    sosHeader(0 until nComp, 0, 0, 1, 0)
    forEachInterleavedBlock((c, bx, by) =>
      emit(dcOf(c, bx, by) & 1, 1))
    flush()
    // --- per-component AC band scans: all-zero ACs as EOBn runs ---
    def compBlocks(c: Int): Int =
      if (!subsample420) ((w + 7) / 8) * ((h + 7) / 8)
      else if (c == 0) ((w + 7) / 8) * ((h + 7) / 8)
      else (((w + 1) / 2 + 7) / 8) * (((h + 1) / 2 + 7) / 8)
    def emitEobRuns(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        val run = math.min(n, 32767)
        val r = 31 - Integer.numberOfLeadingZeros(run)
        val (code, len) = acCodes(r << 4)
        emit(code, len)
        if (r > 0) emit(run - (1 << r), r)
        n -= run
      }
    }
    for (c <- 0 until nComp) { // AC first, Al=1
      sosHeader(Seq(c), 1, 63, 0, 1)
      emitEobRuns(compBlocks(c))
      flush()
    }
    for (c <- 0 until nComp) { // AC refinement, Al=0 (zero history)
      sosHeader(Seq(c), 1, 63, 1, 0)
      emitEobRuns(compBlocks(c))
      flush()
    }
    wr(0xFF, 0xD9)
    out.toByteArray
  }

  /** Deterministic minimal MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)) —
    * valid box structure, no media data. Width/height stored 16.16. */
  def syntheticMp4Bytes(w: Int, h: Int, timescale: Int, duration: Long): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32b(8 + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32b(0))
    val mvhd = box("mvhd", be32b(0) /* v0+flags */ ++ be32b(0) ++ be32b(0) ++
      be32b(timescale) ++ be32b(duration.toInt) ++ Array.fill[Byte](80)(0))
    val tkhd = box("tkhd", be32b(0) ++ be32b(0) ++ be32b(0) ++ be32b(1) ++
      be32b(0) ++ be32b(duration.toInt) ++ Array.fill[Byte](52)(0) ++
      be32b(w << 16) ++ be32b(h << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** A playable-shape MP4 WITH a sample table and real frame payloads:
    * `ftyp ++ mdat ++ moov(mvhd, trak(tkhd, mdia(minf(stbl(stts, stsz,
    * stsc, stco)))))`. Frames are uniform `frameSize` bytes at a constant
    * `delta`-tick duration; frame `f`'s byte `j` is
    * `(seed + f·31 + j·7) mod 256` — a closed form an oracle replays.
    * mdat precedes moov so the single stco chunk offset is known without
    * a fix-up pass. */
  def syntheticMp4WithSamples(w: Int, h: Int, timescale: Int, delta: Int,
      nFrames: Int, frameSize: Int, seed: Long): Array[Byte] = {
    require(nFrames > 0 && frameSize > 0)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32b(8 + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32b(0))
    val frames = Array.tabulate(nFrames * frameSize) { i =>
      val f = i / frameSize; val j = i % frameSize
      ((seed + f * 31L + j * 7L) % 256L).toByte
    }
    val mdat = box("mdat", frames)
    val mdatPayloadOffset = ftyp.length + 8
    val duration = nFrames.toLong * delta
    val mvhd = box("mvhd", be32b(0) ++ be32b(0) ++ be32b(0) ++
      be32b(timescale) ++ be32b(duration.toInt) ++ Array.fill[Byte](80)(0))
    val tkhd = box("tkhd", be32b(0) ++ be32b(0) ++ be32b(0) ++ be32b(1) ++
      be32b(0) ++ be32b(duration.toInt) ++ Array.fill[Byte](52)(0) ++
      be32b(w << 16) ++ be32b(h << 16))
    val stts = box("stts", be32b(0) ++ be32b(1) ++ be32b(nFrames) ++ be32b(delta))
    val stsz = box("stsz", be32b(0) ++ be32b(frameSize) ++ be32b(nFrames))
    val stsc = box("stsc", be32b(0) ++ be32b(1) ++ be32b(1) ++
      be32b(nFrames) ++ be32b(1))
    val stco = box("stco", be32b(0) ++ be32b(1) ++ be32b(mdatPayloadOffset))
    val stbl = box("stbl", stts ++ stsz ++ stsc ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    ftyp ++ mdat ++ box("moov", mvhd ++ box("trak", tkhd ++ mdia))
  }

  /** Every `k`-th video frame's metadata + content checksum, from the
    * container's own sample table: walk to `stbl`, read stts (timing),
    * stsz (sizes), stco (data location), and slice the k-th samples out
    * of mdat — the frame-sampling primitive of video featurization,
    * minus only the codec (a decoder slots in where the checksum is
    * computed; this container walk IS the distributed-plumbing part).
    *
    * Support envelope (None otherwise, callers tag and fall back):
    * version-0 boxes, one sample-table track, single-chunk stco, uniform
    * or per-sample stsz, any number of stts runs. Timestamps are
    * integer `ticks·1000/timescale` milliseconds against the MOVIE
    * timescale (mvhd — the fixture convention). Returns
    * `(frameIdx, tsMs, size, byteSum)` per sampled frame. */
  def mp4FrameSample(b: Array[Byte], k: Int): Option[Seq[(Int, Long, Int, Long)]] = {
    require(k >= 1, s"sampling step must be >= 1, got $k")
    mp4SampleTable(b).map { case (timescale, offsets, szs, ticks) =>
      (0 until szs.size by k).map { f =>
        val off = offsets(f).toInt
        var sum = 0L
        var j = 0
        while (j < szs(f)) { sum += u8(b, off + j); j += 1 }
        (f, ticks(f) * 1000L / timescale, szs(f), sum)
      }
    }
  }

  /** Shot-boundary detection over the container's own frames — the cut
    * detector of video curation (dedup at the shot grain, per-shot
    * sampling, trailer/credit trimming): frame `f` starts a new shot
    * when the mean absolute byte difference against frame `f−1`
    * crosses the threshold, `sumAbsDiff · 100 ≥ threshold100 · nBytes`
    * compared over `min(size_{f−1}, size_f)` bytes — integer
    * arithmetic end to end, so any engine replaying the frame bytes
    * draws the same cuts. This is the standard pixel-difference
    * detector minus only the codec (a real decoder slots in where the
    * byte reads are; the container walk and the detection rule ARE the
    * distributed-plumbing part, exactly [[mp4FrameSample]]'s
    * contract). Frame 0 always opens shot 0. Returns
    * `(shotIx, startFrame, startTsMs)` per detected shot; None on
    * anything outside the sample-table support envelope. */
  def mp4ShotBoundaries(b: Array[Byte],
      threshold100: Int): Option[Seq[(Int, Int, Long)]] = {
    require(threshold100 >= 1, s"threshold100 must be >= 1, got $threshold100")
    mp4SampleTable(b).map { case (timescale, offsets, szs, ticks) =>
      val starts = scala.collection.mutable.ArrayBuffer(0)
      var f = 1
      while (f < szs.size) {
        val n = math.min(szs(f - 1), szs(f))
        val oa = offsets(f - 1).toInt
        val ob = offsets(f).toInt
        var sum = 0L
        var j = 0
        while (j < n) {
          val d = u8(b, oa + j) - u8(b, ob + j)
          sum += math.abs(d)
          j += 1
        }
        if (n > 0 && sum * 100L >= threshold100.toLong * n) starts += f
        f += 1
      }
      starts.toSeq.zipWithIndex.map { case (sf, ix) =>
        (ix, sf, ticks(sf) * 1000L / timescale)
      }
    }
  }

  /** The shared stbl parse behind [[mp4FrameSample]] and
    * [[mp4ShotBoundaries]]: (movie timescale, per-sample byte offsets,
    * sizes, cumulative start ticks), None outside the support
    * envelope. */
  private def mp4SampleTable(
      b: Array[Byte]): Option[(Long, Seq[Long], Seq[Int], Seq[Long])] = {
    if (b == null || b.length < 12 ||
        new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    var timescale = 0L
    var sttsRuns = Seq.empty[(Int, Int)]  // (count, delta)
    var uniformSize = 0
    var sizes = Seq.empty[Int]
    var nSamples = 0
    var chunkOffset = -1L
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (i + 8 <= end) {
        val sz0 = be32(b, i).toLong & 0xFFFFFFFFL
        val sz = if (sz0 == 0L) (end - i).toLong else sz0
        if (sz < 8) return
        val boxEnd = math.min(end.toLong, i + sz).toInt
        if (boxEnd <= i) return
        // every declared count is validated against ITS OWN box extent
        // before any entry read: a malformed payload must produce None
        // (the WAV/PNG walkers' contract), never an out-of-bounds read
        // on a declared-but-absent table
        var corrupt = false
        new String(b, i + 4, 4, "US-ASCII") match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" => walk(i + 8, boxEnd)
          case "mvhd" if boxEnd >= i + 32 && u8(b, i + 8) == 0 =>
            timescale = be32(b, i + 20).toLong & 0xFFFFFFFFL
          case "stts" if boxEnd >= i + 16 && u8(b, i + 8) == 0 =>
            val n = be32(b, i + 12)
            if (n < 0 || i + 16L + n * 8L > boxEnd) corrupt = true
            else sttsRuns = (0 until n).map(e =>
              (be32(b, i + 16 + e * 8), be32(b, i + 20 + e * 8)))
          case "stsz" if boxEnd >= i + 20 && u8(b, i + 8) == 0 =>
            uniformSize = be32(b, i + 12)
            nSamples = be32(b, i + 16)
            if (uniformSize == 0) {
              if (nSamples < 0 || i + 20L + nSamples * 4L > boxEnd) corrupt = true
              else sizes = (0 until nSamples).map(e => be32(b, i + 20 + e * 4))
            }
          case "stco" if boxEnd >= i + 20 && u8(b, i + 8) == 0 &&
              be32(b, i + 12) == 1 =>
            chunkOffset = be32(b, i + 16).toLong & 0xFFFFFFFFL
          case _ => ()
        }
        if (corrupt) { nSamples = -1; return }
        i = boxEnd
      }
    }
    walk(0, b.length)
    if (timescale <= 0 || nSamples <= 0 || chunkOffset < 0 ||
        sttsRuns.isEmpty || sttsRuns.exists { case (n, d) => n < 0 || d < 0 })
      return None
    val szs = if (uniformSize > 0) Seq.fill(nSamples)(uniformSize) else sizes
    if (szs.size != nSamples || szs.exists(_ < 0)) return None
    val offsets = szs.scanLeft(chunkOffset)(_ + _)
    if (offsets.last > b.length) return None // truncated mdat
    val ticks = sttsRuns.flatMap { case (n, d) => Seq.fill(n)(d.toLong) }
      .scanLeft(0L)(_ + _)
    if (ticks.size < nSamples) return None
    Some((timescale, offsets, szs, ticks))
  }

  private val frameSampleType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("frames", ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("ts_ms", LongType, nullable = false),
      StructField("size", IntegerType, nullable = false),
      StructField("byte_sum", LongType, nullable = false))), containsNull = false),
      nullable = true)))

  /** Batched frame sampling; `undecodable` (null frames) outside the
    * support envelope. */
  def decodeMp4FrameSample(df: DataFrame, k: Int,
      payloadCol: String = "payload",
      outCol: String = "frame_sample"): DataFrame =
    decodeMeta(df, payloadCol, outCol, frameSampleType) { bytes =>
      mp4FrameSample(bytes, k) match {
        case Some(frames) =>
          Row("mp4", frames.map { case (f, ts, sz, sum) => Row(f, ts, sz, sum) })
        case None => Row("undecodable", null)
      }
    }

  private val shotSampleType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("shots", ArrayType(StructType(Seq(
      StructField("shot_ix", IntegerType, nullable = false),
      StructField("start_frame", IntegerType, nullable = false),
      StructField("start_ms", LongType, nullable = false))), containsNull = false),
      nullable = true)))

  /** Batched shot-boundary detection ([[mp4ShotBoundaries]]);
    * `undecodable` (null shots) outside the support envelope. */
  def decodeMp4Shots(df: DataFrame, threshold100: Int,
      payloadCol: String = "payload",
      outCol: String = "shot_sample"): DataFrame =
    decodeMeta(df, payloadCol, outCol, shotSampleType) { bytes =>
      mp4ShotBoundaries(bytes, threshold100) match {
        case Some(shots) =>
          Row("mp4", shots.map { case (ix, sf, ts) => Row(ix, sf, ts) })
        case None => Row("undecodable", null)
      }
    }

  /** [[syntheticMp4WithSamples]] with SHOT structure: frame `f` belongs
    * to shot `s = f / shotLen`, and its byte `j` is
    * `((docSeed·7 + (s+1)·101 + 13) mod 251 + f·31 + j·7) mod 256` —
    * consecutive frames inside a shot differ by the small `f·31`
    * drift, frames across a cut additionally jump by the shot-seed
    * delta; both are closed forms an oracle replays byte for byte. */
  def syntheticMp4WithShots(w: Int, h: Int, timescale: Int, delta: Int,
      nFrames: Int, frameSize: Int, shotLen: Int, docSeed: Long): Array[Byte] = {
    require(nFrames > 0 && frameSize > 0 && shotLen > 0)
    val base = syntheticMp4WithSamples(w, h, timescale, delta, nFrames,
      frameSize, seed = 0L)
    // overwrite the mdat payload in place (it directly follows
    // ftyp(16) + mdat header(8) by the builder's construction)
    val mdatOff = 16 + 8
    var i = 0
    while (i < nFrames * frameSize) {
      val f = i / frameSize
      val j = i % frameSize
      val s = f / shotLen
      val shotSeed = (docSeed * 7L + (s + 1L) * 101L + 13L) % 251L
      base(mdatOff + i) = ((shotSeed + f * 31L + j * 7L) % 256L).toByte
      i += 1
    }
    base
  }

  /** Deterministic synthetic WAV header (RIFF + fmt + data chunk headers
    * with the declared sizes, no sample payload — 44 bytes) for fixtures
    * and tests. */
  def syntheticWavBytes(rate: Int, channels: Int, bits: Int, nSamples: Long): Array[Byte] = {
    val blockAlign = channels * bits / 8
    require(nSamples * blockAlign <= Int.MaxValue - 36L,
      s"data size ${nSamples * blockAlign} overflows the 32-bit RIFF size field")
    val dataSize = (nSamples * blockAlign).toInt
    "RIFF".getBytes("US-ASCII") ++ le32b(36 + dataSize) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32b(16) ++ le16b(1) ++ le16b(channels) ++
      le32b(rate) ++ le32b(rate * blockAlign) ++ le16b(blockAlign) ++ le16b(bits) ++
      "data".getBytes("US-ASCII") ++ le32b(dataSize)
  }
}
