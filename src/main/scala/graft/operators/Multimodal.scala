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
  def wavPcm16Stats(b: Array[Byte]): Option[(Long, Double, Double)] = {
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
      else {
        val n = dataSize / 2
        var sum = 0L
        var sumSq = 0L
        var j = 0L
        while (j < n) {
          val p = (dataOff + 2 * j).toInt
          val v = (((b(p + 1) & 0xFF) << 8) | (b(p) & 0xFF)).toShort.toLong
          sum += v; sumSq += v * v
          j += 1
        }
        Some((n, sum.toDouble / n, math.sqrt(sumSq.toDouble / n)))
      }
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
  def pngPixelStats(b: Array[Byte]): Option[(Int, Int, Int, Array[Double], Array[Double])] = {
    if (b == null || b.length < 45 ||
        !startsWith(b, 0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) return None
    var w = 0; var h = 0; var channels = 0
    var ok = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var stop = false
    while (!stop && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 12 + len > b.length) return None // corrupt length
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
    val sum = new Array[Long](channels)
    val sumSq = new Array[Long](channels)
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
        val b8 = v & 0xFF
        pixels(rowOut + x) = b8.toByte
        val c = x % channels
        sum(c) += b8
        sumSq(c) += b8.toLong * b8
        x += 1
      }
      y += 1
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
    Some((w, h, channels, mean, std))
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
