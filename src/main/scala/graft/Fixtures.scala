package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes partitioned layouts from the flat driver testdata so the
  * fsql scan path (discovery, grammar generation, range pruning) runs over
  * realistic trees while the DuckDB oracle checks values (FIXTURES.md §B).
  *
  * Layouts are cached per (name, sfDir) under /tmp and reused across queries
  * in one JVM (and across runs — guarded by a _GRAFT_DONE marker).
  */
object Fixtures {

  private val base = "/tmp/graft_fixtures"

  /** Bump when any layout's shape changes — keys the cache so a new build
    * never reuses a stale tree written by older fixture code. */
  private val fixtureVersion = "v2"

  private def cached(name: String, sfDir: String)(build: String => Unit): String = synchronized {
    val dir = s"$base/${name}_${fixtureVersion}_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val marker = Paths.get(dir, "_GRAFT_DONE")
    if (!Files.exists(marker)) {
      build(dir)
      Files.createDirectories(Paths.get(dir))
      Files.writeString(marker, "ok")
    }
    dir
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet's `ts` has shipped as TIMESTAMP(NANOS) and as
    * TIMESTAMP(MICROS, NTZ) across driver testdata generations; see
    * [[graft.functions.NanosTimestamp]] for the type-adaptive rebuild. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.NanosTimestamp.enable(spark)
    graft.functions.NanosTimestamp.rebuild(
      spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** lineitem partitioned hive-style by l_returnflag / l_linestatus. */
  def hiveLineitem(spark: SparkSession, sfDir: String): String =
    cached("hive_lineitem", sfDir) { dir =>
      table(spark, sfDir, "lineitem")
        .write.mode("overwrite")
        .partitionBy("l_returnflag", "l_linestatus").parquet(dir)
    }

  /** orders partitioned hive-style by year=/month=/day= of o_orderdate
    * (month/day unpadded, matching the reference's date-range trees). */
  def ymdOrders(spark: SparkSession, sfDir: String): String =
    cached("ymd_orders", sfDir) { dir =>
      table(spark, sfDir, "orders")
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("month", month(col("o_orderdate")))
        .withColumn("day", dayofmonth(col("o_orderdate")))
        .write.mode("overwrite")
        .partitionBy("year", "month", "day").parquet(dir)
    }

  /** orders in a VALUE-ONLY layout `<year>/data.parquet` (no k= prefix, one
    * deterministically-named file per dir) for the FixedColumnsParser path. */
  def valueOnlyOrders(spark: SparkSession, sfDir: String): String =
    cached("valueonly_orders", sfDir) { dir =>
      val orders = table(spark, sfDir, "orders").withColumn("yr", year(col("o_orderdate")))
      val years = orders.select("yr").distinct().collect().map(_.getInt(0)).sorted
      for (y <- years) {
        val sub = orders.filter(col("yr") === y).drop("yr")
        graft.api.Graft.writeObject(sub.coalesce(1), s"$dir/$y/data.parquet")
      }
    }

  /** part re-materialized as csv under a single partition dir. */
  def csvPart(spark: SparkSession, sfDir: String): String =
    cached("csv_part", sfDir) { dir =>
      graft.api.Graft.writeObject(
        table(spark, sfDir, "part").coalesce(1), s"$dir/src=csv/part.csv")
    }

  /** customer re-materialized as json-lines under a single partition dir. */
  def jsonCustomer(spark: SparkSession, sfDir: String): String =
    cached("json_customer", sfDir) { dir =>
      graft.api.Graft.writeObject(
        table(spark, sfDir, "customer").coalesce(1), s"$dir/src=json/customer.json")
    }

  /** nation re-materialized as a real xlsx workbook (via the dependency-free
    * writer) under a single partition dir, for the xlsx scan path. */
  def xlsxNation(spark: SparkSession, sfDir: String): String =
    cached("xlsx_nation", sfDir) { dir =>
      val df = table(spark, sfDir, "nation").orderBy("n_nationkey")
      val header = df.schema.fieldNames.toSeq
      val rows = df.collect().map(_.toSeq).toSeq
      Files.createDirectories(Paths.get(s"$dir/src=xlsx"))
      val out = new java.io.FileOutputStream(s"$dir/src=xlsx/nation.xlsx")
      try graft.sources.Xlsx.write(out, header, rows) finally out.close()
    }

  /** documents' doc_ids paired with REAL synthetic image headers (valid
    * PNG/GIF/BMP/JPEG bytes; format rotates by doc_id % 4, dimensions derive
    * from doc_id) so the multimodal decode parses real bytes and the oracle
    * verifies the parse inverts the construction arithmetic. */
  def mediaDocs(spark: SparkSession, sfDir: String): String =
    cached("media_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val formats = Array("png", "gif", "bmp", "jpeg")
      val rows = ids.toSeq.map { id =>
        val fmt = formats((id % 4).toInt)
        (id, graft.operators.Multimodal.syntheticImageBytes(
          fmt, (id % 640).toInt + 1, ((id * 7) % 480).toInt + 1))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** Full-PNG analog of [[mediaDocs]]: one COMPLETE deterministic PNG per
    * doc (real deflated pixel data, every scanline filter type), dims and
    * color type derived from doc_id so the oracle reproduces the decoded
    * per-channel stats from the closed-form pixel arithmetic. */
  def pngPixelDocs(spark: SparkSession, sfDir: String): String =
    cached("png_pixel_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w = (id % 13).toInt + 4
        val h = (id % 11).toInt + 4
        val colorType = if (id % 2 == 0) 2 else 6
        (id, graft.operators.Multimodal.syntheticPngPixelBytes(id, w, h, colorType))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** GIF/WebP re-encodes of [[pngPixelDocs]]' EXACT pixels (the
    * `(id + x·3 + y·5 + c·11) mod 256` closed form at the same dims):
    * even doc_ids a single-frame GIF (the ≤224-pixel images stay under
    * GIF's 256-color ceiling by construction), odd doc_ids a VP8L WebP
    * with the 4th-channel alpha following the same formula — so each
    * web image dHashes IDENTICALLY to its PNG twin and the
    * cross-format join is replayable in closed form. The WebP encoding
    * ROTATES through the real-web VP8L envelope by id%8: 1 →
    * literal-only (id%16==9 → the PALETTE/color-indexing transform
    * with pixel bundling — every fixture image has ≤224 pixels, so
    * ≤256 distinct colors by construction), 3 → color cache, 5 →
    * subtract-green + predictor, 7 → cache + predictor + cross-color
    * + subtract-green — the gate goes red if the decoder mishandles
    * any of them, with the oracle unchanged (same pixels either
    * way). */
  def webpGifDocs(spark: SparkSession, sfDir: String): String =
    cached("webp_gif_docs3", sfDir) { dir =>
      import spark.implicits._
      import graft.functions.ImageCodecs
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w = (id % 13).toInt + 4
        val h = (id % 11).toInt + 4
        def v(x: Int, y: Int, c: Int): Int =
          (((id + x * 3 + y * 5 + c * 11) % 256 + 256) % 256).toInt
        val payload =
          if (id % 2 == 0) {
            val rgb = Array.tabulate(w * h * 3) { i =>
              val p = i / 3; v(p % w, p / w, i % 3).toByte
            }
            ImageCodecs.gifEncode(w, h, rgb)
          } else {
            val rgba = Array.tabulate(w * h * 4) { i =>
              val p = i / 4; v(p % w, p / w, i % 4).toByte
            }
            (id % 8).toInt match {
              case 1 if id % 16 == 9 =>
                ImageCodecs.webpEncodePalette(w, h, rgba)
              case 1 => ImageCodecs.webpEncode(w, h, rgba)
              case 3 => ImageCodecs.webpEncode(w, h, rgba,
                cacheBits = (id % 11).toInt + 1, predictor = false,
                colorTransform = false, subtractGreen = false)
              case 5 => ImageCodecs.webpEncode(w, h, rgba,
                cacheBits = 0, predictor = true,
                colorTransform = false, subtractGreen = true)
              case _ => ImageCodecs.webpEncode(w, h, rgba,
                cacheBits = 6, predictor = true,
                colorTransform = true, subtractGreen = true)
            }
          }
        (id, payload)
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(dir)
    }

  /** The PNG closed-form pixels stored under a planted EXIF-style
    * rotation: per doc, the upright `(id + x·3 + y·5 + c·11) mod 256`
    * image is INVERSE-transformed by orientation doc_id%8+1 and stored
    * with that orientation tag — so orientation-normalizing the stored
    * pixels must reproduce the upright image exactly, and the
    * normalized dHash equals the m11 PNG closed form. Schema:
    * `(doc_id, w, h, channels, orientation, px)` with (w, h) the
    * STORED dims (swapped for orientations 5–8). */
  def orientedPixelDocs(spark: SparkSession, sfDir: String): String =
    cached("oriented_pixel_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val wu = (id % 13).toInt + 4
        val hu = (id % 11).toInt + 4
        val o = (id % 8).toInt + 1
        val upright = Array.tabulate(wu * hu * 3) { i =>
          val p = i / 3; val c = i % 3
          (((id + (p % wu) * 3 + (p / wu) * 5 + c * 11) % 256 + 256) % 256)
            .toByte
        }
        // stored = D_o^{-1}(upright): write each upright pixel to the
        // stored coordinate the display transform reads it from
        val swap = o >= 5
        val ws = if (swap) hu else wu
        val hs = if (swap) wu else hu
        val stored = new Array[Byte](ws * hs * 3)
        var y = 0
        while (y < hu) {
          var x = 0
          while (x < wu) {
            val (sx, sy) = o match {
              case 1 => (x, y)
              case 2 => (ws - 1 - x, y)
              case 3 => (ws - 1 - x, hs - 1 - y)
              case 4 => (x, hs - 1 - y)
              case 5 => (y, x)
              case 6 => (y, hs - 1 - x)
              case 7 => (ws - 1 - y, hs - 1 - x)
              case _ => (ws - 1 - y, x)
            }
            var c = 0
            while (c < 3) {
              stored((sy * ws + sx) * 3 + c) = upright((y * wu + x) * 3 + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        (id, ws, hs, 3, o, stored)
      }
      rows.toDF("doc_id", "w", "h", "channels", "orientation", "px")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** [[jpegPixelDocs]]' bytes wrapped with a planted APP1 Exif segment
    * (big-endian TIFF, deterministic tags): orientation doc_id%8+1, a
    * zero-padded DateTime, Make `cam<doc_id%5>`, and on doc_id%3==0 a
    * GPS IFD with EXACTLY-DIVIDING rationals (lat doc_id%90 degrees,
    * lon (doc_id%180)·3/3) so the microdegree arithmetic replays in
    * closed form. */
  def exifJpegDocs(spark: SparkSession, sfDir: String): String =
    cached("exif_jpeg_docs", sfDir) { dir =>
      import spark.implicits._
      import graft.functions.ExifImpl
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w = (id % 13).toInt + 4
        val h = (id % 11).toInt + 4
        val base = graft.operators.Multimodal.syntheticJpegDcBytes(
          id, w, h, color = id % 2 == 1)
        val dt = f"2024:01:${id % 28 + 1}%02d 12:${id % 60}%02d:00"
        val gps = if (id % 3 == 0)
          Some((id % 90, 1L, (id % 180) * 3, 3L)) else None
        (id, ExifImpl.withExif(base, (id % 8).toInt + 1, dt,
          s"cam${id % 5}", gps))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(dir)
    }

  /** Full-JPEG analog of [[pngPixelDocs]]: one COMPLETE deterministic
    * baseline JPEG per doc (real Annex-K Huffman entropy data, byte
    * stuffing, DC-only frequency-domain construction so decode is exact),
    * dims and grayscale/4:4:4-color rotation derived from doc_id so the
    * oracle reproduces the decoded per-channel stats in closed form. */
  def jpegPixelDocs(spark: SparkSession, sfDir: String): String =
    cached("jpeg_pixel_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w = (id % 13).toInt + 4
        val h = (id % 11).toInt + 4
        (id, graft.operators.Multimodal.syntheticJpegDcBytes(id, w, h,
          color = id % 2 == 1))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** PROGRESSIVE (SOF2) re-encodes of [[jpegPixelDocs]]' closed form:
    * same dims and flat DC-only blocks per doc, multi-scan script (DC
    * at point transform 1 + refinement, per-component AC bands at
    * Al=1 + refinements, EOB runs over a custom EOBn DHT). Even ids
    * grayscale, id%4==1 4:4:4 color, id%4==3 the 4:2:0 layout — every
    * variant decodes to pixels bit-identical to the baseline twin
    * (same quantized coefficients), so the m25 cross-join replays in
    * the m6 closed form. */
  def progressiveJpegDocs(spark: SparkSession, sfDir: String): String =
    cached("progressive_jpeg_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w = (id % 13).toInt + 4
        val h = (id % 11).toInt + 4
        val payload =
          if (id % 2 == 0)
            graft.operators.Multimodal.syntheticJpegProgressiveBytes(
              id, w, h, color = false)
          else if (id % 4 == 1)
            graft.operators.Multimodal.syntheticJpegProgressiveBytes(
              id, w, h, color = true)
          else
            graft.operators.Multimodal.syntheticJpegProgressiveBytes(
              id, w, h, color = true, subsample420 = true)
        (id, payload)
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(dir)
    }

  /** WebP payloads across the container's REAL spread: even ids a
    * VP8L lossless re-encode (flat closed-form pixels at the m11
    * dims), odd ids a lossy VP8 KEY-FRAME whose header carries
    * planted curation fields — dims, version, quantizer index,
    * filter setup, partition count, quant deltas — built by the
    * from-scratch RFC 6386 bool encoder; id%7==0 adds a segmentation
    * sub-header and id%5==0 a loop-filter-adjustment block (the
    * parser must WALK them to land the quant fields), and id%8==5
    * wraps the frame in a VP8X extended container with canvas dims.
    * The m27 oracle replays every field in closed form. */
  def webpLossyDocs(spark: SparkSession, sfDir: String): String =
    cached("webp_lossy_docs2", sfDir) { dir =>
      import spark.implicits._
      import graft.functions.{ExifImpl, ImageCodecs, Vp8}
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        // id%3==0 docs carry an EXIF chunk (bare TIFF on id%6==3,
        // "Exif\0\0"-prefixed on id%6==0 — both wild forms), GPS with
        // m23's exactly-dividing rationals on id%9==0, inside a VP8X
        // container with the EXIF feature flag
        val hasExif = id % 3 == 0
        val exifChunk: Option[Array[Byte]] =
          if (!hasExif) None
          else {
            val gps = if (id % 9 == 0)
              Some((id % 90, 1L, (id % 180) * 3, 3L)) else None
            val body = ExifImpl.buildTiffBody((id % 8).toInt + 1,
              f"2024:03:${id % 28 + 1}%02d 09:${id % 60}%02d:00",
              s"cam${id % 5}", gps)
            Some(if (id % 6 == 0)
              "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ body
            else body)
          }
        def wrap(w: Int, h: Int, frameId: String,
            frame: Array[Byte], forceX: Boolean): Array[Byte] = {
          val needX = forceX || hasExif
          val chunks = Seq.newBuilder[(String, Array[Byte])]
          if (needX)
            chunks += (("VP8X",
              ImageCodecs.vp8xPayload(w, h, exifFlag = hasExif)))
          chunks += ((frameId, frame))
          exifChunk.foreach(c => chunks += (("EXIF", c)))
          ImageCodecs.wrapWebp(chunks.result())
        }
        val payload =
          if (id % 2 == 0) {
            val w = (id % 13).toInt + 4
            val h = (id % 11).toInt + 4
            val rgba = Array.tabulate(w * h * 4)(i =>
              (((id + i % 4 * 11) % 256 + 256) % 256).toByte)
            val full = ImageCodecs.webpEncode(w, h, rgba)
            if (!hasExif) full
            else {
              val sz = (full(16) & 0xff) | ((full(17) & 0xff) << 8) |
                ((full(18) & 0xff) << 16) | ((full(19) & 0xff) << 24)
              wrap(w, h, "VP8L", full.slice(20, 20 + sz), forceX = false)
            }
          } else {
            val w = (id % 977).toInt + 16
            val h = ((id * 3) % 761).toInt + 16
            val chunk = Vp8.buildKeyFrameHeader(w, h,
              version = (id % 4).toInt,
              filterType = ((id / 2) % 2).toInt,
              filterLevel = (id % 64).toInt,
              sharpness = (id % 8).toInt,
              log2Parts = (id % 4).toInt,
              yAcQi = (id % 128).toInt,
              yDcDelta = (id % 15).toInt - 7,
              uvAcDelta = (id % 9).toInt - 4,
              withSegmentation = id % 7 == 0,
              withLfAdjust = id % 5 == 0)
            if (id % 8 == 5 || hasExif)
              wrap(w, h, "VP8 ", chunk, forceX = id % 8 == 5)
            else ImageCodecs.wrapWebp(Seq(("VP8 ", chunk)))
          }
        (id, payload)
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(dir)
    }

  /** Animated GIFs with planted frame structure: id%20+1 frames of
    * uniform delay id%30+2 centiseconds, a Netscape loop extension of
    * id%10 iterations on id%4==0, logical screen id-derived — the
    * closed-form animation metadata the m30 oracle replays. */
  def gifAnimDocs(spark: SparkSession, sfDir: String): String =
    cached("gif_anim_docs", sfDir) { dir =>
      import spark.implicits._
      import graft.functions.ImageCodecs
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val frames = (id % 20).toInt + 1
        val delay = (id % 30).toInt + 2
        (id, ImageCodecs.gifAnimBytes((id % 300).toInt + 10,
          (id % 200).toInt + 10, Seq.fill(frames)(delay),
          loop = if (id % 4 == 0) (id % 10).toInt else -1))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(dir)
    }

  /** MP3 streams with planted headers: per doc a Layer III stream
    * whose version rotates V1/V2/V2.5 (id%3), bitrate index id%14+1,
    * sample-rate index (id/3)%3, channel mode id%4, id%50+5 frames
    * with padding alternating on odd ids; id%5==0 alternates a second
    * bitrate index (a VBR stream), id%3==0 wraps in an ID3v2 tag of
    * id%100 payload bytes. Every meta field replays in closed form
    * (frame walk ⇒ exact duration). */
  def mp3Docs(spark: SparkSession, sfDir: String): String =
    cached("mp3_docs", sfDir) { dir =>
      import spark.implicits._
      import graft.functions.Mp3
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val verBits = (id % 3).toInt match {
          case 0 => 3; case 1 => 2; case _ => 0
        }
        val bitrateIx = (id % 14).toInt + 1
        val payload = Mp3.build(
          verBits = verBits,
          bitrateIx = bitrateIx,
          rateIx = ((id / 3) % 3).toInt,
          channelMode = (id % 4).toInt,
          frames = (id % 50).toInt + 5,
          bitrateIx2 = if (id % 5 == 0) (bitrateIx % 14) + 1 else -1,
          alternatePadding = id % 2 == 1,
          id3Size = if (id % 3 == 0) (id % 100).toInt else -1)
        (id, payload)
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(dir)
    }

  /** REAL camera-style rotated JPEGs: per doc an upright flat-block
    * closed-form image at 8-multiple dims (wu = 8·(id%3+1),
    * hu = 8·(id%2+1) — rotations map the 8×8 block grid onto itself)
    * and its EXIF-tagged rotated twin: the stored payload carries the
    * display transform's INVERSE of the upright pixels (the m24
    * construction) as a DC-only JPEG (grayscale on evens, 4:4:4 color
    * with flat chroma on odds), wrapped with an APP1 Exif segment
    * whose orientation is id%8+1. Normalizing the stored payload via
    * EXIF + decode + transform must reproduce the upright image
    * exactly. Schema: `(doc_id, payload_oriented, payload_upright)`. */
  def orientedJpegDocs(spark: SparkSession, sfDir: String): String =
    cached("oriented_jpeg_docs", sfDir) { dir =>
      import spark.implicits._
      import graft.operators.Multimodal
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val wu = 8 * ((id % 3).toInt + 1)
        val hu = 8 * ((id % 2).toInt + 1)
        val o = (id % 8).toInt + 1
        val color = id % 2 == 1
        def v(bx: Int, by: Int): Int =
          16 + (((id + bx * 3 + by * 5) % 224 + 224) % 224).toInt
        // upright grayscale image at pixel grain
        val upright = Array.tabulate(wu * hu)(i => v((i % wu) / 8, (i / wu) / 8))
        val swap = o >= 5
        val ws = if (swap) hu else wu
        val hs = if (swap) wu else hu
        // stored = D_o^{-1}(upright): write each upright pixel to the
        // stored coordinate the display transform reads it from (the
        // m24 orientedPixelDocs mapping)
        val stored = new Array[Int](ws * hs)
        var y = 0
        while (y < hu) {
          var x = 0
          while (x < wu) {
            val (sx, sy) = o match {
              case 1 => (x, y)
              case 2 => (ws - 1 - x, y)
              case 3 => (ws - 1 - x, hs - 1 - y)
              case 4 => (x, hs - 1 - y)
              case 5 => (y, x)
              case 6 => (y, hs - 1 - x)
              case 7 => (ws - 1 - y, hs - 1 - x)
              case _ => (ws - 1 - y, x)
            }
            stored(sy * ws + sx) = upright(y * wu + x)
            x += 1
          }
          y += 1
        }
        val storedJpeg = Multimodal.syntheticJpegDcBytesWith(
          ws, hs, color, subsample420 = false) { (bx, by) =>
          stored(by * 8 * ws + bx * 8) // constant per block by construction
        }
        val oriented = graft.functions.ExifImpl.withExif(storedJpeg, o,
          f"2024:02:${id % 28 + 1}%02d 10:${id % 60}%02d:00",
          s"cam${id % 5}", None)
        val uprightJpeg = Multimodal.syntheticJpegDcBytesWith(
          wu, hu, color, subsample420 = false)((bx, by) => v(bx, by))
        (id, oriented, uprightJpeg)
      }
      rows.toDF("doc_id", "payload_oriented", "payload_upright")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** 4:2:0 companion to [[jpegPixelDocs]]: every doc a chroma-subsampled
    * color JPEG (the web/camera-dominant layout) with the same closed-form
    * flat luma blocks — exact under any correct upsampling because the
    * chroma planes are flat 128. */
  def jpeg420PixelDocs(spark: SparkSession, sfDir: String): String =
    cached("jpeg420_pixel_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w = (id % 23).toInt + 4
        val h = (id % 19).toInt + 4
        (id, graft.operators.Multimodal.syntheticJpegDcBytes(id, w, h,
          color = true, subsample420 = true))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** PDFs with embedded images: per doc, a text page plus TWO image
    * XObjects — a FlateDecode DeviceRGB image whose raw samples follow
    * the [[pngPixelDocs]] closed form `(id + x·3 + y·5 + c·11) mod 256`,
    * and a DCTDecode image embedding [[jpegPixelDocs]]' exact-decode
    * 4:4:4 JPEG (flat 8×8 blocks, R=G=B) — so the extracted dHashes are
    * replayable in closed form end to end. */
  def pdfImageDocs(spark: SparkSession, sfDir: String): String =
    cached("pdf_image_docs", sfDir) { dir =>
      import spark.implicits._
      import graft.functions.PdfImpl
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val w1 = (id % 13).toInt + 4; val h1 = (id % 11).toInt + 4
        val flat = new Array[Byte](w1 * h1 * 3)
        var i = 0
        var y = 0
        while (y < h1) {
          var x = 0
          while (x < w1) {
            var c = 0
            while (c < 3) {
              flat(i) = ((id + x * 3 + y * 5 + c * 11) % 256).toByte
              i += 1; c += 1
            }
            x += 1
          }
          y += 1
        }
        val w2 = (id % 23).toInt + 4; val h2 = (id % 19).toInt + 4
        val jpeg = graft.operators.Multimodal.syntheticJpegDcBytes(
          id, w2, h2, color = true)
        val pdf = PdfImpl.build(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"pdf doc $id"),
          compress = id % 2 == 0,
          images = Seq(
            PdfImpl.ImageSpec(w1, h1, 3, flat, dct = false),
            PdfImpl.ImageSpec(w2, h2, 3, jpeg, dct = true)))
        (id, pdf)
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** Audio analog of [[mediaDocs]]: one valid WAV header per doc, with
    * rate/channels/bits/sample-count derived from doc_id so the oracle can
    * verify the byte-level parse inverts the construction arithmetic. */
  def audioDocs(spark: SparkSession, sfDir: String): String =
    cached("audio_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        val channels = (id % 2).toInt + 1
        val bits = if (id % 2 == 0) 16 else 24
        (id, graft.operators.Multimodal.syntheticWavBytes(
          8000 * ((id % 3).toInt + 1), channels, bits, id % 1000 + 1))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** Sample-bearing WAVs (the header-only [[audioDocs]] plus real PCM16
    * data): sample(i) = ((id·131 + i·31) mod 65536) − 32768, n = id%200+50
    * — closed-form for the oracle. */
  def audioPcmDocs(spark: SparkSession, sfDir: String): String =
    cached("audio_pcm_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        (id, graft.operators.Multimodal.syntheticWavPcm16(
          8000, id, (id % 200 + 50).toInt))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** Video analog of [[mediaDocs]]: one minimal valid MP4 per doc, with
    * dimensions/duration derived from doc_id (timescale 1000 so duration_ms
    * equals the stored duration exactly). */
  def videoDocs(spark: SparkSession, sfDir: String): String =
    cached("video_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        (id, graft.operators.Multimodal.syntheticMp4Bytes(
          (id % 1920).toInt + 16, ((id * 3) % 1080).toInt + 16,
          1000, id % 100000 + 1000))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** MP4s WITH sample tables and closed-form frame payloads (frame f,
    * byte j = (doc_id + f·31 + j·7) mod 256) — frame count, frame size,
    * timescale and per-frame delta all derived from doc_id so the m10
    * oracle reproduces every sampled frame's timing and checksum. */
  def videoSampleDocs(spark: SparkSession, sfDir: String): String =
    cached("video_sample_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      val rows = ids.toSeq.map { id =>
        (id, graft.operators.Multimodal.syntheticMp4WithSamples(
          w = (id % 64).toInt + 16, h = (id % 48).toInt + 16,
          timescale = 1000 * ((id % 3).toInt + 1),
          delta = 40 * ((id % 2).toInt + 1),
          nFrames = (id % 30).toInt + 5,
          frameSize = (id % 50).toInt + 20,
          seed = id))
      }
      rows.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** Shot-structured MP4s for boundary detection: shot length 6, the
    * per-shot seed jump guarantees cross-cut byte diffs (~128/byte mean)
    * clear the within-shot drift (~54.5) at any threshold between. */
  def videoShotDocs(spark: SparkSession, sfDir: String): String =
    cached("video_shot_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      ids.toSeq.map { id =>
        (id, graft.operators.Multimodal.syntheticMp4WithShots(
          w = 64, h = 48, timescale = 1000, delta = 40,
          nFrames = 18 + (id % 5).toInt * 3,
          frameSize = 40 + (id % 7).toInt * 4,
          shotLen = 6, docSeed = id))
      }.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** WAVs with two planted ≥-minRun quiet runs per doc for the VAD
    * gate; sample arithmetic is the m5 closed form outside them. */
  def audioVadDocs(spark: SparkSession, sfDir: String): String =
    cached("audio_vad_docs", sfDir) { dir =>
      import spark.implicits._
      val ids = table(spark, sfDir, "documents").select("doc_id")
        .as[Long].collect().sorted
      ids.toSeq.map { id =>
        val n = 400 + (id % 200).toInt
        (id, graft.operators.Multimodal.syntheticWavPcm16Silence(
          8000, id, n, Seq((n / 4, 80), ((5 * n) / 8, 80))))
      }.toDF("doc_id", "payload").coalesce(1).write.mode("overwrite").parquet(dir)
    }

  /** A layout with one deliberately corrupt member for lazy-error semantics:
    * nation as json-lines plus one unparseable file. */
  def lazyNation(spark: SparkSession, sfDir: String): String =
    cached("lazy_nation", sfDir) { dir =>
      graft.api.Graft.writeObject(
        table(spark, sfDir, "nation").coalesce(1), s"$dir/src=good/nation.json")
      Files.createDirectories(Paths.get(s"$dir/src=bad"))
      Files.writeString(Paths.get(s"$dir/src=bad/broken.json"),
        "whopsie dupsie parsing oopsie\n")
    }
}
