package graft.functions

/** EXIF metadata over JPEG payloads — the curation signals a crawled
  * image carries OUTSIDE its pixels (TIFF 6.0 IFD structure inside a
  * JPEG APP1 segment, per EXIF 2.3 / CIPA DC-008): capture orientation
  * (dedup under rotation wants it), timestamp and device strings
  * (provenance), and — the one that matters for corpus release — GPS
  * coordinates, which are location PII baked into the bytes. Parsing
  * is a bounded IFD walk in both endiannesses; [[strip]] is the scrub:
  * it removes the APP1 segment by byte surgery, leaving the entropy
  * stream untouched, so the image decodes identically afterwards.
  *
  * House rules: the parser is TOTAL (None outside the envelope, never
  * a throw — all offset math in Long against crafted sizes), the
  * builder exists to make exact-decode fixtures, and GPS coordinates
  * surface as integer MICRODEGREES (deg·3600e6 + min·60e6 +
  * sec_num·1e6/sec_den, all integer — fixtures use exactly-dividing
  * rationals so any engine replays the value). */
object ExifImpl {

  /** Parsed EXIF: null-able fields mirror absent tags; `latMicro`/
    * `lonMicro` are signed microdegrees (S/W negative). */
  final case class Exif(orientation: Option[Int], dateTime: Option[String],
      make: Option[String], model: Option[String], hasGps: Boolean,
      latMicro: Option[Long], lonMicro: Option[Long])

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Marker-walk outcome. The tri-state matters for corpus release: a
    * payload whose walk ABORTS before the scan (fill bytes where a
    * marker belongs, corrupt segment length) may still carry Exif/GPS
    * the walker could not reach — it must be distinguishable from a
    * payload whose walk completed and genuinely has no Exif, or a
    * release gate ships unscrubbed GPS as "clean". */
  private sealed trait App1Result
  private final case class App1Found(start: Int, len: Int) extends App1Result
  private case object App1Absent extends App1Result // clean walk to SOS/EOI
  private case object App1NotJpeg extends App1Result
  private case object App1WalkFailed extends App1Result

  /** Locate the APP1 Exif segment: the TIFF stream bounds (after
    * "Exif\0\0") when present, else the walk outcome. */
  private def app1(b: Array[Byte]): App1Result = {
    if (b == null || b.length < 4 || (b(0) & 0xff) != 0xff ||
      (b(1) & 0xff) != 0xd8) return App1NotJpeg
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return App1Absent // EOI / scan
      val len = u16(b, i + 2, le = false)
      if (len < 2 || i + 2L + len > b.length) return App1WalkFailed
      if (marker == 0xe1 && len >= 10 &&
        b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
        b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
        return App1Found(i + 10, len - 8)
      i += 2 + len
    }
    App1WalkFailed // ran out of bytes / non-marker byte before the scan
  }

  private final case class Entry(tag: Int, tpe: Int, count: Long, at: Int)

  /** All entries of the IFD at `off` (relative to the TIFF start `t0`);
    * `at` is the absolute byte position of the value (inlined when it
    * fits 4 bytes, else at the stored offset). Empty on any bound
    * violation. */
  private def ifdEntries(b: Array[Byte], t0: Int, len: Int, off: Long,
      le: Boolean): Seq[Entry] = {
    if (off < 0 || t0 + off + 2 > t0 + len || t0 + off + 2 > b.length)
      return Seq.empty
    val base = (t0 + off).toInt
    val n = u16(b, base, le)
    val out = Seq.newBuilder[Entry]
    var k = 0
    while (k < n) {
      val e = base + 2 + k * 12
      if (e + 12L > b.length || e + 12L > t0.toLong + len) return out.result()
      val tag = u16(b, e, le)
      val tpe = u16(b, e + 2, le)
      val cnt = u32(b, e + 4, le)
      val size = typeSize(tpe) * cnt
      val at =
        if (size <= 4 && size >= 0) e + 8
        else {
          val vo = u32(b, e + 8, le)
          if (vo < 0 || t0 + vo + size > b.length ||
            t0 + vo + size > t0.toLong + len) -1
          else (t0 + vo).toInt
        }
      if (at >= 0) out += Entry(tag, tpe, cnt, at)
      k += 1
    }
    out.result()
  }

  private def typeSize(t: Int): Long = t match {
    case 1 | 2 | 6 | 7 => 1L // BYTE, ASCII, SBYTE, UNDEFINED
    case 3 | 8 => 2L         // SHORT, SSHORT
    case 4 | 9 | 11 => 4L    // LONG, SLONG, FLOAT
    case 5 | 10 | 12 => 8L   // RATIONAL, SRATIONAL, DOUBLE
    case _ => 1L
  }

  private def asciiVal(b: Array[Byte], e: Entry): Option[String] =
    if (e.tpe != 2 || e.count < 1 || e.count > 4096) None
    else {
      var n = e.count.toInt
      // trailing NUL terminates per TIFF
      while (n > 0 && b(e.at + n - 1) == 0) n -= 1
      Some(new String(b, e.at, n, "US-ASCII"))
    }

  private def shortVal(b: Array[Byte], e: Entry, le: Boolean): Option[Int] =
    if (e.tpe != 3 || e.count != 1) None else Some(u16(b, e.at, le))

  private def longVal(b: Array[Byte], e: Entry, le: Boolean): Option[Long] =
    if (e.tpe != 4 || e.count != 1) None else Some(u32(b, e.at, le))

  /** deg/min/sec RATIONAL triple → signed microdegrees. Integer
    * arithmetic: micro = deg_n·1e6/deg_d + min_n·1e6/(min_d·60)
    * + sec_n·1e6/(sec_d·3600), each term in Long via ·1e6 BEFORE the
    * divide (fixtures use exactly-dividing rationals, so the floor
    * never bites there; real-camera coords round down ≤ 1 µdeg). */
  private def dmsMicro(b: Array[Byte], e: Entry, le: Boolean): Option[Long] = {
    if (e.tpe != 5 || e.count != 3) return None
    def rat(i: Int): (Long, Long) =
      (u32(b, e.at + i * 8, le), u32(b, e.at + i * 8 + 4, le))
    val (dn, dd) = rat(0); val (mn, md) = rat(1); val (sn, sd) = rat(2)
    if (dd == 0 || md == 0 || sd == 0) return None
    Some(dn * 1000000L / dd + mn * 1000000L / (md * 60L) +
      sn * 1000000L / (sd * 3600L))
  }

  /** Parse the EXIF of a JPEG payload; None when there is no
    * well-formed APP1 Exif segment. Never throws. */
  def parse(jpeg: Array[Byte]): Option[Exif] = parseWithStatus(jpeg)._1

  /** [[parse]] plus the walk outcome a release gate can act on:
    * "ok" (Exif parsed), "no_exif" (walk completed, none present),
    * "bad_tiff" (APP1 found but the TIFF stream is malformed — Exif
    * may exist but is unreadable: quarantine), "not_jpeg", and
    * "walk_failed" (marker walk aborted before the scan — the payload
    * may still carry unreachable Exif/GPS: quarantine). A gate reading
    * only [[parse]]'s None cannot tell the last three apart. */
  def parseWithStatus(jpeg: Array[Byte]): (Option[Exif], String) =
    app1(jpeg) match {
      case App1NotJpeg => (None, "not_jpeg")
      case App1Absent => (None, "no_exif")
      case App1WalkFailed => (None, "walk_failed")
      case App1Found(t0, len) => parseTiff(jpeg, t0, len) match {
        case some @ Some(_) => (some, "ok")
        case None => (None, "bad_tiff")
      }
    }

  /** Parse a bare TIFF/EXIF stream at b[t0, t0+len) — the form WebP's
    * EXIF chunk carries (with or without a leading "Exif\0\0", which
    * callers strip). Same envelope and totality as the JPEG path. */
  def parseTiffStream(b: Array[Byte], t0: Int, len: Int): Option[Exif] =
    if (b == null || t0 < 0 || len < 0 || t0.toLong + len > b.length) None
    else parseTiff(b, t0, len)

  private def parseTiff(jpeg: Array[Byte], t0: Int,
      len: Int): Option[Exif] = {
    if (len < 8) return None
    val le = jpeg(t0) == 'I' && jpeg(t0 + 1) == 'I'
    val be = jpeg(t0) == 'M' && jpeg(t0 + 1) == 'M'
    if (!le && !be) return None
    if (u16(jpeg, t0 + 2, le) != 42) return None
    val ifd0 = u32(jpeg, t0 + 4, le)
    val es = ifdEntries(jpeg, t0, len, ifd0, le)
    if (es.isEmpty) return None
    def find(tag: Int, s: Seq[Entry]) = s.find(_.tag == tag)
    val orientation = find(0x0112, es).flatMap(shortVal(jpeg, _, le))
    val dateTime = find(0x0132, es).flatMap(asciiVal(jpeg, _))
    val make = find(0x010f, es).flatMap(asciiVal(jpeg, _))
    val model = find(0x0110, es).flatMap(asciiVal(jpeg, _))
    val gps = find(0x8825, es).flatMap(longVal(jpeg, _, le))
      .map(off => ifdEntries(jpeg, t0, len, off, le))
      .getOrElse(Seq.empty)
    val latRef = find(0x0001, gps).flatMap(asciiVal(jpeg, _))
    val lat0 = find(0x0002, gps).flatMap(dmsMicro(jpeg, _, le))
    val lonRef = find(0x0003, gps).flatMap(asciiVal(jpeg, _))
    val lon0 = find(0x0004, gps).flatMap(dmsMicro(jpeg, _, le))
    val lat = lat0.map(v => if (latRef.contains("S")) -v else v)
    val lon = lon0.map(v => if (lonRef.contains("W")) -v else v)
    Some(Exif(orientation, dateTime, make, model,
      hasGps = lat.isDefined && lon.isDefined, lat, lon))
  }

  /** Remove every APP1 Exif segment by byte surgery — the GPS-PII
    * scrub for corpus release: markers before the scan copy through
    * minus the Exif APP1s; from the start-of-scan on, bytes copy
    * verbatim (the entropy stream is untouched, so pixels decode
    * identically). A payload that is not a JPEG, carries no Exif, or
    * whose marker walk ABORTS is returned unchanged — use
    * [[stripWithStatus]] to tell those apart. Never throws. */
  def strip(jpeg: Array[Byte]): Array[Byte] = stripWithStatus(jpeg)._1

  /** The scrub plus its status: "scrubbed" (Exif removed, walk
    * completed to the scan), "clean" (walk completed, no Exif — safe
    * to ship), "not_jpeg", and "walk_failed" (marker walk aborted
    * before the scan: the payload is returned UNCHANGED and may still
    * carry GPS — a release pipeline must quarantine it, not ship it;
    * a bare [[strip]] return is indistinguishable from clean). A walk
    * that aborts never returns a partially-scrubbed payload. */
  def stripWithStatus(jpeg: Array[Byte]): (Array[Byte], String) = {
    if (jpeg == null || jpeg.length < 4 || (jpeg(0) & 0xff) != 0xff ||
      (jpeg(1) & 0xff) != 0xd8) return (jpeg, "not_jpeg")
    val out = new java.io.ByteArrayOutputStream(jpeg.length)
    out.write(jpeg, 0, 2)
    var i = 2
    var changed = false
    while (i + 4 <= jpeg.length && (jpeg(i) & 0xff) == 0xff) {
      val marker = jpeg(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) {
        out.write(jpeg, i, jpeg.length - i)
        return if (changed) (out.toByteArray, "scrubbed")
        else (jpeg, "clean")
      }
      val len = u16(jpeg, i + 2, le = false)
      if (len < 2 || i + 2L + len > jpeg.length)
        return (jpeg, "walk_failed") // corrupt length before the scan
      val isExif = marker == 0xe1 && len >= 10 &&
        jpeg(i + 4) == 'E' && jpeg(i + 5) == 'x' && jpeg(i + 6) == 'i' &&
        jpeg(i + 7) == 'f' && jpeg(i + 8) == 0 && jpeg(i + 9) == 0
      if (isExif) changed = true
      else out.write(jpeg, i, 2 + len)
      i += 2 + len
    }
    // fill byte / truncation before any scan marker: never emit the
    // partial rewrite — Exif past the abort point would survive it
    (jpeg, "walk_failed")
  }

  // --------------------------------------------------------------- build

  /** A minimal valid APP1 Exif segment (big-endian TIFF) carrying
    * orientation, DateTime, Make and optionally a GPS IFD — prepended
    * to an existing JPEG's segments right after SOI. Fixture material:
    * rationals are caller-chosen, so gates plant exactly-dividing
    * values. */
  def withExif(jpeg: Array[Byte], orientation: Int, dateTime: String,
      make: String, gps: Option[(Long, Long, Long, Long)]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    val body = buildTiffBody(orientation, dateTime, make, gps)
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val segLen = 2 + 6 + body.length
    seg.write(segLen >> 8); seg.write(segLen & 0xff)
    seg.write("Exif".getBytes("US-ASCII")); seg.write(0); seg.write(0)
    seg.write(body)
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    seg.writeTo(out)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** The bare big-endian TIFF body under [[withExif]] — also the form
    * a WebP EXIF chunk carries. Fixture material for both carriers. */
  def buildTiffBody(orientation: Int, dateTime: String,
      make: String, gps: Option[(Long, Long, Long, Long)]): Array[Byte] = {
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { tiff.write(v >> 8); tiff.write(v & 0xff) }
    def w32(v: Long): Unit = {
      tiff.write(((v >> 24) & 0xff).toInt); tiff.write(((v >> 16) & 0xff).toInt)
      tiff.write(((v >> 8) & 0xff).toInt); tiff.write((v & 0xff).toInt)
    }
    val dt = (dateTime + "\u0000").getBytes("US-ASCII")
    val mk = (make + "\u0000").getBytes("US-ASCII")
    tiff.write('M'); tiff.write('M'); w16(42); w32(8)
    // IFD0: orientation, make, datetime [, gps pointer]. TIFF inlines
    // values of ≤ 4 bytes in the entry itself — the value-area layout
    // must account for that or every later offset shifts
    val n0 = if (gps.isDefined) 4 else 3
    val ifd0End = 8 + 2 + n0 * 12 + 4
    val mkInline = mk.length <= 4
    val dtInline = dt.length <= 4
    var voff = ifd0End
    val mkOff = voff; if (!mkInline) voff += mk.length
    val dtOff = voff; if (!dtInline) voff += dt.length
    val gpsOff = voff
    def ascii(entryTag: Int, bytes: Array[Byte], inline: Boolean,
        off: Int): Unit = {
      w16(entryTag); w16(2); w32(bytes.length)
      if (inline) {
        tiff.write(bytes)
        (bytes.length until 4).foreach(_ => tiff.write(0))
      } else w32(off)
    }
    w16(n0)
    ascii(0x010f, mk, mkInline, mkOff)                    // Make
    w16(0x0112); w16(3); w32(1); w16(orientation); w16(0) // Orientation
    ascii(0x0132, dt, dtInline, dtOff)                    // DateTime
    gps.foreach(_ => { w16(0x8825); w16(4); w32(1); w32(gpsOff) })
    w32(0) // next IFD
    if (!mkInline) tiff.write(mk)
    if (!dtInline) tiff.write(dt)
    gps.foreach { case (latN, latD, lonN, lonD) =>
      // GPS IFD: refs N/E, lat/lon as (v, d), (0,1), (0,1) triples
      val base = gpsOff
      val n = 4
      val latOff = base + 2 + n * 12 + 4
      val lonOff = latOff + 24
      w16(n)
      w16(0x0001); w16(2); w32(2); tiff.write('N'); tiff.write(0); w16(0)
      w16(0x0002); w16(5); w32(3); w32(latOff)
      w16(0x0003); w16(2); w32(2); tiff.write('E'); tiff.write(0); w16(0)
      w16(0x0004); w16(5); w32(3); w32(lonOff)
      w32(0)
      w32(latN); w32(latD); w32(0); w32(1); w32(0); w32(1)
      w32(lonN); w32(lonD); w32(0); w32(1); w32(0); w32(1)
    }
    tiff.toByteArray
  }
}
