package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

/** Minimal, dependency-free xlsx support (reference format S9,
  * /root/reference/src/fsql/deser.py:79-95 reads xlsx via pandas/openpyxl;
  * no offline Spark source exists, so this parses the format directly).
  *
  * An xlsx file is a zip of XML parts; the JDK's java.util.zip +
  * javax.xml.stream cover everything needed:
  *  - reader: first worksheet (xl/worksheets/sheet1.xml, falling back to the
  *    lexicographically first sheet part) + optional xl/sharedStrings.xml.
  *    Cell types handled: shared strings (t="s"), inline strings
  *    (t="inlineStr"), formula strings (t="str"), booleans (t="b" →
  *    "true"/"false") and plain numeric/general values. All values surface
  *    as STRINGS (the caller applies a schema to type them — mirrors the
  *    engine's string-typed partition philosophy and keeps the parse
  *    deterministic); first row = column names (pandas read_excel default).
  *  - writer: single sheet, numbers as number cells, everything else as
  *    inline strings (no sharedStrings table needed) — used by fixtures and
  *    tests; the reference's write_object does not accept xlsx, so this is
  *    not wired into the public writer.
  *
  * xlsx is a small-file interchange format (the format itself caps at ~1M
  * rows), so parsing is driver-side per file; the scan path parallelizes
  * across files, not within one.
  */
object Xlsx {

  /** (columnNames, dataRows) of the first worksheet; values null for empty
    * cells. Rows wider than the header are truncated, narrower padded. */
  def read(in: InputStream): (Seq[String], Seq[Seq[String]]) = {
    val parts = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(in)
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml" ||
            (name.startsWith("xl/worksheets/") && name.endsWith(".xml")))
          parts(name) = zin.readAllBytes()
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()

    val shared: IndexedSeq[String] =
      parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheetName = if (parts.contains("xl/worksheets/sheet1.xml")) "xl/worksheets/sheet1.xml"
      else parts.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.headOption
        .getOrElse(throw new IllegalArgumentException("xlsx has no worksheet part"))
    val rows = parseSheet(parts(sheetName), shared)
    if (rows.isEmpty) (Nil, Nil)
    else {
      val header = rows.head.map(v => if (v == null) "" else v)
      val width = header.length
      val data = rows.tail.map(r => r.padTo(width, null: String).take(width).toSeq)
      (header, data)
    }
  }

  /** Concatenated text of each <si> (plain or rich-text runs). */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    val r = xmlReader(bytes)
    var current: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" if current != null => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT) current.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += current.toString; current = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Sparse sheet cells → dense rows (by the r="A1"-style references). */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = mutable.ArrayBuffer.empty[Array[String]]
    val current = mutable.ArrayBuffer.empty[(Int, String)] // (colIdx, value)
    val r = xmlReader(bytes)
    var inRow = false
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    var text = new StringBuilder
    var colCursor = 0
    def flushRow(): Unit = {
      val width = if (current.isEmpty) 0 else current.map(_._1).max + 1
      val arr = Array.fill[String](width)(null)
      current.foreach { case (i, v) => arr(i) = v }
      rows += arr
      current.clear()
    }
    def cellValue(raw: String): String = cellType match {
      case "s" => shared(raw.trim.toInt)
      case "b" => if (raw.trim == "1") "true" else "false"
      case _ => raw
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => inRow = true; colCursor = 0
            case "c" if inRow =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(colCursor)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              colCursor = cellCol + 1
            case "v" => inV = true; text = new StringBuilder
            case "t" if cellType == "inlineStr" => inIsT = true; text = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV || inIsT) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false; current += ((cellCol, cellValue(text.toString)))
            case "t" if inIsT => inIsT = false; current += ((cellCol, text.toString))
            case "row" => inRow = false; flushRow()
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** "BC12" → 0-based column index of "BC". */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // not expecting DTDs in spreadsheet parts; disable for safety
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  // ---------------------------------------------------------------- writer

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val rem = (n - 1) % 26; sb.insert(0, ('A' + rem).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write a single-sheet xlsx: header + string/numeric cells. */
  def write(out: OutputStream, header: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    val zos = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    val all = header.map(h => h: Any) +: rows
    all.zipWithIndex.foreach { case (row, ri) =>
      sheet.append(s"""<row r="${ri + 1}">""")
      row.zipWithIndex.foreach { case (cell, ci) =>
        val ref = s"${colLetters(ci)}${ri + 1}"
        cell match {
          case null => ()
          case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte
              | _: java.math.BigDecimal) =>
            sheet.append(s"""<c r="$ref"><v>$n</v></c>""")
          case b: Boolean =>
            sheet.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case other =>
            sheet.append(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>""")
        }
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    part("xl/worksheets/sheet1.xml", sheet.toString)
    zos.finish()
  }
}
