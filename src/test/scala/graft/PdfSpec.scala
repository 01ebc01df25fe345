package graft

import org.apache.spark.sql.functions._
import graft.functions.{PdfBuildExpr, PdfExtractExpr, PdfImpl}

/** From-scratch PDF text extraction: builder round trips (both filters),
  * the literal-string escape grammar, hex strings, TJ arrays, newline
  * operators, foreign-filter skipping, and /Length handling. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def extract(pdf: Array[Byte]): String =
    PdfImpl.extract(pdf).toString

  private def rawPdf(content: String): Array[Byte] = {
    // a minimal unfiltered PDF envelope around one content stream
    val s = s"%PDF-1.4\n1 0 obj << /Length ${content.length} >> stream\n" +
      s"$content\nendstream endobj\ntrailer\n%%EOF\n"
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  test("builder round trip: plain, parens, backslashes, newlines, unicode") {
    val texts = Seq(
      "hello pdf world",
      "balanced (parens) and \\ backslash and ((nested))",
      "line one\nline two\ttabbed",
      "中文字符 mixed avec français",
      "", // empty document
      "a")
    for (t <- texts; compress <- Seq(true, false)) {
      val pdf = PdfImpl.build(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), compress)
      assert(extract(pdf) == t, s"round trip failed (compress=$compress): $t")
      // structurally a PDF: header, xref, trailer present
      val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(s.startsWith("%PDF-1.4") && s.contains("xref") &&
        s.contains("%%EOF"))
    }
  }

  test("column expressions round trip through Spark") {
    val df = Seq((1L, "doc one text"), (2L, "doc (two) \\ text"))
      .toDF("id", "text")
    val got = df.select(col("id"),
        PdfExtractExpr(PdfBuildExpr(col("text"), col("id") % 2 === 0))
          .as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(got.toSeq == Seq("doc one text", "doc (two) \\ text"))
  }

  test("TJ arrays concatenate; kern numbers are ignored") {
    val pdf = rawPdf("BT [(Hel) -250 (lo) 120 ( world)] TJ ET")
    assert(extract(pdf) == "Hello world")
  }

  test("octal escapes, hex strings, unknown escapes") {
    assert(extract(rawPdf("BT (\\101\\102\\103) Tj ET")) == "ABC")
    assert(extract(rawPdf("BT <48656C6C6F> Tj ET")) == "Hello")
    assert(extract(rawPdf("BT <48656C6C6F2> Tj ET")) == "Hello ") // odd pad
    assert(extract(rawPdf("BT (\\q) Tj ET")) == "q") // unknown: literal
  }

  test("newline operators: Td/TD/T* and ' / \" advance lines, collapsed") {
    assert(extract(rawPdf("BT 72 720 Td (a) Tj 0 -14 Td (b) Tj T* (c) Tj ET"))
      == "a\nb\nc")
    assert(extract(rawPdf("BT (x) Tj (y) ' ET")) == "x\ny")
    assert(extract(rawPdf("BT (x) Tj 2 3 (y) \" ET")) == "x\ny")
    // leading Td emits no leading newline; doubled motion collapses
    assert(extract(rawPdf("BT 72 720 Td T* (solo) Tj ET")) == "solo")
  }

  test("text outside BT..ET and non-show strings are not emitted") {
    assert(extract(rawPdf("(orphan) Tj BT (kept) Tj ET (late) Tj")) == "kept")
    // a string consumed by a non-show operator never leaks
    assert(extract(rawPdf("BT (name) Tz (shown) Tj ET")) == "shown")
  }

  test("foreign filters are skipped, never misparsed") {
    val jpeg = "BT (fake image bytes) Tj ET" // looks like text, isn't
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + jpeg.length +
      " /Filter /DCTDecode >> stream\n" + jpeg +
      "\nendstream endobj\n2 0 obj << /Length 17 >> stream\n" +
      "BT (visible) Tj ET\nendstream endobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(extract(pdf) == "visible")
  }

  test("indirect /Length falls back to the endstream scan") {
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 9 0 R >> stream\n" +
      "BT (scan-sized) Tj ET\nendstream endobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(extract(pdf) == "scan-sized")
  }

  test("nested parens and EOL normalization inside literals") {
    assert(extract(rawPdf("BT (a (nested (deep)) b) Tj ET"))
      == "a (nested (deep)) b")
    assert(extract(rawPdf("BT (l1\r\nl2\rl3) Tj ET")) == "l1\nl2\nl3")
    // line continuation: backslash-EOL vanishes
    assert(extract(rawPdf("BT (joi\\\nned) Tj ET")) == "joined")
  }

  test("property: ARBITRARY strings round-trip, compressed and raw") {
    // byte-level escaping + opaque string bytes must survive any input:
    // parens, backslashes, control chars, surrogate-pair unicode, the
    // PDF delimiters and keywords themselves
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val weird = Gen.oneOf("()", "\\", "\\n", "stream", "endstream", "BT",
      "Tj ET", "<<>>", "%", "é中😀", "\t", "((((", "))))")
    val gen = for {
      parts <- Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr, weird))
      compress <- Gen.oneOf(true, false)
    } yield (parts.mkString, compress)
    var seed = Seed(42L)
    for (_ <- 1 to 300) {
      val (t, compress) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val pdf = PdfImpl.build(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), compress)
      assert(extract(pdf) == t,
        s"round trip failed (compress=$compress) for: ${t.take(120)}")
    }
  }

  test("corrupt flate data is skipped, never throws") {
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 12 /Filter /FlateDecode >> " +
      "stream\nnot deflate!\nendstream endobj\n2 0 obj << /Length 14 >> " +
      "stream\nBT (ok) Tj ET\nendstream endobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(extract(pdf) == "ok")
  }
}
