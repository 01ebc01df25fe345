package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{DocxBuildExpr, DocxExtractExpr, DocxImpl}

/** DOCX codec: zip walk from the central directory, stored+deflated
  * entries, WordprocessingML text rules, entity/quote edge grammar. */
class DocxSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(text: String, deflated: Boolean): String = {
    val df = Seq((text, deflated)).toDF("t", "d")
    df.select(DocxExtractExpr(DocxBuildExpr(col("t"), col("d"))).as("x"))
      .collect().head.getString(0)
  }

  test("round trip: plain, mid-word chunk splits, XML specials, empty") {
    for (d <- Seq(true, false)) {
      assert(roundTrip("hello word processing world", d) ==
        "hello word processing world")
      // longer than one 24-char run, splits mid-word
      val long = (1 to 40).map(i => s"tok$i").mkString(" ")
      assert(roundTrip(long, d) == long)
      assert(roundTrip("a & b < c > d \"q\" 'a'", d) ==
        "a & b < c > d \"q\" 'a'")
      assert(roundTrip("", d) == "")
    }
  }

  test("the built archive is a real zip: JDK ZipInputStream reads it back") {
    val bytes = DocxImpl.build(UTF8String.fromString("zip sanity text"), true)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val names = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    assert(names == List("[Content_Types].xml", "_rels/.rels",
      "word/document.xml"), names.toString)
  }

  test("wordText: paragraphs join with one newline, tabs/breaks emit, " +
      "properties and tables are structure") {
    val xml = "<w:document><w:body>" +
      "<w:p><w:pPr><w:jc w:val=\"left\"/></w:pPr>" +
      "<w:r><w:t>first</w:t></w:r><w:r><w:tab/><w:t>col</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>second</w:t><w:br/><w:t>line</w:t></w:r></w:p>" +
      "<w:p></w:p>" + // empty paragraph: no double newline
      "<w:p><w:r><w:t>third</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    assert(DocxImpl.wordText(xml) == "first\tcol\nsecond\nline\nthird")
  }

  test("wordText: entities incl. numeric, '>' inside attribute values, " +
      "self-closing w:t, text outside w:t ignored") {
    val xml = "<w:p><w:r w:x=\"a>b\"><w:t>&amp;&lt;&#65;&#x42;</w:t>" +
      "</w:r>ignored<w:r><w:t/></w:r><w:r><w:t>ok</w:t></w:r></w:p>"
    assert(DocxImpl.wordText(xml) == "&<ABok")
    // unknown/unterminated entities pass through as literal text
    assert(DocxImpl.wordText("<w:t>&bogus; &#zz; a&b</w:t>") ==
      "&bogus; &#zz; a&b")
  }

  test("hostile bytes: truncated zip, non-zip, missing document.xml " +
      "all yield empty, never throw") {
    val good = DocxImpl.build(UTF8String.fromString("x y z"), true)
    assert(DocxImpl.extract(good.take(10)) == UTF8String.EMPTY_UTF8)
    assert(DocxImpl.extract("not a zip at all".getBytes) ==
      UTF8String.EMPTY_UTF8)
    assert(DocxImpl.extract(Array.empty[Byte]) == UTF8String.EMPTY_UTF8)
    // a valid zip without word/document.xml
    val bo = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bo)
    zo.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
    zo.write("<w:t>nope</w:t>".getBytes); zo.closeEntry(); zo.close()
    assert(DocxImpl.extract(bo.toByteArray) == UTF8String.EMPTY_UTF8)
  }

  test("extractor reads JDK-written zips too (data-descriptor layout: " +
      "sizes come from the central directory)") {
    val xml = "<w:p><w:r><w:t>via jdk writer</w:t></w:r></w:p>"
    val bo = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bo)
    zo.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zo.write(xml.getBytes); zo.closeEntry(); zo.close()
    assert(DocxImpl.extract(bo.toByteArray).toString == "via jdk writer")
  }
}
