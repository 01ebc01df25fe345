package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{MarkupExtractImpl, TextFunctions}

/** Markup → text extraction: the documented grammar pinned case by case,
  * plus Spark-side codegen parity with the kernel. */
class MarkupExtractSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String =
    MarkupExtractImpl.extract(UTF8String.fromString(html)).toString

  test("tags strip; block tags emit newlines; inline tags emit nothing") {
    assert(x("<p>one</p><p>two</p>") == "one\ntwo")
    assert(x("a<b>bold</b>c") == "abold" + "c")
    assert(x("<div>x</div><div>y</div>") == "x\ny")
    assert(x("line<br>break") == "line\nbreak")
    assert(x("line<br/>break") == "line\nbreak")
    assert(x("<h1>t</h1>body") == "t\nbody")
    assert(x("<ul><li>a</li><li>b</li></ul>") == "a\nb")
  }

  test("script and style content drops, case-insensitive, with attrs") {
    assert(x("a<script>var x = '<p>not text</p>';</script>b") == "ab")
    assert(x("a<STYLE media=\"x\">p { color: red }</Style>b") == "ab")
    assert(x("a<script src=\"x.js\"></script>b") == "ab")
    // unterminated raw-text element swallows to EOF (browser behavior)
    assert(x("a<script>if (1 < 2) alert()") == "a")
    // a close tag of a DIFFERENT element does not end the raw text
    assert(x("a<script>x</div>y</script>b") == "ab")
  }

  test("comments drop, including unterminated and tag-bearing ones") {
    assert(x("a<!-- <p>ghost</p> -->b") == "ab")
    assert(x("a<!-- no end") == "a")
  }

  test("entities decode; unknown or bare ampersands stay literal") {
    assert(x("1 &lt; 2 &amp;&amp; 3 &gt; 2") == "1 < 2 && 3 > 2")
    assert(x("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(x("a&nbsp;b") == "a b")
    assert(x("&#97;&#98;&#x63;") == "abc")
    assert(x("fish &chips; &amp more") == "fish &chips; &amp more")
    assert(x("trailing &") == "trailing &")
    // numeric entity for a whitespace char folds into whitespace handling
    assert(x("a&#10;b") == "a b")
    // supplementary plane survives as a surrogate pair
    assert(x("&#x1F600;") == new String(Character.toChars(0x1F600)))
  }

  test("a '<' that opens no tag is literal text") {
    assert(x("x < 5 and y > 3") == "x < 5 and y > 3")
    assert(x("a <3 b") == "a <3 b")
    assert(x("1<2") == "1<2")
  }

  test("whitespace collapses: runs to one space, block boundaries to one newline") {
    assert(x("  a   b  ") == "a b")
    assert(x("a\n\t b") == "a b")               // raw newlines render as spaces
    assert(x("<p>a</p>\n \n<p>b</p>") == "a\nb") // mixed run with block tag -> \n
    assert(x("<p></p><p></p>a<p></p>") == "a")   // empty blocks trim away
    assert(x("") == "")
    assert(x("<p><b></b></p>") == "")
  }

  test("nested and malformed structures") {
    assert(x("<div><p>a</p><span>b</span></div>") == "a\nb")
    assert(x("<p att='v'>a</p>") == "a")
    assert(x("<p\natt=1>a") == "a")          // newline inside tag
    assert(x("text <unclosed") == "text")    // tag open at EOF swallows
    assert(x("</p>late close") == "late close")
  }

  test("Spark column wrapper matches the kernel (codegen path)") {
    val rows = Seq(
      "<html><body><p>hello &amp; goodbye</p><script>no()</script></body></html>",
      "plain text, no markup",
      "<ul><li>x</li><li>y &#33;</li></ul>")
    val got = rows.toDF("html")
      .select(TextFunctions.extractMarkup(col("html")).as("clean"))
      .collect().map(_.getString(0)).toSeq
    assert(got == rows.map(x))
    assert(got.head == "hello & goodbye")
    // null in, null out
    val nullRow = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "html")
      .select(TextFunctions.extractMarkup(col("html"))).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("normalizeUrl: case, ports, slashes, trackers, sort, fragment") {
    val cases = Seq(
      "HTTP://WWW.Site.COM:80/A/B/?b=2&a=1&utm_campaign=x#top" ->
        "http://www.site.com/A/B?a=1&b=2",
      "https://site.com:443" -> "https://site.com/",
      "https://site.com:8443/x/" -> "https://site.com:8443/x", // non-default port kept
      "http://site.com/?utm_source=a&fbclid=z&gclid=q" -> "http://site.com/",
      "http://site.com/CaseSensitive/Path" -> "http://site.com/CaseSensitive/Path",
      "not a url at ALL" -> "not a url at all") // passthrough, lower-trimmed
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.normalizeUrl(col("url")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
    val host = Seq("HTTPS://A.B.C:8443/x").toDF("url")
      .select(TextFunctions.urlHost(col("url"))).collect().head.getString(0)
    assert(host == "a.b.c")
  }
}
