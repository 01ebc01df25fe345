package graft

import org.apache.spark.sql.functions._
import graft.functions.{MainContentImpl, MarkupExtractImpl}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction: the WSDM 2010 densitometric rules over
  * (prev, curr, next) blocks, HTML5 landmark pruning, and agreement with
  * the plain tag-stripper on the blocks that survive. */
class MainContentSpec extends SparkSpec {
  import spark.implicits._

  private def mc(s: String): String =
    MainContentImpl.extract(UTF8String.fromString(s)).toString
  private def strip(s: String): String =
    MarkupExtractImpl.extract(UTF8String.fromString(s)).toString

  private val longPara = "These seventeen plus words of steady running " +
    "prose form a paragraph long enough to be content on its own terms here."
  private val longPara2 = "Another sufficiently long stretch of ordinary " +
    "sentence text follows the aside and must also survive the classifier " +
    "pass unharmed."

  test("landmark containers drop; long paragraphs survive") {
    val html = "<html><head><title>My Title</title></head><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      s"<p>$longPara</p>" +
      "<aside>Sponsored <a href='/x'>deal</a> today only</aside>" +
      s"<p>$longPara2</p>" +
      "<footer>Copyright <a href='/p'>Privacy</a></footer>" +
      "</body></html>"
    assert(mc(html) == s"$longPara\n$longPara2")
  }

  test("link-dense block outside any landmark still drops (density rule)") {
    val linkList = "<div><a href='/1'>one</a> <a href='/2'>two</a> " +
      "<a href='/3'>three</a></div>"
    val words41 = (1 to 41).map(i => s"w$i").mkString(" ")
    // a >40-word paragraph survives link-dense neighbors; the link lists
    // themselves drop
    assert(mc(s"<body>$linkList<p>$words41</p>$linkList</body>") == words41)
    // the published tree's intended teaser-pruning: a ~20-word block
    // sandwiched between link lists is judged a related-article teaser
    assert(mc(s"<body>$linkList<p>$longPara</p>$linkList</body>") == "")
  }

  test("short block: kept in a content neighborhood, dropped in isolation") {
    // prev > 4 words with low link density -> a short quote is content
    val kept = s"<body><p>$longPara</p><p>Short pithy quote.</p></body>"
    assert(mc(kept) == s"$longPara\nShort pithy quote.")
    // the same short block alone on the page -> boilerplate
    assert(mc("<body><p>Short pithy quote.</p></body>") == "")
    // after a link-dense prev (nav), a short block needs a long next
    assert(mc("<body><div><a href='/1'>one</a> <a href='/2'>two</a></div>" +
      "<p>Short pithy quote.</p></body>") == "")
  }

  test("prev-link-dense branch: >40 words passes, or a long next rescues") {
    val nav = "<div><a href='/1'>one</a> <a href='/2'>two</a></div>"
    val words41 = (1 to 41).map(i => s"w$i").mkString(" ")
    assert(mc(s"<body>$nav<p>$words41</p></body>") == words41)
    val words20 = (1 to 20).map(i => s"w$i").mkString(" ")
    assert(mc(s"<body>$nav<p>$words20</p></body>") == "",
      "20 words after a link-dense block with no next is boilerplate")
    assert(mc(s"<body>$nav<p>$words20</p><p>$longPara</p></body>") ==
      s"$words20\n$longPara", "a long next block rescues it")
  }

  test("head text is chrome even without </head>; body resets it") {
    val html = s"<html><head><title>T</title><body><p>$longPara</p></body>"
    assert(mc(html) == longPara)
  }

  test("kept blocks are verbatim lines of the plain tag-stripper") {
    val html = "<html><head><title>T</title>" +
      "<style>p {x}</style><script>if(1&lt;2){}</script></head><body>" +
      "<nav><a href='/'>Home</a></nav>" +
      s"<p>$longPara &amp; more&nbsp;text &#97;lpha</p>" +
      "<!-- hidden --><footer>fin</footer></body></html>"
    val kept = mc(html)
    val stripped = strip(html).split("\n").toSet
    assert(kept.nonEmpty)
    assert(kept.split("\n").forall(stripped.contains),
      s"main-content lines must come from the stripper's lines:\n$kept\n" +
        s"vs\n$stripped")
    assert(kept == s"$longPara & more text alpha",
      "entity decoding and whitespace collapse match the stripper")
  }

  test("null, empty, and tag-free inputs behave") {
    assert(mc("") == "")
    assert(mc(longPara) == longPara, "bare text with no tags is one block")
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "html")
    val out = df.select(graft.functions.TextFunctions
      .mainContent(col("html")).as("t")).collect()
    assert(out.head.isNullAt(0), "null html -> null, not a crash")
  }

  test("block table: stats as data; content blocks joined == extractor") {
    val html = "<html><head><title>My Title</title></head><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      s"<p>$longPara</p>" +
      "<aside>Sponsored <a href='/x'>deal</a> today only</aside>" +
      s"<p>$longPara2</p>" +
      "<footer>fin <a href='/p'>Privacy</a></footer></body></html>"
    val arr = graft.functions.MainContentImpl
      .blocks(UTF8String.fromString(html))
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getBoolean(3), r.getBoolean(4))
    }
    assert(rows.map(_._1).take(2) == Seq("My Title", "Home About"),
      s"page order preserved: ${rows.map(_._1)}")
    val nav = rows(1)
    assert(nav == ("Home About", 2, 2, true, false),
      s"nav stats: $nav")
    // the composition identity: content blocks joined == the extractor
    assert(rows.filter(_._5).map(_._1).mkString("\n") == mc(html))
    // chrome blocks are never content; non-chrome link lists can still
    // be non-content (density), but here both paragraphs are content
    assert(rows.filter(_._4).forall(!_._5))
    assert(rows.count(_._5) == 2)
  }

  test("column expression works under codegen end-to-end") {
    val html = s"<body><nav><a href='/'>x</a></nav><p>$longPara</p></body>"
    val got = Seq(html).toDF("html")
      .select(graft.functions.TextFunctions.mainContent(col("html")))
      .collect().head.getString(0)
    assert(got == longPara)
  }
}
