package graft

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

/** Seeded fuzz over the executor-side charwise kernels: on a 100 TB
  * crawl, malformed bytes are a certainty, and a kernel exception kills
  * the task — every parser must TOTAL-FUNCTION any input. Each case
  * also pins the cheap invariants that hold for arbitrary input:
  * determinism, the blocks⊆stripper-lines relation, and the
  * blocks→extract composition identity. Seeds are fixed, so a failure
  * reproduces exactly. */
class KernelFuzzSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  /** Tag/entity/text soup: enough structure to reach the parser states,
    * enough garbage to break a sloppy one. */
  private def soup(rnd: Random, len: Int): String = {
    val atoms = Array(
      "<", ">", "</", "<!--", "-->", "&", "&amp;", "&#", "&#x", ";",
      "<p>", "</p>", "<div >", "<nav>", "</nav>", "<a href='x'>", "</a>",
      "<script>", "</script>", "<style>", "</style>", "<head>", "<body>",
      "<title>", "</title>", "<br/>", "<h1", "='", "\"", " ", "\t", "\n",
      "\r\n", "word", "tok", "é", " ", "&#65;", "&#xZZ;", "&nbsp;",
      "x<y", "a&b", "<>", "<!", "<a", "//", ":", "?", "#")
    val sb = new StringBuilder
    while (sb.length < len) sb.append(atoms(rnd.nextInt(atoms.length)))
    sb.toString
  }

  test("markup + main-content kernels are total and agree on any soup") {
    val rnd = new Random(20260815L)
    for (i <- 1 to 300) {
      val html = soup(rnd, 20 + rnd.nextInt(400))
      val stripped = graft.functions.MarkupExtractImpl.extract(u(html))
        .toString
      val mc = graft.functions.MainContentImpl.extract(u(html)).toString
      val blocks = graft.functions.MainContentImpl.blocks(u(html))
      // determinism
      assert(mc == graft.functions.MainContentImpl.extract(u(html)).toString,
        s"iteration $i: nondeterministic main content")
      // every kept block is one of the stripper's lines verbatim
      val lines = stripped.split("\n").toSet
      for (line <- mc.split("\n") if line.nonEmpty)
        assert(lines.contains(line),
          s"iteration $i: kept block not a stripper line\nhtml=$html\n" +
            s"block=$line\nstripped=$stripped")
      // blocks→extract composition identity holds for ANY input
      val kept = (0 until blocks.numElements()).map(blocks.getStruct(_, 5))
        .filter(_.getBoolean(4)).map(_.getUTF8String(0).toString)
      assert(kept.mkString("\n") == mc,
        s"iteration $i: blocks/extract diverge on\n$html")
    }
  }

  test("http splitter is total on arbitrary bytes") {
    val rnd = new Random(424242L)
    for (i <- 1 to 300) {
      val n = rnd.nextInt(300)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // bias half the cases toward HTTP-looking prefixes to reach the
      // header/chunk states, with garbage after
      val bytes =
        if (i % 2 == 0) ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked" +
          "\r\nContent-Length: 9\r\n\r\n").getBytes("ISO-8859-1") ++ b
        else b
      val r = graft.functions.HttpImpl.payload(bytes)
      assert(r.numFields == 3, s"iteration $i")
      assert(r.getBinary(2) != null, s"iteration $i: null body")
    }
  }

  test("url resolver is total on arbitrary base/ref strings") {
    val rnd = new Random(777L)
    val frag = Array("http://", "https://", "//", "/", "../", "./", "?",
      "#", ":", "a", "%", "züg", " ", "mailto:", "..", "xn--", "[::1]",
      "@", "&#", "")
    def str(len: Int): String =
      (1 to len).map(_ => frag(rnd.nextInt(frag.length))).mkString
    for (i <- 1 to 300) {
      val base = str(1 + rnd.nextInt(6))
      val ref = str(rnd.nextInt(6))
      val out = graft.functions.UrlResolveImpl.resolve(u(base), u(ref))
      assert(out != null, s"iteration $i: null resolution")
      // determinism
      assert(out.toString ==
        graft.functions.UrlResolveImpl.resolve(u(base), u(ref)).toString)
    }
  }

  test("word-gram kernels are total and consistent on soup") {
    val rnd = new Random(31337L)
    for (i <- 1 to 200) {
      val text = soup(rnd, rnd.nextInt(200))
      for (n <- Seq(1, 2, 3)) {
        val all = graft.functions.WordSpansImpl.computeAll(u(text), n)
        val distinct = graft.functions.WordSpansImpl.compute(u(text), n)
        assert(all.numElements() >= distinct.numElements(),
          s"iteration $i n=$n: distinct windows exceed all windows")
      }
    }
  }
}
