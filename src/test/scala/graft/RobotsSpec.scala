package graft

import org.apache.spark.sql.functions._
import graft.functions.RobotsImpl
import graft.operators.Robots
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt grammar and policy precedence: group selection, agent
  * case-insensitivity, comments/CRLF, empty rules, longest-match with
  * allow-wins ties, default allow. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(txt: String, agent: String): Seq[(Boolean, String)] = {
    val arr = RobotsImpl.rules(UTF8String.fromString(txt),
      UTF8String.fromString(agent))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getBoolean(0), r.getUTF8String(1).toString)
    }
  }

  test("exact agent group shadows *; * binds unknown agents") {
    val txt = "User-agent: botA\nDisallow: /a\n\n" +
      "User-agent: *\nDisallow: /star\n"
    assert(rules(txt, "botA") == Seq((false, "/a")))
    assert(rules(txt, "BOTA") == Seq((false, "/a")), "case-insensitive")
    assert(rules(txt, "other") == Seq((false, "/star")))
  }

  test("multiple exact groups union; stacked agents share one group") {
    val txt = "User-agent: botA\nUser-agent: botB\nDisallow: /shared\n\n" +
      "User-agent: botA\nAllow: /extra\n"
    assert(rules(txt, "botB") == Seq((false, "/shared")))
    assert(rules(txt, "botA").toSet == Set((false, "/shared"), (true, "/extra")))
  }

  test("comments, CRLF, empty Disallow, unknown fields") {
    val txt = "# top comment\r\nUser-agent: bot # trailing\r\n" +
      "Crawl-delay: 10\r\nDisallow: /x # why\r\nDisallow:\r\n" +
      "Sitemap: http://s/map.xml\r\n"
    assert(rules(txt, "bot") == Seq((false, "/x")))
    assert(rules("", "bot").isEmpty)
    assert(rules("no colon lines at all", "bot").isEmpty)
  }

  test("check: longest prefix wins, allow beats disallow on ties, " +
      "no rule or no host row allows") {
    val robots = Seq(
      ("h1.com", "User-agent: bot\nDisallow: /p\nAllow: /p/ok\n" +
        "Allow: /q\nDisallow: /q\n")
    ).toDF("host", "txt")
    val urls = Seq(
      "http://h1.com/p/deny",   // /p disallow binds
      "http://h1.com/p/ok/yes", // longer allow wins
      "http://h1.com/q",        // equal length: allow wins the tie
      "http://h1.com/free",     // no matching rule -> allowed
      "http://h2.com/p/deny"    // no robots row -> allowed
    ).toDF("url")
    val got = Robots.check(urls, "url", robots, "host", "txt", "bot")
      .select("url", "robots_allowed")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("http://h1.com/p/deny") == false)
    assert(got("http://h1.com/p/ok/yes") == true)
    assert(got("http://h1.com/q") == true)
    assert(got("http://h1.com/free") == true)
    assert(got("http://h2.com/p/deny") == true)
    // and the filtering variant drops exactly the denied row
    assert(Robots.filterAllowed(urls, "url", robots, "host", "txt", "bot")
      .count() == 4)
  }

  test("RFC 9309 wildcard matching: * spans, $ anchors, mid-$ literal") {
    import graft.functions.RobotsImpl
    def m(path: String, pat: String): Boolean =
      RobotsImpl.matches(UTF8String.fromString(path),
        UTF8String.fromString(pat))
    assert(m("/private/x", "/private*"))
    assert(m("/private", "/private*"), "* matches empty")
    assert(!m("/pub/private", "/private*"), "anchored at path start")
    assert(m("/docs/file.pdf", "/*.pdf$"))
    assert(!m("/docs/file.pdfx", "/*.pdf$"), "$ anchors the end")
    assert(m("/docs/file.pdf?x=1", "/*.pdf"), "unanchored keeps matching")
    assert(m("/a/b/c/d", "/a/*/d"))
    assert(m("/a/xx/yy/d", "/a/*/d"))
    assert(!m("/a/b/c", "/a/*/d$"))
    assert(m("/fish", "/fish$"))
    assert(!m("/fishing", "/fish$"))
    assert(m("/p?a=$5", "/p?a=$5"), "mid-pattern $ is a literal byte")
    assert(m("/anything", "/*"))
    assert(m("/x/y*z", "/x/*"), "literal * in the PATH is just a byte")
    // greedy-earliest completeness: two stars, tight tail
    assert(m("/ab/cd/ab/ef", "/*cd*ef$"))
    assert(!m("/ab/cd/ab/ef", "/*ef*cd"))
  }

  test("check: robots host key normalizes (case, port) like the URL side") {
    val robots = Seq(("Example.COM:80", "User-agent: *\nDisallow: /no\n"))
      .toDF("host", "txt")
    val urls = Seq("http://example.com/no/1", "http://example.com/yes")
      .toDF("url")
    val got = Robots.check(urls, "url", robots, "host", "txt", "bot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("http://example.com/no/1") == false,
      "raw-keyed robots row must still bind after normalization")
    assert(got("http://example.com/yes") == true)
  }

  test("property: verdicts equal the brute-force precedence reference") {
    val rnd = new scala.util.Random(11)
    val prefixes = Seq("/a", "/a/b", "/a/b/c", "/x", "/x/y", "/",
      "/a/*/c", "/*/y", "/a/b$", "/*c$")
    val ruleSet = prefixes.flatMap { p =>
      // randomly include each pattern as allow, disallow, both, or absent
      Seq(true, false).filter(_ => rnd.nextBoolean()).map(a => (a, p))
    }
    val txt = "User-agent: bot\n" + ruleSet.map { case (a, p) =>
      s"${if (a) "Allow" else "Disallow"}: $p"
    }.mkString("\n")
    val robots = Seq(("h.com", txt)).toDF("host", "txt")
    val paths = (0 until 120).map { _ =>
      val segs = Seq("a", "b", "c", "x", "y", "z")
      "/" + Seq.fill(rnd.nextInt(4))(segs(rnd.nextInt(segs.length)))
        .mkString("/")
    }.distinct
    // independent reference matcher: regex translation of the pattern
    def refMatch(path: String, pat: String): Boolean = {
      val anchored = pat.endsWith("$")
      val core = if (anchored) pat.dropRight(1) else pat
      val rx = core.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      path.matches("^" + rx + (if (anchored) "$" else ".*"))
    }
    def brute(path: String): Boolean = {
      val applicable = ruleSet.filter { case (_, p) => refMatch(path, p) }
      if (applicable.isEmpty) true
      else applicable.maxBy { case (a, p) => (p.length, a) }._1
    }
    val got = Robots.check(paths.map(p => s"http://h.com$p").toDF("url"),
        "url", robots, "host", "txt", "bot")
      .collect().map(r => r.getString(0).stripPrefix("http://h.com") ->
        r.getBoolean(1)).toMap
    for (p <- paths)
      assert(got(p) == brute(p), s"path=$p rules=$ruleSet")
  }

  test("plan: no cartesian product; verdicts dedup by (host, path)") {
    val robots = Seq(("h1.com", "User-agent: *\nDisallow: /no\n"))
      .toDF("host", "txt")
    val urls = (0 until 100).map(i => s"http://h1.com/no/$i").toDF("url")
    val out = Robots.check(urls, "url", robots, "host", "txt", "bot")
    assert(out.filter(col("robots_allowed")).count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }
}
