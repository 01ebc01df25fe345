package graft

import org.apache.spark.sql.functions._
import graft.functions.{UrlResolveExpr, UrlResolveImpl}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 reference resolution: the five reference shapes, dot-segment
  * removal (against the RFC's own §5.4 examples), fragment handling,
  * unresolvable bases. */
class UrlResolveSpec extends SparkSpec {
  import spark.implicits._

  private def r(base: String, ref: String): String =
    UrlResolveImpl.resolve(UTF8String.fromString(base),
      UTF8String.fromString(ref)).toString

  // RFC 3986 §5.4 normal examples (the spec's own test vectors), minus
  // the fragment outputs — this kernel drops fragments by contract
  private val base = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples") {
    assert(r(base, "g:h") == "g:h")
    assert(r(base, "g") == "http://a/b/c/g")
    assert(r(base, "./g") == "http://a/b/c/g")
    assert(r(base, "g/") == "http://a/b/c/g/")
    assert(r(base, "/g") == "http://a/g")
    // deviation from the RFC's literal "http://g": network-path refs run
    // through the same canonicalization as absolute refs (empty path →
    // "/"), so "//g" and "http://g" resolve identically
    assert(r(base, "//g") == "http://g/")
    assert(r(base, "//g") == r(base, "http://g"))
    // the r15-ADVICE divergence: a dotted network-path ref must land on
    // the same frontier entry as its absolute spelling
    assert(r(base, "//host/a/../b") == "http://host/b")
    assert(r(base, "//host/a/../b") == r(base, "http://host/a/../b"))
    assert(r(base, "?y") == "http://a/b/c/d;p?y")
    assert(r(base, "g?y") == "http://a/b/c/g?y")
    assert(r(base, ";x") == "http://a/b/c/;x")
    assert(r(base, "g;x") == "http://a/b/c/g;x")
    assert(r(base, "") == "http://a/b/c/d;p?q")
    assert(r(base, ".") == "http://a/b/c/")
    assert(r(base, "./") == "http://a/b/c/")
    assert(r(base, "..") == "http://a/b/")
    assert(r(base, "../") == "http://a/b/")
    assert(r(base, "../g") == "http://a/b/g")
    assert(r(base, "../..") == "http://a/")
    assert(r(base, "../../") == "http://a/")
    assert(r(base, "../../g") == "http://a/g")
  }

  test("§5.4.2 abnormal examples: dots never climb above root") {
    assert(r(base, "../../../g") == "http://a/g")
    assert(r(base, "../../../../g") == "http://a/g")
    assert(r(base, "/./g") == "http://a/g")
    assert(r(base, "/../g") == "http://a/g")
    assert(r(base, "g.") == "http://a/b/c/g.")
    assert(r(base, ".g") == "http://a/b/c/.g")
    assert(r(base, "g..") == "http://a/b/c/g..")
    assert(r(base, "..g") == "http://a/b/c/..g")
    assert(r(base, "./../g") == "http://a/b/g")
    assert(r(base, "./g/.") == "http://a/b/c/g/")
    assert(r(base, "g/./h") == "http://a/b/c/g/h")
    assert(r(base, "g/../h") == "http://a/b/c/h")
  }

  test("fragments drop; same-document refs return the base") {
    assert(r(base, "#s") == "http://a/b/c/d;p?q")
    assert(r(base, "g#s") == "http://a/b/c/g")
    assert(r(base, "g?y#s") == "http://a/b/c/g?y")
    assert(r("http://h/p#frag", "x") == "http://h/x",
      "the base's own fragment is ignored")
  }

  test("edge shapes: rootless base path, mid-path empty segments, " +
      "unresolvable base") {
    assert(r("http://h", "g") == "http://h/g", "empty base path reads as /")
    assert(r("http://h/a//b/c", "../g") == "http://h/a//g",
      "empty segment is a real segment")
    assert(r("not a url", "g/h") == "g/h", "unresolvable base passes ref")
    // §5.2.2: remove_dot_segments applies to ABSOLUTE references too —
    // http://h/a/../b and (../b against http://h/a/x) are one URL
    assert(r(base, "http://h/a/../b") == "http://h/b")
    assert(r(base, "https://z/./x/") == "https://z/x/")
    assert(r(base, "mailto:x@y") == "mailto:x@y",
      "non-hierarchical schemes pass through")
    assert(r("http://h/p", "  g  ") == "http://h/g", "refs trim")
    assert(r("http://h/p?old", "?new") == "http://h/p?new")
    assert(r("http://h/p?old", "") == "http://h/p?old",
      "empty ref keeps base query")
  }

  test("column expression resolves through Spark") {
    val got = Seq(("http://a/b/c", "../x"), ("http://a/b/c", "https://z/"))
      .toDF("base", "ref")
      .select(UrlResolveExpr(col("base"), col("ref")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("http://a/x", "https://z/"))
  }
}
