package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Frontier

/** Registrable-domain (eTLD+1) extraction and domain-level curation. */
class DomainRollupSpec extends SparkSpec {
  import spark.implicits._

  private val sfx = Seq("com", "org", "co.uk", "ac.uk", "github.io")

  private def reg(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(TextFunctions.registrableDomain(col("url"), sfx))
      .collect().map(r => String.valueOf(r.get(0))).toSeq

  test("longest listed suffix wins; deep subdomains collapse") {
    assert(reg("https://news.example.com/a") == Seq("example.com"))
    assert(reg("https://blog.example.co.uk/x") == Seq("example.co.uk"))
    assert(reg("http://cdn.assets.example.org/y") == Seq("example.org"))
    assert(reg("https://u.github.io/repo") == Seq("u.github.io"))
  }

  test("a bare registrable domain is its own answer") {
    assert(reg("https://example.org/") == Seq("example.org"))
  }

  test("a host that IS a listed suffix has no registrable domain") {
    assert(reg("https://co.uk/") == Seq("null"))
    assert(reg("https://com/") == Seq("null"))
  }

  test("unlisted TLD falls to the implicit * rule (last two labels)") {
    assert(reg("https://a.b.example.dev/") == Seq("example.dev"))
    assert(reg("https://single/") == Seq("null"))
  }

  test("host casing and ports are normalized away") {
    assert(reg("HTTPS://News.Example.COM:8443/a") == Seq("example.com"))
  }

  test("dropLowQualityDomains flags by exact rational mean and keeps nulls") {
    val docs = Seq(
      (1L, "https://a.bad.com/1", 10L),
      (2L, "https://b.bad.com/2", 20L),   // bad.com mean 15 < 40 -> drop
      (3L, "https://good.org/1", 80L),
      (4L, "https://good.org/2", 90L),    // good.org mean 85 -> keep
      (5L, "https://com/", 0L)            // no registrable domain -> keep
    ).toDF("doc_id", "url", "score")
    val kept = Frontier.dropLowQualityDomains(docs, "url", "score", sfx,
      minMeanNum = 40L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L))
  }

  test("threshold boundary: mean exactly at the bar is kept") {
    val docs = Seq(
      (1L, "https://x.edge.com/1", 39L),
      (2L, "https://y.edge.com/2", 41L)   // mean exactly 40 -> NOT below
    ).toDF("doc_id", "url", "score")
    val kept = Frontier.dropLowQualityDomains(docs, "url", "score", sfx,
      minMeanNum = 40L).count()
    assert(kept == 2L)
  }
}
