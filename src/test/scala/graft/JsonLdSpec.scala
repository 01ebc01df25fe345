package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** JSON-LD block harvest: attribute grammar, plain-script exclusion,
  * lenient field parsing. */
class JsonLdSpec extends SparkSpec {
  import spark.implicits._

  private def blocks(html: String): Seq[String] =
    Seq(html).toDF("h")
      .select(TextFunctions.jsonLdBlocks(col("h")))
      .collect().head.getSeq[String](0).toSeq

  test("finds blocks under quote/case/attribute-order variants") {
    val html =
      """<script type="application/ld+json">{"a":1}</script>""" +
        """<script async TYPE='application/ld+json'>{"b":2}</script>""" +
        """<SCRIPT data-x="y" type="application/ld+json" defer>
          {"c":3}
        </SCRIPT>"""
    assert(blocks(html) == Seq("""{"a":1}""", """{"b":2}""", """{"c":3}"""))
  }

  test("plain scripts and styles are never harvested") {
    val html = """<script>var x = {"a":1};</script>""" +
      """<script type="text/javascript">{"b":2}</script>""" +
      """<style>{"c":3}</style>"""
    assert(blocks(html).isEmpty)
  }

  test("nested json structure survives intact") {
    val body = """{"@type":"Article","author":{"name":"A"},"tags":["x","y"]}"""
    val harvested = blocks(s"""<script type="application/ld+json">$body</script>""")
    assert(harvested == Seq(body))
    val parsed = Seq(body).toDF("b")
      .select(get_json_object(col("b"), "$.author.name")).head.getString(0)
    assert(parsed == "A")
  }

  test("malformed blocks harvest positionally and parse to null") {
    val html = """<script type="application/ld+json">{"broken": </script>""" +
      """<script type="application/ld+json">{"ok":1}</script>"""
    val b = blocks(html)
    assert(b.size == 2)
    val r = b.toDF("b")
      .select(get_json_object(col("b"), "$.ok")).collect()
    assert(r(0).isNullAt(0) && r(1).getString(0) == "1")
  }
}
