package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{RobotsMatchExpr, RobotsRulesExpr, TextFunctions}

/** Crawl-policy enforcement: annotate a URL table with the robots.txt
  * verdict for a crawler agent — the legal/etiquette gate a crawl
  * corpus passes BEFORE fetch cost is spent (and re-passes at curation
  * time, because policies change between crawl and training).
  *
  * Decision semantics (RFC 9309 — group selection in
  * [[graft.functions.RobotsRulesExpr]], `*`/`$` pattern matching in
  * [[graft.functions.RobotsMatchExpr]]): among the binding rules whose
  * pattern matches the URL's path+query, the LONGEST pattern wins, an
  * `allow` beats a `disallow` of equal length, and a URL matched by no
  * rule (or whose host has no robots.txt row) is allowed. The robots
  * table's host key is normalized (lowercased, port-stripped) exactly
  * like the URL side's [[TextFunctions.urlHost]], so a row keyed
  * `Example.COM:80` binds `http://example.com/...` — a raw-keyed join
  * would silently fail open.
  *
  * Spark shape at corpus scale: robots bodies parse MAP-SIDE into rule
  * rows (one explode over the host dimension — hosts are millions, URLs
  * are billions, so the rule table is the small side and broadcasts or
  * shuffles cheaply); the verdict is ONE aggregation keyed on
  * `(host, path)` — `max(struct(prefix_len, allow))` IS the precedence
  * rule, so no window and no per-URL sort — followed by one equi-join
  * back onto the URL rows. Distinct-path reuse is free: a path crawled
  * 1000× decides once. */
object Robots {

  /** The URL's path+query — what robots prefixes match against. */
  private def pathQuery(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Annotate `urls` with `robots_allowed` for `agent`. `robots` carries
    * one row per host: `(hostCol, txtCol)`. Input columns pass through. */
  def check(
      urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    require(agent.nonEmpty, "empty agent token")
    val rules = robots.select(
        regexp_replace(lower(col(hostCol)), ":[0-9]+$", "").as("__rh"),
        explode(RobotsRulesExpr(col(txtCol), lit(agent))).as("__r"))
      .select(col("__rh"), col("__r.allow").as("__allow"),
        col("__r.prefix").as("__prefix"))
    val u = urls
      .withColumn("__host", TextFunctions.urlHost(col(urlCol)))
      .withColumn("__path", pathQuery(col(urlCol)))
    // verdict per DISTINCT (host, path): max(struct(len, allow)) applies
    // the longest-pattern-then-allow-wins precedence in one partial-agg
    // shuffle — never a per-URL window
    val verdicts = u.select(col("__host"), col("__path")).distinct()
      .join(rules, col("__host") === col("__rh"))
      .filter(RobotsMatchExpr(col("__path"), col("__prefix")))
      .groupBy(col("__host"), col("__path"))
      .agg(max(struct(length(col("__prefix")).as("l"),
        col("__allow").as("a"))).as("__best"))
      .select(col("__host"), col("__path"),
        col("__best").getField("a").as("__verdict"))
    u.join(verdicts, Seq("__host", "__path"), "left")
      .withColumn("robots_allowed", coalesce(col("__verdict"), lit(true)))
      .drop("__host", "__path", "__verdict")
  }

  /** [[check]], keeping only the allowed rows (the pre-fetch filter). */
  def filterAllowed(
      urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame =
    check(urls, urlCol, robots, hostCol, txtCol, agent)
      .filter(col("robots_allowed")).drop("robots_allowed")
}
