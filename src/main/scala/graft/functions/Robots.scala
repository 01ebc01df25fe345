package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309) group selection: parse one robots.txt body and
  * return the `(allow, prefix)` rules that BIND the given user agent —
  * the crawl-policy primitive [[graft.operators.Robots]] joins against
  * the URL table.
  *
  * Grammar implemented (the offline-tractable core):
  *
  *  - lines split on LF (CR stripped), `#` comments stripped, fields
  *    matched case-insensitively (`User-agent`, `Allow`, `Disallow`);
  *  - consecutive `User-agent` lines form one group header; rule lines
  *    bind to the current group; a `User-agent` line after rules starts
  *    a new group (RFC 9309 §2.2.1);
  *  - agent matching is case-insensitive on the product token; if any
  *    group names the agent exactly, the UNION of those groups' rules
  *    applies and `*` groups are ignored; otherwise the `*` groups
  *    apply; no group → no rules (everything allowed);
  *  - an empty rule value is skipped (an empty `Disallow:` is the
  *    classic allow-all idiom);
  *  - rule paths are match PATTERNS: a prefix match from the first
  *    byte, where `*` matches any byte sequence and a TRAILING `$`
  *    anchors the end of the URL path (RFC 9309 §2.2.3 — both are
  *    MUST-support special characters; a mid-pattern `$` is literal,
  *    the de-facto parser consensus). Matching is
  *    [[RobotsMatchExpr]]; precedence over patterns is the
  *    longest-pattern rule, applied by the operator.
  *
  * Returns `array<struct<allow boolean, prefix string>>`. */
case class RobotsRulesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("prefix", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_rules expects (STRING robots_txt, STRING agent), got $l, $r")
    }

  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsImpl.rules(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a) =>
      s"graft.functions.RobotsImpl.rules($t, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "robots_rules"
}

object RobotsRulesExpr {
  def apply(robotsTxt: Column, agent: Column): Column =
    GraftInternals.column(RobotsRulesExpr(
      GraftInternals.expression(robotsTxt), GraftInternals.expression(agent)))
}

/** RFC 9309 §2.2.3 rule matching: does `left` (a URL path+query) match
  * `right` (a robots rule pattern)? Anchored at the path start; `*`
  * matches any byte run; a trailing `$` anchors the path end. Pure
  * per-row kernel — stays inside whole-stage codegen, so at corpus
  * scale the match runs inside the rules⋈paths join's generated loop. */
case class RobotsMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_match expects (STRING path, STRING pattern), got $l, $r")
    }

  override def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsImpl.matches(path.asInstanceOf[UTF8String],
      pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) =>
      s"graft.functions.RobotsImpl.matches($p, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "robots_match"
}

object RobotsMatchExpr {
  def apply(path: Column, pattern: Column): Column =
    GraftInternals.column(RobotsMatchExpr(
      GraftInternals.expression(path), GraftInternals.expression(pattern)))
}

/** Crawl-delay extraction with the SAME group selection as
  * [[RobotsRulesExpr]] (exact-agent groups shadow `*`): the de-facto
  * politeness field nearly every robots.txt in the wild carries
  * (RFC 9309 leaves it out; crawlers honor it anyway). Returns the
  * delay in SECONDS as a double; −1.0 when the binding groups declare
  * none — the caller picks its default, the parser never invents one.
  * Several binding groups with different delays take the MAX
  * (conservative: when policies conflict, be politer). */
case class RobotsCrawlDelayExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_crawl_delay expects (STRING robots_txt, STRING agent), " +
          s"got $l, $r")
    }

  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsImpl.crawlDelay(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a) =>
      s"graft.functions.RobotsImpl.crawlDelay($t, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "robots_crawl_delay"
}

object RobotsCrawlDelayExpr {
  def apply(robotsTxt: Column, agent: Column): Column =
    GraftInternals.column(RobotsCrawlDelayExpr(
      GraftInternals.expression(robotsTxt), GraftInternals.expression(agent)))
}

object RobotsImpl {

  /** RFC 9309 pattern match (see [[RobotsMatchExpr]]): split the pattern
    * on `*`; the first segment must sit at path offset 0, middle
    * segments are located greedily left-to-right, and with a trailing
    * `$` the last segment must sit flush against the path end. Greedy
    * left-to-right is complete here because robots patterns have no
    * backtracking-relevant structure beyond `*` (each segment is a
    * literal, and taking the EARLIEST occurrence of a middle segment
    * only ever leaves more room for later ones). */
  def matches(path: UTF8String, pattern: UTF8String): Boolean = {
    val p = path.toString
    var pat = pattern.toString
    val anchored = pat.endsWith("$")
    if (anchored) pat = pat.substring(0, pat.length - 1)
    val segs = pat.split("\\*", -1)
    // first segment anchors at 0
    if (!p.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length - 1) { // middle segments: earliest occurrence
      val at = p.indexOf(segs(i), pos)
      if (at < 0) return false
      pos = at + segs(i).length
      i += 1
    }
    if (segs.length == 1) !anchored || pos == p.length
    else {
      val last = segs(segs.length - 1)
      if (anchored) p.endsWith(last) && p.length - last.length >= pos
      else p.indexOf(last, pos) >= 0
    }
  }

  private final class Group {
    val agents = scala.collection.mutable.ArrayBuffer.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay: Double = -1.0
  }

  /** Parse + group selection shared by [[rules]] and [[crawlDelay]]:
    * the groups that BIND `agent` (exact-agent groups shadow `*`). A
    * `Crawl-delay` line terminates an agent-stacking run exactly like
    * a rule line (it is group content, not a group header). */
  private def chosenGroups(txt: UTF8String,
      agent: UTF8String): Seq[Group] = {
    val want = agent.toString.trim.toLowerCase
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var current: Group = null
    var currentHasRules = false
    for (rawLine <- txt.toString.split('\n')) {
      val noComment = {
        val h = rawLine.indexOf('#')
        if (h >= 0) rawLine.substring(0, h) else rawLine
      }
      val line = noComment.replace("\r", "").trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (current == null || currentHasRules) {
              current = new Group
              currentHasRules = false
              groups += current
            }
            current.agents += value.toLowerCase
          case "allow" | "disallow" =>
            if (current != null) {
              currentHasRules = true
              if (value.nonEmpty)
                current.rules += ((field == "allow", value))
            }
          case "crawl-delay" =>
            if (current != null) {
              currentHasRules = true
              val d = try value.toDouble catch { case _: Exception => -1.0 }
              if (d >= 0) current.delay = math.max(current.delay, d)
            }
          case _ => () // sitemap, unknown fields: skipped
        }
      }
    }
    val exact = groups.filter(_.agents.contains(want))
    (if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*")))
      .toSeq
  }

  def rules(txt: UTF8String, agent: UTF8String): ArrayData =
    new GenericArrayData(chosenGroups(txt, agent).iterator
      .flatMap(_.rules).map { case (allow, prefix) =>
        InternalRow(allow, UTF8String.fromString(prefix))
      }.toArray[Any])

  /** See [[RobotsCrawlDelayExpr]]: max delay of the binding groups,
    * −1.0 when none declares one. */
  def crawlDelay(txt: UTF8String, agent: UTF8String): Double = {
    val ds = chosenGroups(txt, agent).map(_.delay)
    if (ds.isEmpty) -1.0 else ds.max
  }
}
