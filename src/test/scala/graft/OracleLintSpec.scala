package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closes the round-16 t69/t71 defect class: uncast integer sum() in a
  * DuckDB oracle goes HUGEINT → pandas float64 → hash-red on
  * value-correct rows. The lint must (a) flag a planted uncast sum,
  * (b) pass the whole current corpus, (c) carry no dead allowlist rows. */
class OracleLintSpec extends AnyFunSuite {

  test("a planted uncast integer window-sum is refused") {
    val planted =
      """WITH r AS (SELECT k, COALESCE(sum(t) OVER (PARTITION BY k
        |  ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |  AS tok_start FROM x) SELECT k, tok_start FROM r""".stripMargin
    assert(OracleLint.uncastSums(planted).nonEmpty)
  }

  test("the same sum wrapped in CAST passes") {
    val fixed =
      """SELECT k, CAST(COALESCE(sum(t) OVER (PARTITION BY k
        |  ORDER BY id), 0) AS BIGINT) AS tok_start FROM x""".stripMargin
    assert(OracleLint.uncastSums(fixed).isEmpty)
  }

  test("parens inside single-quoted literals do not desync the scanner") {
    val sql = "SELECT CAST(sum(regexp_extract(s, '([0-9]+)')) AS BIGINT) FROM x"
    assert(OracleLint.uncastSums(sql).isEmpty)
    val bad = "SELECT regexp_extract(s, '(cast)'), sum(n) AS c FROM x GROUP BY 1"
    assert(OracleLint.uncastSums(bad).nonEmpty)
  }

  test("every oracle in the corpus is cast or allowlisted") {
    val v = OracleLint.violations(SparkEntry.oracleSql)
    assert(v.isEmpty, s"uncast sums outside the allowlist: ${v.map { case (n, c) =>
      s"$n -> ${c.mkString(" | ")}" }.mkString("; ")}")
  }

  test("allowlist has no dead entries") {
    val stale = OracleLint.staleAllowed(SparkEntry.oracleSql)
    assert(stale.isEmpty, s"prune dead allowlist rows: ${stale.mkString(",")}")
  }

  test("t69/t71 window sums are now cast (the round-16 drivers-red pair)") {
    assert(OracleLint.uncastSums(SparkEntry.oracleSql("t69_pack_chop")).isEmpty)
    assert(OracleLint.uncastSums(SparkEntry.oracleSql("t71_sft_mask")).isEmpty)
  }
}
