package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core._

/** Unit + property tests for the partition-predicate algebra
  * (behavioral contract: /root/reference/src/fsql/query.py and
  * tests/test_queries.py, tests/test_lex_range_query.py,
  * tests/test_daterange.py). */
class QueryAlgebraSpec extends AnyFunSuite {

  /** Deterministic property driver (scalatestplus is not in the offline
    * cache, so we sample ScalaCheck generators by hand). */
  private def forAll[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  test("eq/in/and/or/const basics") {
    val q = Q.and(Q.eq("a", "1"), Q.in("b", Seq("x", "y")))
    assert(q.evalAll(Map("a" -> "1", "b" -> "x")))
    assert(!q.evalAll(Map("a" -> "1", "b" -> "z")))
    assert(!q.evalAll(Map("a" -> "1"))) // strict: missing column => false
    assert(q.evalAvailable(Map("a" -> "1"))) // partial: could still satisfy
    assert(!q.evalAvailable(Map("a" -> "2"))) // already refuted
    assert(Q.or(Q.False, Q.eq("a", "1")).evalAll(Map("a" -> "1")))
    assert(Q.True.evalAll(Map.empty) && !Q.False.evalAvailable(Map.empty))
  }

  test("atomic requires explicit columns; partial eval passes when missing") {
    val q = Q.atomic(Set("k2"))(m => m("k2").toInt <= 2)
    assert(q.evalAll(Map("k2" -> "2")))
    assert(!q.evalAll(Map("k2" -> "3")))
    assert(!q.evalAll(Map("other" -> "2")))
    assert(q.evalAvailable(Map("other" -> "9")))
  }

  test("lex range: half-open tuple semantics (reference doc example)") {
    // >= (b, c) and < (d, d) over columns c1, c3 with c2 a wildcard
    val q = QLexRange(Seq(
      ColumnRange("c1", "b", "d"),
      ColumnRange.wild("c2"),
      ColumnRange("c3", "c", "d")))
    assert(q.evalAll(Map("c1" -> "c", "c2" -> "zz", "c3" -> "a"))) // strictly inside on c1
    assert(q.evalAll(Map("c1" -> "b", "c2" -> "a", "c3" -> "c"))) // exactly at min
    assert(!q.evalAll(Map("c1" -> "b", "c2" -> "a", "c3" -> "b"))) // below min on tiebreak
    assert(!q.evalAll(Map("c1" -> "d", "c2" -> "a", "c3" -> "d"))) // exactly at max: excluded
    assert(q.evalAll(Map("c1" -> "d", "c2" -> "a", "c3" -> "c"))) // max prefix, below max tail
    assert(!q.evalAll(Map("c1" -> "e", "c2" -> "a", "c3" -> "a"))) // above max
    // partial evaluation on a prefix
    assert(q.evalAvailable(Map("c1" -> "b")))
    assert(!q.evalAvailable(Map("c1" -> "a")))
    assert(!q.evalAvailable(Map("c1" -> "e")))
  }

  test("lex range: numeric comparator (9 < 10)") {
    val q = QLexRange(Seq(ColumnRange("c1", "3", "27", ColumnComparator.Num)))
    assert(q.evalAll(Map("c1" -> "9")))
    assert(q.evalAll(Map("c1" -> "3")))
    assert(!q.evalAll(Map("c1" -> "27"))) // half-open
    assert(!q.evalAll(Map("c1" -> "2")))
    assert(q.evalAll(Map("c1" -> "10")))
  }

  test("invalid range rejected at construction") {
    intercept[IllegalArgumentException](ColumnRange("c", "z", "a"))
    intercept[IllegalArgumentException](ColumnRange("c", "10", "9", ColumnComparator.Num))
  }

  test("date range query: interval semantics incl. month-length bracketing") {
    val q = QDateRange("2022/4/30", "2022/5/2")
    assert(q.evalAll(Map("year" -> "2022", "month" -> "4", "day" -> "30")))
    assert(q.evalAll(Map("year" -> "2022", "month" -> "5", "day" -> "1")))
    assert(!q.evalAll(Map("year" -> "2022", "month" -> "5", "day" -> "2"))) // end exclusive
    assert(!q.evalAll(Map("year" -> "2022", "month" -> "4", "day" -> "29")))
    assert(!q.evalAll(Map("year" -> "2022", "month" -> "5"))) // strict needs all three
    // partial: year alone brackets the whole year
    assert(q.evalAvailable(Map("year" -> "2022")))
    assert(!q.evalAvailable(Map("year" -> "2021")))
    assert(q.evalAvailable(Map("year" -> "2022", "month" -> "4")))
    assert(!q.evalAvailable(Map("year" -> "2022", "month" -> "3")))
    assert(q.evalAvailable(Map.empty))
  }

  test("duplicate partition key raises") {
    val p = graft.core.Partition("x/", Map("c1" -> "4"))
    intercept[IllegalArgumentException](p.expandBy("c1=3/", Some("c1" -> "3")))
  }

  private val colVal = Gen.oneOf("a", "b", "c", "d", "1", "2", "10", "27")
  private val keys = Seq("k1", "k2", "k3")
  private val partialMap: Gen[Map[String, String]] = for {
    n <- Gen.choose(0, 3)
    ks <- Gen.pick(n, keys)
    vs <- Gen.listOfN(n, colVal)
  } yield ks.zip(vs).toMap
  private val fullMap: Gen[Map[String, String]] =
    Gen.listOfN(3, colVal).map(vs => keys.zip(vs).toMap)

  private val leafQuery: Gen[PartitionQuery] = Gen.oneOf(
    Gen.oneOf(keys).flatMap(k => colVal.map(v => Q.eq(k, v))),
    Gen.oneOf(keys).flatMap(k => Gen.listOfN(2, colVal).map(vs => Q.in(k, vs))),
    Gen.const(Q.True), Gen.const(Q.False))

  private def queryGen(depth: Int): Gen[PartitionQuery] =
    if (depth == 0) leafQuery
    else Gen.oneOf(
      leafQuery,
      for (l <- queryGen(depth - 1); r <- queryGen(depth - 1)) yield Q.and(l, r),
      for (l <- queryGen(depth - 1); r <- queryGen(depth - 1)) yield Q.or(l, r))

  test("property: partial evaluation never false-negatives (monotone algebra)") {
    // If evalAll is true on a full assignment, evalAvailable must be true on
    // every sub-assignment (prefix of discovery) — the soundness property the
    // reference implies but never tests (SURVEY §5).
    forAll(queryGen(3).flatMap(q => fullMap.map((q, _)))) { case (q, full) =>
      if (q.evalAll(full)) {
        val subsets = full.keySet.subsets().map(s => full.view.filterKeys(s).toMap)
        subsets.foreach(sub => assert(q.evalAvailable(sub)))
      }
    }
  }

  test("property: evalAvailable == evalAll once all columns are present (eq/in trees)") {
    forAll(queryGen(3).flatMap(q => fullMap.map((q, _)))) { case (q, full) =>
      assert(q.evalAvailable(full) == q.evalAll(full))
    }
  }

  test("lex range: reference quirk — shared min/max prefix drops the upper bound") {
    // Matches the reference implementation's observed behavior bit-for-bit.
    val q = QLexRange(Seq(ColumnRange("c1", "b", "b"), ColumnRange("c2", "a", "c")))
    assert(q.evalAll(Map("c1" -> "b", "c2" -> "d"))) // true lex compare would reject
  }

  test("property: lex-range agrees with brute-force tuple comparison") {
    val vals = Gen.oneOf("a", "b", "c", "d", "e")
    val gen = for {
      mn1 <- vals; mx1 <- vals; mn2 <- vals; mx2 <- vals
      v1 <- vals; v2 <- vals
    } yield (mn1, mx1, mn2, mx2, v1, v2)
    // NOTE: restricted to mn1 < mx1. When min and max share a column-prefix
    // value, the reference's state machine (query.py:158-178) records only
    // at_minimum and then ignores the upper bound on later columns — e.g.
    // (b,d) is accepted for [(b,a),(b,c)). We reproduce that quirk faithfully
    // (verified against the reference implementation); see test below.
    forAll(gen) { case (mn1, mx1, mn2, mx2, v1, v2) =>
      if (mn1 < mx1 && mn2 <= mx2) {
        val q = QLexRange(Seq(ColumnRange("c1", mn1, mx1), ColumnRange("c2", mn2, mx2)))
        val tuple = (v1, v2)
        val geMin = Ordering[(String, String)].gteq(tuple, (mn1, mn2))
        val ltMax = Ordering[(String, String)].lt(tuple, (mx1, mx2))
        assert(q.evalAll(Map("c1" -> v1, "c2" -> v2)) == (geMin && ltMax))
      }
    }
  }
}
