package graft.core

import java.time.{LocalDate, YearMonth}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable boolean predicate over partition-column values, with dual
  * evaluation modes (reference contract: /root/reference/src/fsql/query.py:23-30):
  *
  *  - `evalAll`: strict — every referenced column must be present; a missing
  *    column makes the predicate false.
  *  - `evalAvailable`: partial — "could ANY completion of the currently-known
  *    columns satisfy this predicate?" A missing column answers true at the
  *    leaves. Sound as a pruning over-approximation because the algebra is
  *    AND/OR-monotone (there is deliberately no NOT — adding one would require
  *    three-valued logic; see SURVEY.md §7).
  *
  * `toColumn` additionally exposes a Catalyst-expressible form (over
  * string-typed partition columns) when one exists, so the same predicate can
  * also be pushed into Spark's own partition pruning.
  */
sealed trait PartitionQuery extends Serializable {
  def evalAll(columns: Map[String, String]): Boolean
  def evalAvailable(columns: Map[String, String]): Boolean

  /** Catalyst equivalent over StringType partition columns, when expressible. */
  def toColumn: Option[Column]

  def and(other: PartitionQuery): PartitionQuery = QAnd(this, other)
  def or(other: PartitionQuery): PartitionQuery = QOr(this, other)
  def &&(other: PartitionQuery): PartitionQuery = and(other)
  def ||(other: PartitionQuery): PartitionQuery = or(other)
}

/** Equality on one partition column (string compare). Ref: query.py:80-84. */
final case class QEq(column: String, value: String) extends PartitionQuery {
  def evalAll(columns: Map[String, String]): Boolean = columns.get(column).contains(value)
  def evalAvailable(columns: Map[String, String]): Boolean =
    columns.get(column).forall(_ == value)
  def toColumn: Option[Column] = Some(col(column) === lit(value))
}

/** Membership on one partition column. Ref: query.py:87-91. */
final case class QIn(column: String, values: Seq[String]) extends PartitionQuery {
  private val valueSet = values.toSet
  def evalAll(columns: Map[String, String]): Boolean =
    columns.get(column).exists(valueSet.contains)
  def evalAvailable(columns: Map[String, String]): Boolean =
    columns.get(column).forall(valueSet.contains)
  def toColumn: Option[Column] = Some(col(column).isin(values: _*))
}

final case class QAnd(left: PartitionQuery, right: PartitionQuery) extends PartitionQuery {
  def evalAll(columns: Map[String, String]): Boolean =
    left.evalAll(columns) && right.evalAll(columns)
  def evalAvailable(columns: Map[String, String]): Boolean =
    left.evalAvailable(columns) && right.evalAvailable(columns)
  def toColumn: Option[Column] =
    for (l <- left.toColumn; r <- right.toColumn) yield l && r
}

final case class QOr(left: PartitionQuery, right: PartitionQuery) extends PartitionQuery {
  def evalAll(columns: Map[String, String]): Boolean =
    left.evalAll(columns) || right.evalAll(columns)
  def evalAvailable(columns: Map[String, String]): Boolean =
    left.evalAvailable(columns) || right.evalAvailable(columns)
  def toColumn: Option[Column] =
    for (l <- left.toColumn; r <- right.toColumn) yield l || r
}

/** Constant query; QTrue is the "read everything" idiom. Ref: query.py:94-106. */
final case class QConst(constant: Boolean) extends PartitionQuery {
  def evalAll(columns: Map[String, String]): Boolean = constant
  def evalAvailable(columns: Map[String, String]): Boolean = constant
  def toColumn: Option[Column] = Some(lit(constant))
}

/** Arbitrary predicate over partition values. Unlike the reference (which
  * introspects the Python function's argument names, query.py:52-53), Scala
  * requires the referenced column set to be explicit. Evaluated driver-side
  * only — this never becomes a distributed UDF.
  * Ref: query.py:46-63.
  */
final case class QAtomic(requiredColumns: Set[String], f: Map[String, String] => Boolean)
    extends PartitionQuery {
  def evalAll(columns: Map[String, String]): Boolean =
    requiredColumns.subsetOf(columns.keySet) && f(columns)
  def evalAvailable(columns: Map[String, String]): Boolean =
    !requiredColumns.subsetOf(columns.keySet) || f(columns)
  def toColumn: Option[Column] = None
}

/** Per-column comparison strategy for [[QLexRange]]. Ref: query.py:108-125. */
sealed trait ColumnComparator extends Serializable {
  def compare(a: String, b: String): Int
}
object ColumnComparator {
  /** Plain string ordering. */
  case object Lex extends ColumnComparator {
    def compare(a: String, b: String): Int = Integer.signum(a.compareTo(b))
  }
  /** Numeric ordering; all values must parse as integers. */
  case object Num extends ColumnComparator {
    def compare(a: String, b: String): Int =
      java.lang.Long.compare(a.trim.toLong, b.trim.toLong)
  }
  /** Wildcard — any value matches, comparison continues on later columns. */
  case object Wld extends ColumnComparator {
    def compare(a: String, b: String): Int = 0
  }
}

/** One column of a lexicographic tuple range; validates min <= max. */
final case class ColumnRange(
    name: String,
    minValue: String,
    maxValue: String,
    comparator: ColumnComparator = ColumnComparator.Lex) {
  if (comparator.compare(minValue, maxValue) > 0)
    throw new IllegalArgumentException(s"invalid range: $this")
}
object ColumnRange {
  /** Wildcard column: skipped during comparison but kept in the tuple order. */
  def wild(name: String): ColumnRange = ColumnRange(name, "", "", ColumnComparator.Wld)
}

/** Half-open lexicographic tuple range over ordered partition columns:
  * accepts tuples >= (min_1..min_n) and < (max_1..max_n).
  *
  * Faithful reimplementation of the reference's prefix state machine
  * (/root/reference/src/fsql/query.py:137-184): walking the columns in order,
  * `atMinimum`/`atMaximum` track whether the prefix so far sits exactly on the
  * lower/upper bound; a column strictly inside both effective bounds accepts,
  * strictly outside rejects, and running out of columns while still pinned to
  * the maximum rejects (half-open upper bound). A column missing from the
  * input returns `onEarlyStop` (true for partial evaluation over a prefix).
  */
final case class QLexRange(ranges: Seq[ColumnRange]) extends PartitionQuery {

  private def evalGeneric(columns: Map[String, String], onEarlyStop: Boolean): Boolean = {
    var atMinimum = false
    var atMaximum = false
    for (c <- ranges) {
      columns.get(c.name) match {
        case None => return onEarlyStop
        case Some(value) =>
          if (c.comparator != ColumnComparator.Wld) {
            val left = c.comparator.compare(c.minValue, value)
            val right = c.comparator.compare(value, c.maxValue)
            if ((left < 0 || atMaximum) && (right < 0 || atMinimum)) return true
            else if (left == 0) atMinimum = true
            else if (right == 0) atMaximum = true
            else return false
          }
      }
    }
    !atMaximum
  }

  def evalAll(columns: Map[String, String]): Boolean = evalGeneric(columns, onEarlyStop = false)
  def evalAvailable(columns: Map[String, String]): Boolean = evalGeneric(columns, onEarlyStop = true)

  /** Expansion into native conjuncts/disjuncts:
    * tuple >= min  ≡  c1 > m1 || (c1 == m1 && rest >= rest-min), and the
    * strict analog for tuple < max. Wildcard columns are omitted. Numeric
    * columns compare via a cast to long.
    */
  def toColumn: Option[Column] = {
    val effective = ranges.filterNot(_.comparator == ColumnComparator.Wld)
    if (effective.isEmpty) return Some(lit(true))
    def c(r: ColumnRange): Column = r.comparator match {
      case ColumnComparator.Num => col(r.name).cast("long")
      case _ => col(r.name)
    }
    def l(r: ColumnRange, v: String): Column = r.comparator match {
      case ColumnComparator.Num => lit(v.trim.toLong)
      case _ => lit(v)
    }
    def ge(rs: Seq[ColumnRange]): Column = rs match {
      case Seq() => lit(true)
      case r +: rest => (c(r) > l(r, r.minValue)) || (c(r) === l(r, r.minValue) && ge(rest))
    }
    def ltS(rs: Seq[ColumnRange]): Column = rs match {
      case Seq() => lit(false)
      case r +: rest => (c(r) < l(r, r.maxValue)) || (c(r) === l(r, r.maxValue) && ltS(rest))
    }
    Some(ge(effective) && ltS(effective))
  }
}

/** `[start, end)` date filter over year/month/day partition columns (names
  * configurable). `evalAll` assembles the full date; `evalAvailable` brackets
  * the partial partition (year known, month/day defaulted to their extremes,
  * month-length aware) — i.e. an interval-overlap test.
  * Ref: /root/reference/src/fsql/daterange_utils.py:34-79.
  */
final case class QDateRange(
    start: LocalDate,
    end: LocalDate,
    yearName: String = "year",
    monthName: String = "month",
    dayName: String = "day") extends PartitionQuery {

  def evalAll(columns: Map[String, String]): Boolean = {
    val names = Seq(yearName, monthName, dayName)
    if (!names.forall(columns.contains)) false
    else {
      val d = LocalDate.of(
        columns(yearName).trim.toInt,
        columns(monthName).trim.toInt,
        columns(dayName).trim.toInt)
      !d.isBefore(start) && d.isBefore(end)
    }
  }

  def evalAvailable(columns: Map[String, String]): Boolean =
    columns.get(yearName) match {
      case None => true
      case Some(yStr) =>
        val year = yStr.trim.toInt
        val monthL = columns.get(monthName).map(_.trim.toInt).getOrElse(1)
        val monthR = columns.get(monthName).map(_.trim.toInt).getOrElse(12)
        val dayL = columns.get(dayName).map(_.trim.toInt).getOrElse(1)
        val dayR = columns.get(dayName).map(_.trim.toInt)
          .getOrElse(YearMonth.of(year, monthR).lengthOfMonth)
        val dateL = LocalDate.of(year, monthL, dayL)
        val dateR = LocalDate.of(year, monthR, dayR)
        dateL.isBefore(end) && !dateR.isBefore(start)
    }

  def toColumn: Option[Column] = {
    val d = make_date(
      col(yearName).cast("int"), col(monthName).cast("int"), col(dayName).cast("int"))
    Some(d >= lit(java.sql.Date.valueOf(start)) && d < lit(java.sql.Date.valueOf(end)))
  }
}

object QDateRange {
  /** Accepts the reference's "yyyy/mm/dd" string form. */
  def apply(start: String, end: String): QDateRange =
    QDateRange(parseDate(start), parseDate(end))
  def apply(start: String, end: String, yearName: String, monthName: String,
      dayName: String): QDateRange =
    QDateRange(parseDate(start), parseDate(end), yearName, monthName, dayName)
  private[core] def parseDate(s: String): LocalDate = {
    val parts = s.split("/")
    require(parts.length == 3, s"expected yyyy/mm/dd, got $s")
    LocalDate.of(parts(0).toInt, parts(1).toInt, parts(2).toInt)
  }
}

/** Ergonomic constructors mirroring the reference's public names. */
object Q {
  val True: PartitionQuery = QConst(true)
  val False: PartitionQuery = QConst(false)
  def eq(column: String, value: String): PartitionQuery = QEq(column, value)
  def in(column: String, values: Seq[String]): PartitionQuery = QIn(column, values)
  def and(l: PartitionQuery, r: PartitionQuery): PartitionQuery = QAnd(l, r)
  def or(l: PartitionQuery, r: PartitionQuery): PartitionQuery = QOr(l, r)
  def atomic(columns: Set[String])(f: Map[String, String] => Boolean): PartitionQuery =
    QAtomic(columns, f)
}
