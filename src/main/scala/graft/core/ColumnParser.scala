package graft.core

import java.time.{LocalDate, YearMonth}

/** How one directory level of a partitioned tree maps to a (column, value)
  * pair, plus optional *generation* of the expected dir names so listing can
  * be skipped entirely for grammar-pinned levels.
  * Contract from /root/reference/src/fsql/column_parser.py:47-83.
  */
trait ColumnParser extends Serializable {
  /** Parse one dir (or file, when `parsesFilenames`) name into (column, value). */
  def parse(dirname: String): (String, String)
  /** Parser for the next level down, given the partition just formed. */
  def tail(partition: Partition): ColumnParser
  /** When defined: the exact dir/file names expected at this level — the
    * discovery fabricates the listing from these instead of calling ls. */
  def generate: Option[Seq[String]]
  /** Whether the terminal level parses *file* names into a column. */
  def parsesFilenames: Boolean
  /** Whether files found at this level are data leaves. */
  def isTerminalLevel: Boolean
}

/** One level of a partition-path grammar: a column name and (optionally) the
  * pinned set of values it may take. */
final case class PartitionGrammar(name: String, values: Option[Seq[String]])

object PartitionGrammar {
  /** Parse the `"col1=4/col2=[5,6]/colX"` DSL
    * (ref: column_parser.py:68-83). */
  def fromStr(pathDescription: String): Seq[PartitionGrammar] =
    pathDescription.split("/").toSeq.map { level =>
      level.split("=", 2) match {
        case Array(name) => PartitionGrammar(name, None)
        case Array(name, v) if v.startsWith("[") && v.endsWith("]") =>
          PartitionGrammar(name, Some(v.substring(1, v.length - 1).split(",").toSeq))
        case Array(name, v) => PartitionGrammar(name, Some(Seq(v)))
      }
    }
}

/** Hive-style `k=v` directory parser. Without a grammar every level is
  * terminal (files are read at all depths — a documented reference quirk,
  * column_parser.py:106-110); with a grammar, levels are consumed in order
  * and pinned values enable listing-free generation.
  * Ref: column_parser.py:86-120.
  */
final class AutoParser(val grammars: Option[Seq[PartitionGrammar]]) extends ColumnParser {
  def parse(dirname: String): (String, String) = {
    val cleaned = stripSlashes(dirname)
    val i = cleaned.indexOf('=')
    require(i >= 0, s"AutoParser expects k=v dir names, got '$dirname'")
    (cleaned.substring(0, i), cleaned.substring(i + 1))
  }
  def tail(partition: Partition): ColumnParser = grammars match {
    case None | Some(Seq()) => this
    case Some(gs) => new AutoParser(Some(gs.tail))
  }
  def parsesFilenames: Boolean = false
  def isTerminalLevel: Boolean = grammars.forall(_.isEmpty)
  def generate: Option[Seq[String]] =
    grammars.flatMap(_.headOption).flatMap(g => g.values.map(_.map(v => s"${g.name}=$v")))

  private def stripSlashes(s: String): String = s.stripPrefix("/").stripSuffix("/")
}

object AutoParser {
  /** Grammar-less hive-style parser (the reference's AUTO_PARSER default). */
  val auto: AutoParser = new AutoParser(None)
  def apply(grammars: Seq[PartitionGrammar]): AutoParser = new AutoParser(Some(grammars))
  def fromStr(pathDescription: String): AutoParser =
    AutoParser(PartitionGrammar.fromStr(pathDescription))
}

/** Value-only directory parser (`/2022/10/...`): column names are supplied
  * positionally by the grammar; the LAST grammar entry names the *filename*
  * column (`parsesFilenames == true`, terminal when one entry remains).
  * Descending deeper than the grammar raises "no partitions remaining".
  * Ref: column_parser.py:123-147.
  */
final class FixedColumnsParser(val grammars: Seq[PartitionGrammar]) extends ColumnParser {
  def parse(dirname: String): (String, String) =
    (grammars.head.name, dirname.stripPrefix("/").stripSuffix("/"))
  def tail(partition: Partition): ColumnParser = new FixedColumnsParser(grammars.tail)
  def parsesFilenames: Boolean = true
  def isTerminalLevel: Boolean = grammars.length == 1
  def generate: Option[Seq[String]] = {
    if (grammars.isEmpty) throw new IllegalArgumentException("no partitions remaining")
    grammars.head.values
  }
}

object FixedColumnsParser {
  def fromStr(pathDescription: String): FixedColumnsParser =
    new FixedColumnsParser(PartitionGrammar.fromStr(pathDescription))
}

/** Listing-free generator for `[start, end)` ranges over year/month/day
  * partition levels, in either `year=2022` or bare `2022` form. `tail`
  * narrows the range level-by-level (leap-year / month-length aware) so each
  * generated level only contains dirs that can intersect the range.
  * Ref: /root/reference/src/fsql/daterange_utils.py:90-180.
  *
  * Internally the range is INCLUSIVE on both ends (`build` subtracts one day
  * from the exclusive user-facing end, mirroring daterange_utils.py:179).
  */
final class DateRangeGenerator private[core] (
    start: LocalDate,
    end: LocalDate,
    level: DateRangeGenerator.Level,
    names: Map[DateRangeGenerator.Level, String],
    includeColumnInPath: Boolean) extends ColumnParser {
  import DateRangeGenerator._

  def parse(dirname: String): (String, String) = {
    val cleaned = dirname.stripPrefix("/").stripSuffix("/")
    if (includeColumnInPath) {
      val i = cleaned.indexOf('=')
      require(i >= 0, s"expected k=v dir, got '$dirname'")
      (cleaned.substring(0, i), cleaned.substring(i + 1))
    } else (names(level), cleaned)
  }

  def tail(partition: Partition): ColumnParser = {
    val year = partition.columns(names(Y)).trim.toInt
    level match {
      case Y =>
        val s = if (year == start.getYear) start else LocalDate.of(year, 1, 1)
        val e = if (year == end.getYear) end else LocalDate.of(year, 12, 31)
        new DateRangeGenerator(s, e, M, names, includeColumnInPath)
      case M =>
        val month = partition.columns(names(M)).trim.toInt
        val s = if (month == start.getMonthValue) start else LocalDate.of(year, month, 1)
        val e =
          if (month == end.getMonthValue) end
          else LocalDate.of(year, month, YearMonth.of(year, month).lengthOfMonth)
        new DateRangeGenerator(s, e, D, names, includeColumnInPath)
      case D => new DateRangeGenerator(start, end, F, names, includeColumnInPath)
      case F =>
        throw new IllegalStateException(
          "unexpected call of tail -- internal failure to terminate discovery")
    }
  }

  def parsesFilenames: Boolean = false
  def isTerminalLevel: Boolean = level == F

  def generate: Option[Seq[String]] = {
    val intRange: Option[Range.Inclusive] = level match {
      case Y => Some(start.getYear to end.getYear)
      case M => Some(start.getMonthValue to end.getMonthValue)
      case D => Some(start.getDayOfMonth to end.getDayOfMonth)
      case F => None
    }
    intRange.map { r =>
      val pref = if (includeColumnInPath) s"${names(level)}=" else ""
      r.map(e => s"$pref$e")
    }
  }
}

object DateRangeGenerator {
  sealed trait Level
  case object Y extends Level
  case object M extends Level
  case object D extends Level
  case object F extends Level

  def build(
      start: String,
      end: String,
      yearName: String = "year",
      monthName: String = "month",
      dayName: String = "day",
      includeColumnInPath: Boolean = true): DateRangeGenerator =
    build(QDateRange.parseDate(start), QDateRange.parseDate(end),
      yearName, monthName, dayName, includeColumnInPath)

  def build(
      start: LocalDate,
      end: LocalDate,
      yearName: String,
      monthName: String,
      dayName: String,
      includeColumnInPath: Boolean): DateRangeGenerator =
    new DateRangeGenerator(
      start, end.minusDays(1), Y,
      Map[Level, String](Y -> yearName, M -> monthName, D -> dayName),
      includeColumnInPath)
}
