package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shims normalizing the events table's `ts` column to a session-TZ
  * TimestampType regardless of how the fixture file was written. The driver
  * owns the fixture schema and has shipped it as TIMESTAMP(NANOS) (surfaced
  * by Spark as a raw nanos long under `nanosAsLong`) and as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ) —
  * so the rebuild branches on the resolved type instead of assuming one.
  *
  * Centralized because the nanos rebuild MUST use integer division:
  * `ts / 1000.0` goes through a double and loses sub-microsecond bits for
  * realistic epoch-nanos values — a real caught bug class (SURVEY §8.4).
  * DuckDB's `CAST(ts_ns AS TIMESTAMP)` truncates identically, so oracle
  * comparisons line up exactly. The NTZ→Timestamp cast is value-preserving
  * because every entry point pins `spark.sql.session.timeZone=UTC`.
  */
object NanosTimestamp {

  /** Enable reading TIMESTAMP(NANOS) as raw nanos longs (session-wide).
    * Harmless for MICROS files, which read natively. */
  def enable(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize a timestamp column in place to TimestampType (micros):
    * raw epoch-nanos longs via integer division; TIMESTAMP_NTZ via a
    * single explicit cast (exact under the UTC session TZ); TimestampType
    * passes through. */
  def rebuild(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(s"timestamp_micros(`$colName` div 1000)"))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events `$colName` has unsupported type $other; expected " +
            "nanos-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
}
