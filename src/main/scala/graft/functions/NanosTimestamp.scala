package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Shims for parquet TIMESTAMP(NANOS) columns (the events table), which
  * Spark's reader rejects unless told to surface them as raw nanos longs.
  *
  * Centralized because the rebuild MUST use integer division: `ts / 1000.0`
  * goes through a double and loses sub-microsecond bits for realistic
  * epoch-nanos values — a real caught bug class (SURVEY §8.4). DuckDB's
  * `CAST(ts_ns AS TIMESTAMP)` truncates identically, so oracle comparisons
  * line up exactly.
  */
object NanosTimestamp {

  /** Enable reading TIMESTAMP(NANOS) as raw nanos longs (session-wide). */
  def enable(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Rebuild a (microsecond) timestamp column in place from raw epoch-nanos
    * longs, with integer division. */
  def rebuild(df: DataFrame, colName: String = "ts"): DataFrame =
    df.withColumn(colName, expr(s"timestamp_micros(`$colName` div 1000)"))
}
