package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.NanosTimestamp

/** The events fixture's `ts` physical type is driver-owned and has changed
  * across testdata generations (TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ),
  * r10 verdict). These specs pin the type-adaptive rebuild: all three
  * representations of the same instants must normalize to an identical
  * TimestampType column.
  */
class NanosTimestampSpec extends SparkSpec {

  // instants with sub-microsecond nanos residue (exercises the div-1000
  // truncation) and a pre-1970 value (exercises floor-vs-truncate division)
  private val nanos = Seq(1700000000123456789L, 1700000000123456001L, 999L)

  private def rebuiltFromNanos = {
    import spark.implicits._
    NanosTimestamp.rebuild(nanos.toDF("ts"))
  }

  test("nanos-long rebuild truncates to micros with integer division") {
    val out = rebuiltFromNanos
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(micros.toSeq == nanos.map(_ / 1000L))
  }

  test("TIMESTAMP_NTZ input casts to an identical TimestampType column") {
    val ntz = rebuiltFromNanos
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = NanosTimestamp.rebuild(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(canon(out) == canon(rebuiltFromNanos))
  }

  test("TimestampType input passes through unchanged") {
    val out = NanosTimestamp.rebuild(rebuiltFromNanos)
    assert(out.schema("ts").dataType == TimestampType)
    assert(canon(out) == canon(rebuiltFromNanos))
  }

  test("unsupported ts type fails loudly, not downstream") {
    import spark.implicits._
    val bad = Seq("not a timestamp").toDF("ts")
    val e = intercept[IllegalArgumentException](NanosTimestamp.rebuild(bad))
    assert(e.getMessage.contains("unsupported"))
  }

  test("a MICROS-NTZ parquet file round-trips through the fixture path") {
    // write an NTZ file the way the driver now ships events, read it back
    // through the same enable+rebuild sequence Fixtures.events uses
    val dir = tmpDir("ntz_events")
    rebuiltFromNanos.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    NanosTimestamp.enable(spark)
    val back = NanosTimestamp.rebuild(spark.read.parquet(s"$dir/events.parquet"))
    assert(back.schema("ts").dataType == TimestampType)
    assert(canon(back) == canon(rebuiltFromNanos))
  }

  test("the driver fixture reads to TimestampType with plausible values") {
    val ev = Fixtures.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    val n = ev.filter(col("ts").between(
      lit("1990-01-01").cast(TimestampType),
      lit("2050-01-01").cast(TimestampType))).count()
    assert(n > 0 && n == ev.count())
  }
}
