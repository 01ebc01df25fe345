package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the events table: file-source stream →
  * watermarked windowed aggregation → sink. For tests/verification the
  * stream is driven synchronously to exhaustion over the finite input
  * (processAllAvailable on a memory sink), which makes a streaming query's
  * result comparable against a batch/DuckDB oracle.
  */
object Streams {

  /** Streaming read of events.parquet (nanos timestamps read as long and
    * rebuilt as microsecond timestamps, same as the batch reader). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.option("pathGlobFilter", "events.parquet")
      .parquet(sfDir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling-window counts/sums per event type, with a watermark (late data
    * beyond 1 hour dropped). */
  def windowedAgg(events: DataFrame, windowLength: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(10,2)")).cast("double").as("sum_value"))

  /** Run a (finite-source) streaming aggregation to completion into an
    * in-memory table and return its final result. */
  def runToMemory(agg: DataFrame, name: String): DataFrame = {
    val spark = agg.sparkSession
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }
}
