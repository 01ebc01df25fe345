package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Graft
import graft.core._

/** Usage example / smoke entry: materializes a partitioned layout from the
  * driver testdata, then exercises the public read surface end-to-end.
  * Run: spark-submit --class graft.tools.Demo the-packaged-jar [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val layout = java.nio.file.Files.createTempDirectory("graft_demo").toString
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.mode("overwrite").partitionBy("l_returnflag", "l_linestatus").parquet(layout)

    Discovery.resetListingCounter()
    val df = Graft.readPartitionedTable(spark, layout,
      query = Q.and(Q.eq("l_returnflag", "R"), Q.in("l_linestatus", Seq("F"))))
    val agg = df.groupBy("l_returnflag", "l_linestatus")
      .agg(count("*").as("n"), sum("l_quantity").as("sum_qty"))
    agg.show()
    println(s"[demo] listing calls during discovery: ${Discovery.listingCalls.get()}")
    agg.explain("formatted")
    val n = df.count()
    println(s"[demo] matched rows: $n")
    require(n > 0, "expected rows for l_returnflag=R/l_linestatus=F")

    // the same partitioned tree as a STREAM: pruned at start, partition
    // columns from the path, windowless append to a memory sink
    val sdf = graft.streaming.Streams.readPartitionedStream(
      spark, layout,
      query = Q.and(Q.eq("l_returnflag", "R"), Q.in("l_linestatus", Seq("F"))))
    val sq = sdf.writeStream.outputMode("append")
      .format("memory").queryName("demo_stream").start()
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("demo_stream")
    val ns = streamed.count()
    val flags = streamed.select("l_returnflag").distinct()
      .collect().map(_.getString(0)).toSeq
    println(s"[demo] streamed rows: $ns (flags=$flags)")
    require(ns == n, s"stream must see the same pruned rows: $ns != $n")

    // training-data pipeline over the documents table: normalize → dedup
    // gate → quality heuristics → frequent tokens → balanced sample
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // ingest shape: even ids are the standing corpus (indexed once), odd
    // ids arrive as a new batch and pass the near-dup gate against it
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
    val index = graft.operators.Dedup.minhashIndex(corpus, "doc_id", "text")
    val kept = graft.operators.Dedup.dropNearDuplicatesAgainst(
      batch, "doc_id", "text", index, threshold = 0.8)
    println(s"[demo] ingest gate: ${batch.count()} new docs -> " +
      s"${kept.count()} kept against a ${corpus.count()}-doc index")
    val hot = docs.agg(graft.functions.HeavyHitters.heavyHitters(
        graft.functions.TextFunctions.words(col("text")), 5, 1024).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.count")).collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(", ")
    println(s"[demo] top tokens: $hot")
    val sample = graft.operators.Sampling.sampleByGroup(docs, "lang", "doc_id", 2)
    println(s"[demo] stratified sample rows: ${sample.count()}")

    // round-14 analytics: a weighted draw, a leakage-safe split, and the
    // exact-arithmetic telemetry trio over the events table
    val draw = graft.operators.Sampling.prioritySample(
      docs, "doc_id", col("n_chars"), k = 5)
    println(s"[demo] priority draw: " +
      draw.select("doc_id").collect().map(_.getLong(0)).sorted.mkString(","))
    val splits = docs.select(graft.functions.TextFunctions
        .leakageSafeSplit(col("text"),
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("s"))
      .groupBy("s").count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(", ")
    println(s"[demo] leakage-safe split: $splits")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("v_scaled", floor(col("value") * 100).cast("long"))
    val shifts = graft.operators.Timeseries.cusum(ev, "user_id", "ts",
        "event_id", col("v_scaled"), target = 5000L, threshold = 100000L)
      .filter(col("is_shift_up") || col("is_shift_down")).count()
    println(s"[demo] cusum shift points: $shifts")
    spark.stop()
  }
}
