package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Bucketing

/** Drives the bucketed co-located join end-to-end and prints whether the
  * executed plan is shuffle-free. */
object BucketCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    Bucketing.writeBucketed(li, "bc_lineitem", "l_orderkey", 16)
    Bucketing.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "bc_orders", "l_orderkey", 16)
    val joined = Bucketing.readBucketed(spark, "bc_lineitem")
      .join(Bucketing.readBucketed(spark, "bc_orders"), "l_orderkey")
    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    println(s"[bucket] joined rows total: $n")
    println(s"[bucket] SortMergeJoin present: ${plan.contains("SortMergeJoin")}")
    println(s"[bucket] Exchange in bare-join plan: ${plan.contains("Exchange")}")
    spark.stop()
  }
}
