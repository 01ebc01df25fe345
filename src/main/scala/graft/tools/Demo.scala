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
    spark.stop()
  }
}
