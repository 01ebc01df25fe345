package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.core._
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.Fixtures.hiveLineitem(spark, sfDir)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scan] $label%-30s ${(System.nanoTime()-t0)/1e9}%8.3f s ($r)")
    }
    time("warmup count raw parquet") { spark.read.parquet(s"$sfDir/lineitem.parquet").count() }
    time("discovery only") { Graft.discover(spark, dir, Q.eq("l_returnflag","R")).size }
    time("read+count 1st") { Graft.readPartitionedTable(spark, dir, Q.eq("l_returnflag","R")).count() }
    time("read+count 2nd") { Graft.readPartitionedTable(spark, dir, Q.eq("l_returnflag","R")).count() }
    val df = Graft.readPartitionedTable(spark, dir, Q.eq("l_returnflag","R"))
    println(df.queryExecution.executedPlan.toString.split("\n").take(12).mkString("\n"))
    time("full s1 query 2nd run") { graft.SparkEntry.queries("s1_scan_hive")(spark, sfDir).count() }
    spark.stop()
  }
}
