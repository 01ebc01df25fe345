package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the finalized (post-AQE) physical plan of d2_dedup_minhash and
  * count exchanges / reuse nodes. */
object PlanD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("d2_dedup_minhash")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    val reuse = "ReusedExchange".r.findAllIn(plan).length
    val scans = "Scan parquet".r.findAllIn(plan).length
    println(s"[d2-plan] exchanges=$ex reused=$reuse parquet_scans=$scans")
    plan.split("\n").foreach(l => println("[d2] " + l.take(160)))
    spark.stop()
  }
}
